"""Native (C++) serving-runtime core vs the pure-Python allocators.

The contract is bit-identical decisions: page ids, hit counts, eviction
order, observability counters. A long randomized workload drives both
implementations through the same op sequence and compares every result —
any divergence in free-list discipline (LIFO), LRU order (insertion +
move-to-end), or eviction choice (oldest unreferenced) fails loudly.
"""

import hashlib

import numpy as np
import pytest

from long_context_attention_tpu.serving.continuous import _PageAllocator
from long_context_attention_tpu.serving.native import (
    NativePageAllocator,
    NativePrefixPageAllocator,
    native_available,
)
from long_context_attention_tpu.serving.prefix_cache import (
    PrefixPageAllocator,
    chain_hashes,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime not built (no g++?)")


def _key(i: int) -> bytes:
    return hashlib.blake2b(str(i).encode(), digest_size=16).digest()


def test_basic_allocator_parity():
    rng = np.random.default_rng(0)
    py = _PageAllocator(64)
    cc = NativePageAllocator(64)
    for step in range(500):
        bi = int(rng.integers(0, 8))
        assert py.available(bi) == cc.available(bi), step
        need = int(rng.integers(1, 9))
        if py.available(bi) >= need:
            assert py.take(bi, need) == cc.take(bi, need), step


def test_windowed_ops_parity():
    """take_extra / release_pages (sliding-window dynamic paging): the
    native core must grow and free RUNNING rows with identical page ids
    and free-list (LIFO) state to the Python allocator."""
    rng = np.random.default_rng(2)
    py = _PageAllocator(48)
    cc = NativePageAllocator(48)
    rows = {}
    for step in range(1500):
        op = rng.integers(0, 4)
        bi = int(rng.integers(0, 6))
        assert py.available(bi) == cc.available(bi), step
        if op == 0 and len(py.free) >= 6:  # fresh admission
            need = int(rng.integers(1, 5))
            a = py.take(bi, need)
            b = cc.take(bi, need)
            assert a == b, step
            rows[bi] = list(a)
        elif op == 1 and rows.get(bi) and len(py.free) >= 3:  # growth
            extra = int(rng.integers(1, 3))
            a = py.take_extra(bi, extra)
            b = cc.take_extra(bi, extra)
            assert a == b, step
            rows[bi].extend(a)
        elif op == 2 and rows.get(bi):  # behind-window frees
            k = int(rng.integers(1, len(rows[bi]) + 1))
            drop = rows[bi][:k]
            py.release_pages(bi, drop)
            cc.release_pages(bi, drop)
            rows[bi] = rows[bi][k:]
    # final drain parity
    for bi in list(rows):
        if rows[bi]:
            py.release_pages(bi, rows[bi])
            cc.release_pages(bi, rows[bi])
    for bi in range(6):
        assert py.available(bi) == cc.available(bi)
    # full-pool restoration: every page is back on both free lists
    assert sorted(py.free) == list(range(1, 48))
    assert cc.available(0) == 47
    # double release fails loudly on BOTH runtimes (no silent leak)
    a = py.take(0, 2)
    assert cc.take(0, 2) == a
    py.release_pages(0, [a[0]])
    cc.release_pages(0, [a[0]])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        py.release_pages(0, [a[0]])
    with _pytest.raises(ValueError):
        cc.release_pages(0, [a[0]])


def test_prefix_allocator_parity_randomized():
    rng = np.random.default_rng(1)
    pool = 48
    py = PrefixPageAllocator(pool)
    cc = NativePrefixPageAllocator(pool)
    # a small universe of prompt prefixes so hits/evictions actually happen
    prompts = [[_key(p * 100 + i) for i in range(int(rng.integers(1, 7)))]
               for p in range(12)]
    for step in range(2000):
        op = rng.integers(0, 10)
        bi = int(rng.integers(0, 6))
        hashes = prompts[int(rng.integers(0, len(prompts)))]
        span = len(hashes) + int(rng.integers(0, 3))
        if op < 2:  # release
            assert py.release_row(bi) == cc.release_row(bi) == None  # noqa: E711
        elif op < 4:  # pure queries
            assert py.lookup(hashes) == cc.lookup(hashes), step
            assert py.can_take(bi, hashes, span) == cc.can_take(
                bi, hashes, span), step
        else:  # admission: dry-run gate, then take + register
            ok_py = py.can_take(bi, hashes, span)
            ok_cc = cc.can_take(bi, hashes, span)
            assert ok_py == ok_cc, step
            if not ok_py:
                continue
            pages_py, hits_py = py.take(bi, hashes, span)
            pages_cc, hits_cc = cc.take(bi, hashes, span)
            assert (pages_py, hits_py) == (pages_cc, hits_cc), step
            # register the freshly-written full pages (like the engine does)
            py.register(hashes, pages_py[:len(hashes)])
            cc.register(hashes, pages_cc[:len(hashes)])
        assert py.hit_pages == cc.hit_pages, step
        assert py.evictions == cc.evictions, step


def test_prefix_allocator_eviction_order():
    """Eviction must pick the OLDEST unreferenced cached page (LRU front),
    with take() refreshing recency — divergence here changes which prefixes
    survive memory pressure."""
    pool = 5  # pages 1..4
    for alloc_cls in (PrefixPageAllocator, NativePrefixPageAllocator):
        a = alloc_cls(pool)
        ha = [_key(1)]
        hb = [_key(2)]
        pa, _ = a.take(0, ha, 1)
        a.register(ha, pa)
        pb, _ = a.take(1, hb, 1)
        a.register(hb, pb)
        # drop both rows -> both pages cached, unreferenced; A is older
        a.release_row(0)
        a.release_row(1)
        # touch A (hit) -> B becomes LRU
        _, hits = a.take(2, ha, 1)
        assert hits == 1
        a.release_row(2)
        # exhaust the free list, then force one eviction
        a.take(3, [], 2)
        before = a.evictions
        a.take(4, [], 1)
        assert a.evictions == before + 1
        # B was evicted, A survived
        assert a.lookup(hb) == 0, alloc_cls.__name__
        assert a.lookup(ha) == 1, alloc_cls.__name__


def test_chain_hash_keys_are_16_bytes():
    ks = chain_hashes(list(range(512)), 128)
    assert len(ks) == 4 and all(len(k) == 16 for k in ks)
    cc = NativePrefixPageAllocator(8)
    assert cc.lookup(ks) == 0
    with pytest.raises(ValueError):
        cc.lookup([b"short"])


def test_engine_uses_native_when_available():
    """PagedContinuousEngine picks the native allocator automatically and
    produces identical tokens to the Python one (greedy, CPU mesh)."""
    import jax

    from long_context_attention_tpu.models.llama import ModelConfig, init_params
    from long_context_attention_tpu.serving import (
        PagedContinuousEngine,
        Request,
    )

    cfg = ModelConfig(vocab=96, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                      head_dim=32, ffn_hidden=128, layout="basic")
    params = init_params(jax.random.PRNGKey(0), cfg)
    reqs = [Request(id=i, tokens=list(range(2 + 3 * i, 34 + 3 * i)),
                    max_new=6) for i in range(4)]
    outs = {}
    for native in (False, True):
        eng = PagedContinuousEngine(
            cfg, s_max=256, max_batch=2, page_size=128, pool_pages=7,
            prefix_cache=True, native_runtime=native)
        res = eng.serve(params, reqs)
        outs[native] = {r: tuple(res[r].tokens) for r in res}
        assert eng.last_alloc_kind == ("native" if native else "python")
    assert outs[False] == outs[True]


def test_release_pages_failure_is_atomic():
    """A release list containing ANY unowned page must fail loudly AND
    leave the allocator untouched (ADVICE r4: a partially-applied release
    would diverge the runtimes if the caller catches the error)."""
    for cls in (_PageAllocator, NativePageAllocator):
        a = cls(16)
        owned = a.take(0, 4)
        other = a.take(1, 2)
        before_avail = (a.available(0), a.available(1), a.available(5))
        # good page first, bad page second: nothing may be freed
        with pytest.raises(ValueError):
            a.release_pages(0, [owned[0], other[0]])
        assert (a.available(0), a.available(1), a.available(5)) == \
            before_avail, cls.__name__
        # the good page is still owned: releasing it alone succeeds
        a.release_pages(0, [owned[0]])
        assert a.available(5) == before_avail[2] + 1, cls.__name__
        # rows with no pages at all also raise without mutating
        with pytest.raises(ValueError):
            a.release_pages(3, [owned[1]])
        assert a.available(5) == before_avail[2] + 1, cls.__name__
