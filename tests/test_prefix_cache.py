"""Automatic prefix caching (serving/prefix_cache.py): allocator
semantics, bit-exact page sharing, suffix-only prefill correctness, and
scheduler equivalence with the plain paged batcher."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from long_context_attention_tpu.models.llama import (
    ModelConfig,
    decode_multi_step,
    init_params,
)
from long_context_attention_tpu.ops.kv_cache import KVCache
from long_context_attention_tpu.serving import (
    ContinuousEngine,
    PagedContinuousEngine,
    Request,
)
from long_context_attention_tpu.serving.prefix_cache import (
    PrefixPageAllocator,
    chain_hashes,
)

CFG = ModelConfig(vocab=96, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                  head_dim=32, ffn_hidden=128, layout="basic")
S_MAX = 512
PAGE = 128


def _prompt(seed, n):
    return list(np.asarray(
        jax.random.randint(jax.random.PRNGKey(seed), (n,), 0, CFG.vocab)))


# --- host-side pieces -------------------------------------------------------

def test_chain_hashes_identify_shared_prefixes():
    base = _prompt(0, 300)
    other = list(base)
    other[200] = (other[200] + 1) % CFG.vocab  # diverge inside page 1
    ha, hb = chain_hashes(base, PAGE), chain_hashes(other, PAGE)
    assert len(ha) == 2  # 300 tokens -> 2 full pages
    assert ha[0] == hb[0] and ha[1] != hb[1]
    # chaining: agreeing page-2 CONTENT under different prefixes must differ
    shifted = base[PAGE:] + base[:PAGE]
    assert chain_hashes(shifted, PAGE)[1] != ha[1]


def test_allocator_refcount_share_release_evict():
    al = PrefixPageAllocator(pool_pages=6)  # pages 1..5 allocatable
    h = chain_hashes(list(range(PAGE * 2)), PAGE)
    pages, hits = al.take(0, h, 3)
    assert hits == 0 and len(pages) == 3
    al.register(h, pages[:2])
    # second row shares the 2 registered pages
    p2, hits2 = al.take(1, h, 3)
    assert hits2 == 2 and p2[:2] == pages[:2] and p2[2] != pages[2]
    assert al.ref[pages[0]] == 2
    # row 0 released: shared pages stay (ref 1), private page frees
    al.release_row(0)
    assert al.ref[pages[0]] == 1 and pages[2] in al.free
    # row 1 released: registered pages become cached (NOT free), evictable
    al.release_row(1)
    assert pages[0] not in al.free and pages[0] not in al.ref
    assert al.lookup(h) == 2
    # exhaust the free list -> eviction reclaims the cached pages LRU-first
    big, _ = al.take(2, [], 5)
    assert al.evictions >= 2 and sorted(big) == [1, 2, 3, 4, 5]
    assert al.lookup(h) == 0


def test_allocator_can_take_matches_take():
    al = PrefixPageAllocator(pool_pages=4)  # 3 allocatable
    h = chain_hashes(list(range(PAGE)), PAGE)
    assert al.can_take(0, h, 3) and not al.can_take(0, h, 4)
    pages, _ = al.take(0, h, 3)
    al.register(h, pages[:1])
    # row 1: the registered page is shareable even while row 0 holds it
    # (0 fresh pages needed), but any FRESH page is unavailable
    assert al.can_take(1, h, 1) and not al.can_take(1, h, 2)
    # row 0 itself can re-take: its own pages release first, prefix hits
    assert al.can_take(0, h, 3)
    p2, hits = al.take(0, h, 3)
    assert hits == 1 and p2[0] == pages[0]


# --- device-side suffix prefill ---------------------------------------------

def test_decode_multi_step_last_index():
    params = init_params(jax.random.PRNGKey(0), CFG)
    cache = KVCache.init(CFG.n_layers, 2, 256, CFG.n_kv_heads,
                         CFG.head_dim, "bfloat16")
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, CFG.vocab)
    full, _ = decode_multi_step(params, cache, toks, CFG)
    cache2 = KVCache.init(CFG.n_layers, 2, 256, CFG.n_kv_heads,
                          CFG.head_dim, "bfloat16")
    one, _ = decode_multi_step(params, cache2, toks, CFG,
                               last_index=jnp.int32(5))
    np.testing.assert_array_equal(np.asarray(one[:, 0]),
                                  np.asarray(full[:, 5]))


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_suffix_prefill_matches_cold_admission(dtype):
    """The same request admitted COLD vs via a 2-page prefix HIT: shared
    slots are bit-identical (same pool bytes), computed suffix slots and
    the next-token logits agree to the bf16 gate."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    prompt = _prompt(3, 300)
    eng = PagedContinuousEngine(CFG, s_max=S_MAX, max_batch=1,
                                cache_dtype=dtype, page_size=PAGE,
                                pool_pages=12, prefix_cache=True)
    # serve the same prompt twice back-to-back (max_batch=1 -> sequential);
    # request 1 must reuse request 0's 2 full prompt pages
    reqs = [Request(id=0, tokens=prompt, max_new=4),
            Request(id=1, tokens=prompt, max_new=4)]
    res = eng.serve(params, reqs)
    assert eng.stats["prefix_hit_tokens"] == 2 * PAGE
    assert res[0].tokens == res[1].tokens, (res[0].tokens, res[1].tokens)


@pytest.mark.parametrize("overlap", [False, True])
@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_prefix_engine_matches_plain_paged(overlap, dtype):
    """Shared-system-prompt workload: the prefix-caching batcher emits
    exactly the plain paged batcher's greedy tokens while reusing pages."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    system = _prompt(7, 2 * PAGE)  # 2 full shared pages
    reqs = []
    for i, (tail, m) in enumerate([(30, 5), (70, 4), (5, 6), (140, 3)]):
        reqs.append(Request(id=i, tokens=system + _prompt(20 + i, tail),
                            max_new=m))
    reqs.append(Request(id=9, tokens=_prompt(99, 50), max_new=4))  # no share
    kw = dict(s_max=S_MAX, max_batch=2, cache_dtype=dtype,
              host_overlap=overlap, page_size=PAGE, pool_pages=14)
    plain = PagedContinuousEngine(CFG, **kw)
    pfx = PagedContinuousEngine(CFG, prefix_cache=True, prefill_chunk=64,
                                **kw)
    rp = plain.serve(params, reqs)
    rf = pfx.serve(params, reqs)
    assert sorted(rf) == sorted(rp)
    for i in rp:
        assert rf[i].tokens == rp[i].tokens, (i, rf[i].tokens, rp[i].tokens)
    # every request after the first two concurrent ones shares the prefix
    assert pfx.stats["prefix_hit_tokens"] >= 2 * PAGE


def test_prefix_eviction_under_pressure():
    """A pool with no slack evicts cached prefixes instead of leaking; the
    batcher still matches the dense scheduler exactly."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    reqs = [Request(id=i, tokens=_prompt(200 + i, 180), max_new=4)
            for i in range(4)]  # all distinct: misses + evictions
    # 5 allocatable pages, 2 rows x 2 pages in flight: the 3rd admission
    # runs the free list dry and must evict a cached prefix page
    pfx = PagedContinuousEngine(CFG, s_max=S_MAX, max_batch=2,
                                page_size=PAGE, pool_pages=6,
                                prefix_cache=True, prefill_chunk=64)
    dense = ContinuousEngine(CFG, s_max=S_MAX, max_batch=2)
    rf = pfx.serve(params, reqs)
    rd = dense.serve(params, reqs)
    for i in rd:
        assert rf[i].tokens == rd[i].tokens, i
    assert pfx.stats["prefix_hit_tokens"] == 0
    assert pfx.stats["evictions"] > 0
