"""Sharded x paged x prefix serving (VERDICT r4 item 2): the mesh-sharded
paged continuous batcher must emit exactly the dense sharded batcher's
tokens, prefix hits must reuse cross-partition pages bit-exact, and
windowed dynamic paging must reclaim/grow per-partition pools."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from long_context_attention_tpu.models.llama import ModelConfig, init_params
from long_context_attention_tpu.parallel.mesh import make_usp_mesh
from long_context_attention_tpu.serving import (
    Request,
    ShardedContinuousEngine,
    ShardedPagedContinuousEngine,
)

CFG = ModelConfig(vocab=96, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                  head_dim=32, ffn_hidden=128, layout="basic")
S_MAX = 1024     # 8 seq shards x 128-token pages: 1 page per rank per row
PAGE = 128


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def _prompt(seed, n):
    return list(np.asarray(
        jax.random.randint(jax.random.PRNGKey(seed), (n,), 0, CFG.vocab)))


@pytest.mark.parametrize("dtype,blk", [("int8", 1), ("bfloat16", 1),
                                       ("int8", 4)])
def test_sharded_paged_matches_sharded_dense(params, dtype, blk):
    """Same requests, same mesh: the paged pool + per-partition allocators
    must be invisible to the math (queueing, re-admission page reuse, EOS
    included)."""
    mesh = make_usp_mesh(1, 2, 4)
    reqs = [Request(id=i, tokens=_prompt(50 + i, n), max_new=m)
            for i, (n, m) in enumerate([(24, 6), (40, 4), (100, 8),
                                        (17, 3), (60, 5)])]
    dense = ShardedContinuousEngine(CFG, s_max=S_MAX, max_batch=2,
                                    cache_dtype=dtype, mesh=mesh,
                                    step_block=blk)
    paged = ShardedPagedContinuousEngine(
        CFG, s_max=S_MAX, max_batch=2, cache_dtype=dtype, mesh=mesh,
        step_block=blk, page_size=PAGE, pool_pages=8 * 4)
    rd = dense.serve(params, reqs)
    rp = paged.serve(params, reqs)
    assert sorted(rp) == sorted(rd)
    for i in rd:
        assert rp[i].tokens == rd[i].tokens, (i, rp[i].tokens, rd[i].tokens)


def test_sharded_paged_prefix_cache(params):
    """A shared page-aligned system prompt: the second request's prefix
    pages come from the partitioned content cache (hit tokens > 0) and its
    tokens still equal the dense sharded engine's."""
    mesh = make_usp_mesh(1, 2, 4)
    system = _prompt(123, 2 * PAGE)  # spans logical pages 0,1 (2 partitions)
    reqs = [Request(id=0, tokens=system + _prompt(1, 30), max_new=5),
            Request(id=1, tokens=system + _prompt(2, 45), max_new=5),
            Request(id=2, tokens=system + _prompt(3, 10), max_new=4)]
    dense = ShardedContinuousEngine(CFG, s_max=S_MAX, max_batch=2,
                                    cache_dtype="int8", mesh=mesh)
    paged = ShardedPagedContinuousEngine(
        CFG, s_max=S_MAX, max_batch=2, cache_dtype="int8", mesh=mesh,
        page_size=PAGE, pool_pages=8 * 6, prefix_cache=True)
    rd = dense.serve(params, reqs)
    rp = paged.serve(params, reqs)
    for i in rd:
        assert rp[i].tokens == rd[i].tokens, (i, rp[i].tokens, rd[i].tokens)
    # requests 1 and 2 hit the 2 registered system pages each
    assert paged.stats["prefix_hit_tokens"] == 2 * 2 * PAGE, paged.stats


def test_sharded_paged_windowed_reclaim(params):
    """Sliding-window dynamic paging across partitions: pages behind the
    window free from their OWNER partition while fresh growth pages come
    from the partitions decode advances into; tokens equal the dense
    sharded windowed engine's."""
    wcfg = dataclasses.replace(CFG, window_left=100, sink_tokens=16)
    mesh = make_usp_mesh(1, 2, 4)
    # request 1: 360 + 40 crosses page 3 (partition 3) -> on-demand GROWTH
    # there, while reclamation frees page 1 (partition 1) behind the window
    reqs = [Request(id=0, tokens=_prompt(30, 150), max_new=30),
            Request(id=1, tokens=_prompt(31, 360), max_new=40),
            Request(id=2, tokens=_prompt(32, 40), max_new=20)]
    dense = ShardedContinuousEngine(wcfg, s_max=S_MAX, max_batch=2,
                                    cache_dtype="int8", mesh=mesh)
    paged = ShardedPagedContinuousEngine(
        wcfg, s_max=S_MAX, max_batch=2, cache_dtype="int8", mesh=mesh,
        page_size=PAGE, pool_pages=8 * 4)
    assert paged._windowed_paging
    rd = dense.serve(params, reqs)
    rp = paged.serve(params, reqs)
    for i in rd:
        assert rp[i].tokens == rd[i].tokens, (i, rp[i].tokens, rd[i].tokens)


def test_sharded_paged_backpressure_and_capacity(params):
    """Per-partition capacity: a request whose page need exceeds one
    partition's allocatable pages is rejected loudly; a pool that fits one
    request at a time defers admission but completes all."""
    mesh = make_usp_mesh(1, 2, 2)  # 4 shards: ppr = 2 logical pages/rank
    paged = ShardedPagedContinuousEngine(
        CFG, s_max=S_MAX, max_batch=2, mesh=mesh, page_size=PAGE,
        pool_pages=4 * 2)
    # needs 2 pages on partition 0, which has p_local - 1 = 1 allocatable
    with pytest.raises(ValueError, match="partition"):
        paged.serve(params, [Request(id=9, tokens=_prompt(5, 100),
                                     max_new=100)])
    # one page per request: strictly serialized through the pool
    reqs = [Request(id=i, tokens=_prompt(70 + i, 100), max_new=8)
            for i in range(3)]
    dense = ShardedContinuousEngine(CFG, s_max=S_MAX, max_batch=2,
                                    mesh=mesh)
    rp = paged.serve(params, reqs)
    rd = dense.serve(params, reqs)
    for i in rd:
        assert rp[i].tokens == rd[i].tokens, i


def test_sharded_paged_speculative_matches_plain(params):
    """The full serving matrix point — sharded x paged x speculative:
    greedy self-draft rounds over the partitioned pool must emit exactly
    the dense sharded continuous engine's tokens (speculative greedy ==
    target-greedy; paging == dense; sharding == single device — all three
    invariances at once)."""
    from long_context_attention_tpu.serving import (
        ShardedPagedSpeculativeContinuousEngine,
    )

    mesh = make_usp_mesh(1, 2, 4)
    reqs = [Request(id=i, tokens=_prompt(80 + i, n), max_new=m)
            for i, (n, m) in enumerate([(24, 6), (60, 5), (100, 7)])]
    dense = ShardedContinuousEngine(CFG, s_max=S_MAX, max_batch=2,
                                    cache_dtype="int8", mesh=mesh)
    spec = ShardedPagedSpeculativeContinuousEngine(
        CFG, s_max=S_MAX, max_batch=2, cache_dtype="int8", mesh=mesh,
        page_size=PAGE, pool_pages=8 * 4, gamma=3, draft_cfg=CFG)
    rd = dense.serve(params, reqs)
    rs = spec.serve(params, params, reqs)  # self-draft: greedy == target
    for i in rd:
        assert rs[i].tokens == rd[i].tokens, (i, rs[i].tokens, rd[i].tokens)


def test_sharded_paged_speculative_prefix_cache(params):
    """Prefix caching composes with the sharded paged speculative engine:
    the shared system prompt's pages hit across partitions."""
    from long_context_attention_tpu.serving import (
        ShardedPagedSpeculativeContinuousEngine,
    )

    mesh = make_usp_mesh(1, 2, 4)
    system = _prompt(321, PAGE)
    reqs = [Request(id=0, tokens=system + _prompt(1, 20), max_new=4),
            Request(id=1, tokens=system + _prompt(2, 35), max_new=4)]
    dense = ShardedContinuousEngine(CFG, s_max=S_MAX, max_batch=2,
                                    cache_dtype="int8", mesh=mesh)
    spec = ShardedPagedSpeculativeContinuousEngine(
        CFG, s_max=S_MAX, max_batch=2, cache_dtype="int8", mesh=mesh,
        page_size=PAGE, pool_pages=8 * 5, gamma=2, draft_cfg=CFG,
        prefix_cache=True)
    rd = dense.serve(params, reqs)
    rs = spec.serve(params, params, reqs)
    for i in rd:
        assert rs[i].tokens == rd[i].tokens, (i, rs[i].tokens, rd[i].tokens)
    assert spec.stats["prefix_hit_tokens"] == PAGE, spec.stats


def test_sharded_paged_interleaved_admission(params):
    """Decode-interleaved chunked admission on the SHARDED paged engine:
    prompts prefill chunk-by-chunk through the sharded pool view (owner-
    routed appends) with decode blocks between chunks. fp32 model: the
    chunked path teacher-forces through the multi-token decode kernel
    while batch admission uses the flash prefill kernel — equal math,
    different bf16 accumulation order (see tests/test_paged.py CFG32
    note), so the cross-scheduler trajectory gate runs in fp32."""
    cfg32 = dataclasses.replace(CFG, dtype=jnp.float32)
    params32 = init_params(jax.random.PRNGKey(0), cfg32)
    mesh = make_usp_mesh(1, 2, 4)
    reqs = [Request(id=i, tokens=_prompt(90 + i, n), max_new=m)
            for i, (n, m) in enumerate([(150, 6), (40, 4), (200, 5)])]
    kw = dict(s_max=S_MAX, max_batch=2, cache_dtype="int8", mesh=mesh,
              page_size=PAGE, pool_pages=8 * 4)
    plain = ShardedPagedContinuousEngine(cfg32, **kw)
    inter = ShardedPagedContinuousEngine(cfg32, interleave_admission=True,
                                         prefill_chunk=64, **kw)
    rp = plain.serve(params32, reqs)
    ri = inter.serve(params32, reqs)
    for i in rp:
        assert ri[i].tokens == rp[i].tokens, (i, ri[i].tokens, rp[i].tokens)


def test_partitioned_release_is_atomic_and_guards_exist():
    """r5 review fixes: (a) _PartitionedPageAllocator.release_pages with
    any unowned page mutates NOTHING (partitions are individually atomic
    but must also be jointly atomic); (b) windowed dynamic paging with an
    under-provisioned partition is rejected at CONSTRUCTION (the rolling
    band moves across partitions — growth must never exhaust one
    mid-serve); (c) the speculative sharded paged engine rejects
    interleave_admission like its single-host twin."""
    from long_context_attention_tpu.serving.continuous import _PageAllocator
    from long_context_attention_tpu.serving.paged_sharded import (
        _PartitionedPageAllocator,
        ShardedPagedSpeculativeContinuousEngine,
    )

    a = _PartitionedPageAllocator(16, 2, 2, _PageAllocator)
    owned = a.take(0, 4)          # spans both partitions (ppr=2)
    assert len({p // 8 for p in owned}) == 2
    before = [list(part.free) for part in a.parts]
    with pytest.raises(ValueError):
        a.release_pages(0, [owned[0], 999])   # good page first, bad second
    assert [list(part.free) for part in a.parts] == before
    a.release_pages(0, [owned[0], owned[2]])  # cross-partition release ok
    assert not a.available_for(0, 99)

    wcfg = dataclasses.replace(CFG, window_left=100)
    mesh = make_usp_mesh(1, 2, 2)
    with pytest.raises(ValueError, match="partition"):
        ShardedPagedContinuousEngine(
            wcfg, s_max=S_MAX, max_batch=2, mesh=mesh, page_size=PAGE,
            pool_pages=4 * 3)  # 2 allocatable/partition < 2 rows x 2 pages

    with pytest.raises(ValueError, match="interleave"):
        ShardedPagedSpeculativeContinuousEngine(
            CFG, s_max=S_MAX, max_batch=2, mesh=make_usp_mesh(1, 2, 4),
            page_size=PAGE, pool_pages=8 * 4, gamma=2, draft_cfg=CFG,
            interleave_admission=True)


def test_ring_sage_direct_rejects_unsupported(rng=None):
    """r5 review fix: the direct-int8 sage ring fails LOUDLY on softcap /
    segment_ids instead of silently dropping them (the FA3-adapter
    failure mode the codebase is designed to avoid)."""
    import functools

    from jax.sharding import Mesh, PartitionSpec as P

    from long_context_attention_tpu.parallel.ring import ring_attention_local

    q = jnp.zeros((1, 64, 4, 32), jnp.bfloat16)
    k = jnp.zeros((1, 64, 2, 32), jnp.bfloat16)
    mesh = Mesh(np.array(jax.devices()[:2]), ("ring",))
    spec = P(None, "ring", None, None)

    def run(**kw):
        fn = functools.partial(ring_attention_local, axis_name="ring",
                               impl="sage", kv_quant="int8", causal=True,
                               **kw)
        return jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * 3,
                                     out_specs=spec, check_vma=False))(
            q, k, k)

    with pytest.raises(NotImplementedError, match="softcap"):
        run(softcap=30.0)
    seg = jnp.zeros((1, 64), jnp.int32)
    with pytest.raises(NotImplementedError, match="segment"):
        run(segment_ids=seg)
