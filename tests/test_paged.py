"""Paged KV cache: kernel parity with the dense cache, page-straddling
appends, and scheduler equivalence — the paged continuous batcher must
emit exactly the dense batcher's tokens while fitting more rows than the
dense layout could."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from long_context_attention_tpu.models.llama import (
    ModelConfig,
    decode_step,
    init_params,
)
from long_context_attention_tpu.ops.decode import cache_append, decode_attention
from long_context_attention_tpu.ops.kv_cache import PagedKVCache, quantize_kv
from long_context_attention_tpu.serving import (
    ContinuousEngine,
    PagedContinuousEngine,
    Request,
)

CFG = ModelConfig(vocab=96, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                  head_dim=32, ffn_hidden=128, layout="basic")
S_MAX = 512
PAGE = 128


def _scatter_to_pool(k_d, pt, pool_pages):
    """(L, b, h, S, d) dense -> (L, P, h, page, d) pool per table."""
    L, b, h, S, d = k_d.shape
    n_pages = pt.shape[1]
    pool = np.zeros((L, pool_pages, h, PAGE, d), np.float32)
    for bb in range(b):
        for i in range(n_pages):
            p = int(pt[bb, i])
            if p < 0:
                continue
            pool[:, p] = np.asarray(
                k_d[:, bb, :, i * PAGE:(i + 1) * PAGE], np.float32)
    return pool


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_paged_decode_matches_dense(dtype):
    rng = np.random.default_rng(0)
    B, H, HKV, D, L, POOL = 2, 8, 4, 32, 3, 8
    NP = S_MAX // PAGE
    k_d = jnp.asarray(rng.normal(size=(L, B, HKV, S_MAX, D)), jnp.bfloat16)
    v_d = jnp.asarray(rng.normal(size=(L, B, HKV, S_MAX, D)), jnp.bfloat16)
    if dtype == "int8":
        k_d, ks_d = quantize_kv(k_d, "int8")
        v_d, vs_d = quantize_kv(v_d, "int8")
        ks_d, vs_d = ks_d[..., None, :], vs_d[..., None, :]
    else:
        ks_d = vs_d = None
    lengths = jnp.asarray([300, 450], jnp.int32)
    pt = np.full((B, NP), -1, np.int32)
    pt[0, :3] = [1, 2, 3]
    pt[1, :4] = [4, 5, 6, 7]

    k_p = jnp.asarray(_scatter_to_pool(k_d, pt, POOL), k_d.dtype)
    v_p = jnp.asarray(_scatter_to_pool(v_d, pt, POOL), v_d.dtype)
    ks_p = vs_p = None
    if ks_d is not None:
        ks_p = jnp.asarray(_scatter_to_pool(
            jnp.moveaxis(ks_d, 3, 3)[..., 0, :, None], pt, POOL
        )[..., 0], jnp.float32)[:, :, :, None, :]
        vs_p = jnp.asarray(_scatter_to_pool(
            jnp.moveaxis(vs_d, 3, 3)[..., 0, :, None], pt, POOL
        )[..., 0], jnp.float32)[:, :, :, None, :]

    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.bfloat16)
    o_d, l_d = decode_attention(q, k_d, v_d, lengths, ks_d, vs_d,
                                layer=jnp.int32(1), return_lse=True,
                                block_kv=PAGE)
    o_p, l_p = decode_attention(q, k_p, v_p, lengths, ks_p, vs_p,
                                layer=jnp.int32(1), return_lse=True,
                                page_table=jnp.asarray(pt))
    np.testing.assert_array_equal(np.asarray(o_d, np.float32),
                                  np.asarray(o_p, np.float32))
    np.testing.assert_array_equal(np.asarray(l_d), np.asarray(l_p))


def test_paged_append_straddles_pages():
    """A multi-token run crossing a page boundary lands each token in its
    owner page; inactive rows write nothing anywhere in the pool."""
    rng = np.random.default_rng(1)
    B, HKV, D, L, POOL = 2, 4, 32, 3, 8
    NP = S_MAX // PAGE
    pt = np.full((B, NP), -1, np.int32)
    pt[0, :3] = [1, 2, 3]
    pt[1, :2] = [4, 5]
    k_p = jnp.asarray(rng.normal(size=(L, POOL, HKV, PAGE, D)), jnp.bfloat16)
    v_p = jnp.asarray(rng.normal(size=(L, POOL, HKV, PAGE, D)), jnp.bfloat16)
    n = 5
    kn = jnp.asarray(rng.normal(size=(B, HKV, n, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(B, HKV, n, D)), jnp.bfloat16)
    pos = jnp.asarray([PAGE - 2, -n], jnp.int32)  # row 0 crosses page 1->2
    k2, v2 = cache_append(k_p, v_p, kn, vn, pos, layer=jnp.int32(2),
                          page_table=jnp.asarray(pt))
    for t in range(n):
        s = (PAGE - 2) + t
        pg, off = int(pt[0, s // PAGE]), s % PAGE
        np.testing.assert_array_equal(
            np.asarray(k2[2, pg, :, off], np.float32),
            np.asarray(kn[0, :, t], np.float32))
    # row 1 inactive: its pages untouched
    np.testing.assert_array_equal(np.asarray(v2[2, 4]), np.asarray(v_p[2, 4]))
    np.testing.assert_array_equal(np.asarray(k2[2, 5]), np.asarray(k_p[2, 5]))
    # other layers untouched
    np.testing.assert_array_equal(np.asarray(k2[0]), np.asarray(k_p[0]))


def test_paged_decode_step_matches_dense_cache():
    """A full decode_step over a PagedKVCache equals the same step over a
    dense KVCache holding identical logical content."""
    from long_context_attention_tpu.ops.kv_cache import KVCache

    params = init_params(jax.random.PRNGKey(0), CFG)
    b = 2
    dense = KVCache.init(CFG.n_layers, b, S_MAX, CFG.n_kv_heads,
                         CFG.head_dim, "int8")
    rng = np.random.default_rng(2)
    kseed = jnp.asarray(rng.normal(size=(b, 200, CFG.n_kv_heads,
                                         CFG.head_dim)), jnp.bfloat16)
    vseed = jnp.asarray(rng.normal(size=(b, 200, CFG.n_kv_heads,
                                         CFG.head_dim)), jnp.bfloat16)
    for li in range(CFG.n_layers):
        dense = dense.write_prompt(li, kseed, vseed)
    dense = dense.advance(200)

    POOL = 2 * (S_MAX // PAGE) + 1
    paged = PagedKVCache.init(CFG.n_layers, b, POOL, PAGE, S_MAX // PAGE,
                              CFG.n_kv_heads, CFG.head_dim, "int8")
    pt = np.full((b, S_MAX // PAGE), -1, np.int32)
    k_pool = np.asarray(paged.k, np.int8).copy()
    v_pool = np.asarray(paged.v, np.int8).copy()
    ks_pool = np.asarray(paged.k_scale).copy()
    vs_pool = np.asarray(paged.v_scale).copy()
    nxt = 1
    for bb in range(b):
        for i in range(-(-200 // PAGE)):
            pt[bb, i] = nxt
            k_pool[:, nxt] = np.asarray(
                dense.k[:, bb, :, i * PAGE:(i + 1) * PAGE])
            v_pool[:, nxt] = np.asarray(
                dense.v[:, bb, :, i * PAGE:(i + 1) * PAGE])
            ks_pool[:, nxt] = np.asarray(
                dense.k_scale[:, bb, :, :, i * PAGE:(i + 1) * PAGE])
            vs_pool[:, nxt] = np.asarray(
                dense.v_scale[:, bb, :, :, i * PAGE:(i + 1) * PAGE])
            nxt += 1
    paged = dataclasses.replace(
        paged, k=jnp.asarray(k_pool), v=jnp.asarray(v_pool),
        k_scale=jnp.asarray(ks_pool), v_scale=jnp.asarray(vs_pool),
        page_table=jnp.asarray(pt),
        length=jnp.full((b,), 200, jnp.int32))

    tok = jnp.asarray([3, 7], jnp.int32)
    ld, _ = decode_step(params, dense, tok, CFG)
    lp, paged2 = decode_step(params, paged, tok, CFG)
    # not bit-equal: the paged kernel's tile size IS the page (128) while
    # the dense default down-fits to s_max (512) — different online-softmax
    # accumulation order. Same-tile-size parity is exact (see
    # test_paged_decode_matches_dense).
    np.testing.assert_allclose(np.asarray(ld), np.asarray(lp),
                               atol=5e-2, rtol=0)
    assert paged2.length.tolist() == [201, 201]


def _prompt(seed, n):
    return list(np.asarray(
        jax.random.randint(jax.random.PRNGKey(seed), (n,), 0, CFG.vocab)))


@pytest.mark.parametrize("overlap", [False, True])
@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_paged_continuous_matches_dense(overlap, dtype):
    """The paged batcher emits exactly the dense batcher's greedy tokens
    — through queueing, page reuse across re-admissions, and EOS."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    reqs = [Request(id=i, tokens=_prompt(50 + i, n), max_new=m)
            for i, (n, m) in enumerate([(24, 6), (40, 4), (100, 8),
                                        (17, 3), (60, 5)])]
    dense = ContinuousEngine(CFG, s_max=S_MAX, max_batch=2,
                             cache_dtype=dtype, host_overlap=overlap)
    # pool: enough for ~2 rows of worst-case requests + scratch
    paged = PagedContinuousEngine(CFG, s_max=S_MAX, max_batch=2,
                                  cache_dtype=dtype, host_overlap=overlap,
                                  page_size=PAGE, pool_pages=7)
    rd = dense.serve(params, reqs)
    rp = paged.serve(params, reqs)
    assert sorted(rp) == sorted(rd)
    for i in rd:
        assert rp[i].tokens == rd[i].tokens, (i, rp[i].tokens, rd[i].tokens)


def test_paged_backpressure_still_completes():
    """A pool too small for two concurrent big requests defers admission
    (rows idle) but every request still completes correctly."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    # each request needs 2 pages (bucket 128 + budget); pool of 3 = scratch
    # + 2 allocatable -> strictly one request resident at a time
    reqs = [Request(id=i, tokens=_prompt(70 + i, 100), max_new=8)
            for i in range(3)]
    paged = PagedContinuousEngine(CFG, s_max=256, max_batch=2,
                                  page_size=PAGE, pool_pages=3)
    dense = ContinuousEngine(CFG, s_max=256, max_batch=2)
    rp = paged.serve(params, reqs)
    rd = dense.serve(params, reqs)
    for i in rd:
        assert rp[i].tokens == rd[i].tokens, i

    with pytest.raises(ValueError, match="pages"):
        paged.serve(params, [Request(id=9, tokens=_prompt(1, 100),
                                     max_new=200)])


# --- decode-interleaved chunked admission -----------------------------------

# Cold interleaved admission prefills through the multi-token DECODE kernel
# while batch admission uses the flash PREFILL kernel — equal math, different
# bf16 accumulation order, so a bf16 model can flip greedy near-ties between
# the two schedulers. An f32 model makes the cross-scheduler trajectory
# comparison exact: the ~1e-7 kernel differences vanish inside the cache's
# bf16/int8 storage rounding (kernel-level parity of both compute paths is
# gated separately in test_prefix_cache.py / test_decode.py).
CFG32 = dataclasses.replace(CFG, dtype=jnp.float32)


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_interleaved_admission_matches_plain(dtype):
    """interleave_admission=True (cold prompts chunk through the suffix
    path, decode blocks between chunks) emits exactly the batch-admission
    paged scheduler's greedy tokens."""
    params = init_params(jax.random.PRNGKey(0), CFG32)
    reqs = [Request(id=i, tokens=_prompt(50 + i, n), max_new=m)
            for i, (n, m) in enumerate([(24, 6), (200, 4), (100, 8),
                                        (17, 3), (300, 5)])]
    kw = dict(s_max=S_MAX, max_batch=2, cache_dtype=dtype,
              page_size=PAGE, pool_pages=12)
    plain = PagedContinuousEngine(CFG32, **kw)
    inter = PagedContinuousEngine(CFG32, interleave_admission=True,
                                  prefill_chunk=64, **kw)
    rp = plain.serve(params, reqs)
    ri = inter.serve(params, reqs)
    assert sorted(ri) == sorted(rp)
    for i in rp:
        assert ri[i].tokens == rp[i].tokens, (i, ri[i].tokens, rp[i].tokens)


def test_interleaved_admission_with_prefix_cache():
    """Chunked admission composes with automatic prefix caching: shared
    pages are still hit and trajectories still match the plain engine."""
    params = init_params(jax.random.PRNGKey(0), CFG32)
    system = _prompt(7, 2 * PAGE)
    reqs = [Request(id=i, tokens=system + _prompt(20 + i, t), max_new=m)
            for i, (t, m) in enumerate([(30, 5), (70, 4), (5, 6)])]
    kw = dict(s_max=S_MAX, max_batch=2, page_size=PAGE, pool_pages=14)
    plain = PagedContinuousEngine(CFG32, **kw)
    inter = PagedContinuousEngine(CFG32, interleave_admission=True,
                                  prefix_cache=True, prefill_chunk=64, **kw)
    rp = plain.serve(params, reqs)
    ri = inter.serve(params, reqs)
    for i in rp:
        assert ri[i].tokens == rp[i].tokens, i
    assert inter.stats["prefix_hit_tokens"] >= 2 * PAGE


def test_interleaved_admission_decodes_between_chunks():
    """The fairness property itself: while a long prompt admits, the
    already-running row keeps emitting tokens BETWEEN its prefill chunks
    (device-call order observed via a probing subclass)."""
    LOG = []

    @dataclasses.dataclass(frozen=True)
    class _Probe(PagedContinuousEngine):
        def _admission_advance(self, params, cache, st):
            LOG.append("chunk")
            return super()._admission_advance(params, cache, st)

        def _step(self, *a, **k):
            LOG.append("step")
            return PagedContinuousEngine._step(self, *a, **k)

    params = init_params(jax.random.PRNGKey(0), CFG)
    # req 0: short prompt, long budget (keeps decoding); req 1: 4-chunk
    # prompt admitted while req 0 runs
    reqs = [Request(id=0, tokens=_prompt(1, 16), max_new=12),
            Request(id=1, tokens=_prompt(2, 250), max_new=3)]
    eng = _Probe(CFG, s_max=S_MAX, max_batch=2, page_size=PAGE,
                 pool_pages=12, interleave_admission=True, prefill_chunk=64)
    res = eng.serve(params, reqs)
    assert set(res) == {0, 1}
    # req 1's 250-token prompt = 4 chunks of 64; at least one decode step
    # must land between consecutive chunks of that admission
    chunk_pos = [i for i, e in enumerate(LOG) if e == "chunk"]
    assert len(chunk_pos) >= 4, LOG
    interleaved = any(
        LOG[a + 1:b].count("step") > 0
        for a, b in zip(chunk_pos, chunk_pos[1:]))
    assert interleaved, LOG


def test_interleaved_rejects_host_overlap():
    with pytest.raises(ValueError, match="host_overlap"):
        PagedContinuousEngine(CFG, s_max=S_MAX, max_batch=2, page_size=PAGE,
                              pool_pages=4, interleave_admission=True,
                              host_overlap=True)


def test_paged_speculative_matches_dense_speculative():
    """The full serving-matrix point: paged pool x speculative rounds x
    continuous batching emits exactly the dense speculative engine's (and
    therefore the plain target-greedy) tokens, through queueing, page
    reuse, rollback past page boundaries, and prefix sharing."""
    from long_context_attention_tpu.serving import (
        PagedSpeculativeContinuousEngine,
        SpeculativeContinuousEngine,
    )

    params = init_params(jax.random.PRNGKey(0), CFG)
    dcfg = dataclasses.replace(CFG, n_layers=1)
    dparams = init_params(jax.random.PRNGKey(7), dcfg)
    shared = _prompt(90, 140)  # > page_size: a full shared page
    reqs = [Request(id=i, tokens=shared + _prompt(50 + i, n), max_new=m)
            for i, (n, m) in enumerate([(12, 7), (40, 5), (80, 9), (18, 4)])]

    dense = SpeculativeContinuousEngine(
        CFG, s_max=S_MAX, max_batch=2, draft_cfg=dcfg, gamma=3
    ).serve(params, dparams, reqs)
    for prefix in (False, True):
        paged = PagedSpeculativeContinuousEngine(
            CFG, s_max=S_MAX, max_batch=2, draft_cfg=dcfg, gamma=3,
            page_size=PAGE, pool_pages=9, prefix_cache=prefix,
        )
        got = paged.serve(params, dparams, reqs)
        assert sorted(got) == sorted(dense)
        for i in dense:
            assert got[i].tokens == dense[i].tokens, (
                prefix, i, got[i].tokens, dense[i].tokens)
        if prefix:
            assert paged.stats["prefix_hit_tokens"] > 0


def test_paged_speculative_capacity_guard():
    from long_context_attention_tpu.serving import (
        PagedSpeculativeContinuousEngine,
    )

    params = init_params(jax.random.PRNGKey(0), CFG)
    dcfg = dataclasses.replace(CFG, n_layers=1)
    eng = PagedSpeculativeContinuousEngine(
        CFG, s_max=256, max_batch=2, draft_cfg=dcfg, gamma=3,
        page_size=PAGE, pool_pages=3)
    with pytest.raises(ValueError, match="pages"):
        eng.serve(params, init_params(jax.random.PRNGKey(7), dcfg),
                  [Request(id=0, tokens=_prompt(1, 100), max_new=200)])


def test_paged_windowed_banded_matches_dense():
    """Sliding window + sinks over a PAGED cache rides the banded grid too
    (the banded gt is the logical block, routed through the page table):
    bit-parity with the dense windowed (banded) kernel across lengths."""
    rng = np.random.default_rng(3)
    B, H, HKV, D, L, POOL = 2, 8, 4, 32, 2, 18
    SM2, W, SINK = 2048, 200, 37
    NP = SM2 // PAGE  # 16 logical pages; band ~ 1 + 2 + 2 << 16 -> banded
    k_d = jnp.asarray(rng.normal(size=(L, B, HKV, SM2, D)), jnp.bfloat16)
    v_d = jnp.asarray(rng.normal(size=(L, B, HKV, SM2, D)), jnp.bfloat16)
    lengths = jnp.asarray([1900, 301], jnp.int32)
    pt = np.full((B, NP), -1, np.int32)
    pt[0, :15] = np.arange(1, 16)
    pt[1, :3] = [16, 17, 0]

    def scatter(x):
        pool = np.zeros((L, POOL, HKV, PAGE, D), np.float32)
        for bb in range(B):
            for i in range(NP):
                p = int(pt[bb, i])
                if p >= 0:
                    pool[:, p] = np.asarray(
                        x[:, bb, :, i * PAGE:(i + 1) * PAGE], np.float32)
        return jnp.asarray(pool, x.dtype)

    k_p, v_p = scatter(k_d), scatter(v_d)
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.bfloat16)
    kw = dict(layer=jnp.int32(1), window_size=(W, -1), sink_tokens=SINK)
    o_d = decode_attention(q, k_d, v_d, lengths, block_kv=PAGE, **kw)
    o_p = decode_attention(q, k_p, v_p, lengths,
                           page_table=jnp.asarray(pt), **kw)
    np.testing.assert_array_equal(np.asarray(o_d, np.float32),
                                  np.asarray(o_p, np.float32))


def test_windowed_paging_reclaims_and_grows():
    """Sliding-window dynamic paging (r4): rows hold only O(window) pages —
    growth pages assigned on demand as decode crosses page boundaries,
    behind-window pages freed WHILE the row runs — so max_new no longer
    inflates the reservation and two long-decode rows fit a pool the
    whole-span scheme could not share. Tokens must equal the dense
    ContinuousEngine's."""
    import dataclasses as dc

    from long_context_attention_tpu.serving import continuous as C

    wcfg = dc.replace(CFG, window_left=96)
    params = init_params(jax.random.PRNGKey(0), wcfg)
    rng = np.random.default_rng(5)
    reqs = [Request(id=i,
                    tokens=list(rng.integers(0, wcfg.vocab, size=100)),
                    max_new=300) for i in range(2)]

    # instrument the python allocator to observe peak pool usage
    peak = {"v": 0}
    orig_take, orig_extra = C._PageAllocator.take, C._PageAllocator.take_extra

    def note(alloc):
        peak["v"] = max(peak["v"], (alloc and 0) or 0)

    def take(self, bi, need):
        r = orig_take(self, bi, need)
        peak["v"] = max(peak["v"], 47 - len(self.free))
        return r

    def take_extra(self, bi, need):
        r = orig_extra(self, bi, need)
        peak["v"] = max(peak["v"], 47 - len(self.free))
        return r

    C._PageAllocator.take, C._PageAllocator.take_extra = take, take_extra
    try:
        eng = PagedContinuousEngine(
            wcfg, s_max=512, max_batch=2, page_size=PAGE, pool_pages=48,
            native_runtime=False)
        assert eng._windowed_paging
        # whole-span need would be ceil(400/128) = 4 pages/row; windowed
        # reservation is the rolling working set
        assert eng._pages_needed(reqs[0]) < 4
        results = eng.serve(params, reqs)
    finally:
        C._PageAllocator.take, C._PageAllocator.take_extra = \
            orig_take, orig_extra

    # exact reference: the SAME paged engine with dynamic paging forced
    # off (whole-span reservations, no reclamation) — identical kernels,
    # so reclamation must be invisible to the math. (Dense-vs-paged can
    # flip one-bf16-ulp logit ties: different kv tile sizes.)
    class _NoWin(PagedContinuousEngine):
        @property
        def _windowed_paging(self):
            return False

    ref = _NoWin(wcfg, s_max=512, max_batch=2, page_size=PAGE,
                 pool_pages=48, native_runtime=False).serve(params, reqs)
    for r in reqs:
        assert results[r.id].tokens == ref[r.id].tokens, r.id
    # steady-state usage stayed at the rolling working set, far below the
    # whole-span 2 rows x 4 pages
    assert peak["v"] <= 2 * eng._rolling_pages(), peak["v"]
    # reclamation + growth actually happened
    st = eng._rowwin[0]
    assert st["next_free"] > 0 and st["assigned"] > eng._pages_needed(reqs[0])

    # a pool the whole-span scheme could not even START with still serves
    small = PagedContinuousEngine(
        wcfg, s_max=512, max_batch=2, page_size=PAGE, pool_pages=7,
        native_runtime=False)
    res2 = small.serve(params, reqs)
    for r in reqs:
        assert res2[r.id].tokens == ref[r.id].tokens, r.id


def test_windowed_paging_with_sinks_matches_dense():
    """window + StreamingLLM sinks under dynamic paging: sink pages stay
    pinned while the window rolls; greedy tokens equal the dense engine."""
    import dataclasses as dc

    wcfg = dc.replace(CFG, window_left=96, sink_tokens=8)
    params = init_params(jax.random.PRNGKey(0), wcfg)
    rng = np.random.default_rng(9)
    reqs = [Request(id=i,
                    tokens=list(rng.integers(0, wcfg.vocab, size=130)),
                    max_new=250) for i in range(2)]
    eng = PagedContinuousEngine(
        wcfg, s_max=512, max_batch=2, page_size=PAGE, pool_pages=10,
        native_runtime=False, step_block=3)  # growth spans whole blocks
    results = eng.serve(params, reqs)

    class _NoWin(PagedContinuousEngine):
        @property
        def _windowed_paging(self):
            return False

    ref = _NoWin(wcfg, s_max=512, max_batch=2, page_size=PAGE,
                 pool_pages=48, native_runtime=False,
                 step_block=3).serve(params, reqs)
    for r in reqs:
        assert results[r.id].tokens == ref[r.id].tokens, r.id
    # the sink page was never freed
    assert all(st["next_free"] >= 1 for st in eng._rowwin.values())


def test_windowed_paging_tight_pool_no_midserve_crash():
    """Regression (r4 review): growth ran BEFORE reclamation, so a row's
    transient usage exceeded its admission reservation by one page and
    take_extra blew up mid-serve on a pool _can_admit accepted. The
    reviewer's repro config: window 124, step_block 2, page 128, pool 5."""
    import dataclasses as dc

    wcfg = dc.replace(CFG, window_left=124)
    params = init_params(jax.random.PRNGKey(0), wcfg)
    rng = np.random.default_rng(11)
    reqs = [Request(id=i,
                    tokens=list(rng.integers(0, wcfg.vocab, size=100)),
                    max_new=300) for i in range(2)]
    eng = PagedContinuousEngine(
        wcfg, s_max=512, max_batch=2, page_size=PAGE, pool_pages=5,
        native_runtime=False, step_block=2)
    results = eng.serve(params, reqs)  # must not raise
    for r in reqs:
        assert len(results[r.id].tokens) == r.max_new
