"""Serving engine: prefill + decode consistency with the training forward.

The cache-consistency gate: greedy decode through the KVCache must reproduce
exactly the tokens the full (cache-free) forward would pick teacher-forced.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from long_context_attention_tpu.models.llama import ModelConfig, init_params, make_forward
from long_context_attention_tpu.parallel import make_usp_mesh
from long_context_attention_tpu.serving import Engine

CFG = ModelConfig(vocab=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                  head_dim=32, ffn_hidden=128,
                  layout="basic")  # odd-length teacher-forced seqs
B, S_PROMPT, MAX_NEW = 2, 16, 8


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, S_PROMPT), 0,
                                CFG.vocab, jnp.int32)
    return params, prompt


@pytest.mark.parametrize("cache_dtype", ["bfloat16", "int8"])
def test_decode_logits_match_teacher_forced(setup, cache_dtype):
    """Along the decode-generated sequence, per-step decode logits must match
    the cache-free full forward on the same tokens (a random model has exact
    argmax ties, so token-level equality is not a valid gate — logit equality
    is the stronger check anyway). bf16 gate: the training forward runs the
    max-free clamped-exp2 fast softmax while decode keeps the online form —
    ~2 bf16 ulps apart at the attention level (r4; was bit-exact when both
    used the online form). Masking/position bugs produce O(1) differences."""
    from long_context_attention_tpu.models.llama import decode_step

    params, prompt = setup
    eng = Engine(cfg=CFG, s_max=64, cache_dtype=cache_dtype)
    logits, cache = eng.prefill(params, prompt)
    fwd = make_forward(CFG, make_usp_mesh(1, 1, 1))
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    seq = prompt
    atol = 5e-2 if cache_dtype == "bfloat16" else 0.5
    for _ in range(4):
        dl, cache = decode_step(params, cache, tok, CFG)
        seq = jnp.concatenate([seq, tok[:, None]], axis=1)
        fl = fwd(params, seq)[:, -1]
        np.testing.assert_allclose(np.asarray(dl), np.asarray(fl),
                                   atol=atol, rtol=0)
        tok = jnp.argmax(dl, -1).astype(jnp.int32)


def test_decode_logits_bit_exact_with_safe_softmax(setup):
    """ADVICE r4: with safe_softmax=True on BOTH sides (training forward
    AND decode), the teacher-forced gate is bit-exact again (atol=0, the
    pre-r4 guarantee) — a masking/position off-by-one of ANY logit
    magnitude fails here, restoring the strongest regression guard next
    to the relaxed default-path gate above."""
    import dataclasses

    from long_context_attention_tpu.models.llama import decode_step

    params, prompt = setup
    cfg = dataclasses.replace(CFG, safe_softmax=True)
    eng = Engine(cfg=cfg, s_max=64, cache_dtype="bfloat16")
    logits, cache = eng.prefill(params, prompt)
    fwd = make_forward(cfg, make_usp_mesh(1, 1, 1))
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    seq = prompt
    for _ in range(4):
        dl, cache = decode_step(params, cache, tok, cfg)
        seq = jnp.concatenate([seq, tok[:, None]], axis=1)
        fl = fwd(params, seq)[:, -1]
        np.testing.assert_array_equal(np.asarray(dl), np.asarray(fl))
        tok = jnp.argmax(dl, -1).astype(jnp.int32)


def test_generate_shapes_and_cache(setup):
    params, prompt = setup
    eng = Engine(cfg=CFG, s_max=64, cache_dtype="bfloat16")
    res = eng.generate(params, prompt, MAX_NEW)
    assert res.tokens.shape == (B, MAX_NEW)
    assert res.cache.length.tolist() == [S_PROMPT + MAX_NEW] * B
    assert not bool(jnp.any(jnp.isnan(res.prefill_logits)))


def test_prefill_logits_match_forward(setup):
    params, prompt = setup
    eng = Engine(cfg=CFG, s_max=64)
    logits, cache = eng.prefill(params, prompt)
    mesh = make_usp_mesh(1, 1, 1)
    full = make_forward(CFG, mesh)(params, prompt)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, -1]),
                               atol=1e-3, rtol=0)
    assert cache.length.tolist() == [S_PROMPT] * B


def test_fp8_cache_generates(setup):
    params, prompt = setup
    eng = Engine(cfg=CFG, s_max=64, cache_dtype="float8_e4m3fn")
    res = eng.generate(params, prompt, 4)
    assert res.tokens.shape == (B, 4)
    assert not bool(jnp.any(jnp.isnan(res.prefill_logits)))


def test_sharded_decode_matches_unsharded(rng):
    """Ring-sharded cache decode == unsharded decode (4-way shard)."""
    import functools
    from jax.sharding import Mesh, PartitionSpec as P
    from long_context_attention_tpu.ops.decode import decode_attention
    from long_context_attention_tpu.serving.sharded import (
        sharded_cache_append, sharded_decode_attention)

    B2, H, HKV, D, SMAX, R = 2, 8, 4, 64, 256, 4
    q = jnp.asarray(rng.normal(size=(B2, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B2, HKV, SMAX, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B2, HKV, SMAX, D)), jnp.bfloat16)
    lengths = jnp.asarray([200, 37], jnp.int32)

    mesh = Mesh(np.array(jax.devices()[:R]), axis_names=("ring",))
    fn = functools.partial(sharded_decode_attention, axis_name="ring")
    spec_kv = P(None, None, "ring", None)
    out = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), spec_kv, spec_kv, P()),
        out_specs=P(), check_vma=False,
    ))(q, k, v, lengths)

    want = decode_attention(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want, np.float32), atol=5e-2, rtol=0)

    # sharded append lands on the owner rank, nowhere else
    val = jnp.asarray(rng.normal(size=(B2, HKV, 1, D)), jnp.bfloat16)
    val_v = jnp.asarray(rng.normal(size=(B2, HKV, 1, D)), jnp.bfloat16)
    appk, appv = jax.jit(jax.shard_map(
        functools.partial(sharded_cache_append, axis_name="ring"),
        mesh=mesh, in_specs=(spec_kv, spec_kv, P(), P(), P()),
        out_specs=(spec_kv, spec_kv), check_vma=False,
    ))(k, v, val, val_v, lengths)
    for app, base, new in [(appk, k, val), (appv, v, val_v)]:
        for i in range(B2):
            t = int(lengths[i])
            np.testing.assert_array_equal(np.asarray(app[i, :, t]),
                                          np.asarray(new[i, :, 0]))
            mask = np.ones(SMAX, bool); mask[t] = False
            np.testing.assert_array_equal(np.asarray(app[i][:, mask]),
                                          np.asarray(base[i][:, mask]))


def test_sharded_engine_matches_single_device(setup):
    """Full mesh-sharded generation (cache over ring x ulysses) produces the
    same per-step decode logits as the single-device engine."""
    from long_context_attention_tpu.serving.sharded_engine import ShardedEngine

    params, prompt = setup
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=2)
    sh = ShardedEngine(cfg=CFG, mesh=mesh, s_max=64, cache_dtype="bfloat16")
    single = Engine(cfg=CFG, s_max=64, cache_dtype="bfloat16")

    sl, scache = sh.prefill(params, prompt)
    ul, ucache = single.prefill(params, prompt)
    np.testing.assert_allclose(np.asarray(sl), np.asarray(ul),
                               atol=5e-2, rtol=0)

    toks_s, cache_s, _ = sh.generate(params, prompt, 6)
    res_u = single.generate(params, prompt, 6)
    # logit noise can flip exact ties in a random model; require high overlap
    agree = (np.asarray(toks_s) == np.asarray(res_u.tokens)).mean()
    assert agree >= 0.8, (np.asarray(toks_s), np.asarray(res_u.tokens))
    assert cache_s.length.tolist() == [S_PROMPT + 6] * B


def test_sharded_engine_int8(setup):
    from long_context_attention_tpu.serving.sharded_engine import ShardedEngine

    params, prompt = setup
    mesh = make_usp_mesh(dp=1, ulysses=1, ring=4)
    sh = ShardedEngine(cfg=CFG, mesh=mesh, s_max=64, cache_dtype="int8")
    toks, cache, logits = sh.generate(params, prompt, 4)
    assert toks.shape == (B, 4)
    assert not bool(jnp.any(jnp.isnan(logits)))


def test_chunked_prefill_matches_full(setup):
    """Chunked prefill (bounded activation memory) == one-shot prefill."""
    params, prompt = setup
    eng = Engine(cfg=CFG, s_max=64, cache_dtype="bfloat16")
    full_logits, full_cache = eng.prefill(params, prompt)
    ch_logits, ch_cache = eng.prefill_chunked(params, prompt, chunk_size=4)
    np.testing.assert_allclose(np.asarray(ch_logits), np.asarray(full_logits),
                               atol=5e-2, rtol=0)
    assert ch_cache.length.tolist() == full_cache.length.tolist()
    np.testing.assert_allclose(
        np.asarray(ch_cache.k[:, :, :, :S_PROMPT], np.float32),
        np.asarray(full_cache.k[:, :, :, :S_PROMPT], np.float32),
        atol=5e-2, rtol=0)


def test_chunked_prefill_int8_then_decode(setup):
    """Chunked prefill over an int8 cache feeds decode correctly."""
    from long_context_attention_tpu.models.llama import decode_step

    params, prompt = setup
    eng = Engine(cfg=CFG, s_max=64, cache_dtype="int8")
    fl, fcache = eng.prefill(params, prompt)
    cl, ccache = eng.prefill_chunked(params, prompt, chunk_size=8)
    np.testing.assert_allclose(np.asarray(cl), np.asarray(fl),
                               atol=2e-1, rtol=0)
    tok = jnp.argmax(cl, -1).astype(jnp.int32)
    d1, _ = decode_step(params, ccache, tok, CFG)
    d2, _ = decode_step(params, fcache, tok, CFG)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               atol=2e-1, rtol=0)


def test_sampling_params(setup):
    """Temperature/top-k/top-p sampling produce valid, varied tokens."""
    from long_context_attention_tpu.serving.engine import (
        SamplingParams, sample_token)

    params, prompt = setup
    eng = Engine(cfg=CFG, s_max=64)
    res = eng.generate(params, prompt, 6,
                       sampling=SamplingParams(temperature=1.0, top_k=10,
                                               top_p=0.9),
                       key=jax.random.PRNGKey(42))
    assert res.tokens.shape == (B, 6)
    assert int(res.tokens.min()) >= 0 and int(res.tokens.max()) < CFG.vocab

    # greedy == argmax regardless of key
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16)),
                         jnp.float32)
    g = sample_token(logits, SamplingParams(), None)
    np.testing.assert_array_equal(np.asarray(g),
                                  np.asarray(jnp.argmax(logits, -1)))
    # top-k=1 sampling == greedy
    s = sample_token(logits, SamplingParams(temperature=1.0, top_k=1),
                     jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(g))


ZCFG = ModelConfig(vocab=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                   head_dim=32, ffn_hidden=128, layout="zigzag")


def zsetup():
    params = init_params(jax.random.PRNGKey(0), ZCFG)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, S_PROMPT), 0,
                                ZCFG.vocab, jnp.int32)
    return params, prompt


def test_sharded_engine_zigzag_layout():
    """A zigzag-TRAINED model serves multi-chip: prefill runs in the zigzag
    layout (exactly as trained), the KV reshuffles once into natural slot
    order, and decode logits match the single-device engine (VERDICT r1 #6:
    previously an assert forbade any non-basic layout)."""
    from long_context_attention_tpu.serving.sharded_engine import ShardedEngine

    params, prompt = zsetup()
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=2)
    sh = ShardedEngine(cfg=ZCFG, mesh=mesh, s_max=64, cache_dtype="bfloat16")
    single = Engine(cfg=ZCFG, s_max=64, cache_dtype="bfloat16")

    sl, scache = sh.prefill(params, prompt)
    ul, ucache = single.prefill(params, prompt)
    np.testing.assert_allclose(np.asarray(sl), np.asarray(ul),
                               atol=5e-2, rtol=0)
    # the reshuffled cache holds the SAME natural-order KV as the
    # single-device cache (bf16 noise only)
    np.testing.assert_allclose(
        np.asarray(scache.k[:, :, :, :S_PROMPT], np.float32),
        np.asarray(ucache.k[:, :, :, :S_PROMPT], np.float32),
        atol=5e-2, rtol=0)

    toks_s, cache_s, _ = sh.generate(params, prompt, 6)
    res_u = single.generate(params, prompt, 6)
    # greedy chains of a RANDOM model are chaotic: one bf16 tie-flip cascades
    # (each next token conditions on the last). The strong gates above are
    # the logit/cache equalities; here require a matching prefix per row —
    # a wrong reshuffle would diverge at step 0.
    ts, tu = np.asarray(toks_s), np.asarray(res_u.tokens)
    for r in range(B):
        first_diff = int(np.argmax(ts[r] != tu[r])) if (ts[r] != tu[r]).any() else 6
        assert first_diff >= 2, (ts, tu)
    assert cache_s.length.tolist() == [S_PROMPT + 6] * B


def test_sharded_engine_stripe_layout():
    from long_context_attention_tpu.serving.sharded_engine import ShardedEngine

    cfg = ModelConfig(vocab=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                      head_dim=32, ffn_hidden=128, layout="stripe")
    params = init_params(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, S_PROMPT), 0,
                                cfg.vocab, jnp.int32)
    mesh = make_usp_mesh(dp=1, ulysses=1, ring=4)
    sh = ShardedEngine(cfg=cfg, mesh=mesh, s_max=64)
    single = Engine(cfg=cfg, s_max=64)
    sl, _ = sh.prefill(params, prompt)
    ul, _ = single.prefill(params, prompt)
    np.testing.assert_allclose(np.asarray(sl), np.asarray(ul),
                               atol=5e-2, rtol=0)


def test_engine_usp_prefill_on_mesh():
    """Engine.prefill with a USP mesh: the prompt forward runs sequence-
    sharded over (ring, ulysses) in the training layout, then the cache
    replicates for single-host decode — same logits as the 1-device prefill
    (VERDICT r1 #6: Engine.prefill previously pinned a 1-device mesh)."""
    params, prompt = zsetup()
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=2)
    eng_mesh = Engine(cfg=ZCFG, s_max=64, mesh=mesh)
    eng_1dev = Engine(cfg=ZCFG, s_max=64)

    ml, mcache = eng_mesh.prefill(params, prompt)
    ul, ucache = eng_1dev.prefill(params, prompt)
    np.testing.assert_allclose(np.asarray(ml), np.asarray(ul),
                               atol=5e-2, rtol=0)
    np.testing.assert_allclose(
        np.asarray(mcache.k[:, :, :, :S_PROMPT], np.float32),
        np.asarray(ucache.k[:, :, :, :S_PROMPT], np.float32),
        atol=5e-2, rtol=0)

    toks = np.asarray(eng_mesh.generate(params, prompt, 6).tokens)
    ref = np.asarray(eng_1dev.generate(params, prompt, 6).tokens)
    for r in range(B):
        first_diff = int(np.argmax(toks[r] != ref[r])) if (toks[r] != ref[r]).any() else 6
        assert first_diff >= 2, (toks, ref)


def test_windowed_softcap_model_serves():
    """A Mistral-style sliding-window + softcap model: decode logits match
    the cache-free training forward teacher-forced (the window and cap are
    threaded through prefill, chunked prefill, and the decode kernel)."""
    import dataclasses as dc

    from long_context_attention_tpu.models.llama import decode_step

    wcfg = dc.replace(CFG, layout="basic", window_left=24, softcap=8.0)
    params = init_params(jax.random.PRNGKey(3), wcfg)
    prompt = jax.random.randint(jax.random.PRNGKey(4), (B, 48), 0,
                                wcfg.vocab, jnp.int32)
    eng = Engine(cfg=wcfg, s_max=64, cache_dtype="bfloat16")
    logits, cache = eng.prefill(params, prompt)
    fwd = make_forward(wcfg, make_usp_mesh(1, 1, 1))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(fwd(params, prompt)[:, -1]),
        atol=1e-3, rtol=0)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    seq = prompt
    for _ in range(4):
        dl, cache = decode_step(params, cache, tok, wcfg)
        seq = jnp.concatenate([seq, tok[:, None]], axis=1)
        fl = fwd(params, seq)[:, -1]
        np.testing.assert_allclose(np.asarray(dl), np.asarray(fl),
                                   atol=0.0, rtol=0)
        tok = jnp.argmax(dl, -1).astype(jnp.int32)

    # chunked prefill agrees with one-shot prefill under the window
    # (compare prompt slots only: `cache` was advanced by the decode loop)
    l2, c2 = eng.prefill_chunked(params, prompt, chunk_size=16)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(logits),
                               atol=2e-2, rtol=0)
    n = prompt.shape[1]
    np.testing.assert_allclose(  # bf16 ulp: chunked matmuls tile differently
        np.asarray(c2.k, np.float32)[:, :, :, :n],
        np.asarray(cache.k, np.float32)[:, :, :, :n], atol=1e-1, rtol=0)


def test_windowed_model_serves_sharded(setup):
    """Sliding-window decode over a sequence-sharded cache: each rank masks
    its slice of the GLOBAL window; logits match the single-device engine."""
    import dataclasses as dc

    from long_context_attention_tpu.serving.sharded_engine import ShardedEngine

    wcfg = dc.replace(CFG, window_left=20, softcap=8.0)
    params = init_params(jax.random.PRNGKey(6), wcfg)
    prompt = jax.random.randint(jax.random.PRNGKey(7), (B, S_PROMPT), 0,
                                wcfg.vocab, jnp.int32)
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=2)
    sh = ShardedEngine(cfg=wcfg, mesh=mesh, s_max=64, cache_dtype="bfloat16")
    single = Engine(cfg=wcfg, s_max=64, cache_dtype="bfloat16")
    sl, _ = sh.prefill(params, prompt)
    ul, _ = single.prefill(params, prompt)
    np.testing.assert_allclose(np.asarray(sl), np.asarray(ul),
                               atol=5e-2, rtol=0)
    toks_s, cache_s, _ = sh.generate(params, prompt, 12)  # window crosses
    res_u = single.generate(params, prompt, 12)           # a shard boundary
    agree = (np.asarray(toks_s) == np.asarray(res_u.tokens)).mean()
    assert agree >= 0.8, (np.asarray(toks_s), np.asarray(res_u.tokens))


def test_sharded_multi_token_run_straddles_boundary(rng):
    """A multi-token append run crossing a shard boundary splits between
    the two owner ranks (range-based liveness), and the multi-token sharded
    decode (unclipped local lengths) matches the unsharded kernel."""
    import functools
    from jax.sharding import Mesh, PartitionSpec as P
    from long_context_attention_tpu.ops.decode import decode_attention
    from long_context_attention_tpu.serving.sharded import (
        sharded_cache_append, sharded_decode_attention)

    B2, H, HKV, D, SMAX, R, N = 2, 8, 4, 64, 256, 4, 5
    k = jnp.asarray(rng.normal(size=(B2, HKV, SMAX, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B2, HKV, SMAX, D)), jnp.bfloat16)
    # slots = 64 per rank; row 0's run [62, 67) straddles ranks 0/1,
    # row 1's run [130, 135) f its inside rank 2
    pos = jnp.asarray([62, 130], jnp.int32)
    kn = jnp.asarray(rng.normal(size=(B2, HKV, N, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(B2, HKV, N, D)), jnp.bfloat16)

    mesh = Mesh(np.array(jax.devices()[:R]), axis_names=("ring",))
    spec_kv = P(None, None, "ring", None)
    appk, appv = jax.jit(jax.shard_map(
        functools.partial(sharded_cache_append, axis_name="ring"),
        mesh=mesh, in_specs=(spec_kv, spec_kv, P(), P(), P()),
        out_specs=(spec_kv, spec_kv), check_vma=False,
    ))(k, v, kn, vn, pos)
    for app, base, new in [(appk, k, kn), (appv, v, vn)]:
        app, base, new = map(np.asarray, (app, base, new))
        for i in range(B2):
            t = int(pos[i])
            np.testing.assert_array_equal(app[i, :, t:t + N],
                                          np.transpose(new[i], (0, 1, 2)))
            mask = np.ones(SMAX, bool); mask[t:t + N] = False
            np.testing.assert_array_equal(app[i][:, mask], base[i][:, mask])

    # multi-token sharded decode over the spliced cache == unsharded
    qs = jnp.asarray(rng.normal(size=(B2, N, H, D)), jnp.bfloat16)
    att_len = pos + N
    fn = functools.partial(sharded_decode_attention, axis_name="ring")
    out = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), spec_kv, spec_kv, P()),
        out_specs=P(), check_vma=False,
    ))(qs, appk, appv, att_len)
    want = decode_attention(qs, appk, appv, att_len)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=0)


def test_int4_cache_generates(setup):
    """int4 (s4) cache through the full Engine: prefill quantizes/packs,
    decode streams with in-kernel s4->s8 converts. Capacity option —
    accuracy gate is NaN-freedom + shape (4-bit per-token noise is large
    by design; kernel-level parity is gated in test_decode.py)."""
    params, prompt = setup
    eng = Engine(cfg=CFG, s_max=64, cache_dtype="int4")
    res = eng.generate(params, prompt, 4)
    assert res.tokens.shape == (B, 4)
    assert not bool(jnp.any(jnp.isnan(res.prefill_logits)))
