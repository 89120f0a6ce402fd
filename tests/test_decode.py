"""KV cache (INT8/FP8) + Pallas decode attention vs the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from long_context_attention_tpu.ops.decode import cache_append, decode_attention
from long_context_attention_tpu.ops.kv_cache import (
    KVCache,
    dequantize_kv,
    quantize_kv,
)
from long_context_attention_tpu.ops.reference import xla_attention

B, H, HKV, D, SMAX = 2, 8, 4, 64, 256


def make(rng):
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, SMAX, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, SMAX, HKV, D)), jnp.bfloat16)
    lengths = jnp.asarray([192, 77], jnp.int32)
    return q, k, v, lengths


def oracle(q, k, v, lengths):
    """Per-row full attention over the filled prefix."""
    outs = []
    for i in range(B):
        L = int(lengths[i])
        o, _ = xla_attention(q[i:i + 1, None], k[i:i + 1, :L], v[i:i + 1, :L])
        outs.append(o[:, 0])
    return jnp.concatenate(outs, axis=0)  # (b, h, d)


@pytest.mark.parametrize("dtype", ["bfloat16", "int8", "float8_e4m3fn"])
def test_quantize_roundtrip(rng, dtype):
    x = jnp.asarray(rng.normal(size=(B, HKV, 32, D)), jnp.bfloat16)
    q, s = quantize_kv(x, dtype)
    back = dequantize_kv(q, s)
    tol = {"bfloat16": 0.0, "int8": 2e-2, "float8_e4m3fn": 2e-1}[dtype]
    np.testing.assert_allclose(np.asarray(back, np.float32),
                               np.asarray(x, np.float32), atol=tol, rtol=0)


def test_decode_bf16_matches_oracle(rng):
    q, k, v, lengths = make(rng)
    kc = jnp.transpose(k, (0, 2, 1, 3))  # BHSD cache
    vc = jnp.transpose(v, (0, 2, 1, 3))
    out = decode_attention(q, kc, vc, lengths)
    ref = oracle(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-1, rtol=0)


@pytest.mark.parametrize("dtype", ["int8", "float8_e4m3fn"])
def test_decode_quantized(rng, dtype):
    q, k, v, lengths = make(rng)
    kc, ks = quantize_kv(jnp.transpose(k, (0, 2, 1, 3)), dtype)
    vc, vs = quantize_kv(jnp.transpose(v, (0, 2, 1, 3)), dtype)
    out = decode_attention(q, kc, vc, lengths, ks, vs)

    # exact reference on the dequantized cache (isolates kernel math from
    # quantization error) ...
    kd = jnp.transpose(dequantize_kv(kc, ks), (0, 2, 1, 3))
    vd = jnp.transpose(dequantize_kv(vc, vs), (0, 2, 1, 3))
    ref_q = oracle(q, kd, vd, lengths)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref_q, np.float32), atol=1e-1, rtol=0)
    # ... and the unquantized oracle (bounds end-to-end quantization error)
    ref = oracle(q, k, v, lengths)
    tol = 2e-1 if dtype == "int8" else 5e-1
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=0)


def test_decode_lse_merge_across_shards(rng):
    """Sequence-sharded decode: split the cache in two, merge partials via
    (out, lse) — must equal unsharded decode (the ring-sharded serving path)."""
    from long_context_attention_tpu.ops.merge import merge_attn_blocks

    q, k, v, lengths = make(rng)
    kc = jnp.transpose(k, (0, 2, 1, 3))
    vc = jnp.transpose(v, (0, 2, 1, 3))
    half = SMAX // 2
    l0 = jnp.minimum(lengths, half)
    l1 = jnp.maximum(lengths - half, 0)
    o0, s0 = decode_attention(q, kc[:, :, :half], vc[:, :, :half], l0,
                              return_lse=True)
    o1, s1 = decode_attention(q, kc[:, :, half:], vc[:, :, half:], l1,
                              return_lse=True)
    # merge contract: out (b, s=1, h, d), lse (b, h, s=1)
    acc_o, acc_l = merge_attn_blocks(
        o0[:, None].astype(jnp.float32), s0[..., None],
        o1[:, None].astype(jnp.float32), s1[..., None])
    merged = acc_o[:, 0].astype(jnp.bfloat16)
    full = decode_attention(q, kc, vc, lengths)
    np.testing.assert_allclose(np.asarray(merged, np.float32),
                               np.asarray(full, np.float32), atol=5e-2, rtol=0)


def test_kv_cache_prefill_then_append(rng):
    """write_prompt + append_token reproduce a contiguous cache."""
    cache = KVCache.init(n_layers=1, b=B, s_max=SMAX, h_kv=HKV, d=D,
                         dtype="int8")
    k = jnp.asarray(rng.normal(size=(B, 64, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, 64, HKV, D)), jnp.bfloat16)
    cache = cache.write_prompt(0, k, v).advance(64)
    k1 = jnp.asarray(rng.normal(size=(B, 1, HKV, D)), jnp.bfloat16)
    v1 = jnp.asarray(rng.normal(size=(B, 1, HKV, D)), jnp.bfloat16)
    cache = cache.append_token(0, k1, v1).advance(1)
    assert cache.length.tolist() == [65, 65]
    kc, vc, ks, vs = cache.layer_view(0)
    got = dequantize_kv(kc, ks)[:, :, 64]  # (b, h_kv, d) at position 64
    want = jnp.transpose(k1[:, 0], (0, 1, 2))  # (b, h_kv, d)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=3e-2, rtol=0)
    got0 = dequantize_kv(kc, ks)[:, :, :64]
    want0 = jnp.transpose(k, (0, 2, 1, 3))
    np.testing.assert_allclose(np.asarray(got0, np.float32),
                               np.asarray(want0, np.float32), atol=3e-2, rtol=0)


def test_decode_gqa_and_empty_rows(rng):
    q, k, v, _ = make(rng)
    kc = jnp.transpose(k, (0, 2, 1, 3))
    vc = jnp.transpose(v, (0, 2, 1, 3))
    lengths = jnp.asarray([128, 0], jnp.int32)  # row 1 empty
    out, lse = decode_attention(q, kc, vc, lengths, return_lse=True)
    assert not bool(jnp.any(jnp.isnan(out)))
    np.testing.assert_array_equal(np.asarray(out[1]), 0.0)
    assert bool(jnp.all(jnp.isneginf(lse[1])))
    ref0 = oracle(q, k, v, jnp.asarray([128, 1], jnp.int32))[0]
    np.testing.assert_allclose(np.asarray(out[0], np.float32),
                               np.asarray(ref0, np.float32), atol=1e-1, rtol=0)


@pytest.mark.parametrize("splits", [2, 4, None])
def test_decode_kv_splits_match_sequential(rng, splits):
    """Flash-decoding split-KV partial merge == the sequential online
    softmax (kv_splits=1) within fp32-merge tolerance, including ragged
    splits (nk not divisible) and rows shorter than one split."""
    S2 = 640  # 5 tiles of 128: ragged for splits 2 and 4
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(B, HKV, S2, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(B, HKV, S2, D)), jnp.bfloat16)
    lengths = jnp.asarray([500, 77], jnp.int32)  # row 1 dies inside split 0
    base, base_lse = decode_attention(q, kc, vc, lengths, block_kv=128,
                                      kv_splits=1, return_lse=True)
    out, lse = decode_attention(q, kc, vc, lengths, block_kv=128,
                                kv_splits=splits, return_lse=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(base, np.float32),
                               atol=2e-2, rtol=0)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(base_lse),
                               atol=1e-5, rtol=0)
    # quantized path too
    kq, ks = quantize_kv(kc, "int8")
    vq, vs = quantize_kv(vc, "int8")
    b1 = decode_attention(q, kq, vq, lengths, ks, vs, block_kv=128,
                          kv_splits=1)
    bs = decode_attention(q, kq, vq, lengths, ks, vs, block_kv=128,
                          kv_splits=splits)
    np.testing.assert_allclose(np.asarray(bs, np.float32),
                               np.asarray(b1, np.float32), atol=2e-2, rtol=0)


@pytest.mark.parametrize("layered", [False, True])
@pytest.mark.parametrize("quantized", [False, True])
def test_cache_append_splices_in_place(rng, layered, quantized):
    """ops/decode.py:cache_append — the aliased in-place splice: each row's
    token lands at exactly append_pos, rows with -1 write nothing, every
    other slot (and every other layer) is untouched."""
    from long_context_attention_tpu.ops.decode import cache_append

    L = 3
    shape = (L, B, HKV, SMAX, D) if layered else (B, HKV, SMAX, D)
    sshape = (L, B, HKV, SMAX) if layered else (B, HKV, SMAX)
    dt = jnp.int8 if quantized else jnp.bfloat16
    k = jnp.asarray(rng.integers(-100, 100, size=shape), dt) if quantized \
        else jnp.asarray(rng.normal(size=shape), dt)
    v = k + jnp.asarray(1, dt)
    kn = jnp.asarray(rng.integers(-100, 100, size=(B, HKV, 1, D)), dt) \
        if quantized else jnp.asarray(rng.normal(size=(B, HKV, 1, D)), dt)
    vn = kn - jnp.asarray(2, dt)
    pos = jnp.asarray([37, -1], jnp.int32)  # row 1 skips (non-owner)
    kwargs = dict(layer=jnp.int32(1)) if layered else {}
    if quantized:
        ks = jnp.asarray(rng.random(size=sshape), jnp.float32)
        vs = ks * 2
        ksn = jnp.asarray(rng.random(size=(B, HKV, 1)), jnp.float32)
        vsn = ksn * 3
        res = cache_append(k, v, kn, vn, pos, ks, vs, ksn, vsn, **kwargs)
        k2, v2, ks2, vs2 = res
    else:
        k2, v2 = cache_append(k, v, kn, vn, pos, **kwargs)

    def layer_sel(x, li):
        return x[li] if layered else x

    K, K2 = np.asarray(k), np.asarray(k2)
    V, V2 = np.asarray(v), np.asarray(v2)
    li = 1
    # row 0: token at slot 37 of layer li, everything else untouched
    np.testing.assert_array_equal(layer_sel(K2, li)[0, :, 37],
                                  np.asarray(kn)[0, :, 0])
    np.testing.assert_array_equal(layer_sel(V2, li)[0, :, 37],
                                  np.asarray(vn)[0, :, 0])
    mask = np.ones(SMAX, bool); mask[37] = False
    np.testing.assert_array_equal(layer_sel(K2, li)[0][:, mask],
                                  layer_sel(K, li)[0][:, mask])
    # row 1 (append_pos=-1): fully untouched
    np.testing.assert_array_equal(layer_sel(K2, li)[1], layer_sel(K, li)[1])
    np.testing.assert_array_equal(layer_sel(V2, li)[1], layer_sel(V, li)[1])
    if layered:  # other layers untouched
        np.testing.assert_array_equal(K2[0], K[0])
        np.testing.assert_array_equal(K2[2], K[2])
    if quantized:
        S_, S2_ = np.asarray(ks), np.asarray(ks2)
        np.testing.assert_array_equal(layer_sel(S2_, li)[0, :, 37],
                                      np.asarray(ksn)[0, :, 0])
        np.testing.assert_array_equal(layer_sel(S2_, li)[0][:, mask],
                                      layer_sel(S_, li)[0][:, mask])
        np.testing.assert_array_equal(layer_sel(S2_, li)[1],
                                      layer_sel(S_, li)[1])


@pytest.mark.parametrize("w,cap", [(64, 0.0), (100, 15.0), (-1, 8.0)])
def test_decode_window_and_softcap(rng, w, cap):
    """Sliding-window + softcap decode vs the positional oracle: the query
    sits at position L-1 and sees only the last w+1 tokens."""
    q, k, v, lengths = make(rng)
    kc = jnp.transpose(k, (0, 2, 1, 3))
    vc = jnp.transpose(v, (0, 2, 1, 3))
    out = decode_attention(q, kc, vc, lengths, block_kv=128,
                           window_size=(w, -1), softcap=cap)
    for i in range(B):
        L = int(lengths[i])
        ref, _ = xla_attention(
            q[i:i + 1, None], k[i:i + 1, :L], v[i:i + 1, :L],
            window_size=(w, -1), softcap=cap,
            q_positions=jnp.asarray([L - 1]),
            kv_positions=jnp.arange(L))
        np.testing.assert_allclose(np.asarray(out[i], np.float32),
                                   np.asarray(ref[0, 0], np.float32),
                                   atol=1e-1, rtol=0)


def test_decode_alibi(rng):
    """ALiBi decode bias -slope * (q_pos - kv_pos) vs the positional
    oracle's bias path."""
    q, k, v, lengths = make(rng)
    kc = jnp.transpose(k, (0, 2, 1, 3))
    vc = jnp.transpose(v, (0, 2, 1, 3))
    slopes = jnp.asarray(rng.random(size=(H,)), jnp.float32) * 0.2
    out = decode_attention(q, kc, vc, lengths, block_kv=128,
                           alibi_slopes=slopes)
    for i in range(B):
        L = int(lengths[i])
        dist = (L - 1 - jnp.arange(L)).astype(jnp.float32)  # (s_kv,)
        bias = (-slopes[:, None, None] * dist[None, None, :])  # (h,1,skv)
        ref, _ = xla_attention(
            q[i:i + 1, None], k[i:i + 1, :L], v[i:i + 1, :L],
            bias=bias[None])
        np.testing.assert_allclose(np.asarray(out[i], np.float32),
                                   np.asarray(ref[0, 0], np.float32),
                                   atol=1e-1, rtol=0)


@pytest.mark.parametrize("dtype,w,cap,use_alibi", [
    ("bfloat16", -1, 0.0, False),
    ("int8", -1, 0.0, False),
    ("bfloat16", 40, 8.0, False),
    ("bfloat16", -1, 0.0, True),
])
def test_decode_multi_token_matches_sequential(rng, dtype, w, cap, use_alibi):
    """The n-token run (b, n, h, d) must equal n sequential single-token
    decode calls: token i of the run sees cache slots [0, L - n + i] — the
    per-row causal mask inside the shared cache stream (spec-dec verify)."""
    n = 3
    k = jnp.asarray(rng.normal(size=(B, SMAX, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, SMAX, HKV, D)), jnp.bfloat16)
    qs = jnp.asarray(rng.normal(size=(B, n, H, D)), jnp.bfloat16)
    lengths = jnp.asarray([192, 77], jnp.int32)  # incl. the n newest slots
    kc, ks = quantize_kv(jnp.transpose(k, (0, 2, 1, 3)), dtype)
    vc, vs = quantize_kv(jnp.transpose(v, (0, 2, 1, 3)), dtype)
    slopes = (jnp.asarray(rng.random(size=(H,)), jnp.float32) * 0.2
              if use_alibi else None)
    kw = dict(softmax_scale=None, block_kv=128, window_size=(w, -1),
              softcap=cap, alibi_slopes=slopes)
    out, lse = decode_attention(qs, kc, vc, lengths, ks, vs,
                                return_lse=True, **kw)
    assert out.shape == (B, n, H, D) and lse.shape == (B, H, n)
    for i in range(n):
        oi, li = decode_attention(qs[:, i], kc, vc, lengths - (n - 1 - i),
                                  ks, vs, return_lse=True, **kw)
        np.testing.assert_allclose(np.asarray(out[:, i], np.float32),
                                   np.asarray(oi, np.float32),
                                   atol=2e-2, rtol=0)
        np.testing.assert_allclose(np.asarray(lse[..., i], np.float32),
                                   np.asarray(li, np.float32),
                                   atol=2e-2, rtol=0)


def test_decode_multi_token_layered(rng):
    """Layer-indexed stacked cache + multi-token run: the serving verify
    path reads layer li of (L, b, h, s, d) via index maps, no slicing."""
    n, L = 4, 2
    k = jnp.asarray(rng.normal(size=(L, B, HKV, SMAX, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(L, B, HKV, SMAX, D)), jnp.bfloat16)
    qs = jnp.asarray(rng.normal(size=(B, n, H, D)), jnp.bfloat16)
    lengths = jnp.asarray([128, 64], jnp.int32)
    for li in range(L):
        out = decode_attention(qs, k, v, lengths, layer=jnp.int32(li),
                               block_kv=128)
        ref = decode_attention(qs, k[li], v[li], lengths, block_kv=128)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=1e-6, rtol=0)


def test_decode_banded_window_grid(rng):
    """Windowed decode over a LONG cache takes the banded grid (sink tiles +
    window band only — cost independent of s_max, r4): vs the positional
    oracle across lengths straddling tile boundaries, single- and
    multi-token, with and without sinks."""
    SM, BKV, W, SINK = 2048, 128, 200, 37
    k = jnp.asarray(rng.normal(size=(B, SM, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, SM, HKV, D)), jnp.bfloat16)
    kc = jnp.transpose(k, (0, 2, 1, 3))
    vc = jnp.transpose(v, (0, 2, 1, 3))
    lengths = jnp.asarray([1900, 301], jnp.int32)

    for sink in (0, SINK):
        q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.bfloat16)
        out = decode_attention(q, kc, vc, lengths, block_kv=BKV,
                               window_size=(W, -1), sink_tokens=sink)
        for i in range(B):
            L = int(lengths[i])
            ref, _ = xla_attention(
                q[i:i + 1, None], k[i:i + 1, :L], v[i:i + 1, :L],
                window_size=(W, -1), sink_tokens=sink,
                q_positions=jnp.asarray([L - 1]),
                kv_positions=jnp.arange(L))
            np.testing.assert_allclose(np.asarray(out[i], np.float32),
                                       np.asarray(ref[0, 0], np.float32),
                                       atol=5e-2, rtol=0, err_msg=f"sink={sink}")

    # multi-token (speculative verify) on the banded grid
    n = 3
    qs = jnp.asarray(rng.normal(size=(B, n, H, D)), jnp.bfloat16)
    outm = decode_attention(qs, kc, vc, lengths, block_kv=BKV,
                            window_size=(W, -1), sink_tokens=SINK)
    for it in range(n):
        oi = decode_attention(qs[:, it], kc, vc, lengths - (n - 1 - it),
                              block_kv=BKV, window_size=(W, -1),
                              sink_tokens=SINK)
        np.testing.assert_allclose(np.asarray(outm[:, it], np.float32),
                                   np.asarray(oi, np.float32),
                                   atol=2e-2, rtol=0, err_msg=f"tok={it}")


def test_int4_cache_decode_and_append():
    """int4 (s4) KV cache: packed storage, in-kernel s4->s8 convert onto
    the int8-MXU path. Functional option (capacity: quarter bf16 bytes at
    rest); per-token 4-bit absmax costs visibly more accuracy than int8 —
    the gate here is the int4 quantization noise bound, not the int8 one.
    NOTE r5: on the axon image the S4 fast path is toolchain-blocked
    (docs/PERF.md §int4), so this exercises the CPU interpret path."""
    rng = np.random.default_rng(11)
    b, h, hkv, d, s = 2, 8, 4, 64, 512
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    lengths = jnp.array([300, 512], jnp.int32)
    kq, ks = quantize_kv(k, "int4")
    vq, vs = quantize_kv(v, "int4")
    assert str(kq.dtype) == "int4"
    got = decode_attention(q, kq, vq, lengths, ks, vs, interpret=True)
    # oracle on the DEQUANTIZED values: isolates kernel correctness from
    # quantization noise
    kd = dequantize_kv(kq, ks, jnp.float32)
    vd = dequantize_kv(vq, vs, jnp.float32)
    want = decode_attention(q, kd.astype(jnp.bfloat16),
                            vd.astype(jnp.bfloat16), lengths,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=0)

    # append a quantized token run into the int4 cache
    kn = jnp.asarray(rng.standard_normal((b, hkv, 1, d)), jnp.bfloat16)
    knq, kns = quantize_kv(kn, "int4")
    vnq, vns = quantize_kv(kn, "int4")
    k2, v2, _, _ = cache_append(
        kq, vq, knq, vnq, lengths - 1,
        ks.reshape(b, hkv, 1, s), vs.reshape(b, hkv, 1, s),
        kns[..., 0], vns[..., 0], interpret=True)
    np.testing.assert_array_equal(
        np.asarray(k2[0, :, 299].astype(jnp.int8)),
        np.asarray(knq[0, :, 0].astype(jnp.int8)))


def test_long_multi_token_run_splits_and_matches():
    """r5 review fix: a teacher-forced run whose h_kv-batched working set
    exceeds scoped VMEM SPLITS into positionally-exact sub-runs instead
    of raising (the r4 per-head kernel served these shapes — e.g. the
    paged engines' prefill_chunk=256 at llama-7B head counts). Gate: the
    long-run result equals per-token sequential decode."""
    from long_context_attention_tpu.ops.decode import _fit_run_tokens

    rng = np.random.default_rng(3)
    b, h, hkv, d, s = 1, 32, 8, 128, 1024
    n = 96
    assert _fit_run_tokens(hkv, h // hkv, d, 256, 2) < n  # split engages
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    qm = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    lengths = jnp.array([800], jnp.int32)
    out, lse = decode_attention(qm, k, v, lengths, interpret=True,
                                return_lse=True)
    assert out.shape == (b, n, h, d) and lse.shape == (b, h, n)
    for i in range(0, n, 7):
        want = decode_attention(qm[:, i], k, v, lengths - n + 1 + i,
                                interpret=True)
        np.testing.assert_allclose(
            np.asarray(out[:, i], np.float32),
            np.asarray(want, np.float32), atol=2e-2, rtol=0)
