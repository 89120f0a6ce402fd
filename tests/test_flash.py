"""Pallas flash attention vs the XLA oracle (fwd + bwd), interpret mode on CPU.

Mirrors the reference's oracle pattern (`test/test_hybrid_attn.py:336-420`):
same inputs through the production kernel and the fp32 einsum oracle, compare
out / lse / grads. Tolerances: fp32 single-kernel ~1e-4 (reference end-to-end
gate is bf16 atol=1e-1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from long_context_attention_tpu.ops.flash import flash_attention, flash_attention_bwd
from long_context_attention_tpu.ops.reference import xla_attention
from long_context_attention_tpu.utils.config import BlockSizes

BS = BlockSizes(block_q=64, block_kv=64)


def make_qkv(rng, b=1, s=256, h=2, hkv=None, d=64, dtype=np.float32):
    hkv = hkv or h
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_fwd_matches_oracle(rng, causal):
    q, k, v = make_qkv(rng)
    out, lse = flash_attention(q, k, v, causal=causal, block_sizes=BS, return_lse=True)
    ref_out, ref_lse = xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=2e-4, rtol=1e-4)


def test_fwd_gqa_softcap_window(rng):
    q, k, v = make_qkv(rng, h=4, hkv=2)
    kw = dict(causal=True, softcap=8.0, window_size=(96, -1))
    out, lse = flash_attention(q, k, v, block_sizes=BS, return_lse=True, **kw)
    ref_out, ref_lse = xla_attention(q, k, v, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("gqa", [1, 2])
def test_grads_match_oracle(rng, causal, gqa):
    q, k, v = make_qkv(rng, s=128, h=2 * gqa, hkv=2)
    dout = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal, block_sizes=BS) * dout)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=causal)[0] * dout)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch (causal={causal}, gqa={gqa})",
        )


def test_grads_softcap(rng):
    q, k, v = make_qkv(rng, s=128)
    dout = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)
    kw = dict(causal=True, softcap=4.0)
    g1 = jax.grad(lambda *a: jnp.sum(flash_attention(*a, block_sizes=BS, **kw) * dout), (0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(xla_attention(*a, **kw)[0] * dout), (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


def test_chunked_offsets_match_slices(rng):
    """Zigzag-style local q: chunks [64:128) and [384:448) of a 512 seq."""
    b, s, h, d = 1, 512, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    full, full_lse = flash_attention(q, k, v, causal=True, block_sizes=BS, return_lse=True)

    q_local = jnp.concatenate([q[:, 64:128], q[:, 384:448]], axis=1)
    out, lse = flash_attention(
        q_local, k, v, causal=True, block_sizes=BS, return_lse=True,
        q_offsets=jnp.asarray([64, 384], jnp.int32),
    )
    expect = jnp.concatenate([full[:, 64:128], full[:, 384:448]], axis=1)
    expect_lse = jnp.concatenate([full_lse[:, :, 64:128], full_lse[:, :, 384:448]], axis=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(expect_lse), atol=2e-4, rtol=1e-4)


def test_strided_positions_stripe_layout(rng):
    """Stripe-style: local tokens are global [j::4] — stride-4 positions."""
    b, s, h, d = 1, 256, 2, 64
    stride, j = 4, 1
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    full, _ = flash_attention(q, k, v, causal=True, block_sizes=BS, return_lse=True)

    out = flash_attention(
        q[:, j::stride], k, v, causal=True, block_sizes=BS,
        q_offsets=jnp.asarray([j], jnp.int32), q_stride=stride,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(full[:, j::stride]), atol=2e-4, rtol=1e-4
    )


def test_fully_masked_block_pair(rng):
    """kv strictly in the future of every q: zero out, -inf lse, zero grads."""
    b, s, h, d = 1, 128, 1, 64
    q, k, v = make_qkv(rng, s=s, h=h, d=d)
    out, lse = flash_attention(
        q, k, v, causal=True, block_sizes=BS, return_lse=True,
        q_offsets=jnp.asarray([0], jnp.int32),
        kv_offsets=jnp.asarray([100000], jnp.int32),
    )
    assert np.all(np.asarray(out) == 0.0)
    assert np.all(np.isneginf(np.asarray(lse)))
    g = jax.grad(lambda q: jnp.sum(flash_attention(
        q, k, v, causal=True, block_sizes=BS,
        q_offsets=jnp.asarray([0], jnp.int32),
        kv_offsets=jnp.asarray([100000], jnp.int32))))(q)
    assert np.all(np.asarray(g) == 0.0)
    assert not np.any(np.isnan(np.asarray(g)))


def test_bwd_only_entry_matches_autodiff(rng):
    q, k, v = make_qkv(rng, s=128)
    dout = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)
    out, lse = flash_attention(q, k, v, causal=True, block_sizes=BS, return_lse=True)
    dq, dk, dv = flash_attention_bwd(q, k, v, out, lse, dout, causal=True, block_sizes=BS)
    g = jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v, causal=True, block_sizes=BS) * dout), (0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(g[0]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(g[1]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(g[2]), atol=1e-5, rtol=1e-5)


def test_tri_grid_matches_rect(rng):
    """Opt-in triangular-grid causal fwd is bit-identical to the default."""
    from long_context_attention_tpu.ops.flash import flash_attention

    q = jnp.asarray(rng.normal(size=(1, 512, 4, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 512, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 512, 2, 64)), jnp.bfloat16)
    a = flash_attention(q, k, v, causal=True)
    b = flash_attention(q, k, v, causal=True, tri_grid=True)
    # default path computes softmax in exp2 units; tri in natural exp —
    # results agree to bf16 rounding
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=2e-2, rtol=0)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="fused backward runs compiled-only (aliased dq "
                           "RMW is exact under Mosaic's sequential grid; "
                           "interpret mode does not replay aliasing)")
@pytest.mark.parametrize("causal,win", [(False, (-1, -1)), (True, (-1, -1)),
                                        (True, (1024, 0))])
def test_fused_bwd_matches_two_kernel_tpu(rng, causal, win):
    """Real-chip gate: the one-pass fused backward (dq via aliased HBM
    accumulation) must be bit-identical to the two-kernel backward across
    residency patterns (GQA, causal clamp-from-below, window clamp-above)."""
    import dataclasses
    import functools

    from long_context_attention_tpu.ops import flash as F

    b, s, h, hkv, d = 1, 4096, 4, 2, 128
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    dout = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    bs = BlockSizes(block_q=512, block_kv=512)  # nq=nk=8: many residencies

    out, lse = F.flash_attention(q, k, v, causal=causal, window_size=win,
                                 return_lse=True, tri_grid=False,
                                 block_sizes=bs)
    cfg = F._resolve_cfg(
        h, hkv, s, s, d, causal=causal, softmax_scale=None, window_size=win,
        softcap=0.0, n_q_chunks=1, n_kv_chunks=1, q_stride=1, kv_stride=1,
        block_sizes=bs, interpret=False)
    cfg = dataclasses.replace(cfg, trivial_offsets=True)
    B = F._to_bhsd
    zo = jnp.zeros((1,), jnp.int32)
    fused = jax.jit(functools.partial(
        F._flash_bwd_bhsd, cfg=dataclasses.replace(cfg, fused_bwd=True)))
    twok = jax.jit(functools.partial(
        F._flash_bwd_bhsd, cfg=dataclasses.replace(cfg, fused_bwd=False)))
    a = fused(B(q), B(k), B(v), zo, zo, out=B(out), lse=lse, dout=B(dout))
    r = twok(B(q), B(k), B(v), zo, zo, out=B(out), lse=lse, dout=B(dout))
    for x, y, name in zip(a, r, ("dq", "dk", "dv")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_fast_vs_safe_softmax(rng):
    """The default max-free clamped-exp2 softmax agrees with the online
    running-max form (safe_softmax=True) on both causal (tri grid) and
    non-causal (static) fast paths, and the backward (fp32 recompute from the
    final lse) is softmax-form-independent."""
    import jax

    q = jnp.asarray(rng.normal(size=(1, 256, 4, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.bfloat16)
    bs = BlockSizes(64, 64)
    for causal in (True, False):
        fast = flash_attention(q, k, v, causal=causal, block_sizes=bs)
        safe = flash_attention(q, k, v, causal=causal, block_sizes=bs,
                               safe_softmax=True)
        d = float(jnp.max(jnp.abs(fast.astype(jnp.float32)
                                  - safe.astype(jnp.float32))))
        # only the scale-fold's one extra bf16 rounding of q separates them
        assert d < 3e-2, (causal, d)

    # lse parity (merge contract): both forms must produce the same lse
    _, lse_f = flash_attention(q, k, v, causal=True, block_sizes=bs,
                               return_lse=True)
    _, lse_s = flash_attention(q, k, v, causal=True, block_sizes=bs,
                               safe_softmax=True, return_lse=True)
    assert float(jnp.max(jnp.abs(lse_f - lse_s))) < 3e-2

    def loss(q, k, v, safe):
        return jnp.sum(flash_attention(q, k, v, causal=True, block_sizes=bs,
                                       safe_softmax=safe
                                       ).astype(jnp.float32) ** 2)

    gf = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, False)
    gb = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, True)
    for a, b in zip(gf, gb):
        # backward recomputes in fp32 from (out, lse): only the slightly
        # different forward residuals separate the two
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        assert d < 2.0, d
        assert np.isfinite(d)


def test_sqrt_tri_decode_matches_table_path(rng, monkeypatch):
    """The table-free sqrt tri-grid (engaged past _TRI_TABLE_MAX live tiles,
    ~370K tokens in production — unreachable at test shapes) must bit-match
    the SMEM-table tri grid: lower the threshold so the sqrt decode runs at
    test size. Also checks _tri_decode's +-1 fix-up exactly over a large
    index range."""
    import numpy as np_
    from long_context_attention_tpu.ops import flash as F

    # arithmetic decode exactness over a wide range (covers many rows)
    idx = jnp.arange(600_000, dtype=jnp.int32)
    iq, ik = F._tri_decode(idx)
    iq, ik = np_.asarray(iq), np_.asarray(ik)
    r = np_.floor((np_.sqrt(8.0 * np_.arange(600_000, dtype=np_.float64) + 1)
                   - 1) / 2).astype(np_.int64)
    start = r * (r + 1) // 2
    np_.testing.assert_array_equal(iq, r)
    np_.testing.assert_array_equal(ik, np_.arange(600_000) - start)

    q = jnp.asarray(rng.normal(size=(1, 512, 4, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 512, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 512, 2, 64)), jnp.bfloat16)
    bs = BlockSizes(64, 64)  # nq=8 -> tri=36 live tiles
    table = flash_attention(q, k, v, causal=True, block_sizes=bs,
                            return_lse=True)
    monkeypatch.setattr(F, "_TRI_TABLE_MAX", 4)  # force the sqrt path
    sqrtp = flash_attention(q, k, v, causal=True, block_sizes=bs,
                            return_lse=True)
    for a, b, name in zip(sqrtp, table, ("out", "lse")):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32), err_msg=name)
