"""Oracle sanity: xla_attention vs a direct numpy softmax attention."""

import numpy as np
import jax.numpy as jnp
import pytest

from long_context_attention_tpu.ops.reference import xla_attention


def numpy_attention(q, k, v, causal=False, window=(-1, -1), softcap=0.0, scale=None):
    b, sq, h, d = q.shape
    _, sk, hk, _ = k.shape
    g = h // hk
    k = np.repeat(k, g, axis=2)
    v = np.repeat(v, g, axis=2)
    scale = scale if scale is not None else 1.0 / np.sqrt(d)
    scores = np.einsum("bthd,bshd->bhts", q.astype(np.float64) * scale, k.astype(np.float64))
    if softcap > 0:
        scores = np.tanh(scores / softcap) * softcap
    rows = np.arange(sq)[:, None] + (sk - sq)
    cols = np.arange(sk)[None, :]
    left, right = window
    if causal:
        right = 0
    mask = np.zeros((sq, sk), dtype=bool)
    if right >= 0:
        mask |= cols > rows + right
    if left >= 0:
        mask |= cols < rows - left
    scores = np.where(mask[None, None], -np.inf, scores)
    m = np.max(scores, axis=-1, keepdims=True)
    dead = ~np.isfinite(m)
    p = np.exp(scores - np.where(dead, 0.0, m))
    p = np.where(mask[None, None], 0.0, p)
    den = p.sum(-1, keepdims=True)
    lse = np.where(dead[..., 0], -np.inf, m[..., 0] + np.log(np.maximum(den[..., 0], 1e-300)))
    out = np.einsum("bhts,bshd->bthd", p / np.maximum(den, 1e-300), v.astype(np.float64))
    out = np.where(dead.transpose(0, 2, 1, 3), 0.0, out)
    return out, lse


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("gqa", [1, 4])
def test_matches_numpy(rng, causal, gqa):
    b, s, h, d = 2, 128, 4, 32
    q = rng.standard_normal((b, s, h, d), dtype=np.float32)
    k = rng.standard_normal((b, s, h // gqa, d), dtype=np.float32)
    v = rng.standard_normal((b, s, h // gqa, d), dtype=np.float32)
    out, lse = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)
    ref_out, ref_lse = numpy_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), ref_lse, atol=2e-5, rtol=1e-5)


def test_window_and_softcap(rng):
    b, s, h, d = 1, 96, 2, 16
    q = rng.standard_normal((b, s, h, d), dtype=np.float32)
    k = rng.standard_normal((b, s, h, d), dtype=np.float32)
    v = rng.standard_normal((b, s, h, d), dtype=np.float32)
    out, lse = xla_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=True, window_size=(16, -1), softcap=5.0,
    )
    ref_out, ref_lse = numpy_attention(q, k, v, causal=True, window=(16, -1), softcap=5.0)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), ref_lse, atol=2e-5, rtol=1e-5)


def test_cross_attention_bottom_right_alignment(rng):
    # s_q != s_kv: rows align to the bottom-right like flash-attn.
    b, sq, sk, h, d = 1, 32, 64, 2, 16
    q = rng.standard_normal((b, sq, h, d), dtype=np.float32)
    k = rng.standard_normal((b, sk, h, d), dtype=np.float32)
    v = rng.standard_normal((b, sk, h, d), dtype=np.float32)
    out, _ = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    ref_out, _ = numpy_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=1e-5)


def test_positions_override_matches_slicing(rng):
    # attention of a q shard with explicit global positions == slice of full result
    b, s, h, d = 1, 128, 2, 16
    q = rng.standard_normal((b, s, h, d), dtype=np.float32)
    k = rng.standard_normal((b, s, h, d), dtype=np.float32)
    v = rng.standard_normal((b, s, h, d), dtype=np.float32)
    full, full_lse = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    lo, hi = 32, 96
    part, part_lse = xla_attention(
        jnp.asarray(q[:, lo:hi]), jnp.asarray(k), jnp.asarray(v), causal=True,
        q_positions=jnp.arange(lo, hi, dtype=jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(part), np.asarray(full)[:, lo:hi], atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(part_lse), np.asarray(full_lse)[:, :, lo:hi], atol=2e-5, rtol=1e-5)


def test_fully_masked_rows_are_zero(rng):
    b, s, h, d = 1, 16, 1, 8
    q = rng.standard_normal((b, s, h, d), dtype=np.float32)
    k = rng.standard_normal((b, s, h, d), dtype=np.float32)
    v = rng.standard_normal((b, s, h, d), dtype=np.float32)
    # q positions all *before* every kv position + causal => nothing visible
    out, lse = xla_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True,
        q_positions=jnp.zeros((s,), jnp.int32),
        kv_positions=jnp.arange(100, 100 + s, dtype=jnp.int32),
    )
    assert np.all(np.asarray(out) == 0.0)
    assert np.all(np.isneginf(np.asarray(lse)))
