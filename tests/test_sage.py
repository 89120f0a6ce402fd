"""INT8 quantized-MXU (SageAttention-role) attention vs the XLA oracle.

The reference exposes SageAttention as registry AttnTypes
(`yunchang/kernels/__init__.py:38-53`, dispatch `:171-242`) without its own
correctness tests; here the quantized forward is gated against the fp32
oracle at tolerances well inside the reference's end-to-end bf16 gate
(atol=1e-1, `test/test_hybrid_attn.py:386`). Interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from long_context_attention_tpu.ops.reference import xla_attention
from long_context_attention_tpu.ops.registry import get_attn_impl
from long_context_attention_tpu.ops.sage import (
    sage_attention,
    sage_attention_full,
    sage_attention_fwd,
)
from long_context_attention_tpu.utils.config import BlockSizes

BS = BlockSizes(block_q=64, block_kv=64)

# int8 per-token quantization error bound, empirically ~0.03 on N(0,1)+bias
# inputs — an order of magnitude inside the reference's 1e-1 bf16 gate
ATOL_OUT = 5e-2
ATOL_LSE = 5e-2


def make_qkv(rng, b=2, s=256, h=4, hkv=2, d=64, dtype=np.float32):
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype)
    # +0.7 common-mode bias on K: exercises the mean-centering (without it,
    # the bias would eat most of the int8 range)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)) + 0.7, dtype)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("pv_int8", [False, True])
def test_fwd_matches_oracle(rng, causal, pv_int8):
    q, k, v = make_qkv(rng)
    out, lse = sage_attention(q, k, v, causal=causal, pv_int8=pv_int8,
                              block_sizes=BS, return_lse=True)
    ref_out, ref_lse = xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=ATOL_OUT, rtol=0)
    # the LSE must be merge-compatible: the K-centering shift is corrected
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=ATOL_LSE, rtol=0)


def test_fwd_bf16_inside_reference_gate(rng):
    q, k, v = make_qkv(rng, dtype=jnp.bfloat16)
    out = sage_attention(q, k, v, causal=True, block_sizes=BS)
    ref_out, _ = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_out, np.float32),
        atol=1e-1, rtol=0)


def test_gqa_and_scale(rng):
    # 0.25 is 2x the default 1/sqrt(64): a sharper softmax amplifies int8
    # score error proportionally, so this case gets the full reference gate
    # (1e-1) rather than the tighter default-scale ATOL
    q, k, v = make_qkv(rng, h=8, hkv=2)
    out, lse = sage_attention(q, k, v, causal=True, softmax_scale=0.25,
                              block_sizes=BS, return_lse=True)
    ref_out, ref_lse = xla_attention(q, k, v, causal=True, softmax_scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-1, rtol=0)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=1e-1, rtol=0)
    # and the scale must actually be honored: a mismatched-scale oracle is
    # far outside the gate
    wrong, _ = xla_attention(q, k, v, causal=True)
    assert float(jnp.max(jnp.abs(out - wrong))) > 3e-1


def test_grads_close_to_oracle(rng):
    """Straight-through backward: grads from the quantized layer track the
    oracle's within int8 forward error (relative to grad scale)."""
    q, k, v = make_qkv(rng, b=1, s=128)

    def loss_sage(q, k, v):
        return jnp.sum(sage_attention_full(q, k, v, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=True)[0] ** 2)

    gs = jax.grad(loss_sage, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        assert float(jnp.max(jnp.abs(a - b))) / scale < 3e-2


def test_registry_entry(rng):
    impl = get_attn_impl("sage")
    q, k, v = make_qkv(rng)
    out, lse = impl.fwd(q, k, v, causal=True)
    ref_out, ref_lse = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=ATOL_OUT, rtol=0)
    full = impl.full(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(out),
                               atol=1e-6, rtol=0)
    # bwd stage: the straight-through flash backward runs and returns fp32
    dout = jnp.ones_like(q)
    dq, dk, dv = impl.bwd(q, k, v, out, lse, dout, causal=True)
    assert dq.dtype == jnp.float32 and dq.shape == q.shape


def test_unsupported_kwargs_raise(rng):
    """No silent wrong answers: anything sage can't honor raises (the
    reference's FA3 adapter silently dropped causal/window —
    `kernels/attention.py:283-284` — the bug class this guards against)."""
    q, k, v = make_qkv(rng)
    with pytest.raises(NotImplementedError):
        sage_attention_fwd(q, k, v, causal=True, window_size=(16, 0))
    with pytest.raises(NotImplementedError):
        sage_attention_fwd(q, k, v, softcap=30.0)
    with pytest.raises(NotImplementedError):
        sage_attention_fwd(q, k, v, q_offsets=jnp.array([128], jnp.int32),
                           kv_offsets=jnp.array([0], jnp.int32))
    with pytest.raises(NotImplementedError):
        sage_attention_fwd(
            q, k, v, q_segment_ids=jnp.zeros(q.shape[:2], jnp.int32),
            kv_segment_ids=jnp.zeros(k.shape[:2], jnp.int32))
    # trivial offsets (what a 1-step ring passes) are accepted
    out, _ = sage_attention_fwd(q, k, v, causal=True,
                                q_offsets=jnp.array([0], jnp.int32))
    ref_out, _ = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=ATOL_OUT, rtol=0)


def test_merge_compatibility(rng):
    """Two sage halves merged via ops/merge.py equal full sage attention —
    the (out, lse) contract that makes the impl registry-composable."""
    from long_context_attention_tpu.ops.merge import merge_attn_blocks

    q, k, v = make_qkv(rng, b=1, s=256)
    half = 128
    # non-causal split over KV: full = merge(attn(q, k1), attn(q, k2))
    o1, l1 = sage_attention(q, k[:, :half], v[:, :half], block_sizes=BS,
                            return_lse=True)
    o2, l2 = sage_attention(q, k[:, half:], v[:, half:], block_sizes=BS,
                            return_lse=True)
    om, lm = merge_attn_blocks(o1.astype(jnp.float32), l1, o2, l2)
    ref_out, ref_lse = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(om), np.asarray(ref_out),
                               atol=ATOL_OUT, rtol=0)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(ref_lse),
                               atol=ATOL_LSE, rtol=0)
