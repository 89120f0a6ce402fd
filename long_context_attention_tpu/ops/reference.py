"""Pure-XLA reference attention (the test oracle and CPU fallback backend).

This is the TPU-native analog of two things in the reference repo:

* the fp32 einsum oracle used by its tests (`test/test_utils.py:43`
  ``attention_ref`` — causal / sliding-window / softcap / GQA semantics), and
* the ``AttnType.TORCH_EFFICIENT`` escape-hatch backend
  (`yunchang/kernels/attention.py:44`) — a kernel that runs anywhere.

Unlike the reference oracle it is **position-aware**: ``q_positions`` /
``kv_positions`` carry *global* token indices so the same function computes
exact partial-block attention for ring shards (basic / zigzag / stripe
layouts) without the reference's shape tricks. It returns ``(out, lse)`` in
the layout contract every backend must obey (SURVEY.md L2): out
``(b, s_q, h, d)`` in the input dtype, LSE ``(b, h, s_q)`` fp32 natural-log.

Fully differentiable via plain JAX AD (used as the autodiff oracle in tests).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

__all__ = ["xla_attention", "xla_attention_bwd"]


def _build_mask(
    q_pos: jnp.ndarray,  # (s_q,) int32 global positions
    kv_pos: jnp.ndarray,  # (s_kv,) int32 global positions
    causal: bool,
    window_size: Tuple[int, int],
    sink_tokens: int = 0,
) -> Optional[jnp.ndarray]:
    """Boolean mask, True where the score must be dropped (-inf).

    ``sink_tokens``: StreamingLLM attention sinks — global kv positions
    < sink_tokens stay visible through the left window."""
    left, right = window_size
    if causal:
        # flash-attn semantics: causal overrides the right window to 0.
        right = 0
    if left < 0 and right < 0 and not causal:
        return None
    rows = q_pos[:, None]
    cols = kv_pos[None, :]
    mask = jnp.zeros(rows.shape[:1] + cols.shape[1:], dtype=bool)
    if right >= 0:
        mask = mask | (cols > rows + right)
    if left >= 0:
        left_drop = cols < rows - left
        if sink_tokens > 0:
            left_drop = left_drop & (cols >= sink_tokens)
        mask = mask | left_drop
    return mask


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: Tuple[int, int] = (-1, -1),
    sink_tokens: int = 0,
    softcap: float = 0.0,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 attention with flash-attn masking semantics.

    Args:
      q: (b, s_q, h, d); k, v: (b, s_kv, h_kv, d) with h % h_kv == 0 (GQA).
      causal / window_size / softcap / softmax_scale: flash-attn semantics
        (scores scaled, then softcap tanh, then mask).
      q_positions / kv_positions: optional (s,) int32 *global* token indices.
        Default: arange, with the bottom-right causal alignment
        (q_pos += s_kv - s_q) matching `test/test_utils.py:8`
        construct_local_mask when seqlens differ.
      bias: optional broadcastable to (b, h, s_q, s_kv), added post-softcap.

    Returns:
      (out, lse): out (b, s_q, h, d) in q.dtype, lse (b, h, s_q) fp32.
      Fully-masked rows yield out == 0 and lse == -inf.
    """
    b, s_q, h, d = q.shape
    _, s_kv, h_kv, _ = k.shape
    assert h % h_kv == 0, f"GQA requires h ({h}) % h_kv ({h_kv}) == 0"
    group = h // h_kv
    dtype_out = q.dtype

    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if group > 1:
        kf = jnp.repeat(kf, group, axis=2)
        vf = jnp.repeat(vf, group, axis=2)

    # (b, h, s_q, s_kv)
    scores = jnp.einsum("bthd,bshd->bhts", qf * scale, kf)
    if softcap and softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)

    if q_positions is None:
        q_positions = jnp.arange(s_q, dtype=jnp.int32) + (s_kv - s_q)
    if kv_positions is None:
        kv_positions = jnp.arange(s_kv, dtype=jnp.int32)
    mask = _build_mask(q_positions, kv_positions, causal, window_size,
                       sink_tokens)
    if mask is not None:
        scores = jnp.where(mask[None, None], -jnp.inf, scores)
    if q_segment_ids is not None:
        seg = q_segment_ids[:, :, None] != kv_segment_ids[:, None, :]  # (b,sq,skv)
        scores = jnp.where(seg[:, None], -jnp.inf, scores)

    row_max = jnp.max(scores, axis=-1)  # (b, h, s_q)
    dead = jnp.isneginf(row_max)
    safe_max = jnp.where(dead, 0.0, row_max)
    p = jnp.exp(scores - safe_max[..., None])
    if mask is not None:
        p = jnp.where(mask[None, None], 0.0, p)
    denom = jnp.sum(p, axis=-1)  # (b, h, s_q)
    lse = jnp.where(dead, -jnp.inf, safe_max + jnp.log(jnp.maximum(denom, 1e-37)))

    out = jnp.einsum("bhts,bshd->bthd", p, vf)
    out = out / jnp.maximum(denom, 1e-37).transpose(0, 2, 1)[..., None]
    out = jnp.where(dead.transpose(0, 2, 1)[..., None], 0.0, out)
    return out.astype(dtype_out), lse


def xla_attention_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    out: jnp.ndarray,
    lse: jnp.ndarray,
    dout: jnp.ndarray,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: Tuple[int, int] = (-1, -1),
    sink_tokens: int = 0,
    softcap: float = 0.0,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flash-decomposition backward in pure XLA (the bwd-stage analog of the
    reference's ``flash_attn_backward`` adapter, `kernels/attention.py:205`).

    Given the *final merged* ``out``/``lse`` (softmax over the full KV set) and
    this call's KV block, returns this block's exact fp32 partial gradients:
    ``p = exp(s - lse)`` is the true softmax restricted to these columns, and
    ``ds = p * (dp - rowsum(dout * out))`` — so summing the returned dq (and
    ring-accumulating dk/dv) over all blocks reproduces full-attention grads.
    Used as the numerical oracle for the Pallas backward and as the ring's
    CPU-path bwd impl.
    """
    b, s_q, h, d = q.shape
    _, s_kv, h_kv, _ = k.shape
    group = h // h_kv
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)

    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    if group > 1:
        kf = jnp.repeat(kf, group, axis=2)
        vf = jnp.repeat(vf, group, axis=2)
    dof = dout.astype(jnp.float32)
    outf = out.astype(jnp.float32)

    s = jnp.einsum("bthd,bshd->bhts", qf * scale, kf)
    t = None
    if softcap and softcap > 0.0:
        t = jnp.tanh(s / softcap)
        s = t * softcap

    if q_positions is None:
        q_positions = jnp.arange(s_q, dtype=jnp.int32) + (s_kv - s_q)
    if kv_positions is None:
        kv_positions = jnp.arange(s_kv, dtype=jnp.int32)
    mask = _build_mask(q_positions, kv_positions, causal, window_size,
                       sink_tokens)

    lse_b = lse.astype(jnp.float32)[..., None]  # (b, h, s_q, 1)
    dead = jnp.isneginf(lse_b)
    p = jnp.exp(s - jnp.where(dead, 0.0, lse_b))
    bad = dead
    if mask is not None:
        bad = bad | mask[None, None]
    if q_segment_ids is not None:
        bad = bad | (q_segment_ids[:, :, None]
                     != kv_segment_ids[:, None, :])[:, None]
    p = jnp.where(bad, 0.0, p)

    delta = jnp.sum(dof * outf, axis=-1).transpose(0, 2, 1)[..., None]  # (b,h,s_q,1)
    dp = jnp.einsum("bthd,bshd->bhts", dof, vf)
    ds = p * (dp - delta)
    if t is not None:
        ds = ds * (1.0 - t * t)
    ds = ds * scale

    dq = jnp.einsum("bhts,bshd->bthd", ds, kf)
    dk = jnp.einsum("bhts,bthd->bshd", ds, qf)
    dv = jnp.einsum("bhts,bthd->bshd", p, dof)
    if group > 1:
        dk = dk.reshape(b, s_kv, h_kv, group, d).sum(axis=3)
        dv = dv.reshape(b, s_kv, h_kv, group, d).sum(axis=3)
    return dq, dk, dv
