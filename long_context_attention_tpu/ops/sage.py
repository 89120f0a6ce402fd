"""SageAttention-role quantized-MXU prefill attention (int8 QK + int8 PV).

The reference ships SageAttention as four first-class ``AttnType`` registry
entries (SAGE_AUTO / SAGE_FP16 / SAGE_FP16_TRITON / SAGE_FP8,
`yunchang/kernels/__init__.py:38-53`, dispatched at `:171-242`): INT8-quantized
QK^T with K smoothing and FP16/FP8 PV, used as a faster lossy-but-accurate
inference forward. This module is the TPU-native counterpart, built for the
v5e MXU where s8 x s8 -> s32 runs at 2x the bf16 rate:

* **K smoothing (exact).** K is mean-centered per (batch, kv-head, channel)
  before quantization. Softmax is invariant to a per-row additive constant,
  and ``q_i . mean_k`` is constant across kv positions, so unlike the other
  quantization steps this one is *lossless* — it just removes the common-mode
  component that would otherwise dominate int8 range.
* **Per-token scales, folded post-matmul.** Q is quantized per (b, h, token)
  and K per (b, h_kv, token); both scale vectors fold into the fp32 score
  tile as rank-1 row/column multiplies after the s32 matmul — exact.
* **bf16 PV by default (SageAttention-v1 shape).** ``pv_int8=True`` adds
  the SageAttention2-style second s8 MXU matmul (V quantized per token, its
  scale folded into P after the row-sum, P dynamically re-quantized per
  row) — measured SLOWER on v5e (128K causal GQA: 138.7 vs 181.6
  eff-TFLOP/s): the per-tile P requantization is pure VPU work and the VPU,
  not the MXU, is this kernel's critical path once the softmax is max-free.
  With bf16 PV the int8-QK kernel beats the bf16 flash kernel (1.06x).
* **HBM wins too.** K and V stream int8 (half the bf16 bytes); the fp32
  per-token scales ride in the kernels' native lane-oriented layout
  ((rows, n_blocks, 1, block), the same trick as the LSE).

Contract: identical to ops/flash.py — ``(out (b, s, h, d), lse (b, h, s)
fp32)`` — so the output merges with any other block via ops/merge.py and the
impl drops into the registry (ops/registry.py) next to ``pallas`` and ``xla``.

Like the reference's Sage adapters this is a *forward* path; the
differentiable wrapper (``sage_attention_full``) runs this forward and the
bf16 flash recomputation backward on the original inputs (straight-through),
which is the standard training recipe for quantized attention.

Scope: plain self-attention (causal triangular grid / non-causal rectangular
grid), GQA, softmax_scale, AND the full ring position-descriptor contract
(traced chunk offsets + strides, sliding windows, sinks) via the
position-aware kernel — so ``RingConfig(impl="sage")`` /
``LongContextAttention(impl="sage")`` dispatch the int8-MXU forward inside
every ring schedule, the reference's ring × SAGE_* composition
(`ring/ring_flash_attn.py:36`, `kernels/__init__.py:177-242`). Softcap,
segments, dropout and ALiBi stay on the bf16 kernel (they raise).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from long_context_attention_tpu.utils.config import (
    NEG_INF,
    BlockSizes,
    default_interpret,
)

__all__ = [
    "sage_attention",
    "sage_attention_fwd",
    "sage_attention_full",
    "sage_attention_fwd_prequant",
    "sage_quantize_kv",
]

_LOG2E = math.log2(math.e)



# ---------------------------------------------------------------------------
# Quantization pass (fused XLA, one sweep over HBM)
# ---------------------------------------------------------------------------


def _quant_per_token(x):
    """(..., s, d) fp -> int8 values + (..., s) fp32 absmax/127 scales."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    safe = jnp.maximum(scale, 1e-30)[..., None]
    vals = jnp.clip(jnp.round(xf / safe), -127, 127).astype(jnp.int8)
    return vals, scale


def sage_quantize_kv(k_bhsd, v_bhsd):
    """Quantize BHSD K/V for the sage kernels.

    K is mean-centered over tokens per (b, h_kv, channel) first — exact under
    softmax (see module docstring). Returns (k8, ks, v8, vs, k_mean) with
    values int8 BHSD, scales fp32 (b, h_kv, s), and the removed mean
    (b, h_kv, 1, d) fp32. Centering shifts every score in q-row i by the
    row-constant ``-scale * (q_i . mean_k)`` — softmax (and thus ``out``) is
    unaffected, but the LSE is shifted by exactly that constant, so callers
    must add ``scale * (q . k_mean)`` back to keep the LSE merge-compatible
    (sage_attention does).
    """
    kf = k_bhsd.astype(jnp.float32)
    k_mean = jnp.mean(kf, axis=2, keepdims=True)
    k8, ks = _quant_per_token(kf - k_mean)
    v8, vs = _quant_per_token(v_bhsd)
    return k8, ks, v8, vs, k_mean


def _scale_tiles(scale_bhs, block):
    """(b, h, s) fp32 -> (b*h, s//block, 1, block): lane-oriented per-token
    scale rows whose (1, block) tiles are Mosaic-legal for every block."""
    b, h, s = scale_bhs.shape
    return scale_bhs.reshape(b * h, s // block, 1, block)


def _qscale_tiles(scale_bhs, block):
    """(b, h, s) fp32 -> (b*h, s//block, block, 1): sublane-oriented per-row
    scales ((block, 1) tiles broadcast over score columns in-kernel)."""
    b, h, s = scale_bhs.shape
    return scale_bhs.reshape(b * h, s // block, block, 1)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _sage_compute(q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
                  l_scr, acc_scr, *, mask, pv_int8, bq, bkv):
    """Shared max-free softmax step over one (q-tile, kv-tile) pair.

    Scores: s = (q8 . k8^T)_s32 * qs_row * ks_col in exp2 units (the
    softmax scale and log2(e) are pre-folded into the per-row q scales by
    the driver). Softmax is the max-free clamped form (ops/flash.py
    _CLAMP): p accumulates raw in fp32, one normalize at emit — the
    per-tile max/subtract/rescale chain that throttled the bf16 kernel is
    gone here too. pv_int8's dynamic requantization keeps its (genuinely
    needed) row-max over P; raw p <= 2^90 sits comfortably in fp32.
    ``mask`` is an optional (bq, bkv) True-=-drop boolean tile (the causal
    diagonal triangle, or a global-position mask on the ring path) —
    whole-tile skipping happens at grid level.
    """
    from long_context_attention_tpu.ops.flash import _CLAMP

    q8 = q_ref[0, 0, :, :]                      # (bq, d) int8
    k8 = k_ref[0, 0, :, :]                      # (bkv, d) int8
    s32 = jax.lax.dot_general(
        q8, k8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    qs = qs_ref[0, 0, :, :]                     # (bq, 1) fp32, scale-folded
    ks = ks_ref[0, 0, :, :]                     # (1, bkv) fp32
    s = s32.astype(jnp.float32) * qs * ks
    if mask is not None:
        s = jnp.where(mask, NEG_INF, s)
    p = jnp.exp2(jnp.minimum(s, _CLAMP))        # exp2(NEG_INF) == 0: masked
    l_scr[:, :1] = l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    # fold V's per-token scale into P *after* the row-sum (denominator exact)
    p = p * vs_ref[0, 0, :, :]                  # (1, bkv) broadcast
    if pv_int8:
        # dynamic per-row requantization of P -> second s8 MXU matmul. An
        # all-masked row has rowmax 0 -> p/ps = 0/eps = 0 (no-op).
        rowmax = jnp.max(p, axis=1, keepdims=True)
        ps = jnp.maximum(rowmax, 1e-30) * (1.0 / 127.0)
        p8 = jnp.round(p / ps).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p8, v_ref[0, 0, :, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * ps
    else:
        v = v_ref[0, 0, :, :].astype(jnp.bfloat16)
        pv = jax.lax.dot(p.astype(jnp.bfloat16), v,
                         preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] + pv


def _emit(out_ref, lse_ref, l_scr, acc_scr):
    l = l_scr[:, :1]
    dead = l == 0.0
    safe_l = jnp.where(dead, 1.0, l)
    out_ref[...] = jnp.where(dead, 0.0, acc_scr[...] / safe_l
                             ).astype(out_ref.dtype).reshape(out_ref.shape)
    lse_ref[...] = jnp.where(dead, -jnp.inf, jnp.log(safe_l)
                             ).reshape(lse_ref.shape)


def _sage_kernel_tri(
    iq_tab_ref, ik_tab_ref,  # scalar prefetch: linear step -> (iq, ik)
    q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref, lse_ref,
    l_scr, acc_scr,
    *, pv_int8, bq,
):
    """Causal self-attention over the triangular live-tile grid (the same
    scalar-prefetched (iq, ik) table enumeration as ops/flash.py's
    _fwd_kernel_tri: no skipped grid steps, flat compile times)."""
    idx = pl.program_id(2)
    iq = iq_tab_ref[idx]
    ik = ik_tab_ref[idx]

    @pl.when(ik == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    kw = dict(pv_int8=pv_int8, bq=bq, bkv=bq)

    @pl.when(ik < iq)
    def _():
        _sage_compute(q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
                      l_scr, acc_scr, mask=None, **kw)

    @pl.when(ik == iq)
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 1)
        _sage_compute(q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
                      l_scr, acc_scr, mask=cols > rows, **kw)

    @pl.when(ik == iq)  # the diagonal tile is the row's last step
    def _done():
        _emit(out_ref, lse_ref, l_scr, acc_scr)


def _sage_kernel_rect(
    q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref, lse_ref,
    l_scr, acc_scr,
    *, pv_int8, bq, bkv,
):
    """Non-causal self-attention over the full rectangular grid."""
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    _sage_compute(q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
                  l_scr, acc_scr, mask=None,
                  pv_int8=pv_int8, bq=bq, bkv=bkv)

    @pl.when(ik == nk - 1)
    def _done():
        _emit(out_ref, lse_ref, l_scr, acc_scr)


def _sage_kernel_pos(
    q_off_ref, kv_off_ref,  # scalar prefetch: global chunk start positions
    q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref, lse_ref,
    l_scr, acc_scr,
    *, mcfg, pv_int8, chunk_q, chunk_kv,
):
    """Position-descriptor sage forward — the ring-schedule path.

    Same global-position machinery as ops/flash.py's ``_fwd_kernel`` (the
    offsets may be traced ring ranks; masks/skips evaluate against global
    token positions via the shared ``_tile_skip``/``_tile_interior``/
    ``_tile_mask`` helpers and a mask-only FlashConfig ``mcfg``), with the
    int8-MXU score/PV math of ``_sage_compute``. This is what lets
    ``RingConfig(impl="sage")`` dispatch the quantized kernel inside every
    ring schedule, matching the reference's SAGE-through-ring dispatch
    (`ring/ring_flash_attn.py:36`, `kernels/__init__.py:177-242`).
    """
    from long_context_attention_tpu.ops.flash import (
        _positions, _tile_interior, _tile_mask, _tile_skip)

    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)
    bq, bkv = mcfg.block_q, mcfg.block_kv

    @pl.when(ik == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q_first, q_last = _positions(q_off_ref, iq * bq, bq, chunk_q, mcfg.q_stride)
    kv_first, kv_last = _positions(kv_off_ref, ik * bkv, bkv, chunk_kv,
                                   mcfg.kv_stride)
    if mcfg.needs_mask:
        active = jnp.logical_not(_tile_skip(mcfg, q_first, q_last,
                                            kv_first, kv_last))
        interior = _tile_interior(mcfg, q_first, q_last, kv_first, kv_last)
    else:
        active = jnp.bool_(True)
        interior = jnp.bool_(True)

    kw = dict(pv_int8=pv_int8, bq=bq, bkv=bkv)

    @pl.when(active & interior)
    def _():
        _sage_compute(q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
                      l_scr, acc_scr, mask=None, **kw)

    @pl.when(active & jnp.logical_not(interior))
    def _():
        _sage_compute(q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
                      l_scr, acc_scr,
                      mask=_tile_mask(mcfg, q_first, kv_first, bq, bkv), **kw)

    @pl.when(ik == nk - 1)
    def _done():
        _emit(out_ref, lse_ref, l_scr, acc_scr)


# ---------------------------------------------------------------------------
# BHSD drivers
# ---------------------------------------------------------------------------


def _sage_fwd_tri_bhsd(q8, qs, k8, ks, v8, vs, *, pv_int8, bq,
                       out_dtype, interpret):
    b, h, s, d = q8.shape
    h_kv = k8.shape[1]
    g = h // h_kv
    nq = s // bq
    tri = nq * (nq + 1) // 2
    iq_tab = jnp.asarray(np.repeat(np.arange(nq), np.arange(1, nq + 1)), jnp.int32)
    ik_tab = jnp.asarray(np.concatenate([np.arange(i + 1) for i in range(nq)]), jnp.int32)

    def qi(ib, ih, idx, iq_t, ik_t):
        return (ib, ih, iq_t[idx], 0)

    def qsi(ib, ih, idx, iq_t, ik_t):
        return (ib * h + ih, iq_t[idx], 0, 0)

    def kvi(ib, ih, idx, iq_t, ik_t):
        return (ib, ih // g, ik_t[idx], 0)

    def ksi(ib, ih, idx, iq_t, ik_t):
        return (ib * h_kv + ih // g, ik_t[idx], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h, tri),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), qi),
            pl.BlockSpec((1, 1, bq, 1), qsi),
            pl.BlockSpec((1, 1, bq, d), kvi),
            pl.BlockSpec((1, 1, 1, bq), ksi),
            pl.BlockSpec((1, 1, bq, d), kvi),
            pl.BlockSpec((1, 1, 1, bq), ksi),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), qi),
            pl.BlockSpec((1, 1, 1, bq), qsi),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_sage_kernel_tri, pv_int8=pv_int8, bq=bq),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d), out_dtype),
            jax.ShapeDtypeStruct((b * h, s // bq, 1, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * s * s * d,
            bytes_accessed=q8.size * 1 + k8.size * 2,
            transcendentals=b * h * s * s // 2,
        ),
        interpret=interpret,
    )(iq_tab, ik_tab,
      q8, _qscale_tiles(qs, bq),
      k8, _scale_tiles(ks, bq), v8, _scale_tiles(vs, bq))
    return out, lse.reshape(b, h, s)


def _sage_fwd_pos_bhsd(q8, qs, k8, ks, v8, vs, q_off, kv_off, *, mcfg,
                       pv_int8, out_dtype, interpret):
    """Position-descriptor driver (ring schedules / cross-attention): the
    rectangular grid of ops/flash.py's ``_flash_fwd_bhsd`` — scalar-prefetched
    chunk offsets, whole-tile skipping by global positions, DMA-eliding
    clamped KV index maps when the kv side is one contiguous chunk — with the
    int8 operand set (values + per-token scales)."""
    from long_context_attention_tpu.ops.flash import _kv_clamp_index_map

    b, h, s_q, d = q8.shape
    _, h_kv, s_kv, _ = k8.shape
    g = h // h_kv
    bq, bkv = mcfg.block_q, mcfg.block_kv
    nq, nk = s_q // bq, s_kv // bkv
    chunk_q = s_q // mcfg.n_q_chunks
    chunk_kv = s_kv // mcfg.n_kv_chunks

    if mcfg.needs_mask and mcfg.n_kv_chunks == 1 and mcfg.kv_stride == 1:
        kv_index_map = _kv_clamp_index_map(mcfg, g, chunk_q, nk)
    else:
        kv_index_map = lambda ib, ih, iq, ik, *_: (ib, ih // g, ik, 0)

    def sc_map(ib, ih, iq, ik, *pref):
        ibb, ihk, ikc, _ = kv_index_map(ib, ih, iq, ik, *pref)
        return (ibb * h_kv + ihk, ikc, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda ib, ih, iq, ik, *_: (ib, ih, iq, 0)),
            pl.BlockSpec((1, 1, bq, 1),
                         lambda ib, ih, iq, ik, *_: (ib * h + ih, iq, 0, 0)),
            pl.BlockSpec((1, 1, bkv, d), kv_index_map),
            pl.BlockSpec((1, 1, 1, bkv), sc_map),
            pl.BlockSpec((1, 1, bkv, d), kv_index_map),
            pl.BlockSpec((1, 1, 1, bkv), sc_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda ib, ih, iq, ik, *_: (ib, ih, iq, 0)),
            pl.BlockSpec((1, 1, 1, bq),
                         lambda ib, ih, iq, ik, *_: (ib * h + ih, iq, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_sage_kernel_pos, mcfg=mcfg,
                          pv_int8=pv_int8, chunk_q=chunk_q, chunk_kv=chunk_kv),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_q, d), out_dtype),
            jax.ShapeDtypeStruct((b * h, s_q // bq, 1, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_q * s_kv * d,
            bytes_accessed=q8.size * 1 + k8.size * 2,
            transcendentals=b * h * s_q * s_kv,
        ),
        interpret=interpret,
    )(q_off, kv_off,
      q8, _qscale_tiles(qs, bq),
      k8, _scale_tiles(ks, bkv), v8, _scale_tiles(vs, bkv))
    return out, lse.reshape(b, h, s_q)


def _sage_fwd_rect_bhsd(q8, qs, k8, ks, v8, vs, *, pv_int8, bq, bkv,
                        out_dtype, interpret):
    b, h, s_q, d = q8.shape
    _, h_kv, s_kv, _ = k8.shape
    g = h // h_kv
    nq, nk = s_q // bq, s_kv // bkv

    out, lse = pl.pallas_call(
        functools.partial(_sage_kernel_rect,
                          pv_int8=pv_int8, bq=bq, bkv=bkv),
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
            pl.BlockSpec((1, 1, bq, 1),
                         lambda ib, ih, iq, ik: (ib * h + ih, iq, 0, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda ib, ih, iq, ik: (ib, ih // g, ik, 0)),
            pl.BlockSpec((1, 1, 1, bkv),
                         lambda ib, ih, iq, ik: (ib * h_kv + ih // g, ik, 0, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda ib, ih, iq, ik: (ib, ih // g, ik, 0)),
            pl.BlockSpec((1, 1, 1, bkv),
                         lambda ib, ih, iq, ik: (ib * h_kv + ih // g, ik, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
            pl.BlockSpec((1, 1, 1, bq),
                         lambda ib, ih, iq, ik: (ib * h + ih, iq, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_q, d), out_dtype),
            jax.ShapeDtypeStruct((b * h, s_q // bq, 1, bq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_q * s_kv * d,
            bytes_accessed=q8.size * 1 + k8.size * 2,
            transcendentals=b * h * s_q * s_kv,
        ),
        interpret=interpret,
    )(q8, _qscale_tiles(qs, bq),
      k8, _scale_tiles(ks, bkv), v8, _scale_tiles(vs, bkv))
    return out, lse.reshape(b, h, s_q)


# ---------------------------------------------------------------------------
# Public API (BSHD contract)
# ---------------------------------------------------------------------------


def _to_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def _fit(block, seq):
    block = min(block, seq)
    while seq % block:
        block //= 2
    return max(block, 1)


def sage_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    pv_int8: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    sink_tokens: int = 0,
    q_offsets=None,
    kv_offsets=None,
    q_stride: int = 1,
    kv_stride: int = 1,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    return_lse: bool = False,
):
    """INT8 quantized-MXU attention (see module docstring). BSHD in/out.

    Args:
      q: (b, s_q, h, d) bf16/fp32; k, v: (b, s_kv, h_kv, d), GQA supported.
      causal: causal masking — plain self-attention takes the triangular
        live-tile grid; everything else (ring position descriptors,
        cross-attention, windows) runs the position-aware rectangular grid.
      pv_int8: also run PV on the s8 MXU (SageAttention2-style) — measured
        slower on v5e (P requantization is VPU work on the critical path);
        default False keeps PV in bf16 (v1-style, tighter numerics too).
      q_offsets / kv_offsets / q_stride / kv_stride: the global-position
        descriptor of parallel/layouts.py (offsets may be traced ring ranks) —
        the same contract as ops/flash.py, which is what lets every ring
        schedule dispatch ``impl="sage"`` like the reference dispatches its
        SAGE_* AttnTypes inside the ring (`ring/ring_flash_attn.py:36`).
      window_size / sink_tokens: sliding-window ± StreamingLLM sinks,
        evaluated against global positions (ring/USP-consistent).
      return_lse: also return the (b, h, s_q) fp32 log-sum-exp.

    Forward-only (like the reference's Sage adapters); for a differentiable
    layer use ``sage_attention_full``.
    """
    b, s_q, h, d = q.shape
    _, s_kv, h_kv, _ = k.shape
    assert h % h_kv == 0, f"GQA requires h ({h}) % h_kv ({h_kv}) == 0"
    bs = block_sizes or BlockSizes()
    interpret = default_interpret() if interpret is None else bool(interpret)
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)
    window = (int(window_size[0]), int(window_size[1]))

    qb = _to_bhsd(q)
    q8, qs = _quant_per_token(qb)
    # fold softmax scale * log2(e) into the per-row q scales: the kernels'
    # scores land directly in exp2 units (max-free softmax, _sage_compute)
    qs = qs * (scale * _LOG2E)
    k8, ks, v8, vs, k_mean = sage_quantize_kv(_to_bhsd(k), _to_bhsd(v))

    trivial = (q_offsets is None and kv_offsets is None
               and q_stride == 1 and kv_stride == 1)
    # the tri grid's (iq, ik) SMEM tables cap out like flash.py's
    # (_TRI_TABLE_MAX live tiles ~ 370K tokens at bq=1024); past it, the
    # position-aware rectangular path (whole-tile causal skipping + clamped
    # DMA) takes over instead of OOMing scalar memory
    from long_context_attention_tpu.ops.flash import _TRI_TABLE_MAX

    bq_tri = _fit(min(bs.block_q, bs.block_kv), s_q)
    tri_fits = (s_q // bq_tri) * (s_q // bq_tri + 1) // 2 <= _TRI_TABLE_MAX
    if (trivial and causal and s_q == s_kv and window == (-1, -1)
            and tri_fits):
        out, lse = _sage_fwd_tri_bhsd(
            q8, qs, k8, ks, v8, vs, pv_int8=pv_int8, bq=bq_tri,
            out_dtype=q.dtype, interpret=interpret)
    elif trivial and not causal and window == (-1, -1):
        bq = _fit(bs.block_q, s_q)
        bkv = _fit(bs.block_kv, s_kv)
        out, lse = _sage_fwd_rect_bhsd(
            q8, qs, k8, ks, v8, vs, pv_int8=pv_int8,
            bq=bq, bkv=bkv, out_dtype=q.dtype, interpret=interpret)
    else:
        # position-descriptor path (ring schedules / cross-attention / window)
        from long_context_attention_tpu.ops.flash import (
            FlashConfig, _resolve_offsets)

        if q_offsets is None and kv_offsets is None and s_q != s_kv:
            # flash-attn semantics: bottom-right alignment on length mismatch
            q_offsets = jnp.array([s_kv - s_q], jnp.int32)
        n_q_chunks = 1 if q_offsets is None else len(q_offsets)
        n_kv_chunks = 1 if kv_offsets is None else len(kv_offsets)
        bq = _fit(bs.block_q, s_q // n_q_chunks)
        bkv = _fit(bs.block_kv, s_kv // n_kv_chunks)
        mcfg = FlashConfig(
            causal=causal, scale=scale, window=window, softcap=0.0,
            q_stride=int(q_stride), kv_stride=int(kv_stride),
            n_q_chunks=n_q_chunks, n_kv_chunks=n_kv_chunks,
            block_q=bq, block_kv=bkv, block_q_bwd=bq, block_kv_bwd=bkv,
            interpret=interpret, sink=int(sink_tokens))
        out, lse = _sage_fwd_pos_bhsd(
            q8, qs, k8, ks, v8, vs,
            _resolve_offsets(q_offsets, n_q_chunks),
            _resolve_offsets(kv_offsets, n_kv_chunks),
            mcfg=mcfg, pv_int8=pv_int8,
            out_dtype=q.dtype, interpret=interpret)
    if return_lse:
        # undo the K-centering LSE shift (row-constant, softmax-invariant —
        # out needs no correction, but merge/backward anchoring does)
        g = h // h_kv
        mean_rep = jnp.repeat(k_mean[:, :, 0, :], g, axis=1)  # (b, h, d)
        lse = lse + scale * jnp.einsum(
            "bhsd,bhd->bhs", qb.astype(jnp.float32), mean_rep)
    out = _to_bhsd(out)
    return (out, lse) if return_lse else out


def sage_attention_fwd(q, k, v, **kw):
    """Registry fwd-stage entry: returns (out, lse).

    Accepts (and checks) the common registry kwargs; anything the sage path
    does not implement raises rather than silently computing the wrong thing
    (the reference's FA3 adapter silently dropped causal/window,
    `kernels/attention.py:283-284` — the failure mode to avoid).
    """
    _vet_kwargs(kw)
    return sage_attention(
        q, k, v,
        causal=kw.get("causal", False),
        softmax_scale=kw.get("softmax_scale"),
        pv_int8=kw.get("pv_int8", False),
        window_size=kw.get("window_size", (-1, -1)),
        sink_tokens=kw.get("sink_tokens", 0),
        q_offsets=kw.get("q_offsets"),
        kv_offsets=kw.get("kv_offsets"),
        q_stride=kw.get("q_stride", 1),
        kv_stride=kw.get("kv_stride", 1),
        block_sizes=kw.get("block_sizes"),
        interpret=kw.get("interpret"),
        return_lse=True)


def sage_attention_fwd_prequant(
    q: jnp.ndarray,          # (b, s_q, h, d) bf16/fp32
    k8: jnp.ndarray,         # (b, s_kv, h_kv, d) int8 — PRE-quantized
    v8: jnp.ndarray,         # (ops/kv_cache.quantize_kv per-token scheme)
    k_scale: jnp.ndarray,    # (b, h_kv, s_kv) fp32
    v_scale: jnp.ndarray,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    pv_int8: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    sink_tokens: int = 0,
    q_offsets=None,
    kv_offsets=None,
    q_stride: int = 1,
    kv_stride: int = 1,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
):
    """Sage forward over PRE-quantized K/V (r5: the ring x sage direct-int8
    path). A ``kv_quant="int8"`` ring rotates int8 values + per-token
    scales over ICI (half the bytes); this entry feeds them STRAIGHT to the
    s8-MXU QK/PV kernels — no dequantize-then-requantize per ring step.
    The quantization scheme is `ops/kv_cache.quantize_kv`'s per-token
    absmax — identical math to `_quant_per_token`, minus the optional
    K mean-centering (an accuracy refinement, not a requirement; the LSE
    therefore needs no centering-shift correction and merges directly).
    Returns (out (b, s_q, h, d), lse (b, h, s_q) fp32)."""
    b, s_q, h, d = q.shape
    _, s_kv, h_kv, _ = k8.shape
    assert k8.dtype == jnp.int8, k8.dtype
    bs = block_sizes or BlockSizes()
    interpret = default_interpret() if interpret is None else bool(interpret)
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)

    qb = _to_bhsd(q)
    q8, qs = _quant_per_token(qb)
    qs = qs * (scale * _LOG2E)  # scores land in exp2 units (max-free)
    k8b, v8b = _to_bhsd(k8), _to_bhsd(v8)
    ks = jnp.asarray(k_scale, jnp.float32)
    vs = jnp.asarray(v_scale, jnp.float32)

    from long_context_attention_tpu.ops.flash import (
        FlashConfig, _resolve_offsets)

    if q_offsets is None and kv_offsets is None and s_q != s_kv:
        q_offsets = jnp.array([s_kv - s_q], jnp.int32)
    n_q_chunks = 1 if q_offsets is None else len(q_offsets)
    n_kv_chunks = 1 if kv_offsets is None else len(kv_offsets)
    bq = _fit(bs.block_q, s_q // n_q_chunks)
    bkv = _fit(bs.block_kv, s_kv // n_kv_chunks)
    mcfg = FlashConfig(
        causal=causal, scale=float(scale),
        window=(int(window_size[0]), int(window_size[1])), softcap=0.0,
        q_stride=int(q_stride), kv_stride=int(kv_stride),
        n_q_chunks=n_q_chunks, n_kv_chunks=n_kv_chunks,
        block_q=bq, block_kv=bkv, block_q_bwd=bq, block_kv_bwd=bkv,
        interpret=interpret, sink=int(sink_tokens))
    out, lse = _sage_fwd_pos_bhsd(
        q8, qs, k8b, ks, v8b, vs,
        _resolve_offsets(q_offsets, n_q_chunks),
        _resolve_offsets(kv_offsets, n_kv_chunks),
        mcfg=mcfg, pv_int8=pv_int8, out_dtype=q.dtype, interpret=interpret)
    return _to_bhsd(out), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _sage_full(q, k, v, causal, scale, pv_int8):
    out, _ = sage_attention_fwd(q, k, v, causal=causal, softmax_scale=scale,
                                pv_int8=pv_int8)
    return out


def _sage_full_fwd(q, k, v, causal, scale, pv_int8):
    out, lse = sage_attention_fwd(q, k, v, causal=causal,
                                  softmax_scale=scale, pv_int8=pv_int8)
    return out, (q, k, v, out, lse)


def _sage_full_bwd(causal, scale, pv_int8, res, dout):
    # straight-through: bf16 flash recomputation backward on the original
    # inputs, with the quantized forward's (out, lse) as the flash
    # decomposition anchor — the standard quantized-attention training recipe
    from long_context_attention_tpu.ops.flash import flash_attention_bwd

    q, k, v, out, lse = res
    dq, dk, dv = flash_attention_bwd(q, k, v, out, lse, dout,
                                     causal=causal, softmax_scale=scale)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_sage_full.defvjp(_sage_full_fwd, _sage_full_bwd)


def sage_attention_full(q, k, v, **kw):
    """Registry full-stage entry: differentiable end-to-end (quantized
    forward + bf16 recomputation backward)."""
    _vet_kwargs(kw)
    causal = kw.get("causal", False)
    scale = kw.get("softmax_scale")
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _sage_full(q, k, v, bool(causal), float(scale),
                      bool(kw.get("pv_int8", False)))


def _vet_kwargs(kw):
    """Raise on kwargs the sage path can't honor (without running it).

    Positions/strides/window/sinks are handled (the ring contract); what
    remains unsupported raises rather than silently computing the wrong
    thing (the reference's FA3 adapter silently dropped causal/window,
    `kernels/attention.py:283-284` — the failure mode to avoid).
    """
    kw = dict(kw)
    for name in ("causal", "softmax_scale", "pv_int8", "block_sizes",
                 "interpret", "return_lse", "window_size", "sink_tokens",
                 "q_offsets", "kv_offsets", "q_stride", "kv_stride"):
        kw.pop(name, None)
    neutral = {
        "softcap": 0.0, "dropout_p": 0.0,
        "q_segment_ids": None, "kv_segment_ids": None, "alibi_slopes": None,
        "dropout_key": None, "dropout_seed": None,
    }
    for name, ok in neutral.items():
        val = kw.pop(name, ok)
        bad = (val is not None) if ok is None else (val != ok)
        if bad:
            raise NotImplementedError(
                f"sage_attention does not implement {name}; use impl='pallas'")
    assert not kw, f"unexpected kwargs {sorted(kw)}"
