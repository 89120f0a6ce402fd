"""Block-sparse flash attention (static tile masks) — the sparse-attention role.

The reference ships sparse attention as the ``SPARSE_SAGE`` registry entry
(`yunchang/kernels/__init__.py:38-53`, dispatched at `:244-268`): a
caller-tuned SpargeAttn processor that skips attention blocks below a
similarity threshold. That design is CUDA-specific (per-block online
estimation inside the kernel). The TPU-native counterpart here takes the
idea to its XLA-friendly fixed point: the caller provides a **static
block-level mask** (any pattern — sliding window, global+local "streaming"
sinks, dilated strides, head-specific patterns), and the kernel enumerates
*only the live tiles* via scalar-prefetched (head, q-tile, kv-tile) tables —
the same flat-compile-time machinery as ops/flash.py's triangular causal
grid, generalized from "lower triangle" to "arbitrary tile set".

Why static masks: XLA/Mosaic require static shapes and schedules, and every
production sparse-attention pattern on TPU (splash-attention masks,
Longformer/BigBird global+window, dilated/strided families) is static per
model. Cost scales with the number of live tiles, not the full grid: a 10%
density mask runs ~10x fewer MXU passes, no skipped-step overhead, no wasted
DMA (dead tiles are never fetched).

Contract: identical to ops/flash.py — ``out (b, s_q, h, d)``, optional
``lse (b, h, s_q)`` fp32 — so outputs merge with any other block via
ops/merge.py. Fully-masked query rows produce ``out = 0, lse = -inf`` (the
merge identity), matching the dead-row semantics of the dense kernel.

The backward is a real sparse backward (dq over the row-major live set,
dk/dv over the column-major transpose with the GQA group folded into the
grid) — not a dense fallback; sparsity speeds up training the same way it
speeds up prefill. The reference's sparse path is forward-only inference
(SpargeAttn has no backward).
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

from long_context_attention_tpu.utils.config import NEG_INF, default_interpret

__all__ = [
    "block_sparse_attention",
    "block_sparse_attention_fwd",
    "sliding_window_block_mask",
    "global_local_block_mask",
    "strided_block_mask",
    "random_block_mask",
    "causal_block_mask",
    "mask_density",
]

_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)

# Scalar-prefetch tables live in SMEM (~1 MB/core). Gate with a clear error
# instead of a Mosaic OOM (the same discipline as flash.py's tri_grid gate).
_SMEM_TABLE_BUDGET = 768 * 1024

# flag bits in the packed per-step table
_F_FIRST = 1   # this step starts a fresh accumulator (new output row/column)
_F_LAST = 2    # this step emits the accumulator
_F_MASKED = 4  # tile straddles the causal diagonal: apply the in-tile mask


# ---------------------------------------------------------------------------
# Mask builders (host-side numpy; tile granularity)
# ---------------------------------------------------------------------------


def causal_block_mask(n_q: int, n_kv: int) -> np.ndarray:
    """Lower-triangular tile mask (block_q == block_kv assumed by callers)."""
    return np.tril(np.ones((n_q, n_kv), dtype=bool), k=n_kv - n_q)


def sliding_window_block_mask(n_q: int, n_kv: int, window_tiles: int) -> np.ndarray:
    """Band mask: tile (i, j) live when |i - j| < window_tiles (plus the
    diagonal)."""
    i = np.arange(n_q)[:, None]
    j = np.arange(n_kv)[None, :]
    return np.abs(i - (j - (n_kv - n_q))) < window_tiles


def global_local_block_mask(
    n_q: int, n_kv: int, window_tiles: int, sink_tiles: int = 1
) -> np.ndarray:
    """StreamingLLM / Longformer shape: a local band plus always-attended
    leading "sink" tiles (attention sinks, arXiv:2309.17453)."""
    m = sliding_window_block_mask(n_q, n_kv, window_tiles)
    m[:, :sink_tiles] = True
    return m


def strided_block_mask(n_q: int, n_kv: int, stride: int, local_tiles: int = 1) -> np.ndarray:
    """Dilated pattern: every ``stride``-th kv tile globally, plus a local
    band of ``local_tiles`` (BigBird/dilated-attention shape)."""
    i = np.arange(n_q)[:, None]
    j = np.arange(n_kv)[None, :]
    return (j % stride == 0) | (np.abs(i - (j - (n_kv - n_q))) < local_tiles)


def random_block_mask(
    n_q: int, n_kv: int, density: float, seed: int = 0, heads: Optional[int] = None
) -> np.ndarray:
    """Random tile mask at the given density with a guaranteed diagonal
    (test/benchmark helper)."""
    rng = np.random.default_rng(seed)
    shape = (n_q, n_kv) if heads is None else (heads, n_q, n_kv)
    m = rng.random(shape) < density
    diag = np.arange(min(n_q, n_kv))
    m[..., diag + (n_q - min(n_q, n_kv)), diag + (n_kv - min(n_q, n_kv))] = True
    return m


def mask_density(block_mask: np.ndarray, causal: bool = False) -> float:
    """Fraction of live tiles (after causal intersection) over the full grid."""
    m = np.asarray(block_mask, dtype=bool)
    n_q, n_kv = m.shape[-2:]
    if causal:
        m = m & causal_block_mask(n_q, n_kv)
    return float(m.sum() / (np.prod(m.shape[:-2], initial=1) * n_q * n_kv))


# ---------------------------------------------------------------------------
# Host-side live-tile table construction
# ---------------------------------------------------------------------------


def _normalize_mask(block_mask, h: int, n_q: int, n_kv: int, causal: bool,
                    bq: int, bkv: int):
    """Validate + expand the mask; returns (mask (H, n_q, n_kv), per_head,
    straddle (n_q, n_kv) bool of causal-diagonal tiles)."""
    m = np.asarray(block_mask)
    if m.dtype != np.bool_:
        m = m != 0
    if m.ndim == 2:
        per_head = False
        if m.shape != (n_q, n_kv):
            raise ValueError(
                f"block_mask shape {m.shape} != tile grid ({n_q}, {n_kv}) "
                f"(block_q={bq}, block_kv={bkv})")
        mh = m[None]
    elif m.ndim == 3:
        per_head = True
        if m.shape != (h, n_q, n_kv):
            raise ValueError(
                f"per-head block_mask shape {m.shape} != ({h}, {n_q}, {n_kv})")
        mh = m
    else:
        raise ValueError("block_mask must be (n_q, n_kv) or (h, n_q, n_kv)")

    # Causal tile classification against *global* positions (self-attention:
    # q row i covers tokens [i*bq, i*bq+bq), kv col j covers [j*bkv, j*bkv+bkv);
    # bottom-aligned when s_q != s_kv, like the dense kernel's oracle).
    q_first = np.arange(n_q)[:, None] * bq + (n_kv * bkv - n_q * bq)
    q_last = q_first + bq - 1
    kv_first = np.arange(n_kv)[None, :] * bkv
    kv_last = kv_first + bkv - 1
    if causal:
        reach = kv_first <= q_last           # tile has >=1 causal element
        straddle = reach & (kv_last > q_first)  # needs the in-tile mask
        mh = mh & reach
    else:
        straddle = np.zeros((n_q, n_kv), dtype=bool)
    return mh, per_head, straddle


def _row_tables(mh: np.ndarray, straddle: np.ndarray, per_head: bool):
    """Row-major live-tile enumeration (forward + dq): steps ordered by
    (head, q-tile), kv inner. Returns (ih, iq, ik, flags) int32 tables and a
    (H, n_q) row-coverage bool."""
    H, n_q, n_kv = mh.shape
    n_heads = H if per_head else 1
    ih_l, iq_l, ik_l, fl_l = [], [], [], []
    covered = np.zeros((n_heads, n_q), dtype=bool)
    for ih in range(n_heads):
        for iq in range(n_q):
            live = np.flatnonzero(mh[ih, iq])
            if live.size == 0:
                continue
            covered[ih, iq] = True
            for pos, ik in enumerate(live):
                f = 0
                if pos == 0:
                    f |= _F_FIRST
                if pos == live.size - 1:
                    f |= _F_LAST
                if straddle[iq, ik]:
                    f |= _F_MASKED
                ih_l.append(ih)
                iq_l.append(iq)
                ik_l.append(int(ik))
                fl_l.append(f)
    tabs = tuple(np.asarray(t, np.int32) for t in (ih_l, iq_l, ik_l, fl_l))
    return tabs, covered


def _col_tables(mh: np.ndarray, straddle: np.ndarray, per_head: bool, g: int):
    """Column-major enumeration (dk/dv): steps ordered by (kv-head, kv-tile),
    with the GQA group x q-tile inner so one (bkv, d) accumulator serves the
    whole column. Returns (ihk, ig, iq, ik, flags) int32 tables."""
    H, n_q, n_kv = mh.shape
    hk = (H // g) if per_head else 1
    ihk_l, ig_l, iq_l, ik_l, fl_l = [], [], [], [], []
    for ihk in range(hk):
        for ik in range(n_kv):
            steps = []
            for ig in range(g):
                ih = (ihk * g + ig) if per_head else 0
                for iq in np.flatnonzero(mh[ih, :, ik]):
                    steps.append((ig, int(iq)))
            for pos, (ig, iq) in enumerate(steps):
                f = 0
                if pos == 0:
                    f |= _F_FIRST
                if pos == len(steps) - 1:
                    f |= _F_LAST
                if straddle[iq, ik]:
                    f |= _F_MASKED
                ihk_l.append(ihk)
                ig_l.append(ig)
                iq_l.append(iq)
                ik_l.append(ik)
                fl_l.append(f)
    return tuple(np.asarray(t, np.int32) for t in (ihk_l, ig_l, iq_l, ik_l, fl_l))


def _check_smem(*tables):
    total = sum(t.nbytes for t in tables)
    if total > _SMEM_TABLE_BUDGET:
        raise ValueError(
            f"block-sparse tile tables need {total} B of SMEM scalar-prefetch "
            f"space (> {_SMEM_TABLE_BUDGET}); use larger block_q/block_kv or a "
            f"shared (non-per-head) mask")


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _tile_causal_mask(iq, ik, bq, bkv, shift):
    rows = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + shift
    cols = ik * bkv + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
    return cols > rows


def _sparse_fwd_kernel(
    iq_tab, ik_tab, fl_tab,
    q_ref, k_ref, v_ref, out_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, bq: int, bkv: int, shift: int,
):
    idx = pl.program_id(2)  # grid (b, H, T): the live-tile step dimension
    iq = iq_tab[idx]
    ik = ik_tab[idx]
    fl = fl_tab[idx]

    @pl.when((fl & _F_FIRST) != 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _compute(masked: bool):
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * (scale * _LOG2E)
        if masked:
            mask = _tile_causal_mask(iq, ik, bq, bkv, shift)
            s = jnp.where(mask, NEG_INF, s)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new)
        if masked:
            p = jnp.where(mask, 0.0, p)
        alpha = jnp.exp2(m_prev - m_new)
        l_scr[...] = jnp.broadcast_to(
            l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True), l_scr.shape)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when((fl & _F_MASKED) == 0)
    def _():
        _compute(masked=False)

    @pl.when((fl & _F_MASKED) != 0)
    def _():
        _compute(masked=True)

    @pl.when((fl & _F_LAST) != 0)
    def _emit():
        l = l_scr[:, :1]
        m = m_scr[:, :1]
        dead = l == 0.0
        safe_l = jnp.where(dead, 1.0, l)
        out_ref[...] = jnp.where(dead, 0.0, acc_scr[...] / safe_l
                                 ).astype(out_ref.dtype).reshape(out_ref.shape)
        lse_ref[...] = jnp.where(dead, -jnp.inf, m * _LN2 + jnp.log(safe_l)
                                 ).reshape(lse_ref.shape)


def _sparse_fwd_bhsd(q, k, v, tabs, per_head, *, scale, bq, bkv, interpret):
    b, h, s_q, d = q.shape
    h_kv = k.shape[1]
    s_kv = k.shape[2]
    g = h // h_kv
    shift = s_kv - s_q
    ih_tab, iq_tab, ik_tab, fl_tab = (jnp.asarray(t) for t in tabs)
    T = int(iq_tab.shape[0])

    if per_head:
        grid = (b, 1, T)

        def qi(ib, _h, idx, ih_t, iq_t, ik_t, fl_t):
            return (ib, ih_t[idx], iq_t[idx], 0)

        def kvi(ib, _h, idx, ih_t, iq_t, ik_t, fl_t):
            return (ib, ih_t[idx] // g, ik_t[idx], 0)

        def lsei(ib, _h, idx, ih_t, iq_t, ik_t, fl_t):
            return (ib * h + ih_t[idx], iq_t[idx], 0, 0)

        prefetch = (ih_tab, iq_tab, ik_tab, fl_tab)

        def kern(ih_t, iq_t, ik_t, fl_t, *refs, **kw):
            return _sparse_fwd_kernel(iq_t, ik_t, fl_t, *refs, **kw)
    else:
        grid = (b, h, T)

        def qi(ib, ih, idx, iq_t, ik_t, fl_t):
            return (ib, ih, iq_t[idx], 0)

        def kvi(ib, ih, idx, iq_t, ik_t, fl_t):
            return (ib, ih // g, ik_t[idx], 0)

        def lsei(ib, ih, idx, iq_t, ik_t, fl_t):
            return (ib * h + ih, iq_t[idx], 0, 0)

        prefetch = (iq_tab, ik_tab, fl_tab)
        kern = _sparse_fwd_kernel

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), qi),
            pl.BlockSpec((1, 1, bkv, d), kvi),
            pl.BlockSpec((1, 1, bkv, d), kvi),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), qi),
            pl.BlockSpec((1, 1, 1, bq), lsei),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    heads_per_step = 1 if per_head else h
    out, lse = pl.pallas_call(
        functools.partial(kern, scale=scale, bq=bq, bkv=bkv, shift=shift),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_q, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, s_q // bq, 1, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads_per_step * T * bq * bkv * d,
            bytes_accessed=(b * heads_per_step * T) * (bq + 2 * bkv) * d * 2,
            transcendentals=b * heads_per_step * T * bq * bkv,
        ),
        interpret=interpret,
    )(*prefetch, q, k, v)
    return out, lse.reshape(b, h, s_q)


# ---------------------------------------------------------------------------
# Backward kernels (sparse dq over the row enumeration; sparse dk/dv over the
# column enumeration with the GQA group inner — flash recompute style)
# ---------------------------------------------------------------------------


def _sparse_dq_kernel(
    iq_tab, ik_tab, fl_tab,
    q_ref, k_ref, v_ref, dout_ref, lse_ref, delta_ref, dq_ref,
    dq_scr,
    *, scale: float, bq: int, bkv: int, shift: int,
):
    idx = pl.program_id(2)
    iq = iq_tab[idx]
    ik = ik_tab[idx]
    fl = fl_tab[idx]

    @pl.when((fl & _F_FIRST) != 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    def _compute(masked: bool):
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        do = dout_ref[0, 0, :, :]
        lse_row = lse_ref[0, 0, 0, :][:, None]
        delta_row = delta_ref[0, 0, 0, :][:, None]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * scale
        if masked:
            mask = _tile_causal_mask(iq, ik, bq, bkv, shift)
            s = jnp.where(mask, NEG_INF, s)
        p = jnp.exp(s - lse_row)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_row)
        dq_scr[...] += scale * jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

    @pl.when((fl & _F_MASKED) == 0)
    def _():
        _compute(masked=False)

    @pl.when((fl & _F_MASKED) != 0)
    def _():
        _compute(masked=True)

    @pl.when((fl & _F_LAST) != 0)
    def _emit():
        dq_ref[...] = dq_scr[...].reshape(dq_ref.shape)


def _sparse_dkv_kernel(
    ig_tab, iq_tab, ik_tab, fl_tab,
    q_ref, k_ref, v_ref, dout_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale: float, bq: int, bkv: int, shift: int,
):
    idx = pl.program_id(2)
    iq = iq_tab[idx]
    ik = ik_tab[idx]
    fl = fl_tab[idx]

    @pl.when((fl & _F_FIRST) != 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    def _compute(masked: bool):
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        do = dout_ref[0, 0, :, :]
        lse_row = lse_ref[0, 0, 0, :][:, None]
        delta_row = delta_ref[0, 0, 0, :][:, None]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * scale
        if masked:
            mask = _tile_causal_mask(iq, ik, bq, bkv, shift)
            s = jnp.where(mask, NEG_INF, s)
        p = jnp.exp(s - lse_row)
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_row)
        dk_scr[...] += scale * jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when((fl & _F_MASKED) == 0)
    def _():
        _compute(masked=False)

    @pl.when((fl & _F_MASKED) != 0)
    def _():
        _compute(masked=True)

    @pl.when((fl & _F_LAST) != 0)
    def _emit():
        dk_ref[...] = dk_scr[...].reshape(dk_ref.shape)
        dv_ref[...] = dv_scr[...].reshape(dv_ref.shape)


def _sparse_bwd_bhsd(q, k, v, out, lse, dout, row_tabs, col_tabs, per_head,
                     *, scale, bq, bkv, interpret):
    b, h, s_q, d = q.shape
    h_kv, s_kv = k.shape[1], k.shape[2]
    g = h // h_kv
    shift = s_kv - s_q
    nq = s_q // bq

    # fully-masked rows carry lse = -inf: exp(s - (-inf)) would blow up, so
    # shift them to +NEG (p == 0 exactly, grads stay 0)
    lse_safe = jnp.where(jnp.isfinite(lse), lse, -NEG_INF)
    delta = jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32), axis=-1)
    lse_r = lse_safe.reshape(b * h, nq, 1, bq)
    delta_r = delta.reshape(b * h, nq, 1, bq)

    # --- dq over the row-major enumeration ---
    ih_tab, iq_tab, ik_tab, fl_tab = (jnp.asarray(t) for t in row_tabs)
    T = int(iq_tab.shape[0])
    if per_head:
        grid = (b, 1, T)

        def qi(ib, _h, idx, ih_t, iq_t, ik_t, fl_t):
            return (ib, ih_t[idx], iq_t[idx], 0)

        def kvi(ib, _h, idx, ih_t, iq_t, ik_t, fl_t):
            return (ib, ih_t[idx] // g, ik_t[idx], 0)

        def rowi(ib, _h, idx, ih_t, iq_t, ik_t, fl_t):
            return (ib * h + ih_t[idx], iq_t[idx], 0, 0)

        prefetch = (ih_tab, iq_tab, ik_tab, fl_tab)

        def dq_kern(ih_t, iq_t, ik_t, fl_t, *refs, **kw):
            return _sparse_dq_kernel(iq_t, ik_t, fl_t, *refs, **kw)
    else:
        grid = (b, h, T)

        def qi(ib, ih, idx, iq_t, ik_t, fl_t):
            return (ib, ih, iq_t[idx], 0)

        def kvi(ib, ih, idx, iq_t, ik_t, fl_t):
            return (ib, ih // g, ik_t[idx], 0)

        def rowi(ib, ih, idx, iq_t, ik_t, fl_t):
            return (ib * h + ih, iq_t[idx], 0, 0)

        prefetch = (iq_tab, ik_tab, fl_tab)
        dq_kern = _sparse_dq_kernel

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), qi),
            pl.BlockSpec((1, 1, bkv, d), kvi),
            pl.BlockSpec((1, 1, bkv, d), kvi),
            pl.BlockSpec((1, 1, bq, d), qi),
            pl.BlockSpec((1, 1, 1, bq), rowi),
            pl.BlockSpec((1, 1, 1, bq), rowi),
        ],
        out_specs=[pl.BlockSpec((1, 1, bq, d), qi)],
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
    )
    (dq,) = pl.pallas_call(
        functools.partial(dq_kern, scale=scale, bq=bq, bkv=bkv, shift=shift),
        grid_spec=dq_spec,
        out_shape=[jax.ShapeDtypeStruct((b, h, s_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*prefetch, q, k, v, dout, lse_r, delta_r)

    # fully-uncovered q rows never emit: zero them explicitly
    dq = _zero_uncovered_rows(dq, row_tabs, per_head, b, h, s_q, bq)

    # --- dk/dv over the column-major enumeration, GQA group inner ---
    ihk_tab, ig_tab, iqc_tab, ikc_tab, flc_tab = (jnp.asarray(t) for t in col_tabs)
    Tc = int(iqc_tab.shape[0])
    if per_head:
        cgrid = (b, 1, Tc)

        def qci(ib, _hk, idx, ihk_t, ig_t, iq_t, ik_t, fl_t):
            return (ib, ihk_t[idx] * g + ig_t[idx], iq_t[idx], 0)

        def kvci(ib, _hk, idx, ihk_t, ig_t, iq_t, ik_t, fl_t):
            return (ib, ihk_t[idx], ik_t[idx], 0)

        def rowci(ib, _hk, idx, ihk_t, ig_t, iq_t, ik_t, fl_t):
            return (ib * h + ihk_t[idx] * g + ig_t[idx], iq_t[idx], 0, 0)

        cprefetch = (ihk_tab, ig_tab, iqc_tab, ikc_tab, flc_tab)

        def dkv_kern(ihk_t, ig_t, iq_t, ik_t, fl_t, *refs, **kw):
            return _sparse_dkv_kernel(ig_t, iq_t, ik_t, fl_t, *refs, **kw)
    else:
        cgrid = (b, h_kv, Tc)

        def qci(ib, ihk, idx, ig_t, iq_t, ik_t, fl_t):
            return (ib, ihk * g + ig_t[idx], iq_t[idx], 0)

        def kvci(ib, ihk, idx, ig_t, iq_t, ik_t, fl_t):
            return (ib, ihk, ik_t[idx], 0)

        def rowci(ib, ihk, idx, ig_t, iq_t, ik_t, fl_t):
            return (ib * h + ihk * g + ig_t[idx], iq_t[idx], 0, 0)

        cprefetch = (ig_tab, iqc_tab, ikc_tab, flc_tab)
        dkv_kern = _sparse_dkv_kernel

    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(cprefetch),
        grid=cgrid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), qci),
            pl.BlockSpec((1, 1, bkv, d), kvci),
            pl.BlockSpec((1, 1, bkv, d), kvci),
            pl.BlockSpec((1, 1, bq, d), qci),
            pl.BlockSpec((1, 1, 1, bq), rowci),
            pl.BlockSpec((1, 1, 1, bq), rowci),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bkv, d), kvci),
            pl.BlockSpec((1, 1, bkv, d), kvci),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, d), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(dkv_kern, scale=scale, bq=bq, bkv=bkv, shift=shift),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h_kv, s_kv, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h_kv, s_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*cprefetch, q, k, v, dout, lse_r, delta_r)

    dk = _zero_uncovered_cols(dk, col_tabs, per_head, b, h_kv, s_kv, bkv)
    dv = _zero_uncovered_cols(dv, col_tabs, per_head, b, h_kv, s_kv, bkv)
    return dq, dk, dv


def _zero_uncovered_rows(dq, row_tabs, per_head, b, h, s_q, bq):
    ih_tab, iq_tab = row_tabs[0], row_tabs[1]
    nq = s_q // bq
    cov = np.zeros((h, nq), dtype=bool) if per_head else np.zeros((1, nq), bool)
    cov[ih_tab if per_head else 0, iq_tab] = True
    if cov.all():
        return dq
    covv = np.repeat(cov, bq, axis=1)[None, :, :, None]  # (1, H|1, s, 1)
    return jnp.where(jnp.asarray(covv), dq, jnp.zeros((), dq.dtype))


def _zero_uncovered_cols(dkv, col_tabs, per_head, b, h_kv, s_kv, bkv):
    ihk_tab, ikc_tab = col_tabs[0], col_tabs[3]
    nk = s_kv // bkv
    cov = np.zeros((h_kv, nk), dtype=bool) if per_head else np.zeros((1, nk), bool)
    cov[ihk_tab if per_head else 0, ikc_tab] = True
    if cov.all():
        return dkv
    covv = np.repeat(cov, bkv, axis=1)[None, :, :, None]
    return jnp.where(jnp.asarray(covv), dkv, jnp.zeros((), dkv.dtype))


# ---------------------------------------------------------------------------
# custom_vjp wrapper + public API (BSHD contract)
# ---------------------------------------------------------------------------


def _to_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


@functools.lru_cache(maxsize=None)
def _make_sparse_op(mask_key, mask_shape, h, n_q, n_kv, causal, scale, bq, bkv,
                    g, interpret):
    mask = np.frombuffer(mask_key, dtype=np.bool_).reshape(mask_shape)
    mh, per_head, straddle = _normalize_mask(mask, h, n_q, n_kv, causal, bq, bkv)
    row_tabs, covered = _row_tables(mh, straddle, per_head)
    col_tabs = _col_tables(mh, straddle, per_head, g)
    _check_smem(*row_tabs, *col_tabs)
    if row_tabs[0].size == 0:
        raise ValueError("block_mask has no live tiles")

    # per-token coverage fix-up for fully-masked q rows (out = 0, lse = -inf)
    if covered.all():
        cov_tok = None
    else:
        cov_tok = np.repeat(covered, bq, axis=1)  # (H|1, s_q)

    def fwd(q, k, v):  # BHSD
        out, lse = _sparse_fwd_bhsd(
            q, k, v, row_tabs, per_head,
            scale=scale, bq=bq, bkv=bkv, interpret=interpret)
        if cov_tok is not None:
            # where, not multiply: never-emitted output blocks hold garbage
            # (NaN in interpret mode) and NaN * 0 == NaN
            cv = jnp.asarray(cov_tok)[None]  # (1, H|1, s)
            out = jnp.where(cv[..., None], out, jnp.zeros((), out.dtype))
            lse = jnp.where(cv, lse, -jnp.inf)
        return out, lse

    @jax.custom_vjp
    def op(q, k, v):
        return fwd(q, k, v)

    def op_fwd(q, k, v):
        out, lse = fwd(q, k, v)
        return (out, lse), (q, k, v, out, lse)

    def op_bwd(res, cts):
        q, k, v, out, lse = res
        dout, _ = cts  # no gradient path through the LSE output
        dq, dk, dv = _sparse_bwd_bhsd(
            q, k, v, out, dout=dout.astype(q.dtype), lse=lse,
            row_tabs=row_tabs, col_tabs=col_tabs, per_head=per_head,
            scale=scale, bq=bq, bkv=bkv, interpret=interpret)
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    op.defvjp(op_fwd, op_bwd)
    return op


def block_sparse_attention_fwd(q, k, v, block_mask, **kw):
    """Forward-only entry: returns ``(out, lse)`` (ring-merge contract)."""
    kw["return_lse"] = True
    return block_sparse_attention(q, k, v, block_mask, **kw)


def block_sparse_attention(
    q: jnp.ndarray,   # (b, s_q, h, d)
    k: jnp.ndarray,   # (b, s_kv, h_kv, d)
    v: jnp.ndarray,   # (b, s_kv, h_kv, d)
    block_mask,       # static bool np.ndarray (n_q, n_kv) or (h, n_q, n_kv)
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Block-sparse flash attention over a static tile mask (True = attend).

    ``block_mask`` is tile-granular: entry (i, j) gates the (block_q x
    block_kv) tile covering q tokens [i*block_q, (i+1)*block_q) and kv tokens
    [j*block_kv, (j+1)*block_kv). ``causal=True`` intersects the mask with
    the causal triangle and applies exact in-tile masking on diagonal tiles
    (positions bottom-aligned when s_q != s_kv, matching ops/reference.py).
    A 3-D mask gives every query head its own pattern.

    Differentiable: the backward runs sparse dq / dk+dv kernels over the same
    live-tile set. The mask must be a concrete host array — it keys the
    compiled op (like splash-attention's MaskInfo).
    """
    if hasattr(block_mask, "aval"):
        raise TypeError("block_mask must be a static host array, not a traced value")
    b, s_q, h, d = q.shape
    s_kv, h_kv = k.shape[1], k.shape[2]
    if h % h_kv:
        raise ValueError(f"q heads {h} not a multiple of kv heads {h_kv}")
    block_q = min(block_q, s_q)
    block_kv = min(block_kv, s_kv)
    if s_q % block_q or s_kv % block_kv:
        raise ValueError(
            f"sequence lengths ({s_q}, {s_kv}) must be multiples of the "
            f"block sizes ({block_q}, {block_kv})")
    n_q, n_kv = s_q // block_q, s_kv // block_kv
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)
    interpret = default_interpret() if interpret is None else interpret

    mask = np.ascontiguousarray(np.asarray(block_mask, dtype=np.bool_))
    op = _make_sparse_op(
        mask.tobytes(), mask.shape, h, n_q, n_kv, bool(causal), float(scale),
        block_q, block_kv, h // h_kv, bool(interpret))
    out, lse = op(_to_bhsd(q), _to_bhsd(k), _to_bhsd(v))
    out = _to_bhsd(out)
    return (out, lse) if return_lse else out
