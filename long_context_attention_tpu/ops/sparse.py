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


# Scalar-prefetch tables live in SMEM (~1 MB/core). Gate with a clear error
# instead of a Mosaic OOM (the same discipline as flash.py's tri_grid gate).
_SMEM_TABLE_BUDGET = 768 * 1024

# flag bits in the packed per-step table
_F_FIRST = 1   # this step starts a fresh accumulator (new output row/column)
_F_LAST = 2    # this step emits the accumulator
_F_MASKED = 4  # tile straddles the causal diagonal: apply the in-tile mask
_F_DEAD = 8    # skip compute: FIRST|LAST|DEAD emits an all-masked row/column
               # (out = 0, lse = -inf — the merge identity); DEAD alone is a
               # rank-padding no-op (rank-indexed tables are padded to a
               # common length because shard_map traces one SPMD program)


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


def _row_tables(mh: np.ndarray, straddle: np.ndarray, per_head: bool,
                q_first=None, kv_first=None, bq: int = 0, bkv: int = 0,
                shift: int = 0):
    """Row-major live-tile enumeration (forward + dq): steps ordered by
    (head, q-tile), kv inner. Returns (ih, iq, ik, flags, qf, kf) int32
    tables — qf/kf are the tile's *global first positions* (they feed the
    in-tile causal mask; for ring shards they come from the layout's position
    descriptor rather than ``iq * bq``). Fully-masked q rows get one
    FIRST|LAST|DEAD entry so the kernel emits the merge identity
    (out = 0, lse = -inf) instead of leaving the block unwritten."""
    H, n_q, n_kv = mh.shape
    n_heads = H if per_head else 1
    if q_first is None:
        q_first = np.arange(n_q) * bq + shift
    if kv_first is None:
        kv_first = np.arange(n_kv) * bkv
    ih_l, iq_l, ik_l, fl_l, qf_l, kf_l = [], [], [], [], [], []

    def emit(ih, iq, ik, f):
        ih_l.append(ih)
        iq_l.append(iq)
        ik_l.append(int(ik))
        fl_l.append(f)
        qf_l.append(int(q_first[iq]))
        kf_l.append(int(kv_first[ik]))

    for ih in range(n_heads):
        for iq in range(n_q):
            live = np.flatnonzero(mh[ih, iq])
            if live.size == 0:
                emit(ih, iq, 0, _F_FIRST | _F_LAST | _F_DEAD)
                continue
            for pos, ik in enumerate(live):
                f = 0
                if pos == 0:
                    f |= _F_FIRST
                if pos == live.size - 1:
                    f |= _F_LAST
                if straddle[iq, ik]:
                    f |= _F_MASKED
                emit(ih, iq, ik, f)
    return tuple(np.asarray(t, np.int32)
                 for t in (ih_l, iq_l, ik_l, fl_l, qf_l, kf_l))


def _col_tables(mh: np.ndarray, straddle: np.ndarray, per_head: bool, g: int,
                q_first=None, kv_first=None, bq: int = 0, bkv: int = 0,
                shift: int = 0):
    """Column-major enumeration (dk/dv): steps ordered by (kv-head, kv-tile),
    with the GQA group x q-tile inner so one (bkv, d) accumulator serves the
    whole column. Returns (ihk, ig, iq, ik, flags, qf, kf) int32 tables;
    fully-masked kv columns get a FIRST|LAST|DEAD zero-emit entry."""
    H, n_q, n_kv = mh.shape
    hk = (H // g) if per_head else 1
    if q_first is None:
        q_first = np.arange(n_q) * bq + shift
    if kv_first is None:
        kv_first = np.arange(n_kv) * bkv
    ihk_l, ig_l, iq_l, ik_l, fl_l, qf_l, kf_l = [], [], [], [], [], [], []

    def emit(ihk, ig, iq, ik, f):
        ihk_l.append(ihk)
        ig_l.append(ig)
        iq_l.append(iq)
        ik_l.append(ik)
        fl_l.append(f)
        qf_l.append(int(q_first[iq]))
        kf_l.append(int(kv_first[ik]))

    for ihk in range(hk):
        for ik in range(n_kv):
            steps = []
            for ig in range(g):
                ih = (ihk * g + ig) if per_head else 0
                for iq in np.flatnonzero(mh[ih, :, ik]):
                    steps.append((ig, int(iq)))
            if not steps:
                emit(ihk, 0, 0, ik, _F_FIRST | _F_LAST | _F_DEAD)
                continue
            for pos, (ig, iq) in enumerate(steps):
                f = 0
                if pos == 0:
                    f |= _F_FIRST
                if pos == len(steps) - 1:
                    f |= _F_LAST
                if straddle[iq, ik]:
                    f |= _F_MASKED
                emit(ihk, ig, iq, ik, f)
    return tuple(np.asarray(t, np.int32)
                 for t in (ihk_l, ig_l, iq_l, ik_l, fl_l, qf_l, kf_l))


def _pad_rank_tables(per_rank, flag_col):
    """Stack per-rank table tuples (list over ranks of tuples of 1-D int32
    arrays) into flattened (R * T,) arrays, padding shorter ranks with DEAD
    copies of their last entry (same tile indices -> no extra DMA, no
    spurious output-block flush). ``flag_col`` is the index of the flags
    column (3 for row tables, 4 for col tables)."""
    R = len(per_rank)
    n_cols = len(per_rank[0])
    T = max(t[0].size for t in per_rank)
    out = []
    for c in range(n_cols):
        col = np.zeros((R, T), np.int32)
        for r, tabs in enumerate(per_rank):
            n = tabs[0].size
            col[r, :n] = tabs[c]
            if n < T:
                col[r, n:] = _F_DEAD if c == flag_col else tabs[c][-1]
        out.append(col.reshape(-1))
    return tuple(out), T


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


def _pos_causal_mask(qf, kf, bq, bkv):
    """In-tile causal mask from the tile's stored *global* first positions
    (table entries — for ring shards these come from the layout's position
    descriptor, not iq * bq)."""
    rows = qf + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
    cols = kf + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
    return cols > rows


def _sparse_fwd_kernel(
    rank_t, iq_tab, ik_tab, fl_tab, qf_tab, kf_tab,
    q_ref, k_ref, v_ref, out_ref, lse_ref,
    l_scr, acc_scr,
    *, bq: int, bkv: int, T: int,
):
    # grid (b, H, T): the live-tile step dimension; rank_t selects this
    # device's slice of the (n_ranks * T) flattened tables (ring rank or
    # ulysses head-shard — 0 on the single-device path). Softmax is the
    # max-free clamped exp2 fast form (ops/flash.py _CLAMP): the driver
    # pre-folds scale * log2e into q, p accumulates raw in fp32, one
    # normalize at emit — no per-tile max/subtract/rescale chain.
    from long_context_attention_tpu.ops.flash import _CLAMP

    j = rank_t[0] * T + pl.program_id(2)
    fl = fl_tab[j]
    alive = (fl & _F_DEAD) == 0

    @pl.when((fl & _F_FIRST) != 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _compute(masked: bool):
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if masked:
            mask = _pos_causal_mask(qf_tab[j], kf_tab[j], bq, bkv)
            s = jnp.where(mask, NEG_INF, s)
        p = jnp.exp2(jnp.minimum(s, _CLAMP))  # exp2(NEG_INF) == 0: masked
        l_scr[:, :1] = l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] = acc_scr[...] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(alive & ((fl & _F_MASKED) == 0))
    def _():
        _compute(masked=False)

    @pl.when(alive & ((fl & _F_MASKED) != 0))
    def _():
        _compute(masked=True)

    @pl.when((fl & _F_LAST) != 0)
    def _emit():
        l = l_scr[:, :1]
        dead = l == 0.0
        safe_l = jnp.where(dead, 1.0, l)
        out_ref[...] = jnp.where(dead, 0.0, acc_scr[...] / safe_l
                                 ).astype(out_ref.dtype).reshape(out_ref.shape)
        lse_ref[...] = jnp.where(dead, -jnp.inf, jnp.log(safe_l)
                                 ).reshape(lse_ref.shape)


def _rank_arr(rank):
    if rank is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(rank, jnp.int32).reshape(1)


def _sparse_fwd_bhsd(q, k, v, tabs, per_head, *, scale, bq, bkv, interpret,
                     rank=None, n_ranks=1):
    """``tabs``: (ih, iq, ik, fl, qf, kf) int32 arrays, flattened
    (n_ranks * T,); ``rank`` (traced scalar) selects the device's slice —
    ring rank or ulysses head-shard rank (None -> 0, single-device)."""
    b, h, s_q, d = q.shape
    h_kv = k.shape[1]
    g = h // h_kv
    # fold scale * log2e into q once (the kernel's max-free exp2 softmax)
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    ih_tab, iq_tab, ik_tab, fl_tab, qf_tab, kf_tab = (jnp.asarray(t) for t in tabs)
    T = int(iq_tab.shape[0]) // n_ranks
    rank_t = _rank_arr(rank)

    if per_head:
        grid = (b, 1, T)

        def qi(ib, _h, idx, rk, ih_t, iq_t, ik_t, fl_t, qf_t, kf_t):
            j = rk[0] * T + idx
            return (ib, ih_t[j], iq_t[j], 0)

        def kvi(ib, _h, idx, rk, ih_t, iq_t, ik_t, fl_t, qf_t, kf_t):
            j = rk[0] * T + idx
            return (ib, ih_t[j] // g, ik_t[j], 0)

        def lsei(ib, _h, idx, rk, ih_t, iq_t, ik_t, fl_t, qf_t, kf_t):
            j = rk[0] * T + idx
            return (ib * h + ih_t[j], iq_t[j], 0, 0)

        prefetch = (rank_t, ih_tab, iq_tab, ik_tab, fl_tab, qf_tab, kf_tab)

        def kern(rk, ih_t, iq_t, ik_t, fl_t, qf_t, kf_t, *refs, **kw):
            return _sparse_fwd_kernel(rk, iq_t, ik_t, fl_t, qf_t, kf_t,
                                      *refs, **kw)
    else:
        grid = (b, h, T)

        def qi(ib, ih, idx, rk, iq_t, ik_t, fl_t, qf_t, kf_t):
            return (ib, ih, iq_t[rk[0] * T + idx], 0)

        def kvi(ib, ih, idx, rk, iq_t, ik_t, fl_t, qf_t, kf_t):
            return (ib, ih // g, ik_t[rk[0] * T + idx], 0)

        def lsei(ib, ih, idx, rk, iq_t, ik_t, fl_t, qf_t, kf_t):
            return (ib * h + ih, iq_t[rk[0] * T + idx], 0, 0)

        prefetch = (rank_t, iq_tab, ik_tab, fl_tab, qf_tab, kf_tab)
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
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    heads_per_step = 1 if per_head else h
    out, lse = pl.pallas_call(
        functools.partial(kern, bq=bq, bkv=bkv, T=T),
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
    rank_t, iq_tab, ik_tab, fl_tab, qf_tab, kf_tab,
    q_ref, k_ref, v_ref, dout_ref, lse_ref, delta_ref, dq_ref,
    dq_scr,
    *, scale: float, bq: int, bkv: int, T: int,
):
    j = rank_t[0] * T + pl.program_id(2)
    fl = fl_tab[j]
    alive = (fl & _F_DEAD) == 0

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
            mask = _pos_causal_mask(qf_tab[j], kf_tab[j], bq, bkv)
            s = jnp.where(mask, NEG_INF, s)
        p = jnp.exp(s - lse_row)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_row)
        dq_scr[...] += scale * jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

    @pl.when(alive & ((fl & _F_MASKED) == 0))
    def _():
        _compute(masked=False)

    @pl.when(alive & ((fl & _F_MASKED) != 0))
    def _():
        _compute(masked=True)

    @pl.when((fl & _F_LAST) != 0)
    def _emit():
        dq_ref[...] = dq_scr[...].reshape(dq_ref.shape)


def _sparse_dkv_kernel(
    rank_t, ig_tab, iq_tab, ik_tab, fl_tab, qf_tab, kf_tab,
    q_ref, k_ref, v_ref, dout_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale: float, bq: int, bkv: int, T: int,
):
    j = rank_t[0] * T + pl.program_id(2)
    fl = fl_tab[j]
    alive = (fl & _F_DEAD) == 0

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
            mask = _pos_causal_mask(qf_tab[j], kf_tab[j], bq, bkv)
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

    @pl.when(alive & ((fl & _F_MASKED) == 0))
    def _():
        _compute(masked=False)

    @pl.when(alive & ((fl & _F_MASKED) != 0))
    def _():
        _compute(masked=True)

    @pl.when((fl & _F_LAST) != 0)
    def _emit():
        dk_ref[...] = dk_scr[...].reshape(dk_ref.shape)
        dv_ref[...] = dv_scr[...].reshape(dv_ref.shape)


def _sparse_bwd_bhsd(q, k, v, out, lse, dout, row_tabs, col_tabs, per_head,
                     *, scale, bq, bkv, interpret, rank=None, n_ranks=1):
    """Sparse dq (row-major tables) + dk/dv (column-major tables). Tables are
    rank-flattened like the forward's; DEAD zero-emit entries cover
    fully-masked rows/columns, so no host-side coverage fix-up is needed."""
    b, h, s_q, d = q.shape
    h_kv, s_kv = k.shape[1], k.shape[2]
    g = h // h_kv
    nq = s_q // bq
    rank_t = _rank_arr(rank)

    # fully-masked rows carry lse = -inf: exp(s - (-inf)) would blow up, so
    # shift them to +NEG (p == 0 exactly, grads stay 0)
    lse_safe = jnp.where(jnp.isfinite(lse), lse, -NEG_INF)
    delta = jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32), axis=-1)
    lse_r = lse_safe.reshape(b * h, nq, 1, bq)
    delta_r = delta.reshape(b * h, nq, 1, bq)

    # --- dq over the row-major enumeration ---
    ih_tab, iq_tab, ik_tab, fl_tab, qf_tab, kf_tab = (
        jnp.asarray(t) for t in row_tabs)
    T = int(iq_tab.shape[0]) // n_ranks
    if per_head:
        grid = (b, 1, T)

        def qi(ib, _h, idx, rk, ih_t, iq_t, ik_t, fl_t, qf_t, kf_t):
            j = rk[0] * T + idx
            return (ib, ih_t[j], iq_t[j], 0)

        def kvi(ib, _h, idx, rk, ih_t, iq_t, ik_t, fl_t, qf_t, kf_t):
            j = rk[0] * T + idx
            return (ib, ih_t[j] // g, ik_t[j], 0)

        def rowi(ib, _h, idx, rk, ih_t, iq_t, ik_t, fl_t, qf_t, kf_t):
            j = rk[0] * T + idx
            return (ib * h + ih_t[j], iq_t[j], 0, 0)

        prefetch = (rank_t, ih_tab, iq_tab, ik_tab, fl_tab, qf_tab, kf_tab)

        def dq_kern(rk, ih_t, iq_t, ik_t, fl_t, qf_t, kf_t, *refs, **kw):
            return _sparse_dq_kernel(rk, iq_t, ik_t, fl_t, qf_t, kf_t,
                                     *refs, **kw)
    else:
        grid = (b, h, T)

        def qi(ib, ih, idx, rk, iq_t, ik_t, fl_t, qf_t, kf_t):
            return (ib, ih, iq_t[rk[0] * T + idx], 0)

        def kvi(ib, ih, idx, rk, iq_t, ik_t, fl_t, qf_t, kf_t):
            return (ib, ih // g, ik_t[rk[0] * T + idx], 0)

        def rowi(ib, ih, idx, rk, iq_t, ik_t, fl_t, qf_t, kf_t):
            return (ib * h + ih, iq_t[rk[0] * T + idx], 0, 0)

        prefetch = (rank_t, iq_tab, ik_tab, fl_tab, qf_tab, kf_tab)
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
        functools.partial(dq_kern, scale=scale, bq=bq, bkv=bkv, T=T),
        grid_spec=dq_spec,
        out_shape=[jax.ShapeDtypeStruct((b, h, s_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*prefetch, q, k, v, dout, lse_r, delta_r)

    # --- dk/dv over the column-major enumeration, GQA group inner ---
    ihk_tab, ig_tab, iqc_tab, ikc_tab, flc_tab, qfc_tab, kfc_tab = (
        jnp.asarray(t) for t in col_tabs)
    Tc = int(iqc_tab.shape[0]) // n_ranks
    if per_head:
        cgrid = (b, 1, Tc)

        def qci(ib, _hk, idx, rk, ihk_t, ig_t, iq_t, ik_t, fl_t, qf_t, kf_t):
            j = rk[0] * Tc + idx
            return (ib, ihk_t[j] * g + ig_t[j], iq_t[j], 0)

        def kvci(ib, _hk, idx, rk, ihk_t, ig_t, iq_t, ik_t, fl_t, qf_t, kf_t):
            j = rk[0] * Tc + idx
            return (ib, ihk_t[j], ik_t[j], 0)

        def rowci(ib, _hk, idx, rk, ihk_t, ig_t, iq_t, ik_t, fl_t, qf_t, kf_t):
            j = rk[0] * Tc + idx
            return (ib * h + ihk_t[j] * g + ig_t[j], iq_t[j], 0, 0)

        cprefetch = (rank_t, ihk_tab, ig_tab, iqc_tab, ikc_tab, flc_tab,
                     qfc_tab, kfc_tab)

        def dkv_kern(rk, ihk_t, ig_t, iq_t, ik_t, fl_t, qf_t, kf_t,
                     *refs, **kw):
            return _sparse_dkv_kernel(rk, ig_t, iq_t, ik_t, fl_t, qf_t, kf_t,
                                      *refs, **kw)
    else:
        cgrid = (b, h_kv, Tc)

        def qci(ib, ihk, idx, rk, ig_t, iq_t, ik_t, fl_t, qf_t, kf_t):
            j = rk[0] * Tc + idx
            return (ib, ihk * g + ig_t[j], iq_t[j], 0)

        def kvci(ib, ihk, idx, rk, ig_t, iq_t, ik_t, fl_t, qf_t, kf_t):
            return (ib, ihk, ik_t[rk[0] * Tc + idx], 0)

        def rowci(ib, ihk, idx, rk, ig_t, iq_t, ik_t, fl_t, qf_t, kf_t):
            j = rk[0] * Tc + idx
            return (ib * h + ihk * g + ig_t[j], iq_t[j], 0, 0)

        cprefetch = (rank_t, ig_tab, iqc_tab, ikc_tab, flc_tab, qfc_tab,
                     kfc_tab)
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
        functools.partial(dkv_kern, scale=scale, bq=bq, bkv=bkv, T=Tc),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h_kv, s_kv, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h_kv, s_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*cprefetch, q, k, v, dout, lse_r, delta_r)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper + public API (BSHD contract)
# ---------------------------------------------------------------------------


def _to_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


@functools.lru_cache(maxsize=None)
def _make_sparse_op(mask_key, mask_shape, h, n_q, n_kv, causal, scale, bq, bkv,
                    g, interpret, n_ranks=1):
    """``n_ranks > 1``: the mask's head axis covers ``h * n_ranks`` global
    heads split into contiguous per-rank blocks (the ulysses a2a hands rank r
    heads [r*h, (r+1)*h)); each rank's per-head tables are built separately,
    padded to a common length with DEAD entries, and selected in-kernel by
    the traced rank — what lets per-head masks compose with ulysses > 1."""
    mask = np.frombuffer(mask_key, dtype=np.bool_).reshape(mask_shape)
    shift = n_kv * bkv - n_q * bq
    if n_ranks > 1:
        per_head = True
        rows, cols = [], []
        for r in range(n_ranks):
            mh_r, _, straddle = _normalize_mask(
                mask[r * h:(r + 1) * h], h, n_q, n_kv, causal, bq, bkv)
            rows.append(_row_tables(mh_r, straddle, True, bq=bq, bkv=bkv,
                                    shift=shift))
            cols.append(_col_tables(mh_r, straddle, True, g, bq=bq, bkv=bkv,
                                    shift=shift))
        row_tabs, _ = _pad_rank_tables(rows, flag_col=3)
        col_tabs, _ = _pad_rank_tables(cols, flag_col=4)
        any_live = mask.any()
    else:
        mh, per_head, straddle = _normalize_mask(mask, h, n_q, n_kv, causal,
                                                 bq, bkv)
        row_tabs = _row_tables(mh, straddle, per_head, bq=bq, bkv=bkv,
                               shift=shift)
        col_tabs = _col_tables(mh, straddle, per_head, g, bq=bq, bkv=bkv,
                               shift=shift)
        any_live = mh.any()
    # fwd/dq (row tables) and dk/dv (col tables) are SEPARATE pallas calls;
    # each prefetches only its own tables, so the budget applies per set
    _check_smem(*row_tabs)
    _check_smem(*col_tabs)
    if not any_live:
        raise ValueError("block_mask has no live tiles")

    def fwd(q, k, v, rank):  # BHSD
        # fully-masked q rows get DEAD zero-emit table entries, so the kernel
        # itself writes the merge identity (out = 0, lse = -inf) — no
        # host-side coverage fix-up
        return _sparse_fwd_bhsd(
            q, k, v, row_tabs, per_head,
            scale=scale, bq=bq, bkv=bkv, interpret=interpret,
            rank=rank, n_ranks=n_ranks)

    @jax.custom_vjp
    def op(q, k, v, rank):
        return fwd(q, k, v, rank)

    def op_fwd(q, k, v, rank):
        out, lse = fwd(q, k, v, rank)
        return (out, lse), (q, k, v, rank, out, lse)

    def op_bwd(res, cts):
        q, k, v, rank, out, lse = res
        dout, _ = cts  # no gradient path through the LSE output
        dq, dk, dv = _sparse_bwd_bhsd(
            q, k, v, out, dout=dout.astype(q.dtype), lse=lse,
            row_tabs=row_tabs, col_tabs=col_tabs, per_head=per_head,
            scale=scale, bq=bq, bkv=bkv, interpret=interpret,
            rank=rank, n_ranks=n_ranks)
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
                None)

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
    head_shard=None,
):
    """Block-sparse flash attention over a static tile mask (True = attend).

    ``block_mask`` is tile-granular: entry (i, j) gates the (block_q x
    block_kv) tile covering q tokens [i*block_q, (i+1)*block_q) and kv tokens
    [j*block_kv, (j+1)*block_kv). ``causal=True`` intersects the mask with
    the causal triangle and applies exact in-tile masking on diagonal tiles
    (positions bottom-aligned when s_q != s_kv, matching ops/reference.py).
    A 3-D mask gives every query head its own pattern.

    ``head_shard=(rank, n_ranks)`` — heads are ulysses-sharded: the 3-D
    mask's head axis covers ``h * n_ranks`` GLOBAL heads and this call's h
    local heads are global block ``rank`` (traced ``lax.axis_index``); each
    rank's tables are rank-selected in-kernel, so per-head masks compose
    with ulysses > 1 (the reference's per-rank SpargeAttn tuning state,
    `test/test_hybrid_attn.py:269-277`).

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
    rank = None
    n_ranks = 1
    if head_shard is not None:
        rank, n_ranks = head_shard
        if n_ranks > 1 and (mask.ndim != 3 or mask.shape[0] != h * n_ranks):
            raise ValueError(
                f"head_shard needs a per-head mask of {h * n_ranks} global "
                f"heads; got shape {mask.shape} for {h} local heads x "
                f"{n_ranks} ranks")
        if n_ranks == 1:
            rank = None
    op = _make_sparse_op(
        mask.tobytes(), mask.shape, h, n_q, n_kv, bool(causal), float(scale),
        block_q, block_kv, h // h_kv, bool(interpret), int(n_ranks))
    rank_arr = _rank_arr(rank)
    out, lse = op(_to_bhsd(q), _to_bhsd(k), _to_bhsd(v), rank_arr)
    out = _to_bhsd(out)
    return (out, lse) if return_lse else out
