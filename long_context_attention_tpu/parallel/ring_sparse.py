"""Block-sparse attention composed with the ring schedules.

The reference dispatches its sparse role (SPARSE_SAGE) inside the ring like
any other AttnType (`yunchang/kernels/__init__.py:244-268` selected from
`ring/ring_flash_attn.py:36`). The TPU obstacle is that ops/sparse.py's
live-tile tables are *static* while a ring rank is a *traced* value
(``lax.axis_index``). The resolution here: build the live-tile tables for
EVERY (rank, ring-step) pair at trace time — the global block mask, the
layout, and the ring size are all static, so each rank's tile set is known —
then let the kernels select their rank's slice through one scalar-prefetched
index (`ops/sparse.py` rank-flattened tables). Ranks are padded to a common
step count with DEAD no-op entries because shard_map traces one SPMD program.

Cost model: per ring step, every rank runs max-over-ranks(live tiles for
that step) grid steps. For the patterns that motivate sparsity at ring scale
(streaming sink+window, strided) most (rank, step) pairs are nearly empty,
so prefill cost collapses toward the mask density exactly like the
single-device kernel — and unlike the reference's forward-only SpargeAttn
role, the backward is sparse too (rank-indexed dq / dk+dv kernels).

Layouts: ``basic`` and ``zigzag`` (chunk-aligned — every local tile maps to
one global tile). ``stripe`` interleaves tokens at stride W, so a local tile
spans W global tiles; encode stripe-like balance with zigzag instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from long_context_attention_tpu.ops.merge import merge_attn_blocks
from long_context_attention_tpu.ops.sparse import (
    _F_DEAD,
    _F_FIRST,
    _F_LAST,
    _F_MASKED,
    _check_smem,
    _pad_rank_tables,
    _sparse_bwd_bhsd,
    _sparse_fwd_bhsd,
)
from long_context_attention_tpu.utils.config import default_interpret

__all__ = ["ring_sparse_attention_local"]


def _rank_tile_firsts(layout: str, r: int, W: int, local_len: int, blk: int):
    """Global first position of each of rank ``r``'s local (size-``blk``)
    tiles, in local order. Requires chunk alignment: every local tile lies
    inside one layout chunk and starts on a ``blk`` boundary globally."""
    if layout == "basic":
        chunks = [(r * local_len, local_len)]
    elif layout == "zigzag":
        half = local_len // 2
        chunks = [(r * half, half), ((2 * W - 1 - r) * half, half)]
    else:
        raise NotImplementedError(
            f"ring-sparse supports layouts 'basic'/'zigzag', not {layout!r} "
            "(stripe interleaves tokens below tile granularity)")
    firsts = []
    for g0, ln in chunks:
        if ln % blk or g0 % blk:
            raise ValueError(
                f"layout chunk (start {g0}, len {ln}) not aligned to the "
                f"sparse block size {blk}; shrink block_q/block_kv")
        firsts.extend(g0 + t * blk for t in range(ln // blk))
    return np.asarray(firsts, np.int64)


@functools.lru_cache(maxsize=None)
def _ring_step_tables(mask_key, mask_shape, causal, W, layout,
                      s_local_q, s_local_kv, bq, bkv, g, n_hs=1):
    """Per ring step t: rank-flattened row (fwd/dq) and column (dk/dv)
    tables over each rank's local tile grid, tile liveness read off the
    *global* block mask at the tiles' global positions. 3-D masks
    (h, n_q, n_kv) enumerate per-head live tiles (r5: the SPARSE_SAGE
    per-head role through ANY ring schedule, matching
    `kernels/__init__.py:244-268` dispatched from `ring_flash_attn.py:36`)
    — the same ops/sparse.py enumerators the single-device and ulysses
    paths use, fed the ring shards' global tile positions."""
    mask = np.frombuffer(mask_key, dtype=np.bool_).reshape(mask_shape)
    per_head = mask.ndim == 3
    mh = mask if per_head else mask[None]
    h_loc = mh.shape[0] // n_hs   # heads per ulysses shard (n_hs = 1: all)
    qf = [_rank_tile_firsts(layout, r, W, s_local_q, bq) for r in range(W)]
    kf = [_rank_tile_firsts(layout, r, W, s_local_kv, bkv) for r in range(W)]
    from long_context_attention_tpu.ops.sparse import (
        _col_tables,
        _row_tables,
    )

    steps = []
    for t in range(W):
        # combined rank index u * W + r: under USP each ulysses shard u
        # enumerates only ITS head block's live tiles (the a2a hands rank
        # u the u-th contiguous global head block)
        row_ranks, col_ranks = [], []
        for u in range(n_hs):
            mu = mh[u * h_loc:(u + 1) * h_loc]
            for r in range(W):
                src = (r - t) % W
                qfr, kfs = qf[r], kf[src]
                sub = mu[:, qfr[:, None] // bq, kfs[None, :] // bkv]
                if causal:
                    reach = kfs[None, :] <= qfr[:, None] + bq - 1
                    straddle = reach & (kfs[None, :] + bkv - 1 > qfr[:, None])
                    sub = sub & reach[None]
                else:
                    straddle = np.zeros(sub.shape[1:], dtype=bool)
                row_ranks.append(_row_tables(sub, straddle, per_head,
                                             q_first=qfr, kv_first=kfs))
                col_ranks.append(_col_tables(sub, straddle, per_head, g,
                                             q_first=qfr, kv_first=kfs))

        row_tabs, _ = _pad_rank_tables(row_ranks, flag_col=3)
        col_tabs, _ = _pad_rank_tables(col_ranks, flag_col=4)
        # row (fwd/dq) and col (dk/dv) tables ride separate pallas calls
        _check_smem(*row_tabs)
        _check_smem(*col_tabs)
        steps.append((row_tabs, col_tabs))
    return tuple(steps)


def _rotate(x, axis_name, n):
    return lax.ppermute(x, axis_name, [(j, (j + 1) % n) for j in range(n)])


def _bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def _ring_sparse_fwd(q, k, v, rank, steps, *, axis_name, W, scale, bq, bkv,
                     interpret, per_head=False, n_ranks=None):
    b, s_q, h, d = q.shape
    qb = _bhsd(q)
    k_cur, v_cur = _bhsd(k), _bhsd(v)
    acc_out = jnp.zeros((b, s_q, h, d), jnp.float32)
    acc_lse = jnp.full((b, h, s_q), -jnp.inf, jnp.float32)
    for t in range(W):
        row_tabs, _ = steps[t]
        out_t, lse_t = _sparse_fwd_bhsd(
            qb, k_cur, v_cur, row_tabs, per_head,
            scale=scale, bq=bq, bkv=bkv, interpret=interpret,
            rank=rank, n_ranks=n_ranks or W)
        acc_out, acc_lse = merge_attn_blocks(acc_out, acc_lse,
                                             _bhsd(out_t), lse_t)
        if t < W - 1:
            k_cur = _rotate(k_cur, axis_name, W)
            v_cur = _rotate(v_cur, axis_name, W)
    return acc_out.astype(q.dtype), acc_lse


@functools.lru_cache(maxsize=None)
def _make_ring_sparse_op(mask_key, mask_shape, causal, W, layout,
                         s_local_q, s_local_kv, h, h_kv, bq, bkv,
                         scale, interpret, axis_name, n_hs=1):
    g = h // h_kv
    steps = _ring_step_tables(mask_key, mask_shape, causal, W, layout,
                              s_local_q, s_local_kv, bq, bkv, g, n_hs)
    per_head = len(mask_shape) == 3
    kw = dict(axis_name=axis_name, W=W, scale=scale, bq=bq, bkv=bkv,
              interpret=interpret, per_head=per_head, n_ranks=n_hs * W)

    @jax.custom_vjp
    def op(q, k, v, rank):
        return _ring_sparse_fwd(q, k, v, rank, steps, **kw)

    def op_fwd(q, k, v, rank):
        out, lse = _ring_sparse_fwd(q, k, v, rank, steps, **kw)
        return (out, lse), (q, k, v, rank, out, lse)

    def op_bwd(res, cts):
        q, k, v, rank, out, lse = res
        dout, _ = cts  # no gradient path through the LSE output
        qb, outb = _bhsd(q), _bhsd(out)
        doutb = _bhsd(dout.astype(q.dtype))
        k_cur, v_cur = _bhsd(k), _bhsd(v)
        dq = jnp.zeros(qb.shape, jnp.float32)
        dk = jnp.zeros(k_cur.shape, jnp.float32)
        dv = jnp.zeros(v_cur.shape, jnp.float32)
        for t in range(W):
            row_tabs, col_tabs = steps[t]
            dq_p, dk_p, dv_p = _sparse_bwd_bhsd(
                qb, k_cur, v_cur, outb, lse, doutb, row_tabs, col_tabs,
                per_head, scale=scale, bq=bq, bkv=bkv, interpret=interpret,
                rank=rank, n_ranks=kw["n_ranks"])
            dq = dq + dq_p
            # dk/dv ride the ring every step (W total hops) so each partial
            # sum lands back on its KV's owner; the KV ring skips the final
            # hop (the dense ring's scheme, parallel/ring.py)
            dk = _rotate(dk + dk_p, axis_name, W)
            dv = _rotate(dv + dv_p, axis_name, W)
            if t < W - 1:
                k_cur = _rotate(k_cur, axis_name, W)
                v_cur = _rotate(v_cur, axis_name, W)
        return (_bhsd(dq).astype(q.dtype), _bhsd(dk).astype(k.dtype),
                _bhsd(dv).astype(v.dtype), None)

    op.defvjp(op_fwd, op_bwd)
    return op


def ring_sparse_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_mask,
    *,
    axis_name: str,
    ring_size: Optional[int] = None,
    layout: str = "zigzag",
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: Optional[bool] = None,
    return_lse: bool = False,
    head_shard=None,
):
    """Ring attention over a static *global* block mask, inside ``shard_map``.

    q (b, s/W, h, d); k, v (b, s/W, h_kv, d) in layout order (basic/zigzag).
    ``block_mask`` is the (S/block_q, S/block_kv) tile mask of the GLOBAL
    sequence (True = attend) — the same mask a single device would pass to
    ``block_sparse_attention``, so results match the single-device kernel at
    the oracle tolerance. ``causal=True`` intersects it with the causal
    triangle against global positions. Differentiable (sparse backward).
    PER-HEAD masks ((h, n_q, n_kv), r5) enumerate each head's live tiles in
    the rank-and-step-indexed tables — the SMEM budget scales with the
    TOTAL live-tile count across heads (`_check_smem` guards), so sparse
    per-head patterns (the SPARSE_SAGE tuned-per-head role) fit where a
    dense per-head mask would not. Under USP, ``head_shard=(uly_index,
    n_uly)`` makes the tables COMBINED (ulysses x ring)-rank-indexed: the
    3-D mask covers the GLOBAL heads and each ulysses shard's tables
    enumerate only its contiguous head block.
    """
    if hasattr(block_mask, "aval"):
        raise TypeError("block_mask must be a static host array")
    W = ring_size if ring_size is not None else lax.axis_size(axis_name)
    b, s_q, h, d = q.shape
    s_kv, h_kv = k.shape[1], k.shape[2]
    mask = np.ascontiguousarray(np.asarray(block_mask, dtype=np.bool_))
    if mask.ndim not in (2, 3):
        raise ValueError(
            "block_mask must be (n_q, n_kv) or per-head (h, n_q, n_kv)")
    n_hs = 1
    if mask.ndim == 3 and head_shard is not None:
        n_hs = int(head_shard[1])
    blk_q = min(block_q, s_q)
    blk_kv = min(block_kv, s_kv)
    S_q, S_kv = s_q * W, s_kv * W
    want = (S_q // blk_q, S_kv // blk_kv)
    if mask.ndim == 3:
        want = (h * n_hs,) + want  # global heads (local heads x uly shards)
    if mask.shape != want:
        raise ValueError(
            f"global block_mask shape {mask.shape} != {want} for global "
            f"seq {S_q} at block ({blk_q}, {blk_kv})")
    scale = (softmax_scale if softmax_scale is not None
             else 1.0 / float(np.sqrt(d)))
    interpret = default_interpret() if interpret is None else bool(interpret)
    op = _make_ring_sparse_op(
        mask.tobytes(), mask.shape, bool(causal), W, layout, s_q, s_kv,
        h, h_kv, blk_q, blk_kv, float(scale), interpret, axis_name, n_hs)
    rank = lax.axis_index(axis_name)
    if n_hs > 1:
        rank = head_shard[0] * W + rank  # combined (ulysses, ring) index
    out, lse = op(q, k, v, rank)
    return (out, lse) if return_lse else out
