"""Sequence-sharded decode: ring-distributed KV cache, merged partials.

The multi-chip serving core (north star: 1M-token contexts don't fit one
chip's HBM): the cache is sharded over the ring mesh axis in contiguous slot
blocks — rank r owns global slots [r*slots, (r+1)*slots) — queries are
replicated, every rank runs ops/decode.py over its filled local slots, and
the partial (out, lse) pairs merge with the same online-LSE math as training
(ops/merge.py). One tiny all_gather per step; the cache itself never moves.

Functions run inside ``shard_map``; a sharded append routes each new token's
KV to its owner rank inside the aliased in-place splice kernel
(`ops/decode.py:cache_append`; SPMD: all ranks execute, the non-owners pass
``append_pos=-1`` and write nothing).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

from long_context_attention_tpu.ops.decode import cache_append, decode_attention

__all__ = ["sharded_decode_attention", "sharded_cache_append"]

AxisNames = Union[str, Sequence[str]]
# axis_name may be a single mesh axis or a tuple (e.g. ('ring', 'ulysses')):
# lax.axis_index/size linearize tuples row-major, matching a PartitionSpec
# that shards the slot axis over the same tuple.


def sharded_decode_attention(
    q: jnp.ndarray,           # (b, h, d) replicated queries — or
                              # (b, n_tok, h, d) for a multi-token run
    k_shard: jnp.ndarray,     # (b, h_kv, slots, d) this rank's cache block
    v_shard: jnp.ndarray,     # (stacked (L, b, h_kv, slots, d) with `layer`)
    global_lengths: jnp.ndarray,  # (b,) int32 total filled length
    k_scale: Optional[jnp.ndarray] = None,  # (b, h_kv, slots)
    v_scale: Optional[jnp.ndarray] = None,
    *,
    axis_name: str,
    softmax_scale: Optional[float] = None,
    block_kv: int = 4096,
    interpret: Optional[bool] = None,
    layer: Optional[jnp.ndarray] = None,
    softcap: float = 0.0,
    window_left: int = -1,
    sink_tokens: int = 0,
    safe_softmax: bool = False,
    page_table: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Decode attention over a ring-sharded cache. Returns (b, h, d) bf16
    ((b, n_tok, h, d) for multi-token runs — the speculative verify).

    ``page_table`` ((b, n_pages) int32, replicated; entries are GLOBAL
    physical page ids) switches on the PAGED sharded cache: k/v are each
    rank's partition of the page pool ((P/n, h_kv, page, d), stacked
    (L, ...) with ``layer``), and the blocked layout assigns logical page
    j of a row to rank ``j // (n_pages/n)`` — exactly the dense sharded
    slot split, so lengths/windows/sinks use the same per-rank slicing.
    Each rank slices its own (b, n_pages/n) window of the table and
    rebases the ids into its partition (unallocated -1 entries rebase
    negative and clamp to the rank's LOCAL scratch page 0 — allocators
    reserve local page 0 of every partition).

    Rank r's filled prefix is ``clip(L - r*slots, 0, slots)``; empty shards
    contribute lse=-inf partials that merge to a no-op. ``softcap`` is
    position-free; for ``window_left`` each rank receives its slice of the
    GLOBAL window as explicit per-row first columns (UNCLIPPED, token-0
    bound; the kernel adds the token index for multi-token runs, so the
    speculative verify composes with sliding windows) — a rank wholly left
    of the window goes dead and merges away. ``sink_tokens`` (StreamingLLM):
    each rank keeps its slice of the global sink prefix visible via
    ``sink_cols`` — rank r's slice is ``clip(sink - r*slots, 0, slots)``.

    Multi-token runs pass UNCLIPPED local lengths (L - r*slots): the
    kernel's per-row causal limit ``length - n + it`` then lands at the
    right LOCAL column on the boundary rank, stays past every column on
    interior ranks, and goes dead on ranks beyond the data (the kernel
    clamps its own DMA indices).
    """
    multi = q.ndim == 4
    n_tok = q.shape[1] if multi else 1
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    r = lax.axis_index(axes)
    n = 1
    for a in axes:
        n *= lax.axis_size(a)
    local_pt = None
    if page_table is not None:
        local_pt, slots = _local_pages(page_table, k_shard, layer, r, n)
    else:
        slots = k_shard.shape[3 if layer is not None else 2]
    first_cols = sink_cols = None
    if multi:
        local_len = global_lengths - r * slots  # unclipped, see docstring
    else:
        local_len = jnp.clip(global_lengths - r * slots, 0, slots)
    if window_left >= 0:
        # token 0 sits at global position L - n_tok; its first visible
        # column is L - n_tok - window_left (unclipped — the kernel
        # handles negatives and adds the per-token shift)
        first_cols = global_lengths - n_tok - window_left - r * slots
        if sink_tokens > 0:
            sink_cols = jnp.clip(
                jnp.full_like(global_lengths, sink_tokens) - r * slots,
                0, slots)
    out, lse = decode_attention(
        q, k_shard, v_shard, local_len, k_scale, v_scale,
        softmax_scale=softmax_scale, block_kv=block_kv, interpret=interpret,
        return_lse=True, layer=layer, softcap=softcap,
        # window_size + sink_band are STATIC band hints: each rank's kernel
        # grid covers only its slice of the window band + sink tiles
        # (ADVICE r4 — previously the fc path iterated every cache tile)
        window_size=(window_left, -1), sink_band=sink_tokens,
        first_cols=first_cols, sink_cols=sink_cols,
        safe_softmax=safe_softmax, page_table=local_pt,
    )  # (b, h, d), (b, h) — multi: (b, n_tok, h, d), (b, h, n_tok)

    outs = lax.all_gather(out.astype(jnp.float32), axes)
    lses = lax.all_gather(lse, axes)
    outs = outs.reshape((n,) + out.shape)   # (n, b, [n_tok,] h, d)
    lses = lses.reshape((n,) + lse.shape)
    if multi:
        # (n, b, h, n_tok) -> (n, b, n_tok, h) to ride along outs
        lses = jnp.moveaxis(lses, 3, 2)

    # numerically-stable n-way merge (same math as ops/merge.py, shaped for
    # the (n, b, [n_tok,] h) decode partials)
    m = jnp.max(lses, axis=0)
    dead = jnp.isneginf(m)
    safe_m = jnp.where(dead, 0.0, m)
    w = jnp.where(jnp.isneginf(lses), 0.0, jnp.exp(lses - safe_m[None]))
    denom = jnp.sum(w, axis=0)
    merged = jnp.sum(outs * w[..., None], axis=0) / jnp.maximum(
        denom, 1e-37)[..., None]
    merged = jnp.where(dead[..., None], 0.0, merged)
    return merged.astype(jnp.bfloat16)


def _local_pages(page_table, pool_shard, layer, r, n):
    """(this rank's rebased (b, ppr) page table, its slot capacity).

    Blocked layout: logical page j of a row lives on rank j // ppr with
    ppr = n_pages // n; physical ids are global, rank r's partition being
    [r * P_local, (r+1) * P_local). Unallocated entries (-1) rebase to
    negatives that the kernels clamp to the rank's local scratch page 0."""
    layered = layer is not None
    n_pages = page_table.shape[1]
    page = pool_shard.shape[3 if layered else 2]
    p_local = pool_shard.shape[1 if layered else 0]
    assert n_pages % n == 0, (n_pages, n)
    ppr = n_pages // n
    lt = lax.dynamic_slice_in_dim(page_table, r * ppr, ppr, axis=1)
    return lt - r * p_local, ppr * page


def sharded_cache_append(
    k_shard: jnp.ndarray,     # (b, h_kv, slots, d) this rank's block — or
    v_shard: jnp.ndarray,     # stacked (L, b, h_kv, slots, d) with `layer`
    k_new: jnp.ndarray,       # (b, h_kv, n, d) new token run (cache dtype)
    v_new: jnp.ndarray,
    global_pos: jnp.ndarray,  # (b,) int32 global slot of the run's FIRST
                              # token (<= -n skips the row)
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    ks_new: Optional[jnp.ndarray] = None,   # (b, h_kv, n) fp32
    vs_new: Optional[jnp.ndarray] = None,
    *,
    axis_name: str,
    layer: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
    page_table: Optional[jnp.ndarray] = None,
):
    """Write each row's new token run into its owner ranks' shards, IN
    PLACE.

    SPMD: every rank runs the splice kernel with its LOCAL base offset
    (possibly negative); the kernel's range-based liveness writes exactly
    the tokens whose slot falls inside this rank's block, so a multi-token
    run (speculative verify) straddling a shard boundary splits itself
    between the two owners. The in-place aliasing matters: a scatter/DUS
    append on a scan-carried cache makes XLA double-buffer the whole cache
    (see ops/decode.py:cache_append). ``page_table``: PAGED sharded mode
    (see `sharded_decode_attention`) — the same local rebase, then the
    paged append kernel routes slots through the rank's partition."""
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    r = lax.axis_index(axes)
    n = 1
    for a in axes:
        n *= lax.axis_size(a)
    local_pt = None
    if page_table is not None:
        local_pt, slots = _local_pages(page_table, k_shard, layer, r, n)
    else:
        slots = k_shard.shape[3 if layer is not None else 2]
    n_tok = k_new.shape[2]
    # inactive rows (global_pos <= -n) must stay fully out of range on
    # EVERY rank, including rank 0 where the raw offset would be unchanged
    append_pos = jnp.where(global_pos <= -n_tok, -n_tok,
                           global_pos - r * slots).astype(jnp.int32)
    return cache_append(
        k_shard, v_shard, k_new, v_new, append_pos, k_scale, v_scale,
        ks_new, vs_new, layer=layer, interpret=interpret,
        page_table=local_pt)
