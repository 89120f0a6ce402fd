"""Sequence-sharded decode: ring-distributed KV cache, merged partials.

The multi-chip serving core (north star: 1M-token contexts don't fit one
chip's HBM): the cache is sharded over the ring mesh axis in contiguous slot
blocks — rank r owns global slots [r*slots, (r+1)*slots) — queries are
replicated, every rank runs ops/decode.py over its filled local slots, and
the partial (out, lse) pairs merge with the same online-LSE math as training
(ops/merge.py). One tiny all_gather per step; the cache itself never moves.

Functions run inside ``shard_map``; a sharded append routes each new token's
KV to its owner rank with a masked dynamic-update (SPMD: all ranks execute,
one writes).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

from long_context_attention_tpu.ops.decode import decode_attention

__all__ = ["sharded_decode_attention", "sharded_append", "sharded_append_scale"]

AxisNames = Union[str, Sequence[str]]
# axis_name may be a single mesh axis or a tuple (e.g. ('ring', 'ulysses')):
# lax.axis_index/size linearize tuples row-major, matching a PartitionSpec
# that shards the slot axis over the same tuple.


def sharded_decode_attention(
    q: jnp.ndarray,           # (b, h, d) replicated queries
    k_shard: jnp.ndarray,     # (b, h_kv, slots, d) this rank's cache block
    v_shard: jnp.ndarray,     # (stacked (L, b, h_kv, slots, d) with `layer`)
    global_lengths: jnp.ndarray,  # (b,) int32 total filled length
    k_scale: Optional[jnp.ndarray] = None,  # (b, h_kv, slots)
    v_scale: Optional[jnp.ndarray] = None,
    *,
    axis_name: str,
    softmax_scale: Optional[float] = None,
    block_kv: int = 1024,
    interpret: Optional[bool] = None,
    layer: Optional[jnp.ndarray] = None,
    append_kv=None,          # (k_new, v_new) (b, h_kv, 1, d) cache dtype
    append_scales=None,      # (ks_new, vs_new) (b, h_kv, 1) fp32
    global_pos: Optional[jnp.ndarray] = None,  # (b,) global slot of new tok
):
    """Decode attention over a ring-sharded cache. Returns (b, h, d) bf16.

    Rank r's filled prefix is ``clip(L - r*slots, 0, slots)``; empty shards
    contribute lse=-inf partials that merge to a no-op.

    With ``append_kv``/``global_pos``, the new token's KV is spliced into
    the owner rank's shard inside the kernel (in-place via aliasing; rows
    route with ``append_pos=-1`` on non-owners, which also skip the
    self-attention term so the token is counted exactly once across ranks).
    ``global_lengths`` is then the PREFIX length. Returns
    ``(out, (k_shard', v_shard'[, scales']))``.
    """
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    r = lax.axis_index(axes)
    n = 1
    for a in axes:
        n *= lax.axis_size(a)
    slots = k_shard.shape[3 if layer is not None else 2]
    local_len = jnp.clip(global_lengths - r * slots, 0, slots)
    caches = None
    if append_kv is not None:
        local_pos, owner = _owner_slots(global_pos, slots, axes)
        append_pos = jnp.where(owner, local_pos, -1).astype(jnp.int32)
        out, lse, caches = decode_attention(
            q, k_shard, v_shard, local_len, k_scale, v_scale,
            softmax_scale=softmax_scale, block_kv=block_kv,
            interpret=interpret, return_lse=True, layer=layer,
            append_kv=append_kv, append_scales=append_scales,
            append_pos=append_pos,
        )
    else:
        out, lse = decode_attention(
            q, k_shard, v_shard, local_len, k_scale, v_scale,
            softmax_scale=softmax_scale, block_kv=block_kv,
            interpret=interpret, return_lse=True, layer=layer,
        )  # (b, h, d), (b, h)

    outs = lax.all_gather(out.astype(jnp.float32), axes)  # (n, b, h, d)
    lses = lax.all_gather(lse, axes)                      # (n, b, h)
    outs = outs.reshape((n,) + out.shape)
    lses = lses.reshape((n,) + lse.shape)

    # numerically-stable n-way merge (same math as ops/merge.py, shaped for
    # the (n, b, h) decode partials)
    m = jnp.max(lses, axis=0)                 # (b, h)
    dead = jnp.isneginf(m)
    safe_m = jnp.where(dead, 0.0, m)
    w = jnp.where(jnp.isneginf(lses), 0.0, jnp.exp(lses - safe_m[None]))
    denom = jnp.sum(w, axis=0)                # (b, h)
    merged = jnp.sum(outs * w[..., None], axis=0) / jnp.maximum(
        denom, 1e-37)[..., None]
    merged = jnp.where(dead[..., None], 0.0, merged)
    merged = merged.astype(jnp.bfloat16)
    return merged if caches is None else (merged, caches)


def _owner_slots(global_pos, slots, axes):
    r = lax.axis_index(axes)
    local_pos = global_pos - r * slots
    owner = (local_pos >= 0) & (local_pos < slots)
    return jnp.clip(local_pos, 0, slots - 1), owner


def sharded_append(
    buf: jnp.ndarray,         # (b, h_kv, slots, d) this rank's block — or
                              # stacked (L, b, h_kv, slots, d) with `layer`
    val: jnp.ndarray,         # (b, h_kv, 1, d) new token value (quantized)
    global_pos: jnp.ndarray,  # (b,) int32 global slot of the new token
    *,
    axis_name: str,
    layer: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Write each row's new token into its owner rank's block. SPMD: every
    rank executes; a non-owner writes back the slot's existing value. One
    batched gather + scatter (b rows at once) — never a whole-cache select,
    and no Python loop over batch (VERDICT r1 #4: b appends per layer per
    step was hostile to large serving batches)."""
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    layered = layer is not None
    slots = buf.shape[3 if layered else 2]
    idx, owner = _owner_slots(global_pos, slots, axes)
    b = val.shape[0]
    rows = jnp.arange(b)
    if layered:
        cur = buf[layer, rows, :, idx]                      # (b, h, d)
        new = jnp.where(owner[:, None, None], val[:, :, 0].astype(buf.dtype), cur)
        return buf.at[layer, rows, :, idx].set(new)
    cur = buf[rows, :, idx]
    new = jnp.where(owner[:, None, None], val[:, :, 0].astype(buf.dtype), cur)
    return buf.at[rows, :, idx].set(new)


def sharded_append_scale(
    buf: jnp.ndarray,         # (b, h_kv, slots) — or (L, b, h_kv, slots)
    val: jnp.ndarray,         # (b, h_kv, 1)
    global_pos: jnp.ndarray,
    *,
    axis_name: str,
    layer: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    layered = layer is not None
    slots = buf.shape[3 if layered else 2]
    idx, owner = _owner_slots(global_pos, slots, axes)
    b = val.shape[0]
    rows = jnp.arange(b)
    if layered:
        cur = buf[layer, rows, :, idx]                      # (b, h)
        new = jnp.where(owner[:, None], val[:, :, 0].astype(buf.dtype), cur)
        return buf.at[layer, rows, :, idx].set(new)
    cur = buf[rows, :, idx]
    new = jnp.where(owner[:, None], val[:, :, 0].astype(buf.dtype), cur)
    return buf.at[rows, :, idx].set(new)
