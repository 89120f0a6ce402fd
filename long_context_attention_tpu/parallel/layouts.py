"""Sequence layouts for ring schedules (basic / zigzag / stripe).

TPU-native re-design of the reference's extract functions
(`yunchang/comm/extract_local.py:7-60`, `EXTRACT_FUNC_DICT`): where the
reference carves a rank-local shard out of a global tensor with rank-indexed
slicing, here a layout is a *permutation of the global sequence* such that
plain contiguous sharding over the ring mesh axis hands every device its
schedule-local shard. That keeps the SPMD program layout-agnostic: the only
thing that changes between schedules is

* the host-side permutation applied once to inputs / inverted once on outputs
  (`permute_for_layout` / `unpermute_from_layout`), and
* the *global position descriptor* of each ring rank's tokens
  (`position_descriptor`), which feeds the position-aware Pallas kernel's
  masking (ops/flash.py) — replacing the reference's per-schedule shape tricks
  (`ring/zigzag_ring_flash_attn.py:51-67`, `ring/stripe_flash_attn.py:96-107`).

Layouts (W = ring size, S = global seq, c = S / W tokens per rank):

* ``basic``  — rank r owns the contiguous chunk ``[r*c, (r+1)*c)``
  (`comm/extract_local.py:52`). Positions: one chunk, offset ``r*c``, stride 1.
* ``zigzag`` — 2W half-chunks of size ``c/2``; rank r owns halves ``r`` and
  ``2W-1-r`` (`comm/extract_local.py:29-49`), balancing causal work.
  Positions: two chunks, offsets ``(r*c/2, (2W-1-r)*c/2)``, stride 1.
* ``stripe`` — tokens interleaved round-robin: rank r owns global tokens
  ``r, r+W, r+2W, …`` (`comm/extract_local.py:7-22`). Positions: one chunk,
  offset ``r``, stride ``W``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "LAYOUTS",
    "layout_permutation",
    "permute_for_layout",
    "unpermute_from_layout",
    "extract_local",
    "position_descriptor",
    "bidir_position_descriptor",
    "positions_from_descriptor",
    "segment_ids_from_cu_seqlens",
]

LAYOUTS = ("basic", "zigzag", "stripe")


def _check(layout: str, ring_size: int, seq: int) -> None:
    if layout not in LAYOUTS:
        raise ValueError(f"unknown layout {layout!r}; expected one of {LAYOUTS}")
    if seq % ring_size:
        raise ValueError(f"seq {seq} not divisible by ring size {ring_size}")
    if layout == "zigzag" and seq % (2 * ring_size):
        raise ValueError(f"zigzag needs seq {seq} divisible by 2*ring ({2 * ring_size})")


def layout_permutation(layout: str, ring_size: int, seq: int) -> np.ndarray:
    """int32 permutation p with ``permuted[i] = global[p[i]]``.

    Contiguous chunk r (of size seq//ring_size) of the permuted sequence is
    ring rank r's schedule-local shard.
    """
    _check(layout, ring_size, seq)
    if layout == "basic":
        return np.arange(seq, dtype=np.int32)
    if layout == "zigzag":
        half = seq // (2 * ring_size)
        parts = []
        for r in range(ring_size):
            parts.append(np.arange(r * half, (r + 1) * half, dtype=np.int32))
            parts.append(np.arange((2 * ring_size - 1 - r) * half,
                                   (2 * ring_size - r) * half, dtype=np.int32))
        return np.concatenate(parts)
    # stripe
    return np.concatenate(
        [np.arange(r, seq, ring_size, dtype=np.int32) for r in range(ring_size)]
    )


def permute_for_layout(x: jnp.ndarray, layout: str, ring_size: int, axis: int = 1):
    """Reorder the global sequence so contiguous ring sharding yields the layout."""
    if layout == "basic":
        return x
    perm = layout_permutation(layout, ring_size, x.shape[axis])
    return jnp.take(x, jnp.asarray(perm), axis=axis)


def unpermute_from_layout(x: jnp.ndarray, layout: str, ring_size: int, axis: int = 1):
    """Inverse of :func:`permute_for_layout`."""
    if layout == "basic":
        return x
    perm = layout_permutation(layout, ring_size, x.shape[axis])
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return jnp.take(x, jnp.asarray(inv), axis=axis)


def extract_local(x: jnp.ndarray, rank: int, ring_size: int, layout: str = "basic",
                  axis: int = 1) -> jnp.ndarray:
    """Rank ``rank``'s schedule-local shard of a global tensor (test/API parity
    with `comm/extract_local.py` — the SPMD path never calls this)."""
    seq = x.shape[axis]
    _check(layout, ring_size, seq)
    local = seq // ring_size
    perm = layout_permutation(layout, ring_size, seq)[rank * local:(rank + 1) * local]
    return jnp.take(x, jnp.asarray(perm), axis=axis)


def position_descriptor(
    layout: str, rank, ring_size: int, local_len: int
) -> Tuple[jnp.ndarray, int]:
    """Global positions of ring rank ``rank``'s tokens, in kernel form.

    Returns ``(offsets, stride)`` where token at local index l has global
    position ``offsets[l // chunk] + (l % chunk) * stride`` with
    ``chunk = local_len // len(offsets)`` — exactly the contract of
    ops/flash.py's ``q_offsets``/``kv_offsets``. ``rank`` may be traced (a ring
    ``lax.axis_index``); ``len(offsets)`` and ``stride`` are static.
    """
    if layout not in LAYOUTS:
        raise ValueError(f"unknown layout {layout!r}; expected one of {LAYOUTS}")
    rank = jnp.asarray(rank, jnp.int32)
    if layout == "basic":
        return (rank[None] * local_len, 1)
    if layout == "zigzag":
        half = local_len // 2
        return (jnp.stack([rank * half, (2 * ring_size - 1 - rank) * half]), 1)
    # stripe
    return (rank[None], ring_size)


def bidir_position_descriptor(
    layout: str, src_a, src_b, ring_size: int, local_len: int
) -> Tuple[jnp.ndarray, int]:
    """Positions when the local KV is split in two halves traveling opposite
    ring directions (TokenRing-style bidirectional rotation, using both ICI
    directions): half A (local indices [0, local_len/2)) currently originates
    from ring rank ``src_a``, half B from ``src_b``. Returns 2-chunk
    ``(offsets, stride)`` in the kernel contract."""
    if layout not in LAYOUTS:
        raise ValueError(f"unknown layout {layout!r}")
    src_a = jnp.asarray(src_a, jnp.int32)
    src_b = jnp.asarray(src_b, jnp.int32)
    half = local_len // 2
    if layout == "basic":
        return (jnp.stack([src_a * local_len, src_b * local_len + half]), 1)
    if layout == "zigzag":
        return (jnp.stack([src_a * half, (2 * ring_size - 1 - src_b) * half]), 1)
    # stripe
    return (jnp.stack([src_a, src_b + half * ring_size]), ring_size)


def positions_from_descriptor(offsets: jnp.ndarray, stride: int,
                              local_len: int) -> jnp.ndarray:
    """Expand a compact (offsets, stride) descriptor into per-token global
    positions (s,) int32 — the form the pure-XLA oracle consumes."""
    n_chunks = offsets.shape[0]
    chunk = local_len // n_chunks
    within = (jnp.arange(local_len, dtype=jnp.int32) % chunk) * stride
    return jnp.repeat(offsets.astype(jnp.int32), chunk) + within


def segment_ids_from_cu_seqlens(cu_seqlens, seq_len: int) -> jnp.ndarray:
    """Translate the reference's varlen interface to segment ids.

    The reference's varlen rings take flash-attn ``cu_seqlens`` — cumulative
    sequence boundaries over a packed (batch-of-one) token stream
    (`ring/ring_flash_attn_varlen.py:28`). The TPU-idiomatic form here is a
    per-token int32 segment id (attention only within equal ids), which —
    unlike boundary offsets — shards and ring-rotates like any other token
    array. Sequence i (``cu_seqlens[i] <= t < cu_seqlens[i+1]``) gets id
    i + 1; tokens at/after ``cu_seqlens[-1]`` are padding and share id 0
    (padding rows attend only padding; their outputs are ignored).

    Returns (1, seq_len) int32, ready for ``flash_attention(q_segment_ids=...)``
    or ``LongContextAttention(segment_ids=...)`` after layout permutation.
    """
    cu = jnp.asarray(cu_seqlens, jnp.int32)
    t = jnp.arange(seq_len, dtype=jnp.int32)
    ids = jnp.searchsorted(cu, t, side="right").astype(jnp.int32)
    ids = jnp.where((t >= cu[-1]) | (ids == 0), 0, ids)
    return ids[None]
