"""Ulysses dimension: heads<->sequence resharding via ``lax.all_to_all``.

TPU-native replacement for the reference's `SeqAllToAll4D` / `SeqAllToAll5D`
autograd wrappers (`yunchang/comm/all_to_all.py:15-259`): one XLA collective
per call, no manual reshape/transpose marshalling (XLA lays the tiles out),
and differentiable for free — the transpose of ``all_to_all`` is the inverse
``all_to_all``, which is exactly what ``SeqAllToAll4D.backward`` hand-codes
(`comm/all_to_all.py:125-134`).

These run *inside* ``shard_map`` over a mesh built by parallel/mesh.py; every
function takes device-local arrays in the (b, s_local, h, d) contract.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["scatter_heads", "gather_heads", "ulysses_attention_local"]


def scatter_heads(x: jnp.ndarray, axis_name: str, *, head_axis: int = 2,
                  seq_axis: int = 1) -> jnp.ndarray:
    """(b, s/U, h, d) -> (b, s, h/U, d): split heads over the ulysses axis,
    gather the full (ulysses-local) sequence — `all_to_all_4D` fwd direction
    (`comm/all_to_all.py:15-65`)."""
    if lax.axis_size(axis_name) == 1:
        return x
    return lax.all_to_all(x, axis_name, split_axis=head_axis,
                          concat_axis=seq_axis, tiled=True)


def gather_heads(x: jnp.ndarray, axis_name: str, *, head_axis: int = 2,
                 seq_axis: int = 1) -> jnp.ndarray:
    """(b, s, h/U, d) -> (b, s/U, h, d): the inverse resharding
    (`comm/all_to_all.py:68-103`)."""
    if lax.axis_size(axis_name) == 1:
        return x
    return lax.all_to_all(x, axis_name, split_axis=seq_axis,
                          concat_axis=head_axis, tiled=True)


def ulysses_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_fn,
    *,
    axis_name: str,
) -> jnp.ndarray:
    """SP-Ulysses attention on device-local shards — `UlyssesAttention.forward`
    (`yunchang/ulysses/attn_layer.py:50-126`): a2a(scatter heads) on q/k/v,
    full-sequence local attention, a2a(gather heads) on the output.

    ``attn_fn(q, k, v) -> out`` runs with the full sequence and h/U heads and
    must be differentiable (the "fwd-bwd" stage impl of the reference's
    registry, `kernels/__init__.py:139-141`).
    """
    q = scatter_heads(q, axis_name)
    k = scatter_heads(k, axis_name)
    v = scatter_heads(v, axis_name)
    out = attn_fn(q, k, v)
    return gather_heads(out, axis_name)
