"""Checkpoint / resume — params, optimizer state, and KV caches.

The reference has no in-library checkpointing (SURVEY.md §5: training
checkpoints belong to DeepSpeed/Megatron; the only persisted artifact is the
SparseSage autotune state dict). Here the host framework ships in-repo, so a
thin orbax-checkpoint wrapper covers train state and serving caches — both
are plain pytrees (models/llama.py params, ops/kv_cache.KVCache).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, state: Any, *, step: Optional[int] = None,
                    force: bool = True) -> str:
    """Save a pytree (e.g. {'params': ..., 'opt_state': ..., 'cache': ...}).

    ``step`` appends a step subdirectory (``<path>/<step>``)."""
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, str(step))
    ck = _ckptr()
    ck.save(path, state, force=force)
    ck.wait_until_finished()  # StandardCheckpointer saves asynchronously
    return path


def restore_checkpoint(path: str, template: Any, *, step: Optional[int] = None
                       ) -> Any:
    """Restore into the structure/shardings of ``template`` (an abstract or
    concrete pytree of the same shape)."""
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, str(step))
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x,
        template,
    )
    return _ckptr().restore(path, target)


def latest_step(path: str) -> Optional[int]:
    """Largest integer-named subdirectory of ``path`` (or None)."""
    if not os.path.isdir(path):
        return None
    steps = [int(d) for d in os.listdir(path) if d.isdigit()]
    return max(steps) if steps else None
