"""Pipeline parallelism: GPipe-style microbatched stage execution.

The reference *delegates* PP to Megatron (`start_gpt.sh PP=4`; SURVEY.md "PP:
not implemented"). Here PP is native and composes with every other axis —
dp x pp x ring x ulysses x tp — because a pipeline stage is just another mesh
axis: the model's stacked layer weights (n_layers, ...) shard their leading
axis over ``pp`` so each rank owns a contiguous stage of layers, activations
hop stages with a single non-circular ``ppermute`` per tick, and microbatches
stream through the classic (n_micro + n_stages - 1)-tick schedule. Gradients
come from plain jax AD through the tick ``lax.scan`` (GPipe: exact gradients,
full activation stash).

SPMD notes: every rank executes every tick (including the USP collectives
inside the stage body), so collectives stay globally consistent; stage-0
injection and last-stage collection are ``where``-masked. The final psum that
broadcasts the last stage's result uses the transpose-safe value reduction
from parallel/tp.py (psum's transpose under shard_map is psum — see the
gradient-scaling note there).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from long_context_attention_tpu.parallel.tp import psum_for_value

__all__ = ["pipeline_apply"]


def pipeline_apply(
    stage_fn: Callable,       # (x_mb, stage_layers) -> y_mb, this rank's stage
    inject_fn: Callable,      # (t,) -> x_mb: stage-0 input for microbatch t
    collect_fn: Callable,     # (t, y_mb) -> out_t: last-stage per-microbatch
    stage_layers,             # this rank's slice of the stacked layer pytree
    n_micro: int,
    out_zero,                 # zero pytree shaped like collect_fn's output
    *,
    pp_axis: str,
):
    """Run the GPipe schedule; returns the stacked last-stage outputs
    (n_micro, ...) broadcast to every pp rank.

    ``inject_fn(t)`` is evaluated with a traced, clamped microbatch index;
    ``collect_fn`` typically computes logits or a per-microbatch loss.
    """
    p = lax.axis_index(pp_axis)
    n_stages = lax.axis_size(pp_axis)
    n_ticks = n_micro + n_stages - 1
    fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]  # non-circular

    def tick(buf, t):
        # stage 0 consumes microbatch t (clamped; masked-out when t >= n_micro)
        t_in = jnp.clip(t, 0, n_micro - 1)
        x0 = inject_fn(t_in)
        x_in = jax.tree.map(
            lambda a, b: jnp.where(p == 0, a, b), x0, buf)
        y = stage_fn(x_in, stage_layers)
        # last stage finished microbatch t - (n_stages - 1)
        t_out = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
        out = collect_fn(t_out, y)
        live = (p == n_stages - 1) & (t >= n_stages - 1)
        out = jax.tree.map(
            lambda o, z: jnp.where(live, o, z), out, out_zero)
        buf_next = jax.tree.map(
            lambda a: lax.ppermute(a, pp_axis, fwd_perm), y)
        return buf_next, out

    buf0 = jax.tree.map(lambda t: jnp.zeros_like(t), inject_fn(jnp.int32(0)))
    _, outs = lax.scan(tick, buf0, jnp.arange(n_ticks))
    # keep the last n_micro ticks (the ones the last stage emitted), then
    # broadcast from the last stage to all pp ranks (transpose-safe psum:
    # every other rank contributed zeros)
    outs = jax.tree.map(lambda o: o[n_stages - 1:], outs)
    return jax.tree.map(lambda o: psum_for_value(o, pp_axis), outs)
