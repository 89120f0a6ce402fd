"""ZeRO-style optimizer-state + gradient sharding over the dp axis.

The reference delegates ZeRO entirely to DeepSpeed (its Megatron launcher sets
``ZERO_STAGE=3``, `patches/Megatron-DeepSpeed.patch` start_gpt.sh; README "best
practice with DeepSpeed ZeRO", `README.md:210`) — there is no in-library
implementation to mirror, only the role. The TPU-native build owns it:

* **Gradient sharding (ZeRO-2).** Inside the train step's ``shard_map``,
  data-parallel gradient reduction is ``lax.psum_scatter`` over dp instead of
  ``lax.psum``: each dp rank receives only its fully-reduced 1/dp slice of
  every gradient leaf. Same total bytes on the wire as the reduce half of an
  all-reduce — the all-gather half moves to the (smaller, post-update) params.
* **Optimizer-state sharding (ZeRO-1).** The optimizer runs *outside*
  shard_map on the logically-full-but-physically-dp-sharded gradients; every
  Adam-moment leaf is constrained to the same dp sharding, so state memory per
  device drops by 1/dp. GSPMD keeps the update computation shard-local.
* **Param all-gather.** Applying the dp-sharded update to the replicated
  params is one all-gather per leaf, inserted by XLA at the ``p + u`` — the
  ZeRO-1/2 "broadcast updated params" step, compiled not hand-written.

Sharding choice per leaf: the largest dimension not already claimed by
tp/ep/pp whose size divides by dp (norm vectors and other tiny leaves stay
replicated — their state is negligible). Composes with tp (the Megatron-style
column/row shardings from models/llama.py param_specs): a leaf can be
tp-sharded on one dim and dp-sharded on another.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from long_context_attention_tpu.parallel.mesh import MeshAxes

__all__ = [
    "zero_param_specs",
    "init_zero_opt_state",
    "make_zero_train_step",
    "zero3_param_specs",
    "shard_params_zero3",
    "make_zero3_train_step",
]


def _zero_dim(shape, base_spec, dp: int) -> Optional[int]:
    """Largest dim with no axis assigned in ``base_spec`` and size % dp == 0."""
    entries = tuple(base_spec) + (None,) * (len(shape) - len(tuple(base_spec)))
    best = None
    for i, (n, e) in enumerate(zip(shape, entries)):
        if e is None and n % dp == 0 and n >= dp:
            if best is None or n > shape[best]:
                best = i
    return best


def zero_param_specs(params, base_specs, mesh: Mesh,
                     axes: MeshAxes = MeshAxes()):
    """Per-leaf PartitionSpecs with the dp axis added on the ZeRO shard dim.

    ``base_specs`` is the (possibly single-``P()``) spec tree from
    models/llama.py ``param_specs``; leaves keep their tp/ep/pp entries and
    gain ``axes.dp`` on the chosen dimension (or stay as-is when no dimension
    divides by dp).
    """
    dp = mesh.shape[axes.dp]
    if isinstance(base_specs, P):
        base_specs = jax.tree.map(lambda _: base_specs, params)

    def one(leaf, spec):
        dim = _zero_dim(leaf.shape, spec, dp)
        if dim is None:
            return spec
        entries = list(tuple(spec)) + [None] * (leaf.ndim - len(tuple(spec)))
        entries[dim] = axes.dp
        return P(*entries)

    return jax.tree.map(one, params, base_specs)


def _shape_table(params, zspecs):
    """shape -> spec lookup (the zero spec choice is shape-deterministic, so
    collisions are consistent). Used to constrain optimizer-state leaves,
    whose pytree embeds param-shaped moment arrays at unknown paths."""
    table = {}
    for leaf, spec in zip(jax.tree.leaves(params), jax.tree.leaves(
            zspecs, is_leaf=lambda x: isinstance(x, P))):
        table[leaf.shape] = spec
    return table


def _constrain_state(state, mesh, table):
    def one(x):
        spec = table.get(getattr(x, "shape", None), P())
        return lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree.map(one, state)


def init_zero_opt_state(optimizer, params, mesh: Mesh, zspecs):
    """``optimizer.init`` with every param-shaped state leaf placed dp-sharded
    (so the full replicated state never materializes)."""
    table = _shape_table(params, zspecs)
    shapes = jax.eval_shape(optimizer.init, params)
    out_sh = jax.tree.map(
        lambda s: NamedSharding(mesh, table.get(s.shape, P())), shapes)
    return jax.jit(optimizer.init, out_shardings=out_sh)(params)


def make_zero_train_step(cfg, mesh: Mesh, optimizer,
                         axes: MeshAxes = MeshAxes(), *,
                         interpret: Optional[bool] = None):
    """ZeRO-1/2 variant of models/llama.py ``make_train_step``.

    Same contract — ``(params, opt_state, tokens, labels, mask) ->
    (params, opt_state, loss)`` with ``opt_state`` from
    ``init_zero_opt_state`` — and the same trajectory as the plain step (the
    reduction happens in a different order, so bit-parity is fp32-tight, not
    bit-exact). Supports dp x ring x ulysses x tp meshes; MoE/pp stay on the
    plain step (their grad trees carry axis-specific reductions).
    """
    from long_context_attention_tpu.models.llama import (
        loss_local,
        param_specs,
    )

    assert not cfg.moe, "ZeRO step: MoE uses make_train_step (ep-sharded grads)"
    assert axes.pp not in mesh.axis_names, "ZeRO step: pp uses make_pp_train_step"
    tp = axes.tp in mesh.axis_names
    dp = mesh.shape[axes.dp]
    base = param_specs(axes, tp)
    # a params template for spec construction (shapes only; no allocation)
    shapes = jax.eval_shape(
        functools.partial(__import__("long_context_attention_tpu.models.llama",
                                     fromlist=["init_params"]).init_params,
                          cfg=cfg), jax.random.PRNGKey(0))
    if isinstance(base, P):
        base_tree = jax.tree.map(lambda _: base, shapes)
    else:
        base_tree = base
    zspecs = zero_param_specs(shapes, base_tree, mesh, axes)
    table = _shape_table(shapes, zspecs)
    pspecs = base if not isinstance(base, P) else P()
    tok_spec = P(axes.dp, axes.seq)
    sp_axes = (axes.ring, axes.ulysses)

    def local_grads(params, tokens, labels, mask):
        def lf(p):
            return loss_local(p, tokens, labels, mask, cfg,
                              ulysses_axis=axes.ulysses, ring_axis=axes.ring,
                              dp_axis=axes.dp, interpret=interpret,
                              tp_axis=axes.tp if tp else None)

        loss, grads = jax.value_and_grad(lf)(params)
        loss = lax.psum(loss, (axes.dp,) + sp_axes)
        # sequence-parallel replication sum first (all-reduce over ring x
        # ulysses), then the ZeRO reduce-scatter over dp: each rank keeps
        # only its fully-reduced 1/dp gradient slice
        grads = jax.tree.map(lambda g: lax.psum(g, sp_axes), grads)

        def scatter(g, spec, bspec):
            dim = _zero_dim(g.shape, bspec, dp)
            if dim is None:
                return lax.psum(g, axes.dp)
            return lax.psum_scatter(g, axes.dp, scatter_dimension=dim,
                                    tiled=True)

        grads = jax.tree.map(scatter, grads, zspecs, base_tree)
        return loss, grads

    mapped = jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(pspecs, tok_spec, tok_spec, tok_spec),
        out_specs=(P(), zspecs),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, tokens, labels, mask):
        loss, grads = mapped(params, tokens, labels, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        # keep the Adam moments dp-sharded (ZeRO-1); without the constraint
        # XLA may replicate them to match the donated layout
        opt_state = _constrain_state(opt_state, mesh, table)
        params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype),
                              params, updates)
        # updated params return to the replicated (or tp-only) layout — the
        # ZeRO param all-gather, inserted by GSPMD at the p + u above
        params = lax.with_sharding_constraint(
            params, jax.tree.map(lambda s: NamedSharding(mesh, s), base_tree))
        return params, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# ZeRO-3 / FSDP: parameters sharded at rest, gathered one layer at a time
# ---------------------------------------------------------------------------


def _zero3_dim(shape, dp: int, skip_dim0: bool) -> Optional[int]:
    """Largest shardable dim; ``skip_dim0`` keeps the stacked-layer axis
    whole (the scan must slice layers locally)."""
    best = None
    for i, n in enumerate(shape):
        if skip_dim0 and i == 0:
            continue
        if n % dp == 0 and n >= dp:
            if best is None or n > shape[best]:
                best = i
    return best


def zero3_param_specs(params_or_shapes, mesh: Mesh,
                      axes: MeshAxes = MeshAxes()):
    """Per-leaf dp-sharded specs for ZeRO-3 rest layout: every leaf shards
    its largest divisible dim over dp (never the stacked-layer axis);
    non-divisible leaves (norm vectors with dim % dp != 0) stay replicated."""
    dp = mesh.shape[axes.dp]

    def one_tree(tree, skip_dim0):
        def one(leaf):
            dim = _zero3_dim(leaf.shape, dp, skip_dim0)
            if dim is None:
                return P()
            return P(*[axes.dp if i == dim else None
                       for i in range(len(leaf.shape))])
        return jax.tree.map(one, tree)

    p = dict(params_or_shapes)
    layers = p.pop("layers")
    out = one_tree(p, skip_dim0=False)
    out["layers"] = one_tree(layers, skip_dim0=True)
    return out


def shard_params_zero3(params, mesh: Mesh, zspecs):
    """Place params in the ZeRO-3 rest layout (each dp rank holds 1/dp of
    every shardable leaf)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, zspecs, is_leaf=lambda x: not isinstance(x, (dict,)))


def make_zero3_train_step(cfg, mesh: Mesh, optimizer,
                          axes: MeshAxes = MeshAxes(), *,
                          interpret: Optional[bool] = None):
    """ZeRO-3 (FSDP) train step: parameters AND optimizer state live
    dp-sharded between steps; the forward's layer scan all-gathers exactly
    one layer's weights at a time (`models/llama.py forward_local
    layer_gather`), and the gather's autograd transpose delivers each
    gradient already reduce-scattered over dp — the ZeRO-3 cycle
    (gather -> compute -> release, grads scattered) with no hand-written
    backward. Per-device param+state memory is O(total/dp) + one layer;
    combine with ``cfg.remat`` for the full FSDP memory profile.

    The reference reaches this through DeepSpeed (``ZERO_STAGE=3`` in its
    Megatron launcher, `patches/Megatron-DeepSpeed.patch`); here it is
    native. Contract matches make_train_step, but ``params`` must be in the
    rest layout (``shard_params_zero3``) and ``opt_state`` from
    ``init_zero_opt_state(optimizer, params, mesh, zero3_param_specs(...))``.
    dp x ring x ulysses meshes; tp/pp/MoE stay on their dedicated steps.
    """
    from long_context_attention_tpu.models.llama import init_params, loss_local

    assert not cfg.moe, "ZeRO-3: MoE uses make_train_step (ep-sharded grads)"
    assert axes.pp not in mesh.axis_names and axes.tp not in mesh.axis_names, \
        "ZeRO-3 composes with dp x ring x ulysses (tp/pp have their own steps)"
    dp = mesh.shape[axes.dp]
    shapes = jax.eval_shape(functools.partial(init_params, cfg=cfg),
                            jax.random.PRNGKey(0))
    zspecs = zero3_param_specs(shapes, mesh, axes)
    table = _shape_table(shapes, zspecs)
    tok_spec = P(axes.dp, axes.seq)
    sp_axes = (axes.ring, axes.ulysses)

    def _gdim(spec) -> Optional[int]:
        for i, e in enumerate(tuple(spec)):
            if e == axes.dp:
                return i
        return None

    top_gdims = {k: _gdim(zspecs[k]) for k in zspecs if k != "layers"}
    # inside the scan the stacked-layer axis is consumed: gather dim - 1
    layer_gdims = {k: (None if _gdim(s) is None else _gdim(s) - 1)
                   for k, s in zspecs["layers"].items()}

    def local_grads(p_shard, tokens, labels, mask):
        def lf(p):
            full_top = {
                k: (lax.all_gather(v, axes.dp, axis=top_gdims[k], tiled=True)
                    if top_gdims[k] is not None else v)
                for k, v in p.items() if k != "layers"
            }

            def layer_gather(lp):
                return {k: (lax.all_gather(t, axes.dp, axis=layer_gdims[k],
                                           tiled=True)
                            if layer_gdims[k] is not None else t)
                        for k, t in lp.items()}

            pf = {**full_top, "layers": p["layers"]}
            return loss_local(pf, tokens, labels, mask, cfg,
                              ulysses_axis=axes.ulysses, ring_axis=axes.ring,
                              dp_axis=axes.dp, interpret=interpret,
                              layer_gather=layer_gather)

        loss, grads = jax.value_and_grad(lf)(p_shard)
        loss = lax.psum(loss, (axes.dp,) + sp_axes)
        # sequence-parallel replication sum for every leaf; the dp reduction
        # of SHARDED leaves already happened inside autograd (all_gather's
        # transpose is the reduce-scatter) — only replicated leaves psum dp
        grads = jax.tree.map(lambda g: lax.psum(g, sp_axes), grads)
        grads = jax.tree.map(
            lambda g, s: g if axes.dp in tuple(s) else lax.psum(g, axes.dp),
            grads, zspecs)
        return loss, grads

    mapped = jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(zspecs, tok_spec, tok_spec, tok_spec),
        out_specs=(P(), zspecs),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, tokens, labels, mask):
        loss, grads = mapped(params, tokens, labels, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        opt_state = _constrain_state(opt_state, mesh, table)
        params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype),
                              params, updates)
        # params STAY in the rest layout — no ZeRO-1-style final all-gather
        params = lax.with_sharding_constraint(
            params, jax.tree.map(lambda s: NamedSharding(mesh, s), zspecs))
        return params, opt_state, loss

    return step
