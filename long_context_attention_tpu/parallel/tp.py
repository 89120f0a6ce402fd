"""Tensor-parallel helpers: the Megatron f/g conjugate boundary operators.

The reference *delegates* TP to Megatron (`patches/Megatron-DeepSpeed.patch`
keeps Megatron's TP; SURVEY.md "TP: not implemented"). Here TP is native: a
column-parallel matmul pair wraps its input in :func:`tp_region_input`
(identity forward, psum backward — Megatron's "f") and reduces its
row-parallel output with a plain ``lax.psum`` (whose VJP is the identity
broadcast — Megatron's "g"). With both boundaries in place, activation
cotangents stay replicated across the tp axis, so parameter gradients need
no tp reduction: sharded weights get exactly their shard's gradient and
replicated weights get the full gradient on every rank.
"""

from __future__ import annotations

import functools

import jax
from jax import lax

__all__ = ["tp_region_input", "tp_region_output", "psum_for_value"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_region_input(x, axis_name: str):
    """Identity forward / psum-over-tp backward (Megatron's "f")."""
    return x


def _f_fwd(x, axis_name):
    return x, None


def _f_bwd(axis_name, _, g):
    return (lax.psum(g, axis_name),)


tp_region_input.defvjp(_f_fwd, _f_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_region_output(x, axis_name: str):
    """psum forward / identity backward (Megatron's "g").

    NOT the same as a bare ``lax.psum``: under shard_map, psum's transpose is
    *psum* — a replicated cotangent flowing back through it gets multiplied by
    the axis size (empirically verified; the root of a subtle all-grads-
    scaled-by-world-size bug that optimizers like Adam silently mask)."""
    return lax.psum(x, axis_name)


def _g_fwd(x, axis_name):
    return lax.psum(x, axis_name), None


def _g_bwd(axis_name, _, g):
    return (g,)


tp_region_output.defvjp(_g_fwd, _g_bwd)


psum_for_value = tp_region_output  # alias: reduce a value without creating a
                                   # scaling psum in the gradient path
