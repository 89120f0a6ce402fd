"""Mesh construction: axis placement, ulysses_low, custom axis names."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from long_context_attention_tpu.ops.reference import xla_attention
from long_context_attention_tpu.parallel import (
    LongContextAttention,
    MeshAxes,
    make_usp_mesh,
    permute_for_layout,
    seq_sharding,
    unpermute_from_layout,
)


def test_mesh_shapes_and_names():
    mesh = make_usp_mesh(dp=2, ulysses=2, ring=2)
    assert mesh.axis_names == ("dp", "ring", "ulysses")
    assert mesh.devices.shape == (2, 2, 2)


def test_custom_axis_names():
    axes = MeshAxes(dp="data", ring="cp", ulysses="sp")
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=4, axes=axes)
    assert mesh.axis_names == ("data", "cp", "sp")
    assert axes.seq == ("cp", "sp")


def test_ulysses_low_controls_adjacency():
    """ulysses_low=True: ulysses ranks on contiguous device ids (the
    reference's `use_ulysses_low`, `globals.py:39-78`); False: ring ranks."""
    devs = jax.devices()[:8]
    low = make_usp_mesh(dp=1, ulysses=2, ring=4, devices=devs,
                        ulysses_low=True)
    ids = np.vectorize(lambda d: d.id)(low.devices)
    # along the ulysses axis (last), ids are consecutive
    assert (np.diff(ids[0], axis=1) == 1).all()
    high = make_usp_mesh(dp=1, ulysses=2, ring=4, devices=devs,
                         ulysses_low=False)
    ids2 = np.vectorize(lambda d: d.id)(high.devices)
    assert (np.diff(ids2[0], axis=0) == 1).all()


@pytest.mark.parametrize("ulysses_low", [True, False])
def test_usp_correct_under_both_orders(rng, ulysses_low):
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=4, ulysses_low=ulysses_low)
    layer = LongContextAttention(mesh=mesh, layout="zigzag")
    B, S, H, HKV, D = 1, 128, 4, 2, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, HKV, D)), jnp.bfloat16)
    qp, kp, vp = (permute_for_layout(x, "zigzag", 4) for x in (q, k, v))
    out = unpermute_from_layout(layer(qp, kp, vp, causal=True), "zigzag", 4)
    ref, _ = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-1, rtol=0)


def test_seq_sharding_spec():
    mesh = make_usp_mesh(dp=2, ulysses=2, ring=2)
    sh = seq_sharding(mesh)
    assert sh.spec == jax.sharding.PartitionSpec("dp", ("ring", "ulysses"),
                                                 None, None)
