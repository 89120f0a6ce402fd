"""USP hybrid (ulysses x ring) and Ulysses-only vs the oracle, 8-device mesh.

The pytest analog of the reference's torchrun drivers `test_hybrid_attn.py` /
`test_ulysses_attn.py` (SURVEY.md §4): global tensors -> layout shard ->
distributed layer -> compare vs single-device oracle at bf16 atol=1e-1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from long_context_attention_tpu.ops.reference import xla_attention
from long_context_attention_tpu.parallel import (
    LongContextAttention,
    UlyssesAttention,
    make_usp_mesh,
    permute_for_layout,
    unpermute_from_layout,
)

B, S, H, HKV, D = 2, 256, 8, 4, 64
TOL = dict(atol=1e-1, rtol=0)  # `test/test_hybrid_attn.py:386`


def make_qkv(rng, h=H, hkv=HKV, s=S, dtype=jnp.bfloat16):
    q = jnp.asarray(rng.normal(size=(B, s, h, D)), dtype)
    k = jnp.asarray(rng.normal(size=(B, s, hkv, D)), dtype)
    v = jnp.asarray(rng.normal(size=(B, s, hkv, D)), dtype)
    return q, k, v


def check(out, ref, **tol):
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **(tol or TOL))


@pytest.mark.parametrize("degrees", [(1, 2, 4), (1, 4, 2), (2, 2, 2), (1, 8, 1), (1, 1, 8)])
@pytest.mark.parametrize("layout", ["zigzag"])
def test_usp_forward_matches_oracle(rng, degrees, layout):
    dp, ulysses, ring = degrees
    mesh = make_usp_mesh(dp=dp, ulysses=ulysses, ring=ring)
    layer = LongContextAttention(mesh=mesh, layout=layout, impl="pallas")
    # ulysses degree must divide kv heads (`README.md:18-21`)
    hkv = HKV if HKV % ulysses == 0 else H
    q, k, v = make_qkv(rng, hkv=hkv)
    qp, kp, vp = (permute_for_layout(x, layout, ring) for x in (q, k, v))
    out = layer(qp, kp, vp, causal=True)
    out = unpermute_from_layout(out, layout, ring)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref)


@pytest.mark.parametrize("layout", ["basic", "zigzag", "stripe"])
def test_usp_layouts_forward(rng, layout):
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=4)
    layer = LongContextAttention(mesh=mesh, layout=layout, impl="pallas")
    q, k, v = make_qkv(rng)
    qp, kp, vp = (permute_for_layout(x, layout, 4) for x in (q, k, v))
    out = unpermute_from_layout(layer(qp, kp, vp, causal=True), layout, 4)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref)


def test_usp_grads_match_oracle(rng):
    layout, ring = "zigzag", 4
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=ring)
    layer = LongContextAttention(mesh=mesh, layout=layout, impl="pallas")
    q, k, v = make_qkv(rng)
    dout = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    doutf = dout.astype(jnp.float32)

    def dist_loss(q, k, v):
        qp, kp, vp = (permute_for_layout(x, layout, ring) for x in (q, k, v))
        out = unpermute_from_layout(layer(qp, kp, vp, causal=True), layout, ring)
        return jnp.sum(out.astype(jnp.float32) * doutf)

    def ref_loss(q, k, v):
        out, _ = xla_attention(q, k, v, causal=True)
        return jnp.sum(out.astype(jnp.float32) * doutf)

    grads = jax.grad(dist_loss, argnums=(0, 1, 2))(q, k, v)
    refs = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(grads, refs, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   err_msg=name, **TOL)


def test_usp_qkvpacked(rng):
    """The QKVPacked entry (`hybrid/attn_layer.py:164-259`) — and unlike the
    reference's use_pack_qkv path (`.continous()` crash, `:88`), it works."""
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=4)
    layer = LongContextAttention(mesh=mesh, layout="zigzag", impl="pallas")
    q, k, v = make_qkv(rng, hkv=H)  # packed layout needs equal head counts
    qkv = jnp.stack([q, k, v], axis=2)  # (b, s, 3, h, d)
    qkvp = permute_for_layout(qkv, "zigzag", 4)
    out = unpermute_from_layout(layer.packed(qkvp, causal=True), "zigzag", 4)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref)


def test_ulysses_only_layer(rng):
    """`test_ulysses_attn.py` analog: ud=8, no ring."""
    mesh = make_usp_mesh(dp=1, ulysses=8, ring=1)
    layer = UlyssesAttention(mesh=mesh, impl="pallas")
    q, k, v = make_qkv(rng, hkv=H)  # ud=8 needs 8 kv heads
    out = layer(q, k, v, causal=True)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref)


def test_usp_noncausal_dit(rng):
    """Non-causal (DiT) workload, `scripts/run_dit.sh` analog."""
    mesh = make_usp_mesh(dp=1, ulysses=4, ring=2)
    layer = LongContextAttention(mesh=mesh, layout="basic", impl="pallas")
    q, k, v = make_qkv(rng)
    out = layer(q, k, v, causal=False)
    ref, _ = xla_attention(q, k, v, causal=False)
    check(out, ref)


def test_usp_gqa_constraint_like_reference(rng):
    """GQA: kv heads divide across ulysses (`README.md:18-21`); h=8, hkv=4,
    ud=4 -> 1 kv head per ulysses shard."""
    mesh = make_usp_mesh(dp=1, ulysses=4, ring=2)
    layer = LongContextAttention(mesh=mesh, layout="zigzag", impl="pallas")
    q, k, v = make_qkv(rng)
    qp, kp, vp = (permute_for_layout(x, "zigzag", 2) for x in (q, k, v))
    out = unpermute_from_layout(layer(qp, kp, vp, causal=True), "zigzag", 2)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref)


def test_async_usp_matches_oracle(rng):
    """AsyncLongContextAttention analog (`hybrid/async_attn_layer.py`):
    head-group pipelined USP, fwd + grads."""
    from long_context_attention_tpu.parallel import AsyncLongContextAttention

    ring = 4
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=ring)
    layer = AsyncLongContextAttention(mesh=mesh, layout="zigzag", impl="pallas")
    q, k, v = make_qkv(rng)
    qp, kp, vp = (permute_for_layout(x, "zigzag", ring) for x in (q, k, v))
    out = unpermute_from_layout(layer(qp, kp, vp, causal=True), "zigzag", ring)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref)

    dout = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    doutf = dout.astype(jnp.float32)

    def dist_loss(q, k, v):
        qp, kp, vp = (permute_for_layout(x, "zigzag", ring) for x in (q, k, v))
        o = unpermute_from_layout(layer(qp, kp, vp, causal=True), "zigzag", ring)
        return jnp.sum(o.astype(jnp.float32) * doutf)

    def ref_loss(q, k, v):
        o, _ = xla_attention(q, k, v, causal=True)
        return jnp.sum(o.astype(jnp.float32) * doutf)

    g = jax.grad(dist_loss, argnums=(0, 1, 2))(q, k, v)
    r = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for gi, ri, name in zip(g, r, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(gi, np.float32),
                                   np.asarray(ri, np.float32),
                                   err_msg=name, atol=1e-1, rtol=0)


def test_usp_bidirectional_layer(rng):
    """bidirectional=True through the public USP layer."""
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=4)
    layer = LongContextAttention(mesh=mesh, layout="zigzag", bidirectional=True)
    q, k, v = make_qkv(rng)
    qp, kp, vp = (permute_for_layout(x, "zigzag", 4) for x in (q, k, v))
    out = unpermute_from_layout(layer(qp, kp, vp, causal=True), "zigzag", 4)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref)


def test_usp_kv_quant_layer(rng):
    """kv_quant='int8' through the public USP layer."""
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=4)
    layer = LongContextAttention(mesh=mesh, layout="zigzag", kv_quant="int8")
    q, k, v = make_qkv(rng)
    qp, kp, vp = (permute_for_layout(x, "zigzag", 4) for x in (q, k, v))
    out = unpermute_from_layout(layer(qp, kp, vp, causal=True), "zigzag", 4)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref, atol=2e-1, rtol=0)
