"""Ring attention vs the single-device oracle, on the 8-device CPU mesh.

The reference's test pattern (SURVEY.md §4): build *global* q/k/v, shard them
per ring layout, run the distributed attention under shard_map, and compare
the (un-layouted) result against full-sequence single-device attention — here
as real pytest instead of torchrun scripts (`test/test_hybrid_attn.py`).
Gradients are checked the same way via jax.grad of a scalar loss.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from long_context_attention_tpu.ops.reference import xla_attention
from long_context_attention_tpu.parallel.layouts import (
    permute_for_layout,
    unpermute_from_layout,
)
from long_context_attention_tpu.parallel.ring import ring_attention_local

RING = 4
B, S, H, HKV, D = 1, 256, 4, 2, 64


def ring_mesh(n=RING):
    return Mesh(np.array(jax.devices()[:n]), axis_names=("ring",))


def run_ring(q, k, v, layout, impl, **kw):
    """Global (b,s,h,d) arrays -> global out via shard_map ring."""
    mesh = ring_mesh()
    qp = permute_for_layout(q, layout, RING)
    kp = permute_for_layout(k, layout, RING)
    vp = permute_for_layout(v, layout, RING)
    fn = functools.partial(ring_attention_local, axis_name="ring",
                           layout=layout, impl=impl, **kw)
    spec = P(None, "ring", None, None)
    out = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * 3,
                                out_specs=spec, check_vma=False))(qp, kp, vp)
    return unpermute_from_layout(out, layout, RING)


def make_qkv(rng, dtype=jnp.bfloat16, h=H, hkv=HKV, s=S):
    q = jnp.asarray(rng.normal(size=(B, s, h, D)), dtype)
    k = jnp.asarray(rng.normal(size=(B, s, hkv, D)), dtype)
    v = jnp.asarray(rng.normal(size=(B, s, hkv, D)), dtype)
    return q, k, v


TOL = dict(atol=1e-1, rtol=0)  # the reference gate: bf16 atol=1e-1, rtol=0
                               # (`test/test_hybrid_attn.py:386`)


@pytest.mark.parametrize("layout", ["basic", "zigzag", "stripe"])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_ring_forward_matches_oracle(rng, layout, causal, impl):
    q, k, v = make_qkv(rng)
    out = run_ring(q, k, v, layout, impl, causal=causal)
    ref, _ = xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


@pytest.mark.parametrize("layout", ["basic", "zigzag", "stripe"])
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_ring_grads_match_oracle(rng, layout, impl):
    q, k, v = make_qkv(rng)
    dout = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)

    def dist_loss(q, k, v):
        out = run_ring(q, k, v, layout, impl, causal=True)
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    def ref_loss(q, k, v):
        out, _ = xla_attention(q, k, v, causal=True)
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    dq, dk, dv = jax.grad(dist_loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in [(dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")]:
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   err_msg=name, **TOL)


def test_ring_sliding_window(rng):
    """Sliding-window masking across ring shards (the FA3 adapter silently
    drops windows, `kernels/attention.py:320-321` — we must not)."""
    q, k, v = make_qkv(rng)
    out = run_ring(q, k, v, "zigzag", "xla", causal=True, window_size=(64, 0))
    ref, _ = xla_attention(q, k, v, causal=True, window_size=(64, 0))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


def test_ring_softcap(rng):
    q, k, v = make_qkv(rng)
    out = run_ring(q, k, v, "zigzag", "xla", causal=True, softcap=30.0)
    ref, _ = xla_attention(q, k, v, causal=True, softcap=30.0)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


def test_ring_lse_matches_oracle(rng):
    q, k, v = make_qkv(rng)
    mesh = ring_mesh()
    layout = "zigzag"
    qp, kp, vp = (permute_for_layout(x, layout, RING) for x in (q, k, v))
    fn = functools.partial(ring_attention_local, axis_name="ring",
                           layout=layout, impl="xla", causal=True,
                           return_lse=True)
    spec = P(None, "ring", None, None)
    lse_spec = P(None, None, "ring")
    out, lse = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(spec,) * 3, out_specs=(spec, lse_spec),
        check_vma=False))(qp, kp, vp)
    lse = unpermute_from_layout(lse, layout, RING, axis=2)
    _, ref_lse = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=2e-2, rtol=1e-4)


@pytest.mark.parametrize("kv_quant", ["int8", "float8_e4m3fn"])
def test_ring_quantized_kv_forward(rng, kv_quant):
    """Quantized-KV ring (Sage-role analog + ICI-traffic halving): forward
    matches the oracle within quantization tolerance."""
    q, k, v = make_qkv(rng)
    out = run_ring(q, k, v, "zigzag", "pallas", causal=True, kv_quant=kv_quant)
    ref, _ = xla_attention(q, k, v, causal=True)
    tol = 2e-1 if kv_quant == "int8" else 5e-1
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=0)


def test_ring_quantized_kv_grads_run(rng):
    """Backward with kv_quant: grads flow (full-precision bwd) and stay
    close to unquantized grads."""
    q, k, v = make_qkv(rng)
    dout = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)

    def loss(q, k, v):
        out = run_ring(q, k, v, "zigzag", "pallas", causal=True,
                       kv_quant="int8")
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    def ref_loss(q, k, v):
        out, _ = xla_attention(q, k, v, causal=True)
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    r = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for gi, ri, name in zip(g, r, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(gi, np.float32),
                                   np.asarray(ri, np.float32),
                                   err_msg=name, atol=3e-1, rtol=0)


def test_ring_quantized_kv_grads_match_dequant_oracle(rng):
    """ADVICE r1 #2: the kv_quant backward must see the *dequantized* KV the
    forward attended to. Oracle: straight-through-estimator attention on
    dequant(quant(kv)) — its forward equals the quantized ring's forward, so
    grads must agree at the plain bf16 gate (not just 'finite')."""
    from long_context_attention_tpu.ops.kv_cache import (
        dequantize_kv, quantize_kv)

    q, k, v = make_qkv(rng)
    dout = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)

    def loss(q, k, v):
        out = run_ring(q, k, v, "zigzag", "pallas", causal=True,
                       kv_quant="int8")
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    def ste(x):
        xd = dequantize_kv(*quantize_kv(x, "int8"), x.dtype)
        return x + jax.lax.stop_gradient(xd - x)

    def ref_loss(q, k, v):
        out, _ = xla_attention(q, ste(k), ste(v), causal=True)
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    r = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for gi, ri, name in zip(g, r, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(gi, np.float32),
                                   np.asarray(ri, np.float32),
                                   err_msg=name, **TOL)


@pytest.mark.parametrize("layout", ["basic", "zigzag", "stripe"])
@pytest.mark.parametrize("kv_quant", ["int8", "float8_e4m3fn"])
def test_ring_bidirectional_quantized(rng, layout, kv_quant):
    """VERDICT r1 #8: both ICI-bandwidth levers stack — quantized KV halves
    counter-rotate with their scales; forward matches the oracle within
    quantization tolerance on every layout."""
    q, k, v = make_qkv(rng)
    out = run_ring(q, k, v, layout, "pallas", causal=True,
                   bidirectional=True, kv_quant=kv_quant)
    ref, _ = xla_attention(q, k, v, causal=True)
    tol = 2e-1 if kv_quant == "int8" else 5e-1
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=0)


def test_ring_bidirectional_quantized_grads(rng):
    """Bidirectional + kv_quant backward: dequantized-residual grads at the
    bf16 gate vs the STE oracle."""
    from long_context_attention_tpu.ops.kv_cache import (
        dequantize_kv, quantize_kv)

    q, k, v = make_qkv(rng)
    dout = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)

    def loss(q, k, v):
        out = run_ring(q, k, v, "zigzag", "pallas", causal=True,
                       bidirectional=True, kv_quant="int8")
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    def ste(x):
        xd = dequantize_kv(*quantize_kv(x, "int8"), x.dtype)
        return x + jax.lax.stop_gradient(xd - x)

    def ref_loss(q, k, v):
        out, _ = xla_attention(q, ste(k), ste(v), causal=True)
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    r = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for gi, ri, name in zip(g, r, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(gi, np.float32),
                                   np.asarray(ri, np.float32),
                                   err_msg=name, **TOL)


@pytest.mark.parametrize("layout", ["basic", "zigzag", "stripe"])
@pytest.mark.parametrize("causal", [False, True])
def test_ring_bidirectional_forward(rng, layout, causal):
    """TokenRing-style bidirectional rotation (both ICI directions):
    bit-for-bit semantics vs the oracle under every layout."""
    q, k, v = make_qkv(rng)
    out = run_ring(q, k, v, layout, "pallas", causal=causal,
                   bidirectional=True)
    ref, _ = xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


@pytest.mark.parametrize("layout", ["basic", "zigzag"])
def test_ring_bidirectional_grads(rng, layout):
    q, k, v = make_qkv(rng)
    dout = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)

    def loss(q, k, v):
        out = run_ring(q, k, v, layout, "pallas", causal=True,
                       bidirectional=True)
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    def ref_loss(q, k, v):
        out, _ = xla_attention(q, k, v, causal=True)
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    r = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for gi, ri, name in zip(g, r, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(gi, np.float32),
                                   np.asarray(ri, np.float32),
                                   err_msg=name, **TOL)


def test_ring_pallas_window_sink_kv_quant(rng):
    """Sliding window + sinks + int8 transport quantization through the
    pallas ring (the per-step kernels band their kv grids when the window
    is narrow enough): vs the positional oracle at the bf16+int8 gate."""
    q, k, v = make_qkv(rng)
    out = run_ring(q, k, v, "zigzag", "pallas", causal=True,
                   window_size=(64, -1), sink_tokens=24, kv_quant="int8")
    ref, _ = xla_attention(q, k, v, causal=True, window_size=(64, -1),
                           sink_tokens=24)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


def test_ring_pallas_window_grads_match_oracle(rng):
    """Windowed gradients through the pallas ring (the per-step banded
    kernels + the two-ring fp32 backward) vs the oracle."""
    q, k, v = make_qkv(rng)
    dout = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    kw = dict(causal=True, window_size=(64, -1), sink_tokens=24)

    def dist_loss(q, k, v):
        out = run_ring(q, k, v, "zigzag", "pallas", **kw)
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    def ref_loss(q, k, v):
        out, _ = xla_attention(q, k, v, **kw)
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    g = jax.grad(dist_loss, argnums=(0, 1, 2))(q, k, v)
    r = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for gi, ri, name in zip(g, r, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(gi, np.float32),
                                   np.asarray(ri, np.float32),
                                   err_msg=name, **TOL)
