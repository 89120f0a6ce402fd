"""Varlen / packed-batch attention via segment ids.

TPU-native replacement for the reference's cu_seqlens varlen rings
(`ring/ring_flash_attn_varlen.py`, `ring/zigzag_ring_flash_attn_varlen.py`):
segment-id masking in the kernel, checked against (a) the segment-aware XLA
oracle and (b) per-sequence unpacked attention.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from long_context_attention_tpu.ops.flash import flash_attention
from long_context_attention_tpu.ops.reference import xla_attention
from long_context_attention_tpu.parallel import (
    LongContextAttention,
    make_usp_mesh,
    permute_for_layout,
    unpermute_from_layout,
)

B, S, H, HKV, D = 1, 256, 4, 2, 64
TOL = dict(atol=1e-1, rtol=0)


def make_packed(rng, n_seqs=3):
    """One packed row of n_seqs contiguous segments with uneven lengths."""
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, HKV, D)), jnp.bfloat16)
    bounds = [0, 96, 160, S]  # lengths 96 / 64 / 96
    seg = np.zeros((B, S), np.int32)
    for i in range(n_seqs):
        seg[:, bounds[i]:bounds[i + 1]] = i
    return q, k, v, jnp.asarray(seg), bounds


def unpacked_reference(q, k, v, bounds, causal):
    """Run each segment separately through the oracle and re-concatenate."""
    outs = []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        o, _ = xla_attention(q[:, lo:hi], k[:, lo:hi], v[:, lo:hi], causal=causal)
        outs.append(o)
    return jnp.concatenate(outs, axis=1)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_segments_match_unpacked(rng, causal):
    q, k, v, seg, bounds = make_packed(rng)
    out = flash_attention(q, k, v, causal=causal,
                          q_segment_ids=seg, kv_segment_ids=seg)
    ref = unpacked_reference(q, k, v, bounds, causal)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


def test_xla_oracle_segments_match_unpacked(rng):
    q, k, v, seg, bounds = make_packed(rng)
    out, _ = xla_attention(q, k, v, causal=True,
                           q_segment_ids=seg, kv_segment_ids=seg)
    ref = unpacked_reference(q, k, v, bounds, True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_flash_segment_grads(rng, impl):
    """Packed grads == concatenated per-segment grads."""
    q, k, v, seg, bounds = make_packed(rng)
    dout = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    doutf = dout.astype(jnp.float32)

    def packed_loss(q, k, v):
        if impl == "pallas":
            out = flash_attention(q, k, v, causal=True,
                                  q_segment_ids=seg, kv_segment_ids=seg)
        else:
            out, _ = xla_attention(q, k, v, causal=True,
                                   q_segment_ids=seg, kv_segment_ids=seg)
        return jnp.sum(out.astype(jnp.float32) * doutf)

    def unpacked_loss(q, k, v):
        out = unpacked_reference(q, k, v, bounds, True)
        return jnp.sum(out.astype(jnp.float32) * doutf)

    g = jax.grad(packed_loss, argnums=(0, 1, 2))(q, k, v)
    r = jax.grad(unpacked_loss, argnums=(0, 1, 2))(q, k, v)
    for gi, ri, name in zip(g, r, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(gi, np.float32),
                                   np.asarray(ri, np.float32),
                                   err_msg=name, **TOL)


@pytest.mark.parametrize("layout", ["basic", "zigzag", "stripe"])
def test_usp_varlen_forward(rng, layout):
    """Packed batch through the full USP layer (u=2 x r=4) — the analog of
    the reference's varlen ring tests, all three layouts."""
    ring = 4
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=ring)
    layer = LongContextAttention(mesh=mesh, layout=layout, impl="pallas")
    q, k, v, seg, bounds = make_packed(rng)
    qp, kp, vp = (permute_for_layout(x, layout, ring) for x in (q, k, v))
    segp = permute_for_layout(seg, layout, ring, axis=1)
    out = layer(qp, kp, vp, causal=True, segment_ids=segp)
    out = unpermute_from_layout(out, layout, ring)
    ref = unpacked_reference(q, k, v, bounds, True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


def test_usp_varlen_grads(rng):
    ring, layout = 4, "zigzag"
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=ring)
    layer = LongContextAttention(mesh=mesh, layout=layout, impl="pallas")
    q, k, v, seg, bounds = make_packed(rng)
    dout = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    doutf = dout.astype(jnp.float32)
    segp = permute_for_layout(seg, layout, ring, axis=1)

    def dist_loss(q, k, v):
        qp, kp, vp = (permute_for_layout(x, layout, ring) for x in (q, k, v))
        out = unpermute_from_layout(
            layer(qp, kp, vp, causal=True, segment_ids=segp), layout, ring)
        return jnp.sum(out.astype(jnp.float32) * doutf)

    def ref_loss(q, k, v):
        return jnp.sum(
            unpacked_reference(q, k, v, bounds, True).astype(jnp.float32) * doutf)

    g = jax.grad(dist_loss, argnums=(0, 1, 2))(q, k, v)
    r = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for gi, ri, name in zip(g, r, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(gi, np.float32),
                                   np.asarray(ri, np.float32),
                                   err_msg=name, **TOL)


def test_segment_ids_from_cu_seqlens(rng):
    """The cu_seqlens adapter reproduces explicit segment ids exactly — the
    API bridge for users coming from the reference's varlen rings
    (`ring/ring_flash_attn_varlen.py:28`)."""
    import numpy as np
    from long_context_attention_tpu.parallel import segment_ids_from_cu_seqlens

    ids = segment_ids_from_cu_seqlens([0, 5, 5, 12, 16], 20)
    expect = np.array([[1]*5 + [3]*7 + [4]*4 + [0]*4], np.int32)
    np.testing.assert_array_equal(np.asarray(ids), expect)

    # end-to-end: packed varlen attention via cu_seqlens == via explicit ids
    import jax.numpy as jnp
    from long_context_attention_tpu.ops.flash import flash_attention
    from long_context_attention_tpu.utils.config import BlockSizes

    s = 128
    cu = [0, 37, 90, 128]
    seg = segment_ids_from_cu_seqlens(cu, s)
    q = jnp.asarray(rng.standard_normal((1, s, 2, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, s, 2, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, s, 2, 32)), jnp.float32)
    bs = BlockSizes(32, 32)
    out = flash_attention(q, k, v, causal=True, q_segment_ids=seg,
                          kv_segment_ids=seg, block_sizes=bs)
    explicit = jnp.asarray(
        np.array([[1]*37 + [2]*53 + [3]*38]), jnp.int32)
    ref = flash_attention(q, k, v, causal=True, q_segment_ids=explicit,
                          kv_segment_ids=explicit, block_sizes=bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=0)


def test_packed_full_kwargs_parity(rng):
    """``LongContextAttention.packed`` threads the FULL kwargs set —
    segment_ids, dropout, ALiBi, window+sinks, kv_quant — exactly like
    ``__call__`` (the reference's packed layer does too,
    `hybrid/attn_layer.py:164-259`): identical inputs through the two
    entries must produce identical outputs (same kernels, same seeds)."""
    ring, layout = 4, "zigzag"
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=ring)
    # MHA shapes: the packed (b, s, 3, h, d) stack requires h == h_kv
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    seg = np.zeros((B, S), np.int32)
    for i, (lo, hi) in enumerate([(0, 96), (96, 160), (160, S)]):
        seg[:, lo:hi] = i
    qp, kp, vp = (permute_for_layout(x, layout, ring) for x in (q, k, v))
    segp = permute_for_layout(jnp.asarray(seg), layout, ring, axis=1)
    qkv = jnp.stack([qp, kp, vp], axis=2)
    slopes = np.geomspace(0.5, 1 / 16, H).astype(np.float32)
    key = jax.random.PRNGKey(13)

    layer = LongContextAttention(mesh=mesh, layout=layout, impl="pallas")
    kw = dict(causal=True, segment_ids=segp, dropout_p=0.25,
              dropout_key=key, alibi_slopes=slopes)
    np.testing.assert_array_equal(
        np.asarray(layer.packed(qkv, **kw), np.float32),
        np.asarray(layer(qp, kp, vp, **kw), np.float32))

    kw2 = dict(causal=True, window_size=(64, -1), sink_tokens=16)
    np.testing.assert_array_equal(
        np.asarray(layer.packed(qkv, **kw2), np.float32),
        np.asarray(layer(qp, kp, vp, **kw2), np.float32))

    # constructor knobs (kv_quant int8 transport) ride both entries too
    qlayer = LongContextAttention(mesh=mesh, layout=layout, impl="pallas",
                                  kv_quant="int8")
    np.testing.assert_array_equal(
        np.asarray(qlayer.packed(qkv, causal=True), np.float32),
        np.asarray(qlayer(qp, kp, vp, causal=True), np.float32))
