"""Attention dropout + ALiBi: kernel vs explicit-mask oracles, and
distributed (ring / USP) vs single-device exact consistency.

The reference threads ``dropout_p`` and ``alibi_slopes`` through every layer
(`hybrid/attn_layer.py:62-67`); here both are implemented *inside* the Pallas
kernel as pure functions of global positions, so:

* an explicit-mask XLA oracle can regenerate the identical dropout pattern
  (the keep mask is a counter-based hash — re-implemented in numpy below),
* ring / USP shards reproduce the single-device pattern bit-for-bit (their
  tiles carry global positions), tested as exact consistency.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from long_context_attention_tpu.ops.flash import flash_attention
from long_context_attention_tpu.ops.reference import xla_attention
from long_context_attention_tpu.parallel.layouts import (
    permute_for_layout,
    unpermute_from_layout,
)
from long_context_attention_tpu.parallel.mesh import make_usp_mesh
from long_context_attention_tpu.parallel.ring import ring_attention_local
from long_context_attention_tpu.parallel.usp import LongContextAttention

B, S, H, HKV, D = 1, 256, 4, 2, 64
RING = 4
TOL = dict(atol=1e-1, rtol=0)  # the reference's bf16 gate


def make_qkv(rng, dtype=jnp.bfloat16, s=S):
    q = jnp.asarray(rng.normal(size=(B, s, H, D)), dtype)
    k = jnp.asarray(rng.normal(size=(B, s, HKV, D)), dtype)
    v = jnp.asarray(rng.normal(size=(B, s, HKV, D)), dtype)
    return q, k, v


def alibi_bias(slopes, s_q, s_kv):
    """(h, s_q, s_kv) fp32 oracle bias: -slope * |i - j|."""
    i = np.arange(s_q)[:, None]
    j = np.arange(s_kv)[None, :]
    return jnp.asarray(-np.asarray(slopes)[:, None, None]
                       * np.abs(i - j)[None], jnp.float32)


def keep_mask_oracle(seed, p, s_q, s_kv, heads, batch=B):
    """Numpy re-derivation of the kernel's counter-based keep mask
    (ops/flash.py _dropout_keep): Bernoulli(1-p) from lowbias32 over
    (seed, batch, global head, global positions)."""
    def h32(x):
        x = x.astype(np.uint32)
        x ^= x >> np.uint32(16)
        x *= np.uint32(0x7FEB352D)
        x ^= x >> np.uint32(15)
        x *= np.uint32(0x846CA68B)
        x ^= x >> np.uint32(16)
        return x

    gold = np.uint32(0x9E3779B9)
    rows = np.arange(s_q, dtype=np.uint32)[:, None]
    cols = np.arange(s_kv, dtype=np.uint32)[None, :]
    out = np.zeros((batch, heads, s_q, s_kv), bool)
    thresh = np.uint32(min(int(p * 4294967296.0), 4294967295))
    for b in range(batch):
        for hh in range(heads):
            # uint32 wraparound is the point — do the salt math in Python ints
            salt = np.uint32((int(seed[0]) + b * 2654435761
                              + (int(seed[1]) + hh) * 0x9E3779B9) % 2**32)
            bits = h32(cols + gold * h32(rows + h32(np.full((), salt))))
            out[b, hh] = bits >= thresh
    return jnp.asarray(out)


def oracle_dropout_attention(q, k, v, keep, p, *, causal):
    """Explicit-mask dropout attention: softmax denominator undropped,
    kept probabilities scaled by 1/(1-p) — flash-attn's convention."""
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    g = q.shape[2] // k.shape[2]
    kf = jnp.repeat(kf, g, axis=2)
    vf = jnp.repeat(vf, g, axis=2)
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bthd,bshd->bhts", qf * scale, kf)
    if causal:
        mask = np.tril(np.ones((q.shape[1], k.shape[1]), bool))
        s = jnp.where(jnp.asarray(mask)[None, None], s, -jnp.inf)
    pmat = jax.nn.softmax(s, axis=-1)
    pmat = jnp.where(jax.lax.stop_gradient(keep), pmat, 0.0) / (1.0 - p)
    return jnp.einsum("bhts,bshd->bthd", pmat, vf)


# ---------------------------------------------------------------------------
# ALiBi
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("causal", [False, True])
def test_flash_alibi_matches_oracle(rng, causal):
    q, k, v = make_qkv(rng)
    slopes = np.geomspace(1.0 / 2, 1.0 / 16, H).astype(np.float32)
    out = flash_attention(q, k, v, causal=causal, alibi_slopes=slopes)
    ref, _ = xla_attention(q, k, v, causal=causal,
                           bias=alibi_bias(slopes, S, S)[None])
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


def test_flash_alibi_grads_match_oracle(rng):
    q, k, v = make_qkv(rng)
    slopes = np.geomspace(1.0 / 2, 1.0 / 16, H).astype(np.float32)
    dout = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)

    def loss_kernel(q, k, v):
        out = flash_attention(q, k, v, causal=True, alibi_slopes=slopes)
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    def loss_ref(q, k, v):
        out, _ = xla_attention(q, k, v, causal=True,
                               bias=alibi_bias(slopes, S, S)[None])
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), **TOL)


@pytest.mark.parametrize("layout", ["basic", "zigzag", "stripe"])
def test_ring_alibi_matches_oracle(rng, layout):
    q, k, v = make_qkv(rng)
    slopes = np.geomspace(1.0 / 2, 1.0 / 16, H).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()[:RING]), axis_names=("ring",))
    qp, kp, vp = (permute_for_layout(x, layout, RING) for x in (q, k, v))
    fn = functools.partial(ring_attention_local, axis_name="ring",
                           layout=layout, causal=True, alibi_slopes=slopes)
    spec = P(None, "ring", None, None)
    out = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * 3,
                                out_specs=spec, check_vma=False))(qp, kp, vp)
    out = unpermute_from_layout(out, layout, RING)
    ref, _ = xla_attention(q, k, v, causal=True,
                           bias=alibi_bias(slopes, S, S)[None])
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


def test_usp_alibi_layer_matches_oracle(rng):
    """2x2 USP: per-rank slope slicing after the head a2a must reproduce the
    global per-head bias."""
    q, k, v = make_qkv(rng)
    slopes = np.geomspace(1.0 / 2, 1.0 / 16, H).astype(np.float32)
    mesh = make_usp_mesh(ulysses=2, ring=2, devices=jax.devices()[:4])
    layer = LongContextAttention(mesh=mesh, layout="zigzag")
    # layout permutation over the ring axis only (ulysses is head-sharded)
    qp = permute_for_layout(q, "zigzag", 2)
    kp = permute_for_layout(k, "zigzag", 2)
    vp = permute_for_layout(v, "zigzag", 2)
    out = layer(qp, kp, vp, causal=True, alibi_slopes=slopes)
    out = unpermute_from_layout(out, "zigzag", 2)
    ref, _ = xla_attention(q, k, v, causal=True,
                           bias=alibi_bias(slopes, S, S)[None])
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("causal", [False, True])
def test_flash_dropout_matches_mask_oracle(rng, causal):
    q, k, v = make_qkv(rng)
    p = 0.3
    seed = (12345, 0)
    out = flash_attention(q, k, v, causal=causal, dropout_p=p,
                          dropout_seed=jnp.asarray(seed, jnp.int32))
    keep = keep_mask_oracle(seed, p, S, S, H)
    ref = oracle_dropout_attention(q, k, v, keep, p, causal=causal)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


def test_flash_dropout_grads_match_mask_oracle(rng):
    q, k, v = make_qkv(rng)
    p = 0.25
    seed = (777, 0)
    dout = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    keep = keep_mask_oracle(seed, p, S, S, H)

    def loss_kernel(q, k, v):
        out = flash_attention(q, k, v, causal=True, dropout_p=p,
                              dropout_seed=jnp.asarray(seed, jnp.int32))
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    def loss_ref(q, k, v):
        out = oracle_dropout_attention(q, k, v, keep, p, causal=True)
        return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), **TOL)


def test_flash_dropout_rate_and_determinism(rng):
    q, k, v = make_qkv(rng)
    key = jax.random.PRNGKey(3)
    p = 0.5
    o1 = flash_attention(q, k, v, dropout_p=p, dropout_key=key)
    o2 = flash_attention(q, k, v, dropout_p=p, dropout_key=key)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = flash_attention(q, k, v, dropout_p=p, dropout_key=jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(o1, np.float32),
                           np.asarray(o3, np.float32), atol=1e-3)
    # empirical keep rate of the mask itself
    keep = keep_mask_oracle((int(jax.random.bits(key, (1,), jnp.uint32)[0]
                                 .astype(jnp.int32)), 0), p, S, S, H)
    rate = float(np.mean(np.asarray(keep)))
    assert abs(rate - (1 - p)) < 0.02, rate


@pytest.mark.parametrize("layout", ["basic", "zigzag", "stripe"])
def test_ring_dropout_matches_single_device(rng, layout):
    """Ring dropout == single-device dropout with the same seed: the mask is
    a pure function of (seed, global positions), so sharding must not change
    the pattern."""
    q, k, v = make_qkv(rng)
    p = 0.3
    seed = jnp.asarray((9999, 0), jnp.int32)
    ref = flash_attention(q, k, v, causal=True, dropout_p=p,
                          dropout_seed=seed)
    mesh = Mesh(np.array(jax.devices()[:RING]), axis_names=("ring",))
    qp, kp, vp = (permute_for_layout(x, layout, RING) for x in (q, k, v))
    fn = functools.partial(ring_attention_local, axis_name="ring",
                           layout=layout, causal=True, dropout_p=p,
                           dropout_seed=seed)
    spec = P(None, "ring", None, None)
    out = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * 3,
                                out_specs=spec, check_vma=False))(qp, kp, vp)
    out = unpermute_from_layout(out, layout, RING)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


def test_usp_dropout_layer_matches_single_device(rng):
    """2x2 USP dropout: rank-seeded global head bases reproduce the
    single-device pattern (head base 0 + global head index)."""
    q, k, v = make_qkv(rng)
    p = 0.3
    key = jax.random.PRNGKey(11)
    bits = jax.random.bits(key, (1,), jnp.uint32).astype(jnp.int32)
    seed = jnp.concatenate([bits, jnp.zeros((1,), jnp.int32)])
    ref = flash_attention(q, k, v, causal=True, dropout_p=p,
                          dropout_seed=seed)
    mesh = make_usp_mesh(ulysses=2, ring=2, devices=jax.devices()[:4])
    layer = LongContextAttention(mesh=mesh, layout="zigzag")
    qp = permute_for_layout(q, "zigzag", 2)
    kp = permute_for_layout(k, "zigzag", 2)
    vp = permute_for_layout(v, "zigzag", 2)
    out = layer(qp, kp, vp, causal=True, dropout_p=p, dropout_key=key)
    out = unpermute_from_layout(out, "zigzag", 2)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)


def test_ring_dropout_grads_run_and_deterministic(rng):
    q, k, v = make_qkv(rng)
    p = 0.2
    seed = jnp.asarray((42, 0), jnp.int32)
    mesh = Mesh(np.array(jax.devices()[:RING]), axis_names=("ring",))
    qp, kp, vp = (permute_for_layout(x, "zigzag", RING) for x in (q, k, v))
    fn = functools.partial(ring_attention_local, axis_name="ring",
                           layout="zigzag", causal=True, dropout_p=p,
                           dropout_seed=seed)
    spec = P(None, "ring", None, None)

    def loss(q, k, v):
        out = jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * 3,
                            out_specs=spec, check_vma=False)(q, k, v)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g1 = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qp, kp, vp)
    g2 = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qp, kp, vp)
    for a, b in zip(g1, g2):
        assert np.all(np.isfinite(np.asarray(a, np.float32)))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flash_dropout_with_window(rng):
    """Dropout x sliding window through the positions kernel (which BANDS
    its kv grid for windows, r4): the dropout mask is keyed by global
    positions, so banding cannot change which bits each (q, kv) pair draws.
    vs the explicit-mask oracle with the window folded into visibility."""
    q, k, v = make_qkv(rng)
    p, w = 0.3, 96
    seed = (4242, 0)
    out = flash_attention(q, k, v, causal=True, window_size=(w, -1),
                          dropout_p=p, dropout_seed=jnp.asarray(seed, jnp.int32))

    keep = keep_mask_oracle(seed, p, S, S, H)
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    g = q.shape[2] // k.shape[2]
    kf = jnp.repeat(kf, g, axis=2)
    vf = jnp.repeat(vf, g, axis=2)
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bthd,bshd->bhts", qf * scale, kf)
    rows = np.arange(S)[:, None]
    cols = np.arange(S)[None, :]
    vis = (cols <= rows) & (cols >= rows - w)
    s = jnp.where(jnp.asarray(vis)[None, None], s, -jnp.inf)
    pm = jax.nn.softmax(s, axis=-1)
    pm = jnp.where(keep, pm, 0.0) / (1.0 - p)
    ref = jnp.einsum("bhts,bshd->bthd", pm, vf)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **TOL)
