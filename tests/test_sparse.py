"""Block-sparse attention vs the XLA oracle (dense bias from the tile mask).

The reference exposes sparse attention as the SPARSE_SAGE registry entry
(`yunchang/kernels/__init__.py:244-268`, caller-tuned SpargeAttn) with no
in-repo correctness tests; here every pattern is gated against the fp32
oracle by materializing the tile mask as a dense additive bias. Interpret
mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from long_context_attention_tpu.ops.reference import xla_attention
from long_context_attention_tpu.ops.sparse import (
    block_sparse_attention,
    block_sparse_attention_fwd,
    causal_block_mask,
    global_local_block_mask,
    mask_density,
    random_block_mask,
    sliding_window_block_mask,
    strided_block_mask,
)

BQ = BKV = 64


def make_qkv(rng, b=2, s=512, h=4, hkv=2, d=64, s_kv=None, dtype=np.float32):
    s_kv = s if s_kv is None else s_kv
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, s_kv, hkv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s_kv, hkv, d)), dtype)
    return q, k, v


def dense_bias(block_mask, s_q, s_kv, h):
    """Tile mask -> (h, s_q, s_kv) additive bias for the oracle."""
    m = np.asarray(block_mask, dtype=bool)
    if m.ndim == 2:
        m = np.broadcast_to(m[None], (h,) + m.shape)
    bq, bkv = s_q // m.shape[1], s_kv // m.shape[2]
    dense = np.repeat(np.repeat(m, bq, axis=1), bkv, axis=2)
    return jnp.asarray(np.where(dense, 0.0, -1e30), jnp.float32)[None]  # (1,h,s,s)


def oracle(q, k, v, block_mask, causal=False, softmax_scale=None):
    b, s_q, h, _ = q.shape
    s_kv = k.shape[1]
    return xla_attention(q, k, v, causal=causal, softmax_scale=softmax_scale,
                         bias=dense_bias(block_mask, s_q, s_kv, h))


@pytest.mark.parametrize("causal", [False, True])
def test_banded_matches_oracle(rng, causal):
    q, k, v = make_qkv(rng)
    n = q.shape[1] // BQ
    mask = sliding_window_block_mask(n, n, 2)
    out, lse = block_sparse_attention_fwd(q, k, v, mask, causal=causal,
                                          block_q=BQ, block_kv=BKV)
    ref_out, ref_lse = oracle(q, k, v, mask, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=2e-5, rtol=0)


def test_full_mask_equals_dense_attention(rng):
    """An all-ones mask must reproduce plain (causal) attention exactly."""
    q, k, v = make_qkv(rng, s=256)
    n = 256 // BQ
    mask = np.ones((n, n), dtype=bool)
    out = block_sparse_attention(q, k, v, mask, causal=True,
                                 block_q=BQ, block_kv=BKV)
    ref_out, _ = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5, rtol=0)


@pytest.mark.parametrize("builder", [
    lambda n: global_local_block_mask(n, n, 2, sink_tiles=1),
    lambda n: strided_block_mask(n, n, 3, local_tiles=1),
    lambda n: random_block_mask(n, n, 0.4, seed=7),
])
def test_patterns_match_oracle(rng, builder):
    q, k, v = make_qkv(rng)
    n = q.shape[1] // BQ
    mask = builder(n)
    out, lse = block_sparse_attention_fwd(q, k, v, mask, causal=True,
                                          block_q=BQ, block_kv=BKV)
    ref_out, ref_lse = oracle(q, k, v, mask, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=2e-5, rtol=0)


def test_per_head_masks(rng):
    """3-D masks: each query head gets its own live-tile pattern."""
    q, k, v = make_qkv(rng, h=4, hkv=2)
    n = q.shape[1] // BQ
    mask = random_block_mask(n, n, 0.5, seed=3, heads=4)
    out, lse = block_sparse_attention_fwd(q, k, v, mask, causal=True,
                                          block_q=BQ, block_kv=BKV)
    ref_out, ref_lse = oracle(q, k, v, mask, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=2e-5, rtol=0)
    # heads must actually differ: head 0's output under head 1's mask is off
    swapped = np.asarray(mask)[[1, 0, 2, 3]]
    out2 = block_sparse_attention(q, k, v, swapped, causal=True,
                                  block_q=BQ, block_kv=BKV)
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-2


def test_cross_attention_rectangular(rng):
    """s_q != s_kv (bottom-aligned causal, like the dense kernel)."""
    q, k, v = make_qkv(rng, s=256, s_kv=512)
    nq, nk = 256 // BQ, 512 // BKV
    mask = sliding_window_block_mask(nq, nk, 3)
    out, lse = block_sparse_attention_fwd(q, k, v, mask, causal=True,
                                          block_q=BQ, block_kv=BKV)
    ref_out, ref_lse = oracle(q, k, v, mask, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=2e-5, rtol=0)


def test_uncovered_rows_emit_merge_identity(rng):
    """Query rows with no live tile: out = 0, lse = -inf (ops/merge identity)."""
    q, k, v = make_qkv(rng, s=256)
    n = 256 // BQ
    mask = np.zeros((n, n), dtype=bool)
    mask[0, 0] = True  # only the first q tile attends anywhere
    out, lse = block_sparse_attention_fwd(q, k, v, mask, block_q=BQ, block_kv=BKV)
    out = np.asarray(out)
    lse = np.asarray(lse)
    assert np.all(out[:, BQ:] == 0.0)
    assert np.all(lse[:, :, BQ:] == -np.inf)
    assert np.all(np.isfinite(lse[:, :, :BQ]))
    # the covered tile matches the oracle
    ref_out, _ = xla_attention(q[:, :BQ], k[:, :BKV], v[:, :BKV])
    np.testing.assert_allclose(out[:, :BQ], np.asarray(ref_out), atol=2e-5, rtol=0)


def test_grads_match_oracle(rng):
    """The sparse backward (sparse dq + column-major dk/dv) vs oracle grads."""
    q, k, v = make_qkv(rng, b=1, s=256, h=4, hkv=2)
    n = 256 // BQ
    mask = global_local_block_mask(n, n, 2, sink_tiles=1)

    def loss_sparse(q, k, v):
        return jnp.sum(block_sparse_attention(
            q, k, v, mask, causal=True, block_q=BQ, block_kv=BKV) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(oracle(q, k, v, mask, causal=True)[0] ** 2)

    gs = jax.grad(loss_sparse, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=0)


def test_grads_per_head_gqa(rng):
    q, k, v = make_qkv(rng, b=1, s=256, h=4, hkv=2)
    n = 256 // BQ
    mask = random_block_mask(n, n, 0.5, seed=11, heads=4)

    def loss_sparse(q, k, v):
        return jnp.sum(block_sparse_attention(
            q, k, v, mask, causal=True, block_q=BQ, block_kv=BKV) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(oracle(q, k, v, mask, causal=True)[0] ** 2)

    gs = jax.grad(loss_sparse, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=0)


def test_bf16_inside_reference_gate(rng):
    q, k, v = make_qkv(rng, dtype=jnp.bfloat16)
    n = q.shape[1] // BQ
    mask = sliding_window_block_mask(n, n, 2)
    out = block_sparse_attention(q, k, v, mask, causal=True,
                                 block_q=BQ, block_kv=BKV)
    ref_out, _ = oracle(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), mask, causal=True)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref_out),
                               atol=1e-1, rtol=0)


def test_softmax_scale_honored(rng):
    q, k, v = make_qkv(rng, s=256)
    n = 256 // BQ
    mask = np.ones((n, n), dtype=bool)
    out = block_sparse_attention(q, k, v, mask, causal=True, softmax_scale=0.25,
                                 block_q=BQ, block_kv=BKV)
    ref_out, _ = xla_attention(q, k, v, causal=True, softmax_scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5, rtol=0)


def test_validation_errors(rng):
    q, k, v = make_qkv(rng, s=256)
    n = 256 // BQ
    with pytest.raises(ValueError, match="tile grid"):
        block_sparse_attention(q, k, v, np.ones((n + 1, n), bool),
                               block_q=BQ, block_kv=BKV)
    with pytest.raises(ValueError, match="per-head"):
        block_sparse_attention(q, k, v, np.ones((3, n, n), bool),
                               block_q=BQ, block_kv=BKV)
    with pytest.raises(ValueError, match="no live tiles"):
        block_sparse_attention(q, k, v, np.zeros((n, n), bool), causal=True,
                               block_q=BQ, block_kv=BKV)
    with pytest.raises(TypeError, match="static host array"):
        jax.jit(lambda m: block_sparse_attention(q, k, v, m,
                                                 block_q=BQ, block_kv=BKV))(
            jnp.ones((n, n), jnp.bool_))


def test_mask_density_reporting():
    n = 8
    assert mask_density(np.ones((n, n), bool)) == 1.0
    assert mask_density(np.ones((n, n), bool), causal=True) == pytest.approx(
        (n * (n + 1) / 2) / (n * n))
    band = sliding_window_block_mask(n, n, 1)
    assert mask_density(band) == pytest.approx(1 / n)


def test_ulysses_sparse_matches_single_device(rng):
    """Block-sparse under SP-Ulysses (8-dev CPU mesh): the a2a-sharded layer
    equals single-device sparse attention on the full tensors (the oracle
    pattern of SURVEY.md §4), and both match the dense-bias oracle."""
    from long_context_attention_tpu.parallel import UlyssesAttention, make_usp_mesh

    q, k, v = make_qkv(rng, b=2, s=512, h=8, hkv=4)
    n = 512 // BQ
    mask = global_local_block_mask(n, n, 2, sink_tiles=1)
    mesh = make_usp_mesh(dp=1, ulysses=4, ring=1)
    layer = UlyssesAttention(mesh=mesh)
    out = layer(q, k, v, causal=True, block_mask=mask,
                sparse_block_q=BQ, sparse_block_kv=BKV)
    single = block_sparse_attention(q, k, v, mask, causal=True,
                                    block_q=BQ, block_kv=BKV)
    np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                               atol=2e-5, rtol=0)
    ref_out, _ = oracle(q, k, v, mask, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5, rtol=0)


def test_ulysses_sparse_per_head_mask(rng):
    """Per-head (3-D) masks at ulysses degree 4 through the UlyssesAttention
    layer: each rank's contiguous head block uses its own rank-selected tile
    tables (was a rejected case before r4; the oracle-level check lives in
    test_ring_sparse.py::test_per_head_mask_under_ulysses)."""
    from long_context_attention_tpu.parallel import UlyssesAttention, make_usp_mesh

    q, k, v = make_qkv(rng, b=1, s=256, h=8, hkv=4)
    n = 256 // BQ
    mask = random_block_mask(n, n, 0.5, seed=5, heads=8)
    mask |= np.eye(n, dtype=bool)[None]
    mesh = make_usp_mesh(dp=1, ulysses=4, ring=1)
    layer = UlyssesAttention(mesh=mesh)
    out = layer(q, k, v, causal=True, block_mask=mask,
                sparse_block_q=BQ, sparse_block_kv=BKV)
    ref_out, _ = oracle(q, k, v, mask, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5, rtol=0)
