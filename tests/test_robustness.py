"""Robustness / shape-coverage matrix beyond the reference's fixed shapes.

The reference tests one shape family (bs=1, h=32, d=64, seq 1024 —
`test/test_hybrid_attn.py:136-139`); here the kernel and parallel layers are
swept over head dims, dtypes, uneven lengths, MHA-vs-GQA and cross-attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from long_context_attention_tpu.ops.flash import flash_attention
from long_context_attention_tpu.ops.reference import xla_attention
from long_context_attention_tpu.ops.registry import get_attn_impl

TOL = dict(atol=1e-1, rtol=0)


def check(out, ref, **tol):
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **(tol or TOL))


@pytest.mark.parametrize("d", [64, 128, 256])
def test_flash_head_dims(rng, d):
    q = jnp.asarray(rng.normal(size=(1, 256, 4, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 256, 2, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 256, 2, d)), jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref)


def test_flash_fp32_inputs(rng):
    q = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.float32)
    out = flash_attention(q, k, v, causal=True)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref, atol=1e-3, rtol=0)
    # grads too
    g = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v, causal=True)))(q)
    r = jax.grad(lambda q: jnp.sum(xla_attention(q, k, v, causal=True)[0]))(q)
    check(g, r, atol=1e-2, rtol=0)


def test_flash_non_pow2_seq(rng):
    """seq 384: block sizes must down-fit to a divisor."""
    q = jnp.asarray(rng.normal(size=(1, 384, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 384, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 384, 2, 64)), jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref)


def test_flash_cross_attention_bottom_right_causal(rng):
    """s_q != s_kv: causal aligns bottom-right (flash-attn semantics,
    `test/test_utils.py:8`); both impls must agree."""
    q = jnp.asarray(rng.normal(size=(1, 128, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref)
    # the last q row attends to all kv; the first to s_kv - s_q + 1
    out2 = flash_attention(q, k, v, causal=False)
    ref2, _ = xla_attention(q, k, v, causal=False)
    check(out2, ref2)


def test_flash_window_plus_segments(rng):
    """Sliding window combined with packed segments."""
    S = 256
    q = jnp.asarray(rng.normal(size=(1, S, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, S, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, S, 2, 64)), jnp.bfloat16)
    seg = jnp.asarray(np.repeat([0, 1], S // 2)[None], jnp.int32)
    kw = dict(causal=True, window_size=(32, 0),
              q_segment_ids=seg, kv_segment_ids=seg)
    out = flash_attention(q, k, v, **kw)
    ref, _ = xla_attention(q, k, v, **kw)
    check(out, ref)


def test_flash_mqa(rng):
    """MQA: 1 kv head shared by all query heads."""
    q = jnp.asarray(rng.normal(size=(2, 256, 8, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 256, 1, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, 256, 1, 64)), jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True)
    ref, _ = xla_attention(q, k, v, causal=True)
    check(out, ref)
    g = jax.grad(lambda k: jnp.sum(flash_attention(q, k, v, causal=True)
                                   .astype(jnp.float32)))(k)
    r = jax.grad(lambda k: jnp.sum(xla_attention(q, k, v, causal=True)[0]
                                   .astype(jnp.float32)))(k)
    check(g, r)


def test_registry_unknown_impl():
    with pytest.raises(ValueError, match="unknown attention impl"):
        get_attn_impl("cuda")


def test_registry_custom_impl_roundtrip():
    from long_context_attention_tpu.ops.registry import (
        ATTN_IMPLS, AttnImpl, register_attn_impl)

    marker = AttnImpl("test_marker", None, None, None)
    register_attn_impl(marker)
    try:
        assert get_attn_impl("test_marker") is marker
    finally:
        del ATTN_IMPLS["test_marker"]


def test_blocksizes_validation():
    from long_context_attention_tpu.utils.config import BlockSizes

    bs = BlockSizes(block_q=512, block_kv=512).clamp(384, 384)
    assert 384 % bs.block_q == 0 and 384 % bs.block_kv == 0


def test_ring_mha_equal_heads(rng, devices8):
    """MHA through the ring (h == h_kv)."""
    import functools
    from jax.sharding import Mesh, PartitionSpec as P
    from long_context_attention_tpu.parallel import ring_attention_local

    q = jnp.asarray(rng.normal(size=(1, 256, 4, 64)), jnp.bfloat16)
    mesh = Mesh(np.array(devices8[:4]), axis_names=("ring",))
    fn = functools.partial(ring_attention_local, axis_name="ring",
                           layout="basic", causal=True)
    spec = P(None, "ring", None, None)
    out = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * 3,
                                out_specs=spec, check_vma=False))(q, q, q)
    ref, _ = xla_attention(q, q, q, causal=True)
    check(out, ref)
