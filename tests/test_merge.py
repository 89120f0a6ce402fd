"""Property tests for the online LSE merge (SURVEY.md §7 stage 2).

Splitting KV into blocks, attending each block separately, and merging must
reproduce full attention exactly (up to fp32 roundoff) — the invariant the
entire ring dimension rests on (`yunchang/ring/utils.py:10-51` analog).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from long_context_attention_tpu.ops.merge import init_merge_state, merge_attn_blocks
from long_context_attention_tpu.ops.reference import xla_attention


@pytest.mark.parametrize("n_blocks", [2, 4])
@pytest.mark.parametrize("causal", [False, True])
def test_blockwise_merge_equals_full(rng, n_blocks, causal):
    b, s, h, d = 2, 128, 3, 32
    q = rng.standard_normal((b, s, h, d), dtype=np.float32)
    k = rng.standard_normal((b, s, h, d), dtype=np.float32)
    v = rng.standard_normal((b, s, h, d), dtype=np.float32)
    qj, kj, vj = map(jnp.asarray, (q, k, v))

    full_out, full_lse = xla_attention(qj, kj, vj, causal=causal)

    acc, lse = init_merge_state(b, s, h, d)
    blk = s // n_blocks
    qpos = jnp.arange(s, dtype=jnp.int32)
    for i in range(n_blocks):
        bo, bl = xla_attention(
            qj, kj[:, i * blk:(i + 1) * blk], vj[:, i * blk:(i + 1) * blk],
            causal=causal, q_positions=qpos,
            kv_positions=jnp.arange(i * blk, (i + 1) * blk, dtype=jnp.int32),
        )
        acc, lse = merge_attn_blocks(acc, lse, bo, bl)

    np.testing.assert_allclose(np.asarray(acc), np.asarray(full_out), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(full_lse), atol=1e-5, rtol=1e-5)


def test_merge_out_of_order(rng):
    # merging blocks in any order gives the same result
    b, s, h, d = 1, 64, 2, 16
    q = rng.standard_normal((b, s, h, d), dtype=np.float32)
    k = rng.standard_normal((b, s, h, d), dtype=np.float32)
    v = rng.standard_normal((b, s, h, d), dtype=np.float32)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    qpos = jnp.arange(s, dtype=jnp.int32)
    blocks = []
    for i in range(4):
        blocks.append(xla_attention(
            qj, kj[:, i * 16:(i + 1) * 16], vj[:, i * 16:(i + 1) * 16],
            q_positions=qpos, kv_positions=jnp.arange(i * 16, (i + 1) * 16, dtype=jnp.int32),
        ))
    def reduce(order):
        acc, lse = init_merge_state(b, s, h, d)
        for i in order:
            acc, lse = merge_attn_blocks(acc, lse, *blocks[i])
        return acc, lse
    a1, l1 = reduce([0, 1, 2, 3])
    a2, l2 = reduce([3, 1, 0, 2])
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5, rtol=1e-5)


def test_merge_with_fully_masked_block(rng):
    # a block whose rows are all masked (lse = -inf) must be a no-op
    b, s, h, d = 1, 32, 2, 16
    out = jnp.asarray(rng.standard_normal((b, s, h, d), dtype=np.float32))
    lse = jnp.asarray(rng.standard_normal((b, h, s), dtype=np.float32))
    dead_out = jnp.zeros((b, s, h, d), jnp.float32)
    dead_lse = jnp.full((b, h, s), -jnp.inf, jnp.float32)
    m_out, m_lse = merge_attn_blocks(out, lse, dead_out, dead_lse)
    np.testing.assert_allclose(np.asarray(m_out), np.asarray(out), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_lse), np.asarray(lse), atol=1e-6)
    # merging into an empty accumulator just adopts the block
    acc, alse = init_merge_state(b, s, h, d)
    m_out, m_lse = merge_attn_blocks(acc, alse, out, lse)
    np.testing.assert_allclose(np.asarray(m_out), np.asarray(out), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_lse), np.asarray(lse), atol=1e-6)
    # two dead blocks stay dead (no NaNs)
    m_out, m_lse = merge_attn_blocks(acc, alse, dead_out, dead_lse)
    assert np.all(np.asarray(m_out) == 0.0)
    assert np.all(np.isneginf(np.asarray(m_lse)))
