"""Utility-layer tests: checkpointing, profiling helpers, observability."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from long_context_attention_tpu.models.llama import ModelConfig, init_params
from long_context_attention_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from long_context_attention_tpu.utils.logging import diff_stats, log_diff
from long_context_attention_tpu.utils.profiling import achieved_tflops, timed

CFG = ModelConfig(vocab=32, dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
                  head_dim=16, ffn_hidden=64)


def test_checkpoint_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(0), CFG)
    opt = optax.adam(1e-3)
    state = {"params": params, "opt_state": opt.init(params), "step": jnp.int32(7)}
    p = save_checkpoint(str(tmp_path / "ckpt"), state, step=7)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), state, step=7)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                            np.asarray(b)),
                 state, restored)
    assert latest_step(str(tmp_path / "ckpt")) == 7


def test_kv_cache_checkpoint(tmp_path):
    from long_context_attention_tpu.ops.kv_cache import KVCache
    cache = KVCache.init(1, 2, 32, 2, 16, dtype="int8").advance(5)
    p = save_checkpoint(str(tmp_path / "cache"), cache)
    back = restore_checkpoint(str(tmp_path / "cache"), cache)
    assert back.length.tolist() == [5, 5]
    np.testing.assert_array_equal(np.asarray(back.k), np.asarray(cache.k))


def test_timed_and_roofline():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((128, 128), jnp.float32)
    secs, _ = timed(f, x, iters=2)
    assert secs > 0
    tf, frac = achieved_tflops(2 * 128**3, secs)
    assert tf > 0 and frac > 0


def test_diff_stats(capsys):
    a = jnp.ones((4, 4))
    b = jnp.ones((4, 4)) * 1.5
    s = log_diff("t", a, b)
    assert abs(s["max_abs_diff"] - 0.5) < 1e-6
    assert s["shape"] == (4, 4)
