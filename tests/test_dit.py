"""DiT model family: non-causal USP attention diffusion blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from long_context_attention_tpu.models.dit import (
    DiTConfig,
    init_dit_params,
    make_dit_forward,
    make_dit_train_step,
)
from long_context_attention_tpu.parallel import make_usp_mesh

CFG = DiTConfig(in_dim=8, dim=64, n_layers=2, n_heads=4, head_dim=16,
                ffn_hidden=128)
B, N = 2, 128


def data(rng):
    x = jnp.asarray(rng.normal(size=(B, N, CFG.in_dim)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(B, N, CFG.in_dim)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 1000, size=(B,)), jnp.int32)
    return x, noise, t


def test_sharded_dit_matches_single_device(rng):
    params = init_dit_params(jax.random.PRNGKey(0), CFG)
    x, _, t = data(rng)
    ref = make_dit_forward(CFG, make_usp_mesh(1, 1, 1))(params, x, t)
    out = make_dit_forward(CFG, make_usp_mesh(dp=1, ulysses=2, ring=4))(params, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-1, rtol=0)
    assert not bool(jnp.any(jnp.isnan(out)))


def test_dit_training_matches_single_device(rng):
    opt = optax.adam(1e-3)
    x, noise, t = data(rng)

    def run(dp, u, r):
        params = init_dit_params(jax.random.PRNGKey(0), CFG)
        opt_state = opt.init(params)
        step = make_dit_train_step(CFG, make_usp_mesh(dp=dp, ulysses=u, ring=r), opt)
        losses = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, x, noise, t)
            losses.append(float(loss))
        return losses

    ref = run(1, 1, 1)
    usp = run(2, 2, 2)
    np.testing.assert_allclose(usp, ref, atol=5e-3, rtol=0)
    assert usp[-1] < usp[0]
