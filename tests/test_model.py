"""Flagship Llama-style model with USP attention, on the 8-device CPU mesh.

The key invariant (the reference's loss-curve check, `README.md:157-166`,
USP loss == DP loss): the sharded model must produce the same logits and the
same training trajectory as a single-device run of identical parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from long_context_attention_tpu.models.llama import (
    ModelConfig,
    init_params,
    make_forward,
    make_train_step,
)
from long_context_attention_tpu.parallel import (
    make_usp_mesh,
    permute_for_layout,
    unpermute_from_layout,
)

CFG = ModelConfig(vocab=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                  head_dim=32, ffn_hidden=128, layout="zigzag", attn_impl="pallas")
B, S = 2, 128


def data(rng):
    tokens = jnp.asarray(rng.integers(0, CFG.vocab, size=(B, S)), jnp.int32)
    labels = jnp.roll(tokens, -1, axis=1)
    mask = jnp.ones((B, S), jnp.int32).at[:, -1].set(0)
    return tokens, labels, mask


@pytest.mark.parametrize("degrees", [(1, 2, 4), (2, 2, 2)])
def test_sharded_forward_matches_single_device(rng, degrees):
    dp, ulysses, ring = degrees
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens, _, _ = data(rng)

    mesh1 = make_usp_mesh(dp=1, ulysses=1, ring=1)
    ref = make_forward(CFG, mesh1)(params, tokens)

    mesh = make_usp_mesh(dp=dp, ulysses=ulysses, ring=ring)
    tp = permute_for_layout(tokens, CFG.layout, ring, axis=1)
    out = make_forward(CFG, mesh)(params, tp)
    out = unpermute_from_layout(out, CFG.layout, ring, axis=1)

    # bf16 activations: reduction-order noise across layers, gate at 1e-1
    # like the reference end-to-end tolerance (`test/test_hybrid_attn.py:386`)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-1, rtol=0)


def test_usp_training_matches_single_device(rng):
    """3 train steps sharded (1,2,4) == 3 train steps on one device — the
    loss-curve-parity gate, as an exact trajectory check."""
    opt = optax.adam(1e-2)
    tokens, labels, mask = data(rng)

    def run(dp, ulysses, ring):
        params = init_params(jax.random.PRNGKey(0), CFG)
        opt_state = opt.init(params)
        mesh = make_usp_mesh(dp=dp, ulysses=ulysses, ring=ring)
        step = make_train_step(CFG, mesh, opt)
        tp, lp, mp = (permute_for_layout(x, CFG.layout, ring, axis=1)
                      for x in (tokens, labels, mask))
        losses = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, tp, lp, mp)
            losses.append(float(loss))
        return losses

    ref = run(1, 1, 1)
    usp = run(1, 2, 4)
    np.testing.assert_allclose(usp, ref, atol=5e-3, rtol=0)
    assert usp[-1] < usp[0], "loss should decrease"


def test_training_loss_decreases_dp(rng):
    opt = optax.adam(1e-2)
    tokens, labels, mask = data(rng)
    params = init_params(jax.random.PRNGKey(1), CFG)
    opt_state = opt.init(params)
    mesh = make_usp_mesh(dp=2, ulysses=2, ring=2)
    step = make_train_step(CFG, mesh, opt)
    tp, lp, mp = (permute_for_layout(x, CFG.layout, 2, axis=1)
                  for x in (tokens, labels, mask))
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, tp, lp, mp)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
