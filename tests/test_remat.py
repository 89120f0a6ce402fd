"""Gradient rematerialization (ModelConfig.remat) must not change training
math — only the activation-memory/FLOPs tradeoff. One USP train step with
remat in {none, full, dots} from identical states must produce the same loss
and parameters (fp32 CPU mesh: recompute is exact)."""

import dataclasses

import jax
import numpy as np
import optax
import pytest

from long_context_attention_tpu.models.llama import (
    ModelConfig,
    init_params,
    make_train_step,
)
from long_context_attention_tpu.parallel import make_usp_mesh

CFG = ModelConfig(vocab=64, dim=32, n_layers=3, n_heads=4, n_kv_heads=2,
                  head_dim=8, ffn_hidden=64, layout="zigzag")


def _data(key, b=2, s=64):
    tok = jax.random.randint(key, (b, s), 0, CFG.vocab)
    lab = jax.random.randint(jax.random.fold_in(key, 1), (b, s), 0, CFG.vocab)
    msk = jax.numpy.ones((b, s), jax.numpy.float32)
    return tok, lab, msk


@pytest.mark.parametrize("policy", ["full", "attn", "dots"])
def test_remat_trajectory_matches_baseline(policy):
    mesh = make_usp_mesh(dp=2, ulysses=2, ring=2)
    opt = optax.adamw(1e-3)
    tok, lab, msk = _data(jax.random.PRNGKey(3))

    results = {}
    for remat in ("none", policy):
        cfg = dataclasses.replace(CFG, remat=remat)
        params = init_params(jax.random.PRNGKey(0), cfg)
        state = opt.init(params)
        step = make_train_step(cfg, mesh, opt)
        # one step: bf16 param storage flips isolated ulps under recompute
        # rounding, which a second step amplifies chaotically
        params, state, loss = step(params, state, tok, lab, msk)
        results[remat] = (params, float(loss))

    p0, l0 = results["none"]
    p1, l1 = results[policy]
    # the fast softmax's q scale-fold (fp32 multiply -> bf16 cast) lands in
    # different XLA fusion contexts under remat vs none, flipping isolated
    # bf16 ulps in the forward (r4; was 1e-5 when both programs fused
    # identically) — remat bugs show up as O(1e-2)+ loss drift
    assert abs(l0 - l1) < 2e-4, (l0, l1)
    # params are stored bf16: recompute-order rounding (~1e-7 on the grads)
    # can flip isolated values by one bf16 ulp — gate at one-ulp tolerance
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=4e-3, rtol=0)


def test_remat_invalid_policy_raises():
    cfg = dataclasses.replace(CFG, remat="bogus")
    mesh = make_usp_mesh(dp=1, ulysses=1, ring=2)
    step = make_train_step(cfg, mesh, optax.sgd(1e-2))
    params = init_params(jax.random.PRNGKey(0), cfg)
    tok, lab, msk = _data(jax.random.PRNGKey(5))
    with pytest.raises(ValueError, match="remat"):
        step(params, optax.sgd(1e-2).init(params), tok, lab, msk)
