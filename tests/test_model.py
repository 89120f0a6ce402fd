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


TP_CFG = ModelConfig(vocab=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
                     head_dim=32, ffn_hidden=128, layout="zigzag",
                     attn_impl="pallas")  # MHA: (kv_heads/tp) % ulysses == 0


def test_tp_forward_matches_single_device(rng):
    """4-D parallelism: tp=2 x ulysses=2 x ring=2 forward == single device
    (the reference only delegates TP to Megatron; here it is native)."""
    params = init_params(jax.random.PRNGKey(0), TP_CFG)
    tokens, _, _ = data(rng)
    ref = make_forward(TP_CFG, make_usp_mesh(1, 1, 1))(params, tokens)
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=2, tp=2)
    assert mesh.axis_names == ("dp", "ring", "ulysses", "tp")
    tp = permute_for_layout(tokens, TP_CFG.layout, 2, axis=1)
    out = make_forward(TP_CFG, mesh)(params, tp)
    out = unpermute_from_layout(out, TP_CFG.layout, 2, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-1, rtol=0)


def test_tp_training_matches_single_device(rng):
    """Exact training-trajectory parity with tensor parallelism on."""
    opt = optax.adam(1e-2)
    tokens, labels, mask = data(rng)

    def run(dp, u, r, t):
        params = init_params(jax.random.PRNGKey(0), TP_CFG)
        opt_state = opt.init(params)
        mesh = make_usp_mesh(dp=dp, ulysses=u, ring=r, tp=t)
        step = make_train_step(TP_CFG, mesh, opt)
        ring = r
        tp_, lp_, mp_ = (permute_for_layout(x, TP_CFG.layout, ring, axis=1)
                         for x in (tokens, labels, mask))
        losses = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, tp_, lp_, mp_)
            losses.append(float(loss))
        return losses

    ref = run(1, 1, 1, 1)
    tp4d = run(1, 2, 2, 2)
    np.testing.assert_allclose(tp4d, ref, atol=5e-3, rtol=0)
    assert tp4d[-1] < tp4d[0]


def test_train_grads_not_scaled_by_world_size(rng):
    """Regression: psum's transpose under shard_map is psum, so a psum in the
    loss's gradient path scales every weight gradient by the axis-group size
    (Adam masks it; SGD would not). Gradients on the 8-way mesh must equal
    single-device gradients."""
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from long_context_attention_tpu.models.llama import loss_local, param_specs
    from long_context_attention_tpu.parallel.mesh import MeshAxes

    axes = MeshAxes()
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens, labels, mask = data(rng)

    def grads_for(mesh, ring):
        tok = P(axes.dp, axes.seq)

        def lg(p, t, l, m):
            def lf(pp):
                return loss_local(pp, t, l, m, CFG, ulysses_axis=axes.ulysses,
                                  ring_axis=axes.ring, dp_axis=axes.dp)
            _, g = jax.value_and_grad(lf)(p)
            return jax.tree.map(
                lambda x: lax.psum(x, (axes.dp, axes.ring, axes.ulysses)), g)

        f = jax.jit(jax.shard_map(lg, mesh=mesh, in_specs=(P(), tok, tok, tok),
                                  out_specs=P(), check_vma=False))
        tp_, lp_, mp_ = (permute_for_layout(x, CFG.layout, ring, axis=1)
                         for x in (tokens, labels, mask))
        return f(params, tp_, lp_, mp_)

    g1 = grads_for(make_usp_mesh(1, 1, 1), 1)
    g8 = grads_for(make_usp_mesh(dp=2, ulysses=2, ring=2), 2)
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(g1)[0],
                            jax.tree.leaves(g8)):
        an, bn = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = np.max(np.abs(an)) + 1e-9
        assert np.max(np.abs(an - bn)) / scale < 0.05, jax.tree_util.keystr(path)


def test_pp_training_matches_single_device(rng):
    """5-D parallelism: GPipe pp=2 x ring=2 x ulysses=2 training trajectory
    == single device (PP is exact; the reference only delegates PP)."""
    from long_context_attention_tpu.models.llama import make_pp_train_step

    opt = optax.adam(1e-2)
    tokens, labels, mask = data(rng)

    def run_ref():
        params = init_params(jax.random.PRNGKey(0), CFG)
        opt_state = opt.init(params)
        step = make_train_step(CFG, make_usp_mesh(1, 1, 1), opt)
        losses = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, tokens, labels,
                                           mask)
            losses.append(float(loss))
        return losses

    def run_pp():
        mesh = make_usp_mesh(dp=1, ulysses=2, ring=2, pp=2)
        assert mesh.axis_names == ("dp", "pp", "ring", "ulysses")
        params = init_params(jax.random.PRNGKey(0), CFG)
        opt_state = opt.init(params)
        step = make_pp_train_step(CFG, mesh, opt, n_micro=2)
        tp_, lp_, mp_ = (permute_for_layout(x, CFG.layout, 2, axis=1)
                         for x in (tokens, labels, mask))
        losses = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, tp_, lp_, mp_)
            losses.append(float(loss))
        return losses

    ref = run_ref()
    pp = run_pp()
    np.testing.assert_allclose(pp, ref, atol=5e-3, rtol=0)
    assert pp[-1] < pp[0]


def test_windowed_softcap_sharded_forward_matches_single_device(rng):
    """Sliding-window + softcap threaded through the ring: the USP-sharded
    forward of a Mistral-style config equals the single-device forward (the
    window straddles zigzag chunk boundaries, exercising the position-
    relative masking in the ring kernel)."""
    import dataclasses as dc

    wcfg = dc.replace(CFG, window_left=40, softcap=8.0)
    params = init_params(jax.random.PRNGKey(5), wcfg)
    tokens, _, _ = data(rng)

    ref = make_forward(wcfg, make_usp_mesh(1, 1, 1))(params, tokens)
    ring = 4
    mesh = make_usp_mesh(dp=1, ulysses=2, ring=ring)
    tp = permute_for_layout(tokens, wcfg.layout, ring, axis=1)
    out = make_forward(wcfg, mesh)(params, tp)
    out = unpermute_from_layout(out, wcfg.layout, ring, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-1, rtol=0)
