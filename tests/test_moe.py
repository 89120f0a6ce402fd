"""Expert parallelism: Switch-style MoE with experts sharded over ep.

The reference has no EP at all; gate: ep-sharded output == unsharded output
(routing is deterministic, dispatch is dense algebra)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from long_context_attention_tpu.parallel.moe import (
    MoEConfig,
    init_moe_params,
    moe_mlp_local,
    moe_param_specs,
)

CFG = MoEConfig(dim=64, ffn_hidden=128, n_experts=8, capacity_factor=2.0)
B, S = 2, 64


@pytest.fixture()
def setup(rng):
    params = init_moe_params(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(rng.normal(size=(B, S, CFG.dim)), jnp.bfloat16)
    return params, x


def test_ep_matches_unsharded(setup):
    params, x = setup
    # jitted reference: eager-vs-jit bf16 rounding can flip router argmax
    # near-ties, which is not what this test gates
    ref = jax.jit(lambda p, xx: moe_mlp_local(p, xx, CFG))(params, x)
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("ep",))
    fn = functools.partial(moe_mlp_local, cfg=CFG, ep_axis="ep")
    out = jax.jit(jax.shard_map(
        lambda p, x: fn(p, x),
        mesh=mesh, in_specs=(moe_param_specs("ep"), P()),
        out_specs=P(), check_vma=False,
    ))(params, x)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=0)


def test_ep_grads_match_unsharded(rng):
    """Realistic EP semantics: tokens sharded over ep (each rank holds its
    own batch rows); expert-shard grads accumulate cross-rank cotangents via
    the a2a transpose, the replicated router grad psums over ep. Capacity is
    per-rank, so a generous factor keeps drop sets identical to the
    unsharded run."""
    cfg = MoEConfig(dim=64, ffn_hidden=128, n_experts=8, capacity_factor=8.0)
    params = init_moe_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(size=(4, S, cfg.dim)), jnp.bfloat16)
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("ep",))
    specs = moe_param_specs("ep")

    def sharded_loss(params, x):
        def lg(p, xx):
            def lf(pp):
                y = moe_mlp_local(pp, xx, cfg, ep_axis="ep")
                return jnp.sum(y.astype(jnp.float32) ** 2)
            loss, g = jax.value_and_grad(lf)(p)
            from jax import lax
            g = {**g, "router": lax.psum(g["router"], "ep")}
            return lax.psum(loss, "ep"), g
        return jax.jit(jax.shard_map(
            lg, mesh=mesh, in_specs=(specs, P("ep")), out_specs=(P(), specs),
            check_vma=False))(params, x)

    def ref_loss(p):
        # per-row MoE (capacity per row matches the per-rank capacity)
        y = jax.vmap(lambda xr: moe_mlp_local(p, xr[None], cfg)[0])(x)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    sl, g = sharded_loss(params, x)
    rl, r = jax.jit(jax.value_and_grad(ref_loss))(params)
    np.testing.assert_allclose(float(sl), float(rl), rtol=1e-3)
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(g)[0],
                            jax.tree.leaves(r)):
        an, bn = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = np.max(np.abs(bn)) + 1e-6
        # 0.1: router-argmax near-ties can flip one token between fusion
        # variants, perturbing that token's gate-gradient row
        assert np.max(np.abs(an - bn)) / scale < 0.1, \
            (jax.tree_util.keystr(path), np.max(np.abs(an - bn)), scale)


def test_moe_capacity_drops_no_nan(rng):
    """Tiny capacity: overflowing tokens drop to zero output, no NaN."""
    cfg = MoEConfig(dim=32, ffn_hidden=64, n_experts=4, capacity_factor=0.25)
    params = init_moe_params(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.normal(size=(1, 32, 32)), jnp.bfloat16)
    y = moe_mlp_local(params, x, cfg)
    assert y.shape == x.shape
    assert not bool(jnp.any(jnp.isnan(y)))


def test_ep_tokens_replicated_mode(setup):
    """Dedicated-ep-axis mode: activations replicated, each rank routes its
    1/ep token slice, outputs all_gather back — matches unsharded exactly
    (per-slice capacity kept generous so drop sets align)."""
    cfg = MoEConfig(dim=64, ffn_hidden=128, n_experts=8, capacity_factor=8.0)
    params = init_moe_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, S, cfg.dim)), jnp.bfloat16)
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("ep",))
    out = jax.jit(jax.shard_map(
        lambda p, xx: moe_mlp_local(p, xx, cfg, ep_axis="ep",
                                    tokens_replicated=True),
        mesh=mesh, in_specs=(moe_param_specs("ep"), P()),
        out_specs=P(), check_vma=False))(params, x)
    ref = jax.jit(lambda p, xx: jax.vmap(
        lambda xr: moe_mlp_local(p, xr[None], cfg)[0])(xx))(params, x)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=0)
