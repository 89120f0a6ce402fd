"""DiT-family model: non-causal USP attention for diffusion transformers.

The reference's second host-framework family is xDiT diffusion serving
(`README.md:220-229`; the non-causal benchmark path `scripts/run_dit.sh`,
`benchmark_longctx.py --no_causal`). Here the DiT block ships in-repo: a
patchified-latent transformer with adaLN-zero timestep conditioning whose
attention is bidirectional ``usp_attention_local`` — long "sequences" are
image/video token grids sharded over the same (ring, ulysses) axes.

Functional pytree params like models/llama.py; basic layout (non-causal work
is inherently balanced, so no zigzag is needed — matching the reference's
DiT guidance).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from long_context_attention_tpu.models.llama import rmsnorm
from long_context_attention_tpu.parallel.mesh import MeshAxes
from long_context_attention_tpu.parallel.usp import usp_attention_local
from long_context_attention_tpu.utils.config import BlockSizes

__all__ = ["DiTConfig", "init_dit_params", "dit_forward_local",
           "make_dit_forward", "make_dit_train_step"]

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    in_dim: int = 16           # patchified latent channels
    dim: int = 128
    n_layers: int = 2
    n_heads: int = 4
    head_dim: int = 32
    ffn_hidden: int = 256
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    attn_impl: str = "pallas"
    block_sizes: Optional[BlockSizes] = None

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.head_dim


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal (b,) -> (b, dim) fp32 (standard DiT embedding)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def init_dit_params(key: jax.Array, cfg: DiTConfig) -> Params:
    ks = jax.random.split(key, 4)

    def dense(k, fan_in, shape, zero=False):
        if zero:
            return jnp.zeros(shape, cfg.dtype)
        return (jax.random.normal(k, shape, jnp.float32)
                / jnp.sqrt(fan_in)).astype(cfg.dtype)

    def layer(k):
        kk = jax.random.split(k, 6)
        return {
            "wqkv": dense(kk[0], cfg.dim, (cfg.dim, 3 * cfg.q_dim)),
            "wo": dense(kk[1], cfg.q_dim, (cfg.q_dim, cfg.dim)),
            "w_up": dense(kk[2], cfg.dim, (cfg.dim, cfg.ffn_hidden)),
            "w_down": dense(kk[3], cfg.ffn_hidden, (cfg.ffn_hidden, cfg.dim)),
            # adaLN-zero: 6 modulation vectors from the conditioning embed,
            # zero-init so blocks start as identity (DiT recipe)
            "mod": dense(kk[4], cfg.dim, (cfg.dim, 6 * cfg.dim), zero=True),
        }

    layers = jax.vmap(layer)(jax.random.split(ks[0], cfg.n_layers))
    return {
        "patch_in": dense(ks[1], cfg.in_dim, (cfg.in_dim, cfg.dim)),
        "t_mlp1": dense(ks[2], cfg.dim, (cfg.dim, cfg.dim)),
        "t_mlp2": dense(ks[3], cfg.dim, (cfg.dim, cfg.dim)),
        "layers": layers,
        "out": jnp.zeros((cfg.dim, cfg.in_dim), cfg.dtype),  # zero-init head
    }


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None]) + shift[:, None]


def dit_forward_local(params: Params, x: jnp.ndarray, t: jnp.ndarray,
                      cfg: DiTConfig, *, ulysses_axis: str, ring_axis: str,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """x (b, n_local, in_dim) latents, t (b,) timesteps -> (b, n_local, in_dim).

    Call inside shard_map; tokens sharded over (ring, ulysses), basic layout.
    """
    b, n, _ = x.shape
    c = timestep_embedding(t, cfg.dim)
    c = jax.nn.silu(c @ params["t_mlp1"].astype(jnp.float32))
    c = jax.nn.silu(c @ params["t_mlp2"].astype(jnp.float32))  # (b, dim) fp32

    h = (x.astype(cfg.dtype) @ params["patch_in"])

    def body(h, lp):
        mod = (c @ lp["mod"].astype(jnp.float32)).astype(h.dtype)
        (sh_a, sc_a, gate_a, sh_m, sc_m, gate_m) = jnp.split(mod, 6, axis=-1)
        a = _modulate(rmsnorm(h, jnp.ones((cfg.dim,), jnp.float32),
                              cfg.norm_eps), sh_a, sc_a)
        qkv = (a @ lp["wqkv"]).reshape(b, n, 3, cfg.n_heads, cfg.head_dim)
        attn = usp_attention_local(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
            ulysses_axis=ulysses_axis, ring_axis=ring_axis, layout="basic",
            causal=False, impl=cfg.attn_impl, block_sizes=cfg.block_sizes,
            interpret=interpret,
        )
        h = h + gate_a[:, None] * (attn.reshape(b, n, cfg.q_dim) @ lp["wo"])
        m = _modulate(rmsnorm(h, jnp.ones((cfg.dim,), jnp.float32),
                              cfg.norm_eps), sh_m, sc_m)
        m = jax.nn.gelu((m @ lp["w_up"]).astype(jnp.float32)).astype(h.dtype)
        h = h + gate_m[:, None] * (m @ lp["w_down"])
        return h, None

    h, _ = lax.scan(body, h, params["layers"])
    h = rmsnorm(h, jnp.ones((cfg.dim,), jnp.float32), cfg.norm_eps)
    return (h @ params["out"]).astype(jnp.float32)


def make_dit_forward(cfg: DiTConfig, mesh: Mesh, axes: MeshAxes = MeshAxes(),
                     *, interpret: Optional[bool] = None):
    """Jitted global forward over (b, n, in_dim) latents sharded dp x seq."""
    x_spec = P(axes.dp, axes.seq, None)

    def fwd(params, x, t):
        return dit_forward_local(params, x, t, cfg, ulysses_axis=axes.ulysses,
                                 ring_axis=axes.ring, interpret=interpret)

    return jax.jit(jax.shard_map(
        fwd, mesh=mesh, in_specs=(P(), x_spec, P(axes.dp)),
        out_specs=x_spec, check_vma=False))


def make_dit_train_step(cfg: DiTConfig, mesh: Mesh, optimizer,
                        axes: MeshAxes = MeshAxes(), *,
                        interpret: Optional[bool] = None):
    """Denoising MSE train step (predict the noise added to latents)."""
    x_spec = P(axes.dp, axes.seq, None)
    all_axes = (axes.dp, axes.ring, axes.ulysses)

    def local_step(params, opt_state, noisy, noise, t):
        def lf(p):
            pred = dit_forward_local(p, noisy, t, cfg,
                                     ulysses_axis=axes.ulysses,
                                     ring_axis=axes.ring, interpret=interpret)
            se = jnp.sum((pred - noise.astype(jnp.float32)) ** 2)
            # numerator stays LOCAL (psum transposes to psum and would scale
            # every gradient by the axis-group size — see models/llama.py);
            # only the param-independent count reduces here.
            cnt = lax.psum(jnp.float32(noise.size), all_axes)
            return se / cnt

        loss, grads = jax.value_and_grad(lf)(params)
        loss = lax.psum(loss, all_axes)  # reporting only (post-grad)
        grads = jax.tree.map(lambda g: lax.psum(g, all_axes), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype),
                              params, updates)
        return params, opt_state, loss

    return jax.jit(jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), x_spec, x_spec, P(axes.dp)),
        out_specs=(P(), P(), P()),
        check_vma=False), donate_argnums=(0, 1))
