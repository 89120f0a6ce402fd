"""Expert parallelism: Switch-style MoE MLP with experts sharded over ``ep``.

The reference has **no** EP at all (SURVEY.md: "EP: absent entirely"); this
completes the parallelism set (dp / pp / ring / ulysses / tp / ep) natively.

Design (classic capacity-based dispatch, TPU-friendly dense algebra — no
sorting, no ragged shapes):

* top-1 router over ``n_experts`` global experts; each (expert, rank) bucket
  holds up to ``capacity`` tokens — overflow drops (standard Switch).
* dispatch/combine are one-hot matmuls (MXU) + a single ``lax.all_to_all``
  over the ep axis each way: tokens travel to the rank that owns their
  expert, run its FFN, and return weighted by the router probability.
* the router is replicated; expert FFN weights shard their leading
  (expert) axis over ep — the same stacked-leading-axis trick as the
  pipeline's layer sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["MoEConfig", "init_moe_params", "moe_mlp_local"]


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    dim: int
    ffn_hidden: int
    n_experts: int
    capacity_factor: float = 1.25
    dtype: object = jnp.bfloat16


def init_moe_params(key: jax.Array, cfg: MoEConfig):
    kg, ku, kd = jax.random.split(key, 3)

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                / jnp.sqrt(fan_in)).astype(cfg.dtype)

    return {
        "router": dense(kg, cfg.dim, (cfg.dim, cfg.n_experts)),
        # stacked over the (global) expert axis; shard leading dim over ep
        "w_up": dense(ku, cfg.dim, (cfg.n_experts, cfg.dim, cfg.ffn_hidden)),
        "w_down": dense(kd, cfg.ffn_hidden,
                        (cfg.n_experts, cfg.ffn_hidden, cfg.dim)),
    }


def moe_param_specs(ep_axis: Optional[str]):
    from jax.sharding import PartitionSpec as P

    if ep_axis is None:
        return P()
    return {"router": P(),
            "w_up": P(ep_axis, None, None),
            "w_down": P(ep_axis, None, None)}


def moe_mlp_local(params, x: jnp.ndarray, cfg: MoEConfig, *,
                  ep_axis: Optional[str] = None,
                  tokens_replicated: bool = False) -> jnp.ndarray:
    """(b, s, dim) -> (b, s, dim) through top-1 routed experts.

    Inside shard_map when ``ep_axis`` is set: ``params["w_up"]/["w_down"]``
    arrive as this rank's (n_experts/ep, ...) shard. Two token conventions:

    * ``tokens_replicated=False`` (default): tokens are whatever this rank
      holds (ep composes with data/sequence sharding — routing is per-token).
    * ``tokens_replicated=True``: activations are replicated along ep (the
      dense-model-embedding case — ep is a dedicated axis): each rank slices
      its 1/ep of the tokens before routing and the outputs all_gather back,
      so every token is routed exactly once (correct gradients, ep-way
      routing/FFN speedup).
    """
    b, s, dim = x.shape
    E = cfg.n_experts
    ep = lax.axis_size(ep_axis) if ep_axis else 1
    e_loc = E // ep

    if tokens_replicated and ep > 1:
        assert (b * s) % ep == 0
        xf_all = x.reshape(ep, (b * s) // ep, dim)
        xf = lax.dynamic_index_in_dim(
            xf_all, lax.axis_index(ep_axis), axis=0, keepdims=False)
    else:
        xf = x.reshape(b * s, dim)
    T = xf.shape[0]
    cap = max(int(cfg.capacity_factor * T / E), 1)
    logits = (xf @ params["router"]).astype(jnp.float32)  # (T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)                   # (T,)
    gate = jnp.take_along_axis(probs, expert[:, None], axis=-1)[:, 0]

    # position of each token within its expert's bucket; >= cap drops
    onehot = jax.nn.one_hot(expert, E, dtype=jnp.int32)   # (T, E)
    pos = jnp.cumsum(onehot, axis=0) * onehot             # 1-based ranks
    slot = jnp.sum(pos, axis=-1) - 1                      # (T,) 0-based
    keep = slot < cap
    # dispatch tensor (E, cap, T) one-hot — dense MXU dispatch
    disp = (jax.nn.one_hot(expert, E, dtype=xf.dtype)[:, :, None]
            * jax.nn.one_hot(jnp.where(keep, slot, cap), cap + 1,
                             dtype=xf.dtype)[:, None, :cap])  # (T, E, cap)
    buckets = jnp.einsum("td,tec->ecd", xf, disp)         # (E, cap, dim)

    if ep_axis is not None and ep > 1:
        # (E, cap, dim) -> (e_loc, ep*cap, dim): each rank keeps its local
        # experts' buckets from every source rank (source-major on axis 1)
        buckets = lax.all_to_all(buckets, ep_axis, split_axis=0,
                                 concat_axis=1, tiled=True)

    h = jax.nn.gelu(jnp.einsum(
        "ecd,edf->ecf", buckets.astype(cfg.dtype), params["w_up"]
    ).astype(jnp.float32)).astype(cfg.dtype)
    out_b = jnp.einsum("ecf,efd->ecd", h, params["w_down"])  # (e_loc, *, dim)

    if ep_axis is not None and ep > 1:
        # (e_loc, ep*cap, dim) -> (E, cap, dim): piece j of axis 1 returns to
        # source rank j; owner-major on axis 0 = global expert order
        out_b = lax.all_to_all(out_b, ep_axis, split_axis=1,
                               concat_axis=0, tiled=True)

    combined = jnp.einsum("ecd,tec->td", out_b.astype(jnp.float32), disp)
    combined = combined * (gate * keep.astype(jnp.float32))[:, None]

    if tokens_replicated and ep > 1:
        combined = lax.all_gather(combined, ep_axis, axis=0, tiled=True)
    return combined.reshape(b, s, dim).astype(x.dtype)