"""Flagship model: Llama-style GQA decoder trained with USP attention.

The reference ships no model — it patches USP into Megatron's transformer
(`patches/Megatron-DeepSpeed.patch`, swapping ``DistributedAttention`` for
``LongContextAttention``). Here the host framework is part of the package: a
functional, pytree-parameter Llama-family decoder whose attention is
``usp_attention_local`` and whose activations are sequence-sharded end to end
(embeddings, norms, MLP are token-local, so only attention communicates).

TPU-first design notes:

* Everything runs inside one ``shard_map`` over the (dp, ring, ulysses) mesh;
  weights are replicated (DP gradient sync = the psum shard_map inserts when
  transposing the broadcast; ZeRO-style optimizer sharding is the optimizer's
  business, as in the reference's DeepSpeed delegation `README.md:210`).
* RoPE needs *global* token positions, which under zigzag/stripe layouts are
  not ``arange``: they come from the same position descriptor that drives the
  kernel masking (parallel/layouts.py) sliced to this device's ulysses
  sub-chunk. One mechanism, two consumers.
* bf16 params/activations, fp32 RMSNorm accumulation and logits.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from long_context_attention_tpu.parallel.layouts import (
    position_descriptor,
    positions_from_descriptor,
)
from long_context_attention_tpu.ops.wquant import qdot
from long_context_attention_tpu.parallel.mesh import MeshAxes
from long_context_attention_tpu.parallel.usp import usp_attention_local
from long_context_attention_tpu.utils.config import BlockSizes

__all__ = ["ModelConfig", "init_params", "forward_local", "make_forward",
           "make_train_step", "local_positions", "param_specs", "moe_cfg"]

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Llama-family hyperparameters (defaults: a tiny test model)."""

    vocab: int = 256
    dim: int = 128
    n_layers: int = 2
    n_heads: int = 4
    n_kv_heads: int = 2
    head_dim: int = 32
    ffn_hidden: int = 256
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    # attention shape: Mistral-style sliding window (tokens attend to the
    # last window_left positions; -1 = full causal) and Gemma-style logit
    # softcapping (0 = off). Threaded through training (ring/USP kernels)
    # AND serving (prefill + decode kernels) so windowed models serve.
    window_left: int = -1
    softcap: float = 0.0
    # StreamingLLM attention sinks (arXiv:2309.17453): with a sliding
    # window, tokens at absolute positions < sink_tokens stay visible —
    # honored by training, prefill AND decode kernels (including the
    # sequence-sharded decode: each rank keeps its slice of the sink
    # prefix via per-rank sink_cols, serving/sharded.py) so windowed+sink
    # models train and serve with identical attention semantics. No effect
    # without a window.
    sink_tokens: int = 0
    # parallelism
    layout: str = "zigzag"
    attn_impl: str = "pallas"
    block_sizes: Optional[BlockSizes] = None
    # Mixture-of-Experts FFN (Switch-style top-1, parallel/moe.py). When
    # ``n_experts > 0`` every layer's dense FFN is replaced by a routed MoE
    # FFN; the ep mesh axis (make_usp_mesh(ep=...)) shards the expert weights
    # and the dispatch all_to_all. 0 = dense model (the default).
    n_experts: int = 0
    moe_capacity_factor: float = 2.0
    # Restore the online running-max softmax in every PALLAS attention
    # kernel (training forward, prefill, decode — single-chip and sharded;
    # the xla oracle computes the exact softmax either way, and
    # attn_impl="sage" raises rather than silently ignore it). The
    # default max-free clamped-exp2 form (ops/flash.py _CLAMP) saturates
    # raw scores above ~62 and returns the dead-row identity when every
    # score is below ~-87 — real models run |score| < ~30, but a model
    # diverging mid-training can cross the clamp SILENTLY: set
    # safe_softmax=True when diagnosing divergence (graceful online math,
    # ~15-30% slower kernels), and for bit-exact decode-vs-forward gates.
    safe_softmax: bool = False
    # Gradient rematerialization (jax.checkpoint) over the layer scan — the
    # long-context memory lever: "none" saves every layer's internal
    # activations for the backward; "full" saves only each layer's input
    # residual stream (b, s, dim) and recomputes the rest (attention
    # internals, FFN hidden) in the backward pass; "attn" is "full" plus
    # the ring attention's (out, lse) saved (r5: the backward recomputes
    # the cheap projections but skips the attention KERNEL — the dominant
    # recompute at long sequence — for O(s x h x (2d+4)) extra bytes per
    # layer); "dots" saves matmul outputs but recomputes elementwise work.
    # Trades recompute FLOPs for O(layers x s x (hidden+heads*d)) of
    # activation HBM — what makes 128K+ training steps fit on a chip.
    remat: str = "none"

    @property
    def moe(self) -> bool:
        return self.n_experts > 0

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim


def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """He-style init, bf16 storage. Layers stacked on a leading axis so the
    decoder is a ``lax.scan`` over one compiled layer body."""
    k_embed, k_layers, k_out = jax.random.split(key, 3)

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(cfg.dtype)

    def layer(k):
        ks = jax.random.split(k, 7)
        attn = {
            "attn_norm": jnp.ones((cfg.dim,), jnp.float32),
            "wq": dense(ks[0], cfg.dim, (cfg.dim, cfg.q_dim)),
            "wk": dense(ks[1], cfg.dim, (cfg.dim, cfg.kv_dim)),
            "wv": dense(ks[2], cfg.dim, (cfg.dim, cfg.kv_dim)),
            "wo": dense(ks[3], cfg.q_dim, (cfg.q_dim, cfg.dim)),
            "mlp_norm": jnp.ones((cfg.dim,), jnp.float32),
        }
        if cfg.moe:
            E = cfg.n_experts
            return {**attn,
                    "router": dense(ks[4], cfg.dim, (cfg.dim, E)),
                    "moe_up": dense(ks[5], cfg.dim,
                                    (E, cfg.dim, cfg.ffn_hidden)),
                    "moe_down": dense(ks[6], cfg.ffn_hidden,
                                      (E, cfg.ffn_hidden, cfg.dim))}
        return {**attn,
                "w_gate": dense(ks[4], cfg.dim, (cfg.dim, cfg.ffn_hidden)),
                "w_up": dense(ks[5], cfg.dim, (cfg.dim, cfg.ffn_hidden)),
                "w_down": dense(ks[6], cfg.ffn_hidden,
                                (cfg.ffn_hidden, cfg.dim))}

    layers = jax.vmap(layer)(jax.random.split(k_layers, cfg.n_layers))
    return {
        "embed": dense(k_embed, 1.0, (cfg.vocab, cfg.dim)),
        "layers": layers,
        "final_norm": jnp.ones((cfg.dim,), jnp.float32),
        "lm_head": dense(k_out, cfg.dim, (cfg.dim, cfg.vocab)),
    }


def rmsnorm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    scale = lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale * w).astype(x.dtype)


def rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding over *global* positions. x (b, s, h, d); positions
    (s,) shared or (b, s) per-row (the decode path's per-sequence lengths)."""
    d = x.shape[-1]
    freqs = theta ** (-jnp.arange(0, d // 2, dtype=jnp.float32) / (d // 2))
    ang = positions.astype(jnp.float32)[..., None] * freqs  # (..., s, d/2)
    if ang.ndim == 2:
        ang = ang[None]
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                           axis=-1).astype(x.dtype)


def local_positions(cfg: ModelConfig, s_local: int, *, ulysses_axis: str,
                    ring_axis: str) -> jnp.ndarray:
    """Global positions of this device's tokens: ring rank's layout descriptor
    expanded, then sliced to this ulysses sub-chunk (sequence is sharded
    (ring, ulysses) ring-major, parallel/mesh.py)."""
    ring = lax.axis_size(ring_axis)
    uly = lax.axis_size(ulysses_axis)
    r = lax.axis_index(ring_axis)
    u = lax.axis_index(ulysses_axis)
    s_ring = s_local * uly
    off, stride = position_descriptor(cfg.layout, r, ring, s_ring)
    ring_pos = positions_from_descriptor(off, stride, s_ring)
    return lax.dynamic_slice(ring_pos, (u * s_local,), (s_local,))


def moe_cfg(cfg: ModelConfig):
    """The parallel/moe.py config corresponding to this model's MoE FFN."""
    from long_context_attention_tpu.parallel.moe import MoEConfig

    return MoEConfig(dim=cfg.dim, ffn_hidden=cfg.ffn_hidden,
                     n_experts=cfg.n_experts,
                     capacity_factor=cfg.moe_capacity_factor, dtype=cfg.dtype)


def _ffn(cfg: ModelConfig, lp, h, *, ep_axis: Optional[str] = None,
         tokens_replicated: bool = True, full_capacity: bool = False):
    """Post-norm FFN body: dense SwiGLU or routed MoE per ``cfg.n_experts``.

    ``ep_axis``: mesh axis sharding the expert weights (tokens stay replicated
    along it — the dedicated-ep-axis mode of parallel/moe.py). None = this
    rank holds every expert (single device, or serving with replicated
    weights). ``full_capacity`` raises the expert capacity to the token count
    so routing never drops — the serving decode path, where T = batch is tiny
    and a dropped token would zero a generated position's FFN."""
    if cfg.moe:
        import dataclasses as _dc

        from long_context_attention_tpu.parallel.moe import moe_mlp_local

        mc = moe_cfg(cfg)
        if full_capacity:
            mc = _dc.replace(mc, capacity_factor=float(cfg.n_experts))
        mp = {"router": lp["router"], "w_up": lp["moe_up"],
              "w_down": lp["moe_down"]}
        return moe_mlp_local(mp, h, mc, ep_axis=ep_axis,
                             tokens_replicated=tokens_replicated)
    # qdot == `@` for plain arrays; serving may pass int8 QTensor weights
    gate = jax.nn.silu(qdot(h, lp["w_gate"]).astype(jnp.float32)).astype(
        h.dtype)
    return qdot(gate * qdot(h, lp["w_up"]), lp["w_down"])


def _layer(cfg: ModelConfig, x, lp, positions, *, ulysses_axis, ring_axis,
           interpret, tp_axis: Optional[str] = None,
           ep_axis: Optional[str] = None):
    from long_context_attention_tpu.parallel.tp import (
        tp_region_input,
        tp_region_output,
    )

    b, s, _ = x.shape
    tp = lax.axis_size(tp_axis) if tp_axis else 1
    h_loc, hkv_loc = cfg.n_heads // tp, cfg.n_kv_heads // tp

    h = rmsnorm(x, lp["attn_norm"], cfg.norm_eps)
    if tp_axis:
        h = tp_region_input(h, tp_axis)  # Megatron "f": bwd psums over tp
    q = (h @ lp["wq"]).reshape(b, s, h_loc, cfg.head_dim)
    k = (h @ lp["wk"]).reshape(b, s, hkv_loc, cfg.head_dim)
    v = (h @ lp["wv"]).reshape(b, s, hkv_loc, cfg.head_dim)
    q = rope(q, positions, cfg.rope_theta)
    k = rope(k, positions, cfg.rope_theta)
    attn = usp_attention_local(
        q, k, v,
        ulysses_axis=ulysses_axis, ring_axis=ring_axis, layout=cfg.layout,
        causal=True, window_size=(cfg.window_left, -1), softcap=cfg.softcap,
        sink_tokens=cfg.sink_tokens, safe_softmax=cfg.safe_softmax,
        impl=cfg.attn_impl, block_sizes=cfg.block_sizes,
        interpret=interpret,
    )
    o = (attn.reshape(b, s, h_loc * cfg.head_dim) @ lp["wo"])
    if tp_axis:
        o = tp_region_output(o, tp_axis)  # Megatron "g": allreduce, bwd identity
    x = x + o.astype(x.dtype)
    h = rmsnorm(x, lp["mlp_norm"], cfg.norm_eps)
    if cfg.moe:
        assert tp_axis is None, "MoE FFN does not compose with tp yet"
        m = _ffn(cfg, lp, h, ep_axis=ep_axis)
    else:
        if tp_axis:
            h = tp_region_input(h, tp_axis)
        m = _ffn(cfg, lp, h)
        if tp_axis:
            m = tp_region_output(m, tp_axis)
    x = x + m.astype(x.dtype)
    return x, (k, v)


def _maybe_remat(body, cfg: ModelConfig):
    """Wrap a layer-scan body in jax.checkpoint per ``cfg.remat``.

    ``prevent_cse=False`` is the documented safe setting under ``lax.scan``
    (the scan boundary already blocks the problematic CSE) and avoids the
    optimization-barrier overhead."""
    if cfg.remat == "none":
        return body
    if cfg.remat == "full":
        return jax.checkpoint(body, prevent_cse=False)
    if cfg.remat == "attn":
        # full remat EXCEPT the ring attention's (out, lse) residuals
        # (named in parallel/ring.py:_ring_vjp_fwd): the backward recomputes
        # the cheap per-layer projections but NOT the attention kernel loop
        # — O(s·h·(2d+4)) bytes saved per layer buys back the single most
        # expensive recompute (attention is ~all the FLOPs at long seq).
        return jax.checkpoint(
            body, prevent_cse=False,
            policy=jax.checkpoint_policies.save_only_these_names(
                "ring_attn_out", "ring_attn_lse"))
    if cfg.remat == "dots":
        return jax.checkpoint(
            body, prevent_cse=False,
            policy=jax.checkpoint_policies.checkpoint_dots)
    raise ValueError(
        f"remat must be none|full|attn|dots, got {cfg.remat!r}")


def forward_local(params: Params, tokens: jnp.ndarray, cfg: ModelConfig, *,
                  ulysses_axis: str, ring_axis: str,
                  interpret: Optional[bool] = None,
                  return_kv: bool = False,
                  tp_axis: Optional[str] = None,
                  ep_axis: Optional[str] = None,
                  last_index=None,
                  layer_gather=None):
    """Device-local forward: tokens (b, s_local) int32 -> logits fp32
    (b, s_local, vocab). Call inside shard_map over the USP mesh.

    ``return_kv=True`` also returns per-layer post-RoPE (k, v), each
    (n_layers, b, s_local, h_kv, d) — the prefill path's cache feed.
    ``tp_axis``: tensor-parallel mesh axis; weight shards arrive via the
    shard_map in_specs (:func:`param_specs`).
    ``last_index``: optional LOCAL position (int or traced scalar): project
    only that position through lm_head — logits (b, 1, vocab). Serving
    prefill reads a single next-token row; the full (s, vocab) fp32 tensor
    (and its whole-prompt lm_head matmul) is bucket x vocab waste there.
    ``layer_gather``: optional hook applied to each layer's param slice
    inside the scan body — the ZeRO-3 per-layer all-gather
    (parallel/zero.py make_zero3_train_step); its autograd transpose is the
    gradient reduce-scatter, and under remat the backward re-gathers."""
    b, s = tokens.shape
    positions = local_positions(cfg, s, ulysses_axis=ulysses_axis,
                                ring_axis=ring_axis)
    x = params["embed"][tokens]

    def body(x, lp):
        if layer_gather is not None:
            lp = layer_gather(lp)
        x, kv = _layer(cfg, x, lp, positions, ulysses_axis=ulysses_axis,
                       ring_axis=ring_axis, interpret=interpret,
                       tp_axis=tp_axis, ep_axis=ep_axis)
        return x, (kv if return_kv else None)

    body = _maybe_remat(body, cfg)
    x, kv = lax.scan(body, x, params["layers"])
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    if last_index is not None:
        x = lax.dynamic_slice_in_dim(x, last_index, 1, axis=1)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return (logits, kv) if return_kv else logits


def param_specs(axes: "MeshAxes", tp: bool, pp: bool = False,
                ep: bool = False, moe: bool = False):
    """PartitionSpec pytree for the params.

    Layer weights are stacked (n_layers, ...): the pp axis shards their
    *leading* (layer) dimension into pipeline stages; the tp axis shards the
    last (column-parallel: wq/wk/wv/w_gate/w_up) or middle (row-parallel:
    wo/w_down) weight dimension; norms/embed/lm_head stay replicated. MoE
    expert weights (n_layers, n_experts, ...) shard the *expert* dimension
    over the ep axis; the router is replicated."""
    if not tp and not pp and not (ep and moe) and not moe:
        return P()
    lead = axes.pp if pp else None
    tpa = axes.tp if tp else None
    col = P(lead, None, tpa)
    row = P(lead, tpa, None)
    norm = P(lead, None)
    if moe:
        epa = axes.ep if ep else None
        ffn = {"router": P(lead, None, None),
               "moe_up": P(lead, epa, None, None),
               "moe_down": P(lead, epa, None, None)}
    else:
        ffn = {"w_gate": col, "w_up": col, "w_down": row}
    return {
        "embed": P(),
        "layers": {
            "attn_norm": norm, "wq": col, "wk": col, "wv": col, "wo": row,
            "mlp_norm": norm, **ffn,
        },
        "final_norm": P(),
        "lm_head": P(),
    }


def make_pp_train_step(cfg: ModelConfig, mesh: Mesh, optimizer, n_micro: int,
                       axes: MeshAxes = MeshAxes(), *,
                       interpret: Optional[bool] = None):
    """Jitted 5-D-parallel train step (dp x pp x ring x ulysses x tp):
    GPipe-microbatched pipeline stages (parallel/pipeline.py) around the same
    USP layer body. The local batch splits into ``n_micro`` microbatches;
    gradients are exact (GPipe), so training trajectories match the
    non-pipelined step bit-for-noise.
    """
    from long_context_attention_tpu.parallel.pipeline import pipeline_apply

    assert not cfg.moe, "MoE + pipeline parallelism not supported yet"
    tp = axes.tp in mesh.axis_names
    assert axes.pp in mesh.axis_names, "mesh has no pp axis (pp degree > 1)"
    n_stages = mesh.shape[axes.pp]
    assert cfg.n_layers % n_stages == 0
    pspecs = param_specs(axes, tp, pp=True)
    tok_spec = P(axes.dp, axes.seq)
    base_axes = (axes.dp, axes.ring, axes.ulysses)

    def local_grads(params, tokens, labels, mask):
        b, s = tokens.shape
        assert b % n_micro == 0, (b, n_micro)
        mb = b // n_micro
        tok_mb = tokens.reshape(n_micro, mb, s)
        lab_mb = labels.reshape(n_micro, mb, s)
        msk_mb = mask.reshape(n_micro, mb, s)
        positions = local_positions(cfg, s, ulysses_axis=axes.ulysses,
                                    ring_axis=axes.ring)

        def lf(p):
            def stage_fn(x, layers_slice):
                def body(xx, lp):
                    xx, _ = _layer(cfg, xx, lp, positions,
                                   ulysses_axis=axes.ulysses,
                                   ring_axis=axes.ring, interpret=interpret,
                                   tp_axis=axes.tp if tp else None)
                    return xx, None

                x, _ = lax.scan(_maybe_remat(body, cfg), x, layers_slice)
                return x

            def inject(t):
                return p["embed"][tok_mb[t]]

            def collect(t, y):
                x = rmsnorm(y, p["final_norm"], cfg.norm_eps)
                logits = (x @ p["lm_head"]).astype(jnp.float32)
                logp = jax.nn.log_softmax(logits, axis=-1)
                ll = jnp.take_along_axis(logp, lab_mb[t][..., None],
                                         axis=-1)[..., 0]
                mf = msk_mb[t].astype(jnp.float32)
                return jnp.sum(ll * mf), jnp.sum(mf)

            nums, dens = pipeline_apply(
                stage_fn, inject, collect, p["layers"], n_micro,
                (jnp.float32(0.0), jnp.float32(0.0)), pp_axis=axes.pp)
            num = jnp.sum(nums)
            den = lax.psum(jnp.sum(dens), base_axes)
            return -num / jnp.maximum(den, 1.0)

        loss, grads = jax.value_and_grad(lf)(params)
        loss = lax.psum(loss, base_axes)  # reporting only
        grads = jax.tree.map(lambda g: lax.psum(g, base_axes), grads)
        # stage-sharded layer grads stay per-stage; replicated leaves (embed,
        # final_norm, lm_head) were computed only on the stage that uses them
        # (where-masked elsewhere) and need the pp-sum
        grads = {
            **grads,
            "embed": lax.psum(grads["embed"], axes.pp),
            "final_norm": lax.psum(grads["final_norm"], axes.pp),
            "lm_head": lax.psum(grads["lm_head"], axes.pp),
        }
        return loss, grads

    mapped = jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(pspecs, tok_spec, tok_spec, tok_spec),
        out_specs=(P(), pspecs),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, tokens, labels, mask):
        loss, grads = mapped(params, tokens, labels, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype),
                              params, updates)
        return params, opt_state, loss

    return step


def prefill_chunk_step(params: Params, cache, tokens: jnp.ndarray,
                       start: int, cfg: ModelConfig, *,
                       interpret: Optional[bool] = None,
                       last_logit_only: bool = False):
    """Process one prompt chunk against the cache-so-far (chunked prefill).

    tokens (b, s_c) at global positions [start, start+s_c); activation memory
    is O(s_c * cache_len) tile-streamed, never O(prompt^2). The chunk's causal
    self-attention and its (all-visible) attention over the quantized cache
    prefix merge via online LSE — the same math as the ring. Returns
    (logits (b, s_c, vocab), cache with the chunk written at [start, ...)).
    ``last_logit_only`` projects only the final position (logits (b, 1,
    vocab)) — serving prefill needs just the next-token logits, and the full
    (b, s_c, vocab) fp32 tensor is what OOMed batched 32K prefill (VERDICT
    r1 #4: vocab 32K x chunk 8K x fp32 = 1 GiB per row).
    """
    import dataclasses as _dc

    from long_context_attention_tpu.ops.flash import (
        flash_attention_fwd,
        flash_attention_fwd_cache,
    )
    from long_context_attention_tpu.ops.kv_cache import quantize_kv
    from long_context_attention_tpu.ops.merge import merge_attn_blocks

    b, s_c = tokens.shape
    positions = jnp.arange(s_c, dtype=jnp.int32) + start
    x = params["embed"][tokens]
    scale = cfg.head_dim ** -0.5

    hkv, d = cfg.n_kv_heads, cfg.head_dim

    # The stacked cache rides in the scan CARRY (aliased in place by XLA) —
    # streaming it through scan xs/ys forced XLA to allocate input AND output
    # copies of the whole cache on top of the donated buffer, OOMing batched
    # 32K prefill (two 4.5 GB AllocateBuffer temps at b=8/int8). Same
    # structure as decode_step's body_layered.
    def body(carry, lp):
        x, li, kc_all, vc_all, ksc_all, vsc_all = carry
        h = rmsnorm(x, lp["attn_norm"], cfg.norm_eps)
        q = (h @ lp["wq"]).reshape(b, s_c, cfg.n_heads, cfg.head_dim)
        k = (h @ lp["wk"]).reshape(b, s_c, hkv, d)
        v = (h @ lp["wv"]).reshape(b, s_c, hkv, d)
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)

        out, lse = flash_attention_fwd(q, k, v, causal=True,
                                       window_size=(cfg.window_left, -1),
                                       softcap=cfg.softcap,
                                       sink_tokens=cfg.sink_tokens,
                                       safe_softmax=cfg.safe_softmax,
                                       softmax_scale=scale,
                                       interpret=interpret)
        if start > 0:
            kcl = lax.dynamic_slice(
                kc_all, (li, 0, 0, 0, 0), (1, b, hkv, start, d))[0]
            vcl = lax.dynamic_slice(
                vc_all, (li, 0, 0, 0, 0), (1, b, hkv, start, d))[0]
            kscl = vscl = None
            if ksc_all is not None:
                # scales live 5-d (L, b, h, 1, s_max); the flash cache
                # kernel takes the flat (b, h, s) view of this chunk
                kscl = lax.dynamic_slice(
                    ksc_all, (li, 0, 0, 0, 0), (1, b, hkv, 1, start))[0, :, :, 0]
                vscl = lax.dynamic_slice(
                    vsc_all, (li, 0, 0, 0, 0), (1, b, hkv, 1, start))[0, :, :, 0]
            c_out, c_lse = flash_attention_fwd_cache(
                q, kcl, vcl, k_scale=kscl, v_scale=vscl,
                window_size=(cfg.window_left, -1), softcap=cfg.softcap,
                sink_tokens=cfg.sink_tokens, safe_softmax=cfg.safe_softmax,
                q_start=start, softmax_scale=scale, interpret=interpret,
                # the resident cache is strictly past this chunk's rows:
                # causal is a semantic no-op that lets a sliding window
                # engage the BANDED kv grid (TTFT ∝ window, not kv length)
                causal=True,
            )
            acc, acc_lse = merge_attn_blocks(
                out.astype(jnp.float32), lse, c_out, c_lse)
            out = acc.astype(x.dtype)

        # write the chunk's KV into the cache at [start, start+s_c)
        dt_name = ("bfloat16" if ksc_all is None
                   else jnp.dtype(kc_all.dtype).name)
        kq, ks1 = quantize_kv(jnp.transpose(k, (0, 2, 1, 3)), dt_name)
        vq, vs1 = quantize_kv(jnp.transpose(v, (0, 2, 1, 3)), dt_name)
        kc_all = lax.dynamic_update_slice(kc_all, kq[None],
                                          (li, 0, 0, start, 0))
        vc_all = lax.dynamic_update_slice(vc_all, vq[None],
                                          (li, 0, 0, start, 0))
        if ksc_all is not None:
            ksc_all = lax.dynamic_update_slice(
                ksc_all, ks1[None, :, :, None], (li, 0, 0, 0, start))
            vsc_all = lax.dynamic_update_slice(
                vsc_all, vs1[None, :, :, None], (li, 0, 0, 0, start))

        x = x + (out.reshape(b, s_c, cfg.q_dim) @ lp["wo"]).astype(x.dtype)
        hh = rmsnorm(x, lp["mlp_norm"], cfg.norm_eps)
        x = x + _ffn(cfg, lp, hh).astype(x.dtype)
        return (x, li + 1, kc_all, vc_all, ksc_all, vsc_all), None

    carry0 = (x, jnp.int32(0), cache.k, cache.v, cache.k_scale, cache.v_scale)
    (x, _, kc, vc, ksc, vsc), _ = lax.scan(body, carry0, params["layers"])
    cache = _dc.replace(cache, k=kc, v=vc, k_scale=ksc, v_scale=vsc,
                        length=jnp.full_like(cache.length, start + s_c))
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    if last_logit_only:
        x = x[:, -1:]
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, cache


def decode_step(params: Params, cache, tokens: jnp.ndarray, cfg: ModelConfig,
                *, interpret: Optional[bool] = None, shard_axes=None,
                active: Optional[jnp.ndarray] = None):
    """One single-token decode step against a KVCache (serving hot path).

    tokens (b,) int32 -> (logits (b, vocab) fp32, updated cache). The new
    token's KV is appended (and visible to itself) before decode attention;
    ``cache.length`` is advanced once at the end.

    ``shard_axes``: mesh axis name(s) when running inside shard_map with the
    cache's slot axis sharded over them (serving/sharded.py): the append
    routes to the owner rank and attention merges cross-shard partials.

    ``active``: optional (b,) bool — continuous batching. Inactive rows
    (free request slots) write nothing into the cache and do not advance
    ``length``; their logits are garbage the caller ignores.
    """
    import dataclasses as _dc

    from long_context_attention_tpu.ops.decode import (
        cache_append,
        decode_attention,
    )
    from long_context_attention_tpu.ops.kv_cache import quantize_kv
    from long_context_attention_tpu.serving.sharded import (
        sharded_cache_append,
        sharded_decode_attention,
    )

    b = tokens.shape[0]
    x = params["embed"][tokens][:, None]  # (b, 1, dim)
    pos = cache.length  # (b,) per-row positions of the new token
    live = (jnp.ones((b,), jnp.int32) if active is None
            else jnp.asarray(active).astype(jnp.int32))
    # inactive rows: append_pos=-1 (cache_append writes nothing) and the
    # attended length stays at the prefix (no phantom token)
    append_pos = jnp.where(live > 0, pos, -1).astype(jnp.int32)
    att_len = pos + live
    scale = cfg.head_dim ** -0.5
    # paged cache (ops/kv_cache.py:PagedKVCache): the page table rides the
    # kernels' scalar prefetch; it is constant across layers and steps
    pt = getattr(cache, "page_table", None)

    # The stacked cache rides in the scan CARRY (aliased in place by XLA) and
    # the kernel indexes the layer internally — no per-step per-layer cache
    # slicing/copies (which cost 3.5x in serving decode throughput).
    def body_layered(carry, lp):
        x, li, kc_all, vc_all, ksc_all, vsc_all = carry
        h = rmsnorm(x, lp["attn_norm"], cfg.norm_eps)
        # qdot == `@` for bf16 params; int8 QTensor weights (ops/wquant.py,
        # Engine weight_dtype="int8") run the s8 MXU path
        q = qdot(h, lp["wq"]).reshape(b, 1, cfg.n_heads, cfg.head_dim)
        k = qdot(h, lp["wk"]).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
        v = qdot(h, lp["wv"]).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
        q = rope(q, pos[:, None], cfg.rope_theta)
        k = rope(k, pos[:, None], cfg.rope_theta)

        dt = cache.dtype
        kq, ks1 = quantize_kv(jnp.transpose(k, (0, 2, 1, 3)), dt)  # (b,h,1,d)
        vq, vs1 = quantize_kv(jnp.transpose(v, (0, 2, 1, 3)), dt)

        # Append-then-attend, both kernels aliasing the carried cache in
        # place. The append is a micro-tile pallas kernel with
        # input_output_aliases (ops/decode.py:cache_append) — a
        # dynamic_update_slice here made XLA double-buffer the whole carried
        # cache (2 extra full-cache copies per token: 985 ms/tok instead of
        # ~50 at b=8 @32K), and fusing the splice into the attention kernel
        # doubled its HBM write traffic (249 -> 120 GB/s at b=8).
        if shard_axes is not None:
            res = sharded_cache_append(
                kc_all, vc_all, kq, vq, append_pos, ksc_all, vsc_all,
                ks1, vs1, axis_name=shard_axes, layer=li,
                interpret=interpret, page_table=pt)
            kc_all, vc_all = res[0], res[1]
            if len(res) > 2:
                ksc_all, vsc_all = res[2], res[3]
            attn = sharded_decode_attention(
                q[:, 0], kc_all, vc_all, att_len, ksc_all, vsc_all,
                axis_name=shard_axes, softmax_scale=scale,
                interpret=interpret, layer=li, softcap=cfg.softcap,
                window_left=cfg.window_left, sink_tokens=cfg.sink_tokens,
                safe_softmax=cfg.safe_softmax, page_table=pt,
            )
        else:
            res = cache_append(
                kc_all, vc_all, kq, vq, append_pos, ksc_all, vsc_all,
                ks1, vs1, layer=li, interpret=interpret, page_table=pt)
            kc_all, vc_all = res[0], res[1]
            if len(res) > 2:
                ksc_all, vsc_all = res[2], res[3]
            attn = decode_attention(
                q[:, 0], kc_all, vc_all, att_len, ksc_all, vsc_all,
                softmax_scale=scale, interpret=interpret, layer=li,
                window_size=(cfg.window_left, -1), softcap=cfg.softcap,
                sink_tokens=cfg.sink_tokens, page_table=pt,
                safe_softmax=cfg.safe_softmax,
            )  # (b, h, d)

        x = x + qdot(attn.reshape(b, 1, cfg.q_dim), lp["wo"]).astype(x.dtype)
        hh = rmsnorm(x, lp["mlp_norm"], cfg.norm_eps)
        x = x + _ffn(cfg, lp, hh, full_capacity=True).astype(x.dtype)
        return (x, li + 1, kc_all, vc_all, ksc_all, vsc_all), None

    carry0 = (x, jnp.int32(0), cache.k, cache.v, cache.k_scale, cache.v_scale)
    (x, _, kc, vc, ksc, vsc), _ = lax.scan(body_layered, carry0,
                                           params["layers"])
    cache = _dc.replace(cache, k=kc, v=vc, k_scale=ksc, v_scale=vsc,
                        length=cache.length + live)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = qdot(x[:, 0], params["lm_head"]).astype(jnp.float32)
    return logits, cache


def decode_multi_step(params: Params, cache, tokens: jnp.ndarray,
                      cfg: ModelConfig, *,
                      interpret: Optional[bool] = None,
                      shard_axes=None,
                      active: Optional[jnp.ndarray] = None,
                      last_index=None):
    """Teacher-forced multi-token decode: consume n tokens per row in ONE
    forward against the cache (the speculative-decoding verify step).

    tokens (b, n) int32 at per-row positions cache.length + [0, n) ->
    (logits (b, n, vocab) fp32 — position i's logits follow token i — and
    the cache with all n KVs appended, length advanced by n). The caller
    rolls back to the accepted prefix by resetting ``length``: slots past
    it are dead (masked by every reader) and get overwritten by later
    appends, so rollback is free.

    Structure per layer — IDENTICAL to `decode_step`, just n query rows per
    cache stream: the run's KVs splice in with one multi-token
    `cache_append` (quantized like every other slot), then ONE layered
    multi-token `ops/decode.py:decode_attention` call attends each token i
    to cache slots [0, pos0 + i] with per-row causal masking inside the
    kernel. The whole run costs a single cache read per layer (the HBM
    stream dominates decode, so verifying gamma draft tokens costs ~1.1x
    one decode step), there is no per-layer `dynamic_slice` copy of the
    stacked cache, and position i's math matches what `decode_step` would
    compute for that token exactly (same kernel, same quantized KV path,
    same tile order). Sliding windows and softcap compose per-row.

    ``shard_axes``: mesh axis name(s) when running inside shard_map with
    the cache's slot axis sharded over them (serving/sharded.py): each
    rank appends its in-range part of the run (a run may straddle a shard
    boundary) and attention merges cross-shard partials.

    ``active``: optional (b,) bool — continuous batching. Inactive rows
    write nothing and do not advance ``length``; their logits are garbage
    the caller ignores.

    ``last_index``: optional position (int or traced scalar) within the
    run: project only that position through lm_head — logits (b, 1,
    vocab). Prefix-cache suffix prefill (serving/continuous.py) feeds
    multi-hundred-token runs through this path and needs only the
    next-token row; the full (b, n, vocab) fp32 tensor is the same
    bucket x vocab waste `forward_local`'s last_index avoids.
    """
    import dataclasses as _dc

    from long_context_attention_tpu.ops.decode import (
        cache_append,
        decode_attention,
    )
    from long_context_attention_tpu.ops.kv_cache import quantize_kv
    from long_context_attention_tpu.serving.sharded import (
        sharded_cache_append,
        sharded_decode_attention,
    )

    b, n = tokens.shape
    x = params["embed"][tokens]            # (b, n, dim)
    pos0 = cache.length                    # (b,)
    live = (jnp.ones((b,), jnp.int32) if active is None
            else jnp.asarray(active).astype(jnp.int32))
    append_pos = jnp.where(live > 0, pos0, -n).astype(jnp.int32)
    att_len = pos0 + n * live              # total visible incl. the run
    positions = pos0[:, None] + jnp.arange(n, dtype=jnp.int32)[None]
    scale = cfg.head_dim ** -0.5
    hkv, dh = cfg.n_kv_heads, cfg.head_dim
    pt = getattr(cache, "page_table", None)

    def body(carry, lp):
        x, li, kc_all, vc_all, ksc_all, vsc_all = carry
        h = rmsnorm(x, lp["attn_norm"], cfg.norm_eps)
        q = qdot(h, lp["wq"]).reshape(b, n, cfg.n_heads, dh)
        k = qdot(h, lp["wk"]).reshape(b, n, hkv, dh)
        v = qdot(h, lp["wv"]).reshape(b, n, hkv, dh)
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)

        dt_name = ("bfloat16" if ksc_all is None
                   else jnp.dtype(kc_all.dtype).name)
        kq, ks1 = quantize_kv(jnp.transpose(k, (0, 2, 1, 3)), dt_name)
        vq, vs1 = quantize_kv(jnp.transpose(v, (0, 2, 1, 3)), dt_name)
        if shard_axes is not None:
            res = sharded_cache_append(
                kc_all, vc_all, kq, vq, append_pos, ksc_all, vsc_all,
                ks1, vs1, axis_name=shard_axes, layer=li,
                interpret=interpret, page_table=pt)
            kc_all, vc_all = res[0], res[1]
            if len(res) > 2:
                ksc_all, vsc_all = res[2], res[3]
            out = sharded_decode_attention(
                q, kc_all, vc_all, att_len, ksc_all, vsc_all,
                axis_name=shard_axes, softmax_scale=scale,
                interpret=interpret, layer=li, softcap=cfg.softcap,
                window_left=cfg.window_left, sink_tokens=cfg.sink_tokens,
                safe_softmax=cfg.safe_softmax, page_table=pt,
            )  # (b, n, h, d)
        else:
            res = cache_append(kc_all, vc_all, kq, vq, append_pos,
                               ksc_all, vsc_all, ks1, vs1,
                               layer=li, interpret=interpret, page_table=pt)
            kc_all, vc_all = res[0], res[1]
            if len(res) > 2:
                ksc_all, vsc_all = res[2], res[3]

            out = decode_attention(
                q, kc_all, vc_all, att_len, ksc_all, vsc_all,
                softmax_scale=scale, interpret=interpret, layer=li,
                window_size=(cfg.window_left, -1), softcap=cfg.softcap,
                sink_tokens=cfg.sink_tokens, page_table=pt,
                safe_softmax=cfg.safe_softmax,
            )  # (b, n, h, d)

        x = x + qdot(out.reshape(b, n, cfg.q_dim), lp["wo"]).astype(x.dtype)
        hh = rmsnorm(x, lp["mlp_norm"], cfg.norm_eps)
        x = x + _ffn(cfg, lp, hh, full_capacity=True).astype(x.dtype)
        return (x, li + 1, kc_all, vc_all, ksc_all, vsc_all), None

    carry0 = (x, jnp.int32(0), cache.k, cache.v, cache.k_scale, cache.v_scale)
    (x, _, kc, vc, ksc, vsc), _ = lax.scan(body, carry0, params["layers"])
    cache = _dc.replace(cache, k=kc, v=vc, k_scale=ksc, v_scale=vsc,
                        length=cache.length + n * live)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    if last_index is not None:
        x = lax.dynamic_slice_in_dim(x, last_index, 1, axis=1)
    logits = qdot(x, params["lm_head"]).astype(jnp.float32)
    return logits, cache


def make_forward(cfg: ModelConfig, mesh: Mesh, axes: MeshAxes = MeshAxes(), *,
                 interpret: Optional[bool] = None):
    """Jitted global forward: (params, tokens (b, s) sharded dp x seq) -> logits."""
    tp = axes.tp in mesh.axis_names
    ep = axes.ep in mesh.axis_names
    tok_spec = P(axes.dp, axes.seq)
    out_spec = P(axes.dp, axes.seq, None)

    def fwd(params, tokens):
        return forward_local(params, tokens, cfg, ulysses_axis=axes.ulysses,
                             ring_axis=axes.ring, interpret=interpret,
                             tp_axis=axes.tp if tp else None,
                             ep_axis=axes.ep if ep else None)

    mapped = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(param_specs(axes, tp, ep=ep, moe=cfg.moe), tok_spec),
        out_specs=out_spec, check_vma=False)
    return jax.jit(mapped)


def loss_local(params: Params, tokens, labels, mask, cfg: ModelConfig, *,
               ulysses_axis: str, ring_axis: str, dp_axis: Optional[str] = None,
               interpret: Optional[bool] = None,
               tp_axis: Optional[str] = None,
               ep_axis: Optional[str] = None,
               layer_gather=None) -> jnp.ndarray:
    """This shard's *contribution* to the global-mean next-token cross-entropy
    (psum over (dp, ring, ulysses) of the returned scalar = the global loss).

    labels/mask are sharded alongside tokens; the caller builds them in global
    original order (labels[i] = tokens[i+1]) *before* layout permutation so the
    shift never crosses shard boundaries. (The contribution is already
    replicated across tp ranks — logits are post-allreduce.)
    """
    logits = forward_local(params, tokens, cfg, ulysses_axis=ulysses_axis,
                           ring_axis=ring_axis, interpret=interpret,
                           tp_axis=tp_axis, ep_axis=ep_axis,
                           layer_gather=layer_gather)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    maskf = mask.astype(jnp.float32)
    num = jnp.sum(ll * maskf)
    den = jnp.sum(maskf)
    # ep (when present) joins the denominator reduction: tokens are
    # REPLICATED along ep, so including it scales den by the ep degree and
    # each ep rank's contribution becomes L/ep — exactly what makes
    # psum-over-all-axes of the per-rank losses (and of the per-rank grads,
    # per leaf over the axes that leaf is replicated on) equal the global
    # mean loss/gradient.
    axes = ((ulysses_axis, ring_axis) + ((dp_axis,) if dp_axis else ())
            + ((ep_axis,) if ep_axis else ()))
    # Only the (param-independent) denominator reduces here. The numerator
    # stays LOCAL: under shard_map, psum's transpose is psum, so a psum in
    # the gradient path multiplies every weight gradient by the axis-group
    # size (a bug Adam's scale invariance silently hides). The caller psums
    # the returned contribution for reporting; psum(grads) then yields the
    # exact global-mean gradient.
    den = lax.psum(den, axes)
    return -num / jnp.maximum(den, 1.0)


def make_train_step(cfg: ModelConfig, mesh: Mesh, optimizer,
                    axes: MeshAxes = MeshAxes(), *,
                    interpret: Optional[bool] = None):
    """Jitted train step over up to 5-D parallelism
    (dp x ep x ring x ulysses x tp):
    (params, opt_state, tokens, labels, mask) -> (params, opt_state, loss).

    When the mesh has an ep axis (and ``cfg.n_experts > 0``) the MoE expert
    weights shard over it: activations stay replicated along ep, each ep rank
    routes its 1/ep slice of the tokens, and the dispatch/return all_to_all
    rides the ep axis (parallel/moe.py tokens_replicated mode).

    Gradients psum over (dp, ring, ulysses) — the DP sync the reference
    delegates to DeepSpeed plus Megatron-style sequence-parallel weight-grad
    reduction. The tp axis needs no gradient collective: the f/g boundary
    operators (parallel/tp.py) keep activation cotangents replicated, so each
    rank holds exactly its weight shard's gradient. The optimizer applies
    OUTSIDE shard_map so GSPMD shards Adam state along the param shardings.
    """
    tp = axes.tp in mesh.axis_names
    ep = axes.ep in mesh.axis_names
    pspecs = param_specs(axes, tp, ep=ep, moe=cfg.moe)
    tok_spec = P(axes.dp, axes.seq)
    base_axes = (axes.dp, axes.ring, axes.ulysses)
    all_axes = base_axes + ((axes.ep,) if ep else ())

    def local_grads(params, tokens, labels, mask):
        def lf(p):
            return loss_local(p, tokens, labels, mask, cfg,
                              ulysses_axis=axes.ulysses, ring_axis=axes.ring,
                              dp_axis=axes.dp, interpret=interpret,
                              tp_axis=axes.tp if tp else None,
                              ep_axis=axes.ep if ep else None)

        loss, grads = jax.value_and_grad(lf)(params)
        loss = lax.psum(loss, all_axes)  # reporting only (post-grad)
        # Each leaf psums over the axes it is REPLICATED on: everything over
        # (dp, ring, ulysses); additionally over ep for all but the
        # ep-SHARDED expert weights (whose cross-ep cotangents the MoE
        # all_to_all transpose already accumulated).
        grads = jax.tree.map(lambda g: lax.psum(g, base_axes), grads)
        if ep:
            sharded = ("moe_up", "moe_down") if cfg.moe else ()
            lg = grads["layers"]
            ep_repl = {k: lax.psum(v, axes.ep) for k, v in lg.items()
                       if k not in sharded}
            grads = {
                **{k: lax.psum(v, axes.ep) for k, v in grads.items()
                   if k != "layers"},
                "layers": {**lg, **ep_repl},
            }
        return loss, grads

    mapped = jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(pspecs, tok_spec, tok_spec, tok_spec),
        out_specs=(P(), pspecs),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, tokens, labels, mask):
        loss, grads = mapped(params, tokens, labels, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype),
                              params, updates)
        return params, opt_state, loss

    return step
