"""Generation engine: prefill (flash over the prompt) + jitted decode loop.

The serving counterpart of the training stack (the reference has none —
SURVEY.md L5 "no CLI, no services"): prompts prefill through the same model
forward used in training (USP-shardable), per-layer post-RoPE KV lands in a
(optionally INT8/FP8) KVCache, and generation is a single compiled
``lax.scan`` of single-token decode steps with the cache as donated carry.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from long_context_attention_tpu.models.llama import (
    ModelConfig,
    decode_step,
    forward_local,
    prefill_chunk_step,
)
from long_context_attention_tpu.ops.kv_cache import KVCache
from long_context_attention_tpu.parallel.mesh import MeshAxes, make_usp_mesh

__all__ = ["Engine", "GenerationResult", "SamplingParams", "sample_token",
           "token_logprob"]


@dataclasses.dataclass
class GenerationResult:
    tokens: jnp.ndarray       # (b, max_new) generated token ids
    cache: KVCache            # final cache (prompt + generated)
    prefill_logits: jnp.ndarray  # (b, vocab) logits at the last prompt token


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Greedy by default; temperature/top-k/top-p compose in that order."""

    temperature: float = 0.0   # 0 = greedy argmax
    top_k: int = 0             # 0 = disabled
    top_p: float = 1.0         # 1 = disabled


def transform_logits(logits: jnp.ndarray, params: SamplingParams
                     ) -> jnp.ndarray:
    """Apply temperature / top-k / top-p to (..., vocab) fp32 logits,
    returning masked logits whose softmax IS the sampling distribution —
    the piece speculative acceptance needs explicitly (q and p must be the
    distributions actually sampled from, post-transform)."""
    assert params.temperature > 0.0
    logits = logits / params.temperature
    if params.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -params.top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if params.top_p < 1.0:
        sorted_l = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_l, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest prefix with cumulative mass >= top_p stays
        cutoff_idx = jnp.sum(cum < params.top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_l, cutoff_idx[..., None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


def sampling_probs(logits: jnp.ndarray, params: SamplingParams) -> jnp.ndarray:
    """(..., vocab) fp32 logits -> the post-transform sampling distribution."""
    return jax.nn.softmax(transform_logits(logits, params), axis=-1)


def sample_token(logits: jnp.ndarray, params: SamplingParams,
                 key: Optional[jax.Array]) -> jnp.ndarray:
    """(b, vocab) fp32 logits -> (b,) int32 token ids."""
    if params.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = transform_logits(logits, params)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def token_logprob(logits: jnp.ndarray, tok: jnp.ndarray) -> jnp.ndarray:
    """(b, vocab) fp32 logits + (b,) chosen ids -> (b,) fp32 log P(tok)
    under softmax of the RAW logits — the model's distribution before any
    sampling transform, the quantity serving APIs report as `logprobs`."""
    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lsm, tok[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]


@dataclasses.dataclass(frozen=True)
class Engine:
    """Single-host generation engine for the flagship model.

    ``cache_dtype``: "bfloat16" | "int8" | "float8_e4m3fn" (ops/kv_cache.py).
    ``weight_dtype``: "bfloat16" | "int8" — int8 quantizes the DECODE
    weights (per-output-channel, ops/wquant.py) once per generate call;
    the decode matmuls then run w8a8 on the s8 MXU, halving the per-step
    weight stream (the dominant HBM traffic at small batch). Prefill and
    the stored ``params`` stay bf16.
    Prefill runs the full training forward. With ``mesh=None`` that is a
    1-device run; pass a USP mesh and long prompts prefill sequence-sharded
    over it (tokens permuted into the model's training layout, KV reshuffled
    back to natural order and replicated for the single-host decode loop).
    Decode is `models.llama.decode_step` scanned over steps.
    """

    cfg: ModelConfig
    s_max: int
    cache_dtype: str = "bfloat16"
    interpret: Optional[bool] = None
    mesh: Optional[jax.sharding.Mesh] = None
    axes: MeshAxes = MeshAxes()
    weight_dtype: str = "bfloat16"

    def decode_params(self, params):
        """The params pytree the decode loop should run with — int8
        QTensor weights when ``weight_dtype="int8"``, else ``params``
        unchanged. Idempotent-cheap: one jitted pass over the weights."""
        if self.weight_dtype == "bfloat16":
            return params
        assert self.weight_dtype == "int8", self.weight_dtype
        assert not self.cfg.moe, "int8 decode weights: MoE experts stay bf16"
        from long_context_attention_tpu.ops.wquant import (
            quantize_decode_params,
        )
        return quantize_decode_params(params)

    def init_cache(self, b: int) -> KVCache:
        return KVCache.init(self.cfg.n_layers, b, self.s_max,
                            self.cfg.n_kv_heads, self.cfg.head_dim,
                            self.cache_dtype)

    @functools.partial(jax.jit, static_argnums=0)
    def prefill(self, params, tokens: jnp.ndarray) -> Tuple[jnp.ndarray, KVCache]:
        """tokens (b, s_prompt) natural order -> (last-token logits (b,
        vocab), cache). With ``self.mesh`` set, the prompt forward runs
        USP-sharded over it (the prefill compute is the expensive part of
        serving; decode stays single-host)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from long_context_attention_tpu.parallel.layouts import (
            layout_permutation,
            permute_for_layout,
            unpermute_from_layout,
        )

        b, s = tokens.shape
        axes = self.axes
        # the last natural token's index in the (layout-permuted) order is
        # static; only its logits row is ever read, so only IT is projected
        # through lm_head (the full (s, vocab) fp32 tensor and its
        # whole-prompt vocab matmul are pure waste at prefill)
        perm_idx = s - 1
        if self.mesh is None:
            mesh = make_usp_mesh(1, 1, 1, devices=jax.devices()[:1])
            ring = 1
            n_seq = 1
            tok_spec = P()
            out_specs = (P(), P())
        else:
            mesh = self.mesh
            ring = mesh.shape[axes.ring]
            n_seq = ring * mesh.shape[axes.ulysses]
            tokens = permute_for_layout(tokens, self.cfg.layout, ring, axis=1)
            if self.cfg.layout != "basic":
                perm = layout_permutation(self.cfg.layout, ring, s)
                perm_idx = int((perm == s - 1).argmax())
            tok_spec = P(None, (axes.ring, axes.ulysses))
            out_specs = (P(),
                         (P(None, None, (axes.ring, axes.ulysses), None,
                            None),) * 2)
        s_local = s // n_seq
        owner, loc = perm_idx // s_local, perm_idx % s_local

        def fwd(params, tokens):
            logits, kv = forward_local(
                params, tokens, self.cfg,
                ulysses_axis=axes.ulysses, ring_axis=axes.ring,
                interpret=self.interpret, return_kv=True, last_index=loc)
            if self.mesh is not None:
                # every seq shard projects its local candidate row; a psum
                # keeps the owner shard's (replicating the (b, vocab) row)
                me = lax.axis_index((axes.ring, axes.ulysses))
                logits = lax.psum(
                    jnp.where(me == owner, logits, 0.0),
                    (axes.ring, axes.ulysses))
            return logits[:, 0], kv

        logits, (kv_k, kv_v) = jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(P(), tok_spec),
            out_specs=out_specs,
            check_vma=False,
        )(params, tokens)

        if self.mesh is not None and self.cfg.layout != "basic":
            # one static permutation back to natural slot order (GSPMD turns
            # it into one all_to_all among the sequence shards)
            kv_k = unpermute_from_layout(kv_k, self.cfg.layout, ring, axis=2)
            kv_v = unpermute_from_layout(kv_v, self.cfg.layout, ring, axis=2)
        if self.mesh is not None:
            # replicate for the single-host decode loop
            repl = NamedSharding(mesh, P())
            kv_k = lax.with_sharding_constraint(kv_k, repl)
            kv_v = lax.with_sharding_constraint(kv_v, repl)

        cache = self.init_cache(b)
        for layer in range(self.cfg.n_layers):
            cache = cache.write_prompt(layer, kv_k[layer], kv_v[layer])
        cache = cache.advance(s)
        return logits, cache

    @functools.partial(jax.jit, static_argnums=(0, 4), donate_argnums=2)
    def _prefill_chunk(self, params, cache, tokens, start: int):
        # last_logit_only: serving needs only the next-token logits; the full
        # (b, chunk, vocab) fp32 tensor OOMed batched 32K prefill.
        return prefill_chunk_step(params, cache, tokens, start, self.cfg,
                                  interpret=self.interpret,
                                  last_logit_only=True)

    def prefill_chunked(self, params, tokens: jnp.ndarray, chunk_size: int
                        ) -> Tuple[jnp.ndarray, KVCache]:
        """Bounded-memory prefill: the prompt streams through in chunks, each
        attending causally to itself and fully to the (quantized) cache
        prefix — activations never exceed O(chunk * cache). Same contract as
        :meth:`prefill`."""
        b, s = tokens.shape
        assert s % chunk_size == 0, (s, chunk_size)
        assert s <= self.s_max, (
            f"prompt length {s} exceeds cache capacity s_max={self.s_max}")
        cache = self.init_cache(b)
        for start in range(0, s, chunk_size):
            logits, cache = self._prefill_chunk(
                params, cache, tokens[:, start:start + chunk_size], start)
        return logits[:, -1], cache

    @functools.partial(jax.jit, static_argnums=(0, 3, 5), donate_argnums=2)
    def decode_scan(self, params, cache: KVCache, max_new: int,
                    first_token: jnp.ndarray,
                    sampling: SamplingParams, key: jax.Array):
        """PUBLIC decode chain: sample ``max_new`` tokens per row from a
        filled cache in one on-device `lax.scan` (the serving hot loop
        `generate` runs after prefill). ``params`` are the
        `decode_params`-prepared weights. Returns ((b, max_new) int32
        tokens, final cache). This is the stable entry benchmarks and
        embedders time — bench.py's serving headline drives it directly,
        so its signature is part of the serving API surface."""
        def step(carry, skey):
            cache, tok = carry
            logits, cache = decode_step(params, cache, tok, self.cfg,
                                        interpret=self.interpret)
            nxt = sample_token(logits, sampling, skey)
            return (cache, nxt), tok

        keys = jax.random.split(key, max_new)
        (cache, _), toks = lax.scan(step, (cache, first_token), keys)
        return jnp.transpose(toks), cache  # (b, max_new)

    # internal spelling kept for existing callers
    _decode_scan = decode_scan

    def generate(self, params, prompt: jnp.ndarray, max_new: int, *,
                 sampling: SamplingParams = SamplingParams(),
                 key: Optional[jax.Array] = None) -> GenerationResult:
        """Generate max_new tokens per row (greedy unless `sampling` says
        otherwise). prompt (b, s) int32."""
        s = prompt.shape[1]
        if s + max_new > self.s_max:
            # dynamic_update_slice clamps out-of-range starts: overflow would
            # silently overwrite the last cache slot instead of failing
            raise ValueError(
                f"prompt ({s}) + max_new ({max_new}) exceeds cache capacity "
                f"s_max={self.s_max}")
        logits, cache = self.prefill(params, prompt)
        if key is None:
            key = jax.random.PRNGKey(0)
        key, fkey = jax.random.split(key)
        first = sample_token(logits, sampling, fkey)
        toks, cache = self._decode_scan(self.decode_params(params), cache,
                                        max_new, first, sampling, key)
        return GenerationResult(tokens=toks, cache=cache, prefill_logits=logits)
