"""Multi-chip generation engine: sequence-sharded KV cache over the mesh.

The 1M-token serving path (north star): prompts prefill with the USP-sharded
model forward, each device keeps its own contiguous block of cache slots
(sharded over ``(ring, ulysses)`` — both axes hold sequence shards during
serving), and every decode step runs under one ``shard_map``: replicated
single-token compute, owner-routed cache append, cross-shard LSE-merged
decode attention (serving/sharded.py). Weights stay replicated; only the
cache is distributed, so per-chip HBM bounds only ``s_max / n_chips`` tokens.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from long_context_attention_tpu.models.llama import (
    ModelConfig,
    decode_step,
    forward_local,
)
from long_context_attention_tpu.ops.kv_cache import KVCache, quantize_kv
from long_context_attention_tpu.parallel.mesh import MeshAxes

__all__ = ["ShardedEngine"]


@dataclasses.dataclass(frozen=True)
class ShardedEngine:
    """Generation over a mesh with a sequence-sharded cache.

    Requirements: prompt length and ``s_max`` divisible by the total
    sequence-shard count (ring * ulysses). Any training ``layout`` serves:
    prompts are permuted into the layout for the USP prefill (so zigzag/
    stripe-trained models prefill exactly as they trained), then the
    per-layer KV reshuffles ONCE into natural slot order (a single static
    permutation of the sequence axis — GSPMD lowers it to one all_to_all
    among the sequence shards, the layout-duality move of
    `yunchang/comm/extract_local.py:29-49` run in reverse) so decode serves
    from a contiguous cache.
    """

    cfg: ModelConfig
    mesh: Mesh
    s_max: int
    cache_dtype: str = "bfloat16"
    axes: MeshAxes = MeshAxes()
    interpret: Optional[bool] = None

    @property
    def seq_axes(self):
        return (self.axes.ring, self.axes.ulysses)

    def _cache_specs(self) -> KVCache:
        """Pytree of PartitionSpecs matching KVCache fields (slot axis 3
        for values, 4 for the unit-dim scale layout)."""
        val = P(None, None, None, self.seq_axes, None)
        sc = (None if self.cache_dtype == "bfloat16"
              else P(None, None, None, None, self.seq_axes))
        return KVCache(k=val, v=val, k_scale=sc, v_scale=sc, length=P())

    @functools.partial(jax.jit, static_argnums=0)
    def prefill(self, params, tokens: jnp.ndarray,
                last_index: Optional[jnp.ndarray] = None,
                ) -> Tuple[jnp.ndarray, KVCache]:
        """tokens (b, s) in NATURAL order -> (last-token logits (b, vocab),
        sharded cache in natural slot order).

        ``last_index``: optional traced NATURAL-order position whose logits
        to return instead of s-1 — bucketed prompts (continuous batching)
        pad past the true last token; the layout permutation is applied
        here."""
        from long_context_attention_tpu.parallel.layouts import (
            layout_permutation,
            permute_for_layout,
            unpermute_from_layout,
        )

        b, s = tokens.shape
        ring = self.mesh.shape[self.axes.ring]
        n_seq = ring * self.mesh.shape[self.axes.ulysses]
        s_local = s // n_seq
        tok_spec = P(None, self.seq_axes)
        tokens = permute_for_layout(tokens, self.cfg.layout, ring, axis=1)
        # the last natural token sits at a traced PERMUTED index; only its
        # shard projects it through lm_head (clipped no-op rows elsewhere)
        # and one (b, vocab) psum replicates the result — the full
        # (b, s, vocab) fp32 logits tensor (bucket x vocab waste, the
        # admission memory hot spot) is never materialized.
        natural_last = (jnp.int32(s - 1) if last_index is None
                        else jnp.asarray(last_index, jnp.int32))
        if self.cfg.layout != "basic":
            perm = layout_permutation(self.cfg.layout, ring, s)
            last_idx = jnp.argmax(jnp.asarray(perm) == natural_last)
        else:
            last_idx = natural_last

        def fwd(params, tokens, last_idx):
            r = lax.axis_index(self.seq_axes)
            li = last_idx - r * s_local
            owns = (li >= 0) & (li < s_local)
            logits, kv = forward_local(params, tokens, self.cfg,
                                       ulysses_axis=self.axes.ulysses,
                                       ring_axis=self.axes.ring,
                                       interpret=self.interpret,
                                       return_kv=True,
                                       last_index=jnp.clip(li, 0, s_local - 1))
            logits = jnp.where(owns, logits[:, 0], 0.0)
            return lax.psum(logits, self.seq_axes), kv

        logits, (kk, vv) = jax.shard_map(
            fwd, mesh=self.mesh,
            in_specs=(P(), tok_spec, P()),
            out_specs=(P(),
                       (P(None, None, self.seq_axes, None, None),) * 2),
            check_vma=False,
        )(params, tokens, last_idx)
        # kk/vv: (L, b, s, h_kv, d) sharded over the sequence axis, in layout
        # order. Reshuffle ONCE to natural order for contiguous cache slots.
        if self.cfg.layout != "basic":
            kk = unpermute_from_layout(kk, self.cfg.layout, ring, axis=2)
            vv = unpermute_from_layout(vv, self.cfg.layout, ring, axis=2)
            kv_sh = NamedSharding(self.mesh,
                                  P(None, None, self.seq_axes, None, None))
            kk = lax.with_sharding_constraint(kk, kv_sh)
            vv = lax.with_sharding_constraint(vv, kv_sh)

        dt = self.cache_dtype
        kq, ks = quantize_kv(jnp.transpose(kk, (0, 1, 3, 2, 4)), dt)
        vq, vs = quantize_kv(jnp.transpose(vv, (0, 1, 3, 2, 4)), dt)
        ks, vs = KVCache.scale_5d(ks), KVCache.scale_5d(vs)
        # pad to s_max on the slot axis; keep the shard mapping aligned
        val_sh = NamedSharding(self.mesh, P(None, None, None, self.seq_axes, None))
        sc_sh = NamedSharding(self.mesh,
                              P(None, None, None, None, self.seq_axes))

        def pad(x, sh, axis):
            shape = x.shape[:axis] + (self.s_max,) + x.shape[axis + 1:]
            buf = jnp.zeros(shape, x.dtype)
            buf = lax.dynamic_update_slice(buf, x, (0,) * x.ndim)
            return lax.with_sharding_constraint(buf, sh)

        cache = KVCache(
            k=pad(kq, val_sh, 3), v=pad(vq, val_sh, 3),
            k_scale=None if ks is None else pad(ks, sc_sh, 4),
            v_scale=None if vs is None else pad(vs, sc_sh, 4),
            length=jnp.full((b,), s, jnp.int32),
        )
        return logits, cache

    @functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=2)
    def _decode_scan(self, params, cache: KVCache, max_new: int,
                     first_token: jnp.ndarray):
        specs = self._cache_specs()

        def local_steps(params, cache, first):
            def step(carry, _):
                cache, tok = carry
                logits, cache = decode_step(
                    params, cache, tok, self.cfg, interpret=self.interpret,
                    shard_axes=self.seq_axes)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (cache, nxt), tok

            (cache, _), toks = lax.scan(step, (cache, first), length=max_new)
            return jnp.transpose(toks), cache

        return jax.shard_map(
            local_steps, mesh=self.mesh,
            in_specs=(P(), specs, P()),
            out_specs=(P(), specs),
            check_vma=False,
        )(params, cache, first_token)

    def generate(self, params, prompt: jnp.ndarray, max_new: int):
        s = prompt.shape[1]
        if s + max_new > self.s_max:
            # overflow would clamp-and-overwrite the last slot silently
            raise ValueError(
                f"prompt ({s}) + max_new ({max_new}) exceeds cache capacity "
                f"s_max={self.s_max}")
        logits, cache = self.prefill(params, prompt)
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks, cache = self._decode_scan(params, cache, max_new, first)
        return toks, cache, logits
