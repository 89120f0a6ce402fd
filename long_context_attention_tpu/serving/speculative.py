"""Speculative decoding: a small draft model proposes, the target verifies.

Leviathan-style speculative decoding (arXiv:2211.17192): the draft model
emits ``gamma`` tokens autoregressively, then the target model scores ALL
of them in one `models.llama.decode_multi_step` forward (teacher-forced
multi-token decode against the cache). Greedy mode (temperature 0) accepts
the longest draft prefix matching the target's own argmax choices — every
emitted token is exactly a target-greedy token. Sampled mode
(``sampling.temperature > 0``) runs the full acceptance rule — accept
d ~ q with prob min(1, p(d)/q(d)), fall back to normalize(max(p-q, 0)) —
whose output is distributed EXACTLY as direct sampling from the target
(`speculative_residual` + the closed-form identity test). Either way a
round costs one target forward for up to ``gamma + 1`` emissions.

Cache rollback is free by construction: `decode_multi_step` writes all
``gamma`` KVs in one in-place `cache_append` run, and rejecting a suffix
just resets ``length`` — dead slots are masked by every reader and get
overwritten by the next round's appends.

Per-row everything: positions, acceptance counts, and rollback lengths are
(b,) vectors, so batched requests accept different amounts per round.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from long_context_attention_tpu.models.llama import (
    ModelConfig,
    decode_multi_step,
    decode_step,
)
from long_context_attention_tpu.serving.engine import (
    Engine,
    SamplingParams,
    sampling_probs,
)

__all__ = ["SpeculativeEngine", "SpeculativeResult", "leviathan_accept",
           "speculative_residual"]


def speculative_residual(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Leviathan rejection residual: normalize(max(p - q, 0)) over the last
    axis. Sampling d ~ q, accepting with prob min(1, p(d)/q(d)), and
    falling back to this residual yields EXACTLY p — the identity
    `tests/test_speculative.py::test_acceptance_math_is_exact` checks."""
    r = jnp.maximum(p - q, 0.0)
    z = jnp.sum(r, axis=-1, keepdims=True)
    # p == q everywhere -> residual never sampled; any valid dist works
    safe = jnp.where(z > 0, r / jnp.maximum(z, 1e-37), p)
    return safe


def leviathan_accept(logits: jnp.ndarray, drafts: jnp.ndarray,
                     qdist: jnp.ndarray, sampling: SamplingParams,
                     key: jax.Array):
    """The Leviathan acceptance rule on target verify logits.

    logits (b, gamma+1, vocab) — position j's target logits follow
    ``toks[:, j]`` of the verify run [t, d_1..d_gamma]; drafts (b, gamma)
    were drawn from qdist (b, gamma, vocab). Returns (accept (b, gamma)
    bool — d_{j+1} passes the min(1, p_j(d)/q_j(d)) ratio test — and
    fallback (b, gamma+1) int32, where fallback[:, j] pre-samples the
    rejection residual at position j (the bonus p_gamma draw at
    j == gamma), so the caller just takes the first rejection's entry).
    Emitting the accepted prefix + fallback is distributed EXACTLY as
    sampling every token from the target (arXiv:2211.17192, Thm. 1).
    Shared by the single-chip and sharded verify paths — the math is
    rank-replicated, so sharded engines apply it to merged logits as-is."""
    p = sampling_probs(logits, sampling)      # (b, gamma+1, vocab)
    ku, kr = jax.random.split(key)
    p_d = jnp.take_along_axis(p[:, :-1], drafts[..., None],
                              axis=-1)[..., 0]      # (b, gamma)
    q_d = jnp.take_along_axis(qdist, drafts[..., None], axis=-1)[..., 0]
    u = jax.random.uniform(ku, drafts.shape)
    accept = u < jnp.minimum(1.0, p_d / jnp.maximum(q_d, 1e-37))

    resid = speculative_residual(p[:, :-1], qdist)  # (b, gamma, vocab)
    fb_dist = jnp.concatenate([resid, p[:, -1:]], axis=1)
    fallback = jax.random.categorical(
        kr, jnp.log(jnp.maximum(fb_dist, 1e-37)), axis=-1
    ).astype(jnp.int32)                       # (b, gamma+1)
    return accept, fallback


@dataclasses.dataclass
class SpeculativeResult:
    tokens: np.ndarray        # (b, max_new) emitted target-greedy tokens
    rounds: int               # verify rounds run
    drafted: int              # draft tokens proposed (b * gamma * rounds)
    accepted: int             # draft tokens accepted across all rows/rounds


@dataclasses.dataclass(frozen=True)
class SpeculativeEngine:
    """Greedy speculative decoding for the flagship model family.

    ``cfg``/``draft_cfg`` share the vocabulary; the draft is typically a
    much smaller config. Both models keep their own KV cache.
    """

    cfg: ModelConfig
    draft_cfg: ModelConfig
    s_max: int
    gamma: int = 4
    cache_dtype: str = "bfloat16"
    interpret: Optional[bool] = None
    # "int8": both models' DECODE weights quantize to w8a8 (ops/wquant.py)
    # after prefill. With sampling, acceptance stays exact w.r.t. the
    # distribution the quantized target actually computes.
    weight_dtype: str = "bfloat16"

    def __post_init__(self):
        assert self.cfg.vocab == self.draft_cfg.vocab, "vocabularies differ"
        assert self.gamma >= 1

    def _decode_params(self, p):
        if self.weight_dtype == "bfloat16":
            return p
        assert self.weight_dtype == "int8", self.weight_dtype
        from long_context_attention_tpu.ops.wquant import (
            quantize_decode_params,
        )
        return quantize_decode_params(p)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _draft_run(self, draft_params, dcache, t: jnp.ndarray,
                   active: Optional[jnp.ndarray] = None):
        """gamma+1 greedy draft steps from last token t (b,). Returns the
        first gamma proposals (b, gamma) and the advanced draft cache. The
        extra step writes d_gamma's KV so a fully-accepted round leaves the
        draft cache covering every kept slot (its proposal is discarded).
        ``active`` (continuous batching): inactive rows write nothing,
        advance nothing, and keep emitting their input token."""
        def step(carry, _):
            cache, tok = carry
            logits, cache = decode_step(draft_params, cache, tok,
                                        self.draft_cfg,
                                        interpret=self.interpret,
                                        active=active)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            if active is not None:
                nxt = jnp.where(active, nxt, tok)
            return (cache, nxt), nxt

        (dcache, _), drafts = jax.lax.scan(step, (dcache, t), None,
                                           length=self.gamma + 1)
        return jnp.transpose(drafts)[:, :self.gamma], dcache  # (b, gamma)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _verify(self, params, tcache, toks: jnp.ndarray,
                active: Optional[jnp.ndarray] = None):
        """Target scores the run [t, d_1..d_gamma] (b, gamma+1) in one
        multi-token forward. Returns the target's greedy choice after each
        position (b, gamma+1) and the cache advanced by gamma+1."""
        logits, tcache = decode_multi_step(params, tcache, toks, self.cfg,
                                           interpret=self.interpret,
                                           active=active)
        return jnp.argmax(logits, -1).astype(jnp.int32), tcache

    @functools.partial(jax.jit, static_argnums=(0, 4), donate_argnums=2)
    def _draft_run_sampled(self, draft_params, dcache, t: jnp.ndarray,
                           sampling: SamplingParams, key: jax.Array,
                           active: Optional[jnp.ndarray] = None):
        """gamma+1 SAMPLED draft steps. Returns (drafts (b, gamma),
        qdist (b, gamma, vocab) — the post-transform distributions the
        drafts were actually drawn from — and the advanced cache)."""
        def step(carry, skey):
            cache, tok = carry
            logits, cache = decode_step(draft_params, cache, tok,
                                        self.draft_cfg,
                                        interpret=self.interpret,
                                        active=active)
            q = sampling_probs(logits, sampling)
            nxt = jax.random.categorical(
                skey, jnp.log(jnp.maximum(q, 1e-37)), axis=-1
            ).astype(jnp.int32)
            if active is not None:
                nxt = jnp.where(active, nxt, tok)
            return (cache, nxt), (nxt, q)

        keys = jax.random.split(key, self.gamma + 1)
        (dcache, _), (drafts, qd) = jax.lax.scan(step, (dcache, t), keys)
        return (jnp.transpose(drafts)[:, :self.gamma],
                jnp.transpose(qd, (1, 0, 2))[:, :self.gamma], dcache)

    @functools.partial(jax.jit, static_argnums=(0, 6), donate_argnums=2)
    def _verify_sampled(self, params, tcache, toks, drafts, qdist,
                        sampling: SamplingParams, key: jax.Array,
                        active: Optional[jnp.ndarray] = None):
        """Leviathan acceptance. toks (b, gamma+1) = [t, d_1..d_gamma];
        position j's target distribution p_j follows toks[:, j]. Draft
        d_{j+1} (= drafts[:, j], drawn from qdist[:, j]) is accepted with
        prob min(1, p_j(d)/q_j(d)); fallback[:, j] pre-samples the
        rejection residual (and the bonus p_gamma at j == gamma), so the
        host just takes the first rejection's fallback. Emitting the
        accepted prefix + fallback is distributed EXACTLY as sampling every
        token from the target (arXiv:2211.17192, Thm. 1)."""
        logits, tcache = decode_multi_step(params, tcache, toks, self.cfg,
                                           interpret=self.interpret,
                                           active=active)
        accept, fallback = leviathan_accept(logits, drafts, qdist,
                                            sampling, key)
        return accept, fallback, tcache

    def generate(self, params, draft_params, prompt: jnp.ndarray,
                 max_new: int, *,
                 sampling: SamplingParams = SamplingParams(),
                 key: Optional[jax.Array] = None) -> SpeculativeResult:
        """Generate ``max_new`` tokens per row. Greedy by default; with
        ``sampling.temperature > 0`` runs full Leviathan speculative
        sampling — the emitted sequence is distributed exactly as direct
        sampling from the target."""
        b, s = prompt.shape
        sampled = sampling.temperature > 0.0
        key = jax.random.PRNGKey(0) if key is None else key
        if s + max_new + self.gamma > self.s_max:
            raise ValueError(
                f"prompt ({s}) + max_new ({max_new}) + gamma ({self.gamma}) "
                f"exceeds cache capacity s_max={self.s_max}")
        teng = Engine(self.cfg, s_max=self.s_max,
                      cache_dtype=self.cache_dtype, interpret=self.interpret)
        deng = Engine(self.draft_cfg, s_max=self.s_max,
                      cache_dtype=self.cache_dtype, interpret=self.interpret)
        tl, tcache = teng.prefill(params, prompt)
        _, dcache = deng.prefill(draft_params, prompt)
        # decode rounds run on (optionally int8-quantized) weights; the
        # prefill above used the original bf16 params
        params = self._decode_params(params)
        draft_params = self._decode_params(draft_params)

        if sampled:
            from long_context_attention_tpu.serving.engine import sample_token
            key, k0 = jax.random.split(key)
            t = sample_token(tl, sampling, k0)          # (b,) first emission
        else:
            t = jnp.argmax(tl, -1).astype(jnp.int32)
        emitted: List[List[int]] = [[int(t[i])] for i in range(b)]
        rounds = drafted = accepted = 0
        while min(len(e) for e in emitted) < max_new:
            # host snapshot: _verify donates tcache, deleting its buffers
            base_len = np.asarray(tcache.length)        # (b,) == dcache's
            if sampled:
                key, kd, kv = jax.random.split(key, 3)
                drafts, qdist, dcache = self._draft_run_sampled(
                    draft_params, dcache, t, sampling, kd)
                run = jnp.concatenate([t[:, None], drafts], axis=1)
                accept_m, fallback, tcache = self._verify_sampled(
                    params, tcache, run, drafts, qdist, sampling, kv)
                acc_np = np.asarray(accept_m)
                d_np = np.asarray(drafts)
                # choices[:, j] plays the fallback role: the token emitted
                # when the prefix ends at position j
                c_np = np.asarray(fallback)
            else:
                drafts, dcache = self._draft_run(draft_params, dcache, t)
                run = jnp.concatenate([t[:, None], drafts], axis=1)
                choices, tcache = self._verify(params, tcache, run)
                d_np, c_np = np.asarray(drafts), np.asarray(choices)
                acc_np = d_np == c_np[:, :self.gamma]
            # row i accepts the longest draft prefix the target ratified
            # (greedy: d_{j+1} == target argmax; sampled: the Leviathan
            # ratio test), then emits the correction/residual — or, when
            # all gamma passed, the bonus. Rows that already hit max_new
            # roll back ENTIRELY (keep == base) so their cache stops
            # growing while slower rows finish.
            acc = np.zeros((b,), np.int32)
            adv = np.ones((b,), np.int32)
            nxt = np.zeros((b,), np.int32)
            for i in range(b):
                if len(emitted[i]) >= max_new:
                    adv[i] = 0
                    nxt[i] = int(np.asarray(t)[i])
                    continue
                a = 0
                while a < self.gamma and acc_np[i, a]:
                    a += 1
                acc[i] = a
                nxt[i] = c_np[i, a]
                emitted[i].extend(
                    [int(x) for x in d_np[i, :a]] + [int(c_np[i, a])])
                drafted += self.gamma
                accepted += a
            rounds += 1
            # roll both caches back to the kept prefix [.., t, d_1..d_acc];
            # the next round's verify re-appends from there. Each cache gets
            # its OWN length buffer — sharing one array between two donated
            # pytrees lets the first donation delete the other's field
            keep = base_len + adv * (acc + 1)
            tcache = dataclasses.replace(tcache, length=jnp.asarray(keep))
            dcache = dataclasses.replace(dcache,
                                         length=jnp.asarray(keep.copy()))
            t = jnp.asarray(nxt, jnp.int32)

        toks = np.asarray([e[:max_new] for e in emitted], np.int32)
        return SpeculativeResult(tokens=toks, rounds=rounds,
                                 drafted=drafted, accepted=accepted)
