"""Speculative decoding: a small draft model proposes, the target verifies.

Greedy speculative decoding (the deterministic special case of
Leviathan et al., arXiv:2211.17192): the draft model emits ``gamma`` tokens
autoregressively, then the target model scores ALL of them in one
`models.llama.decode_multi_step` forward (teacher-forced multi-token decode
against the cache). The longest draft prefix whose tokens equal the
target's own greedy choices is accepted, plus the target's correction (or
bonus) token — so every emitted token is exactly a target-greedy token, and
each round costs one target forward for up to ``gamma + 1`` emissions.

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
from long_context_attention_tpu.serving.engine import Engine

__all__ = ["SpeculativeEngine", "SpeculativeResult"]


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

    def __post_init__(self):
        assert self.cfg.vocab == self.draft_cfg.vocab, "vocabularies differ"
        assert self.gamma >= 1

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _draft_run(self, draft_params, dcache, t: jnp.ndarray):
        """gamma+1 greedy draft steps from last token t (b,). Returns the
        first gamma proposals (b, gamma) and the advanced draft cache. The
        extra step writes d_gamma's KV so a fully-accepted round leaves the
        draft cache covering every kept slot (its proposal is discarded)."""
        def step(carry, _):
            cache, tok = carry
            logits, cache = decode_step(draft_params, cache, tok,
                                        self.draft_cfg,
                                        interpret=self.interpret)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (cache, nxt), nxt

        (dcache, _), drafts = jax.lax.scan(step, (dcache, t), None,
                                           length=self.gamma + 1)
        return jnp.transpose(drafts)[:, :self.gamma], dcache  # (b, gamma)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _verify(self, params, tcache, toks: jnp.ndarray):
        """Target scores the run [t, d_1..d_gamma] (b, gamma+1) in one
        multi-token forward. Returns the target's greedy choice after each
        position (b, gamma+1) and the cache advanced by gamma+1."""
        logits, tcache = decode_multi_step(params, tcache, toks, self.cfg,
                                           interpret=self.interpret)
        return jnp.argmax(logits, -1).astype(jnp.int32), tcache

    def generate(self, params, draft_params, prompt: jnp.ndarray,
                 max_new: int) -> SpeculativeResult:
        """Greedy generation of ``max_new`` tokens per row."""
        b, s = prompt.shape
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

        t = jnp.argmax(tl, -1).astype(jnp.int32)       # (b,) first emission
        emitted: List[List[int]] = [[int(t[i])] for i in range(b)]
        rounds = drafted = accepted = 0
        while min(len(e) for e in emitted) < max_new:
            # host snapshot: _verify donates tcache, deleting its buffers
            base_len = np.asarray(tcache.length)        # (b,) == dcache's
            drafts, dcache = self._draft_run(draft_params, dcache, t)
            run = jnp.concatenate([t[:, None], drafts], axis=1)  # (b, g+1)
            choices, tcache = self._verify(params, tcache, run)

            d_np, c_np = np.asarray(drafts), np.asarray(choices)
            # row i accepts the longest draft prefix that matched the
            # target's own greedy choices (d_{j+1} == c_j), then emits the
            # target's correction — or, when all gamma matched, its bonus.
            # Rows that already hit max_new roll back ENTIRELY (keep ==
            # base) so their cache stops growing while slower rows finish.
            acc = np.zeros((b,), np.int32)
            adv = np.ones((b,), np.int32)
            nxt = np.zeros((b,), np.int32)
            for i in range(b):
                if len(emitted[i]) >= max_new:
                    adv[i] = 0
                    nxt[i] = int(np.asarray(t)[i])
                    continue
                a = 0
                while a < self.gamma and d_np[i, a] == c_np[i, a]:
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
