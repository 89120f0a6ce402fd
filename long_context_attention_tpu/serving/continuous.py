"""Continuous batching: request-level scheduling over a shared decode batch.

The reference stops at a training-time attention layer; SURVEY.md §7 step 7
("prefill/decode with continuous batching") is the serving north star this
module completes. The engine keeps a fixed decode batch of ``max_batch``
rows. Every model step decodes ALL rows in one jitted `decode_step`; rows
whose request finished are freed immediately and the next queued request is
admitted into the free row without stopping the others — the property that
makes serving throughput batch-shaped instead of request-shaped (Orca-style
iteration-level scheduling, re-expressed for a static-shape XLA program):

* the jitted step is shape-static (`b = max_batch` always); scheduling state
  lives in per-row ``length``/``active`` vectors, not in shapes;
* per-row cache isolation is free: `ops/decode.py` attention is gated by
  per-row ``lengths``, and `cache_append` skips rows with ``append_pos=-1``
  (the in-place aliased splice kernel), so a fresh request simply resets its
  row's length;
* admission = one bucketed single-row prefill (padded to the bucket so each
  bucket compiles once) + one donated in-place row insert.

The decode loop syncs one (max_batch,) token vector to the host per step
(block) — needed for EOS detection and admission. Two independent levers
remove that round trip from the critical path: ``step_block > 1`` amortizes
it over K device steps, and ``host_overlap=True`` software-pipelines the
scheduler one block behind the device (block i+1 is dispatched before block
i's tokens are fetched, so host bookkeeping runs UNDER device compute —
greedy results are identical to the sequential loop).
"""

from __future__ import annotations

import collections
import dataclasses
import functools
from collections import deque
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from long_context_attention_tpu.models.llama import (
    ModelConfig,
    decode_multi_step,
    decode_step,
    forward_local,
)
from long_context_attention_tpu.ops.kv_cache import KVCache, quantize_kv
from long_context_attention_tpu.parallel.mesh import make_usp_mesh
from long_context_attention_tpu.serving.engine import (
    SamplingParams,
    sample_token,
    token_logprob,
)

__all__ = ["Request", "RequestResult", "ContinuousEngine",
           "PagedContinuousEngine", "ShardedContinuousEngine",
           "SpeculativeContinuousEngine",
           "ShardedSpeculativeContinuousEngine"]


@dataclasses.dataclass(frozen=True)
class Request:
    """One generation request. ``tokens``: 1-d int32 prompt."""

    id: int
    tokens: Sequence[int]
    max_new: int


@dataclasses.dataclass
class RequestResult:
    id: int
    tokens: List[int]          # generated ids (stops at eos, inclusive)
    prompt_len: int
    # log P(token) under softmax(raw logits) per generated token, aligned
    # with ``tokens`` — populated when the engine has return_logprobs=True
    logprobs: Optional[List[float]] = None


def _bucket(n: int, quantum: int = 64, cap: int = 2048) -> int:
    """Pad prompts to compile buckets: powers of two up to ``cap``, then
    multiples of ``cap`` — O(log) distinct shapes for short prompts,
    bounded padding waste (< cap instead of < n) for long ones. A 16.4K
    prompt pads to 18432, not 32768 — halving its admission prefill work
    and keeping its page span inside the row's table. Multiples of 2048
    stay divisible by any power-of-two shard count (the sharded engines'
    bucket-divisibility requirement)."""
    b = quantum
    while b < min(n, cap):
        b *= 2
    if n <= b:
        return b
    return -(-n // cap) * cap


@dataclasses.dataclass(frozen=True)
class ContinuousEngine:
    """Iteration-level scheduler over a fixed ``max_batch`` decode batch."""

    cfg: ModelConfig
    s_max: int
    max_batch: int = 8
    cache_dtype: str = "bfloat16"
    interpret: Optional[bool] = None
    # decode steps per host sync (EOS detection + admission happen at block
    # boundaries): >1 amortizes the host round trip at the cost of up to
    # step_block-1 wasted row-steps after a mid-block finish
    step_block: int = 1
    # software-pipeline the host scheduler one block behind the device:
    # block i+1 is dispatched BEFORE block i's tokens sync to the host, so
    # EOS bookkeeping + admission decisions run UNDER device compute and the
    # device never idles on the host round trip. Greedy results are
    # identical to the sequential loop; sampled runs are exact draws from
    # the same distributions but may consume PRNG blocks in a different
    # order (a freed row is re-admitted one block later than the sequential
    # scheduler would).
    host_overlap: bool = False
    # "int8": decode steps run with w8a8-quantized weights (ops/wquant.py),
    # halving the per-step weight stream; admission prefill stays bf16
    weight_dtype: str = "bfloat16"
    # report log P(token) for every generated token (RequestResult.logprobs)
    # — one extra log_softmax gather per step, rides the existing host sync
    return_logprobs: bool = False

    def decode_params(self, params):
        """Params pytree for the decode steps (int8 QTensor weights when
        ``weight_dtype="int8"``; admission prefill keeps bf16 params)."""
        if self.weight_dtype == "bfloat16":
            return params
        assert self.weight_dtype == "int8", self.weight_dtype
        assert not self.cfg.moe, "int8 decode weights: MoE experts stay bf16"
        from long_context_attention_tpu.ops.wquant import (
            quantize_decode_params,
        )
        return quantize_decode_params(params)

    def init_cache(self) -> KVCache:
        return KVCache.init(self.cfg.n_layers, self.max_batch, self.s_max,
                            self.cfg.n_kv_heads, self.cfg.head_dim,
                            self.cache_dtype)

    # --- jitted pieces -----------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def _prefill_one(self, params, tokens: jnp.ndarray,
                     last_index: jnp.ndarray):
        """(1, bucket) padded prompt -> (next-token logits (1, vocab) fp32,
        (kv_k, kv_v) (L, 1, bucket, h_kv, d)). Padding rides along; only
        the true last token (traced ``last_index``, so every prompt length
        in a bucket shares one compilation) projects through lm_head — the
        full bucket x vocab fp32 logits were admission's memory hot spot —
        and the row insert stores only slots the row's ``length`` exposes."""
        mesh = make_usp_mesh(1, 1, 1, devices=jax.devices()[:1])

        def fwd(params, tokens, last_index):
            logits, kv = forward_local(params, tokens, self.cfg,
                                       ulysses_axis="ulysses",
                                       ring_axis="ring",
                                       interpret=self.interpret,
                                       return_kv=True,
                                       last_index=last_index)
            return logits[:, 0], kv

        return jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec(),) * 3,
            out_specs=jax.sharding.PartitionSpec(),
            check_vma=False,
        )(params, tokens, last_index)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _insert_row(self, cache: KVCache, kv_k, kv_v, row: jnp.ndarray,
                    true_len: jnp.ndarray) -> KVCache:
        """Quantize a prefilled row's KV and splice it into the shared cache
        at batch row ``row`` (donated: in place). kv_k/kv_v (L, 1, s, h, d)
        -> cache layout (L, b, h, s_max, d) slots [0, s)."""
        kb = jnp.transpose(kv_k, (0, 1, 3, 2, 4))  # (L, 1, h, s, d)
        vb = jnp.transpose(kv_v, (0, 1, 3, 2, 4))
        kq, ks = quantize_kv(kb, self.cache_dtype)
        vq, vs = quantize_kv(vb, self.cache_dtype)
        start = (jnp.int32(0), row.astype(jnp.int32), jnp.int32(0),
                 jnp.int32(0), jnp.int32(0))
        k = jax.lax.dynamic_update_slice(cache.k, kq, start)
        v = jax.lax.dynamic_update_slice(cache.v, vq, start)
        ksc, vsc = cache.k_scale, cache.v_scale
        if ksc is not None:
            # scales live 5-d (L, b, h, 1, s_max) — insert the unit dim
            ksc = jax.lax.dynamic_update_slice(ksc, KVCache.scale_5d(ks),
                                               start)
            vsc = jax.lax.dynamic_update_slice(vsc, KVCache.scale_5d(vs),
                                               start)
        length = cache.length.at[row].set(true_len.astype(jnp.int32))
        return dataclasses.replace(cache, k=k, v=v, k_scale=ksc, v_scale=vsc,
                                   length=length)

    def _decode_one(self, params, cache: KVCache, tokens, active):
        """One masked decode step (traced; overridden by the sharded
        engine with the shard_map'd variant)."""
        return decode_step(params, cache, tokens, self.cfg,
                           interpret=self.interpret, active=active)

    @functools.partial(jax.jit, static_argnums=(0, 4), donate_argnums=2)
    def _step(self, params, cache: KVCache, tokens: jnp.ndarray,
              sampling: SamplingParams, active: jnp.ndarray,
              key: jax.Array):
        # the cache is DONATED: without it the in-place append kernel's
        # aliasing stops at the jit boundary and XLA copies the full
        # multi-GB cache every step
        logits, cache = self._decode_one(params, cache, tokens, active)
        nxt = sample_token(logits, sampling, key)
        lp = token_logprob(logits, nxt) if self.return_logprobs else None
        return nxt, lp, cache

    @functools.partial(jax.jit, static_argnums=(0, 4), donate_argnums=2)
    def _step_block(self, params, cache: KVCache, tokens: jnp.ndarray,
                    sampling: SamplingParams, active: jnp.ndarray,
                    budget: jnp.ndarray, key: jax.Array, eos: jnp.ndarray):
        """``step_block`` decode steps in ONE device program: per-row EOS
        and budget tracking runs on device, so the host syncs once per
        block instead of once per token (the per-step host round trip —
        ~30 ms through this image's tunnel — otherwise dominates). Rows
        that finish mid-block deactivate in place; the host replays the
        same done logic on the emitted (b, K) tokens, so results are
        IDENTICAL to step_block=1 under greedy decoding."""
        def step(carry, skey):
            cache, tok, act, left = carry
            logits, cache = self._decode_one(params, cache, tok, act)
            nxt = sample_token(logits, sampling, skey)
            lp = token_logprob(logits, nxt) if self.return_logprobs else None
            nxt = jnp.where(act, nxt, tok)
            left = left - act.astype(jnp.int32)
            done = (left <= 0) | ((eos >= 0) & (nxt == eos))
            act = act & ~done
            return (cache, nxt, act, left), (nxt, lp)

        keys = jax.random.split(key, self.step_block)
        (cache, _, _, _), (toks, lps) = jax.lax.scan(
            step, (cache, tokens, active, budget), keys)
        lps = jnp.transpose(lps) if self.return_logprobs else None
        return jnp.transpose(toks), lps, cache

    @functools.partial(jax.jit, static_argnums=(0, 4), donate_argnums=2)
    def _step_block_carry(self, params, cache: KVCache, tokens: jnp.ndarray,
                          sampling: SamplingParams, active: jnp.ndarray,
                          budget: jnp.ndarray, key: jax.Array,
                          eos: jnp.ndarray):
        """`_step_block` that also returns its (tokens, active, budget)
        carry, so the NEXT block launches purely from device state — the
        host-overlap scheduler's step (``host_overlap=True``): no host
        input stands between consecutive blocks."""
        def step(carry, skey):
            cache, tok, act, left = carry
            logits, cache = self._decode_one(params, cache, tok, act)
            nxt = sample_token(logits, sampling, skey)
            lp = token_logprob(logits, nxt) if self.return_logprobs else None
            nxt = jnp.where(act, nxt, tok)
            left = left - act.astype(jnp.int32)
            done = (left <= 0) | ((eos >= 0) & (nxt == eos))
            act = act & ~done
            return (cache, nxt, act, left), (nxt, lp)

        keys = jax.random.split(key, max(1, self.step_block))
        (cache, tok, act, left), (toks, lps) = jax.lax.scan(
            step, (cache, tokens, active, budget), keys)
        lps = jnp.transpose(lps) if self.return_logprobs else None
        return jnp.transpose(toks), lps, cache, tok, act, left

    @functools.partial(jax.jit, static_argnums=0)
    def _admit_vecs(self, tok, act, left, bi, first, budget):
        """Activate batch row ``bi`` in the device-resident scheduler
        vectors (host-overlap admission; all args traced — one compile)."""
        return (tok.at[bi].set(first), act.at[bi].set(True),
                left.at[bi].set(budget))

    def _can_admit(self, req: Request, bi: int) -> bool:
        """Backpressure hook: may request ``req`` be admitted into row
        ``bi`` right now? The paged engine refuses when the page pool
        (plus row bi's reclaimable pages) can't cover the request; the
        scheduler then retries at the next block boundary."""
        return True

    def _sample_first(self, logits, sampling: SamplingParams,
                      key: jax.Array):
        """Admission epilogue shared by every engine: sample the first
        token from the prefill logits; returns (int token, logprob|None)."""
        first = sample_token(logits, sampling, key)
        lp = (float(token_logprob(logits, first)[0])
              if self.return_logprobs else None)
        return int(first[0]), lp

    def _admit_row(self, params, cache, req: Request, bi: int,
                   sampling: SamplingParams, key: jax.Array):
        """Prefill one request and insert it at batch row ``bi``.
        Returns (cache, first sampled token id, its logprob|None).
        Overridden by the sharded engine; the host scheduler is shared."""
        n = len(req.tokens)
        pad = _bucket(n)
        toks = np.zeros((1, pad), np.int32)
        toks[0, :n] = np.asarray(req.tokens, np.int32)
        logits, (kv_k, kv_v) = self._prefill_one(params, jnp.asarray(toks),
                                                 jnp.int32(n - 1))
        cache = self._insert_row(cache, kv_k, kv_v,
                                 jnp.int32(bi), jnp.int32(n))
        first, lp = self._sample_first(logits, sampling, key)
        return cache, first, lp

    # --- host-side scheduler ----------------------------------------------

    def serve(self, params, requests: Sequence[Request], *,
              sampling: SamplingParams = SamplingParams(),
              eos_id: Optional[int] = None,
              key: Optional[jax.Array] = None) -> Dict[int, RequestResult]:
        """Run all requests to completion; returns {request.id: result}.

        Admission happens the moment a row frees up — no barrier between
        requests, decode keeps stepping for the rows still running.
        """
        B = self.max_batch
        for r in requests:
            if len(r.tokens) + r.max_new > self.s_max:
                raise ValueError(
                    f"request {r.id}: prompt ({len(r.tokens)}) + max_new "
                    f"({r.max_new}) exceeds cache capacity s_max={self.s_max}")
        if self.host_overlap:
            return self._serve_overlapped(params, requests, sampling=sampling,
                                          eos_id=eos_id, key=key)
        queue = deque(requests)
        cache = self.init_cache()
        dparams = self.decode_params(params)
        slot: List[Optional[Request]] = [None] * B
        emitted: List[List[int]] = [[] for _ in range(B)]
        lps = [[] for _ in range(B)] if self.return_logprobs else None
        cur = np.zeros((B,), np.int32)
        results: Dict[int, RequestResult] = {}
        key = jax.random.PRNGKey(0) if key is None else key

        def admit():
            nonlocal cache
            for bi in range(B):
                if slot[bi] is not None or not queue:
                    continue
                if not self._can_admit(queue[0], bi):
                    continue
                req = queue.popleft()
                skey = jax.random.fold_in(key, req.id)
                cache, first, flp = self._admit_row(params, cache, req, bi,
                                                    sampling, skey)
                slot[bi] = req
                emitted[bi] = [first]
                if lps is not None:
                    lps[bi] = [flp]
                cur[bi] = first
                self._maybe_finish(bi, slot, emitted, results, eos_id, lps)

        def live_mask():
            return jnp.asarray([s is not None for s in slot], jnp.bool_)

        while queue or any(s is not None for s in slot):
            admit()
            if not any(s is not None for s in slot):
                continue  # everything admitted finished at its first token
            key, skey = jax.random.split(key)
            if self.step_block <= 1:
                nxt, lp, cache = self._step(dparams, cache, jnp.asarray(cur),
                                            sampling, live_mask(), skey)
                nxt = np.asarray(nxt)[:, None]
                lp = np.asarray(lp)[:, None] if lps is not None else None
            else:
                budget = np.asarray(
                    [slot[bi].max_new - len(emitted[bi])
                     if slot[bi] is not None else 0 for bi in range(B)],
                    np.int32)
                nxt, lp, cache = self._step_block(
                    dparams, cache, jnp.asarray(cur), sampling, live_mask(),
                    jnp.asarray(budget), skey,
                    jnp.int32(-1 if eos_id is None else eos_id))
                nxt = np.asarray(nxt)
                lp = np.asarray(lp) if lps is not None else None
            for j in range(nxt.shape[1]):
                for bi in range(B):
                    if slot[bi] is None:
                        continue
                    emitted[bi].append(int(nxt[bi, j]))
                    if lps is not None:
                        lps[bi].append(float(lp[bi, j]))
                    cur[bi] = int(nxt[bi, j])
                    self._maybe_finish(bi, slot, emitted, results, eos_id,
                                       lps)
            # sliding-window page bookkeeping (PagedContinuousEngine
            # override; no-op for dense engines): assign fresh pages the
            # next block will write, free pages that slid behind the window
            cache = self._post_block(cache, slot, emitted)
        return results

    def _post_block(self, cache, slot, emitted):
        """Hook after each decode block (host-side lengths current): the
        paged engine reclaims / assigns sliding-window pages here; dense
        engines do nothing. Not called on the host_overlap path (its host
        lengths lag the device by a block; windowed paging requires the
        plain or interleaved scheduler)."""
        return cache

    def _serve_overlapped(self, params, requests: Sequence[Request], *,
                          sampling: SamplingParams = SamplingParams(),
                          eos_id: Optional[int] = None,
                          key: Optional[jax.Array] = None
                          ) -> Dict[int, RequestResult]:
        """One-block-deep software pipeline of `serve`: the scheduler state
        (tokens, active mask, per-row budget) lives ON DEVICE, block i+1 is
        enqueued before block i's tokens are fetched, and the host consumes
        block i's tokens (EOS bookkeeping, finishing requests, admission
        decisions) while the device runs block i+1. The device therefore
        never waits for the host round trip — the remaining overheads are
        one wasted block per row between its finish and its slot's
        re-admission (the pipeline's one-block knowledge lag) and the
        admission prefill itself.

        Correctness: a row that finishes mid-pipeline was ALREADY
        deactivated by the device's own done rule (same budget/EOS logic
        the host replays), so the in-flight block writes nothing to it and
        re-admission enqueues strictly after that block.
        """
        B = self.max_batch
        queue = deque(requests)
        cache = self.init_cache()
        dparams = self.decode_params(params)
        slot: List[Optional[Request]] = [None] * B
        emitted: List[List[int]] = [[] for _ in range(B)]
        lps = [[] for _ in range(B)] if self.return_logprobs else None
        results: Dict[int, RequestResult] = {}
        key = jax.random.PRNGKey(0) if key is None else key
        tok_d = jnp.zeros((B,), jnp.int32)
        act_d = jnp.zeros((B,), jnp.bool_)
        left_d = jnp.zeros((B,), jnp.int32)
        eos = jnp.int32(-1 if eos_id is None else eos_id)

        def admit():
            nonlocal cache, tok_d, act_d, left_d
            for bi in range(B):
                if slot[bi] is not None or not queue:
                    continue
                if not self._can_admit(queue[0], bi):
                    continue
                req = queue.popleft()
                skey = jax.random.fold_in(key, req.id)
                cache, first, flp = self._admit_row(params, cache, req, bi,
                                                    sampling, skey)
                slot[bi] = req
                emitted[bi] = [first]
                if lps is not None:
                    lps[bi] = [flp]
                self._maybe_finish(bi, slot, emitted, results, eos_id, lps)
                if slot[bi] is not None:
                    tok_d, act_d, left_d = self._admit_vecs(
                        tok_d, act_d, left_d, jnp.int32(bi),
                        jnp.int32(first), jnp.int32(req.max_new - 1))

        admit()
        # pending = (block i-1's token futures, row->request-id snapshot at
        # DISPATCH time). The snapshot matters: a row freed in block i-1 and
        # re-admitted before block i-1's tokens are processed would
        # otherwise swallow the OLD request's inactive repeat-tokens into
        # the NEW request's stream.
        pending = None
        while queue or any(s is not None for s in slot) or pending is not None:
            nxt_block = None
            if any(s is not None for s in slot):
                key, skey = jax.random.split(key)
                toks, lpb, cache, tok_d, act_d, left_d = \
                    self._step_block_carry(dparams, cache, tok_d, sampling,
                                           act_d, left_d, skey, eos)
                nxt_block = (toks, lpb, [s.id if s is not None else None
                                         for s in slot])
            if pending is not None:
                toks, lpb, ids = pending
                nxt = np.asarray(toks)  # sync block i-1; block i runs on
                lpb = np.asarray(lpb) if lps is not None else None
                for j in range(nxt.shape[1]):
                    for bi in range(B):
                        if slot[bi] is None or slot[bi].id != ids[bi]:
                            continue
                        emitted[bi].append(int(nxt[bi, j]))
                        if lps is not None:
                            lps[bi].append(float(lpb[bi, j]))
                        self._maybe_finish(bi, slot, emitted, results,
                                           eos_id, lps)
            admit()  # AFTER processing: freshest finish knowledge; the
            #          admission device-ops enqueue before the next block
            pending = nxt_block
        return results

    @staticmethod
    def _maybe_finish(bi, slot, emitted, results, eos_id, lps=None):
        req = slot[bi]
        if req is None:
            return
        done = (len(emitted[bi]) >= req.max_new
                or (eos_id is not None and emitted[bi][-1] == eos_id))
        if done:
            results[req.id] = RequestResult(
                id=req.id, tokens=list(emitted[bi]),
                prompt_len=len(req.tokens),
                logprobs=(list(lps[bi]) if lps is not None else None))
            slot[bi] = None


@dataclasses.dataclass(frozen=True)
class ShardedContinuousEngine(ContinuousEngine):
    """Continuous batching over a sequence-sharded (multi-chip) cache.

    Same host scheduler as :class:`ContinuousEngine`; the three jitted
    pieces run under the mesh instead: admission prefills one request
    USP-sharded (`ShardedEngine.prefill` with a traced true-last-token
    index, any training layout), the row insert is a batch-axis splice that
    never moves the sharded slot axis, and each decode step is one
    shard_map of `decode_step` (owner-routed in-place append + cross-shard
    LSE merge, rows gated by the ``active`` mask). Prompt buckets are
    powers of two, so divisibility by the (power-of-two) shard count holds.
    """

    mesh: Optional[jax.sharding.Mesh] = None
    axes: "MeshAxes" = None  # type: ignore[assignment]

    def __post_init__(self):
        from long_context_attention_tpu.parallel.mesh import MeshAxes
        assert self.mesh is not None, "ShardedContinuousEngine needs a mesh"
        if self.axes is None:
            object.__setattr__(self, "axes", MeshAxes())

    @property
    def _sub(self):
        from long_context_attention_tpu.serving.sharded_engine import (
            ShardedEngine,
        )
        # equal field values -> equal (hashable) instance -> jit cache hits
        return ShardedEngine(self.cfg, self.mesh, self.s_max,
                             self.cache_dtype, self.axes, self.interpret)

    def init_cache(self) -> KVCache:
        from jax.sharding import NamedSharding

        cache = KVCache.init(self.cfg.n_layers, self.max_batch, self.s_max,
                             self.cfg.n_kv_heads, self.cfg.head_dim,
                             self.cache_dtype)
        specs = self._sub._cache_specs()
        return jax.tree.map(
            lambda x, sp: jax.device_put(x, NamedSharding(self.mesh, sp)),
            cache, specs)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _insert_row_cache(self, cache: KVCache, row: KVCache,
                          bi: jnp.ndarray, true_len: jnp.ndarray) -> KVCache:
        """Splice a b=1 prefilled cache into batch row ``bi`` (donated).
        Only the batch axis moves; the sharded slot axis stays put."""
        from jax.sharding import NamedSharding

        specs = self._sub._cache_specs()

        def splice(buf, new, spec):
            start = (jnp.int32(0), bi.astype(jnp.int32)) + \
                (jnp.int32(0),) * (buf.ndim - 2)
            out = jax.lax.dynamic_update_slice(buf, new, start)
            return jax.lax.with_sharding_constraint(
                out, NamedSharding(self.mesh, spec))

        k = splice(cache.k, row.k, specs.k)
        v = splice(cache.v, row.v, specs.v)
        ksc, vsc = cache.k_scale, cache.v_scale
        if ksc is not None:
            ksc = splice(ksc, row.k_scale, specs.k_scale)
            vsc = splice(vsc, row.v_scale, specs.v_scale)
        length = cache.length.at[bi].set(true_len.astype(jnp.int32))
        return dataclasses.replace(cache, k=k, v=v, k_scale=ksc, v_scale=vsc,
                                   length=length)

    def _admit_row(self, params, cache, req: Request, bi: int,
                   sampling: SamplingParams, key: jax.Array):
        n = len(req.tokens)
        pad = _bucket(n)
        toks = np.zeros((1, pad), np.int32)
        toks[0, :n] = np.asarray(req.tokens, np.int32)
        logits, row = self._sub.prefill(params, jnp.asarray(toks),
                                        jnp.int32(n - 1))
        cache = self._insert_row_cache(cache, row, jnp.int32(bi),
                                       jnp.int32(n))
        first, lp = self._sample_first(logits, sampling, key)
        return cache, first, lp

    def _decode_one(self, params, cache: KVCache, tokens, active):
        from jax.sharding import PartitionSpec as P

        specs = self._sub._cache_specs()
        seq_axes = self._sub.seq_axes

        def one(params, cache, tok, act):
            return decode_step(params, cache, tok, self.cfg,
                               interpret=self.interpret,
                               shard_axes=seq_axes, active=act)

        return jax.shard_map(
            one, mesh=self.mesh,
            in_specs=(P(), specs, P(), P()),
            out_specs=(P(), specs),
            check_vma=False,
        )(params, cache, tokens, active)


@dataclasses.dataclass(frozen=True)
class SpeculativeContinuousEngine(ContinuousEngine):
    """Continuous batching x speculative decoding: an Orca-style scheduler
    whose model step is a draft-propose + one-shot-verify ROUND instead of
    a single decode step.

    Every round, all ``max_batch`` rows run ``gamma`` draft steps plus one
    target `decode_multi_step` verify (both gated by the ``active`` row
    mask), each row accepts its own draft prefix, and rows that finish
    (EOS / budget) free their slot for the next queued request before the
    next round — so the batch stays full while each live row emits up to
    ``gamma + 1`` tokens per target forward. Greedy (temperature 0) emits
    exactly the target-greedy chain; ``sampling.temperature > 0`` runs the
    Leviathan acceptance rule (exact target distribution, as
    `SpeculativeEngine`). Cache rollback stays free: per-row ``length``
    resets cover both rejection and the inactive rows of a partially-empty
    batch.

    ``step_block`` is ignored — a speculative round already amortizes the
    host sync over up to ``gamma + 1`` emitted tokens per row.
    """

    draft_cfg: Optional[ModelConfig] = None
    gamma: int = 4

    def __post_init__(self):
        assert self.draft_cfg is not None, "draft_cfg is required"
        assert self.cfg.vocab == self.draft_cfg.vocab, "vocabularies differ"
        assert self.gamma >= 1
        if self.return_logprobs:
            raise ValueError(
                "speculative decoding does not report logprobs (accepted "
                "tokens come from the draft/verify rule, not one softmax) "
                "— use a non-speculative engine for logprobs")

    @property
    def _draft_eng(self) -> ContinuousEngine:
        # equal field values -> equal (hashable) instance -> jit cache hits
        return ContinuousEngine(self.draft_cfg, self.s_max, self.max_batch,
                                self.cache_dtype, self.interpret)

    @property
    def _spec(self):
        from long_context_attention_tpu.serving.speculative import (
            SpeculativeEngine,
        )
        return SpeculativeEngine(self.cfg, self.draft_cfg, self.s_max,
                                 self.gamma, self.cache_dtype, self.interpret)

    # --- round pieces (the sharded subclass swaps in shard_map'd ones) ----

    def _draft_round(self, draft_params, dcache, t, active):
        return self._spec._draft_run(draft_params, dcache, t, active)

    def _verify_round(self, params, tcache, run, active):
        return self._spec._verify(params, tcache, run, active)

    def _draft_round_sampled(self, draft_params, dcache, t, sampling, key,
                             active):
        return self._spec._draft_run_sampled(draft_params, dcache, t,
                                             sampling, key, active)

    def _verify_round_sampled(self, params, tcache, run, drafts, qdist,
                              sampling, key, active):
        return self._spec._verify_sampled(params, tcache, run, drafts,
                                          qdist, sampling, key, active)

    def serve(self, params, draft_params, requests: Sequence[Request], *,
              sampling: SamplingParams = SamplingParams(),
              eos_id: Optional[int] = None,
              key: Optional[jax.Array] = None) -> Dict[int, RequestResult]:
        """Run all requests to completion; returns {request.id: result}."""
        B = self.max_batch
        for r in requests:
            if len(r.tokens) + r.max_new + self.gamma > self.s_max:
                raise ValueError(
                    f"request {r.id}: prompt ({len(r.tokens)}) + max_new "
                    f"({r.max_new}) + gamma ({self.gamma}) exceeds cache "
                    f"capacity s_max={self.s_max}")
        sampled = sampling.temperature > 0.0
        deng = self._draft_eng
        queue = deque(requests)
        tcache = self.init_cache()
        dcache = deng.init_cache()
        # decode/verify rounds run on (optionally int8) weights; admission
        # prefill keeps the original bf16 params
        tparams = self.decode_params(params)
        dparams = self.decode_params(draft_params)
        slot: List[Optional[Request]] = [None] * B
        emitted: List[List[int]] = [[] for _ in range(B)]
        cur = np.zeros((B,), np.int32)
        results: Dict[int, RequestResult] = {}
        key = jax.random.PRNGKey(0) if key is None else key

        def admit():
            nonlocal tcache, dcache
            for bi in range(B):
                if slot[bi] is not None or not queue:
                    continue
                if not self._can_admit(queue[0], bi):
                    continue
                req = queue.popleft()
                skey = jax.random.fold_in(key, req.id)
                tcache, first, _ = self._admit_row(params, tcache, req, bi,
                                                   sampling, skey)
                dcache, _, _ = deng._admit_row(draft_params, dcache, req, bi,
                                               sampling, skey)
                slot[bi] = req
                emitted[bi] = [first]
                cur[bi] = first
                self._maybe_finish(bi, slot, emitted, results, eos_id)
                if slot[bi] is None:
                    # finished at its very first token: the freed row must
                    # not keep phantom cache state for the next admit scan
                    tcache = dataclasses.replace(
                        tcache, length=tcache.length.at[bi].set(0))
                    dcache = dataclasses.replace(
                        dcache, length=dcache.length.at[bi].set(0))

        while queue or any(s is not None for s in slot):
            admit()
            if not any(s is not None for s in slot):
                continue  # everything admitted finished at its first token
            live = np.asarray([s is not None for s in slot])
            active = jnp.asarray(live)
            t = jnp.asarray(cur, jnp.int32)
            base_len = np.asarray(tcache.length)
            if sampled:
                key, kd, kv = jax.random.split(key, 3)
                drafts, qdist, dcache = self._draft_round_sampled(
                    dparams, dcache, t, sampling, kd, active)
                run = jnp.concatenate([t[:, None], drafts], axis=1)
                accept_m, fallback, tcache = self._verify_round_sampled(
                    tparams, tcache, run, drafts, qdist, sampling, kv, active)
                acc_np = np.asarray(accept_m)
                d_np, c_np = np.asarray(drafts), np.asarray(fallback)
            else:
                drafts, dcache = self._draft_round(dparams, dcache, t,
                                                   active)
                run = jnp.concatenate([t[:, None], drafts], axis=1)
                choices, tcache = self._verify_round(tparams, tcache, run,
                                                     active)
                d_np, c_np = np.asarray(drafts), np.asarray(choices)
                acc_np = d_np == c_np[:, :self.gamma]

            keep = base_len.copy()
            for bi in range(B):
                req = slot[bi]
                if req is None:
                    continue
                a = 0
                while a < self.gamma and acc_np[bi, a]:
                    a += 1
                row = [int(x) for x in d_np[bi, :a]] + [int(c_np[bi, a])]
                # truncate at EOS / budget; the slot frees either way, and
                # admission resets the row's cache length, so kept-slot
                # accounting only matters for rows that stay live
                for j, tok in enumerate(row):
                    emitted[bi].append(tok)
                    cur[bi] = tok
                    self._maybe_finish(bi, slot, emitted, results, eos_id)
                    if slot[bi] is None:
                        break
                if slot[bi] is not None:
                    keep[bi] = base_len[bi] + a + 1
            tcache = dataclasses.replace(tcache, length=jnp.asarray(keep))
            dcache = dataclasses.replace(dcache,
                                         length=jnp.asarray(keep.copy()))
        return results


@dataclasses.dataclass(frozen=True)
class ShardedSpeculativeContinuousEngine(SpeculativeContinuousEngine,
                                         ShardedContinuousEngine):
    """Speculative continuous batching over a sequence-sharded cache.

    The same host scheduler and acceptance math as
    :class:`SpeculativeContinuousEngine`; the four round pieces run under
    the mesh instead. Target AND draft caches are slot-sharded over
    ``(ring, ulysses)``; the draft scan and the multi-token verify execute
    inside one ``shard_map`` each — the verify's n-token append splits
    itself across the shard boundary it straddles
    (`ops/decode.py:cache_append` range-based liveness), and its attention
    merges cross-shard partials per token. Sampling keys are replicated,
    so every rank draws identical accept/fallback decisions.
    """

    def __post_init__(self):
        ShardedContinuousEngine.__post_init__(self)
        SpeculativeContinuousEngine.__post_init__(self)

    @property
    def _draft_eng(self) -> ContinuousEngine:
        return ShardedContinuousEngine(self.draft_cfg, self.s_max,
                                       self.max_batch, self.cache_dtype,
                                       self.interpret, mesh=self.mesh,
                                       axes=self.axes)

    @property
    def _dsub(self):
        from long_context_attention_tpu.serving.sharded_engine import (
            ShardedEngine,
        )
        return ShardedEngine(self.draft_cfg, self.mesh, self.s_max,
                             self.cache_dtype, self.axes, self.interpret)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _draft_round(self, draft_params, dcache, t, active):
        from jax.sharding import PartitionSpec as P

        specs = self._dsub._cache_specs()
        seq_axes = self._dsub.seq_axes

        def run(dp, dc, tok0, act):
            def step(carry, _):
                cache, tok = carry
                logits, cache = decode_step(dp, cache, tok, self.draft_cfg,
                                            interpret=self.interpret,
                                            shard_axes=seq_axes, active=act)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                nxt = jnp.where(act, nxt, tok)
                return (cache, nxt), nxt

            (dc, _), drafts = jax.lax.scan(step, (dc, tok0), None,
                                           length=self.gamma + 1)
            return jnp.transpose(drafts)[:, :self.gamma], dc

        return jax.shard_map(
            run, mesh=self.mesh,
            in_specs=(P(), specs, P(), P()),
            out_specs=(P(), specs),
            check_vma=False,
        )(draft_params, dcache, t, active)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _verify_round(self, params, tcache, run_toks, active):
        from jax.sharding import PartitionSpec as P

        from long_context_attention_tpu.models.llama import decode_multi_step

        specs = self._sub._cache_specs()
        seq_axes = self._sub.seq_axes

        def vf(p, c, r, act):
            logits, c = decode_multi_step(p, c, r, self.cfg,
                                          interpret=self.interpret,
                                          shard_axes=seq_axes, active=act)
            return jnp.argmax(logits, -1).astype(jnp.int32), c

        return jax.shard_map(
            vf, mesh=self.mesh,
            in_specs=(P(), specs, P(), P()),
            out_specs=(P(), specs),
            check_vma=False,
        )(params, tcache, run_toks, active)

    @functools.partial(jax.jit, static_argnums=(0, 4), donate_argnums=2)
    def _draft_round_sampled(self, draft_params, dcache, t, sampling, key,
                             active):
        from jax.sharding import PartitionSpec as P

        from long_context_attention_tpu.serving.engine import sampling_probs

        specs = self._dsub._cache_specs()
        seq_axes = self._dsub.seq_axes

        def run(dp, dc, tok0, k, act):
            def step(carry, skey):
                cache, tok = carry
                logits, cache = decode_step(dp, cache, tok, self.draft_cfg,
                                            interpret=self.interpret,
                                            shard_axes=seq_axes, active=act)
                q = sampling_probs(logits, sampling)
                nxt = jax.random.categorical(
                    skey, jnp.log(jnp.maximum(q, 1e-37)), axis=-1
                ).astype(jnp.int32)
                nxt = jnp.where(act, nxt, tok)
                return (cache, nxt), (nxt, q)

            keys = jax.random.split(k, self.gamma + 1)
            (dc, _), (drafts, qd) = jax.lax.scan(step, (dc, tok0), keys)
            return (jnp.transpose(drafts)[:, :self.gamma],
                    jnp.transpose(qd, (1, 0, 2))[:, :self.gamma], dc)

        return jax.shard_map(
            run, mesh=self.mesh,
            in_specs=(P(), specs, P(), P(), P()),
            out_specs=(P(), P(), specs),
            check_vma=False,
        )(draft_params, dcache, t, key, active)

    @functools.partial(jax.jit, static_argnums=(0, 6), donate_argnums=2)
    def _verify_round_sampled(self, params, tcache, run_toks, drafts, qdist,
                              sampling, key, active):
        from jax.sharding import PartitionSpec as P

        from long_context_attention_tpu.models.llama import decode_multi_step
        from long_context_attention_tpu.serving.speculative import (
            leviathan_accept,
        )

        specs = self._sub._cache_specs()
        seq_axes = self._sub.seq_axes

        def vf(p, c, r, d, q, k, act):
            logits, c = decode_multi_step(p, c, r, self.cfg,
                                          interpret=self.interpret,
                                          shard_axes=seq_axes, active=act)
            accept, fallback = leviathan_accept(logits, d, q, sampling, k)
            return accept, fallback, c

        return jax.shard_map(
            vf, mesh=self.mesh,
            in_specs=(P(), specs, P(), P(), P(), P(), P()),
            out_specs=(P(), P(), specs),
            check_vma=False,
        )(params, tcache, run_toks, drafts, qdist, key, active)


@dataclasses.dataclass
class _Admission:
    """Host-side state of one in-flight chunked admission (paged engine,
    ``interleave_admission=True``): the prompt's unprefilled tokens staged
    as ``n_chunks`` chunks of ``cs``, the row's reserved page table, and
    the prefix-cache bookkeeping deferred to completion. Holds NO device
    buffers besides the tiny ``last`` index — the pool view is rebuilt
    from the live cache each advance (decode blocks donate the pool
    between chunks)."""

    req: Request
    bi: int
    key: jax.Array
    toks: np.ndarray          # (1, n_chunks*cs) zero-padded suffix tokens
    cs: int
    n_chunks: int
    ci: int
    last: jnp.ndarray         # final true token's offset in the last chunk
    row_pt: np.ndarray        # (n_pages,) the row's new page table
    pages: List[int]
    all_hashes: List[int]
    cached: int               # prefix-hit tokens already in shared pages


def _validate_release(owned, pages, bi: int) -> None:
    """Whole-list ownership check BEFORE any mutation — shared by the
    single-host allocator and the partitioned wrapper so the
    fail-loudly-AND-atomically contract (mirrored by the native core,
    native/lca_host.cc release_pages) has one Python home."""
    have = collections.Counter(owned)
    for p, c in collections.Counter(pages).items():
        if have[p] < c:
            raise ValueError(
                f"release_pages: row {bi} does not own page {p} "
                f"(double release?)")


class _PageAllocator:
    """Host-side free-list over the physical page pool. Page 0 is the
    reserved scratch page (see `ops/kv_cache.py:PagedKVCache`). Pages are
    reclaimed lazily: a row's pages free when a NEW request is admitted
    into that row (that is exactly when they become garbage) — plus
    eagerly for sliding-window rows (``release_pages``: pages behind the
    window free while the row is still running, and ``take_extra`` assigns
    fresh pages on demand as decode crosses page boundaries)."""

    def __init__(self, pool_pages: int):
        self.free: List[int] = list(range(1, pool_pages))
        self.rows: Dict[int, List[int]] = {}

    def available(self, bi: int) -> int:
        return len(self.free) + len(self.rows.get(bi, []))

    def take(self, bi: int, need: int) -> List[int]:
        self.free.extend(self.rows.pop(bi, []))
        assert len(self.free) >= need, (need, len(self.free))
        pages = [self.free.pop() for _ in range(need)]
        self.rows[bi] = pages
        # a COPY: release_pages mutates rows[bi], and the caller's view
        # must not shrink under it (the native core memcpy's its output)
        return list(pages)

    def take_extra(self, bi: int, need: int) -> List[int]:
        """Grow a RUNNING row by ``need`` fresh pages (windowed decode
        crossing page boundaries). Raises (before mutating anything) when
        the free list cannot satisfy the growth — a pool-sizing error."""
        if len(self.free) < need:
            raise RuntimeError(
                f"page pool exhausted: row {bi} needs {need} growth pages, "
                f"{len(self.free)} free")
        pages = [self.free.pop() for _ in range(need)]
        self.rows.setdefault(bi, []).extend(pages)
        return pages

    def release_pages(self, bi: int, pages: List[int]) -> None:
        """Free specific pages of a RUNNING row (they slid behind the
        window); freed in the given order to keep LIFO parity with the
        native core. Raises ValueError when ANY page is not owned by the
        row (double release) — validated against the whole list BEFORE
        mutating, so a caller that catches the error never sees a
        half-released allocator (both runtimes fail loudly AND atomically
        rather than leak or diverge)."""
        if not pages:
            return
        row = self.rows.get(bi)
        if not row:
            raise ValueError(
                f"release_pages: row {bi} owns no pages (double release?)")
        _validate_release(row, pages, bi)
        for p in pages:
            row.remove(p)
            self.free.append(p)


@dataclasses.dataclass(frozen=True)
class PagedContinuousEngine(ContinuousEngine):
    """Continuous batching over a PAGED cache (`PagedKVCache`): rows
    reserve only the pages their prompt + decode budget needs from one
    shared pool, so HBM holds ~pool/mean-request-length concurrent rows
    instead of ~pool/s_max — the batch-size (and thus tokens/s/chip) win
    for heterogeneous-length workloads. Admission backpressure: a request
    whose page need exceeds the free pool waits at block boundaries
    (`_can_admit`) while other rows keep decoding.

    ``page_size`` should stay >= 2048 on real chips (the decode stream
    rate falls steeply with smaller pages; see ops/decode.py) — tests use
    small pages on the CPU mesh where bandwidth is irrelevant.

    ``prefix_cache=True`` adds automatic prefix caching
    (serving/prefix_cache.py): full prompt pages are content-registered
    by a chain hash, a new prompt sharing a page-aligned prefix with any
    prior one reuses those pool pages bit-exact (refcounted; evicted LRU
    only when the free list runs dry), and its prefill computes ONLY the
    suffix — chunked multi-token decode (`decode_multi_step`) against the
    shared prefix, ``prefill_chunk`` tokens per device call. System-
    prompt-heavy workloads skip most of their prefill FLOPs and TTFT.
    """

    page_size: int = 2048
    pool_pages: int = 0      # physical pages INCLUDING the scratch page 0
    prefix_cache: bool = False
    # suffix-prefill chunk cap (tokens per decode_multi_step call); the
    # actual chunk is min(prefill_chunk, bucket(suffix)) so short suffixes
    # neither over-pad pages nor add compilations (buckets are O(log))
    prefill_chunk: int = 256
    # chunked-prefill admission interleaved with decode (vLLM-style): an
    # incoming prompt prefills ``prefill_chunk`` tokens at a time with one
    # decode block for the RUNNING rows between chunks, so their
    # inter-token stall is bounded by one chunk instead of the whole
    # prompt. Greedy results are identical to the batch-admission
    # scheduler; sampled runs draw from the same distributions but may
    # consume PRNG blocks in a different order (same caveat as
    # ``host_overlap``, which this flag does not compose with yet).
    interleave_admission: bool = False
    # host-side page/prefix bookkeeping implementation: None = use the
    # native C++ core (native/lca_host.cc via serving/native.py) when it
    # builds, falling back to pure Python; True = require native; False =
    # force Python. Decisions are bit-identical either way.
    native_runtime: Optional[bool] = None

    def __post_init__(self):
        assert self.pool_pages >= 2, "pool needs the scratch page + 1"
        assert self.s_max % self.page_size == 0, (self.s_max, self.page_size)
        assert self.prefill_chunk >= 64 and self.prefill_chunk % 64 == 0, (
            "prefill_chunk must be a multiple of the bucket quantum (64)")
        if self.interleave_admission and self.host_overlap:
            raise ValueError(
                "interleave_admission does not compose with host_overlap "
                "yet — pick one (both remove host/admission stalls)")

    @property
    def n_pages(self) -> int:
        return self.s_max // self.page_size

    @property
    def stats(self) -> Dict[str, int]:
        """Prefix-cache observability for the last/current `serve` call:
        ``prefix_hit_tokens`` (prompt tokens served from shared pages),
        ``admitted_tokens``, ``evictions``."""
        return getattr(self, "_stats", {})

    @property
    def _windowed_paging(self) -> bool:
        """Sliding-window dynamic paging: rows hold only the sink + window
        pages at steady state — pages behind the window free WHILE the row
        runs, fresh pages are assigned on demand as decode crosses page
        boundaries (vLLM-style growth), so ``max_new`` no longer inflates
        the reservation and long windowed streams stop hoarding the pool.
        The attention kernels never read behind-window pages (banded grid /
        window masking), so freeing them — and reusing the physical page
        for another row — cannot change results. Plain and interleaved
        schedulers only (host_overlap's host lengths lag the device);
        prefix_cache keeps whole-span reservations (shared-page refcounts
        interact with eager frees — future work)."""
        return (self.cfg.window_left >= 0 and not self.prefix_cache
                and not self.host_overlap)

    def _rolling_pages(self) -> int:
        """Steady-state pages a windowed row occupies: the sink prefix +
        the (window + self) band + one block of growth margin, with page
        rounding slack."""
        psz = self.page_size
        sink_pages = -(-self.cfg.sink_tokens // psz) if self.cfg.sink_tokens else 0
        band = self.cfg.window_left + 1 + self.step_block + 1
        return sink_pages + -(-band // psz) + 1

    def _note_windowed_row(self, bi: int, row_pt, assigned: int, n: int):
        """Record a freshly admitted row's host-side page state for the
        sliding-window bookkeeping (no-op for non-windowed configs)."""
        if not self._windowed_paging:
            return
        psz = self.page_size
        sink_pages = (-(-self.cfg.sink_tokens // psz)
                      if self.cfg.sink_tokens else 0)
        self._rowwin[bi] = {"pt": row_pt, "assigned": int(assigned),
                            "next_free": sink_pages, "prompt": int(n)}

    def _post_block(self, cache, slot, emitted):
        """Sliding-window page bookkeeping after each decode block:

        * growth — assign fresh physical pages for the logical pages the
          NEXT block will write (the device table gets one scatter update);
        * reclamation — free pages wholly behind the global window (the
          kernels' window masking / banded grid never read them, so the
          physical page can be reused by any other row immediately; the
          row's stale table entries are never dereferenced and need no
          device write).
        """
        if not self._windowed_paging or not self._rowwin:
            return cache
        psz = self.page_size
        w = self.cfg.window_left
        sink_pages = (-(-self.cfg.sink_tokens // psz)
                      if self.cfg.sink_tokens else 0)
        upd_b, upd_j, upd_p = [], [], []
        for bi, req in enumerate(slot):
            st = self._rowwin.get(bi)
            if req is None or st is None:
                continue
            # emitted includes the admission's first token, whose KV is
            # appended on the FIRST decode step: length = prompt + k - 1
            L = st["prompt"] + len(emitted[bi]) - 1
            # (a) reclaim FIRST: pages wholly behind the window (sinks
            # pinned). Reclaim-before-growth is load-bearing: the row's
            # transient usage must never exceed its admission reservation,
            # or a pool _can_admit accepted can fail mid-serve (a swept
            # growth-first ordering overflowed by one page in hundreds of
            # (window, step_block, page_size) combinations).
            first_needed = max(L - 1 - w, 0) // psz
            lo = max(st["next_free"], sink_pages)
            if first_needed > lo:
                phys = [int(st["pt"][j]) for j in range(lo, first_needed)]
                self._alloc.release_pages(bi, phys)
                st["next_free"] = first_needed
            # (b) growth: the next block appends up to step_block tokens
            need_upto = min(-(-(L + self.step_block + 1) // psz),
                            self.n_pages)
            if need_upto > st["assigned"]:
                # take_extra raises (pool-sizing guidance) on a dry free
                # list — unreachable when pool_pages >= max_batch *
                # _rolling_pages() + 1, which the admission gate enforces
                pages = self._take_growth(bi, st["assigned"], need_upto)
                for j, pg in zip(range(st["assigned"], need_upto), pages):
                    st["pt"][j] = pg
                    upd_b.append(bi)
                    upd_j.append(j)
                    upd_p.append(pg)
                st["assigned"] = need_upto
        if upd_b:
            table = cache.page_table.at[
                (jnp.asarray(upd_b, jnp.int32),
                 jnp.asarray(upd_j, jnp.int32))].set(
                jnp.asarray(upd_p, jnp.int32))
            cache = dataclasses.replace(cache, page_table=table)
        return cache

    def _take_growth(self, bi: int, lo: int, hi: int) -> List[int]:
        """Growth hook: physical pages for row ``bi``'s logical pages
        [lo, hi). The sharded-paged engine routes each logical index to
        its owner partition's allocator; single-host pools ignore the
        indices."""
        return self._alloc.take_extra(bi, hi - lo)

    def _pages_needed(self, req: Request) -> int:
        pad = _bucket(len(req.tokens))
        span = max(pad, len(req.tokens) + req.max_new)
        if self.prefix_cache or self.interleave_admission:
            # worst-case suffix-chunk padding (cached + ceil(suffix/cs)*cs
            # <= n + cs) so the serve() pool check covers the hit path too
            # (and interleaved COLD admissions, which chunk the whole
            # prompt through the same path)
            span = max(span, len(req.tokens)
                       + min(self.prefill_chunk, pad))
        if self._windowed_paging:
            return self._windowed_admit_pages(len(req.tokens))
        return -(-span // self.page_size)

    def _windowed_admit_pages(self, n: int, cs: Optional[int] = None) -> int:
        """Windowed-row admission reservation: the prefill transient (the
        bucket-padded — or chunk-rounded, interleaved — prompt) + the first
        decode block; steady state is the rolling working set (max_new does
        NOT appear: growth pages come on demand and pages behind the window
        free as the row advances). One formula for _pages_needed AND the
        interleaved _admission_start so the capacity gate and the actual
        take can never diverge."""
        pad = _bucket(n)
        span = max(pad, n + self.step_block + 1)
        if self.interleave_admission:
            c = cs if cs is not None else min(self.prefill_chunk, pad)
            span = max(span, (-(-n // c)) * c)
        return max(-(-span // self.page_size), self._rolling_pages())

    def init_cache(self) -> KVCache:
        from long_context_attention_tpu.ops.kv_cache import PagedKVCache
        return PagedKVCache.init(self.cfg.n_layers, self.max_batch,
                                 self.pool_pages, self.page_size,
                                 self.n_pages, self.cfg.n_kv_heads,
                                 self.cfg.head_dim, self.cache_dtype)

    # --- allocator lifecycle (per serve call) ------------------------------

    def _check_request_fits(self, r: Request) -> None:
        """Raise when ``r`` can never be admitted (pool too small). The
        sharded-paged engine overrides with per-partition capacities."""
        if self._pages_needed(r) > self.pool_pages - 1:
            raise ValueError(
                f"request {r.id} needs {self._pages_needed(r)} pages; "
                f"pool has {self.pool_pages - 1} allocatable")

    def serve(self, params, requests, **kw):
        for r in requests:
            self._check_request_fits(r)
        alloc = self._make_alloc()
        object.__setattr__(self, "_alloc", alloc)
        object.__setattr__(self, "_rowwin", {})
        object.__setattr__(self, "_stats",
                           {"prefix_hit_tokens": 0, "admitted_tokens": 0,
                            "evictions": 0})
        try:
            if self.interleave_admission:
                return self._serve_interleaved(params, requests, **kw)
            return super().serve(params, requests, **kw)
        finally:
            if self.prefix_cache:
                self._stats["evictions"] = alloc.evictions
            object.__setattr__(self, "_alloc", None)

    def _make_alloc(self):
        """Page allocator for one serve() call: the native (C++) runtime
        core when built and enabled, else the pure-Python structures. The
        two make bit-identical decisions (tests/test_native_alloc.py), so
        the switch can never change serving results — only host-side speed."""
        use_native = self.native_runtime
        if use_native is None or use_native:
            from long_context_attention_tpu.serving import native
            if native.native_available():
                object.__setattr__(self, "_alloc_kind", "native")
                if self.prefix_cache:
                    return native.NativePrefixPageAllocator(self.pool_pages)
                return native.NativePageAllocator(self.pool_pages)
            if use_native:
                raise RuntimeError(
                    "native_runtime=True but native/lca_host.cc failed to "
                    "build (g++ missing?)")
        object.__setattr__(self, "_alloc_kind", "python")
        if self.prefix_cache:
            from long_context_attention_tpu.serving.prefix_cache import (
                PrefixPageAllocator,
            )
            return PrefixPageAllocator(self.pool_pages)
        return _PageAllocator(self.pool_pages)

    @property
    def last_alloc_kind(self) -> str:
        """"native" or "python": which allocator the last serve() used."""
        return getattr(self, "_alloc_kind", "unused")

    def _can_admit(self, req: Request, bi: int) -> bool:
        if not self.prefix_cache:
            return self._alloc.available(bi) >= self._pages_needed(req)
        _, lookup_hashes, _, _, span_pages = self._prefix_plan(req)
        return self._alloc.can_take(bi, lookup_hashes, span_pages)

    def _prefix_plan(self, req: Request):
        """(all full-page hashes, lookup hashes, hits, chunk size, table
        span in pages) for admitting ``req`` under the CURRENT allocator
        state. Hits are capped so >= 1 suffix token remains (the next-token
        logits must come from a computed query), and forced to 0 when the
        chunk-padded span would overflow the row's table (rare: prompt
        within one chunk of s_max) — the bucket-prefill path then applies.
        """
        from long_context_attention_tpu.serving.prefix_cache import (
            chain_hashes,
        )

        ps = self.page_size
        n = len(req.tokens)
        all_hashes = chain_hashes(req.tokens, ps)
        lookup_hashes = all_hashes[:(n - 1) // ps]
        hits = self._alloc.lookup(lookup_hashes)
        cs = None
        if hits > 0:
            cached = hits * ps
            suffix = n - cached
            cs = min(self.prefill_chunk, _bucket(suffix))
            span = max(n + req.max_new, cached + (-(-suffix // cs)) * cs)
            if span > self.s_max:
                hits, cs = 0, None
        if hits == 0:
            lookup_hashes = []
            if self.interleave_admission:
                # cold interleaved admissions chunk the WHOLE prompt
                # through the suffix path — span covers the chunk padding,
                # not the bucket (no bucket prefill happens)
                cs = min(self.prefill_chunk, _bucket(n))
                span = max(n + req.max_new, (-(-n // cs)) * cs)
            else:
                span = max(_bucket(n), n + req.max_new)
        return all_hashes, lookup_hashes, hits, cs, -(-span // ps)

    # --- paged admission ----------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 6), donate_argnums=1)
    def _insert_row_paged(self, cache, kv_k, kv_v, row, true_len, n_chunks,
                          pages):
        """Quantize a prefilled row's KV and scatter it page-by-page into
        the pool (donated: in place). kv_k/kv_v (L, 1, pad, h, d); ``pages``
        (n_pages,) int32 — the row's new table (page i of the prompt lands
        in pool page ``pages[i]``). Also installs the row's table entry and
        length."""
        ps = self.page_size
        kb = jnp.transpose(kv_k, (0, 1, 3, 2, 4))[:, 0]  # (L, h, pad, d)
        vb = jnp.transpose(kv_v, (0, 1, 3, 2, 4))[:, 0]
        kq, ks = quantize_kv(kb, self.cache_dtype)
        vq, vs = quantize_kv(vb, self.cache_dtype)
        k, v = cache.k, cache.v
        ksc, vsc = cache.k_scale, cache.v_scale
        for pi in range(n_chunks):
            lo = pi * ps
            w = min(ps, kq.shape[2] - lo)  # last chunk may be partial
            pg = pages[pi].astype(jnp.int32)
            st = (jnp.int32(0), pg, jnp.int32(0), jnp.int32(0), jnp.int32(0))
            k = jax.lax.dynamic_update_slice(k, kq[:, None, :, lo:lo + w], st)
            v = jax.lax.dynamic_update_slice(v, vq[:, None, :, lo:lo + w], st)
            if ksc is not None:
                # scales (L, h, pad) -> pool layout (L, 1, h, 1, ps)
                ksc = jax.lax.dynamic_update_slice(
                    ksc, ks[:, None, :, None, lo:lo + w], st)
                vsc = jax.lax.dynamic_update_slice(
                    vsc, vs[:, None, :, None, lo:lo + w], st)
        table = cache.page_table.at[row].set(pages)
        length = cache.length.at[row].set(true_len.astype(jnp.int32))
        return dataclasses.replace(cache, k=k, v=v, k_scale=ksc, v_scale=vsc,
                                   page_table=table, length=length)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _suffix_chunk(self, params, view, toks: jnp.ndarray,
                      last_index: jnp.ndarray):
        """One suffix-prefill chunk: teacher-force ``toks`` (1, cs) through
        `decode_multi_step` against the b=1 pool VIEW (same physical pool
        arrays as the engine cache, a one-row page table) — appends land in
        the row's fresh pages via the paged append kernel, attention reads
        the shared prefix pages, and only ``last_index``'s position
        projects through lm_head. The view is donated: the pool updates in
        place, chunk after chunk."""
        logits, view = decode_multi_step(params, view, toks, self.cfg,
                                         interpret=self.interpret,
                                         last_index=last_index)
        return logits[:, 0], view

    def _bucket_prefill(self, params, cache, req: Request, bi: int,
                        row_pt: np.ndarray):
        """Cold-path admission (no prefix hit): full bucket-padded prefill
        + page-wise pool insert. Returns (cache, next-token logits)."""
        n = len(req.tokens)
        pad = _bucket(n)
        toks = np.zeros((1, pad), np.int32)
        toks[0, :n] = np.asarray(req.tokens, np.int32)
        logits, (kv_k, kv_v) = self._prefill_one(params, jnp.asarray(toks),
                                                 jnp.int32(n - 1))
        n_chunks = -(-pad // self.page_size)
        cache = self._insert_row_paged(cache, kv_k, kv_v, jnp.int32(bi),
                                       jnp.int32(n), n_chunks,
                                       jnp.asarray(row_pt))
        return cache, logits

    def _admit_row(self, params, cache, req: Request, bi: int,
                   sampling: SamplingParams, key: jax.Array):
        n = len(req.tokens)
        if not self.prefix_cache:
            need = self._pages_needed(req)
            pages = self._alloc.take(bi, need)
            row_pt = np.full((self.n_pages,), -1, np.int32)
            row_pt[:need] = pages
            self._note_windowed_row(bi, row_pt, need, n)
            cache, logits = self._bucket_prefill(params, cache, req, bi,
                                                 row_pt)
            first, lp = self._sample_first(logits, sampling, key)
            return cache, first, lp

        from long_context_attention_tpu.ops.kv_cache import PagedKVCache

        all_hashes, lookup_hashes, hits, cs, span_pages = \
            self._prefix_plan(req)
        pages, got = self._alloc.take(bi, lookup_hashes, span_pages)
        assert got == hits, (got, hits)
        row_pt = np.full((self.n_pages,), -1, np.int32)
        row_pt[:span_pages] = pages
        if hits == 0:
            cache, logits = self._bucket_prefill(params, cache, req, bi,
                                                 row_pt)
        else:
            cached = hits * self.page_size
            suffix = np.asarray(req.tokens[cached:], np.int32)
            n_chunks = -(-len(suffix) // cs)
            toks = np.zeros((1, n_chunks * cs), np.int32)
            toks[0, :len(suffix)] = suffix
            view = PagedKVCache(
                k=cache.k, v=cache.v,
                k_scale=cache.k_scale, v_scale=cache.v_scale,
                page_table=jnp.asarray(row_pt)[None],
                length=jnp.full((1,), cached, jnp.int32))
            last = jnp.int32((len(suffix) - 1) % cs)
            logits = None
            for ci in range(n_chunks):
                logits, view = self._suffix_chunk(
                    params, view,
                    jnp.asarray(toks[:, ci * cs:(ci + 1) * cs]), last)
            # the donated view updated the pool in place; re-own its arrays
            # (pad appends past the prompt are dead: length caps at n and
            # later decode appends overwrite those slots)
            cache = dataclasses.replace(
                cache, k=view.k, v=view.v,
                k_scale=view.k_scale, v_scale=view.v_scale,
                page_table=cache.page_table.at[bi].set(jnp.asarray(row_pt)),
                length=cache.length.at[bi].set(n))
            self._stats["prefix_hit_tokens"] += cached
        self._alloc.register(all_hashes, pages[:len(all_hashes)])
        self._stats["admitted_tokens"] += n
        first, lp = self._sample_first(logits, sampling, key)
        return cache, first, lp

    # --- decode-interleaved chunked admission -------------------------------

    def _admission_start(self, req: Request, bi: int,
                         key: jax.Array) -> "_Admission":
        """Reserve pages and stage ``req``'s prompt as suffix chunks; no
        device work happens here. The scheduler advances the returned
        state one `_suffix_chunk` per iteration (`_admission_advance`),
        with a decode block for the running rows in between."""
        n = len(req.tokens)
        if self.prefix_cache:
            all_hashes, lookup_hashes, hits, cs, span_pages = \
                self._prefix_plan(req)
            pages, got = self._alloc.take(bi, lookup_hashes, span_pages)
            assert got == hits, (got, hits)
        else:
            all_hashes, hits = [], 0
            cs = min(self.prefill_chunk, _bucket(n))
            span = max(n + req.max_new, (-(-n // cs)) * cs)
            span_pages = -(-span // self.page_size)
            if self._windowed_paging:
                # growth pages come on demand; reserve prefill + 1 block
                span_pages = self._windowed_admit_pages(n, cs)
            pages = self._alloc.take(bi, span_pages)
        cached = hits * self.page_size
        suffix = np.asarray(req.tokens[cached:], np.int32)
        n_chunks = -(-len(suffix) // cs)
        toks = np.zeros((1, n_chunks * cs), np.int32)
        toks[0, :len(suffix)] = suffix
        row_pt = np.full((self.n_pages,), -1, np.int32)
        row_pt[:span_pages] = pages
        return _Admission(req=req, bi=bi, key=key, toks=toks, cs=cs,
                          n_chunks=n_chunks, ci=0,
                          last=jnp.int32((len(suffix) - 1) % cs),
                          row_pt=row_pt, pages=list(pages),
                          all_hashes=all_hashes, cached=cached)

    def _admission_advance(self, params, cache, st: "_Admission"):
        """Run ONE prefill chunk of the pending admission against the
        pool (in place, via the donated one-row view — same device path
        as the prefix-cache suffix prefill). Returns (cache, next-token
        logits) — logits are non-None exactly when the admission
        finished, at which point the row's table entry and length are
        installed and (under prefix_cache) its full pages registered."""
        from long_context_attention_tpu.ops.kv_cache import PagedKVCache

        lo = st.ci * st.cs
        view = PagedKVCache(
            k=cache.k, v=cache.v,
            k_scale=cache.k_scale, v_scale=cache.v_scale,
            page_table=jnp.asarray(st.row_pt)[None],
            length=jnp.full((1,), st.cached + lo, jnp.int32))
        logits, view = self._suffix_chunk(
            params, view, jnp.asarray(st.toks[:, lo:lo + st.cs]), st.last)
        # the donated view updated the pool in place: cache must adopt the
        # returned arrays NOW (its previous k/v buffers were consumed)
        cache = dataclasses.replace(cache, k=view.k, v=view.v,
                                    k_scale=view.k_scale,
                                    v_scale=view.v_scale)
        st.ci += 1
        if st.ci < st.n_chunks:
            return cache, None
        n = len(st.req.tokens)
        cache = dataclasses.replace(
            cache,
            page_table=cache.page_table.at[st.bi].set(
                jnp.asarray(st.row_pt)),
            length=cache.length.at[st.bi].set(jnp.int32(n)))
        self._note_windowed_row(st.bi, st.row_pt,
                                int((st.row_pt >= 0).sum()), n)
        if self.prefix_cache:
            self._alloc.register(st.all_hashes,
                                 st.pages[:len(st.all_hashes)])
            self._stats["prefix_hit_tokens"] += st.cached
            self._stats["admitted_tokens"] += n
        return cache, logits

    def _serve_interleaved(self, params, requests: Sequence[Request], *,
                           sampling: SamplingParams = SamplingParams(),
                           eos_id: Optional[int] = None,
                           key: Optional[jax.Array] = None
                           ) -> Dict[int, RequestResult]:
        """`serve` with chunked-prefill admission: at most one admission
        is in flight, advanced one ``prefill_chunk`` per scheduler
        iteration, with one decode block for the running rows between
        chunks — a running row's inter-token stall is bounded by one
        chunk's latency instead of the whole incoming prompt's prefill
        (iteration-level fairness, the chunked-prefill half of Sarathi/
        vLLM scheduling; the reference has no serving layer to compare).
        Greedy trajectories are identical to the batch-admission loop."""
        B = self.max_batch
        for r in requests:
            if len(r.tokens) + r.max_new > self.s_max:
                raise ValueError(
                    f"request {r.id}: prompt ({len(r.tokens)}) + max_new "
                    f"({r.max_new}) exceeds cache capacity "
                    f"s_max={self.s_max}")
        queue = deque(requests)
        cache = self.init_cache()
        dparams = self.decode_params(params)
        slot: List[Optional[Request]] = [None] * B
        emitted: List[List[int]] = [[] for _ in range(B)]
        lps = [[] for _ in range(B)] if self.return_logprobs else None
        cur = np.zeros((B,), np.int32)
        results: Dict[int, RequestResult] = {}
        key = jax.random.PRNGKey(0) if key is None else key
        pending: Optional[_Admission] = None

        def live_mask():
            return jnp.asarray([s is not None for s in slot], jnp.bool_)

        while queue or any(s is not None for s in slot) or pending:
            if pending is None and queue:
                for bi in range(B):
                    if slot[bi] is None and self._can_admit(queue[0], bi):
                        req = queue.popleft()
                        pending = self._admission_start(
                            req, bi, jax.random.fold_in(key, req.id))
                        break
            if pending is not None:
                # admission prefill stays bf16 (params, not dparams) —
                # same contract as batch admission
                cache, logits = self._admission_advance(params, cache,
                                                        pending)
                if logits is not None:
                    st, pending = pending, None
                    first, flp = self._sample_first(logits, sampling,
                                                    st.key)
                    slot[st.bi] = st.req
                    emitted[st.bi] = [first]
                    if lps is not None:
                        lps[st.bi] = [flp]
                    cur[st.bi] = first
                    self._maybe_finish(st.bi, slot, emitted, results,
                                       eos_id, lps)
            if not any(s is not None for s in slot):
                continue
            key, skey = jax.random.split(key)
            if self.step_block <= 1:
                nxt, lp, cache = self._step(dparams, cache, jnp.asarray(cur),
                                            sampling, live_mask(), skey)
                nxt = np.asarray(nxt)[:, None]
                lp = np.asarray(lp)[:, None] if lps is not None else None
            else:
                budget = np.asarray(
                    [slot[bi].max_new - len(emitted[bi])
                     if slot[bi] is not None else 0 for bi in range(B)],
                    np.int32)
                nxt, lp, cache = self._step_block(
                    dparams, cache, jnp.asarray(cur), sampling, live_mask(),
                    jnp.asarray(budget), skey,
                    jnp.int32(-1 if eos_id is None else eos_id))
                nxt = np.asarray(nxt)
                lp = np.asarray(lp) if lps is not None else None
            for j in range(nxt.shape[1]):
                for bi in range(B):
                    if slot[bi] is None:
                        continue
                    emitted[bi].append(int(nxt[bi, j]))
                    if lps is not None:
                        lps[bi].append(float(lp[bi, j]))
                    cur[bi] = int(nxt[bi, j])
                    self._maybe_finish(bi, slot, emitted, results, eos_id,
                                       lps)
            # sliding-window page bookkeeping (PagedContinuousEngine
            # override; no-op for dense engines): assign fresh pages the
            # next block will write, free pages that slid behind the window
            cache = self._post_block(cache, slot, emitted)
        return results


@dataclasses.dataclass(frozen=True)
class PagedSpeculativeContinuousEngine(SpeculativeContinuousEngine,
                                       PagedContinuousEngine):
    """Speculative continuous batching over a PAGED target cache: the
    full serving matrix point — iteration-level scheduling (Orca) x paged
    HBM (vLLM) x draft/verify rounds (speculative decoding) in one engine.

    The TARGET cache is the paged pool (admission reserves pages via the
    allocator — native C++ core when built — and prefix_cache composes:
    a shared-prefix admission reuses pages and prefills only the suffix);
    the DRAFT model keeps a dense cache (a draft is small by construction,
    so its b x s_max cache is cheap, and draft appends/rollbacks stay on
    the fastest path). Verify rounds run `decode_multi_step` straight
    against the pool through the row page tables — the same paged
    multi-token path prefix-cache suffix admission uses. Rollback is still
    free: rejecting a suffix just resets the row's logical length; the
    row's reserved pages absorb the next round's run.

    Greedy emission is token-identical to the dense speculative engine and
    to the plain target-greedy chain (tests/test_paged.py).
    """

    def __post_init__(self):
        PagedContinuousEngine.__post_init__(self)
        SpeculativeContinuousEngine.__post_init__(self)
        if self.interleave_admission or self.host_overlap:
            raise ValueError(
                "speculative rounds already amortize the host sync; "
                "interleave_admission/host_overlap do not compose here")

    @property
    def _windowed_paging(self) -> bool:
        # the speculative round loop has no _post_block growth/reclaim
        # hook; windowed rows here keep whole-span reservations (see the
        # _pages_needed override, which also budgets the gamma+1 verify
        # overhang)
        return False

    def _pages_needed(self, req: Request) -> int:
        # a verify round may append up to gamma + 1 tokens beyond the
        # accepted prefix before rollback trims the length — reserve for it
        pad = _bucket(len(req.tokens))
        span = max(pad, len(req.tokens) + req.max_new + self.gamma + 1)
        if self.prefix_cache:
            span = max(span, len(req.tokens)
                       + min(self.prefill_chunk, pad))
        return -(-span // self.page_size)

    def serve(self, params, draft_params, requests: Sequence[Request],
              **kw) -> Dict[int, RequestResult]:
        # the paged allocator lifecycle around the speculative round loop
        for r in requests:
            self._check_request_fits(r)
        alloc = self._make_alloc()
        object.__setattr__(self, "_alloc", alloc)
        object.__setattr__(self, "_rowwin", {})
        object.__setattr__(self, "_stats",
                           {"prefix_hit_tokens": 0, "admitted_tokens": 0,
                            "evictions": 0})
        try:
            return SpeculativeContinuousEngine.serve(
                self, params, draft_params, requests, **kw)
        finally:
            if self.prefix_cache:
                self._stats["evictions"] = alloc.evictions
            object.__setattr__(self, "_alloc", None)
