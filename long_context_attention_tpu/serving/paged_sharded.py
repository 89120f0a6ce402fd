"""Sharded x paged x prefix-cached continuous serving (VERDICT r4 item 2).

The multi-chip half of the paged serving runtime: the physical page POOL is
sharded over the mesh's sequence axes and every rank pages its own blocked
slot range locally.

Layout (the "blocked pages" design):

* a row's logical capacity ``s_max`` splits into ``n`` contiguous shards of
  ``slots = s_max / n`` tokens, exactly like the dense sharded cache — so
  per-rank lengths, window first-columns, and sink slices reuse the dense
  sharded machinery verbatim (`serving/sharded.py`);
* logical page ``j`` of a row therefore lives on rank ``j // ppr``
  (``ppr = n_pages / n``), and its physical page comes from that rank's
  PARTITION of the pool: global ids ``[r * P_local, (r+1) * P_local)`` with
  local page 0 of every partition reserved as that rank's scratch page;
* the page table stays replicated (host-maintained, one scatter per block);
  each rank slices its ``(b, ppr)`` window and rebases ids into its
  partition inside `shard_map` (`sharded.py:_local_pages`).

Host bookkeeping becomes ``n`` independent single-host allocators (python
or native C++ — the same `serving/native.py` cores), one per partition,
wrapped so the engine-facing interface is unchanged. Prefix caching
composes for free: a shared prefix page is reused at the SAME logical index
it was registered under, so it is guaranteed to live on the right rank.

Reference role: the reference is a training-time attention layer
(`/root/reference/yunchang/hybrid/attn_layer.py`); multi-chip paged serving
belongs to the north star (BASELINE.json: 1M-token serving on a sliced
mesh) — this module supplies the memory manager that a 1M-context
multi-chip batch needs (dense sharded caches reserve b x s_max slots;
paged ones reserve only what rows use).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from long_context_attention_tpu.models.llama import decode_multi_step, decode_step
from long_context_attention_tpu.ops.kv_cache import PagedKVCache
from long_context_attention_tpu.serving.continuous import (
    PagedContinuousEngine,
    _validate_release,
    PagedSpeculativeContinuousEngine,
    Request,
    ShardedContinuousEngine,
    ShardedSpeculativeContinuousEngine,
    SpeculativeContinuousEngine,
    _bucket,
)

__all__ = ["ShardedPagedContinuousEngine",
           "ShardedPagedSpeculativeContinuousEngine"]


def _split_range(lo: int, hi: int, ppr: int) -> List[Tuple[int, int, int]]:
    """[(partition, local lo, local hi)] covering logical pages [lo, hi)
    under the blocked layout (partition = logical // ppr) — the ONE place
    the blocked-range arithmetic lives (allocators and the engine's
    capacity gate must never disagree)."""
    out = []
    j = lo
    while j < hi:
        r = j // ppr
        e = min(hi, (r + 1) * ppr)
        out.append((r, j - r * ppr, e - r * ppr))
        j = e
    return out


class _PartitionedPageAllocator:
    """n per-partition free lists behind the single-host allocator API.

    Page ids crossing this interface are GLOBAL (partition r owns
    ``[r * p_local, (r+1) * p_local)``); each wrapped allocator works in
    local ids over its own ``p_local``-page pool (local 0 = scratch).
    Logical page j belongs to partition ``j // ppr`` — the blocked layout
    invariant every method enforces.
    """

    def __init__(self, pool_pages: int, n: int, ppr: int, make_one):
        assert pool_pages % n == 0, (pool_pages, n)
        self.n = n
        self.ppr = ppr
        self.p_local = pool_pages // n
        self.parts = [make_one(self.p_local) for _ in range(n)]
        # mirror of each row's GLOBAL pages: release_pages validates the
        # whole list here BEFORE dispatching, so a bad page cannot leave
        # one partition released and another untouched (the per-partition
        # allocators are atomic individually, not jointly)
        self._rows: dict = {}

    def _split(self, lo: int, hi: int) -> List[Tuple[int, int, int]]:
        return _split_range(lo, hi, self.ppr)

    def available_for(self, bi: int, need: int) -> bool:
        """Can pages [0, need) be taken for ``bi`` (counting its own
        reclaimable pages per partition)?"""
        if need > self.n * self.ppr:
            return False  # beyond the row's logical capacity
        for r, lo, hi in self._split(0, need):
            if self.parts[r].available(bi) < hi - lo:
                return False
        return True

    def take(self, bi: int, need: int) -> List[int]:
        """Pages for logical [0, need), ordered by logical index. Frees
        row ``bi``'s old pages in EVERY partition (lazy reclaim — an old
        request may have spanned more partitions than the new one)."""
        pages: List[int] = []
        touched = set()
        for r, lo, hi in self._split(0, need):
            got = self.parts[r].take(bi, hi - lo)
            pages.extend(p + r * self.p_local for p in got)
            touched.add(r)
        for r in range(self.n):
            if r not in touched:
                self.parts[r].take(bi, 0)  # free old pages, take none
        self._rows[bi] = list(pages)
        return pages

    def take_extra_range(self, bi: int, lo: int, hi: int) -> List[int]:
        """Growth pages for logical [lo, hi) of a RUNNING row."""
        pages: List[int] = []
        for r, llo, lhi in self._split(lo, hi):
            got = self.parts[r].take_extra(bi, lhi - llo)
            pages.extend(p + r * self.p_local for p in got)
        self._rows.setdefault(bi, []).extend(pages)
        return pages

    def release_pages(self, bi: int, pages: List[int]) -> None:
        """Free specific (global) pages — routed to the owning partition
        by id. The WHOLE list validates against the row mirror first: the
        per-partition allocators are individually atomic, but a bad page
        in partition k must not leave partitions < k already released."""
        if not pages:
            return
        _validate_release(self._rows.get(bi, []), pages, bi)
        by_part = {}
        for p in pages:
            by_part.setdefault(p // self.p_local, []).append(
                p % self.p_local)
        for r, local in sorted(by_part.items()):
            self.parts[r].release_pages(bi, local)
        row = self._rows[bi]
        for p in pages:
            row.remove(p)


class _PartitionedPrefixAllocator:
    """n per-partition prefix allocators (refcounts + content LRU) behind
    the single-host `PrefixPageAllocator` API. Key j (page j's chain hash)
    is owned by partition ``j // ppr``; hits stay prefix-consecutive
    across partitions because key lists arrive in logical order."""

    def __init__(self, pool_pages: int, n: int, ppr: int, make_one):
        assert pool_pages % n == 0, (pool_pages, n)
        self.n = n
        self.ppr = ppr
        self.p_local = pool_pages // n
        self.parts = [make_one(self.p_local) for _ in range(n)]

    def _key_slices(self, hashes: Sequence[bytes]):
        for r in range(self.n):
            ks = hashes[r * self.ppr:(r + 1) * self.ppr]
            if not ks and r * self.ppr >= len(hashes):
                break
            yield r, ks

    def lookup(self, hashes: Sequence[bytes]) -> int:
        hits = 0
        for r, ks in self._key_slices(hashes):
            h = self.parts[r].lookup(ks)
            hits += h
            if h < len(ks):
                break
        return hits

    def can_take(self, bi: int, hashes: Sequence[bytes],
                 span_pages: int) -> bool:
        hits = self.lookup(hashes)
        for r in range(self.n):
            lo, hi = r * self.ppr, (r + 1) * self.ppr
            span_r = max(0, min(span_pages, hi) - lo)
            ks = hashes[lo:min(hits, hi)] if hits > lo else []
            if not self.parts[r].can_take(bi, ks, span_r):
                return False
        return True

    def take(self, bi: int, hashes: Sequence[bytes],
             span_pages: int) -> Tuple[List[int], int]:
        hits = self.lookup(hashes)
        pages: List[int] = []
        got = 0
        for r in range(self.n):
            lo, hi = r * self.ppr, (r + 1) * self.ppr
            span_r = max(0, min(span_pages, hi) - lo)
            # keys only for the still-consecutive hit prefix: a partition
            # past the first miss takes fresh pages (its stale cached
            # pages stay evictable)
            ks = hashes[lo:min(hits, hi)] if hits > lo else []
            if span_r == 0 and not ks:
                self.parts[r].release_row(bi)
                continue
            p_r, g_r = self.parts[r].take(bi, ks, span_r)
            assert g_r == len(ks), (g_r, len(ks))
            got += g_r
            pages.extend(p + r * self.p_local for p in p_r)
        return pages, got

    def register(self, hashes: Sequence[bytes],
                 pages: Sequence[int]) -> None:
        for r, ks in self._key_slices(hashes):
            lo = r * self.ppr
            pg = [p - r * self.p_local for p in pages[lo:lo + len(ks)]]
            if ks:
                self.parts[r].register(ks, pg)

    @property
    def evictions(self) -> int:
        return sum(p.evictions for p in self.parts)

    @property
    def hit_pages(self) -> int:
        return sum(p.hit_pages for p in self.parts)


@dataclasses.dataclass(frozen=True)
class ShardedPagedContinuousEngine(PagedContinuousEngine,
                                   ShardedContinuousEngine):
    """Continuous batching over a mesh-sharded PAGED cache (+ optional
    prefix caching and sliding-window dynamic paging).

    Inherits the paged host scheduler (admission backpressure, windowed
    reclaim/growth, prefix plans) from `PagedContinuousEngine` and swaps
    every device piece for a `shard_map` over the pool partitions:

    * admission prefill: USP-sharded forward (`ShardedEngine.prefill`),
      scattered page-by-page into each rank's pool partition;
    * prefix-hit suffixes: chunked `decode_multi_step` against the b=1
      sharded pool view (owner-routed appends, LSE-merged reads);
    * decode: `decode_step(shard_axes=...)` with each rank slicing its
      (b, ppr) window of the replicated page table
      (`serving/sharded.py:_local_pages`).

    Constraints: ``s_max``, ``n_pages`` and ``pool_pages`` divisible by
    the sequence-shard count. ``interleave_admission`` composes (r5): the
    chunked admission advances through the sharded pool view — the same
    `_suffix_chunk` path prefix-hit suffixes use.
    """

    def __post_init__(self):
        ShardedContinuousEngine.__post_init__(self)
        PagedContinuousEngine.__post_init__(self)
        n = self.n_seq
        assert self.n_pages % n == 0, (
            f"n_pages ({self.n_pages}) must divide over {n} sequence "
            f"shards")
        assert self.pool_pages % n == 0, (
            f"pool_pages ({self.pool_pages}) must divide over {n} "
            f"partitions")
        assert (self.s_max // n) % self.page_size == 0, (
            "per-rank slots must be whole pages", self.s_max, n,
            self.page_size)
        if self._windowed_paging:
            # the rolling window band MOVES across partitions as rows
            # advance: reclamation frees pages on the partition BEHIND the
            # window while growth takes from the partition AHEAD — so the
            # single-host sizing rule (pool >= max_batch x rolling + 1)
            # must hold PER PARTITION against each partition's worst-case
            # share of a row's working set, or take_extra can exhaust one
            # partition mid-serve at pool sizes the single-host engine
            # survives (r5 review finding, empirically reproduced)
            per_row = min(self.ppr, self._rolling_pages())
            need = self.max_batch * per_row
            if self.p_local - 1 < need:
                raise ValueError(
                    f"windowed dynamic paging needs every pool partition "
                    f"to hold max_batch x min(ppr, rolling working set) = "
                    f"{self.max_batch} x {per_row} = {need} allocatable "
                    f"pages; partitions have {self.p_local - 1} "
                    f"(pool_pages {self.pool_pages} over {n} shards). "
                    f"Raise pool_pages to >= {n * (need + 1)}.")

    # --- layout helpers ----------------------------------------------------

    @property
    def n_seq(self) -> int:
        n = 1
        for a in self._sub.seq_axes:
            n *= self.mesh.shape[a]
        return n

    @property
    def ppr(self) -> int:
        return self.n_pages // self.n_seq

    @property
    def p_local(self) -> int:
        return self.pool_pages // self.n_seq

    def _paged_specs(self) -> PagedKVCache:
        seq = self._sub.seq_axes
        val = P(None, seq, None, None, None)
        sc = None if self.cache_dtype == "bfloat16" else val
        return PagedKVCache(k=val, v=val, k_scale=sc, v_scale=sc,
                            page_table=P(), length=P())

    # --- capacity ----------------------------------------------------------

    def _check_request_fits(self, r: Request) -> None:
        need = self._pages_needed(r)
        for part, lo, hi in self._alloc_split(need):
            if hi - lo > self.p_local - 1:
                raise ValueError(
                    f"request {r.id} needs {hi - lo} pages on partition "
                    f"{part}; each has {self.p_local - 1} allocatable")

    def _alloc_split(self, need: int):
        return _split_range(0, need, self.ppr)

    def _can_admit(self, req: Request, bi: int) -> bool:
        if not self.prefix_cache:
            return self._alloc.available_for(bi, self._pages_needed(req))
        return super()._can_admit(req, bi)

    def _take_growth(self, bi: int, lo: int, hi: int) -> List[int]:
        return self._alloc.take_extra_range(bi, lo, hi)

    def _make_alloc(self):
        use_native = self.native_runtime
        make_basic = make_prefix = None
        if use_native is None or use_native:
            from long_context_attention_tpu.serving import native
            if native.native_available():
                object.__setattr__(self, "_alloc_kind", "native")
                make_basic = native.NativePageAllocator
                make_prefix = native.NativePrefixPageAllocator
            elif use_native:
                raise RuntimeError(
                    "native_runtime=True but native/lca_host.cc failed to "
                    "build (g++ missing?)")
        if make_basic is None:
            from long_context_attention_tpu.serving.continuous import (
                _PageAllocator,
            )
            from long_context_attention_tpu.serving.prefix_cache import (
                PrefixPageAllocator,
            )
            object.__setattr__(self, "_alloc_kind", "python")
            make_basic, make_prefix = _PageAllocator, PrefixPageAllocator
        if self.prefix_cache:
            return _PartitionedPrefixAllocator(
                self.pool_pages, self.n_seq, self.ppr, make_prefix)
        return _PartitionedPageAllocator(
            self.pool_pages, self.n_seq, self.ppr, make_basic)

    # --- device pieces -----------------------------------------------------

    def init_cache(self) -> PagedKVCache:
        cache = PagedKVCache.init(self.cfg.n_layers, self.max_batch,
                                  self.pool_pages, self.page_size,
                                  self.n_pages, self.cfg.n_kv_heads,
                                  self.cfg.head_dim, self.cache_dtype)
        specs = self._paged_specs()
        return jax.tree.map(
            lambda x, sp: jax.device_put(x, NamedSharding(self.mesh, sp)),
            cache, specs)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _scatter_row(self, cache: PagedKVCache, row, pages: jnp.ndarray):
        """Scatter a prefilled row cache (dense, slot-sharded, padded to
        s_max — `ShardedEngine.prefill`'s output) into the pool pages,
        each rank writing its own partition (donated: in place).
        Unassigned (-1) entries clamp to the rank's scratch page — those
        writes are garbage into a page no live row owns."""
        specs = self._paged_specs()
        row_specs = self._sub._cache_specs()
        ps, ppr, p_local = self.page_size, self.ppr, self.p_local
        seq = self._sub.seq_axes
        quant = cache.k_scale is not None

        def scatter(*a):
            if quant:
                kp, vp, ksp, vsp, rk, rv, rks, rvs, pages = a
            else:
                kp, vp, rk, rv, pages = a
                ksp = vsp = rks = rvs = None
            r = lax.axis_index(seq)
            lt = lax.dynamic_slice(pages, (r * ppr,), (ppr,)) - r * p_local
            for pi in range(ppr):
                phys = jnp.clip(lt[pi], 0, p_local - 1)
                st = (jnp.int32(0), phys, jnp.int32(0), jnp.int32(0),
                      jnp.int32(0))
                kp = lax.dynamic_update_slice(
                    kp, rk[:, :, :, pi * ps:(pi + 1) * ps], st)
                vp = lax.dynamic_update_slice(
                    vp, rv[:, :, :, pi * ps:(pi + 1) * ps], st)
                if quant:
                    ksp = lax.dynamic_update_slice(
                        ksp, rks[:, :, :, :, pi * ps:(pi + 1) * ps], st)
                    vsp = lax.dynamic_update_slice(
                        vsp, rvs[:, :, :, :, pi * ps:(pi + 1) * ps], st)
            return (kp, vp, ksp, vsp) if quant else (kp, vp)

        if quant:
            ins = (specs.k, specs.v, specs.k_scale, specs.v_scale,
                   row_specs.k, row_specs.v, row_specs.k_scale,
                   row_specs.v_scale, P())
            outs = (specs.k, specs.v, specs.k_scale, specs.v_scale)
            args = (cache.k, cache.v, cache.k_scale, cache.v_scale,
                    row.k, row.v, row.k_scale, row.v_scale, pages)
        else:
            ins = (specs.k, specs.v, row_specs.k, row_specs.v, P())
            outs = (specs.k, specs.v)
            args = (cache.k, cache.v, row.k, row.v, pages)
        res = jax.shard_map(scatter, mesh=self.mesh, in_specs=ins,
                            out_specs=outs, check_vma=False)(*args)
        if quant:
            k, v, ksc, vsc = res
        else:
            (k, v), ksc, vsc = res, None, None
        return dataclasses.replace(cache, k=k, v=v, k_scale=ksc, v_scale=vsc)

    def _bucket_prefill(self, params, cache, req: Request, bi: int,
                        row_pt: np.ndarray):
        """Cold-path sharded admission: USP prefill (padded to s_max by
        `ShardedEngine.prefill`, which also reshards prompt-shards into
        cache-slot shards) + per-partition page scatter."""
        n = len(req.tokens)
        pad = _bucket(n)
        toks = np.zeros((1, pad), np.int32)
        toks[0, :n] = np.asarray(req.tokens, np.int32)
        logits, row = self._sub.prefill(params, jnp.asarray(toks),
                                        jnp.int32(n - 1))
        cache = self._scatter_row(cache, row, jnp.asarray(row_pt))
        cache = dataclasses.replace(
            cache,
            page_table=cache.page_table.at[bi].set(jnp.asarray(row_pt)),
            length=cache.length.at[bi].set(jnp.int32(n)))
        return cache, logits

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _suffix_chunk(self, params, view, toks: jnp.ndarray,
                      last_index: jnp.ndarray):
        """One sharded suffix-prefill chunk: teacher-force against the b=1
        pool view under the mesh (paged sharded decode/append)."""
        specs = self._paged_specs()

        def one(params, view, toks, last_index):
            logits, view = decode_multi_step(
                params, view, toks, self.cfg, interpret=self.interpret,
                shard_axes=self._sub.seq_axes, last_index=last_index)
            return logits[:, 0], view

        return jax.shard_map(
            one, mesh=self.mesh,
            in_specs=(P(), specs, P(), P()),
            out_specs=(P(), specs),
            check_vma=False,
        )(params, view, toks, last_index)

    def _decode_one(self, params, cache: PagedKVCache, tokens, active):
        specs = self._paged_specs()

        def one(params, cache, tok, act):
            return decode_step(params, cache, tok, self.cfg,
                               interpret=self.interpret,
                               shard_axes=self._sub.seq_axes, active=act)

        return jax.shard_map(
            one, mesh=self.mesh,
            in_specs=(P(), specs, P(), P()),
            out_specs=(P(), specs),
            check_vma=False,
        )(params, cache, tokens, active)


@dataclasses.dataclass(frozen=True)
class ShardedPagedSpeculativeContinuousEngine(
        PagedSpeculativeContinuousEngine,
        ShardedSpeculativeContinuousEngine,
        ShardedPagedContinuousEngine):
    """The full serving matrix point: iteration-level scheduling (Orca) x
    paged pool partitions over the MESH (vLLM, multi-chip) x draft/verify
    speculative rounds — per-partition page allocators + prefix caching
    from `ShardedPagedContinuousEngine`, sharded draft scans from
    `ShardedSpeculativeContinuousEngine`, the gamma-overhang page budget
    and round loop from `PagedSpeculativeContinuousEngine`. Only the
    verify rounds need overriding here: they run `decode_multi_step`
    against the PAGED sharded pool (each rank's rebased table window)
    instead of the dense sharded cache. The draft keeps a dense sharded
    cache (drafts are small by construction)."""

    def __post_init__(self):
        ShardedPagedContinuousEngine.__post_init__(self)
        SpeculativeContinuousEngine.__post_init__(self)
        if self.interleave_admission or self.host_overlap:
            raise ValueError(
                "speculative rounds already amortize the host sync; "
                "interleave_admission/host_overlap do not compose here")

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _verify_round(self, params, tcache, run_toks, active):
        specs = self._paged_specs()
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

    @functools.partial(jax.jit, static_argnums=(0, 6), donate_argnums=2)
    def _verify_round_sampled(self, params, tcache, run_toks, drafts, qdist,
                              sampling, key, active):
        from long_context_attention_tpu.serving.speculative import (
            leviathan_accept,
        )

        specs = self._paged_specs()
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
