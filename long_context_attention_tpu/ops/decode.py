"""Pallas decode attention: one query token vs a (quantized) KV cache.

The serving hot loop (north star, BASELINE.json): flash-decoding-style
blockwise attention of (b, h, d) queries against a BHSD cache
(b, h_kv, s_max, d) that may be int8 / float8_e4m3fn with per-token scales
(ops/kv_cache.py). Decode is HBM-bandwidth-bound, so:

* quantized K/V tiles are dequantized **in VMEM** (HBM streams 1-2 bytes per
  element instead of 2-4); K's scale folds into the scores row, V's scale
  folds into P before the PV matmul — no materialized dequantized cache.
* per-row ``lengths`` gate both compute (`pl.when` + in-tile mask) and DMA
  (clamped kv index map — tiles past the filled prefix are never fetched).
* returns (out, lse) so sequence-sharded caches merge partials across the
  ring axis with the same online-LSE math as training (ops/merge.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from long_context_attention_tpu.ops.flash import _CLAMP
from long_context_attention_tpu.ops.merge import merge_partials
from long_context_attention_tpu.utils.config import NEG_INF, default_interpret

_LOG2E = math.log2(math.e)

__all__ = ["decode_attention", "cache_append"]

_APPEND_ROWS = 32    # sublane tile for the KV splice (int8 native tiling)
_APPEND_LANES = 128  # lane tile for the scale splice


def _append_kernel(pos_ref, *refs, rows: int, lanes: int, quantized: bool,
                   layered: bool, s_max: int, paged: bool = False):
    refs = list(refs)
    if layered:
        del refs[0]  # layer-index prefetch (consumed by the index maps)
    if paged:
        del refs[0]  # page-table prefetch (consumed by the index maps)
    if quantized:
        (k_ref, v_ref, kn_ref, vn_ref, ksn_ref, vsn_ref, ks_ref, vs_ref,
         ko_ref, vo_ref, kso_ref, vso_ref) = refs
    else:
        k_ref, v_ref, kn_ref, vn_ref, ko_ref, vo_ref = refs
        ks_ref = vs_ref = kso_ref = vso_ref = None

    def tile(ref):
        # (h_kv, rows, d) kv / (h_kv, 1, lanes) scale tiles: ALL heads ride
        # one grid cell — the grid is (b, n_tok) only, so the per-cell
        # dispatch overhead is paid once per row-token, not once per head
        # (at b=8, h_kv=8 the old (b, h_kv, n) grid spent ~0.7 ms/call on
        # 64 cells of ~µs-sized work)
        return ref[0, 0] if layered else ref[0]

    def store(ref, val):
        if layered:
            ref[0, 0] = val
        else:
            ref[0] = val

    def ntile(ref):
        # new-token blocks are (1, h_kv, 1, 1, d) / (1, h_kv, 1, 1, 1)
        # regardless of layering (the run arrays carry no layer dim)
        return ref[0, :, 0]

    ib = pl.program_id(0)
    it = pl.program_id(1)    # token index within the appended run
    base = pos_ref[ib]
    # range-based liveness: token it lands at slot base+it and is written
    # only when that slot lies inside THIS buffer. A run may straddle a
    # sequence-shard boundary (multi-token append over a sharded cache), so
    # each rank writes exactly its in-range suffix/prefix of the run;
    # append_pos = -n (whole run out of range) skips the row entirely.
    # Clipped out-of-range steps re-init only tiles nothing has written yet
    # (positions below 0 precede all live writes; above s_max-1, r != 0
    # since s_max % rows == 0), so no live write is ever lost.
    posr = base + it
    live = (posr >= 0) & (posr < s_max)
    pos = jnp.clip(posr, 0, s_max - 1)
    r = pos % rows

    # The out block index only changes when the run crosses a tile
    # boundary; the VMEM buffer persists across same-tile steps (Mosaic
    # revisit semantics), so initialize it from the input tile exactly when
    # entering the tile, then accumulate one row per step.
    @pl.when((it == 0) | (r == 0))
    def _enter_kv_tile():
        store(ko_ref, tile(k_ref))
        store(vo_ref, tile(v_ref))

    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, rows, 1), 1) == r) & live
    store(ko_ref, jnp.where(sel, ntile(kn_ref), tile(ko_ref)))
    store(vo_ref, jnp.where(sel, ntile(vn_ref), tile(vo_ref)))
    if ks_ref is not None:
        c = pos % lanes

        @pl.when((it == 0) | (c == 0))
        def _enter_sc_tile():
            store(kso_ref, tile(ks_ref))
            store(vso_ref, tile(vs_ref))

        csel = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2)
                == c) & live
        store(kso_ref, jnp.where(csel, ntile(ksn_ref), tile(kso_ref)))
        store(vso_ref, jnp.where(csel, ntile(vsn_ref), tile(vso_ref)))


def cache_append(
    k_cache: jnp.ndarray,    # (b, h_kv, s_max, d) — or stacked (L, ...) with
    v_cache: jnp.ndarray,    # `layer`; bf16 / int8 / fp8
    k_new: jnp.ndarray,      # (b, h_kv, n, d) new token run, cache dtype
    v_new: jnp.ndarray,
    append_pos: jnp.ndarray,  # (b,) int32 FIRST slot per row; may be
                              # negative/out-of-range (see below)
    k_scale: Optional[jnp.ndarray] = None,   # (b, h_kv, 1, s_max) fp32
    v_scale: Optional[jnp.ndarray] = None,   # (or (L, b, h_kv, 1, s_max);
    ks_new: Optional[jnp.ndarray] = None,    # legacy (.., h_kv, s_max) is
    vs_new: Optional[jnp.ndarray] = None,    # reshaped, costing a relayout)
    *,
    layer: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
    page_table: Optional[jnp.ndarray] = None,
):
    """Splice a run of n consecutive tokens per batch row into the KV cache
    IN PLACE (n = 1 is the decode hot path; n > 1 is the speculative-decode
    verify step writing the whole draft run at once).

    ``page_table``: optional (b, n_pages) int32 — PAGED cache mode (see
    `decode_attention`): the cache arrays are pools (P, h_kv, page, d)
    (stacked (L, P, ...) with ``layer``), logical slot s of row b lives in
    pool page ``page_table[b, s // page]`` at offset ``s % page``. Only
    the index maps change; liveness stays in logical positions with
    capacity ``n_pages * page``. A run may straddle a PAGE boundary — the
    per-token grid already re-derives its tile each step, so page crossings
    need no special casing (revisit-initialization triggers on r == 0,
    which every page boundary satisfies since page % rows == 0).

    The write happens inside a pallas kernel whose cache outputs alias its
    cache inputs (``input_output_aliases``), so XLA updates the HBM buffers
    in place even when the cache rides a ``lax.scan`` carry. The obvious
    alternative — ``dynamic_update_slice`` the token, then let the decode
    kernel read the cache — makes XLA double-buffer the entire carried cache
    (a DUS-written buffer consumed by a custom call defeats the while-loop
    aliaser): 2 extra full-cache copies per decode step, 985 ms/token
    instead of ~50 at b=8 @32K. Fusing the splice into the attention kernel
    itself also loses: its per-(b,h) aliased output tiles write back on
    every grid step, doubling the kernel's HBM traffic (249 -> 120 GB/s at
    b=8). Here the grid is (b, n_tok) — ALL heads ride one cell's blocks,
    because at ~µs of work per cell the old (b, h_kv, n) grid was pure
    dispatch overhead (~0.7 ms/call at b=8, h_kv=8) — and scales are taken
    in the kernel's native (.., h_kv, 1, s_max) layout: feeding the old
    (.., h_kv, s_max) shape forces XLA to physically re-tile
    T(8,128) -> T(1,128), ~75 MB copied per array per call.

    Liveness is per (row, token): token i writes slot ``append_pos + i``
    exactly when that slot lies in [0, s_max) — a run may straddle a
    sequence-shard boundary, and each rank passes its LOCAL (possibly
    negative) base so it writes just its in-range part
    (`serving/sharded.py`). ``append_pos <= -n`` skips the row entirely
    (the continuous batcher's inactive rows; n = 1 keeps the historic -1).
    Returns the updated ``(k_cache, v_cache)`` or ``(k_cache, v_cache,
    k_scale, v_scale)`` — the same buffers (and the same SHAPES they were
    passed with), donated through.
    """
    layered = layer is not None
    paged = page_table is not None
    if layered:
        _, pool_b, h_kv, page, d = k_cache.shape
    else:
        pool_b, h_kv, page, d = k_cache.shape
    b = k_new.shape[0]
    # logical capacity: paged rows span n_pages pages; dense rows span the
    # cache's own slot dim (pool_b is then the batch)
    s_max = page_table.shape[1] * page if paged else page
    n_tok = k_new.shape[2]
    quantized = k_scale is not None
    rows = min(_APPEND_ROWS, page)
    lanes = min(_APPEND_LANES, page)
    assert page % rows == 0 and page % lanes == 0, (page, rows, lanes)
    interp = default_interpret() if interpret is None else bool(interpret)

    def _pos(ibb, it, p):
        return jnp.clip(p[ibb] + it, 0, s_max - 1)

    def _row(ibb, it, p, *rest):
        # paged: the physical pool page owning this token's logical slot
        # (clamped: skipped rows pass out-of-range bases whose clipped
        # position may map to an unallocated -1 entry; nothing is written
        # there — liveness is computed from the UNclipped position)
        if paged:
            lpage = _pos(ibb, it, p) // page
            return jnp.clip(rest[-1][ibb, lpage], 0, pool_b - 1)
        return ibb

    def _tile(ibb, it, p):
        return _pos(ibb, it, p) % page // rows

    def _lane_tile(ibb, it, p):
        return _pos(ibb, it, p) % page // lanes

    sc_shape = None
    if quantized:
        sc_shape = ((k_scale.shape[0], pool_b, h_kv, 1, page) if layered
                    else (pool_b, h_kv, 1, page))
    if layered:
        def kv_im(ibb, it, p, li, *rest):
            return (li[0], _row(ibb, it, p, *rest), 0,
                    _tile(ibb, it, p), 0)

        def sc_im(ibb, it, p, li, *rest):
            return (li[0], _row(ibb, it, p, *rest), 0, 0,
                    _lane_tile(ibb, it, p))

        def new_im(ibb, it, p, li, *rest):
            return (ibb, 0, it, 0, 0)

        kv_block = (1, 1, h_kv, rows, d)
        sc_block = (1, 1, h_kv, 1, lanes)
        nw_block = (1, h_kv, 1, 1, d)
        ns_block = (1, h_kv, 1, 1, 1)
    else:
        def kv_im(ibb, it, p, *rest):
            return (_row(ibb, it, p, *rest), 0, _tile(ibb, it, p), 0)

        def sc_im(ibb, it, p, *rest):
            return (_row(ibb, it, p, *rest), 0, 0, _lane_tile(ibb, it, p))

        def new_im(ibb, it, p, *rest):
            return (ibb, 0, it, 0, 0)

        kv_block = (1, h_kv, rows, d)
        sc_block = (1, h_kv, 1, lanes)
        nw_block = (1, h_kv, 1, 1, d)
        ns_block = (1, h_kv, 1, 1, 1)

    # new-token runs ride with unit dims so their (1, d)/(1, 1) tiles are
    # Mosaic-legal for every run length n (cf. the LSE layout note)
    in_specs = [pl.BlockSpec(kv_block, kv_im), pl.BlockSpec(kv_block, kv_im),
                pl.BlockSpec(nw_block, new_im), pl.BlockSpec(nw_block, new_im)]
    inputs = [k_cache, v_cache,
              k_new.reshape(b, h_kv, n_tok, 1, d),
              v_new.reshape(b, h_kv, n_tok, 1, d)]
    out_specs = [pl.BlockSpec(kv_block, kv_im), pl.BlockSpec(kv_block, kv_im)]
    out_shape = [jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype)] * 2
    if quantized:
        in_specs += [pl.BlockSpec(ns_block, new_im),
                     pl.BlockSpec(ns_block, new_im),
                     pl.BlockSpec(sc_block, sc_im),
                     pl.BlockSpec(sc_block, sc_im)]
        inputs += [ks_new.reshape(b, h_kv, n_tok, 1, 1).astype(jnp.float32),
                   vs_new.reshape(b, h_kv, n_tok, 1, 1).astype(jnp.float32),
                   k_scale.reshape(sc_shape), v_scale.reshape(sc_shape)]
        out_specs += [pl.BlockSpec(sc_block, sc_im),
                      pl.BlockSpec(sc_block, sc_im)]
        out_shape += [jax.ShapeDtypeStruct(sc_shape, jnp.float32)] * 2

    # aliases: flat input indices INCLUDE the scalar-prefetch operands
    n_pref = 1 + int(layered) + int(paged)
    io = {n_pref + 0: 0, n_pref + 1: 1}          # k_cache, v_cache
    if quantized:
        io[n_pref + 6] = 2                        # k_scale
        io[n_pref + 7] = 3                        # v_scale

    prefetch = [jnp.asarray(append_pos, jnp.int32)]
    if layered:
        prefetch.append(jnp.asarray(layer, jnp.int32).reshape(1))
    if paged:
        prefetch.append(jnp.asarray(page_table, jnp.int32))
    res = pl.pallas_call(
        functools.partial(_append_kernel, rows=rows, lanes=lanes,
                          quantized=quantized, layered=layered, s_max=s_max,
                          paged=paged),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=(b, n_tok),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        input_output_aliases=io,
        interpret=interp,
    )(*prefetch, *inputs)
    if quantized:
        return (res[0], res[1], res[2].reshape(k_scale.shape),
                res[3].reshape(v_scale.shape))
    return res[0], res[1]


def _decode_kernel(
    len_ref,  # scalar prefetch: (b,) int32 filled length per batch row
    *refs,
    scale: float, block_kv: int, quantized: bool, g: int,
    layered: bool = False, window_left: int = -1, softcap: float = 0.0,
    alibi: bool = False, has_first_cols: bool = False, n_tok: int = 1,
    paged: bool = False, int8_mxu: bool = False, sink_tokens: int = 0,
    has_sink_cols: bool = False, banded: bool = False, band_ns: int = 0,
    nk_logical: int = 0, fast: bool = True,
):
    refs = list(refs)
    if layered:
        del refs[0]  # the layer-index prefetch ref (consumed by index maps)
    fc_ref = refs.pop(0) if has_first_cols else None
    scol_ref = refs.pop(0) if has_sink_cols else None
    if paged:
        del refs[0]  # page-table prefetch (consumed by the index maps)
    qs_ref = None
    if int8_mxu:
        q_ref, qs_ref, k_ref, v_ref, ks_ref, vs_ref = refs[:6]
        refs = refs[6:]
    elif quantized:
        q_ref, k_ref, v_ref, ks_ref, vs_ref = refs[:5]
        refs = refs[5:]
    else:
        q_ref, k_ref, v_ref = refs[:3]
        refs = refs[3:]
        ks_ref = vs_ref = None
    sl_ref = None
    if alibi:
        sl_ref = refs.pop(0)
    if fast:
        # max-free mode has no running max — no m scratch in the list
        # (the same conditional-scratch pattern as ops/flash.py _tri_body)
        out_ref, lse_ref, l_scr, acc_scr = refs
        m_scr = None
    else:
        out_ref, lse_ref, m_scr, l_scr, acc_scr = refs

    # ALL h_kv heads ride one grid cell (r5): tiles are (h_kv, bkv, d) and
    # the matmuls batch over the head dim. vs the old (b, h_kv, ..) grid
    # this cuts grid steps h_kv-fold at the same bytes/step budget (tile
    # h_kv x larger), which is what removes the ~1.2 us/step scalar
    # dispatch from the critical path (measured: 13.4 -> 12.0 ms serving
    # attn at b=8 @32K x16 layers) and h_kv-folds the per-cell pipeline
    # ramp of short banded grids.
    def kv_tile(ref):  # -> (h_kv, bkv, d)
        return ref[0, 0] if layered else ref[0]

    def sc_tile(ref):  # -> (h_kv, 1, bkv)
        return ref[0, 0] if layered else ref[0]

    ib = pl.program_id(0)
    isp = pl.program_id(1)   # kv split (flash-decoding): independent stream
    ik = pl.program_id(2)    # tile within this split
    nk = pl.num_programs(2)
    length = len_ref[ib]
    if banded:
        # windowed decode over a long cache: the grid covers only the sink
        # tiles ([0, band_ns)) plus the window BAND ([start_tile, last]) —
        # cost independent of s_max (no dead-step iteration over the middle
        # of the cache). Guards below keep clamped band steps and band-
        # covered sink tiles from double-counting. A sequence-sharded cache
        # (first_cols) bands from the rank's OWN slice of the global window;
        # its visible span is bounded by the window width, so the same
        # static band covers every rank (interior ranks included).
        last_t = jnp.clip((length - 1) // block_kv, 0, nk_logical - 1)
        if fc_ref is not None:
            start_t = jnp.maximum(fc_ref[ib], 0) // block_kv
        else:
            start_t = jnp.maximum(length - n_tok - window_left,
                                  0) // block_kv
        is_sink_step = ik < band_ns
        gt = jnp.where(is_sink_step, ik,
                       jnp.minimum(start_t + (ik - band_ns), last_t))
        step_ok = jnp.where(is_sink_step,
                            ik < start_t,                       # not in band
                            start_t + (ik - band_ns) <= last_t)  # unclamped
    else:
        gt = isp * nk + ik   # global kv tile index
        step_ok = jnp.bool_(True)
    # ``length`` counts every visible slot INCLUDING the n_tok newest tokens
    # (already appended to the cache). Query row r = (head-member, token it)
    # with it = r % n_tok sits at position length - n_tok + it and sees cols
    # <= its own position — per-row causal masking over the shared cache
    # stream (n_tok = 1 is classic decode: the single query sees length-1).
    # Sliding window: only columns >= q_pos - window_left are visible. A
    # sequence-sharded cache passes explicit per-row bounds instead
    # (fc_ref, UNCLIPPED local first column of the run's token 0 — token it's
    # bound is fc + it since query positions step by one): this rank's slots
    # cover an arbitrary slice of the window. ``scol_ref`` (also sharded):
    # local columns < scol stay visible regardless (this rank's slice of the
    # StreamingLLM sink prefix). ``first_col`` is the scalar DMA/compute
    # gate (min over query rows); exact per-row masking happens below.
    if fc_ref is not None:
        first_col = fc_ref[ib]
    elif window_left >= 0:
        first_col = jnp.maximum(length - n_tok - window_left, 0)
    else:
        first_col = jnp.int32(0)
    sink_local = scol_ref[ib] if scol_ref is not None else None

    @pl.when(ik == 0)
    def _init():
        if not fast:
            m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # the gate also kills the ragged tail when nk * splits over-covers s_max,
    # and tiles wholly left of the window (sink tiles stay live: StreamingLLM
    # attention sinks keep global positions < sink_tokens visible)
    live = (gt + 1) * block_kv > first_col
    if sink_tokens > 0:
        live = live | (gt * block_kv < sink_tokens)
    if sink_local is not None:
        live = live | (gt * block_kv < sink_local)

    @pl.when((gt * block_kv < length) & live & step_ok)
    def _compute():
        if int8_mxu:
            # SageAttention-style s8 MXU QK: the query was row-quantized to
            # int8 on entry (scales in qs_ref), K streams int8 straight into
            # the matmul — no (bkv, d) VPU dequant cast, and the v5e MXU
            # runs s8 x s8 -> s32 at 2x the bf16 rate. softmax_scale (and
            # log2e in fast mode) is pre-folded into the row scales by the
            # driver, so no in-kernel scale multiply. Head-batched matmul:
            # (h_kv, G, d) x (h_kv, bkv, d) -> (h_kv, G, bkv).
            q = q_ref[0]                             # (h_kv, G, d) int8
            k = kv_tile(k_ref)                       # (h_kv, bkv, d) int8/s4
            if k.dtype != jnp.int8:
                k = k.astype(jnp.int8)  # hardware-assisted s4 unpack
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * qs_ref[0]        # (h_kv, G, 1) row scales
        else:
            q = q_ref[0]                             # (h_kv, G, d)
            k = kv_tile(k_ref).astype(jnp.bfloat16)  # dequant cast
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (h_kv, G, bkv)
            if not fast:
                s = s * scale  # fast mode pre-folds scale*log2e into q
        if ks_ref is not None:
            s = s * sc_tile(ks_ref)  # (h_kv, 1, bkv) broadcasts over G rows
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        cols = gt * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=2)
        # per-row query position (n_tok == 1: every row at length - 1);
        # head-independent: broadcasts over the leading h_kv dim
        rowit = jax.lax.broadcasted_iota(
            jnp.int32, (1, s.shape[1], 1), 1) % n_tok
        qpos = length - n_tok + rowit                     # (1, G, 1)
        if sl_ref is not None:
            # ALiBi: -slope * (q_pos - kv_pos); slopes are per head
            sl = sl_ref[...]  # (h_kv, G, 1)
            s = s - sl * (qpos - cols).astype(jnp.float32)
        invisible = cols > qpos
        if fc_ref is not None:
            # per-row window start: token it's bound is first_col + it
            win_drop = cols < first_col + rowit
            if sink_local is not None:
                win_drop &= cols >= sink_local  # this rank's sink slice
            invisible |= win_drop
        elif window_left >= 0:
            win_drop = cols < qpos - window_left
            if sink_tokens > 0:
                win_drop &= cols >= sink_tokens  # sinks stay visible
            invisible |= win_drop
        s = jnp.where(invisible, NEG_INF, s)

        if fast:
            # max-free softmax (the r4 training-kernel finding, ops/flash.py
            # _CLAMP note): no per-tile max -> subtract -> alpha-rescale
            # dependency chain. The driver pre-folds scale*log2e into q /
            # the q row scales; exp2(NEG_INF) == 0 covers masked entries,
            # and fp32 absorbs the unnormalized p (<= 2^90 per element).
            alpha = None
            p = jnp.exp2(jnp.minimum(s, _CLAMP))
            l_scr[...] = l_scr[...] + jnp.broadcast_to(
                jnp.sum(p, axis=2, keepdims=True), l_scr.shape)
        else:
            m_prev = m_scr[:, :, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
            p = jnp.exp(s - m_new)
            p = jnp.where(invisible, 0.0, p)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[...] = l_scr[...] * alpha + jnp.broadcast_to(
                jnp.sum(p, axis=2, keepdims=True), l_scr.shape)
        if vs_ref is not None:
            p = p * sc_tile(vs_ref)
        if int8_mxu:
            # int8 PV (SageAttention2-style): fold V's per-token scale into
            # P (done above), then per-row dynamic-quantize P to int8 and
            # hit the s8 MXU — the (bkv, d) V dequant cast disappears for a
            # (h_kv, G, bkv) VPU quantize. An all-masked tile has rowmax 0
            # -> p/ps = 0/eps = 0 (no-op). (fast mode: p is unnormalized,
            # up to 2^90 — the per-tile row scale ps keeps the int8
            # quantization relative, and the fp32 accumulator absorbs the
            # magnitude.)
            rowmax = jnp.max(p, axis=2, keepdims=True)        # (h_kv, G, 1)
            ps = jnp.maximum(rowmax, 1e-20) * (1.0 / 127.0)
            p_i8 = jnp.round(p / ps).astype(jnp.int8)
            v = kv_tile(v_ref)                                # int8/s4
            if v.dtype != jnp.int8:
                v = v.astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_i8, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * ps
            acc_scr[...] = (acc_scr[...] + pv if fast
                            else acc_scr[...] * alpha + pv)
        else:
            v = kv_tile(v_ref).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc_scr[...] = (acc_scr[...] + pv if fast
                            else acc_scr[...] * alpha + pv)
        if not fast:
            m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ik == nk - 1)
    def _emit():
        # a split whose whole range is masked/past-length emits lse=-inf and
        # out=0 — a no-op under ops/merge.py:merge_partials
        l = l_scr[:, :, :1]                                   # (h_kv, G, 1)
        dead = l == 0.0
        safe_l = jnp.where(dead, 1.0, l)
        out_ref[...] = jnp.where(
            dead, 0.0, acc_scr[...] / safe_l
        ).astype(out_ref.dtype).reshape(out_ref.shape)
        m = jnp.zeros_like(l) if fast else m_scr[:, :, :1]
        # (h_kv, G, 1) -> block (.., h_kv, 1, G): same element order, so a
        # plain reshape relayouts correctly
        lse_ref[...] = jnp.where(
            dead, -jnp.inf, m + jnp.log(safe_l)
        ).reshape(lse_ref.shape)


# scoped-VMEM working set of a decode call: double-buffered (h_kv, bkv, d)
# k+v tiles, the fp32 (h_kv, G, bkv) score tile (x2: s and p in flight),
# and the fp32 out staging — calibrated against observed v5e compiles
# (hard limit 16 MiB)
_VMEM_BUDGET = 12 * 2 ** 20


def _vmem_est(h_kv: int, G: int, d: int, bkv: int, itemsize: int) -> int:
    return (4 * h_kv * bkv * d * itemsize   # k+v, double-buffered
            + 8 * h_kv * G * bkv            # score + p tiles fp32
            + 8 * h_kv * G * d              # acc scratch + out block
            + 8 * h_kv * G * 128)           # l (+ m when online) scratches


def _fit_run_tokens(h_kv: int, g: int, d: int, bkv: int,
                    itemsize: int) -> int:
    """Largest multi-token run length whose h_kv-batched working set fits
    scoped VMEM at kv block ``bkv`` (from _vmem_est solved for G)."""
    kv = 4 * h_kv * bkv * d * itemsize
    per_g = 8 * h_kv * (bkv + d + 128)
    return max(1, (_VMEM_BUDGET - kv) // per_g // g)


def decode_attention(
    q: jnp.ndarray,          # (b, h, d) current-token queries — or
                             # (b, n, h, d) for a multi-token run (verify)
    k_cache: jnp.ndarray,    # (b, h_kv, s_max, d) bf16 / int8 / int4 / fp8
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,    # (b,) int32 filled prefix per row
    k_scale: Optional[jnp.ndarray] = None,  # (b, h_kv, s_max) fp32
    v_scale: Optional[jnp.ndarray] = None,
    *,
    softmax_scale: Optional[float] = None,
    block_kv: int = 4096,
    interpret: Optional[bool] = None,
    return_lse: bool = False,
    layer: Optional[jnp.ndarray] = None,
    kv_splits: Optional[int] = None,
    window_size: tuple = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    sink_tokens: int = 0,
    first_cols: Optional[jnp.ndarray] = None,
    sink_cols: Optional[jnp.ndarray] = None,
    sink_band: int = 0,
    page_table: Optional[jnp.ndarray] = None,
    mxu_int8: bool = True,
    safe_softmax: bool = False,
):
    """Single-step decode attention over a (quantized) cache.

    ``page_table``: optional (b, n_pages) int32 — PAGED cache mode. The
    cache arrays become a shared physical POOL of pages, (P, h_kv,
    page_size, d) (stacked (L, P, ...) with ``layer``), and row b's
    logical kv block i lives in pool page ``page_table[b, i]`` (entries
    past the filled prefix may be -1/garbage — they are never fetched:
    the index map clamps to the last live page). ONLY the index maps
    change — masking math stays in logical token positions, so windows/
    softcap/multi-token verify all compose. A pool page is one h_kv-
    batched kv tile (or several, when page x h_kv x d would blow scoped
    VMEM — the page then spans ``spp`` grid steps); pages must be
    multiples of 128 tokens and SHOULD be >= 2048: small tiles starve
    the stream pipeline (measured r5, h_kv-batched tiles: 369 GB/s at
    1024-token tiles vs 666+ at 2048+, b=8 @32K int8), which is why a
    vLLM-style 16-64-token page is the wrong design on TPU — coarse
    pages + a shared pool recover most of paging's concurrency win at
    a small bandwidth cost.

    ``window_size``: (left, right) sliding window as in `ops/flash.py` —
    only ``left`` applies at decode (the query IS the newest token, nothing
    sits to its right); tiles wholly left of the window are neither fetched
    (index-map clamp) nor computed. ``softcap``: s -> cap*tanh(s/cap),
    applied before masking, matching the training kernel. ``alibi_slopes``:
    (h,) per-head slopes, bias -slope * (q_pos - kv_pos) with the query at
    position length-1 — API parity with the training kernels so ALiBi
    models serve. ``first_cols``: explicit per-row first visible column,
    overriding the window derivation — a sequence-sharded cache computes
    each rank's slice of the global window (serving/sharded.py). It is
    UNCLIPPED (may be negative / past the shard) and names the bound of the
    run's FIRST token; token i of a multi-token run is bounded by
    ``first_cols + i`` (query positions step by one). ``sink_cols``
    (requires ``first_cols``): per-row exclusive end of this rank's slice
    of the StreamingLLM sink prefix — local columns < sink_cols stay
    visible through the window. ``sink_band``: static upper bound on
    sink_cols (the global sink_tokens), used only to size the banded
    grid's sink tiles on the first_cols path — with ``window_size`` set,
    the sharded windowed decode grid is banded exactly like the
    single-chip one (cost ∝ window, not per-rank cache length).

    Returns out (b, h, d) bf16 (+ lse (b, h) fp32 when return_lse for the
    sequence-sharded merge).

    ``layer``: optional traced int32 layer index. When given, the cache
    arrays carry the full stacked (n_layers, b, h_kv, s_max, d) buffers and
    this call reads layer ``layer`` via its index maps — no host-side slice
    of the stacked cache (which would copy a whole layer per step in the
    serving decode loop).

    ``block_kv`` is the per-step token count; ALL h_kv heads ride one grid
    cell (r5), so the actual tile is (h_kv, block_kv, d) and the driver
    shrinks block_kv until the double-buffered working set fits scoped
    VMEM (int8 at h_kv=8, d=128: 2048 tokens = 2 MiB tiles; bf16: 1024).
    Bigger tiles amortize the ~1.2 us/step scalar dispatch — 1024-token
    h_kv-batched tiles measure 369 GB/s vs 666+ at 2048+ (b=8 @32K int8).
    Caches smaller than the block down-fit automatically.

    ``kv_splits``: flash-decoding split-KV. The kv range becomes an extra
    grid axis of independent streams whose fp32 partials merge via
    `ops/merge.py:merge_partials`. On a single sequential TPU core this
    does NOT add parallelism — it shortens each pipeline run and pays an
    extra per-stream ramp, measuring strictly slower at every serving shape
    tried on v5e (e.g. b=4 @64K: 191 -> 179 GB/s) — so the default is 1.
    It exists for multi-core parts and as the merge-correctness reference
    for the sharded decode (identical partial-merge math). Split merges are
    not bit-identical to the sequential online softmax.

    **Multi-token runs** (speculative-decoding verify): q (b, n, h, d) at
    per-row positions ``lengths - n + [0, n)`` — ``lengths`` counts every
    visible slot INCLUDING the n new tokens, whose KVs must already sit in
    the cache (`cache_append` writes the whole run at once). Query token i
    sees cache slots [0, lengths - n + i] — per-row causal masking in the
    SAME kernel stream, so an n-token verify costs one cache read, and its
    math per row is identical to n sequential `decode_attention` calls.
    Returns out (b, n, h, d) (+ lse (b, h, n)). The n rows ride the query
    tile (g*n rows per (b, h_kv) grid cell); sliding windows apply per-row.
    """
    multi = q.ndim == 4
    if multi:
        b, n_tok, h, d = q.shape
    else:
        b, h, d = q.shape
        n_tok = 1
    layered = layer is not None
    if layered:
        _, _, h_kv, s_max, _ = k_cache.shape
    else:
        _, h_kv, s_max, _ = k_cache.shape
    g = h // h_kv
    assert g * h_kv == h
    G = g * n_tok  # query rows per (b, h_kv) grid cell, ordered (member, tok)
    quantized = k_scale is not None
    # int8 caches run QK and PV on the s8 MXU (see _decode_kernel): Q is
    # row-quantized here, P per-row in-kernel — the per-tile VPU dequant
    # casts disappear. Accuracy cost is ~0.4% relative on scores/outputs,
    # well inside the int8 cache's own quantization noise; set
    # ``mxu_int8=False`` to keep the dequant-cast path. fp8 caches always
    # use the cast path (no fp8 MXU on v5e).
    int8_mxu = (bool(mxu_int8) and quantized
                and k_cache.dtype in (jnp.int8, jnp.int4))
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    # max-free clamped-exp2 softmax (the r4 training-kernel form) is the
    # default; ``safe_softmax=True`` restores the online running-max chain
    # (bit-exact vs the pre-r4 kernels, and the anchor for the exact
    # teacher-forcing serving gates). softcap needs raw scores -> online.
    fast = float(softcap) == 0.0 and not safe_softmax
    paged = page_table is not None
    itemsize = jnp.dtype(k_cache.dtype).itemsize
    if multi and n_tok > 1:
        # Run-splitting (r5): token i of a run sees cache[0 : L - n + i]
        # purely positionally, so slicing a too-long teacher-forced run
        # into sub-calls is EXACT. Long runs are MXU-bound (G query rows
        # amortize every KV byte), so small kv tiles are fine there — the
        # threshold uses a 256-token tile so bkv-shrinking absorbs most of
        # the pressure and splitting only kicks in when G = g * n_tok
        # genuinely blows scoped VMEM (admission prefill chunks at large
        # head counts, very long speculative verifies). Each sub-call then
        # picks its own bkv via the normal VMEM autosizing.
        fit = _fit_run_tokens(h_kv, g, d, min(256, s_max), itemsize)
        if fit < n_tok:
            outs, lses = [], []
            for i in range(0, n_tok, fit):
                e = min(i + fit, n_tok)
                res = decode_attention(
                    q[:, i:e], k_cache, v_cache,
                    jnp.asarray(lengths, jnp.int32) - (n_tok - e),
                    k_scale, v_scale, softmax_scale=softmax_scale,
                    block_kv=block_kv, interpret=interpret,
                    return_lse=True, layer=layer, kv_splits=kv_splits,
                    window_size=window_size, softcap=softcap,
                    alibi_slopes=alibi_slopes, sink_tokens=sink_tokens,
                    first_cols=(None if first_cols is None
                                else jnp.asarray(first_cols, jnp.int32) + i),
                    sink_cols=sink_cols, sink_band=sink_band,
                    page_table=page_table, mxu_int8=mxu_int8,
                    safe_softmax=safe_softmax)
                outs.append(res[0])
                lses.append(res[1])
            out = jnp.concatenate(outs, axis=1)
            lse = jnp.concatenate(lses, axis=2)
            return (out, lse) if return_lse else out
    if paged:
        # one POOL PAGE per h_kv-batched tile run: when the page (x h_kv
        # heads) would blow scoped VMEM, a page spans several grid steps
        # (spp tiles per page) — only the in-page tile index changes, the
        # physical-page lookup stays per logical page.
        page = s_max
        n_pool = k_cache.shape[1 if layered else 0]
        assert page % 128 == 0, f"page_size {page} must be a multiple of 128"
        assert kv_splits in (None, 1), "paged + kv_splits unsupported"
        # shrink through the page's 128-multiple DIVISORS (plain halving
        # of e.g. a 3200-token page lands on 1600 — divisible into the
        # page but not 128-aligned, an illegal Mosaic scale tile)
        bkv = page
        while bkv > 128 and _vmem_est(h_kv, G, d, bkv, itemsize) > _VMEM_BUDGET:
            nxt = next((c for c in range(bkv - 128, 127, -128)
                        if page % c == 0), 128)
            bkv = nxt
        assert page % bkv == 0 and bkv % 128 == 0, (page, bkv)
        spp = page // bkv                 # grid steps per pool page
        nk = page_table.shape[1] * spp
        s_max = page_table.shape[1] * page  # logical capacity
    else:
        spp = 0
        bkv = min(block_kv, s_max)
        # the working set per grid step is the double-buffered h_kv-batched
        # (h_kv, bkv, d) k+v tiles plus the fp32 (h_kv, G, bkv) score tile
        # — shrink the kv block until it fits scoped VMEM (long multi-token
        # runs trade kv-block size for query rows the same way)
        while bkv > 128 and _vmem_est(h_kv, G, d, bkv, itemsize) > _VMEM_BUDGET:
            bkv //= 2
        while s_max % bkv:
            bkv //= 2
        assert bkv % 128 == 0 or bkv == s_max, (
            f"cache s_max ({s_max}) down-fits the kv block to {bkv}, which "
            f"violates Mosaic's 128-lane tiling — size caches to multiples "
            f"of 128 (ideally of {block_kv})")
        nk = s_max // bkv
    if kv_splits is None:
        kv_splits = 1  # measured: splits only add per-stream ramp on v5e
    splits = max(1, min(int(kv_splits), nk))
    nk_s = -(-nk // splits)  # tiles per split (ragged tail gated off)
    interp = default_interpret() if interpret is None else bool(interpret)

    if not interp:
        # fail loudly (with the knob to turn) instead of a Mosaic scoped-
        # VMEM stack OOM (dense runs land here only when the fp32 out
        # staging alone is too big for any bkv)
        est = _vmem_est(h_kv, G, d, bkv, itemsize)
        if est > _VMEM_BUDGET:
            raise ValueError(
                f"decode run too large for VMEM: n_tok={n_tok} "
                f"(G={G} query rows x kv block {bkv} x {h_kv} kv heads) "
                f"needs ~{est >> 20} MiB on-chip; lower the run length "
                f"(prefill_chunk / speculative window)")

    if multi:
        # (b, n, h, d) -> (b, h_kv, g, n, d) -> (b, h_kv, g*n, d):
        # row r = member r // n, token r % n (what the kernel's rowit reads)
        qg = jnp.transpose(q.reshape(b, n_tok, h_kv, g, d),
                           (0, 2, 3, 1, 4)).reshape(b, h_kv, G, d)
    else:
        qg = q.reshape(b, h_kv, G, d)
    q_rowscale = None
    if int8_mxu:
        # per-query-row dynamic int8: scale = rowmax/127, fused into the
        # caller's jit (negligible next to the cache stream). softmax_scale
        # (and log2e for the max-free form) folds into the row scales, so
        # the kernel's score path is one fp32 multiply.
        q_abs = jnp.max(jnp.abs(qg.astype(jnp.float32)), axis=-1,
                        keepdims=True)
        q_rowscale = jnp.maximum(q_abs, 1e-6) * (1.0 / 127.0)
        qg = jnp.round(qg.astype(jnp.float32) / q_rowscale
                       ).astype(jnp.int8)
        q_rowscale = q_rowscale * (scale * _LOG2E if fast else scale)
    elif fast:
        # fold scale*log2e into q once (bf16 q: one extra rounding — the
        # same trade the training kernels make, ops/flash.py)
        qg = (qg.astype(jnp.float32) * (scale * _LOG2E)).astype(qg.dtype)

    w_left = int(window_size[0])
    # StreamingLLM sinks: only meaningful with a left window; the sharded
    # per-row first_cols path carries its sink slice as sink_cols instead
    sink = int(sink_tokens) if w_left >= 0 else 0
    if sink > 0 and first_cols is not None:
        raise ValueError(
            "with explicit first_cols pass the rank-local sink slice as "
            "sink_cols, not the global sink_tokens")
    has_fc = first_cols is not None
    has_sc = sink_cols is not None
    if has_sc and not has_fc:
        raise ValueError("sink_cols requires first_cols (the sharded path)")

    # Banded grid for windowed decode (StreamingLLM / Mistral serving): the
    # grid iterates only sink tiles + the window band instead of the whole
    # cache — without it a 1M-token cache pays ~250 dead (skipped-compute)
    # grid steps per call, ~6x the live work (measured; the clamped index
    # maps elide the DMA but not the steps).
    # (paged mode bands too: the banded gt is the LOGICAL kv block, which
    # the index maps then route through the page table as usual. The
    # sequence-sharded first_cols path ALSO bands — ADVICE r4 — from each
    # rank's own per-row window slice; ``sink_band`` is the STATIC bound on
    # sink_cols that sizes its sink tiles.)
    banded = w_left >= 0 and splits == 1
    band_ns = 0
    if sink > 0:
        band_ns = -(-sink // bkv)
    elif has_fc and int(sink_band) > 0:
        band_ns = -(-int(sink_band) // bkv)
    if banded:
        nk_band = band_ns + (w_left + n_tok) // bkv + 2
        if nk_band < nk:
            nk_s = nk_band
        else:
            banded = False
    if banded and has_sc and band_ns == 0:
        # without the static bound the grid would cover ONLY the window
        # band — the per-row sink slice would silently contribute nothing
        raise ValueError(
            "banded windowed decode with sink_cols needs sink_band (the "
            "static global sink_tokens bound) to size the grid's sink "
            "tiles; without it the sink attention would be silently "
            "dropped")

    def _clamped_gt(ibb, isp, ik, lens, rest):
        # clamp the global kv tile index into the live range: tiles past the
        # length — or left of the visible window — re-map to the nearest
        # live tile (Mosaic elides the repeated DMA). lengths may exceed
        # s_max (a sharded cache passes UNCLIPPED local lengths so per-row
        # causal limits stay correct on interior ranks) — hence the nk cap.
        last = jnp.clip((lens[ibb] - 1) // bkv, 0, nk - 1)
        if banded:
            # sink tiles map to themselves; band steps offset from the
            # window's start tile (mirrors the kernel's banded gt). Sharded
            # (first_cols): the rank's own per-row window slice.
            if has_fc:
                start = jnp.maximum(rest[0][ibb], 0) // bkv
            else:
                start = jnp.maximum(lens[ibb] - n_tok - w_left, 0) // bkv
            gt = jnp.where(ik < band_ns, ik,
                           jnp.minimum(start + (ik - band_ns), last))
            return jnp.clip(gt, 0, nk - 1)
        gt = jnp.minimum(isp * nk_s + ik, last)
        if has_fc:
            # explicit first column (unclipped: may be negative)
            lo = jnp.maximum(rest[0][ibb], 0) // bkv
            gt2 = jnp.maximum(gt, jnp.minimum(lo, last))
            if has_sc:
                # this rank's sink tiles keep their identity (DMA must run)
                gt = jnp.where(gt * bkv < rest[1][ibb], gt, gt2)
            else:
                gt = gt2
        elif w_left >= 0:
            # the earliest visible column over the run's rows (token 0)
            lo = jnp.maximum(lens[ibb] - n_tok - w_left, 0) // bkv
            gt2 = jnp.maximum(gt, jnp.minimum(lo, last))
            if sink > 0:
                # sink tiles keep their identity (their DMA must happen)
                gt = jnp.where(gt * bkv < sink, gt, gt2)
            else:
                gt = gt2
        return gt

    def _phys(ibb, gt, rest):
        # paged: logical kv block gt (bkv units) -> physical pool page of
        # the page owning it (clamped so a -1/garbage entry past the filled
        # prefix still fetches in-bounds; compute for those tiles is gated
        # off by the length check). gt % spp picks the tile WITHIN the page
        # when a page spans several grid steps.
        return jnp.clip(rest[-1][ibb, gt // spp], 0, n_pool - 1)

    if layered and paged:
        def kv_im(ibb, isp, ik, lens, li, *rest):
            gt = _clamped_gt(ibb, isp, ik, lens, rest[:-1])
            return (li[0], _phys(ibb, gt, rest), 0, gt % spp, 0)

        def sc_im(ibb, isp, ik, lens, li, *rest):
            gt = _clamped_gt(ibb, isp, ik, lens, rest[:-1])
            return (li[0], _phys(ibb, gt, rest), 0, 0, gt % spp)

        kv_block = (1, 1, h_kv, bkv, d)
        sc_block = (1, 1, h_kv, 1, bkv)
    elif layered:
        def kv_im(ibb, isp, ik, lens, li, *rest):
            return (li[0], ibb, 0,
                    _clamped_gt(ibb, isp, ik, lens, rest), 0)

        def sc_im(ibb, isp, ik, lens, li, *rest):
            return (li[0], ibb, 0, 0,
                    _clamped_gt(ibb, isp, ik, lens, rest))

        kv_block = (1, 1, h_kv, bkv, d)
        sc_block = (1, 1, h_kv, 1, bkv)
    elif paged:
        def kv_im(ibb, isp, ik, lens, *rest):
            gt = _clamped_gt(ibb, isp, ik, lens, rest[:-1])
            return (_phys(ibb, gt, rest), 0, gt % spp, 0)

        def sc_im(ibb, isp, ik, lens, *rest):
            gt = _clamped_gt(ibb, isp, ik, lens, rest[:-1])
            return (_phys(ibb, gt, rest), 0, 0, gt % spp)

        kv_block = (1, h_kv, bkv, d)
        sc_block = (1, h_kv, 1, bkv)
    else:
        def kv_im(ibb, isp, ik, lens, *rest):
            return (ibb, 0, _clamped_gt(ibb, isp, ik, lens, rest), 0)

        def sc_im(ibb, isp, ik, lens, *rest):
            return (ibb, 0, 0, _clamped_gt(ibb, isp, ik, lens, rest))

        kv_block = (1, h_kv, bkv, d)
        sc_block = (1, h_kv, 1, bkv)

    def qi(ibb, isp, ik, *_):
        return (ibb, 0, 0, 0)

    def oi(ibb, isp, ik, *_):
        return (ibb, isp, 0, 0, 0)

    in_specs = [pl.BlockSpec((1, h_kv, G, d), qi)]
    inputs = [qg]
    if int8_mxu:
        # (b, h_kv, G, 1) fp32 row scales; block == array dims on the last
        # two axes satisfies Mosaic's tiling rule for the unit lane dim
        in_specs.append(pl.BlockSpec((1, h_kv, G, 1), qi))
        inputs.append(q_rowscale)
    in_specs += [
        pl.BlockSpec(kv_block, kv_im),
        pl.BlockSpec(kv_block, kv_im),
    ]
    inputs += [k_cache, v_cache]
    if quantized:
        # scales ride with a unit dim before the slot dim so the (1, bkv)
        # tile satisfies Mosaic's last-two-dims constraint (unit dim ==
        # array dim); paged pools keep their own page-sized slot dim
        lead = k_cache.shape[1] if layered else k_cache.shape[0]  # b or pool
        slot = page if paged else s_max
        sc_shape = ((k_scale.shape[0], lead, h_kv, 1, slot) if layered
                    else (lead, h_kv, 1, slot))
        in_specs += [pl.BlockSpec(sc_block, sc_im),
                     pl.BlockSpec(sc_block, sc_im)]
        inputs += [k_scale.reshape(sc_shape), v_scale.reshape(sc_shape)]
    if alibi_slopes is not None:
        # (h,) -> (h_kv, g*n, 1): per-head slopes, each repeated across the
        # run's n_tok rows (row order (member, tok)); the whole table rides
        # every grid cell (block == array)
        sl = jnp.asarray(alibi_slopes, jnp.float32).reshape(h_kv, g, 1, 1)
        sl = jnp.broadcast_to(sl, (h_kv, g, n_tok, 1)).reshape(h_kv, G, 1)
        if fast:
            sl = sl * _LOG2E  # the bias adds to exp2-unit scores
        in_specs += [pl.BlockSpec((h_kv, G, 1),
                                  lambda ibb, isp, ik, *_: (0, 0, 0))]
        inputs += [sl]

    prefetch = [jnp.asarray(lengths, jnp.int32)]
    if layered:
        prefetch.append(jnp.asarray(layer, jnp.int32).reshape(1))
    if has_fc:
        prefetch.append(jnp.asarray(first_cols, jnp.int32))
    if has_sc:
        prefetch.append(jnp.asarray(sink_cols, jnp.int32))
    if paged:
        prefetch.append(jnp.asarray(page_table, jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(b, splits, nk_s),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, h_kv, G, d), oi),
            pl.BlockSpec((1, 1, h_kv, 1, G), oi),
        ],
        scratch_shapes=(
            # m (the online running max) exists only on the safe/softcap
            # path — fast (max-free) mode drops it from the list entirely
            # (the conditional-scratch pattern of ops/flash.py _tri_body)
            ([] if fast else [pltpu.VMEM((h_kv, G, 128), jnp.float32)])
            + [pltpu.VMEM((h_kv, G, 128), jnp.float32),
               pltpu.VMEM((h_kv, G, d), jnp.float32)]
        ),
    )
    out, lse = pl.pallas_call(
        functools.partial(_decode_kernel, scale=float(scale), block_kv=bkv,
                          quantized=quantized, g=g, layered=layered,
                          window_left=w_left, softcap=float(softcap),
                          alibi=alibi_slopes is not None,
                          has_first_cols=has_fc, n_tok=n_tok, paged=paged,
                          int8_mxu=int8_mxu, sink_tokens=sink,
                          has_sink_cols=has_sc, banded=banded,
                          band_ns=band_ns, nk_logical=nk, fast=fast),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, splits, h_kv, G, d), jnp.float32),
            jax.ShapeDtypeStruct((b, splits, h_kv, 1, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(*prefetch, *inputs)
    if splits == 1:
        out = out[:, 0].astype(jnp.bfloat16)
        lse = lse[:, 0, :, 0]
    else:
        # (b, S, h_kv, ...) -> (S, b, h_kv, ...): one fp32 LSE-weighted merge
        out, lse = merge_partials(jnp.moveaxis(out, 1, 0),
                                  jnp.moveaxis(lse[:, :, :, 0], 1, 0))
        out = out.astype(jnp.bfloat16)
    if multi:
        # (b, h_kv, g*n, d) -> (b, n, h, d); lse -> (b, h, n)
        out = jnp.transpose(out.reshape(b, h_kv, g, n_tok, d),
                            (0, 3, 1, 2, 4)).reshape(b, n_tok, h, d)
        lse = lse.reshape(b, h, n_tok)
        return (out, lse) if return_lse else out
    out = out.reshape(b, h, d)
    lse = lse.reshape(b, h)
    return (out, lse) if return_lse else out
