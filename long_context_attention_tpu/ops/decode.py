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
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from long_context_attention_tpu.utils.config import NEG_INF, default_interpret

__all__ = ["decode_attention"]


def _decode_kernel(
    len_ref,  # scalar prefetch: (b,) int32 filled length per batch row
    *refs,
    scale: float, block_kv: int, quantized: bool, g: int,
    layered: bool = False, append: bool = False,
):
    refs = list(refs)
    if layered:
        del refs[0]  # the layer-index prefetch ref (consumed by index maps)
    pos_ref = None
    if append:
        pos_ref = refs.pop(0)  # scalar prefetch: (b,) int32 insert slot, -1=skip
    if quantized:
        q_ref, k_ref, v_ref, ks_ref, vs_ref = refs[:5]
        refs = refs[5:]
    else:
        q_ref, k_ref, v_ref = refs[:3]
        refs = refs[3:]
        ks_ref = vs_ref = None
    kn_ref = vn_ref = ksn_ref = vsn_ref = None
    ko_ref = vo_ref = kso_ref = vso_ref = None
    if append:
        if quantized:
            kn_ref, vn_ref, ksn_ref, vsn_ref = refs[:4]
            refs = refs[4:]
        else:
            kn_ref, vn_ref = refs[:2]
            refs = refs[2:]
    out_ref, lse_ref = refs[:2]
    refs = refs[2:]
    if append:
        if quantized:
            ko_ref, vo_ref, kso_ref, vso_ref = refs[:4]
            refs = refs[4:]
        else:
            ko_ref, vo_ref = refs[:2]
            refs = refs[2:]
    m_scr, l_scr, acc_scr = refs

    def kv_tile(ref):
        return ref[0, 0, 0, :, :] if layered else ref[0, 0, :, :]

    def sc_tile(ref):
        return ref[0, 0, 0, :, :] if layered else ref[0, 0, :, :]

    ib = pl.program_id(0)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    length = len_ref[ib]
    if append:
        # with append, len_ref holds the PREFIX length and the new token
        # (when this row inserts: pos >= 0) extends the effective length by
        # one — spliced into the raw tile below so the arithmetic is
        # bit-identical to attention over a cache that already contains it
        pos = pos_ref[ib]
        live = pos >= 0
        eff_len = length + live.astype(jnp.int32)
    else:
        eff_len = length

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _spliced_tiles():
        """Raw-dtype (k, v [, ks, vs]) tiles with the new token's row
        spliced in at pos when it lands in this tile."""
        raw_k, raw_v = kv_tile(k_ref), kv_tile(v_ref)
        raw_ks = None if ks_ref is None else sc_tile(ks_ref)
        raw_vs = None if vs_ref is None else sc_tile(vs_ref)
        if not append:
            return raw_k, raw_v, raw_ks, raw_vs
        r = jnp.maximum(pos, 0)
        in_tile = live & (r // block_kv == ik)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_kv, 1), 0)
        sel = (rows == r % block_kv) & in_tile
        raw_k = jnp.where(sel, kn_ref[0, 0], raw_k)
        raw_v = jnp.where(sel, vn_ref[0, 0], raw_v)
        if raw_ks is not None:
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, block_kv), 1)
            csel = (cols == r % block_kv) & in_tile
            raw_ks = jnp.where(csel, ksn_ref[0, 0], raw_ks)
            raw_vs = jnp.where(csel, vsn_ref[0, 0], raw_vs)
        return raw_k, raw_v, raw_ks, raw_vs

    @pl.when(ik * block_kv < eff_len)
    def _compute():
        q = q_ref[0, 0, :, :]  # (g, d)
        raw_k, raw_v, raw_ks, raw_vs = _spliced_tiles()
        k = raw_k.astype(jnp.bfloat16)  # (bkv, d), dequant cast
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (g, bkv)
        if raw_ks is not None:
            s = s * raw_ks  # (1, bkv) broadcasts over g rows
        cols = ik * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(cols >= eff_len, NEG_INF, s)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(cols >= eff_len, 0.0, p)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[...] = l_scr[...] * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_scr.shape)
        if raw_vs is not None:
            p = p * raw_vs
        v = raw_v.astype(jnp.bfloat16)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    if append:
        @pl.when(ik == jnp.maximum(pos, 0) // block_kv)
        def _write_cache():
            # populate the aliased output tile: the input tile with the new
            # row spliced in at pos (or verbatim when this row skips).
            # Mosaic writes it back once per (b, h) stream; every other tile
            # of the aliased buffer is never visited and keeps its contents.
            new_k, new_v, new_ks, new_vs = _spliced_tiles()
            if layered:
                ko_ref[0, 0, 0, :, :] = new_k
                vo_ref[0, 0, 0, :, :] = new_v
            else:
                ko_ref[0, 0, :, :] = new_k
                vo_ref[0, 0, :, :] = new_v
            if kso_ref is not None:
                if layered:
                    kso_ref[0, 0, 0, :, :] = new_ks
                    vso_ref[0, 0, 0, :, :] = new_vs
                else:
                    kso_ref[0, 0, :, :] = new_ks
                    vso_ref[0, 0, :, :] = new_vs

    @pl.when(ik == nk - 1)
    def _emit():
        l = l_scr[:, :1]
        m = m_scr[:, :1]
        dead = l == 0.0
        safe_l = jnp.where(dead, 1.0, l)
        out_ref[...] = jnp.where(
            dead, 0.0, acc_scr[...] / safe_l
        ).astype(out_ref.dtype).reshape(out_ref.shape)
        lse_ref[...] = jnp.where(
            dead, -jnp.inf, m + jnp.log(safe_l)
        ).reshape(lse_ref.shape)


def decode_attention(
    q: jnp.ndarray,          # (b, h, d) current-token queries
    k_cache: jnp.ndarray,    # (b, h_kv, s_max, d) bf16 / int8 / fp8
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,    # (b,) int32 filled prefix per row
    k_scale: Optional[jnp.ndarray] = None,  # (b, h_kv, s_max) fp32
    v_scale: Optional[jnp.ndarray] = None,
    *,
    softmax_scale: Optional[float] = None,
    block_kv: int = 1024,
    interpret: Optional[bool] = None,
    return_lse: bool = False,
    layer: Optional[jnp.ndarray] = None,
    append_kv=None,          # (k_new, v_new) (b, h_kv, 1, d) cache dtype
    append_scales=None,      # (ks_new, vs_new) (b, h_kv, 1) fp32
    append_pos: Optional[jnp.ndarray] = None,  # (b,) slot index; -1 = skip
):
    """Single-step decode attention over a (quantized) cache.

    Returns out (b, h, d) bf16 (+ lse (b, h) fp32 when return_lse for the
    sequence-sharded merge).

    ``layer``: optional traced int32 layer index. When given, the cache
    arrays carry the full stacked (n_layers, b, h_kv, s_max, d) buffers and
    this call reads layer ``layer`` via its index maps — no host-side slice
    of the stacked cache (which would copy a whole layer per step in the
    serving decode loop).

    ``append_kv`` / ``append_pos``: fused in-place append. The new token's
    (already quantized) KV is spliced into the cache INSIDE the kernel via
    ``input_output_aliases`` — the updated caches come back as extra
    outputs that alias the inputs, so XLA updates the HBM buffers in place.
    This exists because the DUS-then-read structure (write the token with
    ``dynamic_update_slice``, then let the kernel read the cache) makes XLA
    double-buffer the whole cache inside the serving decode scan: 2 extra
    full-cache copies per step — 985 ms/token instead of ~50 at b=8/32K.
    With append, ``lengths`` is the PREFIX length (the new token excluded);
    the new token attends to itself from VMEM and rows with
    ``append_pos < 0`` skip both the self-attention term and the write
    (the non-owner ranks of a sequence-sharded cache). Returns
    ``(out[, lse], (k_cache', v_cache'[, k_scale', v_scale']))``.
    """
    b, h, d = q.shape
    layered = layer is not None
    append = append_kv is not None
    if layered:
        _, _, h_kv, s_max, _ = k_cache.shape
    else:
        _, h_kv, s_max, _ = k_cache.shape
    g = h // h_kv
    assert g * h_kv == h
    quantized = k_scale is not None
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    bkv = min(block_kv, s_max)
    while s_max % bkv:
        bkv //= 2
    assert bkv % 128 == 0 or bkv == s_max, (
        f"cache s_max ({s_max}) down-fits the kv block to {bkv}, which "
        f"violates Mosaic's 128-lane tiling — size caches to multiples of "
        f"128 (ideally of {block_kv})")
    nk = s_max // bkv
    interp = default_interpret() if interpret is None else bool(interpret)

    qg = q.reshape(b, h_kv, g, d)

    def _last_live(ibb, lens, *rest):
        # last tile the pipeline must actually fetch: the filled prefix,
        # plus (append mode) the tile the new token lands in — that tile is
        # read raw so the splice can write it back
        last = jnp.maximum((lens[ibb] - 1) // bkv, 0)
        if append:
            pos = rest[-1]  # append_pos prefetch ref (always last)
            last = jnp.maximum(last, jnp.maximum(pos[ibb], 0) // bkv)
        return last

    def _clamped_ik(ibb, ik, lens, *rest):
        # clamp the kv tile index into the live range: tiles past it re-map
        # to the last live tile (Mosaic elides their DMA)
        return jnp.minimum(ik, _last_live(ibb, lens, *rest))

    def _pos_tile(ibb, *rest):
        pos = rest[-1]
        return jnp.maximum(pos[ibb], 0) // bkv

    if layered:
        def kv_im(ibb, ihk, ik, lens, li, *rest):
            return (li[0], ibb, ihk, _clamped_ik(ibb, ik, lens, *rest), 0)

        def sc_im(ibb, ihk, ik, lens, li, *rest):
            return (li[0], ibb, ihk, 0, _clamped_ik(ibb, ik, lens, *rest))

        def kv_out_im(ibb, ihk, ik, lens, li, *rest):
            return (li[0], ibb, ihk, _pos_tile(ibb, *rest), 0)

        def sc_out_im(ibb, ihk, ik, lens, li, *rest):
            return (li[0], ibb, ihk, 0, _pos_tile(ibb, *rest))

        kv_block = (1, 1, 1, bkv, d)
        sc_block = (1, 1, 1, 1, bkv)
    else:
        def kv_im(ibb, ihk, ik, lens, *rest):
            return (ibb, ihk, _clamped_ik(ibb, ik, lens, *rest), 0)

        def sc_im(ibb, ihk, ik, lens, *rest):
            return (ibb, ihk, 0, _clamped_ik(ibb, ik, lens, *rest))

        def kv_out_im(ibb, ihk, ik, lens, *rest):
            return (ibb, ihk, _pos_tile(ibb, *rest), 0)

        def sc_out_im(ibb, ihk, ik, lens, *rest):
            return (ibb, ihk, 0, _pos_tile(ibb, *rest))

        kv_block = (1, 1, bkv, d)
        sc_block = (1, 1, 1, bkv)

    def fixed_im(ibb, ihk, ik, *_):
        return (ibb, ihk, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, g, d), fixed_im),
        pl.BlockSpec(kv_block, kv_im),
        pl.BlockSpec(kv_block, kv_im),
    ]
    inputs = [qg, k_cache, v_cache]
    sc_shape = None
    if quantized:
        # scales ride with a unit dim before s_max so the (1, bkv) tile
        # satisfies Mosaic's last-two-dims constraint (unit dim == array dim)
        sc_shape = ((k_scale.shape[0], b, h_kv, 1, s_max) if layered
                    else (b, h_kv, 1, s_max))
        in_specs += [pl.BlockSpec(sc_block, sc_im),
                     pl.BlockSpec(sc_block, sc_im)]
        inputs += [k_scale.reshape(sc_shape), v_scale.reshape(sc_shape)]

    out_specs = [
        pl.BlockSpec((1, 1, g, d), fixed_im),
        pl.BlockSpec((1, 1, 1, g), fixed_im),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, h_kv, g, d), jnp.bfloat16),
        jax.ShapeDtypeStruct((b, h_kv, 1, g), jnp.float32),
    ]
    io_aliases = {}
    if append:
        k_new, v_new = append_kv
        assert k_new.dtype == k_cache.dtype and v_new.dtype == v_cache.dtype
        in_specs += [pl.BlockSpec((1, 1, 1, d), fixed_im)] * 2
        inputs += [k_new, v_new]
        if quantized:
            ks_new, vs_new = append_scales
            in_specs += [pl.BlockSpec((1, 1, 1, 1), fixed_im)] * 2
            inputs += [ks_new.reshape(b, h_kv, 1, 1).astype(jnp.float32),
                       vs_new.reshape(b, h_kv, 1, 1).astype(jnp.float32)]
        out_specs += [pl.BlockSpec(kv_block, kv_out_im)] * 2
        out_shape += [jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype)] * 2
        if quantized:
            out_specs += [pl.BlockSpec(sc_block, sc_out_im)] * 2
            out_shape += [jax.ShapeDtypeStruct(sc_shape, jnp.float32)] * 2
        # alias cache inputs to the cache outputs (flat indices include the
        # scalar-prefetch operands, cf. megablox gmm)
        n_pref = 1 + int(layered) + 1  # lengths [, layer], append_pos
        # inputs order: qg, k, v [, ks, vs], k_new, v_new [, ksn, vsn]
        io_aliases[n_pref + 1] = 2          # k_cache -> out k'
        io_aliases[n_pref + 2] = 3          # v_cache -> out v'
        if quantized:
            io_aliases[n_pref + 3] = 4      # k_scale -> out ks'
            io_aliases[n_pref + 4] = 5      # v_scale -> out vs'

    n_prefetch = 1 + int(layered) + int(append)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(b, h_kv, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, d), jnp.float32),
        ],
    )
    prefetch = [jnp.asarray(lengths, jnp.int32)]
    if layered:
        prefetch.append(jnp.asarray(layer, jnp.int32).reshape(1))
    if append:
        prefetch.append(jnp.asarray(append_pos, jnp.int32))
    res = pl.pallas_call(
        functools.partial(_decode_kernel, scale=float(scale), block_kv=bkv,
                          quantized=quantized, g=g, layered=layered,
                          append=append),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=io_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(*prefetch, *inputs)
    out, lse = res[0], res[1]
    out = out.reshape(b, h, d)
    lse = lse.reshape(b, h)
    if append:
        caches = (res[2], res[3])
        if quantized:
            caches += (res[4].reshape(k_scale.shape),
                       res[5].reshape(v_scale.shape))
        return ((out, lse) + (caches,)) if return_lse else (out, caches)
    return (out, lse) if return_lse else out
