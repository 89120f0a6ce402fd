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
    layered: bool = False,
):
    refs = list(refs)
    if layered:
        del refs[0]  # the layer-index prefetch ref (consumed by index maps)
    if quantized:
        q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_ref, k_ref, v_ref, out_ref, lse_ref, m_scr, l_scr, acc_scr = refs
        ks_ref = vs_ref = None

    def kv_tile(ref):
        return ref[0, 0, 0, :, :] if layered else ref[0, 0, :, :]

    def sc_tile(ref):
        return ref[0, 0, 0, :, :] if layered else ref[0, 0, :, :]

    ib = pl.program_id(0)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    length = len_ref[ib]

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(ik * block_kv < length)
    def _compute():
        q = q_ref[0, 0, :, :]  # (g, d)
        k = kv_tile(k_ref).astype(jnp.bfloat16)  # (bkv, d), dequant cast
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (g, bkv)
        if ks_ref is not None:
            s = s * sc_tile(ks_ref)  # (1, bkv) broadcasts over g rows
        cols = ik * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(cols >= length, NEG_INF, s)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(cols >= length, 0.0, p)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[...] = l_scr[...] * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_scr.shape)
        if vs_ref is not None:
            p = p * sc_tile(vs_ref)
        v = kv_tile(v_ref).astype(jnp.bfloat16)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

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
):
    """Single-step decode attention over a (quantized) cache.

    Returns out (b, h, d) bf16 (+ lse (b, h) fp32 when return_lse for the
    sequence-sharded merge).

    ``layer``: optional traced int32 layer index. When given, the cache
    arrays carry the full stacked (n_layers, b, h_kv, s_max, d) buffers and
    this call reads layer ``layer`` via its index maps — no host-side slice
    of the stacked cache (which would copy a whole layer per step in the
    serving decode loop).
    """
    b, h, d = q.shape
    layered = layer is not None
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

    def _clamped_ik(ibb, ik, lens):
        # clamp the kv tile index into the filled prefix: tiles past the
        # length re-map to the last live tile (Mosaic elides their DMA)
        last = jnp.maximum((lens[ibb] - 1) // bkv, 0)
        return jnp.minimum(ik, last)

    if layered:
        def kv_im(ibb, ihk, ik, lens, li):
            return (li[0], ibb, ihk, _clamped_ik(ibb, ik, lens), 0)

        def sc_im(ibb, ihk, ik, lens, li):
            return (li[0], ibb, ihk, 0, _clamped_ik(ibb, ik, lens))

        kv_block = (1, 1, 1, bkv, d)
        sc_block = (1, 1, 1, 1, bkv)
    else:
        def kv_im(ibb, ihk, ik, lens):
            return (ibb, ihk, _clamped_ik(ibb, ik, lens), 0)

        def sc_im(ibb, ihk, ik, lens):
            return (ibb, ihk, 0, _clamped_ik(ibb, ik, lens))

        kv_block = (1, 1, bkv, d)
        sc_block = (1, 1, 1, bkv)

    in_specs = [
        pl.BlockSpec((1, 1, g, d), lambda ibb, ihk, ik, *_: (ibb, ihk, 0, 0)),
        pl.BlockSpec(kv_block, kv_im),
        pl.BlockSpec(kv_block, kv_im),
    ]
    inputs = [qg, k_cache, v_cache]
    if quantized:
        # scales ride with a unit dim before s_max so the (1, bkv) tile
        # satisfies Mosaic's last-two-dims constraint (unit dim == array dim)
        sc_shape = ((k_scale.shape[0], b, h_kv, 1, s_max) if layered
                    else (b, h_kv, 1, s_max))
        in_specs += [pl.BlockSpec(sc_block, sc_im),
                     pl.BlockSpec(sc_block, sc_im)]
        inputs += [k_scale.reshape(sc_shape), v_scale.reshape(sc_shape)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if layered else 1,
        grid=(b, h_kv, nk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, g, d), lambda ibb, ihk, ik, *_: (ibb, ihk, 0, 0)),
            pl.BlockSpec((1, 1, 1, g), lambda ibb, ihk, ik, *_: (ibb, ihk, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, d), jnp.float32),
        ],
    )
    prefetch = [jnp.asarray(lengths, jnp.int32)]
    if layered:
        prefetch.append(jnp.asarray(layer, jnp.int32).reshape(1))
    out, lse = pl.pallas_call(
        functools.partial(_decode_kernel, scale=float(scale), block_kv=bkv,
                          quantized=quantized, g=g, layered=layered),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h_kv, g, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, h_kv, 1, g), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(*prefetch, *inputs)
    out = out.reshape(b, h, d)
    lse = lse.reshape(b, h)
    return (out, lse) if return_lse else out
