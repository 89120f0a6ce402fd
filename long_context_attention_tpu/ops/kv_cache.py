"""Quantized KV-cache storage: INT8 / FP8 per-token-per-head scaling.

Beyond the reference (its Sage INT8/FP8 support is an *external* backend,
`kernels/__init__.py:171-268`; it has no KV cache at all — serving belongs to
the north star, BASELINE.json). Design:

* Values quantized per (batch, kv-head, token) with an absmax scale, stored as
  int8, int4 (native XLA s4 — two values per HBM byte) or float8_e4m3fn plus
  an fp32 scale array — decode attention is HBM-bandwidth-bound, so
  halving/quartering cache bytes multiplies decode speed. int4 is the
  aggressive serving option (KIVI-class): per-token absmax over 15 levels
  costs visibly more accuracy than int8 — gate on your task's tolerance.
* Dequantization happens inside the decode kernel's VMEM tiles
  (ops/decode.py): HBM only ever sees quantized bytes.
* Storage layout is **BHSD** — (n_layers, b, h_kv, s_max, d) — the layout the
  decode kernel streams, so no per-step transpose of the cache ever happens.
  The one-time transpose is paid at prefill write.
* ``KVCache`` is a pytree usable as a jit carry (donate-friendly); sequence-
  sharded over the ring axis by the serving layer (serving/engine.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["KVCache", "PagedKVCache", "quantize_kv", "dequantize_kv",
           "CACHE_DTYPES"]

CACHE_DTYPES = ("bfloat16", "int8", "int4", "float8_e4m3fn")


def _qparams(dtype: str):
    if dtype == "int8":
        return jnp.int8, 127.0
    if dtype == "int4":
        # native XLA s4: HBM stores two values per byte (the decode stream
        # QUARTERS vs bf16), kernels get hardware-assisted s4->s8 converts
        return jnp.int4, 7.0
    if dtype == "float8_e4m3fn":
        return jnp.float8_e4m3fn, 448.0
    raise ValueError(f"not a quantized cache dtype: {dtype}")


def quantize_kv(x: jnp.ndarray, dtype: str) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(..., d) float -> (values in `dtype`, absmax scales (...,) fp32).

    bfloat16 passes through with scales=None.
    """
    if dtype == "bfloat16":
        return x.astype(jnp.bfloat16), None
    qdt, qmax = _qparams(dtype)
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, 1e-6) / qmax
    q = x.astype(jnp.float32) / scale[..., None]
    if dtype in ("int8", "int4"):
        q = jnp.round(q)
    q = jnp.clip(q, -qmax, qmax).astype(qdt)
    return q, scale


def dequantize_kv(q: jnp.ndarray, scale: Optional[jnp.ndarray],
                  dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inverse of quantize_kv (reference path; the decode kernel fuses this).

    Accepts scales either flat ``(..., s)`` (fresh from quantize_kv) or in
    the cache's kernel-native ``(..., 1, s)`` layout (KVCache docstring).
    """
    if scale is None:
        return q.astype(dtype)
    if scale.ndim == q.ndim:  # kernel-native (..., 1, s) unit-dim layout
        scale = scale[..., 0, :]
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Per-layer KV cache in BHSD: values (n_layers, b, h_kv, s_max, d),
    scales (n_layers, b, h_kv, 1, s_max) fp32 for quantized dtypes;
    ``length`` (b,) int32 is the filled prefix per batch row.

    The scale arrays carry the decode kernels' native unit-dim layout:
    their (1, s_max) minor dims tile as T(1,128), which is what the
    kernels' (1, lanes) scale blocks demand. Storing the flat (.., h_kv,
    s_max) shape instead forces XLA to physically re-tile T(8,128) ->
    T(1,128) on EVERY kernel call whose operand is a loop carry (~75 MB
    copied per array per call at b=8 @36K — and the copies break the
    append kernel's in-place aliasing, quadrupling the damage)."""

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]
    v_scale: Optional[jnp.ndarray]
    length: jnp.ndarray

    @staticmethod
    def init(n_layers: int, b: int, s_max: int, h_kv: int, d: int,
             dtype: str = "bfloat16") -> "KVCache":
        if dtype not in CACHE_DTYPES:
            raise ValueError(f"cache dtype {dtype!r} not in {CACHE_DTYPES}")
        vdt = jnp.bfloat16 if dtype == "bfloat16" else _qparams(dtype)[0]
        shape = (n_layers, b, h_kv, s_max, d)
        scales = (None if dtype == "bfloat16"
                  else jnp.zeros((n_layers, b, h_kv, 1, s_max), jnp.float32))
        return KVCache(
            k=jnp.zeros(shape, vdt),
            v=jnp.zeros(shape, vdt),
            k_scale=scales,
            v_scale=None if scales is None else jnp.zeros_like(scales),
            length=jnp.zeros((b,), jnp.int32),
        )

    @property
    def dtype(self) -> str:
        return ("bfloat16" if self.k_scale is None
                else jnp.dtype(self.k.dtype).name)

    @property
    def s_max(self) -> int:
        return self.k.shape[3]

    @staticmethod
    def scale_5d(sc, n_layers_leading: bool = True):
        """Insert the kernels' unit dim into a freshly-quantized (.., h_kv,
        s) scale array -> (.., h_kv, 1, s)."""
        return None if sc is None else sc[..., None, :]

    def write_prompt(self, layer: int, k: jnp.ndarray, v: jnp.ndarray,
                     start: int = 0) -> "KVCache":
        """Write a (b, s, h_kv, d) prefill segment at positions
        [start, start+s) (the one-time BSHD->BHSD transpose)."""
        s = k.shape[1]
        dt = self.dtype
        kq, ks = quantize_kv(jnp.transpose(k, (0, 2, 1, 3)), dt)  # (b,h,s,d)
        vq, vs = quantize_kv(jnp.transpose(v, (0, 2, 1, 3)), dt)

        def upd(buf, val):
            return buf.at[layer, :, :, start:start + s].set(val)

        def upd_sc(buf, val):  # buf (L, b, h, 1, s_max); val (b, h, s)
            return buf.at[layer, :, :, 0, start:start + s].set(val)

        return dataclasses.replace(
            self,
            k=upd(self.k, kq), v=upd(self.v, vq),
            k_scale=None if ks is None else upd_sc(self.k_scale, ks),
            v_scale=None if vs is None else upd_sc(self.v_scale, vs),
        )

    def append_token(self, layer: int, k: jnp.ndarray, v: jnp.ndarray
                     ) -> "KVCache":
        """Append one token's (b, 1, h_kv, d) KV at per-row position
        ``length``. ``length`` only advances via :meth:`advance` — call once
        per step after all layers appended."""
        dt = self.dtype
        kq, ks = quantize_kv(jnp.transpose(k, (0, 2, 1, 3)), dt)  # (b,h,1,d)
        vq, vs = quantize_kv(jnp.transpose(v, (0, 2, 1, 3)), dt)

        def upd_vals(buf, val):  # buf[layer] (b,h,s,d); val (b,h,1,d)
            def row(bb, vb, t):
                return jax.lax.dynamic_update_slice(bb, vb, (0, t, 0))
            return buf.at[layer].set(jax.vmap(row)(buf[layer], val, self.length))

        def upd_scales(buf, val):  # buf[layer] (b,h,1,s); val (b,h,1)
            def row(bb, vb, t):  # bb (h,1,s); vb (h,1)
                return jax.lax.dynamic_update_slice(bb, vb[:, :, None],
                                                    (0, 0, t))
            return buf.at[layer].set(jax.vmap(row)(buf[layer], val, self.length))

        return dataclasses.replace(
            self,
            k=upd_vals(self.k, kq), v=upd_vals(self.v, vq),
            k_scale=None if ks is None else upd_scales(self.k_scale, ks),
            v_scale=None if vs is None else upd_scales(self.v_scale, vs),
        )

    def advance(self, n: int = 1) -> "KVCache":
        return dataclasses.replace(self, length=self.length + n)

    def layer_view(self, layer: int):
        """(k, v, k_scale, v_scale) BHSD views for one layer."""
        sl = lambda a: None if a is None else a[layer]
        return self.k[layer], self.v[layer], sl(self.k_scale), sl(self.v_scale)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Paged KV cache: one shared physical POOL of pages + per-row page
    tables — the TPU-native answer to vLLM's PagedAttention, sized for TPU
    DMA economics (coarse pages; see `ops/decode.py:decode_attention`).

    Values ``(n_layers, pool_pages, h_kv, page_size, d)``; scales
    ``(n_layers, pool_pages, h_kv, 1, page_size)`` fp32 (unit-dim layout,
    as KVCache); ``page_table`` (b, n_pages) int32 maps row b's logical kv
    block i to a pool page (-1 = unallocated — never dereferenced live);
    ``length`` (b,) int32 logical filled prefix.

    HBM scales with the POOL, not ``b x s_max``: rows reserve only the
    pages their prompt + budget needs, so heterogeneous-length batches fit
    ~pool/mean-length rows instead of ~pool/s_max.

    **Pool page 0 is reserved scratch** — allocators must never hand it
    out: inactive rows (append_pos <= -n) and empty rows clamp their
    out-of-range positions to logical page 0, whose -1 table entry clamps
    to pool page 0; reserving it makes those gated no-op accesses land on
    a page no live row owns (the append kernel's pipelined
    refetch-writeback of an aliased tile is only value-safe when no OTHER
    row writes that tile in the same call).
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]
    v_scale: Optional[jnp.ndarray]
    page_table: jnp.ndarray
    length: jnp.ndarray

    @staticmethod
    def init(n_layers: int, b: int, pool_pages: int, page_size: int,
             n_pages: int, h_kv: int, d: int,
             dtype: str = "bfloat16") -> "PagedKVCache":
        if dtype not in CACHE_DTYPES:
            raise ValueError(f"cache dtype {dtype!r} not in {CACHE_DTYPES}")
        assert page_size % 128 == 0, page_size
        assert pool_pages >= 2, "pool needs the scratch page + 1"
        vdt = jnp.bfloat16 if dtype == "bfloat16" else _qparams(dtype)[0]
        shape = (n_layers, pool_pages, h_kv, page_size, d)
        scales = (None if dtype == "bfloat16" else jnp.zeros(
            (n_layers, pool_pages, h_kv, 1, page_size), jnp.float32))
        return PagedKVCache(
            k=jnp.zeros(shape, vdt),
            v=jnp.zeros(shape, vdt),
            k_scale=scales,
            v_scale=None if scales is None else jnp.zeros_like(scales),
            page_table=jnp.full((b, n_pages), -1, jnp.int32),
            length=jnp.zeros((b,), jnp.int32),
        )

    @property
    def dtype(self) -> str:
        return ("bfloat16" if self.k_scale is None
                else jnp.dtype(self.k.dtype).name)

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def s_max(self) -> int:  # logical per-row capacity
        return self.page_table.shape[1] * self.page_size
