"""USP: the 2-D hybrid of Ulysses and Ring sequence parallelism.

TPU-native flagship, replacing `yunchang/hybrid/attn_layer.py` (the product,
SURVEY.md #27-29). Composition is the reference's
``a2a(ulysses) ∘ ring(ring) ∘ a2a⁻¹(ulysses)``
(`hybrid/attn_layer.py:57-161`) expressed as pure functions:

* :func:`usp_attention_local` — the device-local body, for users already
  inside their own ``shard_map`` (how Megatron embeds the reference via
  `patches/Megatron-DeepSpeed.patch`).
* :class:`LongContextAttention` — binds a mesh and jits a ``shard_map`` over
  it; takes globally-sharded ``jax.Array``s (b, s, h, d). Also provides the
  packed-QKV entry (`hybrid/attn_layer.py:164-259`) and the Ulysses-only
  layer (`ulysses/attn_layer.py:15-126`).

The sequence must be in *layout order* (parallel/layouts.py
``permute_for_layout``) — the analog of the reference tests' rank-side
``EXTRACT_FUNC_DICT`` sharding (`test/test_hybrid_attn.py:201-223`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from long_context_attention_tpu.parallel.mesh import MeshAxes
from long_context_attention_tpu.parallel.ring import ring_attention_local
from long_context_attention_tpu.parallel.ulysses import gather_heads, scatter_heads
from long_context_attention_tpu.utils.config import BlockSizes

__all__ = ["usp_attention_local", "async_usp_attention_local",
           "ulysses_sparse_attention_local",
           "usp_ring_sparse_attention_local",
           "LongContextAttention", "UlyssesAttention",
           "AsyncLongContextAttention"]


def usp_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    ulysses_axis: str,
    ring_axis: str,
    layout: str = "zigzag",
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    impl: str = "pallas",
    segment_ids: Optional[jnp.ndarray] = None,
    kv_quant: Optional[str] = None,
    bidirectional: bool = False,
    dropout_p: float = 0.0,
    dropout_key=None,
    alibi_slopes=None,
    sink_tokens: int = 0,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    safe_softmax: bool = False,
) -> jnp.ndarray:
    """USP attention on device-local shards (b, s/(U*R), h, d) → same shape.

    Head-scatter/seq-gather a2a over the ulysses axis, ring attention over the
    ring axis, inverse a2a — `LongContextAttention.forward`
    (`hybrid/attn_layer.py:57-161`). Requires h (and h_kv for GQA) divisible
    by the ulysses degree, like the reference (`README.md:18-21`).
    ``segment_ids`` (b, s/(U*R)) int32 enables varlen/packed batches.

    ``alibi_slopes`` are the GLOBAL (h,) per-head slopes; each ulysses rank
    slices its contiguous head block after the a2a. ``dropout_key`` is a
    (replicated) JAX PRNG key; the dropout seed carries the rank's global
    head base so every global head draws independent bits.
    """
    q = scatter_heads(q, ulysses_axis)
    k = scatter_heads(k, ulysses_axis)
    v = scatter_heads(v, ulysses_axis)
    if segment_ids is not None and lax.axis_size(ulysses_axis) > 1:
        # ids have no head dim to scatter: gather the ring-local sequence.
        segment_ids = lax.all_gather(
            segment_ids, ulysses_axis, axis=1, tiled=True)
    h_local = q.shape[2]
    sl_local = None
    if alibi_slopes is not None:
        sl = jnp.asarray(alibi_slopes, jnp.float32)
        # all_to_all(split_axis=head) hands rank r the r-th contiguous block
        rank = lax.axis_index(ulysses_axis)
        sl_local = lax.dynamic_slice(sl, (rank * h_local,), (h_local,))
    seed = None
    if dropout_p > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_p > 0 requires dropout_key")
        bits = jax.random.bits(dropout_key, (1,), jnp.uint32).astype(jnp.int32)
        head_base = (lax.axis_index(ulysses_axis) * h_local).astype(jnp.int32)
        seed = jnp.concatenate([bits, head_base[None]])
    out = ring_attention_local(
        q, k, v,
        axis_name=ring_axis, layout=layout, causal=causal,
        softmax_scale=softmax_scale, window_size=window_size, softcap=softcap,
        impl=impl, segment_ids=segment_ids, kv_quant=kv_quant,
        bidirectional=bidirectional,
        dropout_p=dropout_p, dropout_seed=seed, alibi_slopes=sl_local,
        sink_tokens=sink_tokens,
        block_sizes=block_sizes, interpret=interpret,
        safe_softmax=safe_softmax,
    )
    return gather_heads(out, ulysses_axis)


def ulysses_sparse_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_mask,
    *,
    ulysses_axis: str,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Block-sparse attention under SP-Ulysses: after the head-scatter /
    seq-gather a2a every rank holds the FULL sequence for h/U heads, so the
    static live-tile mask (ops/sparse.py) applies unchanged — the sparse
    analog of `UlyssesAttention.forward` (`ulysses/attn_layer.py:50-120`).

    Per-head (3-D) masks compose with ulysses > 1 through rank-indexed
    tables: the a2a hands rank r the r-th contiguous global head block, so
    each rank's per-head tile tables are built at trace time and selected
    in-kernel by ``lax.axis_index`` (``head_shard`` in
    ops/sparse.block_sparse_attention) — the analog of the reference's
    per-rank SpargeAttn tuning state (`test/test_hybrid_attn.py:269-277`).
    """
    from long_context_attention_tpu.ops.sparse import block_sparse_attention

    import numpy as _np
    uly = lax.axis_size(ulysses_axis)
    q = scatter_heads(q, ulysses_axis)
    k = scatter_heads(k, ulysses_axis)
    v = scatter_heads(v, ulysses_axis)
    head_shard = None
    if _np.asarray(block_mask).ndim == 3 and uly > 1:
        head_shard = (lax.axis_index(ulysses_axis), uly)
    out = block_sparse_attention(
        q, k, v, block_mask, causal=causal, softmax_scale=softmax_scale,
        block_q=block_q, block_kv=block_kv, interpret=interpret,
        head_shard=head_shard)
    return gather_heads(out, ulysses_axis)


def usp_ring_sparse_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_mask,
    *,
    ulysses_axis: str,
    ring_axis: str,
    layout: str = "zigzag",
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Block-sparse USP: head-scatter a2a over ulysses, then the ring-sparse
    schedule (parallel/ring_sparse.py) over the ring axis — the full
    ``a2a ∘ ring ∘ a2a⁻¹`` composition with a static global tile mask, the
    reference's SPARSE_SAGE-through-USP dispatch (`ring/ring_flash_attn.py:36`,
    `kernels/__init__.py:244-268`). 2-D shared or per-head 3-D global
    masks (r5: combined (ulysses x ring)-rank-indexed tables); layouts
    basic/zigzag. Differentiable (sparse ring backward)."""
    import numpy as _np

    from long_context_attention_tpu.parallel.ring_sparse import (
        ring_sparse_attention_local)

    uly = lax.axis_size(ulysses_axis)
    q = scatter_heads(q, ulysses_axis)
    k = scatter_heads(k, ulysses_axis)
    v = scatter_heads(v, ulysses_axis)
    head_shard = None
    if _np.asarray(block_mask).ndim == 3 and uly > 1:
        head_shard = (lax.axis_index(ulysses_axis), uly)
    out = ring_sparse_attention_local(
        q, k, v, block_mask, axis_name=ring_axis, layout=layout,
        causal=causal, softmax_scale=softmax_scale,
        block_q=block_q, block_kv=block_kv, interpret=interpret,
        head_shard=head_shard)
    return gather_heads(out, ulysses_axis)


def async_usp_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    ulysses_axis: str,
    ring_axis: str,
    n_groups: Optional[int] = None,
    layout: str = "zigzag",
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    impl: str = "pallas",
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Head-group-pipelined USP — `AsyncLongContextAttention.forward`
    (`yunchang/hybrid/async_attn_layer.py:44-197`).

    The reference splits heads into ``un = hc/ud`` groups and runs each
    group's all-to-all on a side CUDA stream overlapped with the previous
    group's ring attention. Here the groups are an unrolled loop of
    independent a2a∘ring∘a2a chains; XLA's async collective scheduling
    overlaps group i+1's a2a with group i's kernels — no manual streams.
    Differentiable (the reference's backward raises,
    `async_attn_layer.py:199-202`).
    """
    uly = lax.axis_size(ulysses_axis)
    h, h_kv = q.shape[2], k.shape[2]
    if n_groups is None:
        n_groups = max(h_kv // uly, 1)
    assert h % n_groups == 0 and h_kv % n_groups == 0, (
        f"heads ({h}, kv {h_kv}) must divide into {n_groups} groups")
    gh, gkv = h // n_groups, h_kv // n_groups
    outs = []
    for i in range(n_groups):
        outs.append(usp_attention_local(
            q[:, :, i * gh:(i + 1) * gh],
            k[:, :, i * gkv:(i + 1) * gkv],
            v[:, :, i * gkv:(i + 1) * gkv],
            ulysses_axis=ulysses_axis, ring_axis=ring_axis, layout=layout,
            causal=causal, softmax_scale=softmax_scale,
            window_size=window_size, softcap=softcap, impl=impl,
            block_sizes=block_sizes, interpret=interpret,
        ))
    return jnp.concatenate(outs, axis=2)


@dataclasses.dataclass(frozen=True)
class _LayerBase:
    """Shared mesh-bound machinery for the public attention layers."""

    mesh: Mesh
    axes: MeshAxes = MeshAxes()
    layout: str = "zigzag"
    impl: str = "pallas"
    kv_quant: Optional[str] = None
    bidirectional: bool = False
    block_sizes: Optional[BlockSizes] = None
    interpret: Optional[bool] = None

    def _spec(self):
        return P(self.axes.dp, self.axes.seq, None, None)

    def _shard_map(self, fn, n_in):
        # check_vma=False: pallas_call does not declare varying-mesh-axis info,
        # the standard setting for custom kernels under shard_map.
        return jax.jit(jax.shard_map(
            fn, mesh=self.mesh,
            in_specs=(self._spec(),) * n_in,
            out_specs=self._spec(),
            check_vma=False,
        ))

    def _extras(self, segment_ids, alibi_slopes, dropout_p, dropout_key):
        """Optional operands as extra shard_map inputs with their specs —
        shared by ``__call__`` and ``packed`` so the two entries cannot
        drift."""
        extras, specs, names = [], [], []
        if segment_ids is not None:
            extras.append(segment_ids)
            specs.append(P(self.axes.dp, self.axes.seq))
            names.append("segment_ids")
        if alibi_slopes is not None:
            extras.append(jnp.asarray(alibi_slopes, jnp.float32))
            specs.append(P())  # replicated: global per-head slopes
            names.append("alibi_slopes")
        if dropout_p > 0.0:
            if dropout_key is None:
                raise ValueError("dropout_p > 0 requires dropout_key")
            extras.append(dropout_key)
            specs.append(P())  # replicated key; rank-seeded locally
            names.append("dropout_key")
        return extras, specs, names


@dataclasses.dataclass(frozen=True)
class LongContextAttention(_LayerBase):
    """The USP layer over globally-sharded arrays (`hybrid/attn_layer.py:14`).

    ``__call__(q, k, v)`` with q (b, s, h, d), k/v (b, s, h_kv, d) sharded (or
    shardable) as batch→dp, sequence→(ring, ulysses); sequence already in
    layout order. Returns out (b, s, h, d) with the same sharding.

    ``packed(qkv)`` takes (b, s, 3, h, d) — the QKVPacked variant
    (`hybrid/attn_layer.py:164-259`); one logical a2a for all three (XLA fuses
    the three collectives; and unlike the reference, this path works —
    cf. the ``.continous()`` crash at `hybrid/attn_layer.py:88`).

    On the reference's ``deterministic`` flag (`hybrid/attn_layer.py:68`):
    there is deliberately no analog. XLA/TPU kernels are run-to-run
    deterministic by construction (no atomics in the backward; the ring
    accumulates partials in a fixed order), so every call here already gives
    the guarantee that flag buys on CUDA — including dropout, which derives
    its mask from an explicit counter-based PRNG key.
    """

    def __call__(self, q, k, v, *, causal: bool = False,
                 softmax_scale: Optional[float] = None,
                 window_size: Tuple[int, int] = (-1, -1),
                 softcap: float = 0.0,
                 segment_ids: Optional[jnp.ndarray] = None,
                 dropout_p: float = 0.0,
                 dropout_key=None,
                 alibi_slopes=None,
                 sink_tokens: int = 0,
                 block_mask=None,
                 sparse_block_q: int = 512,
                 sparse_block_kv: int = 512) -> jnp.ndarray:
        """``dropout_p``/``dropout_key`` and ``alibi_slopes`` ((h,) global
        slopes) match the reference layer's training knobs
        (`hybrid/attn_layer.py:62-67`); both are replicated operands — the
        local shards slice/seed by rank inside ``usp_attention_local``.
        ``sink_tokens``: StreamingLLM sinks through the left window.
        ``block_mask``: a static (S/sparse_block_q, S/sparse_block_kv) GLOBAL
        tile mask routes the call through the block-sparse USP composition
        (a2a ∘ ring-sparse ∘ a2a⁻¹; basic/zigzag layouts, differentiable)."""
        if block_mask is not None:
            if (window_size != (-1, -1) or softcap != 0.0
                    or segment_ids is not None or dropout_p > 0.0
                    or alibi_slopes is not None or sink_tokens > 0):
                raise NotImplementedError(
                    "block_mask composes with causal/softmax_scale only — "
                    "encode windows/sinks in the mask itself")
            fn = functools.partial(
                usp_ring_sparse_attention_local, block_mask=block_mask,
                ulysses_axis=self.axes.ulysses, ring_axis=self.axes.ring,
                layout=self.layout, causal=causal,
                softmax_scale=softmax_scale, block_q=sparse_block_q,
                block_kv=sparse_block_kv, interpret=self.interpret,
            )
            return self._shard_map(fn, 3)(q, k, v)
        fn = functools.partial(
            usp_attention_local,
            ulysses_axis=self.axes.ulysses, ring_axis=self.axes.ring,
            layout=self.layout, causal=causal, softmax_scale=softmax_scale,
            window_size=window_size, softcap=softcap, impl=self.impl,
            kv_quant=self.kv_quant, bidirectional=self.bidirectional,
            dropout_p=dropout_p, sink_tokens=sink_tokens,
            block_sizes=self.block_sizes, interpret=self.interpret,
        )
        extras, specs, names = self._extras(segment_ids, alibi_slopes,
                                            dropout_p, dropout_key)
        if not extras:
            return self._shard_map(fn, 3)(q, k, v)
        mapped = jax.shard_map(
            lambda q, k, v, *ex: fn(q, k, v, **dict(zip(names, ex))),
            mesh=self.mesh,
            in_specs=(self._spec(),) * 3 + tuple(specs),
            out_specs=self._spec(), check_vma=False,
        )
        return jax.jit(mapped)(q, k, v, *extras)

    def packed(self, qkv, *, causal: bool = False,
               softmax_scale: Optional[float] = None,
               window_size: Tuple[int, int] = (-1, -1),
               softcap: float = 0.0,
               segment_ids: Optional[jnp.ndarray] = None,
               dropout_p: float = 0.0,
               dropout_key=None,
               alibi_slopes=None,
               sink_tokens: int = 0) -> jnp.ndarray:
        """Full kwargs parity with ``__call__`` — the reference threads the
        complete training-knob set through its packed layer too
        (`hybrid/attn_layer.py:164-259`); kv_quant/bidirectional/impl come
        from the layer's constructor like the unpacked path."""
        fn = functools.partial(
            usp_attention_local,
            ulysses_axis=self.axes.ulysses, ring_axis=self.axes.ring,
            layout=self.layout, causal=causal, softmax_scale=softmax_scale,
            window_size=window_size, softcap=softcap, impl=self.impl,
            kv_quant=self.kv_quant, bidirectional=self.bidirectional,
            dropout_p=dropout_p, sink_tokens=sink_tokens,
            block_sizes=self.block_sizes, interpret=self.interpret,
        )
        extras, specs, names = self._extras(segment_ids, alibi_slopes,
                                            dropout_p, dropout_key)

        def run(qkv_local, *ex):
            q, k, v = qkv_local[:, :, 0], qkv_local[:, :, 1], qkv_local[:, :, 2]
            return fn(q, k, v, **dict(zip(names, ex)))

        spec5 = P(self.axes.dp, self.axes.seq, None, None, None)
        return jax.jit(jax.shard_map(
            run, mesh=self.mesh, in_specs=(spec5,) + tuple(specs),
            out_specs=self._spec(), check_vma=False,
        ))(qkv, *extras)


@dataclasses.dataclass(frozen=True)
class AsyncLongContextAttention(_LayerBase):
    """Mesh-bound head-group-pipelined USP layer
    (`hybrid/async_attn_layer.py:13`). ``n_groups=None`` → one kv head per
    ulysses shard per group, the reference's ``un = hc/ud`` default."""

    n_groups: Optional[int] = None

    def __call__(self, q, k, v, *, causal: bool = False,
                 softmax_scale: Optional[float] = None,
                 window_size: Tuple[int, int] = (-1, -1),
                 softcap: float = 0.0) -> jnp.ndarray:
        fn = functools.partial(
            async_usp_attention_local,
            ulysses_axis=self.axes.ulysses, ring_axis=self.axes.ring,
            n_groups=self.n_groups, layout=self.layout, causal=causal,
            softmax_scale=softmax_scale, window_size=window_size,
            softcap=softcap, impl=self.impl,
            block_sizes=self.block_sizes, interpret=self.interpret,
        )
        return self._shard_map(fn, 3)(q, k, v)


@dataclasses.dataclass(frozen=True)
class UlyssesAttention(_LayerBase):
    """Standalone SP-Ulysses layer (`ulysses/attn_layer.py:15-126`):
    ring degree 1, sequence sharded over the ulysses axis only."""

    def __call__(self, q, k, v, *, causal: bool = False,
                 softmax_scale: Optional[float] = None,
                 window_size: Tuple[int, int] = (-1, -1),
                 softcap: float = 0.0, block_mask=None,
                 sparse_block_q: int = 512,
                 sparse_block_kv: int = 512) -> jnp.ndarray:
        if block_mask is not None:
            # block-sparse local attention (ops/sparse.py) after the a2a;
            # 2-D shared or 3-D per-head (rank-indexed tables) masks — see
            # ulysses_sparse_attention_local
            if window_size != (-1, -1) or softcap != 0.0:
                raise NotImplementedError(
                    "block_mask does not combine with window/softcap — "
                    "encode the window in the mask itself")
            fn = functools.partial(
                ulysses_sparse_attention_local, block_mask=block_mask,
                ulysses_axis=self.axes.ulysses, causal=causal,
                softmax_scale=softmax_scale, block_q=sparse_block_q,
                block_kv=sparse_block_kv, interpret=self.interpret,
            )
            return self._shard_map(fn, 3)(q, k, v)
        fn = functools.partial(
            usp_attention_local,
            ulysses_axis=self.axes.ulysses, ring_axis=self.axes.ring,
            layout="basic", causal=causal, softmax_scale=softmax_scale,
            window_size=window_size, softcap=softcap, impl=self.impl,
            block_sizes=self.block_sizes, interpret=self.interpret,
        )
        return self._shard_map(fn, 3)(q, k, v)
