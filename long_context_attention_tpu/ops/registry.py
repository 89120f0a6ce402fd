"""Attention implementation registry.

TPU-native replacement for the reference's kernel registry
(`yunchang/kernels/__init__.py:38-295`): the 15-member ``AttnType`` enum ×
stage {fwd-only, bwd-only, fwd-bwd} dispatch over ten external CUDA backends
collapses to a small table of self-contained impls sharing one contract:

* ``full(q, k, v, **kw) -> out`` — differentiable end-to-end attention (the
  "fwd-bwd" stage, `kernels/__init__.py:139-141`).
* ``fwd(q, k, v, **kw) -> (out, lse)`` — the ring loop's per-step forward
  ("fwd-only", returns the LSE that makes online merging possible).
* ``bwd(q, k, v, out, lse, dout, **kw) -> (dq, dk, dv)`` — per-block fp32
  partial gradients given the final merged out/lse ("bwd-only").

Common ``**kw``: causal, softmax_scale, window_size, softcap, and the global
position descriptor (q_offsets/kv_offsets/q_stride/kv_stride) from
parallel/layouts.py. Impls:

* ``pallas`` — the production Pallas kernels (ops/flash.py); compiled on TPU,
  interpreted on CPU.
* ``xla``    — pure-XLA einsum attention (ops/reference.py); the oracle and
  the runs-anywhere escape hatch (the ``AttnType.TORCH_EFFICIENT`` analog —
  unlike the reference's, its backward works, cf. `kernels/attention.py:159`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax.numpy as jnp

from long_context_attention_tpu.ops import flash as _flash
from long_context_attention_tpu.ops import reference as _ref
from long_context_attention_tpu.ops import sage as _sage

__all__ = ["AttnImpl", "get_attn_impl", "register_attn_impl", "ATTN_IMPLS"]


@dataclasses.dataclass(frozen=True)
class AttnImpl:
    name: str
    full: Callable  # (q, k, v, **kw) -> out, differentiable
    fwd: Callable   # (q, k, v, **kw) -> (out, lse)
    bwd: Callable   # (q, k, v, out, lse, dout, **kw) -> (dq, dk, dv) fp32


def _xla_kw(q_len, kv_len, kw):
    """Translate the kernel-form position descriptor to per-token positions."""
    # Deferred import: parallel.ring imports this module (no cycle at runtime).
    from long_context_attention_tpu.parallel.layouts import positions_from_descriptor

    out = dict(
        causal=kw.get("causal", False),
        softmax_scale=kw.get("softmax_scale"),
        window_size=kw.get("window_size", (-1, -1)),
        softcap=kw.get("softcap", 0.0),
        sink_tokens=kw.get("sink_tokens", 0),
    )
    q_off, kv_off = kw.get("q_offsets"), kw.get("kv_offsets")
    if q_off is not None:
        out["q_positions"] = positions_from_descriptor(
            jnp.asarray(q_off), kw.get("q_stride", 1), q_len)
    if kv_off is not None:
        out["kv_positions"] = positions_from_descriptor(
            jnp.asarray(kv_off), kw.get("kv_stride", 1), kv_len)
    for key in ("q_segment_ids", "kv_segment_ids"):
        if kw.get(key) is not None:
            out[key] = kw[key]
    return out


def _xla_full(q, k, v, **kw):
    out, _ = _ref.xla_attention(q, k, v, **_xla_kw(q.shape[1], k.shape[1], kw))
    return out


def _xla_fwd(q, k, v, **kw):
    return _ref.xla_attention(q, k, v, **_xla_kw(q.shape[1], k.shape[1], kw))


def _xla_bwd(q, k, v, out, lse, dout, **kw):
    return _ref.xla_attention_bwd(
        q, k, v, out, lse, dout, **_xla_kw(q.shape[1], k.shape[1], kw))


def _pallas_full(q, k, v, **kw):
    return _flash.flash_attention(q, k, v, **kw)


def _sage_bwd(q, k, v, out, lse, dout, **kw):
    # Straight-through backward: bf16 flash recomputation anchored on the
    # QUANTIZED forward's (out, lse) — sage is a forward-path quantization
    # (the reference's Sage AttnTypes are likewise inference kernels).
    #
    # On the anchor choice (vs parallel/ring.py:301-319, which dequantizes
    # its kv_quant residuals): the two paths quantize different operands.
    # The ring's kv_quant path KEEPS the quantized k/v as the backward's
    # attention inputs (dequant(quant(k))), because its (out, lse) came from
    # exactly those values — re-deriving p from the ORIGINAL k would break
    # the flash decomposition identity (sum_block p != softmax) by the full
    # transport-quantization error, which is avoidable there at zero cost.
    # Sage additionally quantizes q and P per tile with dynamic per-row
    # scales; reconstructing those inside the backward would require the
    # per-tile quantization state the kernel never materializes. The
    # straight-through recipe instead recomputes p from the bf16 inputs
    # against the quantized anchor: the decomposition mismatch is bounded by
    # the int8 forward error itself (measured: grads track the oracle within
    # ~2% relative, and the anchored-vs-bf16-anchored gap is smaller than
    # the quantization noise — tests/test_sage.py::
    # test_straight_through_anchor_bias) — the standard quantized-attention
    # training recipe, applied per ring step by _ring_vjp_bwd when
    # impl="sage".
    kw.pop("pv_int8", None)
    return _flash.flash_attention_bwd(q, k, v, out, lse, dout, **kw)


ATTN_IMPLS: Dict[str, AttnImpl] = {
    "pallas": AttnImpl("pallas", _pallas_full,
                       _flash.flash_attention_fwd, _flash.flash_attention_bwd),
    "xla": AttnImpl("xla", _xla_full, _xla_fwd, _xla_bwd),
    # INT8 quantized-MXU forward (the SageAttention registry role,
    # `kernels/__init__.py:171-242`): self-attention prefill/ulysses paths
    "sage": AttnImpl("sage", _sage.sage_attention_full,
                     _sage.sage_attention_fwd, _sage_bwd),
}


def register_attn_impl(impl: AttnImpl) -> None:
    ATTN_IMPLS[impl.name] = impl


def get_attn_impl(name: str) -> AttnImpl:
    try:
        return ATTN_IMPLS[name]
    except KeyError:
        raise ValueError(
            f"unknown attention impl {name!r}; available: {sorted(ATTN_IMPLS)}"
        ) from None
