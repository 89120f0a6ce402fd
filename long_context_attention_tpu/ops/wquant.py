"""Int8 weight quantization for the serving decode path (w8a8 dynamic).

Decode is HBM-bound and at small batch the WEIGHTS are most of the stream
(a ~1B model reads 1.76 GB bf16 of weights per token at b=1 — ~55% of the
step). Storing the decode weights as int8 with per-output-channel scales
halves that stream; the matmuls run on the MXU's native s8xs8 path
(TPU v5e: 2x bf16 rate), with activations quantized dynamically per row
(absmax / 127), so no bf16 copy of the weights is ever materialized.

Role parity: the reference exposes INT8-quantized attention backends via
SageAttention (`/root/reference/yunchang/kernels/__init__.py:63-295`,
AttnType.SAGE_FP16/FP8); this module extends the same idea to the serving
matmuls, composing with the int8/fp8 KV cache (`ops/kv_cache.py`).

Accuracy: w8a8 with per-channel weight scales + per-token activation
scales is the standard production recipe; error is ~0.5% relative per
matmul. Training and prefill stay bf16 — `qdot` passes plain arrays
through untouched, so the same model code serves both.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["QTensor", "qdot", "quantize_weight", "quantize_decode_params"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QTensor:
    """An int8 weight with per-output-channel fp32 scales.

    ``q``: (..., in, out) int8; ``scale``: (..., out) fp32 such that the
    logical weight is ``q * scale[..., None, :]``. Leading axes (the
    stacked layer dim) ride along — `lax.scan` over a params pytree slices
    both leaves in step.
    """

    q: jnp.ndarray
    scale: jnp.ndarray


def quantize_weight(w: jnp.ndarray) -> QTensor:
    """(..., in, out) float -> QTensor, absmax per output channel."""
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)  # (..., out)
    s = jnp.maximum(a, 1e-8) / 127.0
    q = jnp.round(w.astype(jnp.float32) / s[..., None, :]).astype(jnp.int8)
    return QTensor(q=q, scale=s)


def qdot(x: jnp.ndarray, w) -> jnp.ndarray:
    """``x @ w`` where ``w`` is a plain array (no-op passthrough) or a
    QTensor (dynamic w8a8: per-row activation quant -> s8xs8 MXU matmul ->
    fp32 rescale). Returns x.dtype."""
    if not isinstance(w, QTensor):
        return x @ w
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    xa = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    xs = jnp.maximum(xa, 1e-6) / 127.0
    x8 = jnp.round(x2 / xs).astype(jnp.int8)
    y = jax.lax.dot_general(x8, w.q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs * w.scale
    return y.reshape(shape[:-1] + (w.q.shape[-1],)).astype(x.dtype)


_DECODE_WEIGHT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


@jax.jit
def quantize_decode_params(params):
    """Quantize the per-layer matmul weights (+ lm_head) of a llama-family
    params pytree to QTensors for decode. Embedding, norms, and MoE expert
    weights (router-sensitive) stay bf16. The returned pytree drops into
    `decode_step` / `decode_multi_step` unchanged — their matmuls go
    through `qdot`."""
    out = dict(params)
    layers = dict(params["layers"])
    for k in _DECODE_WEIGHT_KEYS:
        if k in layers:
            layers[k] = quantize_weight(layers[k])
    out["layers"] = layers
    if "lm_head" in out:
        out["lm_head"] = quantize_weight(out["lm_head"])
    return out
