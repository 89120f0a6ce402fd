"""Online log-sum-exp merge of attention blocks (the numerical core).

TPU-native re-derivation of the reference's ``update_out_and_lse``
(`yunchang/ring/utils.py:10-51`): combine two partial attention results whose
softmax was computed over disjoint KV sets, in fp32, without materializing
either softmax. The reference uses the sigmoid/logsigmoid form; we use the
mathematically identical logaddexp form, which is -inf-safe by construction
(a fully masked block carries lse == -inf and is a no-op to merge).

Layout contract (SURVEY.md L2): out (b, s, h, d) fp32 accumulator,
lse (b, h, s) fp32.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["merge_attn_blocks", "init_merge_state", "merge_partials"]


def merge_partials(outs: jnp.ndarray, lses: jnp.ndarray):
    """N-way -inf-safe flash merge over the leading axis.

    outs (n, ..., d) any float dtype; lses (n, ...) fp32, shapes matching
    ``outs`` minus the trailing feature axis. Returns fp32
    (out (..., d), lse (...)). Dead positions (every partial -inf) give
    out == 0, lse == -inf. Used by the split-KV decode kernel
    (ops/decode.py) and the cross-rank sharded-decode merge
    (serving/sharded.py) — identical math to the pairwise
    ``merge_attn_blocks``, evaluated max-centred in one pass.
    """
    lses = lses.astype(jnp.float32)
    m = jnp.max(lses, axis=0)                      # (...)
    dead = jnp.isneginf(m)
    safe_m = jnp.where(dead, 0.0, m)
    w = jnp.where(jnp.isneginf(lses), 0.0, jnp.exp(lses - safe_m[None]))
    denom = jnp.sum(w, axis=0)
    out = jnp.sum(outs.astype(jnp.float32) * w[..., None], axis=0)
    out = out / jnp.maximum(denom, 1e-37)[..., None]
    out = jnp.where(dead[..., None], 0.0, out)
    lse = jnp.where(dead, -jnp.inf,
                    safe_m + jnp.log(jnp.maximum(denom, 1e-37)))
    return out, lse


def init_merge_state(b: int, s: int, h: int, d: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Empty accumulator: zero output, -inf LSE."""
    out = jnp.zeros((b, s, h, d), dtype=jnp.float32)
    lse = jnp.full((b, h, s), -jnp.inf, dtype=jnp.float32)
    return out, lse


def _weight(lse: jnp.ndarray, new_lse: jnp.ndarray) -> jnp.ndarray:
    """exp(lse - new_lse) with 0 at lse == -inf (avoids -inf - -inf = NaN)."""
    safe_new = jnp.where(jnp.isneginf(new_lse), 0.0, new_lse)
    return jnp.where(jnp.isneginf(lse), 0.0, jnp.exp(lse - safe_new))


def merge_attn_blocks(
    acc_out: jnp.ndarray,  # (b, s, h, d) fp32
    acc_lse: jnp.ndarray,  # (b, h, s) fp32
    block_out: jnp.ndarray,  # (b, s, h, d) any float dtype
    block_lse: jnp.ndarray,  # (b, h, s) fp32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Numerically-stable blockwise softmax combine.

    new_lse = logaddexp(acc_lse, block_lse)
    new_out = exp(acc_lse - new_lse) * acc_out + exp(block_lse - new_lse) * block_out
    """
    acc_lse = acc_lse.astype(jnp.float32)
    block_lse = block_lse.astype(jnp.float32)
    new_lse = jnp.logaddexp(acc_lse, block_lse)
    w_acc = _weight(acc_lse, new_lse)  # (b, h, s)
    w_blk = _weight(block_lse, new_lse)
    w_acc = w_acc.transpose(0, 2, 1)[..., None]  # (b, s, h, 1)
    w_blk = w_blk.transpose(0, 2, 1)[..., None]
    new_out = w_acc * acc_out.astype(jnp.float32) + w_blk * block_out.astype(jnp.float32)
    return new_out, new_lse
