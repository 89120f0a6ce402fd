"""Profiling & timing utilities — the `benchmark_longctx.py:82-100 init_prof`
(torch.profiler→tensorboard) and CUDA-event timing analogs, TPU-native.

* :func:`trace` — context manager around ``jax.profiler.trace`` producing a
  Perfetto/XProf trace directory (view with ``xprof``/TensorBoard).
* :func:`timed` — wall-time a jitted callable with proper device fencing. On
  the experimental axon platform ``block_until_ready`` does not reliably
  fence, so synchronization transfers a reduction to the host.
* :func:`chip_peak_tflops` / :func:`achieved_tflops` — roofline helpers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["trace", "timed", "chip_peak_tflops", "achieved_tflops", "sync"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lca_trace", host: bool = True):
    """Capture an XProf trace of the enclosed block (TensorBoard-viewable)."""
    with jax.profiler.trace(log_dir, create_perfetto_link=False):
        yield log_dir


def sync(x) -> float:
    """Force full device execution; returns a scalar derived from x."""
    leaves = jax.tree_util.tree_leaves(x)
    acc = 0.0
    for leaf in leaves:
        acc += float(jnp.sum(leaf.astype(jnp.float32))) if hasattr(leaf, "astype") else 0.0
    return acc


def timed(fn: Callable, *args, iters: int = 3, warmup: int = 1
          ) -> Tuple[float, object]:
    """Best-of-``iters`` wall time of ``fn(*args)`` with host-sync fencing.

    Returns (seconds, last_result). The first call (compile) is excluded.
    """
    out = fn(*args)
    sync(out)
    for _ in range(warmup):
        sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def chip_peak_tflops() -> float:
    """bf16 matmul peak of the local chip (roofline denominator)."""
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind or "v5lite" in kind:
        return 197.0
    if "v5p" in kind or "v5" in kind:
        return 459.0
    if "v4" in kind:
        return 275.0
    if "v6" in kind or "trillium" in kind:
        return 918.0
    return 197.0


def achieved_tflops(flops: float, seconds: float) -> Tuple[float, float]:
    """(TFLOP/s, fraction of chip peak)."""
    tf = flops / seconds / 1e12
    return tf, tf / chip_peak_tflops()
