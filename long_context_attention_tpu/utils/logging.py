"""Observability helpers — the analog of the reference tests' rank-serialized
diff logger (`test/test_hybrid_attn.py:94-117 log()`) and ANSI color prints
(`benchmark/benchmark_longctx.py:78`), plus tensor-diff summaries used across
our test suite.
"""

from __future__ import annotations

import sys
import jax
import numpy as np

__all__ = ["diff_stats", "log_diff", "color_print", "device_banner"]


def diff_stats(a, b) -> dict:
    """max/mean absolute difference summary of two arrays (fp32)."""
    af = np.asarray(a, np.float32)
    bf = np.asarray(b, np.float32)
    d = np.abs(af - bf)
    return {
        "max_abs_diff": float(d.max()),
        "mean_abs_diff": float(d.mean()),
        "max_ref_abs": float(np.abs(bf).max()),
        "shape": tuple(af.shape),
    }


def log_diff(name: str, a, b, file=sys.stderr) -> dict:
    """Print a one-line diff summary (the reference's per-rank `log()`)."""
    s = diff_stats(a, b)
    print(f"[{name}] max_abs={s['max_abs_diff']:.3e} "
          f"mean_abs={s['mean_abs_diff']:.3e} shape={s['shape']}", file=file)
    return s


def color_print(msg: str, color: str = "green", file=sys.stderr) -> None:
    codes = {"red": 31, "green": 32, "yellow": 33, "blue": 34}
    print(f"\033[{codes.get(color, 32)}m{msg}\033[0m", file=file)


def device_banner(file=sys.stderr) -> None:
    """One-line platform/device summary (the NCCL env-print analog)."""
    devs = jax.devices()
    print(f"backend={jax.default_backend()} devices={len(devs)} "
          f"kind={devs[0].device_kind}", file=file)
