"""Utility layer: config/tiles, profiling, observability."""

from long_context_attention_tpu.utils.config import (
    NEG_INF,
    BlockSizes,
    default_interpret,
    on_tpu,
)
from long_context_attention_tpu.utils.logging import (
    color_print,
    device_banner,
    diff_stats,
    log_diff,
)
from long_context_attention_tpu.utils.profiling import (
    achieved_tflops,
    chip_peak_tflops,
    sync,
    timed,
    trace,
)

__all__ = [
    "NEG_INF",
    "BlockSizes",
    "default_interpret",
    "on_tpu",
    "color_print",
    "device_banner",
    "diff_stats",
    "log_diff",
    "achieved_tflops",
    "chip_peak_tflops",
    "sync",
    "timed",
    "trace",
]
