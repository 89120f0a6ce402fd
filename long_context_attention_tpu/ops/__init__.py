"""Kernel/ops layer: attention backends + the online LSE merge.

TPU-native replacement for the reference's `yunchang/kernels/` registry
(SURVEY.md L2): instead of adapters over ten external CUDA backends, one
Pallas flash-attention family plus a pure-XLA reference implementation.
"""

from long_context_attention_tpu.ops.reference import xla_attention
from long_context_attention_tpu.ops.merge import merge_attn_blocks, init_merge_state

__all__ = [
    "xla_attention",
    "merge_attn_blocks",
    "init_merge_state",
]
