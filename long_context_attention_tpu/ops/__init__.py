"""Kernel/ops layer: attention backends + the online LSE merge.

TPU-native replacement for the reference's `yunchang/kernels/` registry
(SURVEY.md L2): instead of adapters over ten external CUDA backends, one
Pallas flash-attention family plus a pure-XLA reference implementation,
dispatched through a small registry (ops/registry.py).
"""

from long_context_attention_tpu.ops.reference import xla_attention, xla_attention_bwd
from long_context_attention_tpu.ops.merge import merge_attn_blocks, init_merge_state
from long_context_attention_tpu.ops.flash import (
    flash_attention,
    flash_attention_bwd,
    flash_attention_fwd,
)
from long_context_attention_tpu.ops.registry import (
    ATTN_IMPLS,
    AttnImpl,
    get_attn_impl,
    register_attn_impl,
)
from long_context_attention_tpu.ops.sparse import (
    block_sparse_attention,
    block_sparse_attention_fwd,
    causal_block_mask,
    global_local_block_mask,
    mask_density,
    random_block_mask,
    sliding_window_block_mask,
    strided_block_mask,
)

__all__ = [
    "block_sparse_attention",
    "block_sparse_attention_fwd",
    "causal_block_mask",
    "global_local_block_mask",
    "mask_density",
    "random_block_mask",
    "sliding_window_block_mask",
    "strided_block_mask",
    "xla_attention",
    "xla_attention_bwd",
    "merge_attn_blocks",
    "init_merge_state",
    "flash_attention",
    "flash_attention_bwd",
    "flash_attention_fwd",
    "ATTN_IMPLS",
    "AttnImpl",
    "get_attn_impl",
    "register_attn_impl",
]
