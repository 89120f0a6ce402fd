"""long_context_attention_tpu: TPU-native Unified Sequence Parallel attention.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
feifeibear/long-context-attention (YunChang USP): 2-D ulysses x ring
sequence-parallel attention over a `jax.sharding.Mesh`, Pallas flash-attention
kernels, and online log-sum-exp ring merging. See SURVEY.md at the repo root
for the reference analysis this is built to.

Public surface (the analog of `yunchang/__init__.py:1-12`):

* layers: LongContextAttention (USP), UlyssesAttention, ring_attention_local
* mesh:   make_usp_mesh (replaces set_seq_parallel_pg)
* layouts: extract_local / permute_for_layout (replaces EXTRACT_FUNC_DICT)
* kernels: flash_attention (Pallas), xla_attention (oracle), get_attn_impl
"""

__version__ = "0.2.0"

from long_context_attention_tpu.ops import (
    block_sparse_attention,
    block_sparse_attention_fwd,
    causal_block_mask,
    global_local_block_mask,
    mask_density,
    random_block_mask,
    sliding_window_block_mask,
    strided_block_mask,
    flash_attention,
    flash_attention_bwd,
    flash_attention_fwd,
    get_attn_impl,
    init_merge_state,
    merge_attn_blocks,
    xla_attention,
    xla_attention_bwd,
)
from long_context_attention_tpu.parallel import (
    LAYOUTS,
    AsyncLongContextAttention,
    LongContextAttention,
    MeshAxes,
    UlyssesAttention,
    extract_local,
    gather_heads,
    make_usp_mesh,
    permute_for_layout,
    ring_attention_local,
    scatter_heads,
    seq_sharding,
    ulysses_attention_local,
    unpermute_from_layout,
    usp_attention_local,
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
    "flash_attention",
    "flash_attention_bwd",
    "flash_attention_fwd",
    "get_attn_impl",
    "init_merge_state",
    "merge_attn_blocks",
    "xla_attention",
    "xla_attention_bwd",
    "LAYOUTS",
    "AsyncLongContextAttention",
    "LongContextAttention",
    "MeshAxes",
    "UlyssesAttention",
    "extract_local",
    "gather_heads",
    "make_usp_mesh",
    "permute_for_layout",
    "ring_attention_local",
    "scatter_heads",
    "seq_sharding",
    "ulysses_attention_local",
    "unpermute_from_layout",
    "usp_attention_local",
]
