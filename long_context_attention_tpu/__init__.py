"""long_context_attention_tpu: TPU-native Unified Sequence Parallel attention.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
feifeibear/long-context-attention (YunChang USP): 2-D ulysses x ring
sequence-parallel attention over a `jax.sharding.Mesh`, Pallas flash-attention
kernels, and online log-sum-exp ring merging. See SURVEY.md at the repo root
for the reference analysis this is built to.
"""

__version__ = "0.1.0"

from long_context_attention_tpu.ops import (
    xla_attention,
    merge_attn_blocks,
    init_merge_state,
)

__all__ = [
    "xla_attention",
    "merge_attn_blocks",
    "init_merge_state",
]
