"""Parallelism layer: mesh, sequence layouts, Ulysses a2a, ring, USP hybrid.

TPU-native replacement for the reference's `yunchang/globals.py` (process
groups), `yunchang/comm/` (all-to-all + extract), `yunchang/ring/` (ring
schedules) and `yunchang/hybrid/` (USP composition) — see SURVEY.md §1.
"""

from long_context_attention_tpu.parallel.mesh import (
    MeshAxes,
    make_usp_mesh,
    seq_sharding,
)
from long_context_attention_tpu.parallel.layouts import (
    LAYOUTS,
    extract_local,
    segment_ids_from_cu_seqlens,
    layout_permutation,
    permute_for_layout,
    position_descriptor,
    positions_from_descriptor,
    unpermute_from_layout,
)
from long_context_attention_tpu.parallel.ulysses import (
    gather_heads,
    scatter_heads,
    ulysses_attention_local,
)
from long_context_attention_tpu.parallel.moe import (
    MoEConfig,
    init_moe_params,
    moe_mlp_local,
    moe_param_specs,
)
from long_context_attention_tpu.parallel.pipeline import pipeline_apply
from long_context_attention_tpu.parallel.zero import (
    init_zero_opt_state,
    make_zero3_train_step,
    make_zero_train_step,
    shard_params_zero3,
    zero3_param_specs,
    zero_param_specs,
)
from long_context_attention_tpu.parallel.ring import RingConfig, ring_attention_local
from long_context_attention_tpu.parallel.tp import (
    psum_for_value,
    tp_region_input,
    tp_region_output,
)
from long_context_attention_tpu.parallel.usp import (
    AsyncLongContextAttention,
    LongContextAttention,
    UlyssesAttention,
    async_usp_attention_local,
    usp_attention_local,
)

__all__ = [
    "MeshAxes",
    "make_usp_mesh",
    "seq_sharding",
    "LAYOUTS",
    "extract_local",
    "segment_ids_from_cu_seqlens",
    "layout_permutation",
    "permute_for_layout",
    "position_descriptor",
    "positions_from_descriptor",
    "unpermute_from_layout",
    "gather_heads",
    "scatter_heads",
    "ulysses_attention_local",
    "RingConfig",
    "ring_attention_local",
    "MoEConfig",
    "init_moe_params",
    "moe_mlp_local",
    "moe_param_specs",
    "pipeline_apply",
    "init_zero_opt_state",
    "make_zero3_train_step",
    "make_zero_train_step",
    "shard_params_zero3",
    "zero3_param_specs",
    "zero_param_specs",
    "psum_for_value",
    "tp_region_input",
    "tp_region_output",
    "AsyncLongContextAttention",
    "LongContextAttention",
    "UlyssesAttention",
    "async_usp_attention_local",
    "usp_attention_local",
]
