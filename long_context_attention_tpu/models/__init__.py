"""Model layer: host-framework role the reference delegates to Megatron.

The reference integrates into trainers via `patches/Megatron-DeepSpeed.patch`;
here the flagship Llama-family decoder (models/llama.py) ships in-package,
with USP attention, sequence-sharded activations, and a jitted train step.
"""

from long_context_attention_tpu.models.llama import (
    ModelConfig,
    decode_step,
    forward_local,
    init_params,
    local_positions,
    loss_local,
    make_forward,
    make_pp_train_step,
    make_train_step,
    param_specs,
)
from long_context_attention_tpu.models.dit import (
    DiTConfig,
    dit_forward_local,
    init_dit_params,
    make_dit_forward,
    make_dit_train_step,
)

__all__ = [
    "ModelConfig",
    "decode_step",
    "forward_local",
    "init_params",
    "local_positions",
    "loss_local",
    "make_forward",
    "make_pp_train_step",
    "make_train_step",
    "param_specs",
    "DiTConfig",
    "dit_forward_local",
    "init_dit_params",
    "make_dit_forward",
    "make_dit_train_step",
]
