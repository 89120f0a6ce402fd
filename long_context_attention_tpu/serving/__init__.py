"""Serving layer: prefill + decode generation over a quantized KV cache.

Beyond the reference (BASELINE.json north star): the reference is a training-
time attention layer only; serving here means USP prefill of long prompts,
per-layer KVCache (INT8/FP8) and a jit-compiled greedy decode loop.
"""

from long_context_attention_tpu.serving.continuous import (
    ContinuousEngine,
    PagedContinuousEngine,
    PagedSpeculativeContinuousEngine,
    Request,
    RequestResult,
    ShardedContinuousEngine,
    ShardedSpeculativeContinuousEngine,
    SpeculativeContinuousEngine,
)
from long_context_attention_tpu.serving.paged_sharded import (
    ShardedPagedContinuousEngine,
    ShardedPagedSpeculativeContinuousEngine,
)
from long_context_attention_tpu.serving.engine import (
    Engine,
    GenerationResult,
    SamplingParams,
)
from long_context_attention_tpu.serving.sharded import (
    sharded_cache_append,
    sharded_decode_attention,
)
from long_context_attention_tpu.serving.sharded_engine import ShardedEngine
from long_context_attention_tpu.serving.speculative import (
    SpeculativeEngine,
    SpeculativeResult,
)

__all__ = ["ContinuousEngine", "Engine", "GenerationResult",
           "PagedContinuousEngine", "PagedSpeculativeContinuousEngine", "Request",
           "RequestResult", "SamplingParams",
           "ShardedContinuousEngine", "ShardedEngine",
           "ShardedPagedContinuousEngine",
           "ShardedPagedSpeculativeContinuousEngine",
           "ShardedSpeculativeContinuousEngine",
           "SpeculativeContinuousEngine", "SpeculativeEngine",
           "SpeculativeResult",
           "sharded_cache_append", "sharded_decode_attention"]
