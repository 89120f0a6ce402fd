"""Global configuration helpers for the TPU USP framework.

The reference library configures itself via import-time capability probing
(`yunchang/globals.py:83-135` — HAS_FLASH_ATTN, HAS_NPU, ...). On TPU there is
exactly one compute path (Pallas on TPU, interpreted Pallas / pure-XLA on CPU),
so "capability" reduces to the active JAX backend.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax

# Large-negative stand-in for -inf inside kernels (avoids NaN in exp/max chains
# while keeping exp(NEG_INF - m) == 0 for any realistic running max m).
NEG_INF = float(-1e30)


def on_tpu() -> bool:
    """True when the default JAX backend is a real TPU."""
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def default_interpret() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (CPU tests)."""
    return not on_tpu()


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tile sizes for the Pallas flash-attention kernels.

    Defaults target the v5e/v5p MXU (128x128). ``block_q``/``block_kv`` are
    the forward tiles; the backward kernels reuse them unless the ``bwd_*``
    overrides are set.
    """

    block_q: int = 1024
    block_kv: int = 1024
    block_q_bwd: Optional[int] = None
    block_kv_bwd: Optional[int] = None

    @property
    def bq_bwd(self) -> int:
        return self.block_q_bwd or self.block_q

    @property
    def bkv_bwd(self) -> int:
        return self.block_kv_bwd or self.block_kv

    def clamp(self, seq_q: int, seq_kv: int) -> "BlockSizes":
        """Shrink blocks so they never exceed (and always divide) the seqlens."""

        def fit(block: int, seq: int) -> int:
            block = min(block, seq)
            while seq % block:
                block //= 2
            return max(block, 1)

        return BlockSizes(
            block_q=fit(self.block_q, seq_q),
            block_kv=fit(self.block_kv, seq_kv),
            block_q_bwd=fit(self.bq_bwd, seq_q),
            block_kv_bwd=fit(self.bkv_bwd, seq_kv),
        )
