"""USP device mesh construction.

TPU-native replacement for the reference's process-group factory
(`yunchang/globals.py:22-81` ``set_seq_parallel_pg``): instead of a singleton
holding per-rank NCCL groups built with an all-ranks ``new_group`` loop, a
single ``jax.sharding.Mesh`` with named axes ``('dp', 'ring', 'ulysses')``
describes the whole 3-D topology; XLA derives every collective's participant
set from the axis name.

Axis placement == the reference's ``use_ulysses_low`` (`globals.py:39-78`):
the *last* mesh axis gets contiguous device ids, i.e. the best-connected ICI
neighbors. Default ``ulysses_low=True`` puts the all-to-all-heavy ulysses
axis innermost (the reference's default and recommendation for NVLink; on TPU
the analog is keeping the a2a on the shortest ICI paths). ``ulysses_low=False``
puts the ring innermost so the per-step ``ppermute`` rides adjacent links.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MeshAxes", "make_usp_mesh", "seq_sharding", "SEQ_AXES"]


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    """Axis names of a USP mesh (override to embed in a larger mesh)."""

    dp: str = "dp"
    ring: str = "ring"
    ulysses: str = "ulysses"
    tp: str = "tp"  # tensor-parallel axis (only present when tp degree > 1)
    pp: str = "pp"  # pipeline-parallel axis (only present when pp degree > 1)
    ep: str = "ep"  # expert-parallel axis (only present when ep degree > 1)

    @property
    def seq(self):
        """Sequence is sharded jointly over (ring, ulysses), ring-major —
        matching the reference's rank = ring_idx * ud + ulysses_idx ordering
        under ``use_ulysses_low=True`` (`globals.py:40-57`)."""
        return (self.ring, self.ulysses)


SEQ_AXES = MeshAxes().seq


def make_usp_mesh(
    dp: int = 1,
    ulysses: int = 1,
    ring: int = 1,
    tp: int = 1,
    pp: int = 1,
    ep: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    ulysses_low: bool = True,
    axes: MeshAxes = MeshAxes(),
) -> Mesh:
    """Build the ``(dp[, pp][, ep], ring, ulysses[, tp])`` mesh.

    ``dp * pp * ep * ulysses * ring * tp`` must equal the device count (the
    reference derives ``dp = world_size // (ud * rd)`` the same way,
    `globals.py:29-30`). The tp axis (tensor parallelism — which the
    reference only *delegates* to Megatron) sits innermost (most-latency-
    sensitive allreduces on the shortest links); pp (pipeline — also
    delegated by the reference) sits next to dp (stage hops tolerate DCN);
    ep (expert parallelism — absent from the reference entirely) sits
    between pp and ring (its all_to_all is bulk-bandwidth-bound, happy on
    mid-distance ICI). Each appears only when its degree > 1, keeping 3-axis
    meshes unchanged.
    """
    n = dp * pp * ep * ulysses * ring * tp
    names = ((axes.dp,) + ((axes.pp,) if pp > 1 else ())
             + ((axes.ep,) if ep > 1 else ())
             + (axes.ring, axes.ulysses) + ((axes.tp,) if tp > 1 else ()))

    def shape_for(order_swap: bool):
        base = ((dp,) + ((pp,) if pp > 1 else ()) + ((ep,) if ep > 1 else ())
                + ((ring, ulysses) if not order_swap else (ulysses, ring)))
        return base + ((tp,) if tp > 1 else ())

    # position of the ring axis
    r_idx = 1 + (1 if pp > 1 else 0) + (1 if ep > 1 else 0)

    if devices is None and n == len(jax.devices()):
        # ICI-topology-aware assignment (also correct across hosts/DCN): the
        # innermost axis lands on physically adjacent chips, the analog of
        # `use_ulysses_low` picking the NVLink-adjacent dimension.
        from jax.experimental import mesh_utils

        if ulysses_low:
            grid = mesh_utils.create_device_mesh(shape_for(False))
        else:
            grid = mesh_utils.create_device_mesh(shape_for(True))
            grid = grid.swapaxes(r_idx, r_idx + 1)
        return Mesh(grid, axis_names=names)

    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) < n:
        raise ValueError(f"need {n} devices (dp={dp} x pp={pp} x ep={ep} x "
                         f"ring={ring} x ulysses={ulysses} x tp={tp}), "
                         f"have {len(devs)}")
    devs = np.asarray(devs[:n], dtype=object)
    if ulysses_low:
        grid = devs.reshape(shape_for(False))
    else:
        grid = devs.reshape(shape_for(True)).swapaxes(r_idx, r_idx + 1)
    return Mesh(grid, axis_names=names)


def seq_sharding(mesh: Mesh, axes: MeshAxes = MeshAxes(), *, batch_axis: int = 0,
                 seq_axis: int = 1, ndim: int = 4) -> NamedSharding:
    """Sharding of a (b, s, h, d)-like global array: batch over dp, sequence
    over (ring, ulysses), heads/dim replicated — the USP input layout."""
    spec = [None] * ndim
    spec[batch_axis] = axes.dp
    spec[seq_axis] = axes.seq
    return NamedSharding(mesh, P(*spec))
