"""Device-mesh construction and tile-batch sharding.

Spatial tiling (SURVEY.md §5 "long-context" analogue) is embarrassingly
parallel: every tile is independent, so the render program shards the tile
batch across a 1-D ``dp`` mesh axis. XLA/GSPMD then partitions the model
application per-chip; the only cross-device data movement is the implicit
gather of output tiles into the replicated accumulation canvas — which
rides ICI.

Replaces the reference's "parallelism" (one CUDA stream + batching,
img2img_load.cpp:206, img2img_render.cpp:249-289) with real multi-chip
execution.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def data_parallel_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D data-parallel mesh over (a prefix of) the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DP_AXIS,))


def tile_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (tile-batch) axis across the dp mesh axis."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
