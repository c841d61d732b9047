"""Parallelism layer: device-mesh data parallelism over tiles, multi-host
work distribution.

The reference is single-GPU/single-stream (SURVEY.md §2 parallelism
inventory: batching + one CUDA stream is all it has; ``--device N`` merely
selects one GPU, src/main.cpp:70-74). The TPU rebuild makes scale
first-class:

- ``mesh``       — tile-axis data parallelism: tiles are independent, so the
                   tile batch shards across ICI-connected chips with zero
                   hot-path collectives.
- ``multihost``  — per-host file/frame-range assignment over DCN for
                   multi-host video rendering.
"""

from waifu2x_tensorrt_tpu.parallel.mesh import (  # noqa: F401
    data_parallel_mesh,
    tile_sharding,
)
from waifu2x_tensorrt_tpu.parallel.multihost import (  # noqa: F401
    shard_files,
    shard_frame_ranges,
)
