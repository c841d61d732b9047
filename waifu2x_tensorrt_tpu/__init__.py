"""waifu2x_tensorrt_tpu — a TPU-native image/video super-resolution framework.

A from-scratch rebuild of the capabilities of z3lx/waifu2x-tensorrt
(reference layer map in SURVEY.md) on JAX/XLA/Pallas:

- ``tiling``        — pure tile-geometry / blend-weight / TTA math
                      (reference: src/tensorrt/img2img_render.cpp:7-222,
                      src/tensorrt/img2img_load.cpp:29-52)
- ``models``        — cunet + swin_unet families as JAX modules
                      (reference treats these as opaque ONNX, src/main.cpp:201-204)
- ``engine``        — Upscaler facade, jitted frame renderer, AOT compile cache
                      (reference: src/tensorrt/img2img_*.cpp)
- ``io``            — image/video capture + writer over ffmpeg pipes
                      (reference: src/videoio/)
- ``parallel``      — device-mesh sharding of the tile batch, multi-host work split
                      (no reference equivalent; single-GPU there)
- ``ops``           — Pallas TPU kernels for the hot ops
- ``utils``         — logging/progress callbacks, hashing, timing, path discovery
                      (reference: src/utilities/, src/tensorrt/logger.*)
"""

__version__ = "0.1.0"

from waifu2x_tensorrt_tpu.engine.config import (  # noqa: F401
    BuildConfig,
    Precision,
    RenderConfig,
)
