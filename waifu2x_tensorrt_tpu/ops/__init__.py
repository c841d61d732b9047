"""Pallas TPU kernels for the hot ops.

The reference's device work lives in TensorRT's closed kernels plus OpenCV
CUDA helpers; here the hot paths are XLA-fused by construction, with Pallas
kernels where hand-fusion beats the compiler:

- ``window_attention`` — fused QK^T + relative bias + shift mask + softmax +
  PV for 8x8 shifted-window attention (the swin_unet hot op), keeping the
  (N, N) attention matrix in VMEM instead of round-tripping HBM.
"""

from waifu2x_tensorrt_tpu.ops.window_attention import (  # noqa: F401
    fused_window_attention,
    window_attention_reference,
)
