"""Still-image read/write (RGB uint8 HWC).

The reference routes single images through the same ffmpeg rawvideo pipes
as video (capture.cpp detects images by ``nb_frames == "n/a"`` and the
writer emits PNG, src/videoio/capture.cpp:89-93, src/main.cpp:248-252).
Here images use PIL directly — no subprocess, no BGR detour (the
reference's BGR→RGB→BGR round-trip, img2img_render.cpp:227,343, exists
only because ffmpeg pipes speak bgr24; we keep RGB end-to-end).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def read_image(path: str | Path) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def write_image(path: str | Path, rgb: np.ndarray) -> None:
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected uint8 (H, W, 3), got {rgb.dtype} {rgb.shape}")
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(rgb, "RGB").save(path)


def image_size(path: str | Path) -> tuple[int, int]:
    """(H, W) without decoding the full image."""
    with Image.open(path) as im:
        w, h = im.size
    return h, w
