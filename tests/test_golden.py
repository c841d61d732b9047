"""Golden-image regression tests.

Deterministic inputs + seed-0 params -> stored golden PNGs (generated on
the CPU backend). Catches silent numerics drift in the models or renderer
across refactors (SURVEY.md §4 "golden-image integration tests"). Uint8
comparison allows ±1 LSB for cross-version fp variance; structural drift
shows up orders of magnitude larger.

Regenerate (after an INTENTIONAL numerics change) in the exact test
environment:
  GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q

Tolerances: cunet ±1 LSB; swin ±8 (its residual attention stack chaotically
amplifies fp reduction-order differences even between CPU thread/device
configs; structural breakage shows as 50-255).
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"

CONFIGS = [
    # family, scale, noise, tile, H, W, tolerance
    ("cunet/art", 2, 1, 64, 48, 40, 1),
    ("swin_unet/art", 2, -1, 64, 40, 56, 8),
]


def _render(family, scale, noise, tile, h, w):
    import jax.numpy as jnp

    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.renderer import make_render_fn
    from waifu2x_tensorrt_tpu.models.registry import create_model, init_params

    module, spec = create_model(family, scale, noise)
    params = init_params(module, tile=64, seed=0)
    cfg = RenderConfig(precision=Precision.TF32, batch_size=2, height=tile,
                       width=tile, scaling=scale, overlap=(1 / 16, 1 / 16))
    fn = make_render_fn(module, spec, cfg, (h, w))
    yy, xx = np.mgrid[0:h, 0:w]
    frame = np.stack([xx * 5 % 256, yy * 7 % 256, (xx + yy) * 3 % 256],
                     -1).astype(np.uint8)
    import jax

    return np.asarray(jax.jit(fn)(params, jnp.asarray(frame)))


def _name(family, scale, noise):
    return f"{family.replace('/', '_')}_s{scale}_n{noise}.png"


@pytest.mark.parametrize("family,scale,noise,tile,h,w,tol", CONFIGS)
def test_golden(family, scale, noise, tile, h, w, tol):
    from waifu2x_tensorrt_tpu.io.image import read_image

    import os

    path = GOLDEN_DIR / _name(family, scale, noise)
    if os.environ.get("GOLDEN_REGEN") == "1" or not path.exists():
        from waifu2x_tensorrt_tpu.io.image import write_image

        GOLDEN_DIR.mkdir(exist_ok=True)
        write_image(path, _render(family, scale, noise, tile, h, w))
        pytest.skip(f"golden (re)generated: {path.name}")
    got = _render(family, scale, noise, tile, h, w)
    ref = read_image(path)
    assert got.shape == ref.shape
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= tol, f"golden drift: max {diff.max()}"

