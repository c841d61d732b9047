"""Alpha-channel still-image support (--alpha auto; extension).

The reference never decodes alpha — its rawvideo pipes are rgb24 and
src/videoio/capture.cpp:55 carries a literal "TODO: ADD SUPPORT FOR ALPHA
CHANNEL". Covers io/image.read_rgba / fill_transparent and the CLI's
_render_rgba path end-to-end.
"""

import numpy as np
import pytest
from PIL import Image

from waifu2x_tensorrt_tpu.io.image import (
    fill_transparent,
    read_rgba,
    write_image,
)


def _rgba_png(path, rgba):
    Image.fromarray(rgba, "RGBA").save(path)


class TestReadRgba:
    def test_plain_rgb_has_no_alpha(self, tmp_path):
        p = tmp_path / "rgb.png"
        rgb = np.random.default_rng(0).integers(0, 256, (10, 12, 3), np.uint8)
        write_image(p, rgb)
        got, a = read_rgba(p)
        assert a is None
        np.testing.assert_array_equal(got, rgb)

    def test_rgba_roundtrip_uncomposited(self, tmp_path):
        p = tmp_path / "rgba.png"
        rgba = np.random.default_rng(1).integers(
            0, 256, (8, 9, 4), np.uint8)
        _rgba_png(p, rgba)
        rgb, a = read_rgba(p)
        np.testing.assert_array_equal(rgb, rgba[..., :3])
        np.testing.assert_array_equal(a, rgba[..., 3])

    def test_la_mode(self, tmp_path):
        p = tmp_path / "la.png"
        la = np.random.default_rng(2).integers(0, 256, (6, 7, 2), np.uint8)
        Image.fromarray(la, "LA").save(p)
        rgb, a = read_rgba(p)
        assert a is not None
        np.testing.assert_array_equal(rgb[..., 0], la[..., 0])
        np.testing.assert_array_equal(a, la[..., 1])

    def test_palette_transparency(self, tmp_path):
        p = tmp_path / "p.png"
        im = Image.new("P", (5, 5), 1)
        im.putpalette([0, 0, 0, 200, 30, 40] + [0] * (256 * 3 - 6))
        im.info["transparency"] = 0
        im.save(p, transparency=0)
        rgb, a = read_rgba(p)
        assert a is not None
        assert (a == 255).all()  # index 1 everywhere: opaque

    def test_write_rgba(self, tmp_path):
        p = tmp_path / "out.png"
        rgba = np.random.default_rng(3).integers(
            0, 256, (4, 5, 4), np.uint8)
        write_image(p, rgba)
        back = np.asarray(Image.open(p).convert("RGBA"))
        np.testing.assert_array_equal(back, rgba)


class TestFillTransparent:
    def test_opaque_pixels_bit_identical(self):
        rng = np.random.default_rng(4)
        rgb = rng.integers(0, 256, (16, 16, 3), np.uint8)
        a = rng.integers(0, 2, (16, 16), np.uint8) * 255
        out = fill_transparent(rgb, a)
        np.testing.assert_array_equal(out[a > 0], rgb[a > 0])

    def test_transparent_black_takes_neighbour_color(self):
        rgb = np.zeros((9, 9, 3), np.uint8)
        rgb[:, :4] = (200, 100, 50)  # left half opaque solid color
        a = np.zeros((9, 9), np.uint8)
        a[:, :4] = 255
        out = fill_transparent(rgb, a)
        # the bled region next to the edge must be the opaque color, not
        # the stored black (that black is what causes halos)
        np.testing.assert_array_equal(out[:, 4:], np.broadcast_to(
            (200, 100, 50), (9, 5, 3)))

    def test_all_opaque_and_all_transparent_are_noops(self):
        rgb = np.full((5, 5, 3), 7, np.uint8)
        assert fill_transparent(rgb, np.full((5, 5), 255, np.uint8)) is rgb
        assert fill_transparent(rgb, np.zeros((5, 5), np.uint8)) is rgb

    def test_deep_interior_beyond_bleed_keeps_stored_color(self):
        rgb = np.zeros((80, 80, 3), np.uint8)
        rgb[0, 0] = (10, 20, 30)
        a = np.zeros((80, 80), np.uint8)
        a[0, 0] = 255
        out = fill_transparent(rgb, a, max_iters=4)
        assert (out[40, 40] == 0).all()  # beyond the 4-px bleed


def test_cli_alpha_auto_renders_rgba(tmp_path):
    """End-to-end: --alpha auto writes an RGBA PNG at input*scale whose
    alpha plane is upscaled; --alpha ignore (default) keeps RGB output.
    Alpha images bypass the cross-file image-stream batcher."""
    from waifu2x_tensorrt_tpu.cli import main

    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, (40, 52, 4), np.uint8)
    rgba[..., 3] = 255
    rgba[:20, :, 3] = 0  # top half transparent
    p = tmp_path / "in.png"
    _rgba_png(p, rgba)
    plain = tmp_path / "plain.png"
    write_image(plain, rng.integers(0, 256, (40, 52, 3), np.uint8))
    out_dir = tmp_path / "out"
    out_dir.mkdir()

    base = ["--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
            "--batchSize", "2", "--tileSize", "64", "--precision", "tf32",
            "--allow-random-weights", "render",
            "-i", str(p), str(plain), "-o", str(out_dir)]
    assert main(base + ["--alpha", "auto"]) == 0
    outs = sorted(out_dir.glob("*.png"))
    assert len(outs) == 2
    got = {o.name.split("(")[0]: np.asarray(Image.open(o)) for o in outs}
    rgba_out = got["in"]
    assert rgba_out.shape == (80, 104, 4)
    assert got["plain"].shape == (80, 104, 3)  # no alpha: RGB output

    # exact contract: RGB = render(fill_transparent(rgb, a)), alpha =
    # channel mean of render(replicated a) — reproducible because random
    # init is seeded (registry.init_params, seed 0)
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    eng = Upscaler(models_dir="models", allow_random_init=True)
    eng.load("swin_unet/art", 2, -1, RenderConfig(
        precision=Precision.TF32, batch_size=2, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16)))
    exp_rgb = np.asarray(eng.render(
        fill_transparent(rgba[..., :3], rgba[..., 3])))
    a_r = np.asarray(eng.render(np.repeat(rgba[..., 3:], 3, axis=2)))
    exp_a = np.clip(np.rint(a_r.astype(np.float32).mean(axis=2)),
                    0, 255).astype(np.uint8)
    np.testing.assert_array_equal(rgba_out[..., :3], exp_rgb)
    np.testing.assert_array_equal(rgba_out[..., 3], exp_a)

    # default (ignore): reference behavior, RGB only
    out2 = tmp_path / "out2"
    out2.mkdir()
    assert main(base[:-1] + [str(out2)]) == 0
    for o in out2.glob("*.png"):
        assert np.asarray(Image.open(o)).shape[2] == 3


def test_cli_alpha_flag_choices():
    from waifu2x_tensorrt_tpu.cli import build_parser

    args = build_parser().parse_args([
        "--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
        "--batchSize", "4", "--tileSize", "64",
        "render", "-i", "x.png", "--alpha", "auto"])
    assert args.alpha == "auto"
    with pytest.raises(SystemExit):
        build_parser().parse_args([
            "--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
            "--batchSize", "4", "--tileSize", "64",
            "render", "-i", "x.png", "--alpha", "bogus"])


def test_fill_transparent_cropped_region_matches_full(tmp_path):
    """The bounding-box crop is an optimization, not a behavior change:
    a small transparent patch far from the image corner fills exactly as
    it would at origin, and pixels outside the box are untouched."""
    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (64, 64, 3), np.uint8)
    a = np.full((64, 64), 255, np.uint8)
    a[30:40, 40:50] = 0
    out = fill_transparent(rgb, a)
    # outside the patch (+margin) untouched
    np.testing.assert_array_equal(out[:10], rgb[:10])
    np.testing.assert_array_equal(out[a > 0], rgb[a > 0])
    # the patch was filled with bled colors, not stored ones
    assert not np.array_equal(out[30:40, 40:50], rgb[30:40, 40:50])
