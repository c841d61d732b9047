"""Unit tests for the pure tile-geometry core.

Includes a naive numpy "oracle" renderer that re-implements the reference's
per-tile mask/clamp/accumulate semantics (full 2-D masks, sequential adds —
img2img_render.cpp:107-121,224-339) and checks the factored TilePlan
reconstruction against it: with an identity model, render(x) must reproduce
x (upsampled) exactly wherever ramps sum to 1.
"""

import math

import numpy as np
import pytest

from waifu2x_tensorrt_tpu.tiling import (
    DIHEDRAL_SIZE,
    Rect,
    calculate_tiles,
    dihedral_apply,
    dihedral_inverse,
    plan_tiles,
    tile_weight_ramps,
)


class TestCalculateTiles:
    def test_single_tile_exact_fit(self):
        # 256x256 image, swin-like model: out tile = in tile * scale
        count, in_rects, out_rects = calculate_tiles(
            (256, 256), (512, 512), (256, 256), (512, 512), 2, (0.0, 0.0)
        )
        assert count == 1
        assert in_rects[0] == Rect(0, 0, 256, 256)
        assert out_rects[0] == Rect(0, 0, 512, 512)

    def test_grid_no_overlap(self):
        count, in_rects, out_rects = calculate_tiles(
            (512, 512), (1024, 1024), (256, 256), (512, 512), 2, (0.0, 0.0)
        )
        assert count == 4
        xs = sorted({r.x for r in in_rects})
        assert xs == [0, 256]
        assert all(r.width == 256 for r in in_rects)
        assert sorted({r.x for r in out_rects}) == [0, 512]

    def test_overlap_strides(self):
        # tile 256, overlap 1/16 -> inputOverlap 16, stride 240
        count, in_rects, out_rects = calculate_tiles(
            (512, 512), (1024, 1024), (256, 256), (512, 512), 2, (0.0625, 0.0625)
        )
        # tiling = ceil((512-16)/240) = ceil(2.066) = 3 per axis
        assert count == 9
        xs = sorted({r.x for r in in_rects})
        assert xs == [0, 240, 480]
        # output stride = 512 - 32 = 480
        oxs = sorted({r.x for r in out_rects})
        assert oxs == [0, 480, 960]
        # last column/row clamped: x=960, width = 1024-960 = 64
        for r in out_rects:
            if r.x == 960:
                assert r.width == 64
            else:
                assert r.width == 512

    def test_cunet_context_border(self):
        # cunet 2x: input tile 256 -> output tile 440 (offset 36).
        count, in_rects, out_rects = calculate_tiles(
            (512, 512), (1024, 1024), (256, 256), (440, 440), 2, (0.0, 0.0)
        )
        # scaledInput = round(440/512*256) = 220; border = (256-220)//2 = 18
        assert in_rects[0].x == -18 and in_rects[0].y == -18
        # tiling = ceil(512/220) = 3
        assert count == 9
        xs = sorted({r.x for r in in_rects})
        assert xs == [-18, 202, 422]
        # input rects overhang the image on the right: 422+256 = 678 > 512
        oxs = sorted({r.x for r in out_rects})
        assert oxs == [0, 440, 880]
        for r in out_rects:
            if r.x == 880:
                assert r.width == 1024 - 880
            else:
                assert r.width == 440

    def test_ordering_is_x_major(self):
        # reference iterates i (x) outer, j (y) inner: img2img_render.cpp:43-44
        _, in_rects, _ = calculate_tiles(
            (512, 512), (1024, 1024), (256, 256), (512, 512), 2, (0.0, 0.0)
        )
        assert [(r.x, r.y) for r in in_rects] == [
            (0, 0),
            (0, 256),
            (256, 0),
            (256, 256),
        ]


class TestWeights:
    def test_ramp_values(self):
        top, bottom, left, right = tile_weight_ramps((32, 32), (512, 512))
        # n = 33; row r gets (r+1)/33 for r < 32
        assert top[0] == pytest.approx(1 / 33)
        assert top[31] == pytest.approx(32 / 33)
        assert top[32] == 1.0
        assert np.all(top[32:] == 1.0)
        np.testing.assert_allclose(bottom, top[::-1])
        np.testing.assert_allclose(right, left[::-1])

    def test_complementarity(self):
        # Adjacent tiles' bottom + next-tile top over the overlap region must
        # sum to ~1 given stride = tile - overlap.
        ov = 32
        tile = 512
        top, bottom, _, _ = tile_weight_ramps((ov, ov), (tile, tile))
        stride = tile - ov
        # overlap rows of tile j: rows [stride, tile) of tile j coincide with
        # rows [0, ov) of tile j+1.
        s = bottom[stride:] + top[:ov]
        np.testing.assert_allclose(s, 1.0, atol=1e-6)


def oracle_render(img, in_tile, out_tile, scale, overlap, model):
    """Naive reference-semantics renderer (fp32 numpy, HWC)."""
    H, W = img.shape[:2]
    out_w, out_h = W * scale, H * scale
    count, in_rects, out_rects = calculate_tiles(
        (W, H), (out_w, out_h), (in_tile, in_tile), (out_tile, out_tile), scale,
        (overlap, overlap),
    )
    # full-tile 2-D masks like createTileWeights
    ov = round(in_tile * scale * overlap)
    top, bottom, left, right = tile_weight_ramps((ov, ov), (out_tile, out_tile))
    w_top = np.repeat(top[:, None], out_tile, 1)[..., None]
    w_bottom = np.repeat(bottom[:, None], out_tile, 1)[..., None]
    w_left = np.repeat(left[None, :], out_tile, 0)[..., None]
    w_right = np.repeat(right[None, :], out_tile, 0)[..., None]

    out = np.zeros((out_h, out_w, img.shape[2]), np.float32)
    for t in range(count):
        ir, orect = in_rects[t], out_rects[t]
        # padRoi: slice + BORDER_REPLICATE
        ys = np.clip(np.arange(ir.y, ir.y + ir.height), 0, H - 1)
        xs = np.clip(np.arange(ir.x, ir.x + ir.width), 0, W - 1)
        tile = img[np.ix_(ys, xs)]
        pred = model(tile)
        assert pred.shape[0] == out_tile and pred.shape[1] == out_tile
        if overlap != 0:
            if orect.x > 0:
                pred = pred * w_left
            if orect.y > 0:
                pred = pred * w_top
            if orect.x + orect.width < out_w:
                pred = pred * w_right
            if orect.y + orect.height < out_h:
                pred = pred * w_bottom
        out[orect.y : orect.y + orect.height, orect.x : orect.x + orect.width] += pred[
            : orect.height, : orect.width
        ]
    return out


def plan_render(img, in_tile, out_tile, scale, overlap, model):
    """Renderer using the factored TilePlan (what the jitted graph does)."""
    H, W = img.shape[:2]
    plan = plan_tiles((H, W), (in_tile, in_tile), (out_tile, out_tile), scale,
                      (overlap, overlap))
    pt, pb, pl_, pr = plan.pad
    padded = np.pad(img, ((pt, pb), (pl_, pr), (0, 0)), mode="edge")
    ch, cw = plan.canvas_size
    canvas = np.zeros((ch, cw, img.shape[2]), np.float32)
    th, tw = plan.input_tile
    oh, ow = plan.output_tile
    for t in range(plan.tile_count):
        iy, ix = plan.input_origins[t]
        tile = padded[iy : iy + th, ix : ix + tw]
        pred = model(tile)
        pred = pred * plan.row_weights[t][:, None, None]
        pred = pred * plan.col_weights[t][None, :, None]
        oy, ox = plan.output_origins[t]
        canvas[oy : oy + oh, ox : ox + ow] += pred
    out_h, out_w = plan.output_size
    return canvas[:out_h, :out_w]


def _upsample_model(scale, out_tile, in_tile):
    """Identity nearest-upsample 'model' with cunet-style center crop when
    out_tile < in_tile*scale."""
    def model(tile):
        up = np.repeat(np.repeat(tile, scale, 0), scale, 1).astype(np.float32)
        full = in_tile * scale
        off = (full - out_tile) // 2
        return up[off : off + out_tile, off : off + out_tile]

    return model


@pytest.mark.parametrize(
    "hw,in_tile,out_tile,scale,overlap",
    [
        ((200, 300), 64, 128, 2, 0.0625),
        ((200, 300), 64, 128, 2, 0.125),
        ((128, 128), 64, 128, 2, 0.0),
        ((100, 160), 64, 256, 4, 0.0625),
        ((140, 90), 64, 112, 2, 0.0625),  # cunet-like: out < in*scale
        ((97, 61), 64, 112, 2, 0.03125),
        ((256, 256), 256, 440, 2, 0.0625),  # real cunet 2x geometry
    ],
)
def test_plan_matches_oracle(hw, in_tile, out_tile, scale, overlap):
    rng = np.random.default_rng(0)
    img = rng.random((hw[0], hw[1], 3), np.float32)
    model = _upsample_model(scale, out_tile, in_tile)
    ref = oracle_render(img, in_tile, out_tile, scale, overlap, model)
    got = plan_render(img, in_tile, out_tile, scale, overlap, model)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize(
    "hw,in_tile,out_tile,scale,overlap",
    [
        ((200, 300), 64, 128, 2, 0.0625),
        ((128, 128), 64, 128, 2, 0.0),
        ((100, 160), 64, 256, 4, 0.0625),
    ],
)
def test_identity_reconstruction(hw, in_tile, out_tile, scale, overlap):
    """With complementary ramps, the rendered output equals the upsampled
    input everywhere (ramps sum to 1 across seams)."""
    rng = np.random.default_rng(1)
    img = rng.random((hw[0], hw[1], 3), np.float32)
    model = _upsample_model(scale, out_tile, in_tile)
    got = plan_render(img, in_tile, out_tile, scale, overlap, model)
    expected = np.repeat(np.repeat(img, scale, 0), scale, 1)
    np.testing.assert_allclose(got, expected, atol=1e-5)


@pytest.mark.parametrize("hw", [(16, 11), (1, 1), (3, 70)])
def test_image_smaller_than_overlap(hw):
    """Images smaller than the tile overlap must still produce >=1 tile
    (the reference's ceil() would yield 0 tiles and render nothing)."""
    rng = np.random.default_rng(5)
    img = rng.random((hw[0], hw[1], 3), np.float32)
    model = _upsample_model(2, 128, 64)
    got = plan_render(img, 64, 128, 2, 0.0625, model)
    expected = np.repeat(np.repeat(img, 2, 0), 2, 1)
    np.testing.assert_allclose(got, expected, atol=1e-5)


class TestDihedral:
    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        x = rng.random((5, 16, 16, 3), np.float32)
        for i in range(DIHEDRAL_SIZE):
            y = dihedral_apply(x, i)
            z = dihedral_inverse(y, i)
            np.testing.assert_array_equal(z, x)

    def test_group_complete(self):
        # The 8 transforms must be pairwise distinct (full D4 group).
        x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
        seen = {dihedral_apply(x, i).tobytes() for i in range(DIHEDRAL_SIZE)}
        assert len(seen) == 8

    def test_exactness(self):
        # Transforms are permutations: multiset of values unchanged.
        rng = np.random.default_rng(3)
        x = rng.random((8, 8, 3), np.float32)
        for i in range(DIHEDRAL_SIZE):
            y = dihedral_apply(x, i)
            assert sorted(y.ravel()) == sorted(x.ravel())

    def test_jax_matches_numpy(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(4)
        x = rng.random((2, 8, 8, 3), np.float32)
        for i in range(DIHEDRAL_SIZE):
            a = dihedral_apply(x, i)
            b = np.asarray(dihedral_apply(jnp.asarray(x), i))
            np.testing.assert_array_equal(a, b)


def test_identity_reconstruction_randomized_sweep():
    """40 random geometries (frame, tile, overlap, scale, context shrink)
    must all reconstruct the upsampled input exactly — the blend ramps'
    sum-to-1 property has no corner exceptions."""
    rng = np.random.default_rng(7)
    for case in range(40):
        scale = int(rng.choice([1, 2, 4]))
        in_tile = int(rng.choice([32, 64, 96]))
        full = in_tile * scale
        if rng.random() < 0.3 and full > 4 * scale:
            # cunet-style context shrink: even per-side offset in output px
            k = int(rng.integers(1, min(8, full // (2 * scale))))
            out_tile = full - 2 * k * scale
        else:
            out_tile = full
        overlap = float(rng.choice([0.0, 1 / 32, 1 / 16, 1 / 8]))
        h = int(rng.integers(1, 220))
        w = int(rng.integers(1, 220))
        img = rng.random((h, w, 3)).astype(np.float32)
        model = _upsample_model(scale, out_tile, in_tile)
        got = plan_render(img, in_tile, out_tile, scale, overlap, model)
        expected = np.repeat(np.repeat(img, scale, 0), scale, 1)
        np.testing.assert_allclose(
            got, expected, atol=1e-5,
            err_msg=f"case {case}: hw=({h},{w}) tile={in_tile} "
                    f"out={out_tile} scale={scale} overlap={overlap}")


def test_too_small_tile_raises_named_error():
    """A tile the context shrink + blend overlap consumes entirely must
    raise a ValueError naming the constraint — not ZeroDivisionError
    (stride 0) or a silently blank canvas (negative stride, zero-size
    output rects)."""
    from waifu2x_tensorrt_tpu.tiling import calculate_tiles

    # cunet scale 1 (offset 28/side): tile 60 -> out 4, stride 4-4 = 0
    with pytest.raises(ValueError, match="too small"):
        calculate_tiles((200, 200), (200, 200), (60, 60), (4, 4), 1,
                        (1 / 16, 1 / 16))
    # cunet scale 2 (offset 36/side): tile 36 -> out tile 0
    with pytest.raises(ValueError, match="too small"):
        calculate_tiles((100, 100), (200, 200), (36, 36), (0, 0), 2,
                        (1 / 16, 1 / 16))
    # healthy case still works: smallest CLI tile, cunet scale 1
    n, _, _ = calculate_tiles((100, 100), (100, 100), (64, 64), (8, 8), 1,
                              (1 / 16, 1 / 16))
    assert n > 0
