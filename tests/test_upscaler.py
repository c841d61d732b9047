"""Upscaler facade integration tests: load -> render against a per-tile
numpy oracle running the same flax model (golden-path check of the whole
engine: plan, pad, gather, batch chunking, blend, scatter, u8 cast)."""

import numpy as np
import pytest

from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler
from waifu2x_tensorrt_tpu.tiling import plan_tiles
from waifu2x_tensorrt_tpu.utils.logging import Severity


def test_upscaler_end_to_end_matches_per_tile_oracle(tmp_path):
    import jax.numpy as jnp

    config = RenderConfig(
        precision=Precision.TF32, batch_size=4, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16), tta=False,
    )
    engine = Upscaler(models_dir=tmp_path / "models")
    messages = []
    engine.set_message_callback(lambda s, m: messages.append((s, m)))
    engine.load("cunet/art", 2, 1, config)
    assert any("random init" in m for _, m in messages)  # no weights

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (60, 40, 3), np.uint8)
    out = engine.render(frame)
    assert out.shape == (120, 80, 3) and out.dtype == np.uint8

    # ---- per-tile oracle with the same params/model ----
    module, spec = engine._module, engine.spec
    params = engine.params
    out_tile = spec.output_tile(64)
    plan = plan_tiles((60, 40), (64, 64), (out_tile, out_tile), 2,
                      config.overlap)
    x = frame.astype(np.float32) / 255.0
    pt, pb, pl, pr = plan.pad
    padded = np.pad(x, ((pt, pb), (pl, pr), (0, 0)), mode="edge")
    canvas = np.zeros((*plan.canvas_size, 3), np.float32)
    for t in range(plan.tile_count):
        iy, ix = plan.input_origins[t]
        tile = padded[iy:iy + 64, ix:ix + 64]
        pred = np.asarray(
            module.apply({"params": params}, jnp.asarray(tile[None]))
        )[0]
        pred = pred * plan.row_weights[t][:, None, None]
        pred = pred * plan.col_weights[t][None, :, None]
        oy, ox = plan.output_origins[t]
        canvas[oy:oy + out_tile, ox:ox + out_tile] += pred
    ref = canvas[:120, :80]
    ref_u8 = np.clip(np.round(ref * 255.0), 0, 255).astype(np.uint8)

    diff = np.abs(out.astype(int) - ref_u8.astype(int))
    assert diff.max() <= 1  # batch-vs-single fp association
    assert (diff > 0).mean() < 0.005

    # progress callback fired
    engine.set_progress_callback(lambda c, t, s: messages.append(("p", c)))
    engine.render(frame)
    assert ("p", plan.tile_count) in messages


def test_upscaler_require_engine_parity(tmp_path):
    """require_engine=True reproduces the reference's hard failure when no
    matching engine exists (img2img_load.cpp:111-113)."""
    engine = Upscaler(models_dir=tmp_path / "models")
    config = RenderConfig(precision=Precision.TF32, batch_size=2, height=64,
                          width=64, scaling=2)
    with pytest.raises(FileNotFoundError, match="could not satisfy render"):
        engine.load("cunet/art", 2, 1, config, require_engine=True)


def test_upscaler_render_before_load():
    engine = Upscaler()
    with pytest.raises(RuntimeError, match="load"):
        engine.render(np.zeros((8, 8, 3), np.uint8))


def test_upscaler_rejects_bad_frames(tmp_path):
    engine = Upscaler(models_dir=tmp_path)
    config = RenderConfig(precision=Precision.TF32, batch_size=1, height=64,
                          width=64, scaling=2)
    engine.load("cunet/art", 2, 1, config)
    with pytest.raises(ValueError, match="expected"):
        engine.render(np.zeros((8, 8), np.uint8))


def test_build_compiles_corners_and_load_matches(tmp_path):
    """build() AOT-compiles every min/opt/max corner geometry and writes a
    sidecar; a later load at any corner finds the engine, while an in-range
    uncompiled geometry is honestly not claimed (no warm engine exists)."""
    from waifu2x_tensorrt_tpu.engine.config import BuildConfig

    build_cfg = BuildConfig(
        precision=Precision.TF32,
        min_batch_size=1, opt_batch_size=1, max_batch_size=2,
        min_width=64, opt_width=64, max_width=128,
        min_height=64, opt_height=64, max_height=128,
    )
    engine = Upscaler(models_dir=tmp_path / "models")
    messages = []
    engine.set_message_callback(lambda s, m: messages.append(m))
    engine.build("cunet/art", 2, 1, build_cfg)
    sidecars = list((tmp_path / "models" / "cunet" / "art").glob(
        "*.engine.json"))
    assert len(sidecars) == 1
    assert any("geometries=((1, 64, 64), (2, 128, 128))" in m
               for m in messages)

    # corner geometry -> engine found; require_engine load succeeds
    corner = RenderConfig(precision=Precision.TF32, batch_size=2, height=128,
                          width=128, scaling=2)
    engine2 = Upscaler(models_dir=tmp_path / "models")
    engine2.load("cunet/art", 2, 1, corner, require_engine=True)

    # in-range but uncompiled -> hard failure under require_engine
    mid = RenderConfig(precision=Precision.TF32, batch_size=2, height=64,
                       width=64, scaling=2)
    with pytest.raises(FileNotFoundError):
        Upscaler(models_dir=tmp_path / "models").load(
            "cunet/art", 2, 1, mid, require_engine=True)


def test_device_selection_is_real(tmp_path):
    """--device N commits params (and therefore execution) to device N —
    the cudaSetDevice analogue (img2img_load.cpp:129). Out-of-range ids
    fail loudly."""
    import jax

    config = RenderConfig(precision=Precision.TF32, batch_size=1, height=64,
                          width=64, scaling=2, device_id=1)
    engine = Upscaler(models_dir=tmp_path / "models")
    engine.load("cunet/art", 2, 1, config)
    leaf = jax.tree_util.tree_leaves(engine.params)[0]
    assert set(leaf.devices()) == {jax.devices()[1]}
    frame = np.random.default_rng(0).integers(0, 256, (40, 40, 3), np.uint8)
    out = engine.render(frame)
    assert out.shape == (80, 80, 3)

    bad = RenderConfig(precision=Precision.TF32, batch_size=1, height=64,
                       width=64, scaling=2, device_id=99)
    with pytest.raises(ValueError, match="out of range"):
        Upscaler(models_dir=tmp_path / "models").load("cunet/art", 2, 1, bad)


def test_bucketed_render(tmp_path):
    """--bucket pads frames up to a size class; exact-multiple frames are
    untouched and odd sizes produce correctly cropped outputs with one
    shared program."""
    config = RenderConfig(
        precision=Precision.TF32, batch_size=4, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16), tta=False,
    )
    engine = Upscaler(models_dir=tmp_path / "models")
    engine.load("cunet/art", 2, 1, config, bucket=64)
    rng = np.random.default_rng(2)

    # exact multiple: identical to unbucketed
    f64 = rng.integers(0, 256, (64, 64, 3), np.uint8)
    out_b = engine.render(f64)
    engine2 = Upscaler(models_dir=tmp_path / "models")
    engine2.load("cunet/art", 2, 1, config, bucket=0)
    np.testing.assert_array_equal(out_b, engine2.render(f64))

    # odd sizes share the (64, 128) program and crop correctly
    progs = engine._renderers._programs
    n0 = len(progs)
    for hw in ((50, 70), (60, 65), (33, 100)):
        frame = rng.integers(0, 256, (*hw, 3), np.uint8)
        out = engine.render(frame)
        assert out.shape == (hw[0] * 2, hw[1] * 2, 3)
    assert len(progs) == n0 + 1  # all three bucketed to (64, 128)


def test_fused_fallback_on_compile_failure(tmp_path, monkeypatch):
    """If the fused-block program fails, render falls back to the
    attention-only kernels and still produces output."""
    import waifu2x_tensorrt_tpu.engine.upscaler as up

    config = RenderConfig(
        precision=Precision.TF32, batch_size=2, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16),
    )
    engine = Upscaler(models_dir=tmp_path / "models")
    messages = []
    engine.set_message_callback(lambda s, m: messages.append(m))
    # cunet so the fallback path compiles fast; force the "fused" state and
    # make the first program explode
    engine.load("cunet/art", 2, 1, config)
    engine._fused = True
    engine._load_args = ("cunet/art", 2, 1, config, None, False)

    real_get = engine._renderers.get
    calls = {"n": 0}

    class Exploding:
        plan = type("P", (), {"tile_count": 1})

        def __call__(self, *a):
            raise RuntimeError("scoped vmem boom")

    def fake_get(hw):
        calls["n"] += 1
        if calls["n"] == 1:
            return Exploding()
        return real_get(hw)

    engine._renderers.get = fake_get
    frame = np.random.default_rng(0).integers(0, 256, (40, 40, 3), np.uint8)
    out = engine.render(frame)
    assert out.shape == (80, 80, 3)
    assert any("falling back" in m for m in messages)
    assert engine._fused is False
