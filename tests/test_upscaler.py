"""Upscaler facade integration tests: load -> render against a per-tile
numpy oracle running the same flax model (golden-path check of the whole
engine: plan, pad, gather, batch chunking, blend, scatter, u8 cast)."""

import numpy as np
import pytest

from waifu2x_tensorrt_tpu.engine.config import (
    BuildConfig,
    Precision,
    RenderConfig,
)
from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler
from waifu2x_tensorrt_tpu.tiling import plan_tiles
from waifu2x_tensorrt_tpu.utils.logging import Severity


def test_upscaler_end_to_end_matches_per_tile_oracle(tmp_path):
    import jax.numpy as jnp

    config = RenderConfig(
        precision=Precision.TF32, batch_size=4, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16), tta=False,
    )
    engine = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
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

    # progress fires once per model chunk, 1-based, ending at n/n
    prog_calls = []
    engine.set_progress_callback(lambda c, t, s: prog_calls.append((c, t)))
    engine.render(frame)
    n_chunks = -(-plan.tile_count // config.batch_size)
    assert prog_calls == [(i + 1, n_chunks) for i in range(n_chunks)]


def test_upscaler_require_engine_parity(tmp_path):
    """require_engine=True reproduces the reference's hard failure when no
    matching engine exists (img2img_load.cpp:111-113)."""
    engine = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    config = RenderConfig(precision=Precision.TF32, batch_size=2, height=64,
                          width=64, scaling=2)
    with pytest.raises(FileNotFoundError, match="could not satisfy render"):
        engine.load("cunet/art", 2, 1, config, require_engine=True)


def test_missing_weights_hard_fail_by_default(tmp_path):
    """Without allow_random_init, a load with no converted weights fails
    like the reference does when its model artifact is absent — no silent
    garbage renders with exit code 0 (ADVICE round 1)."""
    engine = Upscaler(models_dir=tmp_path / "models")
    config = RenderConfig(precision=Precision.TF32, batch_size=1, height=64,
                          width=64, scaling=2)
    with pytest.raises(FileNotFoundError, match="no model weights"):
        engine.load("cunet/art", 2, 1, config)


def test_upscaler_render_before_load():
    engine = Upscaler()
    with pytest.raises(RuntimeError, match="load"):
        engine.render(np.zeros((8, 8, 3), np.uint8))


def test_upscaler_rejects_bad_frames(tmp_path):
    engine = Upscaler(allow_random_init=True, models_dir=tmp_path)
    config = RenderConfig(precision=Precision.TF32, batch_size=1, height=64,
                          width=64, scaling=2)
    engine.load("cunet/art", 2, 1, config)
    with pytest.raises(ValueError, match="expected"):
        engine.render(np.zeros((8, 8), np.uint8))


def test_build_compiles_corners_and_load_matches(tmp_path):
    """build() AOT-compiles every min/opt/max corner geometry and writes a
    sidecar; a later load at any corner finds the engine, while an in-range
    uncompiled geometry is honestly not claimed (no warm engine exists)."""
    build_cfg = BuildConfig(
        precision=Precision.TF32,
        min_batch_size=1, opt_batch_size=1, max_batch_size=2,
        min_width=64, opt_width=64, max_width=128,
        min_height=64, opt_height=64, max_height=128,
    )
    engine = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
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
    engine2 = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    engine2.load("cunet/art", 2, 1, corner, require_engine=True)

    # in-range but uncompiled -> hard failure under require_engine
    mid = RenderConfig(precision=Precision.TF32, batch_size=2, height=64,
                       width=64, scaling=2)
    with pytest.raises(FileNotFoundError):
        Upscaler(allow_random_init=True, models_dir=tmp_path / "models").load(
            "cunet/art", 2, 1, mid, require_engine=True)


def test_chunked_matches_monolithic(tmp_path):
    """The chunked pipeline (default) and the monolithic fused-frame
    program must agree to <=1 LSB (fp association: the chunked remainder is
    zero-padded to the chunk size, the monolithic one runs exact-size)."""
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, (90, 130, 3), np.uint8)
    for tta in (False, True):
        config = RenderConfig(
            precision=Precision.TF32, batch_size=4, height=64, width=64,
            scaling=2, overlap=(1 / 16, 1 / 16), tta=tta,
        )
        mono = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
        mono.load("cunet/art", 2, 1, config, fuse_frame=True)
        chunked = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
        chunked.load("cunet/art", 2, 1, config)
        a = mono.render(frame)
        b = chunked.render(frame)
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1, (tta, diff.max())


def test_swin_packed_head_matches_unpacked(tmp_path):
    """The packed-head pipeline (blend/scatter in (oh/r, ow/r, 48) layout,
    one canvas unpack) must match the pixel-space pipeline to <=1 LSB —
    identical math, different layout order. Packed is NOT the production
    default (measured slower on v5e: the whole-canvas depth-to-space costs
    more than fused per-tile shuffles), so it is exercised directly."""
    import jax

    from waifu2x_tensorrt_tpu.engine.renderer import ChunkedPipeline
    from waifu2x_tensorrt_tpu.models.registry import create_model, init_params

    config = RenderConfig(
        precision=Precision.TF32, batch_size=2, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16),
    )
    frame = np.random.default_rng(9).integers(0, 256, (70, 90, 3), np.uint8)
    mod_p, spec_p = create_model("swin_unet/art", 2, -1, packed_head=True)
    assert spec_p.packing == 2
    mod_u, spec_u = create_model("swin_unet/art", 2, -1, packed_head=False)
    assert spec_u.packing == 1
    params = init_params(mod_u, tile=32)  # same tree for both heads
    a = np.asarray(ChunkedPipeline(mod_p, spec_p, config).render(
        params, frame))
    b = np.asarray(ChunkedPipeline(mod_u, spec_u, config).render(
        params, frame))
    assert a.shape == b.shape == (140, 180, 3)
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.max() <= 1, diff.max()


def test_whole_frame_mode_equals_direct_apply(tmp_path):
    """tileSize 0 (whole-frame, TPU extension): the render is exactly the
    model forward on the frame — no tiling, no overlap context, no blend."""
    import jax.numpy as jnp

    from waifu2x_tensorrt_tpu.engine.renderer import ChunkedPipeline
    from waifu2x_tensorrt_tpu.models.registry import create_model, init_params

    module, spec = create_model("swin_unet/art", 2, -1)
    params = init_params(module, tile=32)
    frame = np.random.default_rng(12).integers(0, 256, (70, 90, 3), np.uint8)
    cfg = RenderConfig(precision=Precision.TF32, batch_size=1, height=0,
                       width=0, scaling=2)
    got = np.asarray(ChunkedPipeline(module, spec, cfg).render(params, frame))
    # normalize exactly as prepare() does (x * (1/255), not x / 255 —
    # they differ in the last ulp)
    x = jnp.asarray(frame[None]).astype(jnp.float32) * jnp.float32(1 / 255)
    direct = np.asarray(module.apply({"params": params}, x))[0]
    want = np.clip(np.round(direct * 255.0), 0, 255).astype(np.uint8)
    # <=1 LSB: the pipeline and the direct apply are separate XLA programs
    # (different fusion/FMA choices at the round boundary)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3


def test_chunked_sharded_matches_unsharded(tmp_path):
    """--dp sharding through the chunked pipeline (prepare out_shardings)
    equals the single-device render."""
    from waifu2x_tensorrt_tpu.parallel import data_parallel_mesh, tile_sharding

    config = RenderConfig(
        precision=Precision.TF32, batch_size=1, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16),
    )
    frame = np.random.default_rng(8).integers(0, 256, (100, 150, 3), np.uint8)
    plain = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    plain.load("cunet/art", 2, 1, config)
    sharded = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    sharded.load("cunet/art", 2, 1, config,
                 sharding=tile_sharding(data_parallel_mesh(8)))
    np.testing.assert_array_equal(plain.render(frame), sharded.render(frame))


def test_build_warms_the_render_model_program(tmp_path):
    """build() then load()+render() at a built geometry must NOT recompile
    the model: the chunked pipeline's model program is exactly the
    executable build() wrote to the persistent cache. Telemetry: the only
    new persistent-cache entries the first render may write are the cheap
    per-geometry prepare/finalize programs."""
    import jax

    # batch 1 so every chunk (including the exact-size remainder) runs the
    # geometry build() compiled; a remainder batch NOT in the profile
    # compiles fresh by design (documented in make_chunked_fns).
    config = RenderConfig(precision=Precision.TF32, batch_size=1, height=64,
                          width=64, scaling=2)
    build_cfg = BuildConfig(
        precision=Precision.TF32,
        min_batch_size=1, opt_batch_size=1, max_batch_size=1,
        min_width=64, opt_width=64, max_width=64,
        min_height=64, opt_height=64, max_height=64,
    )
    frame = np.random.default_rng(5).integers(0, 256, (70, 70, 3), np.uint8)

    def cache_files(root):
        d = root / "models" / ".jax_cache"
        return set(p.name for p in d.iterdir()) if d.is_dir() else set()

    built = tmp_path / "built"
    engine = Upscaler(allow_random_init=True, models_dir=built / "models")
    engine.build("cunet/art", 2, 1, build_cfg)
    after_build = cache_files(built)
    assert any("apply_tiles" in n for n in after_build)  # model entry written
    jax.clear_caches()  # drop in-memory executables: force cache lookups
    engine2 = Upscaler(allow_random_init=True, models_dir=built / "models")
    engine2.load("cunet/art", 2, 1, config, require_engine=True)
    engine2.render(frame)
    new_after_render = cache_files(built) - after_build
    # model program was a cache HIT; only geometry programs (and
    # incidental tiny library jits) compiled
    assert not any("apply_tiles" in n for n in new_after_render)
    assert {"jit_prepare", "jit_finalize"} <= {
        n.split("-")[0] for n in new_after_render}


def test_device_selection_is_real(tmp_path):
    """--device N commits params (and therefore execution) to device N —
    the cudaSetDevice analogue (img2img_load.cpp:129). Out-of-range ids
    fail loudly."""
    import jax

    config = RenderConfig(precision=Precision.TF32, batch_size=1, height=64,
                          width=64, scaling=2, device_id=1)
    engine = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    engine.load("cunet/art", 2, 1, config)
    leaf = jax.tree_util.tree_leaves(engine.params)[0]
    assert set(leaf.devices()) == {jax.devices()[1]}
    frame = np.random.default_rng(0).integers(0, 256, (40, 40, 3), np.uint8)
    out = engine.render(frame)
    assert out.shape == (80, 80, 3)

    bad = RenderConfig(precision=Precision.TF32, batch_size=1, height=64,
                       width=64, scaling=2, device_id=99)
    with pytest.raises(ValueError, match="out of range"):
        Upscaler(allow_random_init=True, models_dir=tmp_path / "models").load("cunet/art", 2, 1, bad)


def test_bucketed_render(tmp_path):
    """--bucket pads frames up to a size class; exact-multiple frames are
    untouched and odd sizes produce correctly cropped outputs with one
    shared program."""
    config = RenderConfig(
        precision=Precision.TF32, batch_size=4, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16), tta=False,
    )
    engine = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    engine.load("cunet/art", 2, 1, config, bucket=64)
    rng = np.random.default_rng(2)

    # exact multiple: identical to unbucketed
    f64 = rng.integers(0, 256, (64, 64, 3), np.uint8)
    out_b = engine.render(f64)
    engine2 = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    engine2.load("cunet/art", 2, 1, config, bucket=0)
    np.testing.assert_array_equal(out_b, engine2.render(f64))

    # odd sizes share the (64, 128) geometry programs and crop correctly
    geoms = engine._renderers._geoms
    n0 = len(geoms)
    for hw in ((50, 70), (60, 65), (33, 100)):
        frame = rng.integers(0, 256, (*hw, 3), np.uint8)
        out = engine.render(frame)
        assert out.shape == (hw[0] * 2, hw[1] * 2, 3)
    assert len(geoms) == n0 + 1  # all three bucketed to (64, 128)


def _force_fused_explosion(engine, config):
    """Arm the engine so its first model-chunk dispatch raises, simulating
    the fused-block scoped-vmem compile flake (NEXT_STEPS.md)."""
    engine._fused = True
    engine._load_args = ("cunet/art", 2, 1, config, None, False, {})

    def exploding(params, c):
        raise RuntimeError("scoped vmem boom")

    engine._renderers._model_prog = exploding


def test_fused_fallback_on_compile_failure(tmp_path):
    """If the fused-block model program fails, render falls back to the
    attention-only kernels and still produces output."""
    config = RenderConfig(
        precision=Precision.TF32, batch_size=2, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16),
    )
    engine = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    messages = []
    engine.set_message_callback(lambda s, m: messages.append(m))
    engine.load("cunet/art", 2, 1, config)
    _force_fused_explosion(engine, config)
    frame = np.random.default_rng(0).integers(0, 256, (40, 40, 3), np.uint8)
    out = engine.render(frame)
    assert out.shape == (80, 80, 3)
    assert any("falling back" in m for m in messages)
    assert engine._fused is False


def test_fused_fallback_covers_async_path(tmp_path):
    """render_async (the CLI video loop) must share the fused fallback and
    the per-chunk progress seam with render — a fused compile flake used to
    kill video renders while image renders survived (ADVICE round 1)."""
    config = RenderConfig(
        precision=Precision.TF32, batch_size=2, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16),
    )
    engine = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    messages, prog_calls = [], []
    engine.set_message_callback(lambda s, m: messages.append(m))
    engine.set_progress_callback(lambda c, t, s: prog_calls.append((c, t)))
    engine.load("cunet/art", 2, 1, config)
    _force_fused_explosion(engine, config)
    frame = np.random.default_rng(1).integers(0, 256, (70, 70, 3), np.uint8)
    fut = engine.render_async(frame)
    out = np.asarray(fut)
    assert out.shape == (140, 140, 3)
    assert any("falling back" in m for m in messages)
    # the post-fallback render reports a full ascending 1..n chunk sequence
    n = prog_calls[-1][1]
    assert n >= 2
    assert prog_calls[-n:] == [(i + 1, n) for i in range(n)]


def test_async_path_applies_bucketing(tmp_path):
    """render_async buckets frames exactly like render (it used to skip
    bucketing silently)."""
    config = RenderConfig(
        precision=Precision.TF32, batch_size=2, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16),
    )
    engine = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    engine.load("cunet/art", 2, 1, config, bucket=64)
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (50, 70, 3), np.uint8)
    b = rng.integers(0, 256, (60, 65, 3), np.uint8)
    out_a = np.asarray(engine.render_async(a))
    out_b = np.asarray(engine.render_async(b))
    assert out_a.shape == (100, 140, 3)
    assert out_b.shape == (120, 130, 3)
    assert len(engine._renderers._geoms) == 1  # both bucketed to (64, 128)


def test_scale1_denoise_render_both_families(tmp_path):
    """Scale-1 (pure denoise) end-to-end: output size == input size for
    both families (cunet's offset-28 valid-conv geometry gives 8x8 output
    tiles at tile 64 — the heaviest tiling case; swin s1 has a plain conv
    head)."""
    frame = np.random.default_rng(13).integers(0, 256, (40, 50, 3), np.uint8)
    for family in ("cunet/art", "swin_unet/art"):
        config = RenderConfig(precision=Precision.TF32, batch_size=4,
                              height=64, width=64, scaling=1,
                              overlap=(1 / 16, 1 / 16))
        engine = Upscaler(allow_random_init=True,
                          models_dir=tmp_path / "models")
        engine.load(family, 1, 0, config)
        out = engine.render(frame)
        assert out.shape == frame.shape, family
        assert out.dtype == np.uint8


def test_open_stream_sharded_matches_plain_render(tmp_path):
    """Upscaler.open_stream with a dp mesh streams frames to the same
    pixels (<=1 LSB) as the plain per-frame render."""
    from waifu2x_tensorrt_tpu.parallel import data_parallel_mesh, tile_sharding

    config = RenderConfig(
        precision=Precision.TF32, batch_size=1, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16),
    )
    frames = [np.random.default_rng(40 + i).integers(0, 256, (100, 150, 3),
                                                     np.uint8)
              for i in range(2)]
    plain = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    plain.load("cunet/art", 2, 1, config)
    want = [plain.render(f) for f in frames]

    sharded = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    sharded.load("cunet/art", 2, 1, config,
                 sharding=tile_sharding(data_parallel_mesh(8)))
    sess = sharded.open_stream((100, 150))
    assert sess is not None
    got = []
    for f in frames:
        got.extend(np.asarray(o) for o in sess.submit(f))
    got.extend(np.asarray(o) for o in sess.flush())
    assert len(got) == 2
    for a, b in zip(got, want):
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert diff.max() <= 1, diff.max()


def test_stream_warm_recovers_from_fused_failure(tmp_path):
    """_StreamSession.warm() triggers the first model compile, so it must
    share the fused-kernel fallback submit()/flush() have — a compile
    flake during the CLI's eager warm used to kill the whole video render
    (round-3 review finding)."""
    config = RenderConfig(
        precision=Precision.TF32, batch_size=2, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16),
    )
    engine = Upscaler(allow_random_init=True, models_dir=tmp_path / "models")
    messages = []
    engine.set_message_callback(lambda s, m: messages.append(m))
    engine.load("cunet/art", 2, 1, config)
    sess = engine.open_stream((70, 70))
    assert sess is not None
    _force_fused_explosion(engine, config)
    sess._make()  # rebuild the session streams over the armed renderer
    n = sess.warm()
    assert n >= 1
    assert engine._fused is False
    assert any("falling back" in m for m in messages)
    # the recovered stream still renders correctly end-to-end
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 256, (70, 70, 3), np.uint8)
    outs = list(sess.submit(frame)) + list(sess.flush())
    assert len(outs) == 1
    want = np.asarray(engine.render(frame))
    np.testing.assert_array_equal(np.asarray(outs[0]), want)
