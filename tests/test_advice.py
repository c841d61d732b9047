"""Tile-size guidance tests (round-3 verdict item 8).

The advisor models dispatched work (tile_count * tile area / measured
efficiency class) and must reproduce the v5e findings recorded in
BENCH_NOTES round 3/4: tile 640 loses to 256 on 4K frames, whole-frame
wins small stills, small tiles win TTA — while staying silent when the
user's pick is already (near-)optimal. Warn-only: flag parity means the
render still uses exactly the asked tile (src/main.cpp:62-64).
"""

import dataclasses

import pytest

from waifu2x_tensorrt_tpu.engine.advice import tile_advice
from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
from waifu2x_tensorrt_tpu.models.registry import get_spec


def _cfg(tile, scale=2, tta=False, batch=4):
    return RenderConfig(
        precision=Precision.FP16, batch_size=batch, height=tile,
        width=tile, scaling=scale, overlap=(1 / 16, 1 / 16), tta=tta)


SWIN2 = get_spec("swin_unet/photo", 2, -1)
SWIN4 = get_spec("swin_unet/art", 4, 3)
CUNET = get_spec("cunet/art", 2, 1)


def test_4k_tile640_advises_smaller():
    adv = tile_advice(SWIN2, _cfg(640), (2160, 3840))
    assert adv is not None
    tile, ratio, reason = adv
    assert tile in (128, 256), adv
    assert ratio >= 1.3
    assert "--tileSize" in reason


def test_4k_tile256_is_silent():
    assert tile_advice(SWIN2, _cfg(256), (2160, 3840)) is None


def test_small_still_tile256_advises_whole_frame_or_smaller():
    # 512px still at tile 256: 9 tiles cover 2.25x the frame — the
    # measured whole-frame/cunet-lever case (BENCH_NOTES round 4)
    adv = tile_advice(CUNET, _cfg(256, batch=1), (512, 512))
    assert adv is not None
    assert adv[0] in (0, 128), adv


def test_tta_tile256_advises_smaller_on_512():
    adv = tile_advice(SWIN4, _cfg(256, scale=4, tta=True, batch=8),
                      (512, 512))
    assert adv is not None
    assert adv[0] in (0, 128), adv


def test_whole_frame_never_recommended_when_backend_rejects_it():
    """graph-backed .onnx serving hard-rejects --tileSize 0 (upscaler
    load); the advisor must never print a recommendation the next run
    would die on (round-4 review). Same geometry as the measured
    whole-frame-wins case, so without the exclusion tile 0 WOULD win."""
    adv = tile_advice(SWIN2, _cfg(256, batch=1), (512, 512),
                      allow_whole_frame=False)
    assert adv is None or adv[0] != 0, adv
    # sanity: with whole-frame allowed the same setup does recommend 0
    adv_open = tile_advice(SWIN2, _cfg(256, batch=1), (512, 512))
    if adv_open is not None:
        assert adv_open[0] == 0, adv_open


def test_advice_respects_session_tile_divisor():
    """Graph-backed swin serving raises the divisor to window*4 = 32; the
    advisor must not recommend a candidate off that grid (400 % 32 != 0)
    that the next run's load() would die on (round-4 review, second
    pass)."""
    spec32 = dataclasses.replace(SWIN2, tile_divisor=32)
    adv = tile_advice(spec32, _cfg(256, batch=1), (400, 400),
                      allow_whole_frame=False)
    assert adv is None or adv[0] % 32 == 0, adv


def test_advise_tile_silent_for_static_geometry():
    """A fixed-geometry .onnx export accepts exactly ONE tile size; the
    CLI advisor must stay silent rather than recommend a fatal flag."""
    import types

    from waifu2x_tensorrt_tpu import cli as cli_mod

    class _Engine:
        spec = SWIN2
        _render_config = _cfg(256, batch=1)
        _static_geometry = (256, 256)

    msgs = []
    args = types.SimpleNamespace(tile_size=256, model="static-test",
                                 scale=2)
    cli_mod._ADVICE_SEEN.clear()
    cli_mod._advise_config(args, _Engine(), (512, 512),
                           lambda sev, m: msgs.append(m))
    assert msgs == []


def test_whole_frame_never_recommended_for_huge_frames():
    # 4K whole-frame would be a 3840px tile — excluded by the edge cap
    adv = tile_advice(SWIN2, _cfg(640), (2160, 3840))
    assert adv is not None and adv[0] != 0


def test_rect_tta_whole_frame_not_recommended():
    # non-square frame + TTA: whole-frame takes the rect-TTA path that
    # cannot stream; the advisor must not steer users into it
    adv = tile_advice(SWIN4, _cfg(256, scale=4, tta=True, batch=8),
                      (384, 640))
    if adv is not None:
        assert adv[0] != 0


def test_user_optimal_pick_silent_whole_frame():
    cfg0 = dataclasses.replace(_cfg(0, batch=1))
    assert tile_advice(CUNET, cfg0, (512, 512)) is None


@pytest.mark.parametrize("tile", [64, 128, 256, 400, 640])
def test_advice_never_crashes_across_choices(tile):
    for hw in ((64, 64), (512, 512), (720, 1280), (2160, 3840)):
        tile_advice(SWIN4, _cfg(tile, scale=4), hw)


def test_batch_advice_cunet_small_batch_warns():
    """config1's literal batchSize 1 leaves a measured 2.2x on the table
    (BENCH_NOTES round-4 batch-scaling: cunet tiled t256 b4->b16)."""
    from waifu2x_tensorrt_tpu.engine.advice import batch_advice

    for b in (1, 4):
        adv = batch_advice(CUNET, _cfg(256, batch=b))
        assert adv is not None, b
        rec, ratio, reason = adv
        assert rec == 16
        assert ratio >= 2.0
        assert "--batchSize 16" in reason


def test_batch_advice_swin_b4_warns_b8_silent():
    from waifu2x_tensorrt_tpu.engine.advice import batch_advice

    adv = batch_advice(SWIN2, _cfg(256, batch=4))
    assert adv is not None and adv[0] == 16 and adv[1] >= 1.5
    # b8 sits between the measured b4/b16 points: the conservative bound
    # is 1.0, below threshold -> silent
    assert batch_advice(SWIN2, _cfg(256, batch=8)) is None


def test_batch_advice_b16_silent():
    from waifu2x_tensorrt_tpu.engine.advice import batch_advice

    assert batch_advice(CUNET, _cfg(256, batch=16)) is None
    assert batch_advice(SWIN2, _cfg(256, batch=16)) is None


def test_batch_advice_short_workload_silent():
    """4 whole-frame stills can never fill a batch-16 dispatch — silence
    (batch 16 would only pad)."""
    from waifu2x_tensorrt_tpu.engine.advice import batch_advice

    assert batch_advice(CUNET, _cfg(0, batch=4), stream_frames=4,
                        frame_hw=(256, 256)) is None


def test_batch_advice_single_tiled_4k_frame_counts_tiles():
    """ONE tiled 4K frame is ~100+ dispatch items: the short-workload
    guard must count tiles, not frames (round-4 advisor review)."""
    from waifu2x_tensorrt_tpu.engine.advice import batch_advice

    adv = batch_advice(CUNET, _cfg(256, batch=4), stream_frames=1,
                       frame_hw=(2160, 3840))
    assert adv is not None and adv[0] == 16


def test_batch_advice_cunet_b32_warns_swin_b32_silent():
    """cunet whole-frame b32 failed to COMPILE on v5e (BENCH_NOTES
    batch-scaling follow-ups) — warn before the user hits it; swin b32
    measured only 6% slower than b16 (below threshold) — silent."""
    from waifu2x_tensorrt_tpu.engine.advice import batch_advice

    adv = batch_advice(CUNET, _cfg(256, batch=32))
    assert adv is not None and adv[0] == 16
    assert "compile" in adv[2]
    assert batch_advice(SWIN2, _cfg(256, batch=32)) is None


def test_precision_advice_tf32_warns_fp16_silent():
    from waifu2x_tensorrt_tpu.engine.advice import precision_advice

    for spec in (CUNET, SWIN2):
        cfg = dataclasses.replace(_cfg(256), precision=Precision.TF32)
        adv = precision_advice(spec, cfg)
        assert adv is not None, spec.arch
        assert adv[0] == "fp16" and adv[1] >= 1.5
        assert "--precision fp16" in adv[2]
        assert precision_advice(spec, _cfg(256)) is None


def test_cli_config1_literal_gets_batch_and_precision_advice(
        tmp_path, capsys):
    """BASELINE config1 typed verbatim (cunet t256 b1 tf32) leaves a
    measured 6.8x on the table (15.9 vs 108.1 MP/s, BENCH_NOTES); the
    CLI must warn on BOTH the batch and the precision axis — and still
    render with exactly the asked flags (round-4 verdict item 3)."""
    import numpy as np
    from PIL import Image

    from waifu2x_tensorrt_tpu import cli as cli_mod

    rng = np.random.default_rng(2)
    for name in ("a.png", "b.png"):
        Image.fromarray(
            rng.integers(0, 256, (720, 720, 3), np.uint8)).save(
                tmp_path / name)

    cli_mod._ADVICE_SEEN.clear()
    rc = cli_mod.main([
        "--model", "cunet/art", "--scale", "2", "--noise", "1",
        "--batchSize", "1", "--tileSize", "256", "--precision", "tf32",
        "--allow-random-weights",
        "render", "-i", str(tmp_path / "a.png"),
        "-i", str(tmp_path / "b.png"), "-o", str(tmp_path),
    ])
    assert rc == 0
    out_text = capsys.readouterr().out
    warns = [ln for ln in out_text.splitlines() if "[WARN" in ln]
    batch_warns = [ln for ln in warns if "--batchSize 16" in ln]
    prec_warns = [ln for ln in warns if "--precision fp16" in ln]
    assert len(batch_warns) == 1, out_text
    assert len(prec_warns) == 1, out_text
    out = Image.open(tmp_path / "a(cunet_art)(noise1)(scale2).png")
    assert out.size == (1440, 1440)


def test_tile_auto_parses_and_build_rejects(capsys):
    """--tileSize accepts 'auto' (render-only TPU extension); invalid
    values keep a choice-style error; build rejects auto (one concrete
    geometry per engine)."""
    from waifu2x_tensorrt_tpu import cli as cli_mod

    base = ["--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
            "--batchSize", "1"]
    p = cli_mod.build_parser()
    args = p.parse_args(base + ["--tileSize", "auto", "render", "-i", "x"])
    assert args.tile_size == "auto"
    args = p.parse_args(base + ["--tileSize", "256", "render", "-i", "x"])
    assert args.tile_size == 256
    with pytest.raises(SystemExit):
        p.parse_args(base + ["--tileSize", "100", "render", "-i", "x"])
    capsys.readouterr()
    rc = cli_mod.main(base + ["--tileSize", "auto", "build"])
    assert rc == -1
    assert "render subcommand" in capsys.readouterr().err


def test_cli_tile_auto_selects_whole_frame(tmp_path, capsys):
    """End-to-end --tileSize auto: small stills render whole-frame (the
    measured-best class, BENCH_NOTES config1c/TTA rows), the choice is
    announced once, and no tile warning fires afterwards."""
    import numpy as np
    from PIL import Image

    from waifu2x_tensorrt_tpu import cli as cli_mod

    rng = np.random.default_rng(1)
    Image.fromarray(
        rng.integers(0, 256, (96, 96, 3), np.uint8)).save(
            tmp_path / "a.png")

    cli_mod._ADVICE_SEEN.clear()
    rc = cli_mod.main([
        "--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
        "--batchSize", "1", "--tileSize", "auto", "--precision", "tf32",
        "--allow-random-weights",
        "render", "-i", str(tmp_path / "a.png"), "-o", str(tmp_path),
    ])
    assert rc == 0
    out_text = capsys.readouterr().out
    chosen = [ln for ln in out_text.splitlines()
              if "--tileSize auto: using" in ln]
    assert len(chosen) == 1, out_text
    assert "0 (whole frame)" in chosen[0]
    assert not [ln for ln in out_text.splitlines()
                if "[WARN" in ln and "tileSize" in ln], out_text
    out = Image.open(tmp_path / "a(swin_unet_art)(scale2).png")
    assert out.size == (192, 192)


def test_cli_emits_warning_once(tmp_path, capsys):
    """End-to-end: the CLI warns (once) for a modeled-slow tile pick and
    still renders with the asked tile."""
    import numpy as np
    from PIL import Image

    from waifu2x_tensorrt_tpu import cli as cli_mod

    rng = np.random.default_rng(0)
    for name in ("a.png", "b.png"):
        Image.fromarray(
            rng.integers(0, 256, (96, 96, 3), np.uint8)).save(
                tmp_path / name)

    cli_mod._ADVICE_SEEN.clear()
    rc = cli_mod.main([
        "--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
        "--batchSize", "1", "--tileSize", "400", "--precision", "tf32",
        "--allow-random-weights",
        "render", "-i", str(tmp_path / "a.png"),
        "-i", str(tmp_path / "b.png"), "-o", str(tmp_path),
    ])
    assert rc == 0
    out_text = capsys.readouterr().out
    warnings = [ln for ln in out_text.splitlines()
                if "tileSize 400" in ln and "[WARN" in ln]
    # same geometry twice -> exactly ONE advisory
    assert len(warnings) == 1, out_text
    assert "--tileSize" in warnings[0]
    # the render still used the asked tile (output exists and is 2x)
    out = Image.open(tmp_path / "a(swin_unet_art)(scale2).png")
    assert out.size == (192, 192)
