"""Tile-size guidance (round-3 verdict item 8).

The reference lets the user pick any tileSize from {64,128,256,400,640}
with no feedback (src/main.cpp:62-64); on TPU the choice moves throughput
by >1.5x for large frames (BENCH_NOTES round 3/4: 4K at tile 640 ran
96.4 MP/s vs 165.8 at tile 256 streamed; 512px stills with 8-way TTA ran
1.6x faster at tile 128 than 256; small frames run fastest whole-frame).
``tile_advice`` models the planned work for the user's tile against the
other CLI choices and returns a recommendation when the user's pick is
materially slower, so the CLI can warn without changing behavior
(flag-parity: the render still uses exactly what was asked).

Cost model, grounded in per-device measurements rather than a roofline:
  cost(tile) = dispatched input area (tile_count * th * tw, the real
               FLOPs proxy — overlap + edge overhang make it exceed the
               frame area) / efficiency(tile)
  efficiency comes from the device-kind CALIBRATION (engine/
  calibration.py, round-4 verdict item 3): the recorded v5e campaign for
  the chips it was measured on, a measured on-device calibration file
  otherwise — and when NEITHER applies, every advisor returns None
  (silence beats a miscalibrated threshold). The v5e numbers: 1.0 for
  128/256 (measured equal per-FLOP), 0.85 at 400 and 0.65 at >=512
  (large-tile layout penalty, BENCH_NOTES "config5"/"strip tiles"),
  0.75 at 64 (per-dispatch fixed overheads dominate tiny tiles).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from waifu2x_tensorrt_tpu.engine.calibration import Calibration, resolve
from waifu2x_tensorrt_tpu.engine.renderer import resolve_tile_plan

# CLI tileSize choices (one source of truth: engine/config.py, which
# cli.py also exposes as TILE_CHOICES) — includes 0 = whole-frame.
from waifu2x_tensorrt_tpu.engine.config import TILE_CHOICES as _CANDIDATES
# Warn only for clear wins: modeled >=20% improvement (the measured
# cunet whole-frame and 4K-t640 gaps model at 1.28x/1.45x; the headline
# 720p/1080p t256 picks model within 11% of best and stay silent).
_THRESHOLD = 1.20
# Whole-frame tiles beyond this edge hit the same large-tile penalty and
# untested VMEM territory; never recommend them.
_MAX_WHOLE_FRAME_EDGE = 768


def _default_calibration(config,
                         models_dir=None) -> Optional[Calibration]:
    """Calibration for the session's device kind; None = advisors mute.
    Resolution failure (e.g. no backend) must never crash a render."""
    try:
        from waifu2x_tensorrt_tpu.utils.hashing import device_kind

        return resolve(device_kind(config.device_id), models_dir)
    except Exception:
        return None


def _cost(spec, config, frame_hw, tile: int, calib: Calibration,
          candidate: bool = False,
          allow_whole_frame: bool = True) -> Optional[float]:
    """Modeled dispatch cost; None = cannot model / must not recommend.

    ``candidate`` applies the recommendation-only exclusions (huge
    whole-frame tiles, rect-TTA whole-frame, backends that reject tile 0).
    The USER'S own pick is always costed — excluding it would silence the
    advisor exactly where the pick is worst (e.g. --tileSize 0 on a 1080p
    frame)."""
    if (candidate and tile and spec.tile_divisor
            and tile % spec.tile_divisor):
        # load() rejects tiles off the session's divisor grid — which is
        # RAISED to window*4 for graph-backed swin serving, where e.g.
        # 400 % 32 != 0 (round-4 review: never advise a fatal flag)
        return None
    cfg = dataclasses.replace(config, height=tile, width=tile)
    try:
        plan = resolve_tile_plan(spec, cfg, frame_hw)
    except Exception:
        return None  # geometry invalid for this model (divisor, offset)
    th, tw = plan.input_tile
    if tile == 0 and candidate:
        if not allow_whole_frame:
            # graph-backed .onnx serving hard-rejects --tileSize 0
            # (engine/upscaler.py load); never advise a fatal flag
            return None
        if max(th, tw) > _MAX_WHOLE_FRAME_EDGE:
            return None
        if config.tta and th != tw:
            # rect-TTA whole-frame renders two tile orientations and
            # cannot ride the cross-frame stream; don't recommend it
            return None
    return plan.tile_count * th * tw / calib.tile_eff(max(th, tw))


def batch_advice(spec, config, stream_frames: Optional[int] = None,
                 frame_hw: Optional[tuple[int, int]] = None,
                 calib: Optional[Calibration] = None,
                 models_dir=None) -> Optional[tuple[int, float, str]]:
    """(recommended_batch, measured_speedup_lower_bound, reason) when the
    configured batchSize is measured >=20% slower than batch 16 for this
    model family; None when the pick is (near-)optimal or unmeasured.

    Warn-only, like ``tile_advice``: the reference exposes batchSize with
    no feedback (src/main.cpp:65-69, where it only bounds the TensorRT
    profile); on TPU the choice moves cunet throughput 2.2-2.6x
    (BENCH_NOTES round 4). ``stream_frames``: total frames the session
    will stream (files x frames); when known and the total DISPATCH
    count (frames x tiles-per-frame x TTA steps, computed from
    ``frame_hw`` when given) is smaller than the recommendation, batch
    16 would only pad the dispatch, so the advisor stays silent.
    TileStream crosses frame AND file boundaries, so any longer
    workload genuinely fills the bigger batch.

    The batch-efficiency points, the cap, and the known compile-failure
    batches all come from the device-kind calibration (factory v5e table
    or an on-device measurement; None = stay silent)."""
    if calib is None:
        calib = _default_calibration(config, models_dir)
    if calib is None:
        return None
    eff_points = calib.batch_eff.get(spec.arch)
    cap = calib.batch_cap
    b = config.batch_size
    if eff_points is None:
        return None
    if b > cap:
        # Above the cap the measured story differs by family: swin b32
        # ran 446.0 vs 475.3 at b16 (below the 1.2x warn threshold —
        # silent), but cunet whole-frame b32 FAILS TO COMPILE on v5e
        # (2.3 GB full-res activations, BENCH_NOTES batch-scaling
        # follow-ups) — worth a warning before the user hits it.
        fail_at = calib.batch_compile_fail.get(spec.arch)
        if fail_at is not None and b >= fail_at:
            reason = (
                f"batchSize {b}: {spec.arch} batch {fail_at} failed to "
                f"compile on {calib.device_kind} (see BENCH_NOTES.md "
                f"batch-scaling follow-ups) and batch {cap} is the "
                f"measured-fastest point; consider --batchSize {cap}"
            )
            return cap, 1.0, reason
        return None
    if b == cap:
        return None
    if stream_frames is not None:
        dispatches = stream_frames
        if frame_hw is not None:
            # One frame is tile_count dispatch items (x8 with TTA) —
            # a single tiled 4K frame fills batch 16 many times over,
            # so the guard must count tiles, not frames (round-4
            # advisor review).
            try:
                plan = resolve_tile_plan(spec, config, frame_hw)
                steps = 8 if config.tta else 1
                dispatches = stream_frames * plan.tile_count * steps
            except Exception:
                pass
        if dispatches < cap:
            return None
    # efficiency is monotone increasing in batch on every measured
    # series, so eff(b) <= eff(p) for the smallest measured p >= b and
    # 1/eff(p) LOWER-bounds the real speedup (conservative: swin b8,
    # between the measured b4 and b16 points, bounds at 1.0 -> silent).
    above = [p for p in sorted(eff_points) if p >= b]
    if not above:
        return None
    eff = eff_points[above[0]]
    ratio = 1.0 / eff
    if ratio < _THRESHOLD:
        return None
    reason = (
        f"batchSize {b} streams ~{ratio:.1f}x slower than batchSize "
        f"{cap} for {spec.arch} on TPU (measured on {calib.device_kind} "
        f"— see BENCH_NOTES.md batch-scaling tables); consider "
        f"--batchSize {cap}"
    )
    return cap, ratio, reason


def precision_advice(spec, config, calib: Optional[Calibration] = None,
                     models_dir=None) -> Optional[tuple[str, float, str]]:
    """(recommended_precision_flag, measured_speedup_lower_bound, reason)
    when ``--precision tf32`` (the fp32 compute path) is measured >=20%
    slower than bf16 for this model family; None otherwise.

    Warn-only: fp32 is a legitimate pick when export-exact math matters
    (the reference's TF32 flag, src/main.cpp:76-84), so the wording
    leaves the trade-off to the user. Accuracy context: the measured
    bf16 deviation from fp32 truth is within the dense-bf16 envelope
    (BENCH_NOTES fused-block accuracy triage)."""
    from waifu2x_tensorrt_tpu.engine.config import Precision

    if config.precision is not Precision.TF32:
        return None
    if calib is None:
        calib = _default_calibration(config, models_dir)
    if calib is None:
        return None
    ratio = calib.precision_speedup.get(spec.arch)
    if ratio is None or ratio < _THRESHOLD:
        return None
    reason = (
        f"--precision tf32 (fp32 compute) streams ~{ratio:.1f}x slower "
        f"than --precision fp16 (bf16 compute) for {spec.arch} on TPU "
        f"(measured on {calib.device_kind} — see BENCH_NOTES.md); if "
        f"bit-exact fp32 output is not required, consider "
        f"--precision fp16"
    )
    return "fp16", ratio, reason


def tile_advice(spec, config, frame_hw,
                allow_whole_frame: bool = True,
                calib: Optional[Calibration] = None,
                models_dir=None) -> Optional[tuple[int, float, str]]:
    """(recommended_tile, modeled_speedup, reason) when the configured
    tile size is modeled >=20% slower than the best CLI choice for this
    frame size; None when the user's pick is (near-)optimal."""
    if calib is None:
        calib = _default_calibration(config, models_dir)
    if calib is None:
        return None
    user_tile = config.height
    user_cost = _cost(spec, config, frame_hw, user_tile, calib)
    if user_cost is None:
        return None
    best_tile, best_cost = user_tile, user_cost
    for cand in _CANDIDATES:
        if cand == user_tile:
            continue
        c = _cost(spec, config, frame_hw, cand, calib, candidate=True,
                  allow_whole_frame=allow_whole_frame)
        if c is not None and c < best_cost:
            best_tile, best_cost = cand, c
    ratio = user_cost / best_cost
    if best_tile == user_tile or ratio < _THRESHOLD:
        return None
    label = "0 (whole frame)" if best_tile == 0 else str(best_tile)
    reason = (
        f"tileSize {user_tile} dispatches ~{ratio:.1f}x the work of "
        f"tileSize {label} for {frame_hw[1]}x{frame_hw[0]} frames "
        f"(tile overlap/overhang + large-tile efficiency, measured on "
        f"{calib.device_kind} — see BENCH_NOTES.md); consider "
        f"--tileSize {best_tile}"
    )
    return best_tile, ratio, reason
