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

Cost model, grounded in v5e measurements rather than a roofline:
  cost(tile) = dispatched input area (tile_count * th * tw, the real
               FLOPs proxy — overlap + edge overhang make it exceed the
               frame area) / efficiency(tile)
  efficiency: 1.0 for 128/256 (measured equal per-FLOP), 0.85 at 400 and
              0.65 at >=512 (large-tile layout penalty, BENCH_NOTES
              "config5"/"strip tiles"), 0.75 at 64 (per-dispatch fixed
              overheads dominate tiny tiles).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

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


def _efficiency(edge: int) -> float:
    if edge >= 512:
        return 0.65
    if edge >= 400:
        return 0.85
    if edge <= 64:
        return 0.75
    return 1.0


def _cost(spec, config, frame_hw, tile: int, candidate: bool = False,
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
    return plan.tile_count * th * tw / _efficiency(max(th, tw))


# Measured v5e batch-scaling, streamed throughput relative to batch 16
# (BENCH_NOTES "Round 4 (continued session): cunet whole-frame batch
# scaling" — aligned-iters methodology). cunet points are the TILED
# t256 measurements (28.1 / 51.0 / 62.6 MP/s at b4/b8/b16), the more
# conservative of the two measured series (whole-frame scales harder:
# 39.8/78.1/103.9). swin has measured points at b4 (287.4, BENCH_NOTES
# config2) and b16 (475.3 headline); b8 is unmeasured, so swin stays
# silent there. Below the smallest measured batch the efficiency is
# floored at that point — gains only shrink with batch on every
# measured series, so the advisor UNDER-states the win for b1/b2.
_BATCH_EFF = {
    "cunet": {4: 0.45, 8: 0.81, 16: 1.0},
    "swin_unet": {4: 0.60, 16: 1.0},
}
# Never recommend beyond 16: cunet whole-frame b32 fails to compile
# (remote tpu_compile_helper exit 1 — 2.3 GB full-res activations) and
# swin b32 measured SLOWER than b16 (446.0 vs 475.3, BENCH_NOTES
# "tile 256, batch 32").
_BATCH_CAP = 16


def batch_advice(spec, config, stream_frames: Optional[int] = None
                 ) -> Optional[tuple[int, float, str]]:
    """(recommended_batch, measured_speedup_lower_bound, reason) when the
    configured batchSize is measured >=20% slower than batch 16 for this
    model family; None when the pick is (near-)optimal or unmeasured.

    Warn-only, like ``tile_advice``: the reference exposes batchSize with
    no feedback (src/main.cpp:65-69, where it only bounds the TensorRT
    profile); on TPU the choice moves cunet throughput 2.2-2.6x
    (BENCH_NOTES round 4). ``stream_frames``: total frames the session
    will stream (files x frames); when known and smaller than the
    recommendation, batch 16 would only pad the dispatch, so the advisor
    stays silent. TileStream crosses frame AND file boundaries, so any
    longer workload genuinely fills the bigger batch."""
    eff_points = _BATCH_EFF.get(spec.arch)
    b = config.batch_size
    if eff_points is None or b >= _BATCH_CAP:
        return None
    if stream_frames is not None and stream_frames < _BATCH_CAP:
        return None
    # efficiency is monotone increasing in batch on every measured
    # series, so eff(b) <= eff(p) for the smallest measured p >= b and
    # 1/eff(p) LOWER-bounds the real speedup (conservative: swin b8,
    # between the measured b4 and b16 points, bounds at 1.0 -> silent).
    above = [p for p in sorted(eff_points) if p >= b]
    eff = eff_points[above[0]]
    ratio = 1.0 / eff
    if ratio < _THRESHOLD:
        return None
    reason = (
        f"batchSize {b} streams ~{ratio:.1f}x slower than batchSize "
        f"{_BATCH_CAP} for {spec.arch} on TPU (measured on v5e — see "
        f"BENCH_NOTES.md batch-scaling tables); consider --batchSize "
        f"{_BATCH_CAP}"
    )
    return _BATCH_CAP, ratio, reason


def tile_advice(spec, config, frame_hw,
                allow_whole_frame: bool = True
                ) -> Optional[tuple[int, float, str]]:
    """(recommended_tile, modeled_speedup, reason) when the configured
    tile size is modeled >=20% slower than the best CLI choice for this
    frame size; None when the user's pick is (near-)optimal."""
    user_tile = config.height
    user_cost = _cost(spec, config, frame_hw, user_tile)
    if user_cost is None:
        return None
    best_tile, best_cost = user_tile, user_cost
    for cand in _CANDIDATES:
        if cand == user_tile:
            continue
        c = _cost(spec, config, frame_hw, cand, candidate=True,
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
        f"v5e — see BENCH_NOTES.md); consider --tileSize {best_tile}"
    )
    return best_tile, ratio, reason
