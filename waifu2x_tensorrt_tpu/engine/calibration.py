"""Per-device-kind advisor calibration (round-4 verdict item 3).

The advisor's cost models were measured on ONE chip (v5e through the
axon tunnel, BENCH_NOTES rounds 3-4). Hardcoding those constants makes
the >=20% warning threshold silently miscalibrated on any other device
kind. This module turns them into *recorded calibrations*:

- ``FACTORY`` is the v5e measurement campaign, recorded as data with its
  device kind and provenance — the same numbers the advisor used before,
  now gated: they only apply where ``device_kind`` matches the chip they
  were measured on (plus the CPU backend, which is a dev/test
  environment advising about the TPU deployment, not a perf target).
- ``measure_calibration`` re-runs the measurement campaign on the LIVE
  device (tile-efficiency sweep, batch-scaling sweep per model family,
  fp32-vs-bf16 speedup) and ``save_calibration`` records it beside the
  engine cache (``<models_dir>/.jax_cache/advice_calibration.json``).
  ``python -m waifu2x_tensorrt_tpu.engine.calibration`` drives it.
- ``resolve`` is the advisor's lookup: measured file for this exact
  device kind beats factory; unknown device kinds get ``None`` and the
  advisor stays SILENT rather than miscalibrated.

The reference has no analogue — TensorRT's builder auto-tunes tactics
per device at engine build time (src/tensorrt/img2img_build.cpp:54-173)
but gives the user no flag guidance at all (src/main.cpp:56-84).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

CALIBRATION_FILE = "advice_calibration.json"
FORMAT_VERSION = 1


@dataclasses.dataclass(frozen=True)
class Calibration:
    """One device kind's measured advisor constants.

    ``tile_efficiency`` maps measured tile EDGES to per-dispatched-area
    efficiency relative to the best edge (1.0 = best). Lookups take the
    nearest measured edge (ties toward the larger edge), which
    reproduces the v5e piecewise table at every CLI tile choice and
    generalizes to arbitrary whole-frame edges.

    ``batch_eff`` maps arch -> {batch: streamed throughput relative to
    the cap batch}. ``batch_compile_fail`` maps arch -> smallest batch
    measured to FAIL compilation (warn before the user hits it).

    ``precision_speedup`` maps arch -> measured bf16/fp32 streamed
    throughput ratio (lower bound).
    """

    device_kind: str
    source: str
    tile_efficiency: dict[int, float]
    batch_eff: dict[str, dict[int, float]]
    batch_cap: int
    batch_compile_fail: dict[str, int]
    precision_speedup: dict[str, float]

    def tile_eff(self, edge: int) -> float:
        if not self.tile_efficiency:
            return 1.0
        best = min(self.tile_efficiency,
                   key=lambda e: (abs(e - edge), -e))
        return self.tile_efficiency[best]

    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        # JSON object keys are strings; keep ints on the way back in
        d["tile_efficiency"] = {str(k): v
                                for k, v in self.tile_efficiency.items()}
        d["batch_eff"] = {a: {str(b): v for b, v in pts.items()}
                          for a, pts in self.batch_eff.items()}
        return d

    @classmethod
    def from_json(cls, d: dict) -> "Calibration":
        return cls(
            device_kind=d["device_kind"],
            source=d["source"],
            tile_efficiency={int(k): float(v)
                             for k, v in d["tile_efficiency"].items()},
            batch_eff={a: {int(b): float(v) for b, v in pts.items()}
                       for a, pts in d["batch_eff"].items()},
            batch_cap=int(d["batch_cap"]),
            batch_compile_fail={a: int(v) for a, v in
                                d.get("batch_compile_fail", {}).items()},
            precision_speedup={a: float(v) for a, v in
                               d["precision_speedup"].items()},
        )


# The v5e measurement campaign, recorded (BENCH_NOTES rounds 3-4):
# - tile efficiency: 4K t640 96.4 vs t256 165.8 MP/s streamed; 400-class
#   between; t64 dominated by per-dispatch overheads ("config5"/"strip
#   tiles" sections).
# - batch scaling: cunet tiled t256 28.1/51.0/62.6 MP/s at b4/8/16 (the
#   conservative series; whole-frame scales harder: 39.8/78.1/103.9);
#   swin 287.4 at b4 (config2) vs 475.3 at b16 (headline); swin b32
#   measured SLOWER (446.0); cunet whole-frame b32 FAILED to compile
#   (2.3 GB full-res activations).
# - precision: cunet 15.9 -> 25.6 MP/s fp32->bf16 at the config1
#   geometry; swin graph-backed 157.0 -> 242.7 (conservative endpoints).
FACTORY = Calibration(
    device_kind="TPU v5 lite",
    source="factory: v5e measurements, BENCH_NOTES.md rounds 3-4",
    tile_efficiency={64: 0.75, 128: 1.0, 256: 1.0, 400: 0.85,
                     512: 0.65, 640: 0.65},
    batch_eff={
        "cunet": {4: 0.45, 8: 0.81, 16: 1.0},
        "swin_unet": {4: 0.60, 16: 1.0},
    },
    batch_cap=16,
    batch_compile_fail={"cunet": 32},
    precision_speedup={"cunet": 1.6, "swin_unet": 1.5},
)

# Device kinds the factory table is trusted on: the chip it was measured
# on, and the CPU backend (a dev/test stand-in whose advice describes
# the TPU deployment — CPU wall-clock is not a serving target).
_FACTORY_KINDS = ("TPU v5 lite", "cpu")


def calibration_path(models_dir: str | Path) -> Path:
    from waifu2x_tensorrt_tpu.engine.cache import compilation_cache_dir

    return compilation_cache_dir(models_dir) / CALIBRATION_FILE


def load_calibrations(path: str | Path) -> dict[str, Calibration]:
    """{device_kind: Calibration} from a calibration file; {} when the
    file is absent or unreadable (the advisor then falls back to factory
    gating — a corrupt calibration must never crash a render)."""
    try:
        with open(path) as f:
            j = json.load(f)
        return {k: Calibration.from_json(v)
                for k, v in j.get("calibrations", {}).items()}
    except (OSError, ValueError, KeyError, TypeError):
        return {}


def save_calibration(calib: Calibration, models_dir: str | Path) -> Path:
    """Merge one device kind's measurement into the calibration file."""
    path = calibration_path(models_dir)
    path.parent.mkdir(parents=True, exist_ok=True)
    existing = load_calibrations(path)
    existing[calib.device_kind] = calib
    payload = {
        "format_version": FORMAT_VERSION,
        "calibrations": {k: c.to_json() for k, c in existing.items()},
    }
    tmp = path.with_suffix(".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
    tmp.replace(path)
    return path


def resolve(device_kind: str,
            models_dir: Optional[str | Path] = None) -> Optional[Calibration]:
    """The advisor's calibration for this device kind, or None (= stay
    silent; an uncalibrated warning threshold is worse than no warning).

    A measured calibration for the exact device kind wins; the factory
    v5e table applies only to the kinds it was measured on/stands in for.
    """
    if models_dir is not None:
        measured = load_calibrations(calibration_path(models_dir))
        if device_kind in measured:
            return measured[device_kind]
    for prefix in _FACTORY_KINDS:
        if device_kind.startswith(prefix):
            return FACTORY
    return None


# ---------------------------------------------------------------------------
# Self-calibration: re-run the measurement campaign on the live device.
# ---------------------------------------------------------------------------


def _measure_stream_rate(family, scale, noise, config, frame_hw,
                         iters, rounds) -> Optional[float]:
    """Streamed frames/s through the production TileStream at this
    config, or None when the geometry fails to compile/run (recorded —
    that IS a calibration datum, e.g. cunet b32 on v5e)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from waifu2x_tensorrt_tpu.engine.renderer import (
        ChunkedPipeline,
        TileStream,
    )
    from waifu2x_tensorrt_tpu.models.registry import (
        create_model,
        init_params_host,
    )

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    kw = {}
    if family.startswith("swin"):
        kw["shuffle_via_deconv"] = on_tpu
    try:
        module, spec = create_model(family, scale, noise,
                                    dtype=config.precision.dtype,
                                    use_pallas=on_tpu,
                                    fused_block=on_tpu, **kw)
        params = jax.device_put(init_params_host(module, tile=32))
        pl = ChunkedPipeline(module, spec, config)
        stream = TileStream(pl, params, frame_hw)
        rng = np.random.default_rng(0)
        frame = jax.device_put(jnp.asarray(
            rng.integers(0, 256, (*frame_hw, 3), np.uint8)))
        for _ in range(max(iters // 2, config.batch_size)):
            stream.submit(frame)
        best = float("inf")
        for _ in range(rounds):
            last = None
            t0 = time.perf_counter()
            for _ in range(iters):
                outs = stream.submit(frame)
                if outs:
                    last = outs[-1]
            if last is not None:
                float(jnp.sum(last[::512, ::512].astype(jnp.int32)))
            best = min(best, (time.perf_counter() - t0) / iters)
        return 1.0 / best
    except Exception:
        return None


def measure_calibration(
    device_kind: str,
    tiles: tuple[int, ...] = (64, 128, 256, 400, 640),
    batches: tuple[int, ...] = (1, 4, 8, 16, 32),
    families: tuple[str, ...] = ("swin_unet/art", "cunet/art"),
    frame_hw: tuple[int, int] = (720, 1280),
    iters: int = 8,
    rounds: int = 2,
    log=print,
) -> Calibration:
    """Measure this device's advisor constants with the production
    pipeline (ChunkedPipeline + TileStream — the same path the render
    hot loop uses, so the measured ratios transfer).

    - tile efficiency: streamed rate per dispatched input area at each
      tile edge (swin family, batch 16), normalized to the best edge.
    - batch scaling per family: streamed rate at tile 256 per batch,
      relative to the fastest measured batch <= batch_cap. A batch that
      fails to compile is recorded in ``batch_compile_fail``.
    - precision: fp32 vs bf16 streamed rate at tile 256 / batch 16.

    Grids are parameters so tests (CPU, tiny shapes) and impatient users
    can shrink the sweep; the defaults mirror the factory campaign.
    """
    import dataclasses as _dc

    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.renderer import resolve_tile_plan
    from waifu2x_tensorrt_tpu.models.registry import get_spec

    def cfg(tile, batch, precision=Precision.FP16, scale=2):
        return RenderConfig(precision=precision, batch_size=batch,
                            height=tile, width=tile, scaling=scale,
                            overlap=(1 / 16, 1 / 16), tta=False)

    swin = families[0]
    # --- tile efficiency (rate per dispatched area, normalized) ---
    tile_eff: dict[int, float] = {}
    spec_swin = get_spec(swin, 2, -1)
    for t in tiles:
        c = cfg(t, 16)
        try:
            plan = resolve_tile_plan(spec_swin, c, frame_hw)
        except Exception:
            continue
        fps = _measure_stream_rate(swin, 2, -1, c, frame_hw, iters, rounds)
        if fps is None:
            log(f"[calibrate] tile {t}: failed to run — skipped")
            continue
        th, tw = plan.input_tile
        area = plan.tile_count * th * tw
        tile_eff[max(th, tw)] = fps * area
        log(f"[calibrate] tile {t}: {fps:.3f} fps x {area} px")
    if tile_eff:
        top = max(tile_eff.values())
        tile_eff = {k: round(v / top, 3) for k, v in tile_eff.items()}

    # --- batch scaling + compile failures, per family ---
    batch_eff: dict[str, dict[int, float]] = {}
    batch_fail: dict[str, int] = {}
    cap = max(b for b in batches if b <= 16) if batches else 16
    for fam in families:
        noise = -1 if fam.startswith("swin") else 1
        arch = get_spec(fam, 2, noise).arch
        pts: dict[int, float] = {}
        for b in batches:
            fps = _measure_stream_rate(fam, 2, noise, cfg(256, b),
                                       frame_hw, iters, rounds)
            if fps is None:
                if b > cap and arch not in batch_fail:
                    batch_fail[arch] = b
                log(f"[calibrate] {arch} b{b}: failed — recorded")
                continue
            pts[b] = fps
            log(f"[calibrate] {arch} b{b}: {fps:.3f} fps")
        capped = {b: v for b, v in pts.items() if b <= cap}
        if capped:
            top = max(capped.values())
            batch_eff[arch] = {b: round(v / top, 3)
                               for b, v in pts.items() if b <= cap}

    # --- precision speedup (bf16 over fp32), per family ---
    prec: dict[str, float] = {}
    for fam in families:
        noise = -1 if fam.startswith("swin") else 1
        arch = get_spec(fam, 2, noise).arch
        f_bf16 = _measure_stream_rate(fam, 2, noise, cfg(256, cap),
                                      frame_hw, iters, rounds)
        f_fp32 = _measure_stream_rate(
            fam, 2, noise, cfg(256, cap, precision=Precision.TF32),
            frame_hw, iters, rounds)
        if f_bf16 and f_fp32:
            prec[arch] = round(f_bf16 / f_fp32, 2)
            log(f"[calibrate] {arch} bf16/fp32: {prec[arch]:.2f}x")

    return Calibration(
        device_kind=device_kind,
        source="measured: waifu2x_tensorrt_tpu.engine.calibration",
        tile_efficiency=tile_eff,
        batch_eff=batch_eff,
        batch_cap=cap,
        batch_compile_fail=batch_fail,
        precision_speedup=prec,
    )


def main(argv=None) -> int:
    import argparse

    from waifu2x_tensorrt_tpu.utils.hashing import device_kind as dk

    p = argparse.ArgumentParser(
        description="Measure this device's advisor calibration and record "
                    "it beside the engine cache.")
    p.add_argument("--models-dir", default="models")
    p.add_argument("--tiles", default="64,128,256,400,640")
    p.add_argument("--batches", default="1,4,8,16,32")
    p.add_argument("--frame", default="720x1280",
                   help="calibration frame size HxW")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--rounds", type=int, default=2)
    args = p.parse_args(argv)

    kind = dk(0)
    h, w = (int(x) for x in args.frame.split("x"))
    calib = measure_calibration(
        kind,
        tiles=tuple(int(t) for t in args.tiles.split(",") if t),
        batches=tuple(int(b) for b in args.batches.split(",") if b),
        frame_hw=(h, w),
        iters=args.iters,
        rounds=args.rounds,
    )
    path = save_calibration(calib, args.models_dir)
    print(f"[calibrate] recorded {kind!r} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
