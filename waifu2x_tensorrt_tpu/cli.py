"""Command-line interface: flag-for-flag parity with the reference CLI.

Reference: src/main.cpp:17-154 (global options + ``render``/``build``
subcommands, identical choices/defaults/validation), :156-209 (file
discovery, model path + output suffix conventions), :211-294 (render and
build orchestration loops).

Extensions beyond the reference (documented, not replacing anything):
  --dp N        shard the tile batch over N chips (0 = all); reference
                ``--device`` picks a single GPU (src/main.cpp:70-74).
  --models-dir  weight-store root (reference hardcodes ``models/``).

Known reference behaviors intentionally fixed here (SURVEY.md §5):
  progress logs are 1-based (ref logs fileIndex/frameIndex before
  increment, src/main.cpp:186-193).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

from waifu2x_tensorrt_tpu.engine.config import (
    TILE_CHOICES,
    BuildConfig,
    Precision,
    RenderConfig,
)
from waifu2x_tensorrt_tpu.io.discover import DEFAULT_EXTENSIONS, find_files_by_extension
from waifu2x_tensorrt_tpu.io.video import VideoCapture, VideoWriter
from waifu2x_tensorrt_tpu.models.registry import validate as validate_model
from waifu2x_tensorrt_tpu.utils.logging import (
    Severity,
    console_message_callback,
)

# TILE_CHOICES (imported above): reference choices (src/main.cpp:62-64)
# + 0 = auto whole-frame (TPU extension); canonical tuple lives in
# engine/config.py, which engine/advice.py models as the candidate set.
BLEND_CHOICES = (1 / 8, 1 / 16, 1 / 32, 0.0)  # src/main.cpp:108-115
MODEL_CHOICES = (
    "cunet/art",
    "swin_unet/art",
    "swin_unet/art_scan",
    "swin_unet/photo",
)


def _tile_size_arg(value: str):
    """--tileSize accepts the reference's numeric choices
    (src/main.cpp:62-64) plus two TPU extensions: 0 (whole-frame) and
    'auto' (advisor-selected; engine/advice.py)."""
    if value == "auto":
        return "auto"
    try:
        tile = int(value)
    except ValueError:
        tile = None
    if tile not in TILE_CHOICES:
        choices = ", ".join(str(t) for t in TILE_CHOICES)
        raise argparse.ArgumentTypeError(
            f"invalid choice: {value!r} (choose from {choices}, auto)")
    return tile


def _precision_arg(value: str) -> str:
    """--precision accepts the names and the reference's numeric enum
    values (CLI11 ``{fp16->1,tf32->0} OR {1,0}``, src/main.cpp:76-84), so
    scripts written for the reference binary run unchanged."""
    mapped = {"fp16": "fp16", "tf32": "tf32", "1": "fp16", "0": "tf32"}
    if value not in mapped:
        raise argparse.ArgumentTypeError(
            f"invalid choice: {value!r} (choose from fp16, tf32, 1, 0)")
    return mapped[value]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="waifu2x-tpu",
        description="TPU-native waifu2x image/video upscaler",
    )
    p.add_argument("--model", required=True, choices=MODEL_CHOICES,
                   help="Set the model to use")
    p.add_argument("--scale", required=True, type=int, choices=(1, 2, 4),
                   help="Set the scale factor")
    p.add_argument("--noise", required=True, type=int,
                   choices=(-1, 0, 1, 2, 3), help="Set the noise level")
    p.add_argument("--batchSize", dest="batch_size", required=True, type=int,
                   help="Set the batch size")
    p.add_argument("--tileSize", dest="tile_size", required=True,
                   type=_tile_size_arg, metavar="{%s,auto}" % ",".join(
                       str(t) for t in TILE_CHOICES),
                   help="Set the tile size (0 = whole-frame, no tiling; "
                        "auto = pick the modeled-best size for the first "
                        "input's frame size — render only)")
    p.add_argument("--device", dest="device", type=int, default=0,
                   help="Set the device ID")
    p.add_argument("--precision", type=_precision_arg,
                   metavar="{fp16,tf32,1,0}", default="fp16",
                   help="Set the precision (fp16=1, tf32=0 — the numeric "
                        "forms match the reference's CLI11 enum mapping, "
                        "src/main.cpp:76-84)")
    p.add_argument("--models-dir", default="models",
                   help="Model weight directory (default: models)")
    p.add_argument("--dp", type=int, default=1,
                   help="Data-parallel chips for the tile batch (0 = all)")
    p.add_argument("--multihost", action="store_true",
                   help="Shard input files across JAX processes "
                        "(round-robin by process_index; run one process "
                        "per host with jax.distributed initialized)")
    p.add_argument("--graph-exact", action="store_true",
                   dest="graph_exact",
                   help="When serving a bare .onnx artifact, always run "
                        "the export's own parsed graph (export-exact "
                        "math) instead of the verified flax+Pallas "
                        "optimized path (~2x faster)")
    p.add_argument("--allow-random-weights", action="store_true",
                   dest="allow_random_weights",
                   help="Render with randomly initialized weights when no "
                        "converted .npz exists (test-pattern output; "
                        "missing weights are otherwise a hard failure, "
                        "matching the reference)")

    sub = p.add_subparsers(dest="command", required=True)

    render = sub.add_parser("render", help="Render image(s)/video(s)")
    render.add_argument("-i", "--input", dest="inputs", nargs="+",
                        action="extend", required=True,
                        help="Set the input paths (repeatable; repeated "
                             "flags append, matching CLI11 vector options)")
    render.add_argument("--recursive", action="store_true",
                        help="Search for input files recursively")
    render.add_argument("-o", "--output", dest="output", default=None,
                        help="Set the output directory")
    render.add_argument("--nosuffix", action="store_true",
                        help="Set to not have the suffix added to the filenames")
    render.add_argument("--blend", type=float, default=1 / 16,
                        help="Set the percentage of overlap between two tiles to blend")
    render.add_argument("--tta", action="store_true",
                        help="Enable test-time augmentation")
    render.add_argument("--codec", default="libx264",
                        help="Set the codec (video only)")
    render.add_argument("--pix_fmt", default="yuv420p",
                        help="Set the pixel format (video only)")
    render.add_argument("--crf", type=int, default=23,
                        help="Set the constant rate factor (video only)")
    render.add_argument("--resume", action="store_true",
                        help="Skip inputs whose output file already exists")
    render.add_argument("--continue-on-error", action="store_true",
                        dest="continue_on_error",
                        help="Keep rendering remaining files after a failure "
                             "(reference exits on first error)")
    render.add_argument("--profile", default=None, metavar="DIR",
                        help="Capture a jax.profiler trace into DIR")
    render.add_argument("--metrics-json", default=None, metavar="PATH",
                        dest="metrics_json",
                        help="Write a JSON render report: per-file wall "
                             "seconds and exit codes, run totals, and the "
                             "resolved configuration (extension — the "
                             "reference exports no metrics, SURVEY.md §5)")
    render.add_argument("--bucket", type=int, default=0, metavar="N",
                        help="Pad frames up to multiples of N before "
                             "rendering (bounds recompilations for "
                             "mixed-size inputs; blend near padded edges "
                             "uses replicated content)")
    render.add_argument("--segment-frames", type=int, default=0, metavar="N",
                        dest="segment_frames",
                        help="Render videos in N-frame segments (part files "
                             "stitched losslessly at the end). Enables "
                             "frame-index --resume for interrupted video "
                             "renders, and segment-level work sharding "
                             "under --multihost")
    render.add_argument("--alpha", choices=("ignore", "auto"),
                        default="ignore",
                        help="Transparent still images (extension — the "
                             "reference drops alpha, capture.cpp:55 TODO): "
                             "'auto' upscales the alpha channel through the "
                             "same model and writes RGBA PNG, with opaque "
                             "colors bled under transparent edges first to "
                             "prevent halos; 'ignore' keeps reference "
                             "behavior (RGB only)")

    sub.add_parser("build", help="Build model")
    return p


def _validate(args) -> None:
    # semantic validation, src/main.cpp:142-145
    validate_model(args.model, args.scale, args.noise)
    if args.batch_size <= 0:
        raise ValueError("batchSize must be positive")
    if args.dp < 0:
        # a negative value would silently slice devices[:-n] — the wrong
        # device count with no error (0 means "all devices")
        raise ValueError("--dp must be >= 0 (0 = all devices)")
    if args.tile_size == "auto" and args.command == "build":
        raise ValueError(
            "--tileSize auto requires the render subcommand (build "
            "compiles one concrete geometry; pass a numeric tile size)")
    if args.command == "render":
        # --tileSize 0 + --tta is supported: non-square frames render
        # through the rect-TTA path (engine/renderer.py
        # _make_rect_tta_chunked_fns — two tile orientations per frame;
        # streaming degrades to per-frame dispatch there).
        if not any(abs(args.blend - c) < 1e-12 for c in BLEND_CHOICES):
            raise ValueError(
                f"--blend must be one of 1/8, 1/16, 1/32, 0; got {args.blend}"
            )
        if not (0 <= args.crf <= 51):
            raise ValueError("--crf must be in [0, 51]")
        if args.output is not None and not Path(args.output).is_dir():
            raise ValueError(f"output directory does not exist: {args.output}")


def _open_stream(engine, frame_hw):
    """Streaming is an optional engine capability (None -> the caller
    uses the double-buffered per-frame loop). Warms one full carry cycle
    up front so a live video doesn't stutter through per-split-pattern
    finalize compiles in its first seconds (TileStream.warm)."""
    opener = getattr(engine, "open_stream", None)
    stream = opener(frame_hw) if opener is not None else None
    if stream is not None:
        warm = getattr(stream, "warm", None)
        if warm is not None:
            warm()
    return stream


def _write_image(crf: int, out_path: Path, frame_u8: np.ndarray,
                 message_cb) -> int:
    """Write one finished still image through the PNG writer path
    (src/main.cpp:248-252: codec/pix_fmt empty, fps=1) with the
    zero-frame verification on release. The single writer protocol for
    both per-file renders and the image-stream batcher."""
    writer = VideoWriter()
    writer.set_constant_rate_factor(crf)
    writer.set_frame_rate(1).set_pixel_format("").set_codec("")
    writer.set_frame_size(frame_u8.shape[1], frame_u8.shape[0])
    writer.set_output_file(out_path)
    rc = 0
    try:
        writer.open()
        writer.write(frame_u8)
    except Exception as e:
        message_cb(Severity.error, f"Render failed: {e}.")
        rc = -1
    finally:
        try:
            writer.release()
        except Exception as e:
            if rc == 0:
                message_cb(Severity.error, f"Render failed: {e}.")
                rc = -1
    if rc == 0:
        message_cb(Severity.info, f"Wrote {out_path}")
    return rc


class _ImageStreamBatcher:
    """Cross-file tile streaming for still images (TPU extension).

    The reference renders each image independently and pads the final
    model batch with zero tiles (img2img_render.cpp:281) — a 512x512
    image at tile 256 fills 9 slots of a 16-tile batch, so nearly half
    of every boundary dispatch is dead work. Here, runs of same-size
    images share one cross-frame TileStream (the video hot path):
    leftover tiles of each image ride in the next image's chunk, so
    every accelerator dispatch stays full-batch across FILES. Outputs
    trail submission by at most one chunk and are written (and
    verified) in submission order through the same PNG writer path as
    per-file renders. Tile math is identical to per-image renders; when
    a chunk spans files the tiles run in a full-batch XLA program where
    the per-image path would have used an exact-size remainder program,
    and different program shapes may round differently (byte-identical
    for exact-math models and when chunks align to file boundaries;
    within normal fp tolerance otherwise — pinned by
    tests/test_renderer.py::test_tile_stream_matches_per_frame and the
    exact NearestUp stream tests).

    Because writes are deferred, a failure writing image A can surface
    while a later file is being read; the error message names A's
    output path. Progress callbacks fired by a boundary chunk may
    likewise be attributed to the next file."""

    def __init__(self, args, engine, message_cb) -> None:
        from collections import deque

        self._args = args
        self._engine = engine
        self._cb = message_cb
        self._stream = None
        self._hw = None
        self._pending = deque()  # (out_path, raw frame) awaiting outputs

    def submit(self, frame_u8: np.ndarray, out_path: Path) -> int:
        """Queue one decoded image; write whatever renders complete.
        A geometry change flushes the previous run first. Returns 0/-1."""
        hw = (int(frame_u8.shape[0]), int(frame_u8.shape[1]))
        rc = 0
        if self._stream is None or hw != self._hw:
            rc = self.drain()
            if rc != 0 and not self._args.continue_on_error:
                return rc
            stream = _open_stream(self._engine, hw)
            if stream is None:  # defensive: engine stopped streaming
                try:
                    out = np.asarray(self._engine.render(frame_u8))
                except Exception as e:
                    self._cb(Severity.error, f"Render failed: {e}.")
                    return -1
                wrc = self._write_one(Path(out_path), out)
                return wrc if wrc != 0 else rc
            self._stream = stream
            self._hw = hw
        self._pending.append((Path(out_path), frame_u8))
        try:
            outs = self._stream.submit(frame_u8)
        except Exception as e:
            return self._salvage(e)
        wrc = self._write(outs)
        return wrc if wrc != 0 else rc

    def drain(self) -> int:
        """Flush the open stream and write every pending image."""
        if self._stream is None:
            return 0
        stream, self._stream, self._hw = self._stream, None, None
        try:
            outs = stream.flush()
        except Exception as e:
            return self._salvage(e)
        rc = self._write(outs)
        if self._pending:  # contract: flush yields one output per input
            return self._salvage(
                RuntimeError("stream flushed fewer outputs than inputs"))
        return rc

    def _write(self, outs) -> int:
        # every output must be consumed even after a write failure:
        # stopping mid-batch would leave _pending misaligned, and a later
        # drain would write the NEXT image's pixels to this image's path.
        # The remaining outputs are already computed, so writing them is
        # strictly better than dropping them regardless of
        # --continue-on-error (the nonzero rc still stops the RUN there).
        rc = 0
        for out in outs:
            out_path, _ = self._pending.popleft()
            if self._write_one(out_path, np.asarray(out)) != 0:
                rc = -1
        return rc

    def _write_one(self, out_path: Path, frame_u8: np.ndarray) -> int:
        return _write_image(self._args.crf, out_path, frame_u8, self._cb)

    def _salvage(self, exc: Exception) -> int:
        """Stream failure: report it, then re-render every pending image
        through the independent per-image path (byte-identical output)
        so already-read files are not lost."""
        self._cb(
            Severity.error,
            f"Image stream failed ({exc}); re-rendering "
            f"{len(self._pending)} pending image(s) individually.")
        self._stream = None
        self._hw = None
        # the stream error already makes this run a failure (rc=-1), but
        # salvage every pending frame regardless of --continue-on-error so
        # no already-read file is silently dropped
        while self._pending:
            out_path, frame = self._pending.popleft()
            try:
                out = np.asarray(self._engine.render(frame))
            except Exception as e:
                self._cb(Severity.error, f"Render failed: {e}.")
                continue
            self._write_one(out_path, out)
        return -1


def output_suffix(model: str, noise: int, scale: int, tta: bool) -> str:
    """``(model)(noiseN)(scaleS)(tta)`` with '/'->'_' (src/main.cpp:205-209)."""
    s = f"({model.replace('/', '_')})"
    if noise != -1:
        s += f"(noise{noise})"
    if scale != 1:
        s += f"(scale{scale})"
    if tta:
        s += "(tta)"
    return s


def resolve_output_path(
    input_path: Path,
    output_dir: Path | None,
    suffix: str,
    nosuffix: bool,
    is_image: bool,
) -> Path:
    """Output naming rules of the render loop (src/main.cpp:240-255)."""
    out = input_path
    if output_dir is not None:
        out = output_dir / out.name
    if not nosuffix:
        out = out.with_name(out.stem + suffix + out.suffix)
    return out.with_suffix(".png" if is_image else ".mp4")


def main(argv=None) -> int:
    _ADVICE_SEEN.clear()  # once-per-geometry is scoped to one invocation
    args = build_parser().parse_args(argv)
    try:
        _validate(args)
    except ValueError as e:
        print(e, file=sys.stderr)
        return -1

    message_cb = console_message_callback()
    precision = Precision.FP16 if args.precision == "fp16" else Precision.TF32

    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    engine = Upscaler(models_dir=args.models_dir,
                      allow_random_init=args.allow_random_weights)
    engine.set_message_callback(message_cb)

    if args.command == "build":
        config = BuildConfig(
            device_id=args.device,
            precision=precision,
            min_batch_size=args.batch_size,
            opt_batch_size=args.batch_size,
            max_batch_size=args.batch_size,
            min_width=args.tile_size,
            opt_width=args.tile_size,
            max_width=args.tile_size,
            min_height=args.tile_size,
            opt_height=args.tile_size,
            max_height=args.tile_size,
        )
        try:
            engine.build(args.model, args.scale, args.noise, config,
                         graph_exact=args.graph_exact)
        except Exception as e:
            message_cb(Severity.error, f"Engine build failed: {e}.")
            return -1
        return 0

    # ---- render ----
    files = find_files_by_extension(args.inputs, DEFAULT_EXTENSIONS,
                                    args.recursive)
    if args.multihost:
        import os

        from waifu2x_tensorrt_tpu.parallel import shard_files

        # Multi-host runtime hookup: initialize the distributed runtime
        # when a coordinator is configured (TPU pods auto-detect; explicit
        # env for CPU/GPU clusters). Single-process --multihost runs (and
        # tests) skip it — process_index()/count() default to 0/1.
        import jax

        # NOTE: the already-initialized check must NOT call
        # jax.process_count() — that initializes the XLA backends, after
        # which jax.distributed.initialize() unconditionally raises
        # ("must be called before any JAX computations").
        if (os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS")) \
                and not jax.distributed.is_initialized():
            try:
                jax.distributed.initialize()
                message_cb(
                    Severity.info,
                    f"distributed: process "
                    f"{jax.process_index() + 1}/{jax.process_count()}")
            except Exception as e:
                message_cb(Severity.error,
                           f"jax.distributed.initialize failed: {e}.")
                return -1
        # Whole-file round-robin applies to IMAGES only; video files stay
        # on every host and are frame-range/segment sharded inside
        # _render_video_segmented (one video split across the pod — the
        # work distribution the reference cannot do).
        from waifu2x_tensorrt_tpu.io.video import IMAGE_SUFFIXES

        if not files:
            message_cb(Severity.error, "No input files found.")
            return -1
        images = [f for f in files
                  if Path(f).suffix.lower() in IMAGE_SUFFIXES]
        mine = set(map(str, shard_files(images)))
        files = [f for f in files
                 if Path(f).suffix.lower() not in IMAGE_SUFFIXES
                 or str(f) in mine]
        if not files:
            message_cb(Severity.info,
                       "No files assigned to this host; nothing to do.")
            return 0
    if not files:
        message_cb(Severity.error, "No input files found.")
        return -1

    # (A round-3 warning that cunet --tileSize 0 "still tiles internally
    # and is usually slower" was removed in round 4: resolve_tile_plan now
    # sizes the whole-frame tile to include the offset context, making ONE
    # tile cover the output — the measured-FASTEST cunet config for small
    # stills (bench config1c, 2.4x the tiled fp32 row). Per-frame-size
    # guidance now comes from engine/advice.py via _advise_config.)
    auto_tile = args.tile_size == "auto"
    if auto_tile:
        # provisional: 256 is the measured all-round default (BENCH_NOTES
        # headline + config sweeps); re-selected against the first
        # input's probed frame size after load, where the session's real
        # constraints (graph-backed divisor, static geometry) are known.
        args.tile_size = 256
    config = RenderConfig(
        device_id=args.device,
        precision=precision,
        batch_size=args.batch_size,
        channels=3,
        height=args.tile_size,
        width=args.tile_size,
        scaling=args.scale,
        overlap=(args.blend, args.blend),
        tta=args.tta,
    )

    sharding = None
    if args.dp != 1:
        from waifu2x_tensorrt_tpu.parallel import (
            data_parallel_mesh,
            tile_sharding,
        )

        import jax

        # Multihost + dp compose: each host shards its own frame range
        # (DCN work split, multihost.py) over its own LOCAL chips (ICI).
        # jax.devices() is the global list in a multi-process runtime and
        # its prefix belongs to process 0 — meshing over it from another
        # host would address remote chips with host-local tile data.
        local = jax.local_devices() if jax.process_count() > 1 else None
        mesh = data_parallel_mesh(None if args.dp == 0 else args.dp,
                                  devices=local)
        sharding = tile_sharding(mesh)

    state = {"file": 0, "files": len(files), "frame": 0, "frames": 0}

    def progress_cb(current: int, total: int, speed: float) -> None:
        message_cb(
            Severity.info,
            f"Rendered file {state['file']}/{state['files']}, "
            f"frame {state['frame']}/{state['frames']}, "
            f"batch {current}/{total} @ {speed:.2f} it/s",
        )

    engine.set_progress_callback(progress_cb)
    try:
        engine.load(args.model, args.scale, args.noise, config,
                    sharding=sharding, bucket=getattr(args, "bucket", 0),
                    graph_exact=args.graph_exact)
    except Exception as e:
        message_cb(Severity.error, f"Engine load failed: {e}.")
        return -1

    if auto_tile:
        new_tile = _resolve_auto_tile(engine, files, message_cb)
        if new_tile is not None and new_tile != args.tile_size:
            import dataclasses as _dc

            args.tile_size = new_tile
            config = _dc.replace(config, height=new_tile, width=new_tile)
            try:
                engine.load(args.model, args.scale, args.noise, config,
                            sharding=sharding,
                            bucket=getattr(args, "bucket", 0),
                            graph_exact=args.graph_exact)
            except Exception as e:
                message_cb(Severity.error, f"Engine load failed: {e}.")
                return -1

    suffix = output_suffix(args.model, args.noise, args.scale, args.tta)
    out_dir = Path(args.output) if args.output else None

    from waifu2x_tensorrt_tpu.io.video import IMAGE_SUFFIXES
    from waifu2x_tensorrt_tpu.utils.profiling import trace

    # Two or more still images in the worklist: stream them through one
    # cross-file TileStream so image boundaries never pad a model batch
    # (see _ImageStreamBatcher; single images keep the leaner inline path).
    n_images = sum(1 for f in files
                   if Path(f).suffix.lower() in IMAGE_SUFFIXES)
    batcher = (_ImageStreamBatcher(args, engine, message_cb)
               if n_images > 1 and engine.can_stream else None)

    import time as _time

    metrics = None
    if args.metrics_json:
        metrics = {
            "config": {
                "model": args.model, "scale": args.scale,
                "noise": args.noise, "tile_size": args.tile_size,
                "batch_size": args.batch_size,
                "precision": args.precision, "tta": args.tta,
                "blend": args.blend, "dp": args.dp,
                "streamed_images": batcher is not None,
            },
            "files": [],
        }
    t_run0 = _time.perf_counter()

    exit_code = 0
    drain_rc = 0
    capture = VideoCapture()
    try:
        with trace(args.profile):
            for file_index, file in enumerate(files):
                state["file"] = file_index + 1
                state["frames"] = 0  # else a failed open inherits the
                t0 = _time.perf_counter()  # previous file's count
                rc = _render_one(args, engine, capture, file, out_dir,
                                 suffix, state, message_cb, batcher)
                if metrics is not None:
                    # with cross-file image streaming, a file's tail tiles
                    # render (and write) during the NEXT file's slot —
                    # per-file seconds are attribution, totals are exact.
                    # frames is -1 for unknown-length streams ("?").
                    n = state["frames"]
                    metrics["files"].append({
                        "input": str(file), "rc": rc,
                        "frames": n if isinstance(n, int) else -1,
                        "seconds": round(_time.perf_counter() - t0, 3),
                    })
                if rc != 0:
                    if not args.continue_on_error:
                        if batcher is not None:
                            batcher.drain()  # salvage already-read images
                        exit_code = rc
                        return rc
                    exit_code = rc
            if batcher is not None:
                drain_rc = batcher.drain()
                if drain_rc != 0:
                    exit_code = drain_rc
        return exit_code
    finally:
        if metrics is not None:
            import json as _json

            # an exception (Ctrl-C, a raise inside trace()/the stream)
            # lands here with exit_code still holding its pre-crash value
            # — the report must not read as a clean run
            aborted = sys.exc_info()[0] is not None
            metrics["totals"] = {
                "files": len(metrics["files"]),
                "failed": sum(1 for f in metrics["files"] if f["rc"] != 0),
                "wall_seconds": round(_time.perf_counter() - t_run0, 3),
                "exit_code": exit_code if not aborted else (exit_code or -1),
            }
            if aborted:
                metrics["totals"]["aborted"] = True
            if drain_rc != 0:
                # deferred stream writes that failed at the final drain
                # belong to no per-file row (their submit already returned
                # 0) — surface them so failed==0 + exit_code!=0 is
                # explained inside the report itself
                metrics["totals"]["deferred_write_failures"] = True
            try:
                Path(args.metrics_json).write_text(
                    _json.dumps(metrics, indent=2))
            except OSError as e:
                message_cb(Severity.warn,
                           f"could not write metrics report: {e}")


def _frames(capture):
    """Yield the capture's frames; an unknown count (frame_count < 0,
    streams without nb_frames) reads to EOF in ONE decode pass, a known
    count that ends early is an error."""
    n = capture.frame_count
    i = 0
    while n < 0 or i < n:
        frame = capture.read()
        if frame is None:
            if n < 0:
                return
            raise RuntimeError("decoder ended early")
        i += 1
        yield frame


def _stream_frames(engine, writer, hw, frames, on_index) -> None:
    """Pump decoded frames through the engine into the writer — the ONE
    streaming video loop both the plain and the segmented paths share
    (they had drifted apart). Cross-frame tile streaming
    (Upscaler.open_stream) keeps every model dispatch at full batch and
    overlaps decode/encode with accelerator compute; falls back to the
    double-buffered per-frame loop when streaming does not apply."""
    stream = _open_stream(engine, hw)
    if stream is not None:
        for i, frame in enumerate(frames):
            on_index(i)
            for out in stream.submit(frame):
                writer.write(np.asarray(out))
        for out in stream.flush():
            writer.write(np.asarray(out))
    else:
        pending = None
        for i, frame in enumerate(frames):
            on_index(i)
            fut = engine.render_async(frame)
            if pending is not None:
                writer.write(np.asarray(pending))
            pending = fut
        if pending is not None:  # empty input: nothing in flight
            writer.write(np.asarray(pending))


def _render_rgba(args, engine, file, out_path, state, message_cb):
    """Alpha-aware still-image render (``--alpha auto``; extension — the
    reference's pipes are rgb24-only, src/videoio/capture.cpp:55 carries a
    literal alpha-support TODO). Returns None when the file has no alpha
    channel (callers continue on the normal RGB path).

    The RGB planes are upscaled after bleeding opaque colors under the
    transparent region (io/image.fill_transparent — prevents dark halos at
    alpha edges), and the alpha plane rides through the SAME loaded model
    as a grayscale frame (identical geometry, so it reuses the compiled
    render program); the recombined RGBA goes out as PNG."""
    from waifu2x_tensorrt_tpu.io.image import (
        fill_transparent,
        read_rgba,
        write_image,
    )

    try:
        rgb, a = read_rgba(file)
    except Exception:
        return None  # normal capture path owns decode-error reporting
    if a is None:
        return None
    state["frames"] = 1
    state["frame"] = 1
    try:
        rgb = fill_transparent(rgb, a)
        # both planes dispatch before either fetch: the alpha render
        # overlaps the RGB render's device time (async dispatch)
        out_f = engine.render_async(rgb)
        a_f = engine.render_async(np.repeat(a[:, :, None], 3, axis=2))
        out = np.asarray(out_f)
        a_up = np.clip(
            np.rint(np.asarray(a_f).astype(np.float32).mean(axis=2)),
            0, 255).astype(np.uint8)
        write_image(out_path, np.dstack([out, a_up]))
    except Exception as e:
        message_cb(Severity.error, f"Render failed: {e}.")
        return -1
    message_cb(Severity.info, f"Wrote {out_path}")
    return 0


_ADVICE_SEEN: set = set()


def _advise_config(args, engine, frame_hw, message_cb,
                   frame_count=None, files_total=1) -> None:
    """One-time configuration guidance — warn-only, the render still uses
    exactly what was asked (round-3 verdict item 8; flag parity with
    src/main.cpp:56-84 is behavioral, not advisory). Three axes, each
    with its own once-per-session dedup key:

    - tileSize per (tile, frame size) — engine/advice.tile_advice
    - batchSize per (batch, frame size) — batch_advice; ``frame_count``
      (this file's frames) x ``files_total`` estimates the session's
      stream length so one-off tiny workloads stay silent
    - precision, once per (model, precision) — precision_advice

    Batch advice is skipped on graph-backed/static sessions (the
    measured batch-scaling tables are for the verified flax fast path);
    precision advice IS emitted for graph-backed sessions (its fp32 vs
    bf16 numbers were measured on both paths, BENCH_NOTES round 4)."""
    spec = getattr(engine, "spec", None)
    config = getattr(engine, "_render_config", None)
    if spec is None or config is None:
        return
    from waifu2x_tensorrt_tpu.engine.advice import (
        batch_advice,
        precision_advice,
        tile_advice,
    )

    model = getattr(args, "model", None)
    static = bool(getattr(engine, "_static_geometry", None))
    graph_backed = bool(getattr(engine, "_graph_backed", False))
    models_dir = getattr(engine, "models_dir", None)

    tile = getattr(args, "tile_size", None)
    if tile is not None and not static:
        # fixed-geometry .onnx exports skip tile advice: every other
        # tile size is fatal
        key = ("tile", model, getattr(args, "scale", None), config.tta,
               tile, frame_hw)
        if key not in _ADVICE_SEEN:
            _ADVICE_SEEN.add(key)
            try:
                adv = tile_advice(spec, config, frame_hw,
                                  allow_whole_frame=not graph_backed,
                                  models_dir=models_dir)
            except Exception:
                adv = None
            if adv is not None:
                message_cb(Severity.warn, adv[2])

    if not static and not graph_backed:
        key = ("batch", model, config.batch_size, config.tta, frame_hw)
        if key not in _ADVICE_SEEN:
            _ADVICE_SEEN.add(key)
            stream_frames = None
            if frame_count is not None and frame_count > 0:
                stream_frames = frame_count * max(1, files_total)
            try:
                adv = batch_advice(spec, config,
                                   stream_frames=stream_frames,
                                   frame_hw=frame_hw,
                                   models_dir=models_dir)
            except Exception:
                adv = None
            if adv is not None:
                message_cb(Severity.warn, adv[2])

    key = ("precision", model, config.precision)
    if key not in _ADVICE_SEEN:
        _ADVICE_SEEN.add(key)
        try:
            adv = precision_advice(spec, config, models_dir=models_dir)
        except Exception:
            adv = None
        if adv is not None:
            message_cb(Severity.warn, adv[2])


def _resolve_auto_tile(engine, files, message_cb):
    """``--tileSize auto``: pick the modeled-best CLI tile for the FIRST
    input's frame size (extension — the reference offers no guidance at
    all, src/main.cpp:62-64). Returns the tile to switch to, or None to
    keep the provisional 256 (probe failure, fixed-geometry artifacts,
    or 256 already near-optimal — the advisor only moves on modeled
    >=20% wins, so model noise never flips the measured all-round
    default). Later files of other frame sizes keep the session tile and
    get the normal warn-only advice."""
    if getattr(engine, "_static_geometry", None):
        return None  # the export accepts exactly one geometry
    try:
        from waifu2x_tensorrt_tpu.io.video import probe_size

        hw = probe_size(files[0])
    except Exception as e:
        message_cb(Severity.warn,
                   f"--tileSize auto: could not probe {files[0]} ({e}); "
                   f"using tileSize 256")
        return None
    try:
        from waifu2x_tensorrt_tpu.engine.advice import tile_advice

        adv = tile_advice(
            engine.spec, engine._render_config, hw,
            allow_whole_frame=not getattr(engine, "_graph_backed", False),
            models_dir=getattr(engine, "models_dir", None))
    except Exception:
        return None
    if adv is None:
        message_cb(Severity.info,
                   f"--tileSize auto: using 256 for {hw[1]}x{hw[0]} frames")
        return None
    tile, ratio, _ = adv
    label = "0 (whole frame)" if tile == 0 else str(tile)
    message_cb(Severity.info,
               f"--tileSize auto: using {label} for {hw[1]}x{hw[0]} "
               f"frames (modeled {ratio:.1f}x less dispatched work than "
               f"tileSize 256)")
    return tile


def _render_one(args, engine, capture, file, out_dir, suffix, state,
                message_cb, batcher=None) -> int:
    try:
        capture.open(file)
    except Exception as e:
        message_cb(Severity.error, f"Failed to open {file}: {e}.")
        return -1
    _advise_config(args, engine,
                   (capture.frame_height, capture.frame_width), message_cb,
                   frame_count=capture.frame_count,
                   files_total=state.get("files", 1))
    is_image = capture.frame_count == 1
    out_path = resolve_output_path(file, out_dir, suffix, args.nosuffix,
                                   is_image)
    if getattr(args, "resume", False) and out_path.exists():
        message_cb(Severity.info, f"Skipping {file} (output exists)")
        capture.release()
        return 0
    if is_image and getattr(args, "alpha", "ignore") == "auto":
        rc_a = _render_rgba(args, engine, file, out_path, state, message_cb)
        if rc_a is not None:  # file HAD alpha: fully handled
            capture.release()
            return rc_a
    rc0 = 0
    if batcher is not None:
        if is_image:
            rc = 0
            try:
                frame = capture.read()
                if frame is None:
                    raise RuntimeError("decoder ended early")
                state["frames"] = 1
                state["frame"] = 1
                src = batcher.submit(frame, out_path)
                rc = src if src != 0 else rc
            except Exception as e:
                message_cb(Severity.error, f"Render failed: {e}.")
                rc = -1
            finally:
                capture.release()
            return rc
        # a video ends the image run: flush pending image outputs first
        rc0 = batcher.drain()
        if rc0 != 0 and not args.continue_on_error:
            capture.release()
            return rc0
    if not is_image and (getattr(args, "segment_frames", 0) > 0
                         or args.multihost):
        total = capture.frame_count
        fps = capture.frame_rate
        capture.release()
        if total < 0:
            # segment grids need the exact count; pay the counting decode
            # only on this path (ordinary renders stream to EOF instead).
            # Missing ffprobe / probe failure must follow the normal
            # error protocol (rc=-1 + message), not a raw traceback.
            try:
                total = capture._count_frames(Path(file))
            except Exception as e:
                message_cb(Severity.error,
                           f"Cannot determine frame count of {file} for "
                           f"segmented rendering: {e}.")
                return -1
        rc = _render_video_segmented(args, engine, file, out_path, state,
                                     message_cb, total, fps)
        return rc if rc != 0 else rc0
    state["frames"] = capture.frame_count if capture.frame_count > 0 else "?"
    if is_image:
        # single still without a batcher: render, then write through the
        # same PNG writer protocol the batcher uses
        rc = 0
        out = None
        try:
            frame = capture.read()
            if frame is None:
                raise RuntimeError("decoder ended early")
            state["frame"] = 1
            out = np.asarray(engine.render(frame))
        except Exception as e:
            message_cb(Severity.error, f"Render failed: {e}.")
            rc = -1
        finally:
            capture.release()
        if rc == 0:
            rc = _write_image(args.crf, out_path, out, message_cb)
        return rc if rc != 0 else rc0

    writer = VideoWriter()
    writer.set_constant_rate_factor(args.crf)
    writer.set_frame_rate(capture.frame_rate) \
          .set_pixel_format(args.pix_fmt).set_codec(args.codec)
    writer.set_frame_size(capture.frame_width * args.scale,
                          capture.frame_height * args.scale)
    writer.set_output_file(out_path)

    rc = 0
    try:
        writer.open()
        # the shared streaming loop (the design goal the reference's
        # single synchronous stream lacks, SURVEY.md §2 item 3)
        _stream_frames(
            engine, writer,
            (capture.frame_height, capture.frame_width),
            _frames(capture),
            on_index=lambda i: state.__setitem__("frame", i + 1))
    except Exception as e:
        message_cb(Severity.error, f"Render failed: {e}.")
        rc = -1
    finally:
        capture.release()
        try:
            # release() verifies the output was actually produced (image
            # mode: at least one frame written; native pipe: encoder
            # drained cleanly) and raises otherwise.
            writer.release()
        except Exception as e:
            if rc == 0:
                message_cb(Severity.error, f"Render failed: {e}.")
                rc = -1
    if rc != 0:
        return rc
    message_cb(Severity.info, f"Wrote {out_path}")
    return rc0


def _render_video_segmented(args, engine, file, out_path, state, message_cb,
                            total_frames, frame_rate) -> int:
    """Segmented video render: frame-range sharding + mid-video resume.

    The segment grid is a pure function of (video, flags), so every host
    and every resumed run derives identical part boundaries. Each segment
    decodes only its frame window (frame-exact trim), encodes to an
    atomically-published part file, and the last finisher stitches the
    parts losslessly (SURVEY.md §5 checkpoint/resume improvement; the
    reference restarts videos from frame 0 and cannot split one video
    across hosts).
    """
    from waifu2x_tensorrt_tpu.io.video import (
        VideoCapture,
        concat_segments,
        segment_grid,
        segment_path,
    )

    seg = getattr(args, "segment_frames", 0)
    grid = segment_grid(total_frames, seg)
    if args.multihost:
        if seg > 0:
            from waifu2x_tensorrt_tpu.parallel import shard_files

            mine = shard_files(grid)
        else:
            import jax

            from waifu2x_tensorrt_tpu.parallel import shard_frame_ranges

            pc = jax.process_count()
            # frame_count < process_count leaves later hosts with empty
            # (k, k) ranges — they render nothing (and may end up doing
            # the final stitch as the "last finisher")
            grid = [r for r in (shard_frame_ranges(total_frames, i, pc)
                                for i in range(pc)) if r[0] < r[1]]
            own = shard_frame_ranges(total_frames, jax.process_index(), pc)
            mine = [own] if own[0] < own[1] else []
    else:
        mine = grid

    state["frames"] = total_frames
    for a, b in mine:
        part = segment_path(out_path, a, b)
        if getattr(args, "resume", False) and part.exists():
            message_cb(Severity.info,
                       f"Skipping frames [{a}, {b}) (segment exists)")
            continue
        tmp = part.with_name(part.stem + ".tmp" + part.suffix)
        capture = VideoCapture()
        writer = None
        try:
            # capture.open inside the try: a bad frame_range / probe
            # failure must follow the same error protocol, not escape as
            # a raw traceback
            capture.open(file, frame_range=(a, b))
            writer = (VideoWriter()
                      .set_constant_rate_factor(args.crf)
                      .set_frame_rate(frame_rate)
                      .set_pixel_format(args.pix_fmt).set_codec(args.codec)
                      .set_frame_size(capture.frame_width * args.scale,
                                      capture.frame_height * args.scale)
                      .set_output_file(tmp))
            writer.open()

            # the SAME streaming loop as the unsegmented path; the stream
            # is flushed at the segment boundary so part files stay exact
            def seg_frames():
                for _ in range(b - a):
                    frame = capture.read()
                    if frame is None:
                        raise RuntimeError("decoder ended early")
                    yield frame

            _stream_frames(
                engine, writer,
                (capture.frame_height, capture.frame_width),
                seg_frames(),
                on_index=lambda i: state.__setitem__("frame", a + i + 1))
            capture.release()
            # on the success path release() is part of the contract: it
            # verifies the encoder drained and exited cleanly, and raises
            # (into the except below) otherwise
            writer.release()
        except Exception as e:
            message_cb(Severity.error,
                       f"Render failed in frames [{a}, {b}): {e}.")
            for closer in (capture, writer):
                try:
                    if closer is not None:
                        closer.release()  # idempotent on both classes
                except Exception:
                    pass
            tmp.unlink(missing_ok=True)
            return -1
        tmp.replace(part)  # atomic: existence == segment complete
        message_cb(Severity.info, f"Rendered segment [{a}, {b}) -> {part.name}")

    expected = [segment_path(out_path, a, b) for a, b in grid]
    if all(p.exists() for p in expected):
        # Last-finisher election: on a shared filesystem several hosts can
        # observe all-parts-present near-simultaneously; an O_EXCL lock
        # file picks exactly one stitcher (the losers report and exit 0 —
        # the winner publishes the final file atomically and removes the
        # lock). A host that dies mid-stitch leaves the lock behind; the
        # message names it as the manual recovery (parts are still on
        # disk, so deleting the lock and rerunning --resume re-stitches).
        lock = out_path.with_name(out_path.name + ".stitch.lock")
        try:
            fd = os.open(str(lock), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            if out_path.exists():  # a previous winner already published
                return 0
            message_cb(Severity.info,
                       f"{out_path.name}: another host holds the stitch "
                       f"lock ({lock.name}); if it crashed, delete the "
                       "lock and rerun with --resume")
            return 0
        try:
            concat_segments(expected, out_path, frame_rate)
            for p in expected:
                p.unlink(missing_ok=True)
        except Exception as e:
            # stitch failures follow the same error protocol as renders —
            # a raw CalledProcessError would abort remaining files even
            # under --continue-on-error
            message_cb(Severity.error,
                       f"Failed to stitch {out_path.name}: {e}.")
            return -1
        finally:
            lock.unlink(missing_ok=True)
        message_cb(Severity.info, f"Wrote {out_path}")
    else:
        message_cb(Severity.info,
                   f"Rendered {len(mine)} segment(s) of {out_path.name}; "
                   "final stitch happens when the remaining hosts finish")
    return 0


if __name__ == "__main__":
    sys.exit(main())
