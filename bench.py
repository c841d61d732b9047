"""Headline benchmark: upscaled output megapixels/sec/chip.

Flagship config (BASELINE.md north-star metric): swin_unet/art scale=4
noise=3, tile 256, batch 16, bf16 ("fp16" CLI precision), blend 1/16 —
streaming 720p frames through the production TileStream pipeline
(prepare -> cross-frame full-batch model chunks -> fused blend/scatter
finalize).

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Aux data (fps, compile time, BASELINE.md config-exact rows) goes to
stderr and bench_aux.json.

vs_baseline: the reference publishes no numbers (SURVEY.md §6); the
BASELINE.md target is >=2x an (unmeasured) TensorRT-fp16 RTX-4090 run of
swin_unet 4x. vs_baseline divides by a 30 MP/s point estimate kept for
round-to-round continuity; the DEFENSIBLE artifact is bench_aux's
gpu_baseline block — measured 45.4 GFLOP/output-MP (XLA cost analysis,
dense-math twin), the implied 4090 rate at several assumed end-to-end
MFUs, and the exact GPU-MFU threshold below which the >=2x claim holds
(r4: 6.5%). Full derivation in BENCH_NOTES.md "GPU baseline — bounded,
not cited".

Timing notes (BENCH_NOTES.md): block_until_ready returns early on the
axon remote platform, so completion is forced with a small strided fetch
(the device executes programs in order, so fetching the last bounds the
batch). The full-frame download is reported separately: through the axon
tunnel it costs ~1.6 s/frame of pure network transfer, which a real TPU
host's PCIe does in ~2 ms — the headline is the device-complete rate.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))

import jax
import jax.numpy as jnp
import numpy as np

_PROC_T0 = time.perf_counter()

BASELINE_GPU_MPPS = 30.0  # continuity point estimate, BENCH_NOTES.md
# Interval for the unmeasurable RTX-4090 TensorRT fp16 baseline
# (BENCH_NOTES.md "GPU baseline — bounded, not cited"): 0.6%-3% assumed
# end-to-end GPU MFU at the measured 45.4 GF/outMP = 22-109 MP/s,
# rounded out to [20, 110]. The per-run artifact is the gpu_baseline
# block below (per-MFU table + exact threshold), not this constant.
BASELINE_GPU_INTERVAL_MPPS = (20.0, 110.0)
GPU_PEAK_FP16_FLOPS = 165.2e12  # RTX 4090 dense fp16 tensor-core peak

# TPU peak (bf16 matmul) by device_kind substring, FLOP/s.
_TPU_PEAK_BF16 = {
    "v5 lite": 197e12, "v5e": 197e12,
    "v5p": 459e12, "v5": 459e12,
    "v4": 275e12,
    "v6 lite": 918e12, "v6e": 918e12, "trillium": 918e12,
}


def tpu_peak_bf16_flops() -> float | None:
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, peak in _TPU_PEAK_BF16.items():
        if key in kind:
            return peak
    return None


def log(msg):
    print(msg, file=sys.stderr, flush=True)


_PARAMS_CACHE: dict = {}


def headline_setup():
    """The flagship stream configuration — ONE definition shared by
    bench.main and the probes (ADVICE r3: a probe measuring a silently
    drifted copy of this config would not be comparing against the
    recorded headline). Returns (frame_hw, tile, batch, scale, config)."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig

    frame_hw = (720, 1280)
    tile, batch, scale = 256, 16, 4
    config = RenderConfig(
        precision=Precision.FP16, batch_size=batch, height=tile, width=tile,
        scaling=scale, overlap=(1 / 16, 1 / 16), tta=False,
    )
    return frame_hw, tile, batch, scale, config


def make_frame(frame_hw, seed: int = 0):
    """Device-resident random uint8 frame (the bench input convention)."""
    rng = np.random.default_rng(seed)
    return jax.device_put(jnp.asarray(
        rng.integers(0, 256, (*frame_hw, 3), np.uint8)))


def prewarm_params(family: str, scale: int, noise: int, config) -> None:
    """Populate _PARAMS_CACHE for (family, scale) ahead of a timed
    make_pipeline call: the one-time on-device params init costs ~60 s
    through the axon tunnel and would otherwise inflate the first
    measurement's reported compile time (ADVICE r3)."""
    from waifu2x_tensorrt_tpu.models.registry import (
        create_model,
        init_params_host,
    )

    module, spec = create_model(family, scale, noise,
                                dtype=config.precision.dtype)
    pkey = (spec.arch, scale, str(config.precision.dtype))
    if pkey not in _PARAMS_CACHE:
        _PARAMS_CACHE[pkey] = jax.device_put(init_params_host(module, tile=32))


def make_pipeline(family, scale, noise, config, frame_hw, fused_block,
                  packed=False, **model_kw):
    # packed=True (packed-head blend/scatter) measured slower on v5e:
    # the whole-canvas unpack costs ~15 ms vs ~3.4 ms of fused per-tile
    # shuffles (BENCH_NOTES.md); kept for kernel experiments.
    """Compile the chunked render pipeline; returns a frame runner."""
    from waifu2x_tensorrt_tpu.engine.renderer import ChunkedPipeline
    from waifu2x_tensorrt_tpu.models.registry import (
        create_model,
        init_params_host,
    )

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if family.startswith("swin"):
        # measured +3.7% streamed on v5e (BENCH_NOTES round 3)
        model_kw.setdefault("shuffle_via_deconv", on_tpu)
    module, spec = create_model(
        family, scale, noise, dtype=config.precision.dtype,
        use_pallas=on_tpu, fused_block=fused_block and on_tpu,
        packed_head=packed and not config.tta, **model_kw,
    )
    # Random-init params: values don't affect throughput, so share one
    # init per (arch, scale) — on-device init through the tunnel is ~60 s.
    pkey = (spec.arch, scale, str(config.precision.dtype))
    params = _PARAMS_CACHE.get(pkey)
    if params is None:
        t0 = time.perf_counter()
        params = jax.device_put(init_params_host(module, tile=32))
        log(f"[bench] {family} s{scale} params init "
            f"{time.perf_counter() - t0:.1f}s")
        _PARAMS_CACHE[pkey] = params
    # packed-x head twin: measured SLOWER (414.6 vs 475.3 MP/s, BENCH_NOTES
    # "packed-x head") — opt-in via WAIFU2X_PACK_X=1 for re-measurement
    module_px = spec_px = None
    if (os.environ.get("WAIFU2X_PACK_X") == "1"
            and family.startswith("swin") and on_tpu and scale > 1
            and not config.tta and not packed
            and not model_kw.get("packed_x_head")):
        module_px, spec_px = create_model(
            family, scale, noise, dtype=config.precision.dtype,
            use_pallas=on_tpu, fused_block=fused_block and on_tpu,
            packed_x_head=True, **model_kw,
        )
    pl = ChunkedPipeline(module, spec, config, module_pack_x=module_px,
                         spec_pack_x=spec_px)
    prep_p, _fin, plan, _n = pl.get(frame_hw)

    def run(frame_dev):
        return pl.render(params, frame_dev)

    run.plan = plan
    run.chunk_sizes = prep_p.chunk_sizes
    run.pipeline = pl
    run.params = params
    return run


def force(o):
    return float(jnp.sum(o[::512, ::512].astype(jnp.int32)))


def measure_stream(run, frame_dev, scale, frame_hw, iters=16, rounds=3,
                   warm=10):
    """Best-of-rounds STREAMED frame rate (TileStream over one frame
    repeated). ``warm`` submits cover a full carry cycle so every
    assemble/gather program exists before timing."""
    from waifu2x_tensorrt_tpu.engine.renderer import TileStream

    stream = TileStream(run.pipeline, run.params, frame_hw)
    for _ in range(warm):
        stream.submit(frame_dev)
    best = float("inf")
    for _ in range(rounds):
        last = None
        t0 = time.perf_counter()
        for _ in range(iters):
            outs = stream.submit(frame_dev)
            if outs:
                last = outs[-1]
        if last is None:
            raise ValueError(
                f"measure_stream: no chunk flushed in a round — raise "
                f"iters (={iters}) to at least the frames-per-flush of "
                f"this config (whole-frame tiles flush every batch_size "
                f"frames)")
        force(last)
        best = min(best, (time.perf_counter() - t0) / iters)
    out_mp = frame_hw[0] * scale * frame_hw[1] * scale / 1e6
    return out_mp / best, 1.0 / best


def measure(run, frame_dev, scale, frame_hw, iters=16, rounds=3):
    """Best-of-rounds frame rate. One scalar fetch bounds each round of
    ``iters`` async frame dispatches; taking the best round suppresses
    the axon tunnel's RTT jitter (tens of ms on the single fetch, which
    at 8 frames/round was +-5 ms/frame of pure noise)."""
    best = float("inf")
    for _ in range(rounds):
        out = None
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(frame_dev)
        force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    out_mp = frame_hw[0] * scale * frame_hw[1] * scale / 1e6
    return out_mp / best, 1.0 / best


def _probe_devices(timeout_s: float):
    """First device touch under a watchdog: the axon tunnel's outage modes
    are BOTH a raised UNAVAILABLE and an indefinite hang inside backend
    init (observed 2026-08-18). Run jax.devices() on a worker thread and
    convert a hang into the same retryable RuntimeError the raise mode
    produces (__main__ re-execs on it)."""
    import threading

    out: dict = {}

    def run():
        try:
            out["devices"] = jax.devices()
        except Exception as e:  # re-raised with the retry marker below
            out["error"] = e

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout_s)
    if "devices" in out:
        return out["devices"]
    if "error" in out:
        # only transient tunnel outages are retryable; permanent
        # configuration errors (bad JAX_PLATFORMS, missing plugin) must
        # surface immediately, not burn 4 x (timeout + 120 s) re-execs
        if "UNAVAILABLE" in str(out["error"]):
            raise RuntimeError(
                f"Unable to initialize backend: {out['error']}")
        raise out["error"]
    raise RuntimeError(f"Unable to initialize backend: init still hung "
                       f"after {timeout_s:.0f} s")


def _bench_cache_root() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".jax_bench_cache")


def ready_probe() -> None:
    """Fresh-process pipeline-ready time — the reference's '.trt
    deserialize and go' UX row (img2img_load.cpp:157-172; VERDICT r4
    item 1). Builds the headline pipeline reading the serialized-
    executable store and forces one frame; prints ONE JSON line.

    Two runs measure the two regimes: run 1 pays whatever is cold
    (client compile and/or the axon server's first-execution program
    load); run 2 is the REPRODUCIBLE warm start — the exe store replays
    byte-identical program binaries, so the server's cross-session
    program cache hits deterministically (probes/probe_serialize_exe.py
    measurements: fresh-process first call 415.7 s cold, 5.5 s once the
    server has executed those exact bytes; re-lowering in each process
    instead emits slightly different HLO and made round-4 warm starts
    flaky: 199/315/53/323 s)."""
    _probe_devices(float(os.environ.get("BENCH_INIT_TIMEOUT_S", "480")))
    from waifu2x_tensorrt_tpu.engine import exe_cache

    root = _bench_cache_root()
    jax.config.update("jax_compilation_cache_dir", root)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    exe_cache.configure(root)
    frame_hw, _tile, _batch, scale, config = headline_setup()
    t0 = time.perf_counter()
    prewarm_params("swin_unet/art", scale, 3, config)  # host init + upload
    run = make_pipeline("swin_unet/art", scale, 3, config, frame_hw,
                        fused_block=True)
    force(run(make_frame(frame_hw)))
    ready = time.perf_counter() - t0
    store = exe_cache.store_dir()
    blobs = (sorted(store.glob("*" + exe_cache.EXE_SUFFIX))
             if store is not None and store.is_dir() else [])
    print(json.dumps({
        "ready_s": round(ready, 1),
        "store_blobs": len(blobs),
        "store_bytes": sum(b.stat().st_size for b in blobs),
    }), flush=True)


def _measure_ready_rows() -> dict:
    """Run the ready probe in two consecutive FRESH processes (before this
    process initializes its own TPU client — one axon client at a time)."""
    import subprocess

    rows: dict = {}
    timeout_s = float(os.environ.get("BENCH_READY_TIMEOUT_S", "900"))
    # the axon server serializes clients and a just-exited (or killed)
    # client's session lingers; connecting immediately wedges the new
    # client in a futex-parked RPC (measured 2026-08-21: back-to-back
    # probes hung twice, a 30 s-spaced run completed). Space the probes.
    pause_s = float(os.environ.get("BENCH_READY_PAUSE_S", "30"))
    first = True
    for key in ("ready_run1_s", "ready_warm_s"):
        if not first:
            time.sleep(pause_s)
        first = False
        t0 = time.perf_counter()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--ready-probe"],
                capture_output=True, text=True, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            rows[key] = f"timeout>{timeout_s:.0f}s"
            log(f"[bench] ready probe {key}: timed out")
            if key == "ready_run1_s":
                # the tunnel is in a wedge window (observed evenings where
                # even well-spaced fresh clients park in the compile RPC);
                # don't feed it a second probe — get on with the bench
                rows["ready_warm_s"] = "skipped: run1 timeout"
                break
            continue
        line = (p.stdout.strip().splitlines() or [""])[-1]
        try:
            rec = json.loads(line)
            rows[key] = rec["ready_s"]
            rows.setdefault("ready_store_blobs", rec.get("store_blobs"))
            rows.setdefault("ready_store_bytes", rec.get("store_bytes"))
            log(f"[bench] ready probe {key}: {rec['ready_s']}s "
                f"({rec.get('store_blobs')} blobs, total wall "
                f"{time.perf_counter() - t0:.1f}s)")
        except (json.JSONDecodeError, KeyError):
            rows[key] = f"failed rc={p.returncode}"
            log(f"[bench] ready probe {key} failed rc={p.returncode}: "
                f"{p.stderr[-1500:]}")
    return rows


def main() -> None:
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig

    # Fresh-process warm-start rows FIRST: the probes must own the (single)
    # axon client before this process binds it. BENCH_READY=0 skips.
    ready_rows = {}
    if os.environ.get("BENCH_READY", "1") != "0":
        ready_rows = _measure_ready_rows()
        # let the last probe's server session clear before THIS process
        # binds the tunnel (same back-to-back wedge hazard as above)
        time.sleep(float(os.environ.get("BENCH_READY_PAUSE_S", "30")))
        # the probes are their own timed rows: restart the config-row
        # budget clock so they don't push BASELINE rows into
        # "skipped (budget)" (r3 item 1's zero-skip requirement)
        global _PROC_T0
        _PROC_T0 = time.perf_counter()

    _probe_devices(float(os.environ.get("BENCH_INIT_TIMEOUT_S", "480")))

    # Persistent XLA compile cache: remote compiles swing 15 s <-> 200+ s
    # run-to-run (BENCH_NOTES.md); caching makes reruns measurement-bound.
    cache_dir = _bench_cache_root()
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Serialized-executable store (engine/exe_cache): the bench process
    # reads the store the ready probes just wrote and keeps it fresh.
    from waifu2x_tensorrt_tpu.engine import exe_cache as _exe_cache

    _exe_cache.configure(cache_dir)

    frame_hw, tile, batch, scale, config = headline_setup()
    frame = make_frame(frame_hw)

    t0 = time.perf_counter()
    try:
        run = make_pipeline("swin_unet/art", scale, 3, config, frame_hw,
                            fused_block=True)
        force(run(frame))
    except Exception as e:
        log(f"[bench] fused-block compile failed ({type(e).__name__}); "
            "falling back to attention-only kernels")
        run = make_pipeline("swin_unet/art", scale, 3, config, frame_hw,
                            fused_block=False)
        force(run(frame))
    compile_s = time.perf_counter() - t0
    log(f"[bench] headline pipeline ready in {compile_s:.1f}s "
        f"({run.plan.tile_count} tiles, chunks {run.chunk_sizes})")
    force(run(frame))  # steady-state warm

    mpps_frame, fps_frame = measure(run, frame, scale, frame_hw)

    # Streaming (cross-frame full-batch) rate — the steady-state video
    # number: TileStream carries remainder tiles into the next frame so
    # every model dispatch is a full batch (engine/renderer.py).
    mpps, fps = measure_stream(run, frame, scale, frame_hw)

    t0 = time.perf_counter()
    np.asarray(run(frame))
    fetch_dt = time.perf_counter() - t0

    result = {
        "metric": "upscaled_output_megapixels_per_sec_per_chip "
                  "(swin_unet/art 4x, tile 256, batch 16, bf16, streamed 720p frames)",
        "value": round(mpps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mpps / BASELINE_GPU_MPPS, 3),
    }
    # Headline goes out FIRST: config rows below can exceed the harness
    # budget (remote compiles vary minutes run-to-run), and a truncated
    # run must still report its metric.
    print(json.dumps(result), flush=True)

    aux = {
        "fps_720p_to_4x": round(fps, 3),
        "per_frame_MPps": round(mpps_frame, 3),
        "per_frame_fps": round(fps_frame, 3),
        "fps_tunnel_limited_full_fetch": round(1.0 / fetch_dt, 3),
        "compile_s": round(compile_s, 1),
        # fresh-process pipeline-ready rows (VERDICT r4 item 1):
        # ready_run1_s pays anything cold; ready_warm_s is the
        # reproducible serialized-executable warm start
        **ready_rows,
        "device": str(jax.devices()[0]),
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
        "tiles_per_frame": run.plan.tile_count,
        "chunk_sizes": run.chunk_sizes,
    }

    # ---- MFU + bounded GPU baseline (VERDICT r3 item 1) ----------------
    # FLOPs from XLA's own cost analysis of the dispatched model programs;
    # TPU MFU = dispatched model FLOP/s over the chip's bf16 peak. The
    # same FLOP/output-MP figure bounds the GPU side: a 4090 running the
    # identical workload at an ASSUMED end-to-end MFU x sustains
    # 165.2e12*x/(GF/outMP) MP/s, so the >=2x claim holds for every GPU
    # MFU below measured_MPps / (2 * that rate) — reported here so the
    # claim's sensitivity is a recorded artifact, not a footnote.
    try:
        from waifu2x_tensorrt_tpu.engine.renderer import (
            ChunkedPipeline as _CPd,
        )
        from waifu2x_tensorrt_tpu.models.registry import create_model

        out_mp = frame_hw[0] * scale * frame_hw[1] * scale / 1e6
        # Count FLOPs on a DENSE-math twin: the shipped model wraps whole
        # transformer blocks in Pallas custom calls, which XLA's cost
        # analysis scores as 0 FLOPs (measured: 9.9 GF/outMP reported vs
        # ~33 by hand). The dense twin is the same math, fully visible.
        # lower() is host-side tracing only — no device compile.
        mod_d, spec_d = create_model(
            "swin_unet/art", scale, 3, dtype=config.precision.dtype,
            use_pallas=False, fused_block=False)
        # axon's lowered cost_analysis returns None, so the twin compiles
        # once (persistent-cached; warm runs are a lookup). BENCH_MFU=0
        # skips the block entirely if that one-time compile must be
        # avoided on a cold cache.
        if os.environ.get("BENCH_MFU", "1") == "0":
            raise RuntimeError("BENCH_MFU=0")
        t_mfu = time.perf_counter()
        pl_d = _CPd(mod_d, spec_d, config)
        flops_frame = pl_d.flops_per_frame(run.params, frame_hw)
        log(f"[bench] dense-twin cost analysis in "
            f"{time.perf_counter() - t_mfu:.1f}s")
        gf_per_mp = flops_frame / 1e9 / out_mp
        aux["model_gflop_per_frame"] = round(flops_frame / 1e9, 2)
        aux["model_gflop_per_output_mp"] = round(gf_per_mp, 2)
        peak = tpu_peak_bf16_flops()
        if peak:
            aux["tpu_mfu_pct"] = round(
                100.0 * flops_frame * fps / peak, 2)
            aux["tpu_peak_bf16_tflops"] = round(peak / 1e12, 0)
        gpu_mpps_at = lambda mfu: GPU_PEAK_FP16_FLOPS * mfu / (gf_per_mp * 1e9)  # noqa: E731
        aux["gpu_baseline"] = {
            "interval_MPps": list(BASELINE_GPU_INTERVAL_MPPS),
            "point_MPps": BASELINE_GPU_MPPS,
            "gpu_MPps_at_mfu_pct": {
                f"{m:g}%": round(gpu_mpps_at(m / 100), 1)
                for m in (0.6, 1, 3, 5, 10)},
            "2x_claim_holds_below_gpu_mfu_pct": round(
                100.0 * mpps * gf_per_mp * 1e9
                / (2.0 * GPU_PEAK_FP16_FLOPS), 2),
        }
    except Exception as e:  # cost analysis is diagnostic, never fatal
        aux["mfu_error"] = f"{type(e).__name__}: {e}"
    flush_keys = ("model_gflop_per_output_mp", "tpu_mfu_pct", "gpu_baseline")
    log(f"[bench] mfu/baseline: "
        f"{ {k: aux.get(k) for k in flush_keys} }")

    # ---- BASELINE.md config-exact rows (VERDICT round 1, item 10) ------
    # Ordered so every row fits the budget (VERDICT r3 item 1: zero
    # "skipped (budget)" rows): program-sharing rows first, the expensive
    # independent compiles later, graph serving last. The persistent XLA
    # cache makes reruns compile-free; a cold run still lands the high-
    # value rows (cunet + TTA) before any budget pressure.
    configs = {}
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    aux["baseline_configs"] = configs

    def flush_aux():
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "bench_aux.json"), "w") as f:
                json.dump(aux, f, indent=2)
        except OSError:
            pass

    def over_budget(name):
        # budget counts from process start: compiles vary minutes between
        # runs and a truncated run must still have flushed its rows.
        if time.perf_counter() - _PROC_T0 > budget_s:
            configs[name] = "skipped: config budget exhausted"
            log(f"[bench] {name}: skipped (budget)")
            flush_aux()
            return True
        return False

    flush_aux()

    # host-side framepipe GB/s (native C++ ring vs pure-Python pipe; no
    # TPU involvement — VERDICT r2 item 6). Cheap (~15 s) and host-only.
    if os.environ.get("BENCH_FRAMEPIPE", "1") != "0":
        try:
            from bench_framepipe import measure_framepipe

            aux["framepipe"] = measure_framepipe(n_frames=32, rounds=2)
            log(f"[bench] framepipe: {aux['framepipe']}")
        except Exception as e:
            aux["framepipe"] = f"failed: {type(e).__name__}"
        flush_aux()

    if os.environ.get("BENCH_CONFIGS", "1") != "0":
        img_hw = (512, 512)
        img512 = make_frame(img_hw, seed=1)

        def row(name, fn):
            if over_budget(name):
                return
            try:
                configs[name] = fn()
            except Exception as e:
                configs[name] = f"failed: {type(e).__name__}"
            log(f"[bench] {name}: {configs[name]}")
            flush_aux()

        def reuse(base):
            """Second frame geometry over an already-built pipeline: the
            expensive model program is shared, only prepare/finalize
            (data movement) compile for the new frame size."""
            def r(frame_dev):
                return base.pipeline.render(base.params, frame_dev)

            r.pipeline, r.params = base.pipeline, base.params
            return r

        # config 6: image-DIRECTORY workload -- 512x512 stills on the
        # HEADLINE model program (swin_unet/art 4x t256 b16 bf16); only
        # the 512px prepare/finalize compile. 9 tiles/image vs 16-tile
        # chunks: per-image renders pad the boundary dispatch (what the
        # reference always does, img2img_render.cpp:281); cross-file
        # streaming (cli._ImageStreamBatcher over TileStream) keeps every
        # dispatch full-batch across images.
        def config6():
            run6 = reuse(run)
            force(run6(img512))
            v_per, f_per = measure(run6, img512, 4, img_hw, iters=8)
            v_str, f_str = measure_stream(run6, img512, 4, img_hw,
                                          iters=12, warm=4)
            plan6 = run.pipeline.get(img_hw)[2]
            return {
                "per_image_MPps": round(v_per, 1),
                "streamed_MPps": round(v_str, 1),
                "images_per_s_streamed": round(f_str, 2),
                "stream_speedup": round(v_str / v_per, 2),
                "tiles_per_image": plan6.tile_count,
            }
        row("config6_image_dir_512", config6)

        # config 1: cunet/art 2x noise 1, 512x512 input, tile 256,
        # batch 1. (BASELINE.md says fp32 CPU; under the driver this
        # process owns the TPU platform, so the row is measured on-device
        # at fp32 and labeled as such.)
        def config1():
            cfg1 = RenderConfig(
                precision=Precision.TF32, batch_size=1, height=256,
                width=256, scaling=2, overlap=(1 / 16, 1 / 16))
            run1 = make_pipeline("cunet/art", 2, 1, cfg1, img_hw,
                                 fused_block=False)
            force(run1(img512))
            v, f = measure(run1, img512, 2, img_hw, iters=4)
            return {"MPps": round(v, 1), "fps": round(f, 2),
                    "device": str(jax.devices()[0])}
        row("config1_cunet2x_512_fp32", config1)

        # config 1b: cunet bf16 (VERDICT r2 item 8) -- same geometry,
        # batch 4; records the bf16 speedup next to the fp32 row.
        def config1b():
            cfg1b = RenderConfig(
                precision=Precision.FP16, batch_size=4, height=256,
                width=256, scaling=2, overlap=(1 / 16, 1 / 16))
            run1b = make_pipeline("cunet/art", 2, 1, cfg1b, img_hw,
                                  fused_block=False)
            force(run1b(img512))
            v, f = measure(run1b, img512, 2, img_hw, iters=4)
            return {"MPps": round(v, 1), "fps": round(f, 2)}
        row("config1b_cunet2x_512_bf16", config1b)

        # config 1c: cunet BEST levers (VERDICT r3 item 2) -- whole-frame
        # tile (one tile covers the 512px frame incl. the offset-36
        # context; no overlap redundancy), bf16, batch-16 streaming (16
        # frames per full-batch dispatch). Whole-frame cunet scales
        # super-linearly in batch on v5e (39.8 / 78.1 / 103.9 MP/s at
        # b4/b8/b16, aligned-iters measurement 2026-08-19): the conv
        # layouts XLA picks at larger batch need far fewer relayout
        # copies. iters/warm are multiples of the 16-frame flush so every
        # timed round covers whole chunks.
        def config1c():
            cfg1c = RenderConfig(
                precision=Precision.FP16, batch_size=16, height=0,
                width=0, scaling=2, overlap=(1 / 16, 1 / 16))
            run1c = make_pipeline("cunet/art", 2, 1, cfg1c, img_hw,
                                  fused_block=False)
            force(run1c(img512))
            v, f = measure_stream(run1c, img512, 2, img_hw, iters=32,
                                  warm=16)
            return {"MPps": round(v, 1), "fps": round(f, 2),
                    "mode": "whole-frame tile, bf16, streamed b16"}
        row("config1c_cunet2x_512_bf16_best", config1c)

        # config 1d (VERDICT r4 item 8): cunet at LARGE frames. The
        # batch-16 lever was 512px-proven only (tiled t256 28.1 -> 62.6
        # MP/s b4 -> b16, 2026-08-19); this row measures 1080p tiled
        # b4 vs b16 streamed so the advisor's cunet b16 recommendation
        # (engine/advice.py batch_advice) is backed at production frame
        # sizes. 1080p/t256 is 40 tiles/frame: b4 divides evenly, b16
        # carries across frames (2-frame cycle).
        def config1d():
            hw1080 = (1080, 1920)
            f1080 = make_frame(hw1080, seed=3)
            out = {}
            for b in (4, 16):
                cfgd = RenderConfig(
                    precision=Precision.FP16, batch_size=b, height=256,
                    width=256, scaling=2, overlap=(1 / 16, 1 / 16))
                rund = make_pipeline("cunet/art", 2, 1, cfgd, hw1080,
                                     fused_block=False)
                force(rund(f1080))
                v, _f = measure_stream(rund, f1080, 2, hw1080, iters=8,
                                       warm=4)
                out[f"b{b}_MPps"] = round(v, 1)
            out["b16_over_b4"] = round(
                out["b16_MPps"] / max(out["b4_MPps"], 1e-9), 2)
            out["mode"] = "1080p tiled t256 bf16 streamed"
            return out
        row("config1d_cunet2x_1080p_t256_batch", config1d)

        # config 3: swin_unet/art_scan 4x with 8-way TTA, batch 8 (the
        # BASELINE-pinned batch), 512x512 stills. tileSize is free in
        # BASELINE.md; 128 measured fastest for the 8x-dihedral stream
        # (r4 probe: t128 > t256 by ~1.5x -- smaller tiles cut the
        # overlap redundancy that TTA multiplies 8x).
        def config3():
            cfg3 = RenderConfig(
                precision=Precision.FP16, batch_size=8, height=128,
                width=128, scaling=4, overlap=(1 / 16, 1 / 16), tta=True)
            run3 = make_pipeline("swin_unet/art_scan", 4, 3, cfg3, img_hw,
                                 fused_block=True)
            force(run3(img512))
            v, f = measure_stream(run3, img512, 4, img_hw, iters=8,
                                  warm=4)
            return {"MPps": round(v, 1), "fps": round(f, 2),
                    "mode": "tile 128, streamed (cross-image)"}
        row("config3_artscan4x_tta_512", config3)

        # config 4: swin_unet/photo 2x on 720p frames (video-rate proxy;
        # the encode/decode pipes run in other processes by design).
        # batch 16 shares the model program with config 5b.
        def config4():
            cfg4 = RenderConfig(
                precision=Precision.FP16, batch_size=16, height=256,
                width=256, scaling=2, overlap=(1 / 16, 1 / 16))
            run4 = make_pipeline("swin_unet/photo", 2, -1, cfg4, frame_hw,
                                 fused_block=True)
            force(run4(frame))
            v, f = measure_stream(run4, frame, 2, frame_hw, iters=12,
                                  warm=4)
            config4.run = run4
            return {"MPps": round(v, 1), "fps_720p_to_1440p": round(f, 2),
                    "mode": "streamed, batch 16"}
        row("config4_photo2x_720p_video", config4)

        # config 5: max-throughput -- tile 640, 4K (2160x3840) frames,
        # swin_unet/photo 2x; plus the measured-best 4K row (tile 256
        # streamed -- reuses config 4's model program) so the t640 gap
        # is recorded next to its remedy (VERDICT r3 item 8).
        hw4k = (2160, 3840)

        def config5():
            cfg5 = RenderConfig(
                precision=Precision.FP16, batch_size=4, height=640,
                width=640, scaling=2, overlap=(1 / 16, 1 / 16))
            frame4k = make_frame(hw4k, seed=2)
            run5 = make_pipeline("swin_unet/photo", 2, -1, cfg5, hw4k,
                                 fused_block=True)
            force(run5(frame4k))
            v, f = measure(run5, frame4k, 2, hw4k, iters=3)
            config5.frame4k = frame4k
            return {"MPps": round(v, 1), "fps_4k_to_8k_equiv": round(f, 2),
                    "tiles": run5.plan.tile_count}
        row("config5_4k_tile640_photo2x", config5)

        def config5b():
            frame4k = getattr(config5, "frame4k", None)
            if frame4k is None:
                frame4k = make_frame(hw4k, seed=2)
            base = getattr(config4, "run", None)
            if base is not None:
                run5b = reuse(base)
            else:
                cfg5b = RenderConfig(
                    precision=Precision.FP16, batch_size=16, height=256,
                    width=256, scaling=2, overlap=(1 / 16, 1 / 16))
                run5b = make_pipeline("swin_unet/photo", 2, -1, cfg5b,
                                      hw4k, fused_block=True)
            force(run5b(frame4k))
            v, f = measure_stream(run5b, frame4k, 2, hw4k, iters=6,
                                  warm=2)
            plan5b = run5b.pipeline.get(hw4k)[2]
            return {"MPps": round(v, 1), "fps": round(f, 2),
                    "tiles": plan5b.tile_count}
        row("config5b_4k_tile256_photo2x_streamed", config5b)

        # config 2: swin_unet/art 4x noise 3, tile 256, BATCH 4, bf16,
        # blend 1/16 (headline uses batch 16; this is the doc-exact row).
        def config2():
            cfg2 = RenderConfig(
                precision=Precision.FP16, batch_size=4, height=256,
                width=256, scaling=4, overlap=(1 / 16, 1 / 16))
            run2 = make_pipeline("swin_unet/art", 4, 3, cfg2, frame_hw,
                                 fused_block=True)
            force(run2(frame))
            v, f = measure(run2, frame, 4, frame_hw, iters=4)
            return {"MPps": round(v, 1), "fps": round(f, 2)}
        row("config2_swin4x_b4_720p", config2)

        # config 7: graph-backed serving -- a bare full-size .onnx export
        # (no converted .npz) served through the parsed-graph backend at
        # bf16 (--precision fp16 semantics; onnx_backend.GraphModule).
        # The reference's hand-any-ONNX workflow (img2img_build.cpp:88)
        # measured on its own terms. LAST row: the batch-vmapped 1500-op
        # graph compile is ~55 s warm-cache but up to tens of minutes on
        # a cold remote compile.
        def config7():
            import dataclasses as _dc
            import pathlib
            import tempfile

            from waifu2x_tensorrt_tpu.engine.renderer import (
                ChunkedPipeline as _CP,
            )
            from waifu2x_tensorrt_tpu.models.convert import (
                state_from_flax,
                swin_mapping,
            )
            from waifu2x_tensorrt_tpu.models.onnx_backend import (
                load_graph_model,
            )
            from waifu2x_tensorrt_tpu.models.onnx_build import (
                build_swin_onnx,
            )
            from waifu2x_tensorrt_tpu.models.registry import (
                _flatten,
                get_spec,
                init_params_host,
            )
            from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

            depths = (2, 2, 6, 2, 2)
            mod7 = SwinUNet(scale=4, base_dim=96, depths=depths,
                            dtype=jnp.float32)
            # fresh host init (NOT _PARAMS_CACHE: those are device
            # arrays; flattening would fetch hundreds of leaves through
            # the tunnel)
            flat7 = {k: np.asarray(v) for k, v in _flatten(
                init_params_host(mod7, tile=32)).items()}
            state7 = state_from_flax(flat7, swin_mapping(4, depths))
            art7 = pathlib.Path(tempfile.mkdtemp()) / "scale4x.onnx"
            build_swin_onnx(state7, 4, (256, 256), art7, base_dim=96,
                            depths=depths)
            gmod, arch7, gparams = load_graph_model(
                art7, compute_dtype=jnp.bfloat16)
            base7 = get_spec("swin_unet/art", 4, -1)
            spec7 = _dc.replace(
                base7, offset=arch7.offset,
                tile_divisor=max(base7.tile_divisor, arch7.window * 4))
            cfg7 = RenderConfig(
                precision=Precision.FP16, batch_size=4, height=256,
                width=256, scaling=4, overlap=(1 / 16, 1 / 16))
            pl7 = _CP(gmod, spec7, cfg7)
            gparams = jax.device_put(gparams)
            run7 = lambda fr: pl7.render(gparams, fr)  # noqa: E731
            t0 = time.perf_counter()
            force(run7(frame))
            log(f"[bench] graph-backed pipeline ready in "
                f"{time.perf_counter() - t0:.1f}s")
            v7, f7 = measure(run7, frame, 4, frame_hw, iters=6)
            return {"MPps": round(v7, 1), "fps": round(f7, 2),
                    "artifact_MB": round(art7.stat().st_size / 1e6, 1),
                    "mode": "bare .onnx, bf16 + fp32 islands"}
        row("config7_graph_serving_bf16", config7)

    log(json.dumps({"aux": aux}))
    flush_aux()


if __name__ == "__main__":
    if "--ready-probe" in sys.argv:
        ready_probe()
        sys.exit(0)
    try:
        main()
    except RuntimeError as e:
        # transient axon-tunnel outage (observed 2026-08-18: backend init
        # raises UNAVAILABLE for stretches of minutes-to-hours). A failed
        # jax backend cannot re-initialize in-process, so retry by
        # re-exec'ing — fresh interpreter, fresh plugin registration, and
        # the per-run budget clock restarts with it.
        attempts = int(os.environ.get("BENCH_INIT_RETRIES", "4"))
        if "Unable to initialize backend" in str(e) and attempts > 0:
            log(f"[bench] TPU backend unavailable ({e}); retrying in 120 s "
                f"({attempts} attempts left)")
            time.sleep(120)
            os.environ["BENCH_INIT_RETRIES"] = str(attempts - 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
