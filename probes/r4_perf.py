"""Round-4 perf probe: TTA (BASELINE config 3) and cunet (config 1) levers.

VERDICT r3 items 2 and 3: profile both non-headline families and measure
the obvious levers (streaming, batch, tile size incl. whole-frame, bf16).

Run from the repo root with the axon tunnel up and NOTHING else using the
TPU (one tunnel client at a time):

    python probes/r4_perf.py tta          # config3 lever matrix
    python probes/r4_perf.py cunet        # config1 lever matrix
    python probes/r4_perf.py trace-tta    # device trace -> /tmp/r4_trace
    python probes/r4_perf.py trace-cunet
    python probes/r4_perf.py summarize /tmp/r4_trace/...   # host-only
"""
import os
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _tpu_setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    bench._probe_devices(
        float(os.environ.get("BENCH_INIT_TIMEOUT_S", "480")))


def _run_cfg(name, family, noise, scale, tile, batch, precision, img_hw,
             img, stream=False, iters=4, fused=None, warm=3):
    from waifu2x_tensorrt_tpu.engine.config import RenderConfig

    cfg = RenderConfig(
        precision=precision, batch_size=batch, height=tile, width=tile,
        scaling=scale, overlap=(1 / 16, 1 / 16),
        tta=family.startswith("swin") and "tta" in name,
    )
    if fused is None:
        fused = family.startswith("swin")
    t0 = time.perf_counter()
    run = bench.make_pipeline(family, scale, noise, cfg, img_hw,
                              fused_block=fused)
    bench.force(run(img))
    log(f"[probe] {name} ready {time.perf_counter() - t0:.0f}s, "
        f"tiles={run.plan.tile_count}, chunks={run.chunk_sizes}")
    if stream:
        v, f = bench.measure_stream(run, img, scale, img_hw, iters=iters,
                                    warm=warm)
    else:
        v, f = bench.measure(run, img, scale, img_hw, iters=iters)
    print(f"{name}: {v:.1f} MP/s, {f:.2f} frames/s", flush=True)
    return run, v


def tta_phase():
    from waifu2x_tensorrt_tpu.engine.config import Precision

    _tpu_setup()
    img_hw = (512, 512)
    img = bench.make_frame(img_hw)
    A = "swin_unet/art_scan"
    _run_cfg("tta_t256_b8_perframe(config3-exact)", A, 3, 4, 256, 8,
             Precision.FP16, img_hw, img, iters=4)
    _run_cfg("tta_t256_b8_streamed", A, 3, 4, 256, 8,
             Precision.FP16, img_hw, img, stream=True, iters=6)
    _run_cfg("tta_t256_b16_streamed", A, 3, 4, 256, 16,
             Precision.FP16, img_hw, img, stream=True, iters=6)
    _run_cfg("tta_t128_b16_streamed", A, 3, 4, 128, 16,
             Precision.FP16, img_hw, img, stream=True, iters=6)
    _run_cfg("tta_t0_b8_wholeframe", A, 3, 4, 0, 8,
             Precision.FP16, img_hw, img, iters=4)


def cunet_phase():
    from waifu2x_tensorrt_tpu.engine.config import Precision

    _tpu_setup()
    img_hw = (512, 512)
    img = bench.make_frame(img_hw)
    C = "cunet/art"
    _run_cfg("cunet_t256_b1_fp32(config1-exact)", C, 1, 2, 256, 1,
             Precision.TF32, img_hw, img, iters=6)
    _run_cfg("cunet_t256_b4_bf16", C, 1, 2, 256, 4,
             Precision.FP16, img_hw, img, iters=6)
    _run_cfg("cunet_t256_b4_bf16_streamed", C, 1, 2, 256, 4,
             Precision.FP16, img_hw, img, stream=True, iters=8)
    _run_cfg("cunet_t0_b1_bf16_wholeframe", C, 1, 2, 0, 1,
             Precision.FP16, img_hw, img, iters=8)
    _run_cfg("cunet_t0_b1_fp32_wholeframe", C, 1, 2, 0, 1,
             Precision.TF32, img_hw, img, iters=6)
    _run_cfg("cunet_t0_b2_bf16_wholeframe_streamed", C, 1, 2, 0, 2,
             Precision.FP16, img_hw, img, stream=True, iters=8)
    _run_cfg("cunet_t0_b4_bf16_wholeframe_streamed", C, 1, 2, 0, 4,
             Precision.FP16, img_hw, img, stream=True, iters=8)


def tta_b_phase():
    """config3-EXACT-batch rows at the faster tile sizes (VERDICT item 3):
    BASELINE config 3 pins batch=8 + TTA but leaves tileSize free."""
    from waifu2x_tensorrt_tpu.engine.config import Precision

    _tpu_setup()
    img_hw = (512, 512)
    img = bench.make_frame(img_hw)
    A = "swin_unet/art_scan"
    _run_cfg("tta_t128_b8_streamed(config3-exact)", A, 3, 4, 128, 8,
             Precision.FP16, img_hw, img, stream=True, iters=6)
    _run_cfg("tta_t0_b8_streamed", A, 3, 4, 0, 8,
             Precision.FP16, img_hw, img, stream=True, iters=6)


def cunet_ct_phase():
    """A/B ct_as_shuffle (k2s2 ConvTranspose -> GEMM+depth-to-space) on
    the shipped cunet rows. Motivated by the config1c device trace: the
    transposed-conv interior-pad lowering shows up as broadcast+select
    passes and full-res relayout copies (~33% of device time is raw
    copies)."""
    from waifu2x_tensorrt_tpu.engine.config import Precision

    _tpu_setup()
    img_hw = (512, 512)
    img = bench.make_frame(img_hw)
    C = "cunet/art"
    for name, tile, batch, stream, kw in (
        ("t0_b4_bf16_streamed(config1c) base", 0, 4, True, {}),
        ("t0_b4_bf16_streamed(config1c) ctshuf", 0, 4, True,
         {"ct_as_shuffle": True}),
        ("t256_b4_bf16_streamed base", 256, 4, True, {}),
        ("t256_b4_bf16_streamed ctshuf", 256, 4, True,
         {"ct_as_shuffle": True}),
        ("t0_b8_bf16_streamed ctshuf", 0, 8, True,
         {"ct_as_shuffle": True}),
    ):
        from waifu2x_tensorrt_tpu.engine.config import RenderConfig
        cfg = RenderConfig(precision=Precision.FP16, batch_size=batch,
                           height=tile, width=tile, scaling=2,
                           overlap=(1 / 16, 1 / 16))
        t0 = time.perf_counter()
        run = bench.make_pipeline(C, 2, 1, cfg, img_hw, fused_block=False,
                                  **kw)
        bench.force(run(img))
        log(f"[probe] {name} ready {time.perf_counter() - t0:.0f}s")
        if stream:
            v, f = bench.measure_stream(run, img, 2, img_hw, iters=8,
                                        warm=4)
        else:
            v, f = bench.measure(run, img, 2, img_hw, iters=6)
        print(f"{name}: {v:.1f} MP/s, {f:.2f} frames/s", flush=True)


def trace_phase(which: str):
    import jax

    from waifu2x_tensorrt_tpu.engine.config import Precision

    _tpu_setup()
    img_hw = (512, 512)
    img = bench.make_frame(img_hw)
    if which == "tta":
        run, _ = _run_cfg("tta_t256_b8_trace", "swin_unet/art_scan", 3, 4,
                          256, 8, Precision.FP16, img_hw, img, iters=2)
    elif which == "cunet-best":
        # config1c geometry (the shipped best-levers bench row): whole-
        # frame tile, bf16, batch 4 — what binds the 37 MP/s row?
        run, _ = _run_cfg("cunet_t0_b4_bf16_trace", "cunet/art", 1, 2,
                          0, 4, Precision.FP16, img_hw, img, iters=2)
    elif which == "cunet-fp32":
        # config1-exact geometry: the row VERDICT item 2 asks to explain
        run, _ = _run_cfg("cunet_t256_b1_fp32_trace", "cunet/art", 1, 2,
                          256, 1, Precision.TF32, img_hw, img, iters=2)
    else:
        run, _ = _run_cfg("cunet_t256_b4_trace", "cunet/art", 1, 2,
                          256, 4, Precision.FP16, img_hw, img, iters=2)
    out_dir = f"/tmp/r4_trace_{which}"
    if which == "cunet-best":
        # config1c is a STREAMED row (4 whole-frame tiles per dispatch);
        # trace the stream, not per-frame batch-1 renders.
        from waifu2x_tensorrt_tpu.engine.renderer import TileStream

        stream = TileStream(run.pipeline, run.params, img_hw)
        for _ in range(8):
            stream.submit(img)
        jax.profiler.start_trace(out_dir)
        out = None
        for _ in range(8):
            outs = stream.submit(img)
            if outs:
                out = outs[-1]
        bench.force(out)
        jax.profiler.stop_trace()
    else:
        jax.profiler.start_trace(out_dir)
        for _ in range(3):
            out = run(img)
        bench.force(out)
        jax.profiler.stop_trace()
    print(f"trace written to {out_dir}", flush=True)


def summarize(trace_dir: str, top: int = 40):
    """Host-only: aggregate device-lane op durations from a trace.json.gz."""
    import glob
    import gzip
    import json
    from collections import defaultdict

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace.json.gz under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: process names containing "TPU"/"/device:" — find pids
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "device" in n.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tn = tid_name.get((e["pid"], e["tid"]), "")
        if "step" in tn.lower():  # XLA Ops lane only, skip step lanes
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        cnt[name] += 1
        total += dur
    print(f"device total: {total:.2f} ms over {sum(cnt.values())} events "
          f"(lanes: {sorted({tid_name.get((e['pid'], e['tid']), '') for e in events if e.get('ph') == 'X' and e.get('pid') in dev_pids})})")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:9.3f} ms  x{cnt[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "tta"
    if phase == "tta":
        tta_phase()
    elif phase == "tta-b":
        tta_b_phase()
    elif phase == "cunet":
        cunet_phase()
    elif phase == "cunet-ct":
        cunet_ct_phase()
    elif phase == "trace-tta":
        trace_phase("tta")
    elif phase == "trace-cunet":
        trace_phase("cunet")
    elif phase == "trace-cunet-best":
        trace_phase("cunet-best")
    elif phase == "trace-cunet-fp32":
        trace_phase("cunet-fp32")
    elif phase == "summarize":
        summarize(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 40)
    else:
        raise SystemExit(f"unknown phase {phase}")
