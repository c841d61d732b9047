"""A/B the bf16 LayerNorm variance forms on the headline stream.

Forms (ops/kernel_math.layernorm, selected by WAIFU2X_TPU_LN at trace
time): "floor" = naive MXU dots + relative variance floor (zero extra
elementwise passes); "pilot" = shifted-moments (row-exact, one extra
subtract pass per LN). Cross-run comparisons through the axon tunnel
carry several-percent drift, so this probe compiles and measures both
forms in ONE process, back-to-back on the same stream.

Run from the repo root with the tunnel up and NOTHING else on the TPU:

    python probes/ln_form_ab.py [form ...]   # default: floor pilot
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax

import bench

jax.config.update("jax_compilation_cache_dir", ".jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Backend-init watchdog: fail fast on tunnel outage (ADVICE r3 pattern).
bench._probe_devices(float(os.environ.get("BENCH_INIT_TIMEOUT_S", "480")))

frame_hw, tile, batch, scale, config = bench.headline_setup()
frame = bench.make_frame(frame_hw)

# Pre-warm params so the first form's compile timing excludes the
# one-time device_put params init.
bench.prewarm_params("swin_unet/art", scale, 3, config)

forms = sys.argv[1:] or ["floor", "pilot"]
for form in forms:
    os.environ["WAIFU2X_TPU_LN"] = form  # read at trace time
    t0 = time.perf_counter()
    run = bench.make_pipeline("swin_unet/art", scale, 3, config, frame_hw,
                              fused_block=True)
    bench.force(run(frame))
    print(f"[probe] ln_form={form} compiled in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    mpps, fps = bench.measure_stream(run, frame, scale, frame_hw)
    print(f"ln_form={form}: {mpps:.1f} MP/s streamed, {fps:.2f} fps",
          flush=True)
