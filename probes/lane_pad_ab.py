"""A/B the opt-in lane_pad full-res channel padding on the headline stream.

lane_pad (models/swin_unet.py) zero-pads the 48-channel stem/skip/
head-input passes to N vector lanes at trace time. Measured 2026-08-19 on
v5e (BENCH_NOTES "lane_pad measured"): LOSES at both 64 (470.1 MP/s) and
128 (461.4) vs the 475.3 MP/s unpadded default — the lane-aligned
elementwise passes get cheaper but padded-conv FLOPs + relayouts eat the
win. Kept for re-measurement on future XLA/Mosaic releases; run from the
repo root with the axon tunnel up and NOTHING else using the TPU:

    python probes/lane_pad_ab.py [lane ...]   # default: 0 64 128
"""
import sys
import time

sys.path.insert(0, ".")

import jax

import bench

jax.config.update("jax_compilation_cache_dir", ".jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Backend-init watchdog (ADVICE r3): the axon tunnel's outage mode
# includes an indefinite hang inside backend init; fail fast like
# bench.main instead of hanging the probe forever.
bench._probe_devices(float(__import__("os").environ.get(
    "BENCH_INIT_TIMEOUT_S", "480")))

# Headline config comes from bench.headline_setup — the probe measures
# the SAME stream the recorded headline number used (ADVICE r3).
frame_hw, tile, batch, scale, config = bench.headline_setup()
frame = bench.make_frame(frame_hw)

# Pre-warm params so the first lane's compile timing excludes the
# one-time ~60 s device_put params init (ADVICE r3).
bench.prewarm_params("swin_unet/art", scale, 3, config)

lanes = [int(a) for a in sys.argv[1:]] or [0, 64, 128]
for lane in lanes:
    t0 = time.perf_counter()
    run = bench.make_pipeline("swin_unet/art", scale, 3, config, frame_hw,
                              fused_block=True, lane_pad=lane)
    bench.force(run(frame))
    print(f"[probe] lane_pad={lane} compiled in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    mpps, fps = bench.measure_stream(run, frame, scale, frame_hw)
    print(f"lane_pad={lane}: {mpps:.1f} MP/s streamed, {fps:.2f} fps",
          flush=True)
