"""Headline benchmark: upscaled output megapixels/sec/chip.

Flagship config (BASELINE.md config 2 / north-star metric):
swin_unet/art scale=4 noise=3, tile 256, batch 4, bf16 ("fp16" CLI
precision), blend 1/16 — rendering 720p frames through the full jitted
pipeline (pad → tile gather → model → blend → scatter-add → u8).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no numbers (SURVEY.md §6); the
BASELINE.md target is >=2x an (unmeasured) TensorRT-fp16 RTX-4090 run of
swin_unet 4x. We use an engineering estimate for that GPU baseline,
derived from the model's measured FLOPs/output-pixel and 165 TFLOP/s
fp16 tensor-core peak at a generous 45% sustained MFU for TensorRT CNN+
attention workloads; see BENCH_NOTES.md. vs_baseline = value / estimate.
"""

import json
import os
import sys
import time

# Run on the ambient platform (the real TPU under the driver; CPU if forced).
os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.renderer import make_render_fn
    from waifu2x_tensorrt_tpu.models.registry import create_model, init_params

    frame_hw = (720, 1280)
    tile = 256
    batch = 8
    scale = 4
    config = RenderConfig(
        precision=Precision.FP16,
        batch_size=batch,
        height=tile,
        width=tile,
        scaling=scale,
        overlap=(1 / 16, 1 / 16),
        tta=False,
    )
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    module, spec = create_model(
        "swin_unet/art", scale, 3, dtype=config.precision.dtype,
        use_pallas=on_tpu, fused_block=on_tpu,
    )
    t0 = time.perf_counter()
    params = init_params(module, tile=32)
    params = jax.device_put(params)
    print(f"[bench] params init {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (*frame_hw, 3), np.uint8)
    frame_dev = jax.device_put(jnp.asarray(frame))

    # Compile + warmup. Timing notes (BENCH_NOTES.md): block_until_ready
    # returns early on the axon remote platform, so completion is forced
    # with a small strided fetch (device executes programs in order, so
    # fetching the last bounds the batch). The FULL frame download is
    # measured separately: through the axon tunnel it costs ~1.6 s/frame
    # of pure network transfer, which a real TPU host's PCIe does in
    # ~2 ms — the headline is the device-complete render rate.
    def force(o):
        return float(jnp.sum(o[::512, ::512].astype(jnp.int32)))

    t0 = time.perf_counter()
    try:
        fn = make_render_fn(module, spec, config, frame_hw)
        prog = jax.jit(fn)
        force(prog(params, frame_dev))
    except Exception as e:
        # whole-block kernel can flake at compile time (scoped-vmem,
        # NEXT_STEPS.md); fall back to the attention-only kernel so the
        # bench records a number instead of a crash.
        print(f"[bench] fused-block compile failed ({type(e).__name__}); "
              "falling back to attention-only kernels",
              file=sys.stderr, flush=True)
        module, spec = create_model(
            "swin_unet/art", scale, 3, dtype=config.precision.dtype,
            use_pallas=on_tpu, fused_block=False,
        )
        fn = make_render_fn(module, spec, config, frame_hw)
        prog = jax.jit(fn)
        force(prog(params, frame_dev))
    compile_s = time.perf_counter() - t0
    print(f"[bench] render program compile+first-run {compile_s:.1f}s "
          f"({fn.plan.tile_count} tiles, {fn.n_chunks} chunks)",
          file=sys.stderr, flush=True)
    force(prog(params, frame_dev))

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        out = prog(params, frame_dev)
    force(out)
    dt = time.perf_counter() - t0

    # tunnel-limited end-to-end (full 4x-frame download included)
    t0 = time.perf_counter()
    np.asarray(prog(params, frame_dev))
    fetch_dt = time.perf_counter() - t0

    out_mp = (frame_hw[0] * scale) * (frame_hw[1] * scale) / 1e6
    mpps = iters * out_mp / dt
    fps = iters / dt

    # GPU-baseline estimate (see module docstring / BENCH_NOTES.md).
    baseline_mpps = 30.0

    result = {
        "metric": "upscaled_output_megapixels_per_sec_per_chip "
                  "(swin_unet/art 4x, tile 256, batch 8, bf16, 720p frames)",
        "value": round(mpps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mpps / baseline_mpps, 3),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "aux": {
                    "fps_720p_to_4x": round(fps, 3),
                    "fps_tunnel_limited_full_fetch": round(1.0 / fetch_dt, 3),
                    "compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                    "tiles_per_frame": fn.plan.tile_count,
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
