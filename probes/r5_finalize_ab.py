"""Round-5 A/B: Pallas gather epilogue vs XLA scan finalize.

VERDICT r4 item 4: finalize is the last unfused ~4 ms/frame. The
epilogue (ops/finalize_epilogue.py) replaces scan-RMW + cast with a
one-pass gather kernel, bit-identical on CPU. This probe measures the
headline stream both ways on the real chip and byte-compares one frame.

Run from the repo root with the axon tunnel up and NOTHING else using
the TPU:

    python probes/r5_finalize_ab.py
"""
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import bench  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    bench._probe_devices(
        float(os.environ.get("BENCH_INIT_TIMEOUT_S", "480")))
    from waifu2x_tensorrt_tpu.engine import exe_cache

    exe_cache.configure(bench._bench_cache_root())

    frame_hw, _tile, _batch, scale, config = bench.headline_setup()
    frame = bench.make_frame(frame_hw)
    results = {}
    outs = {}
    for name, env in (("scan", ""), ("epilogue", "1")):
        os.environ["WAIFU2X_PALLAS_FINALIZE"] = env
        t0 = time.perf_counter()
        run = bench.make_pipeline("swin_unet/art", scale, 3, config,
                                  frame_hw, fused_block=True)
        fin = run.pipeline.get(frame_hw)[1]
        is_epi = getattr(fin, "is_epilogue", False)
        if name == "epilogue" and not is_epi:
            print("epilogue NOT APPLICABLE at headline geometry — abort",
                  flush=True)
            return
        bench.force(run(frame))
        log(f"[ab] {name} ready {time.perf_counter() - t0:.0f}s "
            f"(is_epilogue={is_epi})")
        outs[name] = np.asarray(run(frame))
        v, f = bench.measure_stream(run, frame, scale, frame_hw)
        vp, _fp = bench.measure(run, frame, scale, frame_hw, iters=8)
        results[name] = (v, vp)
        print(f"{name}: streamed {v:.1f} MP/s, per-frame {vp:.1f} MP/s",
              flush=True)
    same = np.array_equal(outs["scan"], outs["epilogue"])
    print(f"byte-identical on TPU: {same}", flush=True)
    if not same:
        d = np.abs(outs["scan"].astype(int) - outs["epilogue"].astype(int))
        print(f"  max {d.max()}, frac {(d > 0).mean():.2e}", flush=True)
    sv, sp = results["scan"]
    ev, ep = results["epilogue"]
    print(f"speedup: streamed {ev / sv:.3f}x, per-frame {ep / sp:.3f}x",
          flush=True)


if __name__ == "__main__":
    main()
