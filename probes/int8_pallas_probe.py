"""Path (b) of the int8 feasibility study: Mosaic in-kernel dot rates.

probes/int8_matmul_probe.py (path (a), plain XLA dots) measured int8 at
0.93-1.01x bf16 — but BOTH rates sat ~10x below the fused kernels' known
28 TF/s, so the XLA probe is shape/layout-bound and cannot resolve the
hardware question (v5e lists 394 int8 TOPS vs 197 bf16 TFLOPS). This
probe times the MXU directly: one Pallas kernel per (dtype, shape) runs
R serialized dots on VMEM-resident operands (the loop carry perturbs the
lhs each iteration so Mosaic cannot hoist or fold the dot), so dispatch
(~3 ms/call through the axon tunnel) and HBM traffic are amortized away.

Decision gate for an int8 serving precision: pursue only if the int8
in-kernel rate is >=1.5x bf16 at BOTH the ideal shape and the stage-1
qkv shape. Run from the repo root, tunnel up, nothing else on the TPU:

    python probes/int8_pallas_probe.py
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

bench._probe_devices(240.0)

# (name, M, K, N): an MXU-ideal control and the fused stage-1 GEMM
# geometries (wb=32 windows x 64 tokens, C=96).
SHAPES = [
    ("ideal 512^2xK1024", 512, 1024, 512),
    ("qkv s1 (2048,96,288)", 2048, 96, 288),
    ("fc1 s1 (2048,96,384)", 2048, 96, 384),
    ("fc2 s1 (2048,384,96)", 2048, 384, 96),
]
R = 2048  # serialized in-kernel dots per call


def _kernel(a_ref, b_ref, o_ref, *, acc_dtype, reps):
    # Anti-hoist/anti-DCE design (Mosaic rejects i8 VECTOR arithmetic —
    # "Only vector<i16> and vector<i32>" — so the lhs perturbation cannot
    # be an elementwise add): the lhs alternates between two VMEM-resident
    # copies via a dynamic leading index (not hoistable), and the carry
    # feeds back through `acc >> 31` / `acc * 0` (not foldable: sign bits
    # resp. NaN semantics), so every dot must execute in order.
    b = b_ref[:]
    integer = jnp.issubdtype(acc_dtype, jnp.integer)

    def body(i, acc):
        a = a_ref[i % 2]
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype) + (
                (acc >> 31) if integer else acc * 0)

    acc = jnp.zeros(o_ref.shape, acc_dtype)
    o_ref[:] = jax.lax.fori_loop(0, reps, body, acc)


@functools.partial(jax.jit, static_argnames=("acc_dtype", "reps"))
def run(a, b, acc_dtype, reps):
    return pl.pallas_call(
        functools.partial(_kernel, acc_dtype=acc_dtype, reps=reps),
        out_shape=jax.ShapeDtypeStruct((a.shape[1], b.shape[1]),
                                       acc_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


def time_call(a, b, acc_dtype, outer=10):
    a = jnp.stack([a, a])  # double-buffered lhs for the in-kernel rotate
    jax.block_until_ready(run(a, b, acc_dtype, R))
    np.asarray(jax.device_get(run(a, b, acc_dtype, R)[0, 0]))  # true sync
    t0 = time.perf_counter()
    for _ in range(outer):
        o = run(a, b, acc_dtype, R)
    jax.block_until_ready(o)
    np.asarray(jax.device_get(o[0, 0]))  # tunnel: fetch to time
    return (time.perf_counter() - t0) / outer


rng = np.random.default_rng(0)
for name, m, k, n in SHAPES:
    a8 = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (m, k), np.int8)))
    b8 = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (k, n), np.int8)))
    abf = jax.device_put(jnp.asarray(
        rng.standard_normal((m, k)).astype(np.float32)).astype(jnp.bfloat16))
    bbf = jax.device_put(jnp.asarray(
        rng.standard_normal((k, n)).astype(np.float32)).astype(jnp.bfloat16))
    flops = 2.0 * m * k * n * R
    t_bf = time_call(abf, bbf, jnp.float32)
    t_i8 = time_call(a8, b8, jnp.int32)
    print(f"{name:24s}: bf16 {flops / t_bf / 1e12:7.1f} TF/s"
          f"  int8 {flops / t_i8 / 1e12:7.1f} TOP/s"
          f"  speedup {t_bf / t_i8:4.2f}x", flush=True)
