"""Feasibility probe: int8 vs bf16 matmul throughput on v5e at model shapes.

The fused Swin kernels' GEMMs are narrow-K (C=96/192, mlp 4C); v5e's MXU
lists 394 int8 TOPS vs 197 bf16 TFLOPS. This probe measures whether that
2x is reachable (a) through plain XLA dots at the model's GEMM shapes and
(b) through a Pallas kernel (Mosaic int8 dot support). Decision gate for
an int8 serving precision: proceed only if (a) shows >=1.3x at stage-1
shapes.

Run from the repo root, tunnel up, nothing else on the TPU:

    python probes/int8_matmul_probe.py
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

bench._probe_devices(240.0)

# (M, K, N) GEMM shapes from the fused stage-1/stage-2 blocks
# (stage-1: 4096 windows x 64 tokens folded to rows, C=96; qkv 96->288,
# fc1 96->384, fc2 384->96; stage-2 decoder C~192 analogues) + a square
# MXU-friendly control.
SHAPES = [
    ("qkv s1", 16 * 4096, 96, 288),
    ("fc1 s1", 16 * 4096, 96, 384),
    ("fc2 s1", 16 * 4096, 384, 96),
    ("ctrl 2048^3", 2048, 2048, 2048),
]


def time_fn(f, *args, reps=30):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else \
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    # fetch to defeat the tunnel's lying block_until_ready (BENCH_NOTES)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0][0, 0]))
    return (time.perf_counter() - t0) / reps


@functools.partial(jax.jit, static_argnames=("n_loop",))
def mm_bf16(a, b, n_loop=8):
    def body(c, _):
        return jnp.dot(a + c.astype(a.dtype)[:, :1] * 0, b,
                       preferred_element_type=jnp.float32), None
    c0 = jnp.zeros((a.shape[0], b.shape[1]), jnp.float32)
    c, _ = jax.lax.scan(body, c0, None, length=n_loop)
    return c


@functools.partial(jax.jit, static_argnames=("n_loop",))
def mm_int8(a, b, n_loop=8):
    def body(c, _):
        return jnp.dot(a + (c[:, :1] & 0).astype(a.dtype), b,
                       preferred_element_type=jnp.int32), None
    c0 = jnp.zeros((a.shape[0], b.shape[1]), jnp.int32)
    c, _ = jax.lax.scan(body, c0, None, length=n_loop)
    return c


rng = np.random.default_rng(0)
N_LOOP = 8
for name, m, k, n in SHAPES:
    a8 = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (m, k), np.int8)))
    b8 = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (k, n), np.int8)))
    abf = jax.device_put(jnp.asarray(
        rng.standard_normal((m, k)).astype(np.float32)).astype(jnp.bfloat16))
    bbf = jax.device_put(jnp.asarray(
        rng.standard_normal((k, n)).astype(np.float32)).astype(jnp.bfloat16))
    t_bf = time_fn(lambda a, b: mm_bf16(a, b, N_LOOP), abf, bbf)
    t_i8 = time_fn(lambda a, b: mm_int8(a, b, N_LOOP), a8, b8)
    flops = 2.0 * m * k * n * N_LOOP
    print(f"{name:14s} M{m} K{k} N{n}: bf16 {flops/t_bf/1e12:7.1f} TF/s"
          f"  int8 {flops/t_i8/1e12:7.1f} TOP/s"
          f"  speedup {t_bf/t_i8:4.2f}x", flush=True)
