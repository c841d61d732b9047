"""Probe: can this backend serialize/deserialize compiled executables?

VERDICT r4 item 1 — the reference deserializes a .trt in seconds
(/root/reference/src/tensorrt/img2img_load.cpp:157-172); match that UX by
persisting the compiled XLA executable. Two candidate mechanisms:

  A. jax.experimental.serialize_executable (PJRT executable serialize +
     deserialize_and_load) — skips trace+lower+COMPILE entirely.
  B. jax.export serialized StableHLO — skips trace+lower, still compiles.

Run:  JAX_PLATFORMS=cpu python probes/probe_serialize_exe.py   (API shape)
      python probes/probe_serialize_exe.py                      (axon TPU)
"""
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices())


def f(w, x):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y)


w = jnp.zeros((3, 3, 64, 64), jnp.bfloat16)
x = jnp.zeros((4, 64, 64, 64), jnp.bfloat16)

t0 = time.perf_counter()
compiled = jax.jit(f).lower(w, x).compile()
t1 = time.perf_counter()
print(f"compile: {t1 - t0:.2f}s")

# --- mechanism A: PJRT executable serialization ---
try:
    from jax.experimental import serialize_executable as se

    t0 = time.perf_counter()
    payload, in_tree, out_tree = se.serialize(compiled)
    t1 = time.perf_counter()
    blob = pickle.dumps((payload, in_tree, out_tree))
    print(f"A serialize ok: {t1 - t0:.2f}s, payload {len(payload)} B, "
          f"pickled {len(blob)} B")
    t0 = time.perf_counter()
    payload2, it2, ot2 = pickle.loads(blob)
    loaded = se.deserialize_and_load(payload2, it2, ot2)
    t1 = time.perf_counter()
    print(f"A deserialize_and_load ok: {t1 - t0:.2f}s")
    t0 = time.perf_counter()
    out = loaded(w, x)
    np.asarray(out)
    t1 = time.perf_counter()
    print(f"A call ok: {t1 - t0:.2f}s, out {out.shape} {out.dtype}")
except Exception as e:
    print(f"A FAILED: {type(e).__name__}: {e}")

# --- mechanism B: jax.export (StableHLO) ---
try:
    from jax import export

    t0 = time.perf_counter()
    exp = export.export(jax.jit(f))(
        jax.ShapeDtypeStruct(w.shape, w.dtype),
        jax.ShapeDtypeStruct(x.shape, x.dtype))
    data = exp.serialize()
    t1 = time.perf_counter()
    print(f"B export+serialize ok: {t1 - t0:.2f}s, {len(data)} B")
    t0 = time.perf_counter()
    exp2 = export.deserialize(data)
    out = jax.jit(exp2.call)(w, x)
    np.asarray(out)
    t1 = time.perf_counter()
    print(f"B deserialize+call ok: {t1 - t0:.2f}s")
except Exception as e:
    print(f"B FAILED: {type(e).__name__}: {e}")
