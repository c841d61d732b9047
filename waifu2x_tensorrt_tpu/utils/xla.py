"""Per-compile XLA options for the TPU render programs.

The terminal that owns the PJRT runtime pins XLA_FLAGS, so env-level
flags cannot be set from this client — but per-jit ``compiler_options``
ARE forwarded through the remote-compile path (verified v5e 2026-08).
"""

from __future__ import annotations

from typing import Optional


def tpu_compiler_options() -> Optional[dict]:
    """Compiler options for model/render programs on TPU; None elsewhere.

    ``xla_tpu_scoped_vmem_limit_kib=65536``: XLA sometimes stack-allocates a
    pallas_call's OUTPUT in scoped VMEM and trips the default 16 MB limit —
    compile-state-dependent, so the same kernel shape can flake between runs
    (NEXT_STEPS.md round 1). Raising the limit to 64 MB removes the failure
    mode at the source (the fused-kernel fallback in Upscaler remains as a
    belt-and-suspenders seam) and lets larger kernel grids compile.
    """
    import jax

    if jax.default_backend() in ("cpu", "gpu"):
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": "65536"}
