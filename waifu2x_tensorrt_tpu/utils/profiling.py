"""Tracing/profiling hooks (SURVEY.md §5 "Tracing / profiling").

The reference only has per-batch wall-clock it/s logging
(img2img_render.cpp:261,336-338). Here the same progress seam exists
(utils/logging.ProgressCallback) plus real profiler integration:
``trace(dir)`` captures a TensorBoard-loadable XLA profile of everything
inside the context, and ``annotate(name)`` adds named TraceMe ranges
(the TPU analogue of nvtx ranges).
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range context for profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)
