"""Config hashing for the AOT engine cache.

Reference: getConfigHash (src/tensorrt/img2img_build.cpp:8-27) hashes
``deviceName.PRECISION.minB.optB.maxB.minC...maxH`` with SHA-256 and uses the
first 16 hex chars in the engine filename. We keep the identical string
layout with the TPU device kind in place of the CUDA device name.
"""

from __future__ import annotations

import hashlib

from waifu2x_tensorrt_tpu.engine.config import BuildConfig


def device_kind(device_id: int = 0) -> str:
    """Accelerator identity folded into the cache key (reference uses
    cudaGetDeviceName, helper.h:12-57)."""
    try:
        import jax

        devices = jax.devices()
    except Exception:  # no accelerator backend at all
        return "cpu"
    if not 0 <= device_id < len(devices):
        # fail loudly like the reference (cudaSetDevice on a bad id):
        # clamping would hash — and cache engines under — a device the
        # user did not select
        raise ValueError(
            f"device id {device_id} out of range (have {len(devices)})")
    return f"{devices[device_id].device_kind}"


def config_hash(config: BuildConfig, device_name: str | None = None) -> str:
    name = device_name if device_name is not None else device_kind(config.device_id)
    name = "".join(name.split())  # strip whitespace like the reference
    parts = [
        name,
        config.precision.cache_tag,
        str(config.min_batch_size),
        str(config.opt_batch_size),
        str(config.max_batch_size),
        str(config.min_channels),
        str(config.opt_channels),
        str(config.max_channels),
        str(config.min_width),
        str(config.opt_width),
        str(config.max_width),
        str(config.min_height),
        str(config.opt_height),
        str(config.max_height),
    ]
    return hashlib.sha256(".".join(parts).encode()).hexdigest()


def short_hash(config: BuildConfig, device_name: str | None = None) -> str:
    """First 16 hex chars — the engine filename tag (img2img_build.cpp:151)."""
    return config_hash(config, device_name)[:16]
