"""AOT engine build/load: compile cache + JSON sidecars.

TPU-native equivalent of the reference's TensorRT engine build/cache
(Img2Img::build, src/tensorrt/img2img_build.cpp:54-173; engine selection in
Img2Img::load / getEnginePath, src/tensorrt/img2img_load.cpp:79-114):

- ``build``: AOT-compiles the model tile-batch program
  (``jit(apply).lower().compile()``) for the opt shape, warms JAX's
  persistent compilation cache (so subsequent process launches reuse the
  XLA executable the way TensorRT reloads a serialized engine), and writes
  a human-readable JSON sidecar ``<stem>_<hash16>.json`` next to the
  weights — same content and naming scheme as serializeConfig
  (img2img_build.cpp:29-50,151-166) with the TPU device kind in place of
  the CUDA device name.
- ``find_engine``: directory scan + sidecar deserialize + optimized-exact
  vs compatible-range selection, porting getEnginePath semantics.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

from waifu2x_tensorrt_tpu.engine.config import (
    BuildConfig,
    Precision,
    RenderConfig,
    is_compatible,
    is_optimized,
    is_warm,
)
from waifu2x_tensorrt_tpu.utils.hashing import device_kind, short_hash

ENGINE_SUFFIX = ".engine.json"  # sidecar IS the engine descriptor


def compilation_cache_dir(models_dir: str | Path) -> Path:
    return Path(models_dir) / ".jax_cache"


def enable_persistent_cache(models_dir: str | Path) -> None:
    """Point JAX's persistent compilation cache at the model dir, mirroring
    the reference's 'engines live next to the model file' layout."""
    import jax

    cache_dir = compilation_cache_dir(models_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    changed = jax.config.jax_compilation_cache_dir != str(cache_dir)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if changed:
        # The cache object is created lazily ONCE and then ignores config
        # changes; drop it so the new directory actually takes effect when
        # one process serves several model dirs.
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()


def serialize_config(config: BuildConfig, device_name: Optional[str] = None) -> dict:
    """Sidecar JSON payload (field-for-field with serializeConfig,
    img2img_build.cpp:29-50)."""
    return {
        "deviceName": device_name or device_kind(config.device_id),
        "precision": config.precision.cache_tag,
        "minBatchSize": config.min_batch_size,
        "optBatchSize": config.opt_batch_size,
        "maxBatchSize": config.max_batch_size,
        "minChannels": config.min_channels,
        "optChannels": config.opt_channels,
        "maxChannels": config.max_channels,
        "minWidth": config.min_width,
        "optWidth": config.opt_width,
        "maxWidth": config.max_width,
        "minHeight": config.min_height,
        "optHeight": config.opt_height,
        "maxHeight": config.max_height,
    }


def deserialize_config(path: str | Path) -> tuple[BuildConfig, str]:
    """Parse a sidecar back into a BuildConfig (+ device name), porting
    deserializeConfig (img2img_load.cpp:54-77)."""
    with open(path) as f:
        j = json.load(f)
    cfg = BuildConfig(
        device_id=0,
        precision=Precision.FP16 if j["precision"] == "FP16" else Precision.TF32,
        min_batch_size=j["minBatchSize"],
        opt_batch_size=j["optBatchSize"],
        max_batch_size=j["maxBatchSize"],
        min_channels=j["minChannels"],
        opt_channels=j["optChannels"],
        max_channels=j["maxChannels"],
        min_width=j["minWidth"],
        opt_width=j["optWidth"],
        max_width=j["maxWidth"],
        min_height=j["minHeight"],
        opt_height=j["optHeight"],
        max_height=j["maxHeight"],
    )
    return cfg, j["deviceName"]


def engine_sidecar_path(weights_stem_path: Path, config: BuildConfig,
                        device_name: Optional[str] = None) -> Path:
    """``<model_stem>_<sha256(cfg)[:16]>.engine.json`` next to the weights
    (naming per img2img_build.cpp:151-155)."""
    tag = short_hash(config, device_name)
    return weights_stem_path.parent / f"{weights_stem_path.stem}_{tag}{ENGINE_SUFFIX}"


def write_engine_sidecar(weights_stem_path: Path, config: BuildConfig,
                         device_name: Optional[str] = None) -> Path:
    path = engine_sidecar_path(weights_stem_path, config, device_name)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(serialize_config(config, device_name), f, indent=4)
    return path


def find_engine(
    weights_stem_path: Path,
    render_config: RenderConfig,
    device_name: Optional[str] = None,
    dp: int = 1,
) -> Optional[tuple[Path, BuildConfig]]:
    """Scan the model dir for matching engine sidecars.

    Port of getEnginePath (img2img_load.cpp:79-114): files must start with
    the model stem; exact-opt matches win, else the first compatible one.
    The reference also matches on device identity via deviceId; we compare
    the recorded device kind string.
    """
    stem = weights_stem_path.stem
    directory = weights_stem_path.parent
    if not directory.is_dir():
        return None
    want_device = device_name or device_kind(render_config.device_id)
    best: Optional[tuple[Path, BuildConfig]] = None
    for path in sorted(directory.iterdir()):
        if not path.is_file():
            continue
        if not path.name.startswith(stem) or not path.name.endswith(ENGINE_SUFFIX):
            continue
        try:
            build_cfg, dev = deserialize_config(path)
        except (json.JSONDecodeError, KeyError):
            continue
        if dev != want_device:
            continue
        # Range-compatible is necessary but not sufficient: an XLA engine
        # only "exists" for geometries build() actually compiled (the
        # min/opt/max corners), unlike a TensorRT profile which executes
        # any in-range shape. Claiming an in-range-but-uncompiled match
        # would promise a warm engine and then compile from scratch.
        if is_compatible(render_config, build_cfg) and is_warm(
            render_config, build_cfg, dp=dp
        ):
            if is_optimized(render_config, build_cfg):
                return path, build_cfg
            if best is None:
                best = (path, build_cfg)
    return best
