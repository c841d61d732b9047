"""Upscaler: the engine facade (reference class trt::Img2Img,
src/tensorrt/img2img.h:14-50).

Owns the model module + params, the jitted render programs, and the
message/progress callback seams. Public surface mirrors the reference:
``build()``, ``load()``, ``render()``, ``set_message_callback()``,
``set_progress_callback()`` — raising exceptions instead of returning
false (the CLI converts to exit codes, matching main.cpp:224-225,265-266).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from waifu2x_tensorrt_tpu.engine import cache as engine_cache
from waifu2x_tensorrt_tpu.engine import config as engine_config
from waifu2x_tensorrt_tpu.engine.config import BuildConfig, RenderConfig
from waifu2x_tensorrt_tpu.engine.renderer import RendererCache, bucket_frame
from waifu2x_tensorrt_tpu.models import registry
from waifu2x_tensorrt_tpu.utils.logging import Logger, Severity


class Upscaler:
    def __init__(self, models_dir: str | Path = "models") -> None:
        self.logger = Logger()
        self.models_dir = Path(models_dir)
        self._module = None
        self._spec: Optional[registry.ModelSpec] = None
        self._params = None
        self._renderers: Optional[RendererCache] = None
        self._render_config: Optional[RenderConfig] = None
        self._sharding = None
        self._bucket = 0
        self._device = None

    def _select_device(self, device_id: int):
        """Bind this engine to one accelerator (reference cudaSetDevice,
        img2img_build.cpp:57 / img2img_load.cpp:129). Params and frames are
        committed to the chosen device; jit follows input placement."""
        devices = jax.devices()
        if not (0 <= device_id < len(devices)):
            raise ValueError(
                f"--device {device_id} out of range: "
                f"{len(devices)} device(s) available"
            )
        self._device = devices[device_id]
        return self._device

    # -- callback seams (img2img_base.cpp:12-18) ---------------------------
    def set_message_callback(self, cb) -> None:
        self.logger.set_message_callback(cb)

    def set_progress_callback(self, cb) -> None:
        self.logger.set_progress_callback(cb)

    # -- build: AOT compile + sidecar (img2img_build.cpp:54-173) -----------
    def build(self, family: str, scale: int, noise: int,
              config: BuildConfig,
              use_pallas: Optional[bool] = None) -> None:
        registry.validate(family, scale, noise)
        self._select_device(config.device_id)
        engine_cache.enable_persistent_cache(self.models_dir)
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if use_pallas is None:
            use_pallas = on_tpu
        # must match load()'s model so the persistent-cache entry is the
        # one render() will look up
        module, spec = registry.create_model(
            family, scale, noise, dtype=config.precision.dtype,
            use_pallas=use_pallas, fused_block=use_pallas and on_tpu,
        )
        params, loaded = registry.load_or_init_params(
            module, self.models_dir, family, scale, noise,
            tile=config.opt_height,
            warn=lambda m: self.logger.log(Severity.warn, m),
        )
        shapes = engine_config.compiled_shapes(config)
        self.logger.log(
            Severity.info,
            f"Building engine for {family} scale={scale} noise={noise} "
            f"geometries={shapes} "
            f"precision={config.precision.cache_tag}",
        )
        t0 = time.perf_counter()
        # AOT-compile every corner geometry of the profile so any shape
        # find_engine() will later claim as a match is actually warm in the
        # persistent cache (the TensorRT profile executes any in-range
        # shape, img2img_build.cpp:101-120; XLA executables are
        # shape-specialized, so warm == compiled).
        apply_tiles = registry.tile_apply_fn(module)
        flops = 0.0
        for b, h, w in shapes:
            x = jax.ShapeDtypeStruct((b, h, w, 3), config.precision.dtype)
            compiled = jax.jit(apply_tiles).lower(params, x).compile()
            flops = max(flops, compiled.cost_analysis().get("flops", 0.0))
        dt = time.perf_counter() - t0
        stem = registry.weights_path(self.models_dir, family, scale, noise)
        sidecar = engine_cache.write_engine_sidecar(stem, config)
        self.logger.log(
            Severity.info,
            f"Engine built in {dt:.1f}s ({flops / 1e9:.1f} GFLOP/step at "
            f"opt); sidecar {sidecar.name}; persistent cache at "
            f"{engine_cache.compilation_cache_dir(self.models_dir)}",
        )

    # -- load: engine select + weights + renderer (img2img_load.cpp) -------
    def load(self, family: str, scale: int, noise: int,
             config: RenderConfig, sharding=None,
             require_engine: bool = False,
             use_pallas: Optional[bool] = None,
             bucket: int = 0) -> None:
        registry.validate(family, scale, noise)
        device = self._select_device(config.device_id)
        engine_cache.enable_persistent_cache(self.models_dir)
        stem = registry.weights_path(self.models_dir, family, scale, noise)
        found = engine_cache.find_engine(stem, config)
        if found is None:
            msg = (f"no prebuilt engine sidecar for {family} "
                   f"(tile={config.height}, batch={config.batch_size}); ")
            if require_engine:
                # reference hard-fails here (img2img_load.cpp:111-113)
                raise FileNotFoundError(
                    msg + "could not satisfy render configuration")
            self.logger.log(Severity.warn, msg + "compiling on first use")
        else:
            self.logger.log(Severity.info, f"Using engine {found[0].name}")

        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if use_pallas is None:
            # v5e measurements (pure model, batch 8): dense XLA 301 MP/s;
            # fused attention (bit-exact) 379; whole-block fusion 465 and
            # no further from fp32 truth than the dense bf16 path
            # (BENCH_NOTES.md). Whole-block fusion is the TPU default.
            use_pallas = on_tpu
        module, spec = registry.create_model(
            family, scale, noise, dtype=config.precision.dtype,
            use_pallas=use_pallas, fused_block=use_pallas and on_tpu,
        )
        params, from_file = registry.load_or_init_params(
            module, self.models_dir, family, scale, noise, tile=config.height,
            warn=lambda m: self.logger.log(Severity.warn, m),
        )
        self._module = module
        self._spec = spec
        # Committed placement: with a mesh sharding the mesh governs
        # placement; otherwise params live on the selected device and jit
        # executes there (the cudaSetDevice analogue).
        self._params = (jax.device_put(params) if sharding is not None
                        else jax.device_put(params, device))
        self._render_config = config
        self._sharding = sharding
        self._bucket = bucket
        self._renderers = RendererCache(module, spec, config, sharding)
        self._load_args = (family, scale, noise, config, sharding,
                           use_pallas)
        self._fused = use_pallas and on_tpu

    # -- render (img2img_render.cpp:224-352) -------------------------------
    def render(self, frame_u8: np.ndarray) -> np.ndarray:
        """Upscale one RGB uint8 HWC frame; returns RGB uint8 HWC."""
        if self._renderers is None:
            raise RuntimeError("load() must be called before render()")
        if frame_u8.ndim != 3 or frame_u8.shape[2] != 3:
            raise ValueError(f"expected (H, W, 3) frame, got {frame_u8.shape}")
        t0 = time.perf_counter()
        frame_u8, (oh, ow) = bucket_frame(np.ascontiguousarray(frame_u8),
                                          self._bucket)
        prog = self._renderers.get(frame_u8.shape[:2])
        try:
            out_dev = prog(self._params, frame_u8)
        except Exception as e:
            if not self._fused:
                raise
            # XLA occasionally scoped-vmem-OOMs compiling the whole-block
            # fused kernel (NEXT_STEPS.md); fall back to the bit-exact
            # attention-only kernel and retry once.
            self.logger.log(
                Severity.warn,
                f"fused-block program failed ({type(e).__name__}); "
                "falling back to attention-only kernels",
            )
            family, scale, noise, config, sharding, use_pallas =                 self._load_args
            module, spec = registry.create_model(
                family, scale, noise, dtype=config.precision.dtype,
                use_pallas=use_pallas, fused_block=False,
            )
            self._module = module
            self._fused = False
            self._renderers = RendererCache(module, spec, config, sharding)
            prog = self._renderers.get(frame_u8.shape[:2])
            out_dev = prog(self._params, frame_u8)
        out = np.asarray(out_dev)
        s = self._spec.scale
        if out.shape[:2] != (oh * s, ow * s):
            out = out[: oh * s, : ow * s]
        dt = time.perf_counter() - t0
        n_batches = prog.plan.tile_count  # progress granularity: tiles
        self.logger.progress(n_batches, n_batches, n_batches / max(dt, 1e-9))
        return out

    def render_async(self, frame_u8: np.ndarray):
        """Dispatch a frame render without blocking; returns the device
        array future (JAX async dispatch — the double-buffering seam the
        reference approximates with its single CUDA stream). Bucketing is
        not applied here: video frames share one geometry."""
        prog = self._renderers.get(frame_u8.shape[:2])
        return prog(self._params, np.ascontiguousarray(frame_u8))

    @property
    def spec(self) -> Optional[registry.ModelSpec]:
        return self._spec

    @property
    def params(self):
        return self._params
