"""Upscaler: the engine facade (reference class trt::Img2Img,
src/tensorrt/img2img.h:14-50).

Owns the model module + params, the jitted render programs, and the
message/progress callback seams. Public surface mirrors the reference:
``build()``, ``load()``, ``render()``, ``set_message_callback()``,
``set_progress_callback()`` — raising exceptions instead of returning
false (the CLI converts to exit codes, matching main.cpp:224-225,265-266).
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from waifu2x_tensorrt_tpu.engine import cache as engine_cache
from waifu2x_tensorrt_tpu.engine import config as engine_config
from waifu2x_tensorrt_tpu.engine import exe_cache
from waifu2x_tensorrt_tpu.engine.config import BuildConfig, RenderConfig
from waifu2x_tensorrt_tpu.engine.renderer import (
    ChunkedPipeline,
    RendererCache,
    bucket_frame,
)
from waifu2x_tensorrt_tpu.models import registry
from waifu2x_tensorrt_tpu.utils.logging import Logger, Severity


def _lane_pad(on_tpu: bool) -> int:
    """Opt-in full-res lane padding (models/swin_unet.py lane_pad): pad the
    48-channel stem/skip/head-input passes to WAIFU2X_LANE_PAD vector lanes
    on TPU. Math-preserving (padded channels are exact zeros); off by
    default pending a measured win on v5e."""
    if not on_tpu:
        return 0
    try:
        return int(os.environ.get("WAIFU2X_LANE_PAD", "0") or 0)
    except ValueError:
        return 0


def _guard_fast_softmax(module, params, logger):
    """Per-checkpoint fast-softmax selection (VERDICT r3 item 4 / ADVICE r2
    medium finding): the Pallas kernels' no-max-subtract bf16 softmax is
    exact only while every attention logit stays inside the clamp window
    (ops/kernel_math.py). Compute the checkpoint's PROVEN worst-case logit
    bound (ops/logit_bound.py) and clear ``fast_softmax`` whenever the
    bound exceeds the budget — the max-subtracted form then serves, correct
    for any logit magnitude. Deterministic in the params, so build() and
    load() always select the same program (persistent-cache key parity).

    Returns (possibly-cloned module, bound or None)."""
    import jax.numpy as jnp

    if not getattr(module, "fast_softmax", False):
        return module, None
    if module.dtype != jnp.bfloat16:
        return module, None  # fast softmax is bf16-only; nothing to guard
    from waifu2x_tensorrt_tpu.ops.kernel_math import FAST_SOFTMAX_BUDGET
    from waifu2x_tensorrt_tpu.ops.logit_bound import swin_max_logit_bound

    bound = swin_max_logit_bound(params)
    if bound is None:
        # Fail CLOSED (round-4 review finding): a module carrying a
        # fast_softmax flag IS a window-attention model, so a param tree
        # the walker cannot see (layout change, scope rename, exotic
        # Mapping type) means NO PROOF — serve the exact max-subtracted
        # softmax rather than silently keeping the clamped fast path for
        # exactly the checkpoints the guard exists to protect.
        logger.log(
            Severity.warn,
            "could not derive an attention-logit bound from this param "
            "tree; selecting exact (max-subtracted) softmax, fail-closed")
        return module.clone(fast_softmax=False), None
    if bound <= FAST_SOFTMAX_BUDGET:
        return module, bound
    logger.log(
        Severity.info,
        f"checkpoint logit bound {bound:.1f} exceeds the fast-softmax "
        f"budget {FAST_SOFTMAX_BUDGET:.0f}: selecting exact "
        f"(max-subtracted) softmax for this model")
    return module.clone(fast_softmax=False), bound


def _inherit_fast_softmax(module, fast_sm: bool):
    """Propagate load()'s per-checkpoint softmax-guard decision onto a
    REBUILT module (packed-x twin, fused-kernel fallback). Every
    module-construction site that runs after the guard must route through
    this: constructing afresh silently resets fast_softmax to its default
    True, re-enabling the clamped softmax for a checkpoint the guard
    provably rejected (the round-4 bug class)."""
    if hasattr(module, "fast_softmax"):
        return module.clone(fast_softmax=fast_sm)
    return module


def _npz_arch_overrides(stem: Path, family: str):
    """(trusted verification record, create_model arch overrides) for a
    converted checkpoint: validate.py records the graph-derived
    architecture next to the .npz it saves, so non-flagship widths/depths
    build the matching module instead of dying with a param-shape error at
    first apply. The arch overrides apply whenever the record matches the
    file's content (they are graph facts); the returned record — which
    suppresses the fidelity warning — additionally requires the current
    converter version (evidence produced by older converter/flax source is
    not re-trusted)."""
    from waifu2x_tensorrt_tpu.models.onnx_backend import (
        CONVERTER_VERSION,
        npz_verification,
    )

    rec = (npz_verification(stem, trust=False)
           if stem.exists() else None)
    arch_kw = {}
    if rec and family.startswith("swin_unet"):
        a = rec.get("arch") or {}
        if a.get("base_dim"):
            arch_kw["base_dim"] = int(a["base_dim"])
        sd = a.get("stage_depths")
        if sd and len(sd) == 3:
            arch_kw["depths"] = (sd[0], sd[0], sd[1], sd[2], sd[2])
    trusted = (rec if rec is not None
               and rec.get("converter_version") == CONVERTER_VERSION
               else None)
    return trusted, arch_kw


class Upscaler:
    def __init__(self, models_dir: str | Path = "models",
                 allow_random_init: bool = False) -> None:
        """``allow_random_init=True`` lets load()/build() fall back to
        randomly initialized weights when no converted .npz exists (tests,
        benchmarks, pipeline bring-up). Default is the reference's
        behavior: missing model artifacts are a hard failure."""
        self.logger = Logger()
        self.models_dir = Path(models_dir)
        self.allow_random_init = allow_random_init
        self._module = None
        self._spec: Optional[registry.ModelSpec] = None
        self._params = None
        self._static_geometry: Optional[tuple] = None
        self._renderers: Optional[RendererCache] = None
        self._render_config: Optional[RenderConfig] = None
        self._sharding = None
        self._bucket = 0
        self._device = None
        self._artifact_arch = None

    def _select_device(self, device_id: int):
        """Bind this engine to one accelerator (reference cudaSetDevice,
        img2img_build.cpp:57 / img2img_load.cpp:129). Params and frames are
        committed to the chosen device; jit follows input placement.

        LOCAL devices only: under a multi-host jax.distributed runtime,
        jax.devices() also lists other hosts' (non-addressable) chips —
        committing to one of those would fail. The reference's
        cudaSetDevice is likewise host-local."""
        devices = jax.local_devices()
        if not (0 <= device_id < len(devices)):
            raise ValueError(
                f"--device {device_id} out of range: "
                f"{len(devices)} local device(s) available"
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
              use_pallas: Optional[bool] = None,
              graph_exact: bool = False) -> None:
        registry.validate(family, scale, noise)
        self._select_device(config.device_id)
        self._artifact_arch = None
        engine_cache.enable_persistent_cache(self.models_dir)
        exe_cache.configure(self.models_dir, device=self._device)
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if use_pallas is None:
            use_pallas = on_tpu
        # must match load()'s model so the persistent-cache entry is the
        # one render() will look up — including load()'s backend choice
        # for bare .onnx artifacts (verified-optimized flax module or
        # graph backend): THAT is the program to AOT-compile
        stem_b = registry.weights_path(self.models_dir, family, scale,
                                       noise)
        onnx_artifact = stem_b.with_suffix(".onnx")
        if not stem_b.exists() and onnx_artifact.exists():
            module, spec, params, _optimized = self._load_graph_backend(
                onnx_artifact, family, scale, noise, config, graph_exact,
                use_pallas)
        else:
            # same sidecar-derived arch overrides as load(): the compiled
            # program must be the one render() executes
            _, arch_kw = _npz_arch_overrides(stem_b, family)
            module, spec = registry.create_model(
                family, scale, noise, dtype=config.precision.dtype,
                use_pallas=use_pallas, fused_block=use_pallas and on_tpu,
                packed_head=False, shuffle_via_deconv=on_tpu,
                lane_pad=_lane_pad(on_tpu),
                **arch_kw,
            )
            params, loaded = registry.load_or_init_params(
                module, self.models_dir, family, scale, noise,
                tile=config.opt_height,
                warn=lambda m: self.logger.log(Severity.warn, m),
                allow_random=self.allow_random_init,
            )
        # every compiled corner must satisfy the model's tile divisor in
        # BOTH dimensions, on every backend path — failing here gives the
        # clear error load() would, instead of an opaque shape mismatch
        # deep inside the AOT lowering
        for _, hh, ww in engine_config.compiled_shapes(config):
            for dim in (hh, ww):
                if dim % spec.tile_divisor:
                    raise ValueError(
                        f"profile tile size {dim} is not a multiple of "
                        f"{spec.tile_divisor} (required by this model "
                        f"backend)")
        # Same per-checkpoint softmax selection load() makes: the AOT
        # entry must be the program render() executes.
        module, _ = _guard_fast_softmax(module, params, self.logger)
        # Commit params exactly as load() will: the persistent-cache key
        # covers input shardings, so lowering with uncommitted host arrays
        # would write an entry render() never hits.
        params = jax.device_put(params, self._device)
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
        from waifu2x_tensorrt_tpu.utils.xla import tpu_compiler_options

        opts = tpu_compiler_options()
        jit_kw = {"compiler_options": opts} if opts else {}
        apply_tiles = registry.tile_apply_fn(module)
        # The corner executables go through the executable store: build()
        # now writes the serialized-program artifact the reference's build
        # writes (.trt, img2img_build.cpp:151-166), so a later process is
        # pipeline-ready by deserializing, not recompiling.
        prog = exe_cache.cached_jit(
            apply_tiles, tag=f"model|{exe_cache.module_tag(module)}",
            **jit_kw)
        flops = 0.0
        for b, h, w in shapes:
            x = jax.ShapeDtypeStruct((b, h, w, 3), config.precision.dtype)
            compiled = (prog.aot(params, x) if hasattr(prog, "aot")
                        else prog.lower(params, x).compile())
            try:
                flops = max(flops, compiled.cost_analysis().get("flops", 0.0))
            except Exception:
                pass  # deserialized executables may not carry an analysis
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
             bucket: int = 0,
             fuse_frame: bool = False,
             graph_exact: bool = False) -> None:
        """Select/compile the engine and prepare render programs.

        ``graph_exact=True`` disables the parse->optimize path for bare
        .onnx artifacts: the export's own graph serves even when the
        conversion verifies (export-exact math at the graph-backend
        rate).

        ``fuse_frame=True`` uses one monolithic XLA program per frame
        geometry (model inlined; exact-size remainder chunk, no per-chunk
        progress). Default is the chunked pipeline: the expensive model
        executable is shared across frame geometries (and AOT-warmed by
        ``build()``), with per-chunk progress callbacks.
        """
        registry.validate(family, scale, noise)
        device = self._select_device(config.device_id)
        self._artifact_arch = None
        engine_cache.enable_persistent_cache(self.models_dir)
        exe_cache.configure(self.models_dir, device=self._device)
        stem = registry.weights_path(self.models_dir, family, scale, noise)
        # sharded renders dispatch batch*n_dp-tile chunks — that is the
        # shape that must be warm, not the per-device batch
        n_dp = 1
        if sharding is not None:
            import numpy as _np

            n_dp = int(_np.prod([
                sharding.mesh.shape[a] for a in sharding.spec
                if a is not None
            ]))
        found = engine_cache.find_engine(stem, config, dp=n_dp)
        if found is None:
            msg = (f"no prebuilt engine sidecar for {family} "
                   f"(tile={config.height}, "
                   f"batch={config.batch_size * n_dp}); ")
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
        onnx_artifact = stem.with_suffix(".onnx")
        graph_backed = not stem.exists() and onnx_artifact.exists()
        arch_kw: dict = {}  # npz-sidecar arch overrides (non-graph path)
        if graph_backed:
            # Serve the release artifact (the reference's behavior: hand
            # any ONNX to the accelerator, img2img_build.cpp:88):
            # verified-conversion artifacts run the flax + Pallas fast
            # path, the rest the parsed graph at the requested precision.
            module, spec, params, optimized = self._load_graph_backend(
                onnx_artifact, family, scale, noise, config, graph_exact,
                use_pallas)
            from_file = True
            if optimized:
                graph_backed = False  # flax path: self-pads, whole-frame ok
            else:
                use_pallas = False
        else:
            # Packed head (blend/scatter in (oh/r, ow/r, 48) layout, one
            # canvas unpack) was measured v5e 2026-08: model -1.5 ms/chunk
            # but the whole-canvas depth-to-space costs ~15 ms vs ~3.4 ms
            # of fused per-tile shuffles — net LOSS, so pixel-space stays
            # the default (BENCH_NOTES.md). The flag remains for future
            # kernel work.
            # a .npz saved by validate.py carries the graph-derived arch in
            # its .verify.json sidecar: honor non-flagship width/depths so
            # any structurally-swin artifact serves, not just the release
            # configuration (the sidecar also suppresses the fidelity
            # warning below)
            npz_rec, arch_kw = _npz_arch_overrides(stem, family)
            module, spec = registry.create_model(
                family, scale, noise, dtype=config.precision.dtype,
                use_pallas=use_pallas, fused_block=use_pallas and on_tpu,
                packed_head=False,
                # decoder ups as stride-2 deconvs: bit-identical math,
                # measured +3.7% streamed on v5e (475.3 vs 458.5 MP/s,
                # 2026-08-17) — kills the up1/up2 pixel-shuffle copies
                shuffle_via_deconv=on_tpu,
                lane_pad=_lane_pad(on_tpu),
                **arch_kw,
            )
            params, from_file = registry.load_or_init_params(
                module, self.models_dir, family, scale, noise,
                tile=config.height or 64,
                warn=lambda m: self.logger.log(Severity.warn, m),
                allow_random=self.allow_random_init,
            )
            if from_file and spec.arch == "swin_unet":
                # converted checkpoints ride on the reconstruction: trust
                # the conversion verdict validate.py recorded next to the
                # .npz (content-hash keyed), else keep the honesty warning
                # and point at the graph-backed alternative (drop the
                # .onnx next to the .npz and remove the .npz to serve the
                # artifact's own graph).
                rec = npz_rec
                if rec is not None:
                    self.logger.log(
                        Severity.info,
                        f"conversion verified vs "
                        f"{rec.get('source_onnx', 'source artifact')} "
                        f"(max_err {rec.get('max_err')})")
                else:
                    self.logger.log(
                        Severity.warn,
                        "swin_unet fidelity vs upstream is unverified for "
                        "converted checkpoints; validate with "
                        "models/validate.py or serve the .onnx directly "
                        "(models/onnx_backend.py)",
                    )
        # Per-checkpoint softmax guard (deterministic in params — build()
        # made the same selection, so the AOT cache entry still matches).
        module, _logit_bound = _guard_fast_softmax(module, params,
                                                   self.logger)
        if config.height and config.height % spec.tile_divisor:
            raise ValueError(
                f"tile size {config.height} is not a multiple of "
                f"{spec.tile_divisor} (required by this model backend)")
        # the tile advisor must not recommend whole-frame mode to a
        # session this same check would reject (round-4 review finding)
        self._graph_backed = graph_backed
        if not graph_backed:
            self._static_geometry = None  # flax path: any tile size works
        if graph_backed and not config.height:
            # whole-frame mode sizes the tile from the frame; the parsed
            # graph cannot self-pad arbitrary geometries the way the flax
            # reconstruction does, so the trace would die in a window-
            # partition reshape — reject with the real constraint instead
            raise ValueError(
                "--tileSize 0 (whole-frame) is not supported when serving "
                "a parsed .onnx artifact directly; use a fixed tile size "
                f"(multiple of {spec.tile_divisor}), or convert the "
                "artifact to .npz (models/validate.py) for whole-frame "
                "rendering")
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
        self._fuse_frame = fuse_frame
        # packed-x-head twin (same params): geometries with pack-aligned
        # x-origins render through ops/head_pack.py — no head
        # depth-to-space transpose; byte-identical output layout. MEASURED
        # v5e 2026-08-17: 414.6 vs 475.3 MP/s streamed — the one-hot-dot
        # kernel + 48-lane packed finalize cost more than the D2S they
        # remove (BENCH_NOTES "packed-x head"); opt-in only.
        module_px = spec_px = None
        if (os.environ.get("WAIFU2X_PACK_X") == "1"
                and not fuse_frame and not graph_backed and on_tpu
                and self._artifact_arch is None
                and spec.arch == "swin_unet" and scale > 1
                and not config.tta):
            module_px, spec_px = registry.create_model(
                family, scale, noise, dtype=config.precision.dtype,
                use_pallas=use_pallas, fused_block=use_pallas and on_tpu,
                packed_x_head=True, shuffle_via_deconv=on_tpu,
                lane_pad=_lane_pad(on_tpu),
                **arch_kw,
            )
            # same params, same guard decision
            module_px = _inherit_fast_softmax(
                module_px, getattr(module, "fast_softmax", True))
        if fuse_frame:
            self._renderers = RendererCache(module, spec, config, sharding)
        else:
            self._renderers = ChunkedPipeline(
                module, spec, config, sharding,
                module_pack_x=module_px, spec_pack_x=spec_px)
        # arch_kw rides along so the fused-fallback rebuild constructs the
        # same (possibly non-flagship) module the params were shaped for
        self._load_args = (family, scale, noise, config, sharding,
                           use_pallas, arch_kw)
        self._had_px = module_px is not None
        # cunet has no fused Pallas kernels: never route its failures
        # through the fused-fallback resubmission path
        self._fused = use_pallas and on_tpu and spec.arch == "swin_unet"

    def _load_graph_backend(self, onnx_path: Path, family: str, scale: int,
                            noise: int, config,  # Render- or BuildConfig
                            graph_exact: bool = False,
                            use_pallas: bool = True):
        """Parse an ONNX artifact for serving; returns (module, spec,
        params, optimized). TensorRT-style parse -> optimize
        (img2img_build.cpp:88): when the artifact converts positionally
        AND the conversion is numerically VERIFIED against the artifact's
        own graph (onnx_backend.verify_swin_conversion, sha-cached in a
        .verify.json sidecar), it serves through the flax + Pallas fast
        path (~2x the traced-graph rate). Otherwise — or with
        ``graph_exact=True`` — the parsed graph itself serves, honoring
        ``config.precision`` the way the reference's builder does with an
        fp32 artifact: fp16 runs bf16 on the MXU with fp32 islands, tf32
        runs the export's own fp32 math (the validate.py ground-truth
        mode). Raises when the artifact's derived scale contradicts the
        requested one."""
        import dataclasses

        from waifu2x_tensorrt_tpu.models.onnx_backend import (
            GraphModule,
            derive_arch,
        )
        from waifu2x_tensorrt_tpu.models.onnx_graph import read_graph

        graph = read_graph(onnx_path)
        arch = derive_arch(graph)
        if arch.scale != scale:
            raise ValueError(
                f"{onnx_path.name}: artifact scale {arch.scale} != "
                f"requested scale {scale}")
        fam_arch = "cunet" if family.startswith("cunet") else "swin_unet"
        if arch.arch != fam_arch:
            # a cunet export under models/swin_unet/ (or vice versa) would
            # otherwise inherit the wrong spec (tile divisor, fused-kernel
            # routing) and die much later in an opaque shape error
            raise ValueError(
                f"{onnx_path.name}: artifact architecture {arch.arch!r} "
                f"does not match the requested family {family!r}")
        if not graph_exact and (
                arch.arch == "cunet"
                or (arch.arch == "swin_unet" and arch.stage_depths)):
            try:
                module, spec, params = self._load_optimized_artifact(
                    graph, arch, onnx_path, family, scale, noise, config,
                    use_pallas)
                return module, spec, params, True
            except Exception as e:
                self.logger.log(
                    Severity.warn,
                    f"{onnx_path.name}: optimized serving unavailable "
                    f"({e}); serving the parsed graph directly",
                )
        compute_dtype = (config.precision.dtype
                         if config.precision is engine_config.Precision.FP16
                         else None)
        module = GraphModule(graph, compute_dtype=compute_dtype)
        params = module.init_params()
        base = registry.get_spec(family, scale, noise)
        tile_divisor = base.tile_divisor
        if arch.arch == "swin_unet" and arch.window:
            # the graph cannot self-pad like the flax reconstruction: tile
            # sizes must be window*4-divisible (two stride-2 stages)
            tile_divisor = max(tile_divisor, arch.window * 4)
        if arch.static_hw:
            # RenderConfig carries one geometry; BuildConfig carries the
            # whole min/opt/max profile — every compiled corner must match
            # the export's fixed shape.
            if hasattr(config, "height"):
                geoms = [(config.height, config.width)] if config.height \
                    else []
            else:
                geoms = sorted({(hh, ww) for _, hh, ww in
                                engine_config.compiled_shapes(config)})
            bad = [g for g in geoms if g != tuple(arch.static_hw)]
            if bad:
                raise ValueError(
                    f"{onnx_path.name} was exported at a FIXED geometry "
                    f"{tuple(arch.static_hw)} (requested {bad[0]}): "
                    f"graph-exact serving requires --tileSize "
                    f"{arch.static_hw[0]} (or convert the artifact "
                    f"— models/validate.py — for any tile size)")
        spec = dataclasses.replace(base, offset=arch.offset,
                                   tile_divisor=tile_divisor)
        # fixed-geometry exports accept exactly ONE tile size: the tile
        # advisor must stay silent for such sessions (round-4 review)
        self._static_geometry = (tuple(arch.static_hw)
                                 if arch.static_hw else None)
        self.logger.log(
            Severity.info,
            f"serving parsed ONNX graph {onnx_path.name} directly at "
            f"{'bf16 (fp32 islands)' if compute_dtype is not None else 'fp32'}"
            f" (derived arch: {arch.summary()}); tile sizes must be "
            f"multiples of {tile_divisor}",
        )
        return module, spec, params, False

    def _load_optimized_artifact(self, graph, arch, onnx_path: Path,
                                 family: str, scale: int, noise: int,
                                 config, use_pallas: bool = True):
        """Convert + VERIFY a swin or cunet artifact, then build the flax
        (+ Pallas for swin) serving module from the DERIVED architecture.
        Verification re-exports the converted weights and compares both
        graphs under the numpy executor (host-only, no device compile) —
        per-artifact proof that the reconstruction reproduces the
        artifact's math; the result is cached in ``<artifact>.verify.json``
        keyed by the artifact's sha256, the engine-cache pattern applied
        to fidelity."""
        import dataclasses
        import json

        from waifu2x_tensorrt_tpu.models.onnx_backend import (
            CONVERTER_VERSION,
            VERIFY_TOL,
            _sha16,
            cunet_params_from_graph,
            swin_params_from_graph,
            verify_cunet_conversion,
            verify_swin_conversion,
        )
        from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

        is_cunet = arch.arch == "cunet"
        sha16 = _sha16(onnx_path)  # same keying as the npz sidecars
        sidecar = onnx_path.parent / (onnx_path.name + ".verify.json")

        def _write_sidecar(payload: dict) -> None:
            try:
                sidecar.write_text(json.dumps(
                    {"sha16": sha16,
                     "converter_version": CONVERTER_VERSION,
                     "arch": arch.summary(), **payload},
                    default=str))
            except OSError:
                pass

        err = None
        cached_failure = None
        if sidecar.exists():
            # all three verdicts are cached — success, numeric divergence,
            # AND conversion parse failure: a known-bad artifact must not
            # re-pay the positional walk / host-side verification per load.
            # Both verdicts are keyed by (artifact sha, converter version):
            # a converter upgrade invalidates stale failures (an idiom we
            # now parse must get retried) AND stale successes (a changed
            # conversion must re-verify, not serve on old evidence).
            try:
                cached = json.loads(sidecar.read_text())
                if (cached.get("sha16") == sha16
                        and cached.get("converter_version")
                        == CONVERTER_VERSION):
                    if "error" in cached:
                        cached_failure = str(cached["error"])
                    else:
                        err = float(cached["max_err"])
                        # never trust a sidecar past the CURRENT gate
                        # (older tolerance, hand-edited, NaN): re-verify
                        if not err <= VERIFY_TOL:
                            err = None
            except (OSError, ValueError, KeyError, TypeError):
                err = None
        if cached_failure is not None:
            raise ValueError(f"{cached_failure} (cached verification)")
        try:
            if is_cunet:
                params = cunet_params_from_graph(graph, scale=arch.scale)
            else:
                params = swin_params_from_graph(graph)
        except ValueError as e:
            _write_sidecar({"error": str(e)})
            raise
        if err is None:
            verify = verify_cunet_conversion if is_cunet \
                else verify_swin_conversion
            try:
                err = verify(graph, arch, params)
            except ValueError as e:
                _write_sidecar({"error": str(e)})
                raise
            _write_sidecar({"max_err": err})
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if is_cunet:
            from waifu2x_tensorrt_tpu.models.cunet import CUNet, UpCUNet

            cls = UpCUNet if arch.scale == 2 else CUNet
            module = cls(dtype=config.precision.dtype)
        else:
            d = arch.stage_depths
            module = SwinUNet(
                scale=scale, base_dim=arch.base_dim,
                depths=(d[0], d[0], d[1], d[2], d[2]),
                dtype=config.precision.dtype,
                use_pallas=use_pallas, fused_block=use_pallas and on_tpu,
                shuffle_via_deconv=on_tpu,
                lane_pad=_lane_pad(on_tpu),
            )
        base = registry.get_spec(family, scale, noise)
        spec = dataclasses.replace(base, offset=arch.offset)
        self._artifact_arch = arch
        self.logger.log(
            Severity.info,
            f"{onnx_path.name}: conversion VERIFIED against the "
            f"artifact's own graph (max abs err {err:.2e} on a "
            f"{tuple(arch.probe_hw)} probe); serving the optimized "
            f"flax{'' if is_cunet else '+Pallas'} path (~2x the "
            f"graph-exact rate — pass --graph-exact for the export's "
            f"own math)",
        )
        return module, spec, params

    def _fall_back_from_fused(self, exc: Exception) -> None:
        """Swap the fused-block model for the bit-exact attention-only
        kernels after a fused-program failure (XLA occasionally
        scoped-vmem-OOMs compiling the whole-block kernel, NEXT_STEPS.md)."""
        self.logger.log(
            Severity.warn,
            f"fused-block program failed ({type(exc).__name__}); "
            "falling back to attention-only kernels",
        )
        (family, scale, noise, config, sharding, use_pallas,
         arch_kw) = self._load_args
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        # Reuse load()'s per-checkpoint softmax selection: the decision is
        # deterministic in the params, and recomputing the bound here
        # would fetch every weight leaf device-to-host (expensive through
        # a remote tunnel) for an answer we already hold.
        fast_sm = getattr(self._module, "fast_softmax", True)
        if self._artifact_arch is not None \
                and self._artifact_arch.arch == "swin_unet":
            # optimized-artifact serving: rebuild from the DERIVED arch
            # (registry.create_model would assume flagship dimensions)
            from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

            arch = self._artifact_arch
            d = arch.stage_depths
            module = SwinUNet(
                scale=scale, base_dim=arch.base_dim,
                depths=(d[0], d[0], d[1], d[2], d[2]),
                dtype=config.precision.dtype,
                use_pallas=use_pallas, fused_block=False,
                shuffle_via_deconv=on_tpu,
                lane_pad=_lane_pad(on_tpu),
            )
            spec = self._spec
        else:
            module, spec = registry.create_model(
                family, scale, noise, dtype=config.precision.dtype,
                use_pallas=use_pallas, fused_block=False,
                packed_head=self._spec.packing > 1,
                shuffle_via_deconv=on_tpu,
                lane_pad=_lane_pad(on_tpu),
                **arch_kw,
            )
        module = _inherit_fast_softmax(module, fast_sm)
        self._module = module
        self._fused = False
        if isinstance(self._renderers, ChunkedPipeline):
            module_px = None
            if getattr(self, "_had_px", False):
                module_px, _ = registry.create_model(
                    family, scale, noise, dtype=config.precision.dtype,
                    use_pallas=use_pallas, fused_block=False,
                    packed_x_head=True, shuffle_via_deconv=on_tpu,
                    lane_pad=_lane_pad(on_tpu),
                    **arch_kw,
                )
                # same checkpoint -> same guard decision on the twin
                module_px = _inherit_fast_softmax(module_px, fast_sm)
            self._renderers.set_module(module, module_px)
        else:
            self._renderers = RendererCache(module, spec, config, sharding)

    def _dispatch(self, frame_u8: np.ndarray, progress=None):
        """Shared render path (both sync and async): bucket, run the
        pipeline with fused-kernel fallback, crop. Returns an un-fetched
        device array."""
        if self._renderers is None:
            raise RuntimeError("load() must be called before render()")
        if frame_u8.ndim != 3 or frame_u8.shape[2] != 3:
            raise ValueError(f"expected (H, W, 3) frame, got {frame_u8.shape}")
        frame_u8, (oh, ow) = bucket_frame(np.ascontiguousarray(frame_u8),
                                          self._bucket)

        def run():
            if isinstance(self._renderers, ChunkedPipeline):
                return self._renderers.render(self._params, frame_u8,
                                              progress=progress)
            prog = self._renderers.get(frame_u8.shape[:2])
            out = prog(self._params, frame_u8)
            if progress is not None:
                n = prog.n_chunks
                progress(n, n, 0.0)
            return out

        try:
            out = run()
        except Exception as e:
            if not self._fused:
                raise
            self._fall_back_from_fused(e)
            out = run()
        s = self._spec.scale
        if out.shape[:2] != (oh * s, ow * s):
            out = out[: oh * s, : ow * s]
        return out

    # -- render (img2img_render.cpp:224-352) -------------------------------
    def render(self, frame_u8: np.ndarray) -> np.ndarray:
        """Upscale one RGB uint8 HWC frame; returns RGB uint8 HWC.

        Fires the progress callback per model chunk ("batch i/n @ it/s",
        reference img2img_render.cpp:336-338)."""
        return np.asarray(self._dispatch(frame_u8,
                                         progress=self.logger.progress))

    def render_async(self, frame_u8: np.ndarray):
        """Dispatch a frame render without blocking; returns the device
        array future (JAX async dispatch — the double-buffering seam the
        reference approximates with its single CUDA stream). Same
        bucketing, fused-kernel fallback, and per-chunk progress as
        ``render``; only the host fetch is deferred to the caller."""
        return self._dispatch(frame_u8, progress=self.logger.progress)

    def open_stream(self, frame_hw):
        """Open a cross-frame streaming session for fixed-size frames
        (the video hot path): leftover tiles of each frame ride in the
        next frame's model batch so every dispatch is a full batch
        (engine/renderer.py::TileStream — measured +4% over per-frame
        chunking at 720p/tile 256 on v5e; with a dp mesh each chunk is
        placed with the tile sharding, keeping every device at full
        per-device batch). Returns None when streaming does not apply
        (monolithic fuse_frame programs, or a rectangular-TTA whole-frame
        geometry whose two tile orientations cannot share one carry), in
        which case callers use render_async per frame."""
        if not self.can_stream:
            return None
        hw = (int(frame_hw[0]), int(frame_hw[1]))
        prep, _, _, _ = self._renderers.get(hw)
        if getattr(prep, "flat", None) is None:
            # rectangular-TTA whole-frame geometry: two tile orientations
            # per frame cannot ride one cross-frame carry — per-frame
            # dispatch (render_async) applies instead
            return None
        return _StreamSession(self, hw)

    @property
    def can_stream(self) -> bool:
        """True when the loaded engine supports cross-frame tile
        streaming (chunked pipeline; monolithic fuse_frame programs
        render whole frames and cannot)."""
        from waifu2x_tensorrt_tpu.engine.renderer import ChunkedPipeline

        return isinstance(self._renderers, ChunkedPipeline)

    @property
    def spec(self) -> Optional[registry.ModelSpec]:
        return self._spec

    @property
    def params(self):
        return self._params


class _StreamSession:
    """Upscaler-facing wrapper around TileStream: applies frame
    bucketing, crops outputs back to the true size, and recovers from a
    fused-kernel compile failure by falling back and resubmitting the
    in-flight frames (raw frames are retained until their output
    emerges, at most ~2 at the stream's one-chunk latency)."""

    def __init__(self, upscaler: Upscaler, frame_hw) -> None:
        from collections import deque

        self._up = upscaler
        self._orig_hw = frame_hw
        h, w = frame_hw
        b = upscaler._bucket
        if b > 1:
            h = -(-h // b) * b
            w = -(-w // b) * b
        self._hw = (h, w)
        self._inflight = deque()
        self._make()

    def _make(self) -> None:
        from waifu2x_tensorrt_tpu.engine.renderer import TileStream

        self._stream = TileStream(self._up._renderers, self._up._params,
                                  self._hw,
                                  progress=self._up.logger.progress)

    def _crop(self, out):
        s = self._up._spec.scale
        oh, ow = self._orig_hw
        if out.shape[:2] != (oh * s, ow * s):
            out = out[: oh * s, : ow * s]
        return out

    def _recover(self, exc: Exception, flush: bool):
        if not self._up._fused:
            raise exc
        self._up._fall_back_from_fused(exc)
        self._make()
        outs = []
        for f in list(self._inflight):
            outs.extend(self._stream.submit(f))
        if flush:
            outs.extend(self._stream.flush())
        return outs

    def warm(self) -> int:
        """Pre-compile one full carry cycle of stream programs (see
        TileStream.warm); call before a live video loop to avoid
        first-seconds compile stutter."""
        try:
            return self._stream.warm()
        except Exception as e:  # scoped-vmem compile flake seam: warm
            # triggers the first model compile, so it needs the same
            # fused-kernel fallback submit()/flush() have (no in-flight
            # frames exist yet, so _recover only swaps the model)
            self._recover(e, flush=False)
            return self._stream.warm()

    def submit(self, frame_u8: np.ndarray):
        """Feed one frame; returns ready outputs (device arrays, cropped,
        submission order)."""
        # same contract as Upscaler._dispatch: catch RGBA/grayscale here
        # with a clear error instead of an opaque jit shape failure (which
        # would also needlessly trip the fused-kernel fallback)
        if frame_u8.ndim != 3 or frame_u8.shape[2] != 3:
            raise ValueError(
                f"expected (H, W, 3) frame, got {frame_u8.shape}")
        if frame_u8.shape[:2] != self._orig_hw:
            raise ValueError(
                f"stream expects {self._orig_hw} frames, got "
                f"{frame_u8.shape[:2]}")
        frame_u8, _ = bucket_frame(np.ascontiguousarray(frame_u8),
                                   self._up._bucket)
        self._inflight.append(frame_u8)
        try:
            outs = self._stream.submit(frame_u8)
        except Exception as e:  # scoped-vmem compile flake seam
            outs = self._recover(e, flush=False)
        for _ in outs:
            self._inflight.popleft()
        return [self._crop(o) for o in outs]

    def flush(self):
        """Drain remaining frames (end of video)."""
        try:
            outs = self._stream.flush()
        except Exception as e:
            outs = self._recover(e, flush=True)
        for _ in outs:
            self._inflight.popleft()
        return [self._crop(o) for o in outs]
