"""Model registry: families, scale/noise validation, weight-file naming.

Mirrors the reference's model-choice surface (src/main.cpp:26-53: families
cunet/art, swin_unet/{art,art_scan,photo}; scales {1,2,4}; noise {-1..3})
and its weight-path convention (src/main.cpp:201-204:
``models/{family}/[noise{N}_][scale{S}x].onnx`` — here ``.npz``).
Validation parity: cunet/art forbids scale 4; noise -1 forbids scale 1
(src/main.cpp:142-145).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

from waifu2x_tensorrt_tpu.models import cunet as _cunet
from waifu2x_tensorrt_tpu.models import swin_unet as _swin

MODEL_FAMILIES = (
    "cunet/art",
    "swin_unet/art",
    "swin_unet/art_scan",
    "swin_unet/photo",
)

NOISE_LEVELS = (-1, 0, 1, 2, 3)
SCALES = (1, 2, 4)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static geometry contract between a model and the tiler."""

    family: str
    scale: int
    noise: int
    offset: int  # per-side output-space context shrink (0 for swin_unet)
    tile_divisor: int  # input tile size must be a multiple of this
    # packing > 1: the model emits packed (oh/p, ow/p, 3*p*p) tiles
    # (swin packed_head) and the renderer unpacks once per canvas.
    packing: int = 1
    # pack_x > 1: the model emits (oh, ow/pack_x, 3*pack_x) tiles whose
    # row-major bytes EQUAL the pixel tiles (swin packed_x_head); the
    # renderer blends/scatters in that layout and the final unpack is a
    # free reshape. Requires all output x-origins % pack_x == 0.
    pack_x: int = 1

    def output_tile(self, input_tile: int) -> int:
        """Model output spatial size for a given input tile."""
        return input_tile * self.scale - 2 * self.offset

    @property
    def arch(self) -> str:
        return self.family.split("/")[0]


def validate(family: str, scale: int, noise: int) -> None:
    """CLI-parity semantic validation (src/main.cpp:142-145)."""
    if family not in MODEL_FAMILIES:
        raise ValueError(f"unknown model {family!r}; choices: {MODEL_FAMILIES}")
    if scale not in SCALES:
        raise ValueError(f"scale must be one of {SCALES}, got {scale}")
    if noise not in NOISE_LEVELS:
        raise ValueError(f"noise must be one of {NOISE_LEVELS}, got {noise}")
    if family == "cunet/art" and scale == 4:
        raise ValueError("cunet/art does not support scale factor 4.")
    if noise == -1 and scale == 1:
        raise ValueError("Noise level -1 does not support scale factor 1.")


def get_spec(family: str, scale: int, noise: int = -1) -> ModelSpec:
    validate(family, scale, noise)
    arch = family.split("/")[0]
    if arch == "cunet":
        offset = {1: 28, 2: 36}[scale]
        # valid convs need enough context; all CLI tile sizes are /4-able
        return ModelSpec(family, scale, noise, offset=offset, tile_divisor=4)
    # swin_unet pads internally to /32; any tile size works, offset 0
    return ModelSpec(family, scale, noise, offset=0, tile_divisor=1)


def model_file_stem(scale: int, noise: int) -> str:
    """Weight-file stem: ``[noise{N}_][scale{S}x]`` (src/main.cpp:201-204)."""
    stem = ""
    if noise != -1:
        stem += f"noise{noise}_"
    if scale != 1:
        stem += f"scale{scale}x"
    return stem.rstrip("_") if stem else "noise-1"  # unreachable fallback


def create_model(
    family: str,
    scale: int,
    noise: int = -1,
    dtype: Any = None,
    clamp: bool = True,
    use_pallas: bool = False,
    fused_block: bool = False,
    packed_head: bool = False,
    block_windows: int = 32,
    shuffle_via_deconv: bool = False,
    head_shuffle_2stage: bool = False,
    packed_x_head: bool = False,
    head_via_deconv: bool = False,
    lane_pad: int = 0,
    base_dim: Optional[int] = None,
    depths: Optional[tuple] = None,
    ct_as_shuffle: bool = False,
):
    """Build the Flax module + spec for a (family, scale, noise) choice.

    swin_unet options (ignored for cunet):
      ``fused_block``  — whole-transformer-block Pallas kernel
                         (ops/swin_block.py, fastest measured on v5e);
      ``use_pallas``   — fused attention only
                         (ops/window_attention.py, bit-exact vs dense);
      ``packed_head``  — emit packed (oh/r, ow/r, 3*r*r) tiles; the
                         renderer unpacks once per canvas (spec.packing);
      ``base_dim``/``depths`` — architecture overrides for converted
                         checkpoints whose width/depths differ from the
                         flagship configuration (validate.py records the
                         graph-derived arch next to the saved .npz).
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    spec = get_spec(family, scale, noise)
    if spec.arch == "cunet":
        # ct_as_shuffle: k2s2 transposed convs as GEMM+depth-to-space —
        # identical math/params (models/cunet.py::_CT2x2Shuffle), avoids
        # XLA's interior-padded transposed-conv lowering.
        if scale == 1:
            module = _cunet.CUNet(dtype=dtype, clamp=clamp,
                                  ct_as_shuffle=ct_as_shuffle)
        else:
            module = _cunet.UpCUNet(dtype=dtype, clamp=clamp,
                                    ct_as_shuffle=ct_as_shuffle)
    else:
        packed = packed_head and scale > 1
        pack_x = packed_x_head and scale > 1 and not packed
        arch_kw = {}
        if base_dim is not None:
            arch_kw["base_dim"] = int(base_dim)
        if depths is not None:
            arch_kw["depths"] = tuple(int(d) for d in depths)
        module = _swin.SwinUNet(scale=scale, dtype=dtype, clamp=clamp,
                                **arch_kw,
                                use_pallas=use_pallas,
                                fused_block=fused_block,
                                packed_head=packed,
                                block_windows=block_windows,
                                shuffle_via_deconv=shuffle_via_deconv,
                                head_shuffle_2stage=head_shuffle_2stage,
                                packed_x_head=pack_x,
                                head_via_deconv=head_via_deconv,
                                lane_pad=int(lane_pad))
        if packed:
            spec = dataclasses.replace(spec, packing=scale)
        if pack_x:
            from waifu2x_tensorrt_tpu.ops.head_pack import PACK_X

            spec = dataclasses.replace(spec, pack_x=PACK_X)
    return module, spec


def tile_apply_fn(module):
    """The (params, tile_batch) -> tile_batch forward shared by build()
    (AOT warm-up) and the chunked render path. Both must trace the same
    graph so the persistent-cache entry written at build time is exactly
    the executable a later render looks up."""

    def apply_tiles(p, x):
        return module.apply({"params": p}, x)

    return apply_tiles


def init_params(module, tile: int = 64, seed: int = 0):
    """Random-init parameters (used when no converted weights exist)."""
    import jax.numpy as jnp

    x = jnp.zeros((1, tile, tile, 3), jnp.float32)
    return module.init(jax.random.PRNGKey(seed), x)["params"]


def init_params_host(module, tile: int = 64, seed: int = 0):
    """Host-generated random parameters with the module's exact pytree
    structure/shapes (jax.eval_shape — no device compute). For benchmarks
    and smoke tests on remote accelerators, where executing the real init
    program op-by-op through a network tunnel takes minutes; the values
    are N(0, 0.02), not the module's init distributions."""
    import jax.numpy as jnp

    x = jnp.zeros((1, tile, tile, 3), jnp.float32)
    shapes = jax.eval_shape(module.init, jax.random.PRNGKey(seed), x)
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda s: (rng.standard_normal(s.shape) * 0.02).astype(s.dtype),
        shapes,
    )["params"]


# ---------------------------------------------------------------------------
# Weight store: flat .npz of float32 arrays keyed by '/'-joined pytree paths.
# ---------------------------------------------------------------------------


def _flatten(params) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(flat: dict[str, np.ndarray]):
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params(path: str | Path, params) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **_flatten(params))


def load_params(path: str | Path):
    with np.load(Path(path)) as data:
        return _unflatten({k: data[k] for k in data.files})


def weights_path(models_dir: str | Path, family: str, scale: int, noise: int) -> Path:
    return Path(models_dir) / family / f"{model_file_stem(scale, noise)}.npz"


def load_or_init_params(
    module,
    models_dir: Optional[str | Path],
    family: str,
    scale: int,
    noise: int,
    tile: int = 64,
    warn=None,
    allow_random: bool = True,
):
    """Load converted weights; without them fail like the reference does
    when its ONNX artifact is absent (nvonnxparser parse failure,
    img2img_build.cpp:88), unless ``allow_random`` explicitly opts into
    random initialization (tests/benchmarks: tiling/blending/TTA
    correctness is weight-independent, image quality is not).
    """
    p = weights_path(models_dir or "models", family, scale, noise)
    if models_dir is not None and p.exists():
        return load_params(p), True
    if not allow_random:
        raise FileNotFoundError(
            f"no model weights at {p}; convert upstream weights with "
            "models/convert.py, or pass --allow-random-weights to render "
            "with random initialization (test pattern output)"
        )
    if warn is not None:
        warn(f"no weights at {p}; using random initialization")
    return init_params(module, tile=tile), False
