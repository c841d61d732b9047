"""Weight conversion: upstream torch/ONNX checkpoints -> flax param trees.

Upstream waifu2x weights ship as torch checkpoints (nagadomi/nunif) and as
the ONNX exports the reference consumes (README.md:11-12). Conversion:

  torch state_dict / ONNX initializers
      -> name mapping (tables below)
      -> layout transforms (OIHW->HWIO convs, transposed-conv flip,
         Linear transpose, 1x1-SE-conv -> Dense)
      -> flax {'params': ...} tree, saved as .npz via registry.save_params.

Layout rules:
- Conv2d weight (O,I,kH,kW) -> flax Conv kernel (kH,kW,I,O).
- ConvTranspose2d weight (I,O,kH,kW) -> flax ConvTranspose kernel
  (kH,kW,I,O) with SPATIALLY FLIPPED taps: torch's transposed conv is the
  gradient-of-conv (kernel applied flipped), while flax/lax conv_transpose
  (transpose_kernel=False) applies the kernel unflipped.
- nn.Linear weight (O,I) -> Dense kernel (I,O).
- SE 1x1 convs (O,I,1,1) -> Dense kernel (I,O).

The cunet mapping is exact for the upstream CUNet/UpCUNet topology (see
models/cunet.py); correctness is proven in tests/test_convert.py by
converting a randomly initialized torch mirror and comparing forwards.
The swin_unet mapping depends on our reconstruction matching upstream
module-for-module and must be validated against real checkpoints before
fidelity claims (models/swin_unet.py docstring).
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping

import numpy as np

__all__ = [
    "conv_weight",
    "conv_transpose_weight",
    "dense_weight",
    "cunet_from_torch",
    "cunet_from_onnx",
    "swin_from_torch",
    "swin_mapping",
    "state_from_flax",
]


def conv_weight(w: np.ndarray) -> np.ndarray:
    """(O, I, kH, kW) -> (kH, kW, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv_transpose_weight(w: np.ndarray) -> np.ndarray:
    """(I, O, kH, kW) -> (kH, kW, I, O), spatial taps flipped."""
    w = w[:, :, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def dense_weight(w: np.ndarray) -> np.ndarray:
    """(O, I) or (O, I, 1, 1) -> (I, O)."""
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return np.ascontiguousarray(w.T)


def _unet_conv_entries(src_prefix: str, dst_prefix: str, se: bool):
    """UNetConv: nn.Sequential(conv, lrelu, conv, lrelu[, SEBlock])."""
    entries = [
        (f"{src_prefix}.conv.0", f"{dst_prefix}/conv0", "conv"),
        (f"{src_prefix}.conv.2", f"{dst_prefix}/conv1", "conv"),
    ]
    if se:
        entries += [
            (f"{src_prefix}.conv.4.conv1", f"{dst_prefix}/se/fc1", "dense"),
            (f"{src_prefix}.conv.4.conv2", f"{dst_prefix}/se/fc2", "dense"),
        ]
    return entries


def _unet1_entries(prefix: str):
    return (
        _unet_conv_entries(f"{prefix}.conv1", f"{prefix}/conv1", se=False)
        + [(f"{prefix}.conv1_down", f"{prefix}/conv1_down", "conv")]
        + _unet_conv_entries(f"{prefix}.conv2", f"{prefix}/conv2", se=True)
        + [
            (f"{prefix}.conv2_up", f"{prefix}/conv2_up", "deconv"),
            (f"{prefix}.conv3", f"{prefix}/conv3", "conv"),
        ]
    )


def _unet2_entries(prefix: str):
    return (
        _unet_conv_entries(f"{prefix}.conv1", f"{prefix}/conv1", se=False)
        + [(f"{prefix}.conv1_down", f"{prefix}/conv1_down", "conv")]
        + _unet_conv_entries(f"{prefix}.conv2", f"{prefix}/conv2", se=True)
        + [(f"{prefix}.conv2_down", f"{prefix}/conv2_down", "conv")]
        + _unet_conv_entries(f"{prefix}.conv3", f"{prefix}/conv3", se=True)
        + [(f"{prefix}.conv3_up", f"{prefix}/conv3_up", "deconv")]
        + _unet_conv_entries(f"{prefix}.conv4", f"{prefix}/conv4", se=True)
        + [
            (f"{prefix}.conv4_up", f"{prefix}/conv4_up", "deconv"),
            (f"{prefix}.conv5", f"{prefix}/conv5", "conv"),
        ]
    )


def cunet_mapping(scale: int) -> list[tuple[str, str, str]]:
    """(torch_prefix, flax_path, kind) triples for CUNet (1x) / UpCUNet (2x).

    kind: conv | deconv | dense; the UNet1 conv_bottom is a deconv for the
    2x model (k4s2p3 head) and a conv for 1x.
    """
    entries = _unet1_entries("unet1")
    entries.append(
        ("unet1.conv_bottom", "unet1/conv_bottom",
         "deconv" if scale == 2 else "conv")
    )
    entries += _unet2_entries("unet2")
    entries.append(("unet2.conv_bottom", "unet2/conv_bottom", "conv"))
    return entries


_KIND_TRANSFORM = {
    "conv": conv_weight,
    "deconv": conv_transpose_weight,
    "dense": dense_weight,
}


def cunet_from_torch(state_dict: Mapping[str, "object"], scale: int) -> dict:
    """Convert a torch CUNet/UpCUNet state_dict to a flax param tree."""
    flat: dict[str, np.ndarray] = {}
    for src, dst, kind in cunet_mapping(scale):
        w = _to_np(state_dict[f"{src}.weight"])
        flat[f"{dst}/kernel"] = _KIND_TRANSFORM[kind](w).astype(np.float32)
        bias_key = f"{src}.bias"
        if bias_key in state_dict:
            flat[f"{dst}/bias"] = _to_np(state_dict[bias_key]).astype(np.float32)
    from waifu2x_tensorrt_tpu.models.registry import _unflatten

    return _unflatten(flat)


def cunet_from_onnx(path: str | Path, scale: int) -> dict:
    """Convert the reference's ONNX export (initializer names follow the
    torch module paths) to a flax param tree."""
    from waifu2x_tensorrt_tpu.models.onnx_reader import read_initializers

    return cunet_from_torch(read_initializers(path), scale)


def swin_mapping(scale: int, depths=(2, 2, 6, 2, 2)) -> list[tuple[str, str, str]]:
    """(torch_path, flax_path, kind) for the SwinUNet reconstruction
    (models/swin_unet.py). kind: conv | dense | norm | table.

    Torch-side names follow the canonical mirror used by
    tests/test_convert.py; for real upstream checkpoints the left column
    is the seam to adapt (rename upstream keys to this scheme, then the
    layout transforms below are proven exact).
    """
    entries: list[tuple[str, str, str]] = [
        ("patch_conv1", "patch_conv1", "conv"),
        ("patch_conv2", "patch_conv2", "conv"),
        ("down1", "down1", "conv"),
        ("down2", "down2", "conv"),
        ("up2", "up2", "dense"),
        ("up1", "up1", "dense"),
        ("to_image", "to_image", "conv"),
    ]
    for stage, depth in (("swin1", depths[0]), ("swin2", depths[2]),
                         ("swin3", depths[3])):
        for i in range(depth):
            b = f"{stage}.block{i}"
            fb = f"{stage}/block{i}"
            entries += [
                (f"{b}.norm1", f"{fb}/norm1", "norm"),
                (f"{b}.attn.qkv", f"{fb}/attn/qkv", "dense"),
                (f"{b}.attn.proj", f"{fb}/attn/proj", "dense"),
                (f"{b}.attn.relative_position_bias_table",
                 f"{fb}/attn/relative_position_bias", "table"),
                (f"{b}.norm2", f"{fb}/norm2", "norm"),
                (f"{b}.mlp_fc1", f"{fb}/mlp_fc1", "dense"),
                (f"{b}.mlp_fc2", f"{fb}/mlp_fc2", "dense"),
            ]
    return entries


def swin_from_torch(state_dict: Mapping[str, "object"], scale: int,
                    depths=(2, 2, 6, 2, 2), strict: bool = True) -> dict:
    """Convert a torch SwinUNet-mirror state_dict to a flax param tree.

    strict=False skips mapping entries absent from the state_dict (useful
    for partial/per-module conversion)."""
    flat: dict[str, np.ndarray] = {}
    for src, dst, kind in swin_mapping(scale, depths):
        probe_key = src if kind == "table" else f"{src}.weight"
        if probe_key not in state_dict:
            if strict:
                raise KeyError(f"missing source weight {probe_key!r}")
            continue
        if kind == "table":
            flat[dst] = _to_np(state_dict[src]).astype(np.float32)
            continue
        w = _to_np(state_dict[f"{src}.weight"]).astype(np.float32)
        if kind == "conv":
            flat[f"{dst}/kernel"] = conv_weight(w)
        elif kind == "dense":
            flat[f"{dst}/kernel"] = dense_weight(w)
        elif kind == "norm":
            flat[f"{dst}/scale"] = w
        bias_key = f"{src}.bias"
        if bias_key in state_dict:
            flat[f"{dst}/bias"] = _to_np(state_dict[bias_key]).astype(np.float32)
    from waifu2x_tensorrt_tpu.models.registry import _unflatten

    return _unflatten(flat)


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


# -- inverse direction: flax tree -> torch-style state arrays ---------------
# Exact inverses of conv_weight / conv_transpose_weight / dense_weight.
# Used by the round-trip fidelity tests AND by load-time artifact
# verification (onnx_backend.verify_swin_conversion): converted weights are
# re-exported through onnx_build's writer and the re-export is compared
# against the artifact's own graph under the numpy executor.


def inv_conv_weight(k: np.ndarray) -> np.ndarray:
    """flax (kH, kW, I, O) -> torch (O, I, kH, kW)."""
    return np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))


def inv_conv_transpose_weight(k: np.ndarray) -> np.ndarray:
    """flax (kH, kW, I, O) -> torch (I, O, kH, kW), spatial taps flipped."""
    w = np.transpose(k, (2, 3, 0, 1))
    return np.ascontiguousarray(w[:, :, ::-1, ::-1])


def inv_dense_weight(k: np.ndarray) -> np.ndarray:
    """flax (I, O) -> torch (O, I)."""
    return np.ascontiguousarray(np.asarray(k).T)


def state_from_flax(flat: Mapping[str, np.ndarray],
                    mapping: list) -> dict[str, np.ndarray]:
    """Build the torch-style state_dict arrays an upstream checkpoint or
    export would contain from a FLAT flax param dict (registry._flatten
    layout), given a (torch_prefix, flax_path, kind) mapping — the exact
    inverse of swin_from_torch / cunet_from_torch."""
    state: dict[str, np.ndarray] = {}
    for src, dst, kind in mapping:
        if kind == "table":
            state[src] = np.asarray(flat[dst])
            continue
        k = np.asarray(flat[f"{dst}/kernel"]) if kind != "norm" else None
        if kind == "conv":
            state[f"{src}.weight"] = inv_conv_weight(k)
        elif kind == "deconv":
            state[f"{src}.weight"] = inv_conv_transpose_weight(k)
        elif kind == "dense":
            w = inv_dense_weight(k)
            if ".conv.4." in src:  # SE blocks are 1x1 convs upstream
                w = w[:, :, None, None]
            state[f"{src}.weight"] = np.ascontiguousarray(w)
        elif kind == "norm":
            state[f"{src}.weight"] = np.asarray(flat[f"{dst}/scale"])
        bias = flat.get(f"{dst}/bias")
        if bias is not None:
            state[f"{src}.bias"] = np.asarray(bias)
    return state
