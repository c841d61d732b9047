"""Torch mirror of the SwinUNet reconstruction, exported with
``torch.onnx.export`` — the SAME exporter that produced the upstream
release artifacts (nagadomi/nunif exports via torch; the reference
consumes those files, /root/reference/README.md:11-12).

Purpose: every other arrow in the repo's fidelity loop (writer, parser,
executor, converter, flax) is authored HERE; this module brings in an
independently-authored generator. If the parser + numpy/jnp executor +
``derive_arch`` + positional conversion handle a genuine torch-tracer
graph — decomposed GELU/LayerNorm idioms, Slice+Concat rolls, Shape/
Gather dynamic-batch chains, torch initializer naming — then a real
release artifact exercising the same tracer is likely to work day one,
which is exactly the round-2 verdict's residual doubt.

The architecture mirrors models/swin_unet.py (itself a reconstruction of
the published upstream design): conv stem at full resolution, window-8
shifted-window transformer stages at 1/2 and 1/4 resolution, pixel-
shuffle decoder with skip connections, sub-pixel head, [0,1] clamp.
Parameter layout follows torch conventions (Linear (out,in), Conv OIHW);
the positional converter must handle both without name hints.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

WINDOW = 8


def _relative_position_index(ws: int) -> torch.Tensor:
    coords = torch.stack(torch.meshgrid(
        torch.arange(ws), torch.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.permute(1, 2, 0) + (ws - 1)
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> torch.Tensor:
    img = torch.zeros((h, w), dtype=torch.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for ws_ in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, ws_] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).permute(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, :, None] - win[:, None, :]
    return torch.where(diff == 0, 0.0, -1e9).float()


class WindowAttention(nn.Module):
    """W-MSA/SW-MSA over a fixed (static-export) spatial geometry."""

    def __init__(self, dim: int, num_heads: int, hw: tuple[int, int],
                 shift: int = 0, window: int = WINDOW):
        super().__init__()
        self.num_heads = num_heads
        self.window = window
        self.shift = shift
        self.hw = hw
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window - 1) ** 2, num_heads))
        self.register_buffer(
            "relative_position_index", _relative_position_index(window),
            persistent=False)
        if shift:
            self.register_buffer(
                "attn_mask", _shift_attn_mask(hw[0], hw[1], window, shift),
                persistent=False)

    def forward(self, x):  # x: (B, H, W, C)
        h, w = self.hw
        ws = self.window
        nh = self.num_heads
        c = x.shape[-1]
        hd = c // nh
        n = ws * ws
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        x = x.reshape(-1, h // ws, ws, w // ws, ws, c)
        x = x.permute(0, 1, 3, 2, 4, 5)
        nw = (h // ws) * (w // ws)
        xw = x.reshape(-1, nw, n, c)

        qkv = self.qkv(xw)  # (B, nW, N, 3C)
        qkv = qkv.reshape(-1, nw, n, 3, nh, hd).permute(3, 0, 1, 4, 2, 5)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nW, nh, N, hd)
        attn = (q * (hd ** -0.5)) @ k.transpose(-2, -1)  # (B,nW,nh,N,N)
        bias = self.relative_position_bias_table[
            self.relative_position_index.reshape(-1)]
        bias = bias.reshape(n, n, nh).permute(2, 0, 1)
        attn = attn + bias[None, None]
        if self.shift:
            attn = attn + self.attn_mask[None, :, None]
        attn = attn.softmax(dim=-1)
        out = attn @ v  # (B, nW, nh, N, hd)
        out = out.permute(0, 1, 3, 2, 4).reshape(-1, nw, n, c)
        out = self.proj(out)
        out = out.reshape(-1, h // ws, w // ws, ws, ws, c)
        out = out.permute(0, 1, 3, 2, 4, 5).reshape(-1, h, w, c)
        if self.shift:
            out = torch.roll(out, (self.shift, self.shift), dims=(1, 2))
        return out


class SwinBlock(nn.Module):
    def __init__(self, dim: int, num_heads: int, hw: tuple[int, int],
                 shift: int = 0, mlp_ratio: int = 2):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = WindowAttention(dim, num_heads, hw, shift=shift)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp_fc1 = nn.Linear(dim, dim * mlp_ratio)
        self.mlp_fc2 = nn.Linear(dim * mlp_ratio, dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        y = self.mlp_fc1(self.norm2(x))
        y = F.gelu(y)  # exact erf form
        x = x + self.mlp_fc2(y)
        return x


class SwinStage(nn.Module):
    def __init__(self, dim: int, num_heads: int, depth: int,
                 hw: tuple[int, int]):
        super().__init__()
        self.blocks = nn.ModuleList([
            SwinBlock(dim, num_heads, hw,
                      shift=0 if i % 2 == 0 else WINDOW // 2)
            for i in range(depth)])

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        return x


class TorchSwinUNet(nn.Module):
    """Static-geometry mirror: ``tile`` (a multiple of 32) is baked in, the
    batch dimension stays dynamic — the shape class the reference's
    TensorRT profiles handle with a fixed-H/W optimization range."""

    def __init__(self, scale: int = 2, base_dim: int = 32,
                 depths: tuple = (2, 2, 2, 2, 2), tile: int = 64):
        super().__init__()
        assert tile % 32 == 0, "static export geometry must be /32"
        c = base_dim
        half = c // 2
        self.scale = scale
        self.tile = tile
        self.patch_conv1 = nn.Conv2d(3, half, 3, padding=1)
        self.patch_conv2 = nn.Conv2d(half, half, 3, padding=1)
        self.down1 = nn.Conv2d(half, c, 2, stride=2)
        self.swin1 = SwinStage(c, c // 32, depths[0],
                               (tile // 2, tile // 2))
        self.down2 = nn.Conv2d(c, 2 * c, 2, stride=2)
        self.swin2 = SwinStage(2 * c, (2 * c) // 32, depths[2],
                               (tile // 4, tile // 4))
        self.up2 = nn.Linear(2 * c, 4 * c)
        self.swin3 = SwinStage(c, c // 32, depths[3],
                               (tile // 2, tile // 2))
        self.up1 = nn.Linear(c, 4 * half)
        self.to_image = nn.Conv2d(half, 3 * scale * scale, 3, padding=1)

    def forward(self, x):  # (B, 3, tile, tile) in [0, 1]
        s = F.leaky_relu(self.patch_conv1(x), 0.1)
        s = F.leaky_relu(self.patch_conv2(s), 0.1)

        e1 = self.down1(s).permute(0, 2, 3, 1)  # NHWC
        e1 = self.swin1(e1)
        e2 = self.down2(e1.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        e2 = self.swin2(e2)

        d2 = self.up2(e2).permute(0, 3, 1, 2)
        d2 = F.pixel_shuffle(d2, 2).permute(0, 2, 3, 1)
        d2 = d2 + e1
        d2 = self.swin3(d2)

        d1 = self.up1(d2).permute(0, 3, 1, 2)
        d1 = F.pixel_shuffle(d1, 2)
        d1 = d1 + s

        z = self.to_image(d1)
        z = torch.clamp(z, 0.0, 1.0)
        if self.scale > 1:
            z = F.pixel_shuffle(z, self.scale)
        return z


def _trace_export(model, x, path, opset: int):
    """Export through the legacy torch.onnx tracer (the exporter lineage
    of the real release artifacts).

    torch's torchscript exporter builds the full ModelProto bytes in C++
    and then round-trips them through the `onnx` python package ONLY to
    append custom onnxscript functions (none here). That package is not
    installed in this image, so bypass the no-op step — the exported
    bytes are exactly what the C++ exporter produced. The bypass targets
    a private torch internal whose home has moved across torch versions:
    when it isn't where this torch keeps it (or `onnx` IS installed and
    the step would succeed anyway), export unpatched."""
    onnx_proto_utils = orig = None
    try:
        from torch.onnx._internal.torchscript_exporter import (
            onnx_proto_utils,
        )

        orig = onnx_proto_utils._add_onnxscript_fn
        onnx_proto_utils._add_onnxscript_fn = \
            lambda model_bytes, _co: model_bytes
    except (ImportError, AttributeError):
        onnx_proto_utils = None
    try:
        torch.onnx.export(
            model, (x,), str(path), opset_version=opset,
            input_names=["input"], output_names=["output"],
            dynamic_axes={"input": {0: "batch"}, "output": {0: "batch"}},
            dynamo=False,
        )
    finally:
        if onnx_proto_utils is not None:
            onnx_proto_utils._add_onnxscript_fn = orig


def export_torch_swin(path, scale: int = 2, base_dim: int = 32,
                      depths: tuple = (2, 2, 2, 2, 2), tile: int = 64,
                      seed: int = 0, opset: int = 17):
    """Build a randomly-initialized mirror and export it through the
    legacy torch.onnx tracer. Returns (model, path)."""
    torch.manual_seed(seed)
    model = TorchSwinUNet(scale=scale, base_dim=base_dim, depths=depths,
                          tile=tile).eval()
    # non-degenerate bias table (zeros would hide conversion transposes)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, WindowAttention):
                m.relative_position_bias_table.normal_(0.0, 0.02)
    _trace_export(model, torch.rand(1, 3, tile, tile), path, opset)
    return model, path


# --------------------------------------------------------------------------
# CUNet / UpCUNet torch mirror (upstream nunif cunet lineage; the flax
# reconstruction is models/cunet.py, the name conventions cunet_mapping's
# left column: unetN.convK.conv.{0,2,4.conv1,4.conv2})
# --------------------------------------------------------------------------


class TorchSEBlock(nn.Module):
    def __init__(self, ch: int, reduction: int = 8):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch // reduction, 1)
        self.conv2 = nn.Conv2d(ch // reduction, ch, 1)

    def forward(self, x):
        z = F.adaptive_avg_pool2d(x, 1)
        z = F.relu(self.conv1(z))
        z = torch.sigmoid(self.conv2(z))
        return x * z


class TorchUNetConv(nn.Module):
    """conv3x3(valid) → lrelu → conv3x3(valid) → lrelu → optional SE,
    packed in an nn.Sequential so state_dict names match upstream
    (``.conv.0`` / ``.conv.2`` / ``.conv.4.convN``)."""

    def __init__(self, cin: int, mid: int, out: int, se: bool):
        super().__init__()
        layers = [nn.Conv2d(cin, mid, 3), nn.LeakyReLU(0.1),
                  nn.Conv2d(mid, out, 3), nn.LeakyReLU(0.1)]
        if se:
            layers.append(TorchSEBlock(out))
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return self.conv(x)


def _crop(x, p: int):
    return x[:, :, p:-p, p:-p]


class TorchUNet1(nn.Module):
    def __init__(self, out_ch: int = 3, deconv: bool = False):
        super().__init__()
        self.conv1 = TorchUNetConv(3, 32, 64, se=False)
        self.conv1_down = nn.Conv2d(64, 64, 2, stride=2)
        self.conv2 = TorchUNetConv(64, 128, 64, se=True)
        self.conv2_up = nn.ConvTranspose2d(64, 64, 2, stride=2)
        self.conv3 = nn.Conv2d(64, 64, 3)
        if deconv:
            self.conv_bottom = nn.ConvTranspose2d(64, out_ch, 4, stride=2,
                                                  padding=3)
        else:
            self.conv_bottom = nn.Conv2d(64, out_ch, 3)

    def forward(self, x):
        x1 = self.conv1(x)
        x2 = F.leaky_relu(self.conv1_down(x1), 0.1)
        x2 = self.conv2(x2)
        x2 = F.leaky_relu(self.conv2_up(x2), 0.1)
        x3 = F.leaky_relu(self.conv3(_crop(x1, 4) + x2), 0.1)
        return self.conv_bottom(x3)


class TorchUNet2(nn.Module):
    def __init__(self, out_ch: int = 3):
        super().__init__()
        self.conv1 = TorchUNetConv(3, 32, 64, se=False)
        self.conv1_down = nn.Conv2d(64, 64, 2, stride=2)
        self.conv2 = TorchUNetConv(64, 64, 128, se=True)
        self.conv2_down = nn.Conv2d(128, 128, 2, stride=2)
        self.conv3 = TorchUNetConv(128, 256, 128, se=True)
        self.conv3_up = nn.ConvTranspose2d(128, 128, 2, stride=2)
        self.conv4 = TorchUNetConv(128, 64, 64, se=True)
        self.conv4_up = nn.ConvTranspose2d(64, 64, 2, stride=2)
        self.conv5 = nn.Conv2d(64, 64, 3)
        self.conv_bottom = nn.Conv2d(64, out_ch, 3)

    def forward(self, x):
        x1 = self.conv1(x)
        x2 = F.leaky_relu(self.conv1_down(x1), 0.1)
        x2 = self.conv2(x2)
        x3 = F.leaky_relu(self.conv2_down(x2), 0.1)
        x3 = self.conv3(x3)
        x3 = F.leaky_relu(self.conv3_up(x3), 0.1)
        x4 = self.conv4(_crop(x2, 4) + x3)
        x4 = F.leaky_relu(self.conv4_up(x4), 0.1)
        x5 = F.leaky_relu(self.conv5(_crop(x1, 16) + x4), 0.1)
        return self.conv_bottom(x5)


class TorchCUNet(nn.Module):
    """Scale-1 cascade (out = in - 56); UpCUNet when ``deconv``."""

    def __init__(self, deconv: bool = False):
        super().__init__()
        self.unet1 = TorchUNet1(3, deconv=deconv)
        self.unet2 = TorchUNet2(3)

    def forward(self, x):
        z1 = self.unet1(x)
        z2 = self.unet2(z1)
        return torch.clamp(_crop(z1, 20) + z2, 0.0, 1.0)


def export_torch_cunet(path, scale: int = 1, tile: int = 76,
                       seed: int = 0, opset: int = 17):
    """Randomly-initialized CUNet (1x) / UpCUNet (2x) mirror exported
    through the legacy torch.onnx tracer. Returns (model, path)."""
    torch.manual_seed(seed)
    model = TorchCUNet(deconv=(scale == 2)).eval()
    _trace_export(model, torch.rand(1, 3, tile, tile), path, opset)
    return model, path
