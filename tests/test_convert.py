"""Weight-converter equivalence tests.

Builds a torch mirror of the upstream CUNet/UpCUNet topology (module names
and layer semantics as in nagadomi/nunif waifu2x cunet), converts its
random-init state_dict with models/convert.py, and checks the flax forward
matches torch to float tolerance — proving the layout transforms
(OIHW->HWIO, transposed-conv tap flip, SE-1x1->Dense) are exact.

Also round-trips the self-contained ONNX reader on a hand-encoded protobuf.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from waifu2x_tensorrt_tpu.models.convert import (  # noqa: E402
    cunet_from_torch,
    conv_transpose_weight,
)
from waifu2x_tensorrt_tpu.models.registry import create_model  # noqa: E402


class TorchSE(tnn.Module):
    def __init__(self, ch, r=8, bias=True):
        super().__init__()
        self.conv1 = tnn.Conv2d(ch, ch // r, 1, bias=bias)
        self.conv2 = tnn.Conv2d(ch // r, ch, 1, bias=bias)

    def forward(self, x):
        z = x.mean(dim=(2, 3), keepdim=True)
        z = torch.relu(self.conv1(z))
        z = torch.sigmoid(self.conv2(z))
        return x * z


class TorchUNetConv(tnn.Module):
    def __init__(self, cin, mid, cout, se):
        super().__init__()
        layers = [
            tnn.Conv2d(cin, mid, 3), tnn.LeakyReLU(0.1),
            tnn.Conv2d(mid, cout, 3), tnn.LeakyReLU(0.1),
        ]
        if se:
            layers.append(TorchSE(cout))
        self.conv = tnn.Sequential(*layers)

    def forward(self, x):
        return self.conv(x)


class TorchUNet1(tnn.Module):
    def __init__(self, cout=3, deconv=False):
        super().__init__()
        self.conv1 = TorchUNetConv(3, 32, 64, se=False)
        self.conv1_down = tnn.Conv2d(64, 64, 2, 2)
        self.conv2 = TorchUNetConv(64, 128, 64, se=True)
        self.conv2_up = tnn.ConvTranspose2d(64, 64, 2, 2)
        self.conv3 = tnn.Conv2d(64, 64, 3)
        if deconv:
            self.conv_bottom = tnn.ConvTranspose2d(64, cout, 4, 2, 3)
        else:
            self.conv_bottom = tnn.Conv2d(64, cout, 3)

    def forward(self, x):
        x1 = self.conv1(x)
        x2 = F.leaky_relu(self.conv1_down(x1), 0.1)
        x2 = self.conv2(x2)
        x2 = F.leaky_relu(self.conv2_up(x2), 0.1)
        x1 = x1[:, :, 4:-4, 4:-4]
        x3 = F.leaky_relu(self.conv3(x1 + x2), 0.1)
        return self.conv_bottom(x3)


class TorchUNet2(tnn.Module):
    def __init__(self, cout=3, deconv=False):
        super().__init__()
        self.conv1 = TorchUNetConv(3, 32, 64, se=False)
        self.conv1_down = tnn.Conv2d(64, 64, 2, 2)
        self.conv2 = TorchUNetConv(64, 64, 128, se=True)
        self.conv2_down = tnn.Conv2d(128, 128, 2, 2)
        self.conv3 = TorchUNetConv(128, 256, 128, se=True)
        self.conv3_up = tnn.ConvTranspose2d(128, 128, 2, 2)
        self.conv4 = TorchUNetConv(128, 64, 64, se=True)
        self.conv4_up = tnn.ConvTranspose2d(64, 64, 2, 2)
        self.conv5 = tnn.Conv2d(64, 64, 3)
        if deconv:
            self.conv_bottom = tnn.ConvTranspose2d(64, cout, 4, 2, 3)
        else:
            self.conv_bottom = tnn.Conv2d(64, cout, 3)

    def forward(self, x):
        x1 = self.conv1(x)
        x2 = self.conv2(F.leaky_relu(self.conv1_down(x1), 0.1))
        x3 = self.conv3(F.leaky_relu(self.conv2_down(x2), 0.1))
        x3 = F.leaky_relu(self.conv3_up(x3), 0.1)
        x4 = self.conv4(x2[:, :, 4:-4, 4:-4] + x3)
        x4 = F.leaky_relu(self.conv4_up(x4), 0.1)
        x5 = F.leaky_relu(self.conv5(x1[:, :, 16:-16, 16:-16] + x4), 0.1)
        return self.conv_bottom(x5)


class TorchCUNet(tnn.Module):
    def __init__(self, scale):
        super().__init__()
        self.unet1 = TorchUNet1(deconv=(scale == 2))
        self.unet2 = TorchUNet2(deconv=False)

    def forward(self, x):
        z1 = self.unet1(x)
        z2 = self.unet2(z1)
        return torch.clamp(z1[:, :, 20:-20, 20:-20] + z2, 0.0, 1.0)


def test_conv_transpose_equivalence():
    """flax ConvTranspose(kernel=convert(torch_w)) == torch ConvTranspose2d."""
    import flax.linen as nn
    import jax.numpy as jnp

    tconv = tnn.ConvTranspose2d(5, 7, 2, 2)
    x = torch.randn(1, 5, 6, 6)
    with torch.no_grad():
        ref = tconv(x).numpy()
    kernel = conv_transpose_weight(tconv.weight.detach().numpy())
    fconv = nn.ConvTranspose(7, (2, 2), strides=(2, 2), padding="VALID")
    y = fconv.apply(
        {"params": {"kernel": jnp.asarray(kernel),
                    "bias": jnp.asarray(tconv.bias.detach().numpy())}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5
    )


def test_conv_transpose_k4s2p3_equivalence():
    """The cunet 2x head: torch k4 s2 p3 == flax VALID deconv cropped 3."""
    import flax.linen as nn
    import jax.numpy as jnp

    tconv = tnn.ConvTranspose2d(4, 3, 4, 2, 3)
    x = torch.randn(1, 4, 10, 10)
    with torch.no_grad():
        ref = tconv(x).numpy()
    kernel = conv_transpose_weight(tconv.weight.detach().numpy())
    fconv = nn.ConvTranspose(3, (4, 4), strides=(2, 2), padding="VALID")
    y = fconv.apply(
        {"params": {"kernel": jnp.asarray(kernel),
                    "bias": jnp.asarray(tconv.bias.detach().numpy())}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    y = np.asarray(y)[:, 3:-3, 3:-3, :]
    np.testing.assert_allclose(y.transpose(0, 3, 1, 2), ref, atol=1e-5)


@pytest.mark.parametrize("scale", [1, 2])
def test_cunet_forward_equivalence(scale):
    torch.manual_seed(0)
    tmodel = TorchCUNet(scale).eval()
    params = cunet_from_torch(tmodel.state_dict(), scale)

    module, spec = create_model("cunet/art", scale, 0)
    x = np.random.default_rng(0).random((1, 76, 76, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    import jax.numpy as jnp

    y = module.apply({"params": params}, jnp.asarray(x))
    got = np.asarray(y).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_onnx_reader_roundtrip(tmp_path):
    """Hand-encode a minimal ONNX ModelProto and read it back."""
    import struct

    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def field(num, wire, payload):
        return varint((num << 3) | wire) + (
            varint(len(payload)) + payload if wire == 2 else payload
        )

    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    tensor = (
        field(1, 0, varint(3)) + field(1, 0, varint(4))  # dims
        + field(2, 0, varint(1))  # data_type float
        + field(8, 2, b"w1")  # name
        + field(9, 2, arr.tobytes())  # raw_data
    )
    graph = field(5, 2, tensor)
    model = field(7, 2, graph)
    p = tmp_path / "m.onnx"
    p.write_bytes(model)

    from waifu2x_tensorrt_tpu.models.onnx_reader import read_initializers

    inits = read_initializers(p)
    assert list(inits) == ["w1"]
    np.testing.assert_array_equal(inits["w1"], arr)


class TorchSwinBlockMirror(tnn.Module):
    """Torch mirror of one no-shift SwinBlock on a single 8x8 window —
    numerically validates every swin converter transform (LN scale/bias,
    qkv/proj/mlp Linear transpose, relative-position-bias table)."""

    class _Attn(tnn.Module):
        def __init__(self, dim, heads, ws):
            super().__init__()
            self.qkv = tnn.Linear(dim, 3 * dim)
            self.proj = tnn.Linear(dim, dim)
            self.relative_position_bias_table = tnn.Parameter(
                torch.randn((2 * ws - 1) ** 2, heads) * 0.02
            )

    def __init__(self, dim=96, heads=3, ws=8):
        super().__init__()
        self.dim, self.heads, self.ws = dim, heads, ws
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = self._Attn(dim, heads, ws)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp_fc1 = tnn.Linear(dim, dim * 2)
        self.mlp_fc2 = tnn.Linear(dim * 2, dim)

    def forward(self, x):  # x: (1, ws, ws, dim)
        from waifu2x_tensorrt_tpu.models.swin_unet import (
            _relative_position_index,
        )

        ws, nh = self.ws, self.heads
        hd = self.dim // nh
        n = ws * ws
        y = self.norm1(x).reshape(1, n, self.dim)
        qkv = self.attn.qkv(y).reshape(1, n, 3, nh, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (1, nh, n, hd)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        idx = torch.from_numpy(_relative_position_index(ws)).long()
        bias = self.attn.relative_position_bias_table[idx.reshape(-1)]
        bias = bias.reshape(n, n, nh).permute(2, 0, 1)
        attn = torch.softmax(attn + bias[None], dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(1, n, self.dim)
        x = x + self.attn.proj(out).reshape(1, ws, ws, self.dim)
        y = self.norm2(x)
        y = self.mlp_fc2(torch.nn.functional.gelu(self.mlp_fc1(y)))
        return x + y


def test_swin_block_converter_equivalence():
    from waifu2x_tensorrt_tpu.models.convert import swin_from_torch
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinBlock
    import jax.numpy as jnp

    torch.manual_seed(0)
    tblock = TorchSwinBlockMirror().eval()
    sd = {f"swin1.block0.{k}": v for k, v in tblock.state_dict().items()}
    # reuse the full-mapping converter, then pull the one block out
    params = swin_from_torch(sd, 2, depths=(1, 0, 0, 0, 0), strict=False)
    block_params = params["swin1"]["block0"]

    x = np.random.default_rng(0).random((1, 8, 8, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tblock(torch.from_numpy(x)).numpy()
    fblock = SwinBlock(96, 3, shift=0)
    got = np.asarray(fblock.apply({"params": block_params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_swin_full_mapping_is_structurally_complete():
    """The converter's flax paths must exactly cover a real init tree."""
    from waifu2x_tensorrt_tpu.models.convert import swin_mapping
    from waifu2x_tensorrt_tpu.models.registry import (
        _flatten,
        create_model,
        init_params,
    )

    module, _ = create_model("swin_unet/art", 2, -1)
    flat = _flatten(init_params(module, tile=32))
    expected_prefixes = set()
    for _, dst, kind in swin_mapping(2):
        if kind == "table":
            expected_prefixes.add(dst)
        elif kind == "norm":
            expected_prefixes.update({f"{dst}/scale", f"{dst}/bias"})
        else:
            expected_prefixes.update({f"{dst}/kernel", f"{dst}/bias"})
    assert set(flat) == expected_prefixes
