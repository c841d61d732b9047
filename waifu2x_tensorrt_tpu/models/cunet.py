"""CUNet family: cascaded U-Nets for 1x denoise and 2x upscale.

Faithful JAX/Flax reimplementation of upstream waifu2x CUNet/UpCUNet
(nagadomi/nunif waifu2x models; the reference consumes their ONNX exports,
``models/cunet/art/*.onnx``, src/main.cpp:201-204). All convolutions are
VALID ("no padding") so tiles lose context at the borders:

  CUNet  (scale 1): out = in - 56   (offset 28/side;  UNet1 16 + UNet2 40)
  UpCUNet(scale 2): out = 2*in - 72 (offset 36/side in output space)

which is exactly the ``outputTileSize != inputTileSize*scale`` case the
reference's tiling handles via the centered context border
(calculateTiles, src/tensorrt/img2img_render.cpp:11-19,46-51).

Layout is NHWC (TPU-native); weights are stored float32 and cast to the
compute dtype per call. Matmuls/convs accumulate in float32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_NEG_SLOPE = 0.1


def _lrelu(x):
    # single-select form: max(x, a*x) == leaky_relu(x) exactly for 0<a<1
    # (one VPU pass instead of compare+select; models/swin_unet.py)
    return jnp.maximum(x, jnp.asarray(_NEG_SLOPE, x.dtype) * x)


def _crop(x, p: int):
    """F.pad(x, (-p,)*4): center crop by p on each spatial side (NHWC)."""
    return x[:, p:-p, p:-p, :]


class SEBlock(nn.Module):
    """Squeeze-and-excitation over channels (global-mean pooled)."""

    features: int
    reduction: int = 8
    bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        z = jnp.mean(x, axis=(1, 2), dtype=jnp.float32).astype(self.dtype)
        z = nn.Dense(self.features // self.reduction, use_bias=self.bias,
                     dtype=self.dtype, name="fc1")(z)
        z = nn.relu(z)
        z = nn.Dense(self.features, use_bias=self.bias, dtype=self.dtype,
                     name="fc2")(z)
        z = nn.sigmoid(z)
        return x * z[:, None, None, :]


class _CT2x2Shuffle(nn.Module):
    """ConvTranspose(k=2, s=2, VALID) as one GEMM + depth-to-space.

    At kernel == stride == 2 every output pixel receives exactly ONE
    contributing input pixel: out[2i+di, 2j+dj, o] = sum_c x[i,j,c] *
    K[di,dj,c,o] + b[o]. XLA lowers a transposed conv through an
    interior-padded (zero-interleaved) convolution — on v5e the
    zero-interleave materializes as broadcast+select passes plus layout
    relayout copies over the full-resolution tensors (measured in the
    config1c device trace, BENCH_NOTES round 4 cunet section). The GEMM
    form computes the identical sum (the interleaved zeros contribute
    exact 0s), so it is numerically equivalent with the same param tree
    (kernel (2,2,cin,out) + bias, flax ConvTranspose names/shapes), and
    checkpoints load into either form unchanged.

    TPU-only opt via ``ct_as_shuffle`` (registry.create_model); default
    stays flax ConvTranspose.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        # lax.conv_transpose applies the kernel UNFLIPPED over the
        # zero-dilated input, so output parity (di,dj) reads tap
        # K[1-di, 1-dj] (verified vs nn.ConvTranspose): flip both spatial
        # axes, then pack K[di,dj,c,o] -> W[c, (di,dj,o)].
        wmat = jnp.transpose(kernel[::-1, ::-1], (2, 0, 1, 3)).reshape(
            cin, 4 * self.features).astype(self.dtype)
        y = jax.lax.dot_general(
            x.astype(self.dtype), wmat,
            (((x.ndim - 1,), (0,)), ((), ())))
        y = y.reshape(b, h, w, 2, 2, self.features)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            b, 2 * h, 2 * w, self.features)
        return y + bias.astype(self.dtype)


def _conv_transpose_2x2(features, dtype, name, shuffle: bool):
    if shuffle:
        return _CT2x2Shuffle(features, dtype=dtype, name=name)
    return nn.ConvTranspose(features, (2, 2), strides=(2, 2),
                            padding="VALID", dtype=dtype, name=name)


class UNetConv(nn.Module):
    """conv3x3(valid) → lrelu → conv3x3(valid) → lrelu → optional SE."""

    mid: int
    out: int
    se: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.mid, (3, 3), padding="VALID", dtype=self.dtype,
                    name="conv0")(x)
        x = _lrelu(x)
        x = nn.Conv(self.out, (3, 3), padding="VALID", dtype=self.dtype,
                    name="conv1")(x)
        x = _lrelu(x)
        if self.se:
            x = SEBlock(self.out, dtype=self.dtype, name="se")(x)
        return x


class UNet1(nn.Module):
    """Shallow U-Net; shrinks by 8/side (conv head) or upscales 2x with a
    k4s2p3 transposed-conv head (shrinks 16/side in output space)."""

    out_channels: int = 3
    deconv: bool = False
    dtype: Any = jnp.float32
    ct_as_shuffle: bool = False

    @nn.compact
    def __call__(self, x):
        x1 = UNetConv(32, 64, se=False, dtype=self.dtype, name="conv1")(x)
        x2 = nn.Conv(64, (2, 2), strides=(2, 2), padding="VALID",
                     dtype=self.dtype, name="conv1_down")(x1)
        x2 = _lrelu(x2)
        x2 = UNetConv(128, 64, se=True, dtype=self.dtype, name="conv2")(x2)
        x2 = _conv_transpose_2x2(64, self.dtype, "conv2_up",
                                 self.ct_as_shuffle)(x2)
        x2 = _lrelu(x2)
        x3 = nn.Conv(64, (3, 3), padding="VALID", dtype=self.dtype,
                     name="conv3")(_crop(x1, 4) + x2)
        x3 = _lrelu(x3)
        if self.deconv:
            # torch ConvTranspose2d(k=4, s=2, p=3): out = 2*in - 4 ==
            # VALID transposed conv (out = 2*in + 2) cropped by 3/side.
            z = nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                                 padding="VALID", dtype=self.dtype,
                                 name="conv_bottom")(x3)
            z = _crop(z, 3)
        else:
            z = nn.Conv(self.out_channels, (3, 3), padding="VALID",
                        dtype=self.dtype, name="conv_bottom")(x3)
        return z


class UNet2(nn.Module):
    """Deeper U-Net (two downsamples); shrinks by 20/side with conv head."""

    out_channels: int = 3
    deconv: bool = False
    dtype: Any = jnp.float32
    ct_as_shuffle: bool = False

    @nn.compact
    def __call__(self, x):
        x1 = UNetConv(32, 64, se=False, dtype=self.dtype, name="conv1")(x)
        x2 = nn.Conv(64, (2, 2), strides=(2, 2), padding="VALID",
                     dtype=self.dtype, name="conv1_down")(x1)
        x2 = _lrelu(x2)
        x2 = UNetConv(64, 128, se=True, dtype=self.dtype, name="conv2")(x2)
        x3 = nn.Conv(128, (2, 2), strides=(2, 2), padding="VALID",
                     dtype=self.dtype, name="conv2_down")(x2)
        x3 = _lrelu(x3)
        x3 = UNetConv(256, 128, se=True, dtype=self.dtype, name="conv3")(x3)
        x3 = _conv_transpose_2x2(128, self.dtype, "conv3_up",
                                 self.ct_as_shuffle)(x3)
        x3 = _lrelu(x3)
        x4 = UNetConv(64, 64, se=True, dtype=self.dtype, name="conv4")(
            _crop(x2, 4) + x3)
        x4 = _conv_transpose_2x2(64, self.dtype, "conv4_up",
                                 self.ct_as_shuffle)(x4)
        x4 = _lrelu(x4)
        x5 = nn.Conv(64, (3, 3), padding="VALID", dtype=self.dtype,
                     name="conv5")(_crop(x1, 16) + x4)
        x5 = _lrelu(x5)
        if self.deconv:
            z = nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                                 padding="VALID", dtype=self.dtype,
                                 name="conv_bottom")(x5)
            z = _crop(z, 3)
        else:
            z = nn.Conv(self.out_channels, (3, 3), padding="VALID",
                        dtype=self.dtype, name="conv_bottom")(x5)
        return z


class CUNet(nn.Module):
    """Scale-1 cascade: UNet1 then UNet2 refining a residual.

    out = in - 56 (offset 28/side). Input: NHWC float in [0, 1].
    """

    out_channels: int = 3
    clamp: bool = True
    dtype: Any = jnp.float32
    ct_as_shuffle: bool = False

    scale: int = 1
    offset: int = 28  # per-side, output space

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        z1 = UNet1(self.out_channels, deconv=False, dtype=self.dtype,
                   ct_as_shuffle=self.ct_as_shuffle, name="unet1")(x)
        z2 = UNet2(self.out_channels, deconv=False, dtype=self.dtype,
                   ct_as_shuffle=self.ct_as_shuffle, name="unet2")(z1)
        z = _crop(z1, 20) + z2
        if self.clamp:
            z = jnp.clip(z, 0.0, 1.0)
        return z


class UpCUNet(nn.Module):
    """Scale-2 cascade: UNet1 upscales 2x, UNet2 refines a residual.

    out = 2*in - 72 (offset 36/side in output space). Input: NHWC in [0, 1].
    """

    out_channels: int = 3
    clamp: bool = True
    dtype: Any = jnp.float32
    ct_as_shuffle: bool = False

    scale: int = 2
    offset: int = 36

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        z1 = UNet1(self.out_channels, deconv=True, dtype=self.dtype,
                   ct_as_shuffle=self.ct_as_shuffle, name="unet1")(x)
        z2 = UNet2(self.out_channels, deconv=False, dtype=self.dtype,
                   ct_as_shuffle=self.ct_as_shuffle, name="unet2")(z1)
        z = _crop(z1, 20) + z2
        if self.clamp:
            z = jnp.clip(z, 0.0, 1.0)
        return z
