"""SwinUNet family: shifted-window-attention U-Net for 1x/2x/4x upscaling.

TPU-native reconstruction of upstream waifu2x ``swin_unet``
(nagadomi/nunif; the reference consumes its ONNX exports for the art,
art_scan and photo weight sets, src/main.cpp:26-31). Architecture follows
the published upstream design — conv stem at full resolution, Swin
transformer blocks at 1/2 and 1/4 resolution (base_dim 96, window 8,
head_dim 32, shifted windows on alternating blocks, relative position
bias), pixel-shuffle decoder and scale-specific pixel-shuffle head — laid
out NHWC with float32 LayerNorm/softmax and bfloat16-friendly matmuls.

Unlike cunet, output size is exactly ``input * scale`` (offset 0): the
model pads internally to a multiple of 32 (two stride-2 stages x window 8)
with edge replication and crops after decoding, so every CLI tile size
{64, 128, 256, 400, 640} is valid (400 -> padded 416).

Checkpoint compatibility: this is a reconstruction, not a translation; the
weight converter (models/convert.py) maps upstream checkpoints by name
table and must be validated against real files before fidelity claims.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_NEG_SLOPE = 0.1
WINDOW = 8


def _lrelu(x):
    """leaky_relu as ONE select: max(x, a*x) == leaky_relu(x) exactly for
    0 < a < 1 (nn.leaky_relu's compare+select lowered as a standalone
    1.15 ms/chunk pass over the full-res stem on v5e)."""
    return jnp.maximum(x, jnp.asarray(_NEG_SLOPE, x.dtype) * x)


@functools.lru_cache(maxsize=None)
def _relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2*ws-1)^2 relative-bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)  # (2, ws*ws)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)  # to [0, 2*ws-2]
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Additive attention mask (nW, N, N) for cyclic-shifted windows.

    Standard Swin construction: windows straddling the roll boundary get
    -inf between tokens originating from different image regions.
    """
    img = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for ws_ in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, ws_] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)  # (nW, N)
    diff = win[:, :, None] - win[:, None, :]
    return np.where(diff == 0, 0.0, -1e9).astype(np.float32)


def _window_split(x, ws: int):
    """(B, H, W, C) -> (B, nH*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // ws) * (w // ws), ws * ws, c)


def _window_merge(x, h: int, w: int, ws: int):
    """Inverse of _window_split."""
    b = x.shape[0]
    c = x.shape[-1]
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _window_roll(xw, nwy: int, nwx: int, shift: int):
    """Cyclic pixel-space roll by (shift, shift) WITHOUT leaving the
    window-partitioned layout (B, nW, N, C): each output window reassembles
    from quadrants of the same/neighbouring windows. Bit-identical to
    ``split(roll(merge(x), (shift, shift), (1, 2)))`` and measurably
    cheaper on TPU (slice+concat along leading dims instead of two 6-D
    transposes; v5e: 2.0 vs 2.6 ms at stage-1 geometry)."""
    b, nw, n, c = xw.shape
    ws = WINDOW
    x6 = xw.reshape(b, nwy, nwx, ws, ws, c)
    if shift < 0:
        s = -shift
        x6 = jnp.concatenate(
            [x6[:, :, :, s:], jnp.roll(x6, -1, axis=1)[:, :, :, :s]], axis=3)
        x6 = jnp.concatenate(
            [x6[:, :, :, :, s:],
             jnp.roll(x6, -1, axis=2)[:, :, :, :, :s]], axis=4)
    else:
        s = shift
        x6 = jnp.concatenate(
            [jnp.roll(x6, 1, axis=1)[:, :, :, ws - s:],
             x6[:, :, :, :ws - s]], axis=3)
        x6 = jnp.concatenate(
            [jnp.roll(x6, 1, axis=2)[:, :, :, :, ws - s:],
             x6[:, :, :, :, :ws - s]], axis=4)
    return x6.reshape(b, nw, n, c)


def _shift_flags(n_wy: int, n_wx: int) -> np.ndarray:
    """Per-window boundary flags for the analytic shift mask: bit0 = window
    is in the last (rolled) row, bit1 = last column."""
    flags = np.zeros((n_wy, n_wx), dtype=np.int32)
    flags[-1, :] |= 1
    flags[:, -1] |= 2
    return flags.reshape(-1)


class WindowAttention(nn.Module):
    """Multi-head self-attention within (shifted) windows + relative bias."""

    dim: int
    num_heads: int
    window: int = WINDOW
    shift: int = 0
    dtype: Any = jnp.float32
    use_pallas: bool = False
    fast_softmax: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window
        nh = self.num_heads
        hd = c // nh

        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))

        xw = _window_split(x, ws)  # (B, nW, N, C)
        n_windows, n_tok = xw.shape[1], xw.shape[2]

        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(xw)

        bias_table = self.param(
            "relative_position_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, nh),
            jnp.float32,
        )
        idx = jnp.asarray(_relative_position_index(ws))
        bias = bias_table[idx.reshape(-1)].reshape(n_tok, n_tok, nh)
        bias = bias.transpose(2, 0, 1)  # (nh, N, N)

        if self.use_pallas:
            # packed-qkv kernel: no (3, nh, hd) split/transpose ever leaves
            # VMEM (ops/window_attention.py::fused_window_attention_qkv)
            from waifu2x_tensorrt_tpu.ops.window_attention import (
                fused_window_attention_qkv,
            )

            flags = jnp.asarray(
                np.tile(_shift_flags(h // ws, w // ws), b)
            )
            out = fused_window_attention_qkv(
                qkv.reshape(b * n_windows, n_tok, 3 * c),
                bias,
                flags,
                num_heads=nh,
                shift=self.shift,
                ws=ws,
                fast_softmax=self.fast_softmax,
            ).reshape(b, n_windows, n_tok, c)
        else:
            qkv = qkv.reshape(b, n_windows, n_tok, 3, nh, hd)
            q, k, v = (qkv[..., i, :, :] for i in range(3))  # (B,nW,N,nh,hd)
            q = q.transpose(0, 1, 3, 2, 4)  # (B,nW,nh,N,hd)
            k = k.transpose(0, 1, 3, 2, 4)
            v = v.transpose(0, 1, 3, 2, 4)
            scale = hd ** -0.5
            attn = jnp.einsum(
                "bwhnd,bwhmd->bwhnm", q * scale, k,
                preferred_element_type=jnp.float32,
            )  # (B,nW,nh,N,N) fp32
            attn = attn + bias[None, None]
            if self.shift:
                mask = jnp.asarray(_shift_attn_mask(h, w, ws, self.shift))
                attn = attn + mask[None, :, None, :, :]
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
            attn = attn.astype(self.dtype)
            out = jnp.einsum(
                "bwhnm,bwhmd->bwhnd", attn, v.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            out = out.transpose(0, 1, 3, 2, 4).reshape(
                b, n_windows, n_tok, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        out = _window_merge(out, h, w, ws)

        if self.shift:
            out = jnp.roll(out, (self.shift, self.shift), axis=(1, 2))
        return out


class _DenseParams(nn.Module):
    """Declares kernel/bias with nn.Dense's names/inits, without computing —
    lets the fused-block kernel own the math while keeping the parameter
    tree identical to the dense path."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        return {
            "kernel": self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.fin, self.fout), jnp.float32),
            "bias": self.param("bias", nn.initializers.zeros,
                               (self.fout,), jnp.float32),
        }


class _ConvParams(nn.Module):
    """Conv kernel/bias with nn.Conv's names/inits, without computing."""

    fin: int
    fout: int
    ksize: tuple = (3, 3)

    @nn.compact
    def __call__(self):
        return {
            "kernel": self.param("kernel", nn.initializers.lecun_normal(),
                                 (*self.ksize, self.fin, self.fout),
                                 jnp.float32),
            "bias": self.param("bias", nn.initializers.zeros,
                               (self.fout,), jnp.float32),
        }


class _NormParams(nn.Module):
    """LayerNorm scale/bias params (names/inits matching nn.LayerNorm)."""

    dim: int

    @nn.compact
    def __call__(self):
        return {
            "scale": self.param("scale", nn.initializers.ones,
                                (self.dim,), jnp.float32),
            "bias": self.param("bias", nn.initializers.zeros,
                               (self.dim,), jnp.float32),
        }


class _AttnParams(nn.Module):
    """WindowAttention's parameters (scope-compatible with the module)."""

    dim: int
    num_heads: int
    window: int = WINDOW

    @nn.compact
    def __call__(self):
        qkv = _DenseParams(self.dim, 3 * self.dim, name="qkv")()
        proj = _DenseParams(self.dim, self.dim, name="proj")()
        table = self.param(
            "relative_position_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        return qkv, proj, table


class SwinBlock(nn.Module):
    """Pre-norm transformer block: W-MSA/SW-MSA + 2x-expansion GELU MLP.

    With ``use_pallas`` the whole block runs as ONE fused TPU kernel
    (ops/swin_block.py): LN1 -> qkv -> attention -> proj -> residual ->
    LN2 -> MLP -> residual, with activations touching HBM once per block.
    Cyclic shift commutes with the (pointwise) LayerNorms, so rolling the
    raw input first is exactly equivalent to the dense path's
    LN-then-roll ordering.
    """

    dim: int
    num_heads: int
    shift: int = 0
    mlp_ratio: int = 2
    dtype: Any = jnp.float32
    use_pallas: bool = False
    fast_softmax: bool = True
    block_windows: int = 32  # pallas kernel grid block (windows per step)
    # EXPERIMENTAL whole-block fusion (ops/swin_block.py): numerically
    # validated in interpret mode, but the compiled Mosaic lowering is
    # currently pathological (~250x slower than the attention-only kernel
    # on v5e — the in-kernel (wb,N,C)->(wb*N,C) flatten forces relayouts)
    # and drifts in bf16. Kept for continued kernel work; NOT the default.
    fused_block: bool = False

    @nn.compact
    def __call__(self, x, token_hw=None):
        if token_hw is not None:
            # token mode (fused only): x is (B, nW, N, C), already rolled
            # by the caller (SwinStage keeps windows partitioned across the
            # stage and rolls in window space)
            return self._fused_tokens(x, token_hw)
        if self.fused_block:
            return self._fused(x)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + WindowAttention(
            self.dim, self.num_heads, shift=self.shift, dtype=self.dtype,
            use_pallas=self.use_pallas, fast_softmax=self.fast_softmax,
            name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)  # exact erf, matching torch nn.GELU
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y

    def _fused(self, x):
        b, h, w, c = x.shape
        ws = WINDOW
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        xw = _window_split(x, ws)  # (B, nW, N, C)
        out = self._fused_tokens(xw, (h, w))
        out = _window_merge(out, h, w, ws)
        if self.shift:
            out = jnp.roll(out, (self.shift, self.shift), axis=(1, 2))
        return out

    def _fused_tokens(self, xw, token_hw):
        """Whole-block kernel over window tokens (B, nW, N, C); the caller
        owns partition/merge and any cyclic roll."""
        from waifu2x_tensorrt_tpu.ops.swin_block import fused_swin_block

        b, n_windows, n_tok, c = xw.shape
        h, w = token_hw
        ws = WINDOW
        n1 = _NormParams(c, name="norm1")()
        qkv, proj, table = _AttnParams(c, self.num_heads, name="attn")()
        n2 = _NormParams(c, name="norm2")()
        fc1 = _DenseParams(c, c * self.mlp_ratio, name="mlp_fc1")()
        fc2 = _DenseParams(c * self.mlp_ratio, c, name="mlp_fc2")()

        idx = jnp.asarray(_relative_position_index(ws))
        bias = table[idx.reshape(-1)].reshape(n_tok, n_tok, self.num_heads)
        bias = bias.transpose(2, 0, 1)  # (nh, N, N)
        flags = jnp.asarray(np.tile(_shift_flags(h // ws, w // ws), b))

        kparams = {
            "n1_scale": n1["scale"], "n1_bias": n1["bias"],
            "qkv_kernel": qkv["kernel"], "qkv_bias": qkv["bias"],
            "proj_kernel": proj["kernel"], "proj_bias": proj["bias"],
            "n2_scale": n2["scale"], "n2_bias": n2["bias"],
            "fc1_kernel": fc1["kernel"], "fc1_bias": fc1["bias"],
            "fc2_kernel": fc2["kernel"], "fc2_bias": fc2["bias"],
        }
        return fused_swin_block(
            xw.reshape(b * n_windows, n_tok, c).astype(self.dtype),
            kparams, bias, flags,
            num_heads=self.num_heads, shift=self.shift, ws=ws,
            block_windows=self.block_windows,
            fast_softmax=self.fast_softmax,
        ).reshape(b, n_windows, n_tok, c)


class SwinStage(nn.Module):
    """``depth`` blocks alternating no-shift / shift-by-window//2."""

    dim: int
    num_heads: int
    depth: int
    dtype: Any = jnp.float32
    use_pallas: bool = False
    fused_block: bool = False
    fast_softmax: bool = True
    block_windows: int = 32

    @nn.compact
    def __call__(self, x):
        def block(i):
            return SwinBlock(
                self.dim,
                self.num_heads,
                shift=0 if i % 2 == 0 else WINDOW // 2,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                fused_block=self.fused_block,
                fast_softmax=self.fast_softmax,
                block_windows=self.block_windows,
                name=f"block{i}",
            )

        # Killing the per-block merge -> roll -> split transpose chains
        # (~4.7 ms of a 22.9 ms 16-tile chunk, traced 2026-08-16) has now
        # failed twice:
        #  - stage-level token orchestration with _window_roll in XLA is
        #    slower (7.9 vs 6.8 ms per 2-block stage) — XLA fuses the
        #    transpose chains better than slice+concat rolls;
        #  - fusing the roll INTO the kernel via a halo-row BlockSpec
        #    (fused_swin_block_rows, validated bit-exact in interpret
        #    mode) does not compile on v5e Mosaic: the window-column
        #    exchange needs either pltpu.roll ("Rotate with non-32-bit
        #    data" on bf16) or an in-kernel (N)->(ws,ws) token reshape
        #    ("infer-vector-layout: unsupported shape cast").
        # Per-block remains the fused default.
        for i in range(self.depth):
            x = block(i)(x)
        return x


def _pixel_shuffle(x, r: int):
    """Depth-to-space: (B, H, W, C*r*r) -> (B, H*r, W*r, C)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    # channel layout matches torch.nn.PixelShuffle: (C, r, r) fastest-last
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


def _two_stage_shuffle_perm(out_channels: int, r: int) -> np.ndarray:
    """Output-channel permutation that lets a D2S(r=4) run as two chained
    CRD D2S(r=2) ops: new index n places the POSITION-HIGH bits in the low
    channel bits (consumed by the first shuffle). Returns ``inv`` such that
    ``kernel[..., inv]`` is the permuted kernel."""
    assert r == 4
    o = np.arange(out_channels * r * r)
    c, rem = np.divmod(o, r * r)
    ry, rx = np.divmod(rem, r)
    n = c * 16 + (ry % 2) * 8 + (rx % 2) * 4 + (ry // 2) * 2 + (rx // 2)
    inv = np.empty_like(n)
    inv[n] = o
    return inv


def _dense_shuffle_as_deconv(x, kernel, bias, dtype):
    """Dense(C_in -> 4*C_out) followed by _pixel_shuffle(·, 2), expressed as
    ONE stride-2 transposed convolution (bit-identical math: the 2x2 deconv
    taps are exactly the dense columns regrouped per sub-pixel position).

    Layout experiment (round-2 roadmap item 1): the Dense+shuffle pair costs
    a full-resolution 6-D transpose copy per decoder level on v5e; a single
    conv_general_dilated gives XLA the freedom to pick the output layout and
    fuse the scatter into the GEMM epilogue. Parameters stay the plain Dense
    (in, 4*out) kernel — this is a trace-time reshape, so checkpoints and
    the converter are unaffected.
    """
    cin, four_cout = kernel.shape
    cout = four_cout // 4
    # dense out channel index = cc*4 + ry*2 + rx  (torch PixelShuffle CRD);
    # gradient-of-conv form needs the 2x2 taps spatially flipped: with
    # lhs_dilation 2 and lo-pad 1, output row 2i+ry reads dilated row 2i
    # through tap ky = 1-ry.
    w = kernel.reshape(cin, cout, 2, 2)          # (in, cc, ry, rx)
    w = w.transpose(2, 3, 0, 1)[::-1, ::-1]      # (ky, kx, in, cc) = HWIO
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # the dense bias is per PRE-shuffle channel, i.e. per (cc, ry, rx):
    # add it on a parity-expanded view (reshape of contiguous dims — fuses
    # into the conv epilogue, no copy)
    b_, hh, ww, _ = y.shape
    bmap = bias.reshape(cout, 2, 2).transpose(1, 2, 0).astype(dtype)
    y = y.reshape(b_, hh // 2, 2, ww // 2, 2, cout)
    y = y + bmap[None, None, :, None, :, :]
    return y.reshape(b_, hh, ww, cout)


def _lane_padded_conv(x, kernel, bias, pad_out: int, dtype,
                      strides=(1, 1), padding="SAME"):
    """Convolution whose kernel/bias are zero-padded at trace time: input
    channels up to ``x.shape[-1]``, output channels up to ``pad_out``
    (0 = keep). The padded channels contribute / carry exact zeros
    (0-weight taps add +0.0 to every accumulator), so this is the unpadded
    conv's math at full vector-lane occupancy — parameters keep their
    original checkpoint shapes."""
    cin = kernel.shape[2]
    cout = kernel.shape[3]
    cin_x = x.shape[-1]
    if cin_x != cin:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cin_x - cin), (0, 0)))
    if pad_out and pad_out > cout:
        kernel = jnp.pad(kernel,
                         ((0, 0), (0, 0), (0, 0), (0, pad_out - cout)))
        bias = jnp.pad(bias, (0, pad_out - cout))
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dtype)


def _conv_shuffle_as_deconv(x, kernel, bias, r: int, dtype):
    """Conv k*k SAME (C_in -> C_out*r^2) + _pixel_shuffle(.., r) as ONE
    stride-r transposed convolution (bit-identical regrouping — the
    generalization of _dense_shuffle_as_deconv from k=1 to any odd k).

    Output pixel (r*y+ry, r*x+rx, c) of the sub-pixel form reads input
    rows y+dy-p (p = (k-1)//2, SAME zero-pad); with lhs_dilation r the
    same read is tap ky = r*dy + (r-1-ry) of a (k*r, k*r) kernel under
    lo-pad r*p + r - 1 / hi-pad r*(k-p) - 1. Every tap of the big kernel
    is one original weight (no zeros). The conv bias is per pre-shuffle
    channel (c, ry, rx): added on a parity-expanded view (free reshape,
    fuses into the conv epilogue)."""
    k, k2, cin, corr = kernel.shape
    assert k == k2 and k % 2 == 1, kernel.shape
    cout = corr // (r * r)
    p = (k - 1) // 2
    w = kernel.reshape(k, k, cin, cout, r, r)     # (dy, dx, i, c, ry, rx)
    w = w.transpose(0, 4, 1, 5, 2, 3)             # (dy, ry, dx, rx, i, c)
    w = w[:, ::-1, :, ::-1]                       # ry -> r-1-ry, rx alike
    w = w.reshape(k * r, k * r, cin, cout)
    pad = (r * p + r - 1, r * (k - p) - 1)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype),
        window_strides=(1, 1),
        padding=(pad, pad),
        lhs_dilation=(r, r),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b_, hh, ww, _ = y.shape
    bmap = bias.reshape(cout, r, r).transpose(1, 2, 0).astype(dtype)
    y = y.reshape(b_, hh // r, r, ww // r, r, cout)
    y = y + bmap[None, None, :, None, :, :]
    return y.reshape(b_, hh, ww, cout)


class SwinUNet(nn.Module):
    """U-Net over Swin stages; output is input*scale exactly (offset 0)."""

    scale: int = 4
    out_channels: int = 3
    base_dim: int = 96
    depths: tuple = (2, 2, 6, 2, 2)  # swin1, (unused enc slot), bottleneck, dec2, dec1
    clamp: bool = True
    dtype: Any = jnp.float32
    use_pallas: bool = False
    fused_block: bool = False
    # fast_softmax: permit the no-max-subtract bf16 softmax in the Pallas
    # kernels. The loader clears this per checkpoint when the proven
    # attention-logit bound (ops/logit_bound.py) exceeds the clamp budget
    # (engine/upscaler.py _guard_fast_softmax).
    fast_softmax: bool = True
    block_windows: int = 32  # pallas kernel tuning knob
    # packed_head: skip the final depth-to-space and return the head conv's
    # packed (B, H, W, 3*r*r) output. The per-tile (.., 3, r, r) transpose
    # has minor-dim 3 (3/128 TPU lane efficiency, ~3.3 ms of an 18 ms batch
    # at B=8); the renderer blends/scatters in packed layout (48 lanes) and
    # unpacks ONCE on the full canvas (engine/renderer.py).
    packed_head: bool = False
    # shuffle_via_deconv: express the two decoder Dense+pixel-shuffle pairs
    # as single stride-2 transposed convolutions (bit-identical regrouping
    # of the same parameters — _dense_shuffle_as_deconv). Measured +3.7%
    # streamed on v5e; the TPU default via create_model.
    shuffle_via_deconv: bool = False
    # head_shuffle_2stage (scale 4 only): run the head depth-to-space as two
    # chained r=2 shuffles with the required channel order folded into
    # to_image's output channels at trace time (bit-identical). MEASURED
    # v5e 2026-08-17: 435.6 vs 474.3 MP/s — LOSES; kept as the recorded
    # negative result.
    head_shuffle_2stage: bool = False
    # packed_x_head: emit (B, rH, rW/16, 48) — the packed-x16 layout whose
    # row-major bytes are IDENTICAL to the (B, rH, rW, 3) pixel tensor —
    # via the fused clamp+shuffle Pallas kernel (ops/head_pack.py): no
    # depth-to-space transpose in XLA, and the renderer's blend/scatter/u8
    # run at 48 lanes with a FREE final reshape. Requires rW % 16 == 0.
    # MEASURED v5e 2026-08-17: 414.6 vs 475.3 MP/s streamed — LOSES (the
    # one-hot-dot kernel + packed finalize outweigh the removed D2S;
    # BENCH_NOTES "packed-x head"). Opt-in (WAIFU2X_PACK_X=1), kept as an
    # exactly-tested layout seam should Mosaic store costs change.
    packed_x_head: bool = False
    # head_via_deconv: the head sub-pixel conv (Conv3x3 -> 3r^2 channels +
    # D2S(r)) as ONE stride-r transposed conv with the (3r, 3r) regrouped
    # kernel (_conv_shuffle_as_deconv; bit-identical). Kills the last
    # D2S transpose copies (~2.8 ms/chunk on v5e) the same way
    # shuffle_via_deconv killed the decoder ones.
    head_via_deconv: bool = False
    # lane_pad: zero-pad the FULL-RES channel dim (base_dim//2 = 48 on the
    # flagship) up to this many vector lanes at trace time. The stem
    # lrelus and the d1+s skip add profiled lane-bound at 48/128 lane
    # occupancy on v5e (BENCH_NOTES round-3 closing profile); padding the
    # stem/decoder-1/head-input channels to 128 runs those passes at full
    # occupancy. The extra channels carry exact zeros end-to-end
    # (zero-padded kernels/biases — every padded tap adds +0.0), so the
    # output matches the unpadded model up to fp reduction grouping, and
    # parameters keep their original checkpoint shapes (the pad is a
    # trace-time jnp.pad of the weights, as with shuffle_via_deconv).
    lane_pad: int = 0

    offset: int = 0

    @nn.compact
    def __call__(self, x):
        if self.scale not in (1, 2, 4):
            raise ValueError(f"unsupported scale {self.scale}")
        x = x.astype(self.dtype)
        b, h, w, _ = x.shape
        c = self.base_dim
        half = c // 2
        lane = self.lane_pad if self.lane_pad > half else 0
        if lane and (self.packed_head or self.packed_x_head
                     or self.head_shuffle_2stage):
            raise ValueError(
                "lane_pad composes only with the default or deconv head "
                "variants (packed layouts re-interpret head channels)")

        # Internal pad to a multiple of 32 (2 stride-2 stages x window 8).
        mult = 32
        ph = (-h) % mult
        pw = (-w) % mult
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        hp, wp = h + ph, w + pw

        # Full-res conv stem.
        if lane:
            c1 = _ConvParams(3, half, (3, 3), name="patch_conv1")()
            s = _lrelu(_lane_padded_conv(
                x, c1["kernel"], c1["bias"], lane, self.dtype))
            c2 = _ConvParams(half, half, (3, 3), name="patch_conv2")()
            s = _lrelu(_lane_padded_conv(
                s, c2["kernel"], c2["bias"], lane, self.dtype))
        else:
            s = nn.Conv(half, (3, 3), padding="SAME", dtype=self.dtype,
                        name="patch_conv1")(x)
            s = _lrelu(s)
            s = nn.Conv(half, (3, 3), padding="SAME", dtype=self.dtype,
                        name="patch_conv2")(s)
            s = _lrelu(s)

        # Encoder.
        if lane:
            dn = _ConvParams(half, c, (2, 2), name="down1")()
            e1 = _lane_padded_conv(s, dn["kernel"], dn["bias"], 0,
                                   self.dtype, strides=(2, 2),
                                   padding="VALID")
        else:
            e1 = nn.Conv(c, (2, 2), strides=(2, 2), padding="VALID",
                         dtype=self.dtype, name="down1")(s)
        e1 = SwinStage(c, c // 32, self.depths[0], dtype=self.dtype,
                       use_pallas=self.use_pallas,
                       fused_block=self.fused_block,
                       fast_softmax=self.fast_softmax,
                       block_windows=self.block_windows, name="swin1")(e1)

        e2 = nn.Conv(2 * c, (2, 2), strides=(2, 2), padding="VALID",
                     dtype=self.dtype, name="down2")(e1)
        e2 = SwinStage(2 * c, (2 * c) // 32, self.depths[2],
                       dtype=self.dtype, use_pallas=self.use_pallas,
                       fused_block=self.fused_block,
                       fast_softmax=self.fast_softmax,
                       block_windows=self.block_windows, name="swin2")(e2)

        # Decoder with skip connections.
        if self.shuffle_via_deconv:
            up2p = _DenseParams(2 * c, 4 * c, name="up2")()
            d2 = _dense_shuffle_as_deconv(e2, up2p["kernel"], up2p["bias"],
                                          self.dtype)
        else:
            d2 = nn.Dense(4 * c, dtype=self.dtype, name="up2")(e2)
            d2 = _pixel_shuffle(d2, 2)  # (hp/2, wp/2, C)
        d2 = d2 + e1
        d2 = SwinStage(c, c // 32, self.depths[3], dtype=self.dtype,
                       use_pallas=self.use_pallas,
                       fused_block=self.fused_block,
                       fast_softmax=self.fast_softmax,
                       block_windows=self.block_windows, name="swin3")(d2)

        if self.shuffle_via_deconv or lane:
            up1p = _DenseParams(c, 4 * half, name="up1")()
            k1, b1 = up1p["kernel"], up1p["bias"]
            if lane:
                # dense out index = cc*4 + ry*2 + rx (torch PixelShuffle
                # CRD, see _dense_shuffle_as_deconv): pad the cc dim so d1
                # comes out with ``lane`` channels, the extra ones exact 0
                k1 = jnp.pad(k1.reshape(c, half, 4),
                             ((0, 0), (0, lane - half), (0, 0))
                             ).reshape(c, 4 * lane)
                b1 = jnp.pad(b1.reshape(half, 4),
                             ((0, lane - half), (0, 0))).reshape(4 * lane)
            if self.shuffle_via_deconv:
                d1 = _dense_shuffle_as_deconv(d2, k1, b1, self.dtype)
            else:
                d1 = jnp.dot(d2, k1.astype(self.dtype)) + b1.astype(
                    self.dtype)
                d1 = _pixel_shuffle(d1, 2)
        else:
            d1 = nn.Dense(4 * half, dtype=self.dtype, name="up1")(d2)
            d1 = _pixel_shuffle(d1, 2)  # full res, C/2
        d1 = d1 + s

        # Head. The [0,1] clamp runs BEFORE the depth-to-space while the
        # channel dim is still 3*r*r (48 vector lanes); after the shuffle
        # the minor dim is 3, and the same clamp profiled at ~1.3 ms per
        # 16-tile chunk purely from 3/128 lane occupancy. Clamp commutes
        # with the shuffle (a pure permutation) — identical output.
        packed = self.packed_head and self.scale > 1
        if self.scale == 1:
            if lane:
                cp = _ConvParams(half, self.out_channels, (3, 3),
                                 name="to_image")()
                z = _lane_padded_conv(d1, cp["kernel"], cp["bias"], 0,
                                      self.dtype)
            else:
                z = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                            dtype=self.dtype, name="to_image")(d1)
            if self.clamp:
                z = jnp.clip(z, 0.0, 1.0)
        elif self.packed_x_head and not packed:
            r = self.scale
            if (w * r) % 16 or (wp * r) % 16:
                raise ValueError(
                    f"packed_x_head needs width*scale % 16 == 0, got "
                    f"{w}x{r}")
            if not self.clamp:
                raise ValueError("packed_x_head fuses the [0,1] clamp")
            from waifu2x_tensorrt_tpu.ops.head_pack import pack_head_x16

            z = nn.Conv(self.out_channels * r * r, (3, 3), padding="SAME",
                        dtype=self.dtype, name="to_image")(d1)
            z = pack_head_x16(z, r=r)  # clamp fused in-kernel
            if ph or pw:
                z = z[:, : h * r, : (w * r) // 16, :]
            return z
        else:
            r = self.scale
            two_stage = (self.head_shuffle_2stage and r == 4
                         and not packed)
            if self.head_via_deconv and not packed:
                cout = self.out_channels * r * r
                cp = _ConvParams(half, cout, (3, 3), name="to_image")()
                kk = cp["kernel"]
                if lane:
                    kk = jnp.pad(
                        kk, ((0, 0), (0, 0), (0, lane - half), (0, 0)))
                z = _conv_shuffle_as_deconv(d1, kk, cp["bias"],
                                            r, self.dtype)
                if self.clamp:
                    z = jnp.clip(z, 0.0, 1.0)
            elif two_stage:
                # fold the two-stage channel order into the conv WEIGHTS
                # (a (3,3,48,48) gather per call — negligible next to the
                # conv; checkpoints unaffected, param tree matches nn.Conv)
                inv = np.asarray(
                    _two_stage_shuffle_perm(self.out_channels, r))
                cout = self.out_channels * r * r
                cp = _ConvParams(d1.shape[-1], cout, (3, 3),
                                 name="to_image")()
                z = jax.lax.conv_general_dilated(
                    d1, cp["kernel"][..., inv].astype(self.dtype),
                    window_strides=(1, 1), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                z = z + cp["bias"][inv].astype(self.dtype)
                if self.clamp:
                    z = jnp.clip(z, 0.0, 1.0)
                z = _pixel_shuffle(_pixel_shuffle(z, 2), 2)
            else:
                if lane:
                    cp = _ConvParams(half, self.out_channels * r * r,
                                     (3, 3), name="to_image")()
                    z = _lane_padded_conv(d1, cp["kernel"], cp["bias"], 0,
                                          self.dtype)
                else:
                    z = nn.Conv(self.out_channels * r * r, (3, 3),
                                padding="SAME", dtype=self.dtype,
                                name="to_image")(d1)
                if self.clamp:
                    z = jnp.clip(z, 0.0, 1.0)
                if not packed:
                    z = _pixel_shuffle(z, r)

        # Crop internal padding (packed layout crops in input space).
        if ph or pw:
            crop_scale = 1 if packed else self.scale
            z = z[:, : h * crop_scale, : w * crop_scale, :]
        return z
