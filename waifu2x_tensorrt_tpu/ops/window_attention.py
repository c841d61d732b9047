"""Fused shifted-window attention Pallas kernel.

For swin_unet, attention runs on many independent 64-token windows
(8x8, head_dim 32). The XLA lowering materializes the (nW, heads, 64, 64)
attention tensor in HBM between the QK^T, softmax and PV steps; this kernel
keeps everything in VMEM per block of windows, halving attention HBM
traffic. Windows are blocked WB at a time so DMA transfers are large.

Shift masking is computed *inside* the kernel from two per-window flag bits
(window touches the rolled bottom / right boundary) instead of streaming an
(nW, 64, 64) additive mask from HBM — the Swin cyclic-shift mask is
analytic in the token coordinates:

  row_region(t) = (t // ws) >= ws - shift     (bottom-edge windows)
  col_region(t) = (t %  ws) >= ws - shift     (right-edge windows)
  masked(n, m)  = bottom & (row_region(n) != row_region(m))
                | right  & (col_region(n) != col_region(m))

Flags ride as a tiny (BW, 1) int32 VMEM block per grid step and the mask is
built with pure broadcasting (Mosaic supports neither dynamic VMEM indexing
nor >1 matmul batch dim, so the (WB, nh) batch is folded to one axis and the
per-window loop is vectorized away).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waifu2x_tensorrt_tpu.ops.kernel_math import (
    keep_from_flags as _keep_from_flags,
)
from waifu2x_tensorrt_tpu.ops.kernel_math import (
    shift_crossing as _shift_crossing,
)
from waifu2x_tensorrt_tpu.ops.kernel_math import softmax_lastdim as _softmax


def window_attention_reference(q, k, v, bias, flags, shift: int):
    """Pure-jnp reference. q/k/v: (BW, nh, N, hd); bias: (nh, N, N) fp32;
    flags: (BW,) int32 bitfield (bit0 = bottom-edge, bit1 = right-edge);
    returns (BW, nh, N, hd) in q.dtype."""
    BW, nh, N, hd = q.shape
    ws = int(np.sqrt(N))
    scale = hd ** -0.5
    attn = jnp.einsum(
        "whnd,whmd->whnm", q * scale, k, preferred_element_type=jnp.float32
    )
    attn = attn + bias[None]
    attn = attn + _mask_from_flags(flags, ws, shift)[:, None, :, :]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum(
        "whnm,whmd->whnd", attn.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _mask_from_flags(flags, ws: int, shift: int):
    """(BW, N, N) additive mask from per-window flag bits (jnp)."""
    N = ws * ws
    t = jnp.arange(N)
    row_cross, col_cross = _shift_crossing(t[:, None], t[None, :], ws,
                                           shift)
    bottom = ((flags & 1) > 0)[:, None, None]
    right = ((flags & 2) > 0)[:, None, None]
    keep = _keep_from_flags(bottom, right, row_cross[None],
                            col_cross[None])
    return jnp.where(~keep, -1e9, 0.0).astype(jnp.float32)


def _kernel(q_ref, k_ref, v_ref, bias_ref, flags_ref, o_ref, *, ws, shift,
            wb, nh, fast_softmax):
    # Mosaic's tpu.matmul supports at most ONE batch dim: fold (WB, nh)
    # into a single leading batch axis for both dots.
    N = ws * ws

    hd = q_ref.shape[-1]
    q = q_ref[:].reshape(wb * nh, N, hd)
    k = k_ref[:].reshape(wb * nh, N, hd)
    v = v_ref[:].reshape(wb * nh, N, hd)
    scale = jnp.asarray(hd ** -0.5, q.dtype)

    attn = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (WB*nh, N, N) fp32
    attn = attn.reshape(wb, nh, N, N) + bias_ref[:][None].astype(jnp.float32)

    if shift:
        # analytic shift mask from per-window flags (see module docstring),
        # fully vectorized: no dynamic indexing (unsupported in Mosaic).
        tok = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        tok_m = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        row_cross, col_cross = _shift_crossing(tok, tok_m, ws, shift)
        flags = flags_ref[:]  # (wb, 1) int32 block
        bottom = ((flags & 1) > 0)[:, :, None, None]  # (wb, 1, 1, 1)
        right = ((flags & 2) > 0)[:, :, None, None]
        keep = _keep_from_flags(bottom, right, row_cross[None, None],
                                col_cross[None, None])  # (wb, 1, N, N)
    else:
        keep = None

    # keep is applied multiplicatively after exp inside softmax_lastdim:
    # masked entries get weight exactly 0 even on the no-max fast path.
    attn = _softmax(
        attn, exact=q.dtype != jnp.bfloat16 or not fast_softmax, keep=keep)
    out = jax.lax.dot_general(
        attn.reshape(wb * nh, N, N).astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.reshape(wb, nh, N, hd).astype(o_ref.dtype)


def _kernel_qkv(qkv_ref, bias_ref, flags_ref, o_ref, *, ws, shift, wb, nh,
                hd, fast_softmax):
    """Packed-layout kernel: qkv (wb, N, 3C) in, attention out (wb, N, C).

    Consumes the Dense(3C) output directly — no (3, nh, hd) reshapes or
    transposes ever materialize in HBM (those layout ops dominate the XLA
    dense path's time; the minor dim stays a lane-rich 3C/C). Heads are
    unrolled as static C-slices inside VMEM.
    """
    N = ws * ws
    C = nh * hd
    qkv = qkv_ref[:]  # (wb, N, 3C)
    scale = jnp.asarray(hd ** -0.5, qkv.dtype)

    if shift:
        tok = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        tok_m = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        row_cross, col_cross = _shift_crossing(tok, tok_m, ws, shift)
        flags = flags_ref[:]  # (wb, 1)
        bottom = ((flags & 1) > 0)[:, :, None]
        right = ((flags & 2) > 0)[:, :, None]
        keep = _keep_from_flags(bottom, right, row_cross[None],
                                col_cross[None])
        # (wb, N, N); zeroed after exp in softmax
    else:
        keep = None

    outs = []
    for h in range(nh):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, C + h * hd:C + (h + 1) * hd]
        v = qkv[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        attn = jax.lax.dot_general(
            q * scale, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (wb, N, N)
        attn = attn + bias_ref[h][None].astype(jnp.float32)
        attn = _softmax(
            attn, exact=qkv.dtype != jnp.bfloat16 or not fast_softmax,
            keep=keep)
        outs.append(jax.lax.dot_general(
            attn.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
    o_ref[:] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("shift", "ws", "num_heads",
                                             "block_windows", "interpret",
                                             "fast_softmax"))
def fused_window_attention_qkv(qkv, bias, flags, *, num_heads: int,
                               shift: int = 0, ws: int = 8,
                               block_windows: int = 32,
                               interpret: bool = False,
                               fast_softmax: bool = True):
    """Pallas window attention over the packed qkv layout.

    Args:
      qkv: (BW, N, 3C) — the qkv projection output, heads interleaved as
        [q_0..q_{nh-1} | k_0.. | v_0..] along the last dim.
      bias: (nh, N, N) float32 relative-position bias.
      flags: (BW,) int32 shift-boundary bitfield.
    Returns:
      (BW, N, C) attention output in qkv.dtype.
    """
    BW, N, threeC = qkv.shape
    C = threeC // 3
    hd = C // num_heads
    wb = min(block_windows, BW)
    pad = (-BW) % wb
    if pad:
        qkv = jnp.pad(qkv, [(0, pad), (0, 0), (0, 0)])
        flags = jnp.pad(flags, (0, pad))
    n_blocks = (BW + pad) // wb

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((wb, N, threeC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, N, N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_qkv, ws=ws, shift=shift, wb=wb,
                          nh=num_heads, hd=hd, fast_softmax=fast_softmax),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BW + pad, N, C), qkv.dtype),
        interpret=interpret,
    )(qkv, bias, flags.reshape(-1, 1).astype(jnp.int32))
    return out[:BW] if pad else out


@functools.partial(jax.jit, static_argnames=("shift", "ws", "block_windows",
                                             "interpret", "fast_softmax"))
def fused_window_attention(q, k, v, bias, flags, *, shift: int = 0,
                           ws: int = 8, block_windows: int = 32,
                           interpret: bool = False,
                           fast_softmax: bool = True):
    """Pallas-fused window attention.

    Args:
      q, k, v: (BW, nh, N, hd) — BW total windows (padded to a multiple of
        ``block_windows`` by the caller or here), N = ws*ws tokens.
      bias: (nh, N, N) float32 relative-position bias.
      flags: (BW,) int32 shift-boundary bitfield (ignored when shift == 0).
      shift: cyclic shift amount (0 or ws//2).
    Returns:
      (BW, nh, N, hd) in q.dtype.
    """
    BW, nh, N, hd = q.shape
    wb = min(block_windows, BW)
    pad = (-BW) % wb
    if pad:
        padding = [(0, pad), (0, 0), (0, 0), (0, 0)]
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
        flags = jnp.pad(flags, (0, pad))
    n_blocks = (BW + pad) // wb

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((wb, nh, N, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, nh, N, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, nh, N, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, N, N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wb, nh, N, hd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, ws=ws, shift=shift, wb=wb, nh=nh,
                          fast_softmax=fast_softmax),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias, flags.reshape(-1, 1).astype(jnp.int32))
    return out[:BW] if pad else out
