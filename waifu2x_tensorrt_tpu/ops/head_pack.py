"""Fused head: clamp + pixel-shuffle into the packed-x16 layout.

The head depth-to-space ((B, H, W, 3r^2) -> (B, rH, rW, 3)) is the single
biggest XLA glue cost left in the swin model program (~3.7 ms of a 21.9 ms
16-tile chunk on v5e: a 6-D transpose with minor dim 3 plus relayout
copies — trace 2026-08-17). Key observation: the PACKED-X layout

    (B, rH, rW/16, 48)   with lane index = 3*(x % 16) + c

is byte-identical to (B, rH, rW, 3) in row-major order — so if the model
emits it directly, the renderer can blend/scatter/u8-cast in 48-lane form
and the final "unpack" is a free reshape. (The round-2 packed head lost
because its (c, ry, rx)-major layout needed a real whole-canvas transpose;
this layout needs none.)

This kernel produces it with one-hot MXU dots instead of transposes:
for each output sub-row ry, the 48 output lanes of a 16-pixel group are a
fixed permutation of the (16/r) input columns x (3r^2) channels covering
it — i.e. a (in_lanes, 48) one-hot matmul. The input arrives as the FREE
reshape (B, H, W/(16/r), (16/r)*3r^2) of the head conv's output, the [0,1]
clamp rides in front of the dots (on full-lane data — cheaper than XLA's
post-conv 48-lane clip pass), and the kernel writes (B, H, r, W*r/16, 48),
whose row-major bytes are exactly (B, rH, rW/16, 48).

Requires (r * W) % 16 == 0 (tile sizes are multiples of 32, so always).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK_X = 16


@functools.lru_cache(maxsize=None)
def _select_mats(r: int, out_channels: int = 3) -> np.ndarray:
    """(r, in_lanes, 48) one-hot selection matrices, one per output sub-row
    ry: S[ry, q*(3r^2) + c*r^2 + ry*r + rxq, 3*(q*r + rxq) + c] = 1."""
    g = PACK_X // r                      # input cols per 16-px output group
    in_lanes = g * out_channels * r * r
    s = np.zeros((r, in_lanes, out_channels * PACK_X), np.float32)
    for ry in range(r):
        for q in range(g):
            for c in range(out_channels):
                for rxq in range(r):
                    src = q * (out_channels * r * r) + c * r * r + ry * r + rxq
                    dst = out_channels * (q * r + rxq) + c
                    s[ry, src, dst] = 1.0
    return s


def pack_head_reference(z, r: int):
    """jnp reference: clamp + shuffle + pack-x16. z: (B, H, W, 3r^2);
    returns (B, rH, rW//16, 48)."""
    from waifu2x_tensorrt_tpu.models.swin_unet import _pixel_shuffle

    y = _pixel_shuffle(jnp.clip(z, 0.0, 1.0), r)  # (B, rH, rW, 3)
    b, oh, ow, c = y.shape
    return y.reshape(b, oh, ow // PACK_X, PACK_X * c)


def _kernel(z_ref, s_ref, o_ref, *, r):
    z = jnp.clip(z_ref[0].astype(jnp.float32), 0.0, 1.0)
    for ry in range(r):
        o_ref[0, :, ry, :, :] = jax.lax.dot_general(
            z, s_ref[ry],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("r", "rows_block", "interpret"))
def pack_head_x16(z, *, r: int, rows_block: int = 32,
                  interpret: bool = False):
    """Clamp + depth-to-space(r) + pack-x16 in one kernel.

    Args:
      z: (B, H, W, 3*r*r) head conv output (pre-clamp).
      r: upscale factor (2 or 4).
    Returns:
      (B, r*H, (r*W)//16, 48) in z.dtype — row-major bytes identical to the
      (B, r*H, r*W, 3) pixel tensor.
    """
    if jax.default_backend() in ("cpu", "gpu"):
        interpret = True  # CPU tests run the kernel interpreted
    b, h, w, crr = z.shape
    g = PACK_X // r
    assert crr == 3 * r * r and w % g == 0, (z.shape, r)
    in_lanes = g * crr
    zv = z.reshape(b, h, w // g, in_lanes)  # free: merges contiguous dims
    s = jnp.asarray(_select_mats(r))

    # largest row-block <= rows_block that divides h (round-4 review: the
    # previous `assert h % rb == 0` relied on the CALLER padding heights
    # to multiples of 32 — an invariant SwinUNet holds but this kernel
    # does not own; h=48 would have crashed at trace time)
    rb = min(rows_block, h)
    while h % rb:
        rb -= 1
    grid_spec = pl.GridSpec(
        grid=(b, h // rb),
        in_specs=[
            pl.BlockSpec((1, rb, w // g, in_lanes),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, in_lanes, 3 * PACK_X), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, r, w // g, 3 * PACK_X),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, r=r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, r, w // g, 3 * PACK_X),
                                       z.dtype),
        interpret=interpret,
    )(zv, s)
    # free reshape: (B, H, r, rW/16, 48) rows are already in output order
    return out.reshape(b, h * r, (w * r) // PACK_X, 3 * PACK_X)
