"""Pallas gather epilogue: blend + scatter + u8 cast in ONE pass.

VERDICT r4 item 4: the XLA finalize (renderer.make_chunked_fns) costs
~4.0 ms/frame at the headline geometry — a sequential scan that
read-modify-writes an fp32 canvas per tile, then a separate whole-canvas
u8 cast pass. This kernel inverts the dataflow from scatter to GATHER:
the output canvas is decomposed into per-tile cells (the half-open
origin-to-origin rectangles), each covered by at most 4 tiles (own, the
tile above, the tile to the left, and the diagonal), and every cell is
computed in one read of those contributions and ONE u8 write — no fp32
canvas exists at all. Approximate traffic at 720p->4x: ~100 MB read +
57 MB u8 write + the u8 stitch vs ~700 MB for the scan.

Exactness: contributions are accumulated in fp32 in ascending tile-index
order (corner, left, top, own — the renderer's tile order is
column-major, tiling.calculate_tiles), which is element-wise the exact
addition sequence of the XLA scan, so the u8 output is BIT-IDENTICAL to
the scan path.

Layout notes (v4): Mosaic requires block lane dims divisible by 128, and
the column stride sx3 is generally NOT (720p->4x: 2880), so the kernel
cannot place cell strips at canvas positions directly (the v2
canvas-band design). It instead writes cells into a lane-major
(R, oh, C*ow3) layout — cell lane offsets c*ow3 ARE block-divisible —
so the column stitch is pure lane-slice concats (each cell keeps its
first sx3 lanes; the ovx3 tail belongs to the next cell) and the row
stitch a contiguous concat: no u8 transpose anywhere (the v3 per-cell
layout paid one). The left/corner neighbor bands are loaded as their
tile's LAST strip block (bands are suffixes of the tile row:
sx3 + ovx3 == ow3) and shifted to the cell's leading lanes with a
static slice + zero-pad inside the kernel.

Geometry contract (epilogue_applicable): the tile grid is uniform —
calculate_tiles places origins at exact stride multiples and only clamps
WIDTHS (the canvas carries the overhang, cropped at the end) — so the
cell decomposition is static. Requirements beyond that: >=2 rows and
cols, overlap <= stride, row overlap dividing the row stride and the
sublane tile (8), a 128-multiple strip dividing the folded tile width
with the column band no wider than one strip, no TTA / packed heads.
Anything else falls back to the scan.

Reference for the operation being fused: applyWeights + accumulation +
the x255 u8 cast (img2img_render.cpp:107-121, 324-330, 342).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _strip3(ow3: int) -> int:
    """Lane-folded strip width: the largest 128-multiple divisor of the
    folded tile width (Mosaic requires block lane dims divisible by 128;
    512 lanes keeps VMEM per block ~1 MB at oh=1024)."""
    for cand in (512, 384, 256, 128):
        if ow3 % cand == 0:
            return cand
    return 0


def _grid_geometry(plan):
    """(R, C, sy, sx, ovy, ovx) from the plan; None if non-uniform.

    calculate_tiles is column-major: tile t = col * R + row.
    """
    T = plan.tile_count
    oh, ow = plan.output_tile
    ys = np.unique(plan.output_origins[:, 0])
    xs = np.unique(plan.output_origins[:, 1])
    R, C = len(ys), len(xs)
    if R * C != T:
        return None
    got = plan.output_origins.reshape(C, R, 2)
    if not (np.array_equal(got[:, :, 0], np.tile(ys, (C, 1)))
            and np.array_equal(got[:, :, 1], xs[:, None].repeat(R, 1))):
        return None
    if R < 2 or C < 2:
        return None
    sy = int(ys[1] - ys[0])
    sx = int(xs[1] - xs[0])
    if not (np.all(np.diff(ys) == sy) and np.all(np.diff(xs) == sx)):
        return None
    ovy, ovx = oh - sy, ow - sx
    return R, C, sy, sx, ovy, ovx


def epilogue_applicable(plan, tta: bool, packing: int, pack_x: int) -> bool:
    if tta or packing > 1 or pack_x > 1:
        return False
    g = _grid_geometry(plan)
    if g is None:
        return False
    R, C, sy, sx, ovy, ovx = g
    oh, ow = plan.output_tile
    if ovy <= 0 or ovx <= 0 or ovy > sy or ovx > sx:
        return False
    # the top band must be whole row-blocks (block row index sy//ovy) and
    # a legal Mosaic sublane span
    if sy % ovy or (ovy % 8 and ovy != oh):
        return False
    strip3 = _strip3(ow * 3)
    if strip3 == 0 or (ovx * 3) > strip3:
        return False
    # row/col ramps must depend only on the row/col index (they do by
    # construction — same neighbour/clamp conditions along a row/col)
    rw = plan.row_weights.reshape(C, R, oh)
    cw = plan.col_weights.reshape(C, R, ow)
    if not (np.allclose(rw, rw[:1]) and np.allclose(cw, cw[:, :1])):
        return False
    return True


def _kernel(own_ref, top_ref, left_ref, corner_ref,
            wyo_ref, wyt_ref, wxo_ref, wxl_ref, out_ref,
            *, ovy: int, ovx3: int, off3: int):
    f32 = jnp.float32
    wyo = wyo_ref[0, :, 0:1]          # (oh, 1)
    wyt = wyt_ref[0, :, 0:1]          # (ovy, 1)  zeros on the first row
    wxo = wxo_ref[0, 0:1, :]          # (1, strip3)
    # left/corner bands exist only in the FIRST strip of each cell (the
    # ovx-wide boundary zone); zero their weights elsewhere — adding the
    # zeroed arrays keeps the fp32 sequence bit-identical to the scan
    # (x + 0.0 == x for the non-negative blend range)
    first_strip = (pl.program_id(2) == 0).astype(f32)
    wxl = wxl_ref[0, 0:1, :] * first_strip   # (1, strip3); 0 on col 0

    def shift_band(x):
        # band values live in the block's suffix lanes [off3:]; the cell
        # needs them at its leading lanes [0:ovx3) — static slice + pad
        band = x[:, off3:]
        if off3 == 0:
            return band
        return jnp.concatenate(
            [band, jnp.zeros((x.shape[0], off3), x.dtype)], axis=1)

    own = own_ref[0].astype(f32) * wyo * wxo                 # (oh, strip3)
    top = top_ref[0].astype(f32) * wyt * wxo                 # (ovy, strip3)
    left = shift_band(left_ref[0].astype(f32) * wyo * wxl)   # (oh, strip3)
    corner = shift_band(
        corner_ref[0].astype(f32) * wyt * wxl)               # (ovy, strip3)
    # fp32 adds in ascending tile-index order (column-major grid:
    # corner < left < top < own) — element-wise identical to the scan
    top_rows = ((corner + left[:ovy]) + top) + own[:ovy]
    bot_rows = left[ovy:] + own[ovy:]
    acc = jnp.concatenate([top_rows, bot_rows], axis=0)
    q = jnp.clip(jnp.round(acc * 255.0), 0.0, 255.0)
    # Mosaic has no direct f32->u8 cast; the clipped value is an exact
    # integer in [0, 255], so the i32 hop is value-preserving
    out_ref[0] = q.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def _cells_call(y, wyo, wyt, wxo, wxl, *, geom, interpret):
    (R, C, sy, sx, ovy, ovx, oh, ow3) = geom
    ovx3 = ovx * 3
    strip3 = _strip3(ow3)
    NS = ow3 // strip3
    off3 = strip3 - ovx3
    T = R * C

    def t_of(c, r):
        return c * R + r

    grid = (C, R, NS)
    in_specs = [
        # own tile strip
        pl.BlockSpec((1, oh, strip3),
                     lambda c, r, s: (t_of(c, r), 0, s)),
        # the tile above's bottom band: rows [sy, sy+ovy) = block sy//ovy
        pl.BlockSpec((1, ovy, strip3),
                     lambda c, r, s: (t_of(c, jnp.maximum(r - 1, 0)),
                                      sy // ovy, s)),
        # the left tile's right band rides in its LAST strip block
        # (sx3 + ovx3 == ow3: the band is the row's suffix)
        pl.BlockSpec((1, oh, strip3),
                     lambda c, r, s: (t_of(jnp.maximum(c - 1, 0), r), 0,
                                      NS - 1)),
        # the diagonal tile's corner band
        pl.BlockSpec((1, ovy, strip3),
                     lambda c, r, s: (t_of(jnp.maximum(c - 1, 0),
                                           jnp.maximum(r - 1, 0)),
                                      sy // ovy, NS - 1)),
        # weights (lane/sublane-broadcast source columns)
        pl.BlockSpec((1, oh, 128), lambda c, r, s: (r, 0, 0)),
        pl.BlockSpec((1, ovy, 128), lambda c, r, s: (r, 0, 0)),
        pl.BlockSpec((1, 8, strip3), lambda c, r, s: (c * NS + s, 0, 0)),
        pl.BlockSpec((1, 8, strip3), lambda c, r, s: (c, 0, 0)),
    ]
    # Output in (row-band, lane-major-C) layout: cell (r, c)'s strips
    # land at lanes [c*ow3, (c+1)*ow3) of band r — the block lane offset
    # c*NS+s IS block-divisible (unlike canvas positions c*sx3), and the
    # column stitch afterwards becomes pure lane-slice concats with NO
    # u8 transpose (the v3 stitch's dominant cost).
    out_specs = pl.BlockSpec((1, oh, strip3),
                             lambda c, r, s: (r, 0, c * NS + s))
    return pl.pallas_call(
        functools.partial(_kernel, ovy=ovy, ovx3=ovx3, off3=off3),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((R, oh, C * ow3), jnp.uint8),
        interpret=interpret,
    )(y, y, y, y, wyo, wyt, wxo, wxl)


def make_finalize_epilogue(plan, interpret: bool = False):
    """Build ``finalize(*chunk_outputs) -> (out_h, out_w, 3) u8`` for an
    applicable plan (caller must have checked epilogue_applicable)."""
    g = _grid_geometry(plan)
    assert g is not None
    R, C, sy, sx, ovy, ovx = g
    oh, ow = plan.output_tile
    ow3, ovx3 = ow * 3, ovx * 3
    sx3 = sx * 3
    out_h, out_w = plan.output_size
    n_steps = plan.tile_count

    # Per-row/col weight tables in kernel layout (broadcast source blocks).
    rw = plan.row_weights.reshape(C, R, oh)[0]          # (R, oh)
    cw = plan.col_weights.reshape(C, R, ow)[:, 0]       # (C, ow)
    wyo = np.broadcast_to(rw[:, :, None], (R, oh, 128)).astype(np.float32)
    wyt = np.zeros((R, ovy, 128), np.float32)
    wyt[1:] = rw[:-1, sy:, None]                        # zeros on row 0
    cw3 = np.repeat(cw, 3, axis=1)                      # (C, ow3) lane-folded
    strip3 = _strip3(ow3)
    NS = ow3 // strip3
    off3 = strip3 - ovx3
    wxo = np.broadcast_to(
        cw3.reshape(C * NS, 1, strip3), (C * NS, 8, strip3)
    ).astype(np.float32)
    # left-band weights in the BLOCK's lane coordinates (the band sits in
    # the suffix [off3:strip3) of the left tile's last strip block)
    wxl = np.zeros((C, 8, strip3), np.float32)
    wxl[1:, :, off3:] = cw3[:-1, None, sx3: sx3 + ovx3]  # zeros on col 0
    wyo, wyt, wxo, wxl = (jnp.asarray(a) for a in (wyo, wyt, wxo, wxl))
    geom = (R, C, sy, sx, ovy, ovx, oh, ow3)

    def finalize(*outs):
        y = jnp.concatenate(outs, 0)[:n_steps] if len(outs) > 1 else \
            outs[0][:n_steps]
        y = y.reshape(n_steps, oh, ow3)
        bands = _cells_call(y, wyo, wyt, wxo, wxl, geom=geom,
                            interpret=interpret)       # (R, oh, C*ow3) u8
        # stitch: row band r owns canvas rows [r*sy, r*sy+sy) (the last
        # its full tile height) — contiguous row concat; columns drop
        # each cell's ovx3 tail (owned by the next cell) with pure
        # lane-slice concats, no transpose
        rows = jnp.concatenate(
            [bands[:-1, :sy].reshape((R - 1) * sy, C * ow3),
             bands[-1]], axis=0)                       # (canvas_h, C*ow3)
        canvas = jnp.concatenate(
            [rows[:, c * ow3: c * ow3 + sx3] for c in range(C - 1)]
            + [rows[:, (C - 1) * ow3:]], axis=1)
        out = canvas[:out_h, : out_w * 3]
        return out.reshape(out_h, out_w, 3)

    return finalize
