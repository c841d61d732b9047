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
57 MB u8 write vs ~700 MB for the scan.

Exactness: contributions are accumulated in fp32 in ascending tile-index
order (corner, left, top, own — the renderer's tile order is
column-major, tiling.calculate_tiles), which is element-wise the exact
addition sequence of the XLA scan, so the u8 output is BIT-IDENTICAL to
the scan path.

Geometry contract (epilogue_applicable): the tile grid is uniform —
calculate_tiles places origins at exact stride multiples and only clamps
WIDTHS (the canvas carries the overhang, cropped at the end) — so the
cell decomposition is static. Requirements beyond that: >=2 rows and
cols, overlap <= stride, overlap dividing stride (so the band views are
whole BlockSpec blocks), lane-folded width divisible by the 384-lane
strip, no TTA / packed heads. Anything else falls back to the scan.

Reference for the operation being fused: applyWeights + accumulation +
the x255 u8 cast (img2img_render.cpp:107-121, 324-330, 342).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _strip3(ow3: int, sx3: int) -> int:
    """Lane-folded strip width: the largest common divisor of the tile
    width and the column stride, capped at 384 lanes. Dividing BOTH lets
    the kernel write canvas-row-band layout directly: cell c's strips
    land at canvas strip c*(sx3/STRIP3)+s, and the one overlap strip per
    boundary is simply overwritten by the owning cell later in the
    sequential grid — no u8 transpose/stitch pass afterwards (the v1
    per-cell layout lost 4.3% to exactly that, probes/r5_finalize_ab).
    """
    import math

    g = math.gcd(ow3, sx3)
    # sub-96-lane strips are lane-inefficient but only ever serve small
    # tile sizes (t64: gcd 24) — geometries the tile advisor steers away
    # from anyway; production tiles land 192+ (t256 4x: gcd(3072,2880))
    for cand in (384, 192, 96, 48, 24):
        if g % cand == 0:
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
    # column-major order check + uniform strides
    expect = np.stack(np.meshgrid(ys, xs, indexing="xy"), -1)  # (C?,R?,2)
    got = plan.output_origins.reshape(C, R, 2)
    if not (np.array_equal(got[:, :, 0], np.tile(ys, (C, 1)))
            and np.array_equal(got[:, :, 1], xs[:, None].repeat(R, 1))):
        return None
    del expect
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
    # band views must be whole blocks; strips must divide the folded width
    if sy % ovy or sx % ovx:
        return False
    # strip width = gcd(ow3, sx3) = gcd(ow3, ovx3) divides ovx3; with the
    # ovx3 <= strip3 cap the two are EQUAL whenever applicable — the
    # kernel relies on strips being exactly the overlap width
    strip3 = _strip3(ow * 3, sx * 3)
    if strip3 == 0 or (ovx * 3) != strip3:
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
            *, ovy: int, ovx3: int):
    f32 = jnp.float32
    wyo = wyo_ref[0, :, 0:1]          # (oh, 1)
    wyt = wyt_ref[0, :, 0:1]          # (ovy, 1)  zeros on the first row
    wxo = wxo_ref[0, 0:1, :]          # (1, strip3)
    # left/corner bands exist only in the FIRST strip of each cell (the
    # ovx-wide boundary zone); zero their weights elsewhere — adding the
    # zeroed arrays keeps the fp32 sequence bit-identical to the scan
    # (x + 0.0 == x for the non-negative blend range)
    first_strip = (pl.program_id(2) == 0).astype(f32)
    wxl = wxl_ref[0, 0:1, :] * first_strip   # (1, ovx3); zeros on col 0
    # applicability pins strip3 == ovx3 (both equal gcd(ow3, sx3)), so
    # the left/corner bands span the whole first strip: no zone slicing.
    own = own_ref[0].astype(f32) * wyo * wxo            # (oh, strip3)
    top = top_ref[0].astype(f32) * wyt * wxo            # (ovy, strip3)
    left = left_ref[0].astype(f32) * wyo * wxl          # (oh, strip3)
    corner = corner_ref[0].astype(f32) * wyt * wxl      # (ovy, strip3)
    # fp32 adds in ascending tile-index order (column-major grid:
    # corner < left < top < own) — element-wise identical to the scan
    top_rows = ((corner + left[:ovy]) + top) + own[:ovy]
    bot_rows = left[ovy:] + own[ovy:]
    acc = jnp.concatenate([top_rows, bot_rows], axis=0)
    out_ref[0] = jnp.clip(jnp.round(acc * 255.0), 0.0, 255.0
                          ).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def _cells_call(y, wyo, wyt, wxo, wxl, *, geom, interpret):
    (R, C, sy, sx, ovy, ovx, oh, ow3) = geom
    ovx3 = ovx * 3
    strip3 = _strip3(ow3, sx * 3)
    NS = ow3 // strip3
    NSX = (sx * 3) // strip3  # canvas strips per column stride
    canvas_w3 = (C - 1) * sx * 3 + ow3

    def t_of(c, r):
        return c * R + r

    # Output: canvas-row-band layout (R, oh, canvas_w3). Cell (r, c)'s
    # strip s lands at canvas strip c*NSX + s; strips s >= NSX overlap
    # the NEXT cell's span and are overwritten by it later in the
    # sequential grid (c is the outermost grid dim), so the final bytes
    # are the owning cell's — the horizontal stitch costs nothing.
    grid = (C, R, NS)
    in_specs = [
        # own tile strip
        pl.BlockSpec((1, oh, strip3),
                     lambda c, r, s: (t_of(c, r), 0, s)),
        # the tile above's bottom band: rows [sy, sy+ovy) = block sy//ovy
        pl.BlockSpec((1, ovy, strip3),
                     lambda c, r, s: (t_of(c, jnp.maximum(r - 1, 0)),
                                      sy // ovy, s)),
        # the tile to the left's right band: cols [sx3, sx3+ovx3)
        pl.BlockSpec((1, oh, ovx3),
                     lambda c, r, s: (t_of(jnp.maximum(c - 1, 0), r), 0,
                                      (sx * 3) // ovx3)),
        # the diagonal tile's corner band
        pl.BlockSpec((1, ovy, ovx3),
                     lambda c, r, s: (t_of(jnp.maximum(c - 1, 0),
                                           jnp.maximum(r - 1, 0)),
                                      sy // ovy, (sx * 3) // ovx3)),
        # weights (lane/sublane-broadcast source columns)
        pl.BlockSpec((1, oh, 128), lambda c, r, s: (r, 0, 0)),
        pl.BlockSpec((1, ovy, 128), lambda c, r, s: (r, 0, 0)),
        pl.BlockSpec((1, 8, strip3), lambda c, r, s: (c * NS + s, 0, 0)),
        pl.BlockSpec((1, 8, ovx3), lambda c, r, s: (c, 0, 0)),
    ]
    out_specs = pl.BlockSpec((1, oh, strip3),
                             lambda c, r, s: (r, 0, c * NSX + s))
    return pl.pallas_call(
        functools.partial(_kernel, ovy=ovy, ovx3=ovx3),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((R, oh, canvas_w3), jnp.uint8),
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
    out_h, out_w = plan.output_size
    n_steps = plan.tile_count

    # Per-row/col weight tables in kernel layout (broadcast source blocks;
    # 8 lanes/sublanes wide to satisfy the f32 tile minimum).
    rw = plan.row_weights.reshape(C, R, oh)[0]          # (R, oh)
    cw = plan.col_weights.reshape(C, R, ow)[:, 0]       # (C, ow)
    wyo = np.broadcast_to(rw[:, :, None], (R, oh, 128)).astype(np.float32)
    wyt = np.zeros((R, ovy, 128), np.float32)
    wyt[1:] = rw[:-1, sy:, None]                        # zeros on row 0
    cw3 = np.repeat(cw, 3, axis=1)                      # (C, ow3) lane-folded
    strip3 = _strip3(ow3, sx * 3)
    NS = ow3 // strip3
    wxo = np.broadcast_to(
        cw3.reshape(C * NS, 1, strip3), (C * NS, 8, strip3)
    ).astype(np.float32)
    wxl = np.zeros((C, 8, ovx3), np.float32)
    wxl[1:] = cw3[:-1, None, sx * 3: sx * 3 + ovx3]     # zeros on col 0
    wyo, wyt, wxo, wxl = (jnp.asarray(a) for a in (wyo, wyt, wxo, wxl))
    geom = (R, C, sy, sx, ovy, ovx, oh, ow3)

    def finalize(*outs):
        y = jnp.concatenate(outs, 0)[:n_steps] if len(outs) > 1 else \
            outs[0][:n_steps]
        y = y.reshape(n_steps, oh, ow3)
        bands = _cells_call(y, wyo, wyt, wxo, wxl, geom=geom,
                            interpret=interpret)       # (R, oh, canvas_w3)
        # vertical stitch: row band r owns canvas rows [r*sy, r*sy+sy)
        # (the last band its full tile height) — contiguous u8 slices,
        # one layout-preserving concat, no transpose
        canvas = jnp.concatenate(
            [bands[:-1, :sy].reshape((R - 1) * sy, bands.shape[2]),
             bands[-1]], axis=0)
        out = canvas[:out_h, : out_w * 3]
        return out.reshape(out_h, out_w, 3)

    return finalize
