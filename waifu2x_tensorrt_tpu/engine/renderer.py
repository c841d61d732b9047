"""The jitted render programs and the tile-streaming runtime.

The reference's host-orchestrated hot loop (Img2Img::render,
src/tensorrt/img2img_render.cpp:224-352, plus infer/blobFromImages,
img2img_infer.cpp:5-93) maps to:

    uint8 frame ──> normalize [0,1] ──> edge-pad ──> gather tile batch
      ──> (x8 dihedral TTA) ──> model at batch_size chunks
      ──> inverse-TTA mean ──> separable blend-ramp multiply
      ──> scatter-add onto fp32 canvas ──> crop ──> saturating uint8

in three forms, fastest first:
  - ``TileStream`` (video production path): per-geometry prepare/finalize
    programs around ONE shared full-batch model program, with leftover
    tiles carried across frame boundaries so every dispatch is full
    batch;
  - ``ChunkedPipeline`` (single frames): same programs, chunked
    per-frame with one exact-size remainder dispatch;
  - ``make_render_fn``/``RendererCache`` (``fuse_frame=True``): the whole
    frame as one monolithic XLA program per geometry.

All device work is traced: no NCHW blob packing (NHWC end-to-end), no
per-tile host round-trips, no stream-sync hazards (the reference never
syncs its final download — SURVEY.md §5 bug 1; JAX arrays synchronize on
host access by design).

Divergences (documented):
- TTA averaging uses the mathematically intended mean over all 8 variants;
  the reference averages into a scratch buffer but then blends an
  unaveraged temporary (img2img_render.cpp:313-315) — not replicated.
- Batch padding tiles are zeros in the compute dtype; the reference pads
  with type-mismatched mats (img2img_render.cpp:281, SURVEY.md §5 bug 2).

Multi-chip: pass ``sharding`` (a NamedSharding over the tile axis) and each
model chunk is sharded over the data-parallel mesh axis — tiles are
independent, so the only cross-device traffic is the gather of output tiles
into the (replicated) canvas accumulator.
"""

from __future__ import annotations

from typing import Callable, Optional

import os

import jax
import jax.numpy as jnp
import numpy as np

from waifu2x_tensorrt_tpu.engine.config import RenderConfig
from waifu2x_tensorrt_tpu.models.registry import ModelSpec
from waifu2x_tensorrt_tpu.utils.xla import tpu_compiler_options
from waifu2x_tensorrt_tpu.tiling import (
    DIHEDRAL_SIZE,
    DIHEDRAL_SHAPE_PRESERVING,
    DIHEDRAL_TRANSPOSING,
    dihedral_apply,
    dihedral_inverse,
    plan_tiles,
)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def resolve_tile_plan(spec: ModelSpec, config: RenderConfig,
                      frame_hw: tuple[int, int]):
    """Tile plan for a frame; ``config.height == 0`` selects WHOLE-FRAME
    mode: the frame renders as a single (rectangular) tile — no overlap
    context, no blend, no scatter. Tiling exists in the reference because
    GPU VRAM and fixed TensorRT shapes force it (img2img_render.cpp:7-66);
    on TPU a 720p frame fits comfortably, and skipping the ~25% overlap
    FLOPs is pure win. Large frames should still tile (HBM ceiling) —
    whole-frame is an explicit opt-in (`--tileSize 0`)."""
    tile = config.height
    if tile == 0:
        d = spec.tile_divisor
        # Offset models (cunet valid convs) shrink the output by
        # 2*offset; size the whole-frame tile to include that context so
        # ONE tile covers the full output. Without this a 512px frame at
        # UpCUNet's offset 36 gets a 512-input tile whose 952px output
        # undercovers the 1024px canvas -> a 2x2 grid at ~4x redundancy.
        ctx = -(-2 * spec.offset // spec.scale)  # input-space, both sides
        tile_hw = (_ceil_to(frame_hw[0] + ctx, d),
                   _ceil_to(frame_hw[1] + ctx, d))
    else:
        assert config.width == tile, "square tiles only (CLI parity)"
        tile_hw = (tile, tile)
    out_tile_hw = (spec.output_tile(tile_hw[0]),
                   spec.output_tile(tile_hw[1]))
    return plan_tiles(frame_hw, tile_hw, out_tile_hw, spec.scale,
                      config.overlap)


def make_render_fn(
    module,
    spec: ModelSpec,
    config: RenderConfig,
    frame_hw: tuple[int, int],
    sharding: Optional[jax.sharding.NamedSharding] = None,
) -> Callable:
    """Build the (un-jitted) render function for one frame geometry.

    Returns ``fn(params, frame_u8) -> out_u8`` where ``frame_u8`` is
    (H, W, 3) uint8 RGB and the result is (H*scale, W*scale, 3) uint8 RGB.
    """
    plan = resolve_tile_plan(spec, config, frame_hw)

    compute_dtype = config.precision.dtype
    batch = config.batch_size
    steps_per_tile = DIHEDRAL_SIZE if config.tta else 1
    n_steps = plan.tile_count * steps_per_tile

    # If sharded, each chunk spans the dp axis so every device works.
    n_dp = 1
    if sharding is not None:
        n_dp = int(np.prod([
            sharding.mesh.shape[a] for a in sharding.spec if a is not None
        ]))
    chunk = batch * n_dp
    # TTA over RECTANGULAR tiles (whole-frame --tileSize 0 on a non-square
    # frame): the 8 dihedral variants split into a shape-preserving group
    # batched at (th, tw) and a rot90-family group batched at (tw, th);
    # each group chunks independently (two model-program orientations).
    rect_tta = config.tta and plan.input_tile[0] != plan.input_tile[1]
    if rect_tta:
        half = DIHEDRAL_SIZE // 2
        g_steps = plan.tile_count * half
        g_full = g_steps // chunk
        g_rem = g_steps - g_full * chunk
        g_rem_padded = -(-g_rem // n_dp) * n_dp if g_rem else 0
        n_chunks = 2 * (g_full + (1 if g_rem else 0))
    else:
        # Full chunks via lax.map plus ONE exact-size remainder chunk: the
        # reference pads the last partial batch with zero tiles and runs the
        # model on them (img2img_render.cpp:281) — here the remainder runs at
        # its true size instead, so no FLOPs are wasted (e.g. 18 tiles at
        # batch 8 = 2 full chunks + a 2-tile chunk, not 24 tiles).
        n_full = n_steps // chunk
        rem = n_steps - n_full * chunk
        # remainder still padded up to the dp-shard multiple when sharded
        rem_padded = -(-rem // n_dp) * n_dp if rem else 0
        n_chunks = n_full + (1 if rem else 0)

    in_origins = jnp.asarray(plan.input_origins)  # (T, 2) (y, x)
    out_origins = jnp.asarray(plan.output_origins)
    row_w = jnp.asarray(plan.row_weights)  # (T, oh)
    col_w = jnp.asarray(plan.col_weights)  # (T, ow)
    pad_t, pad_b, pad_l, pad_r = plan.pad
    th, tw = plan.input_tile
    oh, ow = plan.output_tile
    canvas_h, canvas_w = plan.canvas_size
    out_h, out_w = plan.output_size

    def fn(params, frame_u8):
        x = frame_u8.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        padded = jnp.pad(
            x, ((pad_t, pad_b), (pad_l, pad_r), (0, 0)), mode="edge"
        )

        def slice_tile(origin):
            return jax.lax.dynamic_slice(
                padded, (origin[0], origin[1], 0), (th, tw, 3)
            )

        tiles = jax.vmap(slice_tile)(in_origins)  # (T, th, tw, 3) fp32

        if config.tta and not rect_tta:
            tiles = jnp.concatenate(
                [dihedral_apply(tiles, i) for i in range(DIHEDRAL_SIZE)], 0
            )
            # layout: aug-major (aug i block holds all tiles); remembered
            # below when inverting.

        def apply_chunk(c):
            c = c.astype(compute_dtype)
            if sharding is not None:
                c = jax.lax.with_sharding_constraint(c, sharding)
            y = module.apply({"params": params}, c)
            return y.astype(jnp.float32)

        if rect_tta:
            def run_group(gtiles, gh, gw, goh, gow):
                pieces = []
                if g_full:
                    cs = gtiles[: g_full * chunk].reshape(
                        g_full, chunk, gh, gw, 3)
                    out = (apply_chunk(cs[0])[None] if g_full == 1
                           else jax.lax.map(apply_chunk, cs))
                    pieces.append(out.reshape(g_full * chunk, goh, gow, 3))
                if g_rem:
                    rt = gtiles[g_full * chunk:]
                    if g_rem_padded != g_rem:
                        rt = jnp.concatenate(
                            [rt, jnp.zeros((g_rem_padded - g_rem, gh, gw, 3),
                                           rt.dtype)], 0)
                    pieces.append(apply_chunk(rt)[:g_rem])
                return (pieces[0] if len(pieces) == 1
                        else jnp.concatenate(pieces, 0))

            ga = jnp.concatenate(
                [dihedral_apply(tiles, i) for i in DIHEDRAL_SHAPE_PRESERVING],
                0)
            gb = jnp.concatenate(
                [dihedral_apply(tiles, i) for i in DIHEDRAL_TRANSPOSING], 0)
            ya = run_group(ga, th, tw, oh, ow).reshape(
                half, plan.tile_count, oh, ow, 3)
            yb = run_group(gb, tw, th, ow, oh).reshape(
                half, plan.tile_count, ow, oh, 3)
            outs = (
                sum(dihedral_inverse(ya[k], i)
                    for k, i in enumerate(DIHEDRAL_SHAPE_PRESERVING))
                + sum(dihedral_inverse(yb[k], i)
                      for k, i in enumerate(DIHEDRAL_TRANSPOSING))
            ) * jnp.float32(1.0 / DIHEDRAL_SIZE)
        else:
            pieces = []
            if n_full:
                chunks = tiles[: n_full * chunk].reshape(
                    n_full, chunk, th, tw, 3)
                if n_full == 1:
                    full_out = apply_chunk(chunks[0])[None]
                else:
                    full_out = jax.lax.map(apply_chunk, chunks)
                pieces.append(full_out.reshape(n_full * chunk, oh, ow, 3))
            if rem:
                rem_tiles = tiles[n_full * chunk:]
                if rem_padded != rem:
                    rem_tiles = jnp.concatenate(
                        [rem_tiles,
                         jnp.zeros((rem_padded - rem, th, tw, 3),
                                   tiles.dtype)], 0
                    )
                pieces.append(apply_chunk(rem_tiles)[:rem])
            outs = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, 0)

            if config.tta:
                outs = outs.reshape(DIHEDRAL_SIZE, plan.tile_count, oh, ow, 3)
                outs = sum(
                    dihedral_inverse(outs[i], i) for i in range(DIHEDRAL_SIZE)
                ) * jnp.float32(1.0 / DIHEDRAL_SIZE)

        outs = outs * row_w[:, :, None, None] * col_w[:, None, :, None]

        canvas = jnp.zeros((canvas_h, canvas_w, 3), jnp.float32)

        def scatter(canvas, inp):
            tile_out, origin = inp
            y, xo = origin[0], origin[1]
            patch = jax.lax.dynamic_slice(canvas, (y, xo, 0), (oh, ow, 3))
            return (
                jax.lax.dynamic_update_slice(canvas, patch + tile_out, (y, xo, 0)),
                None,
            )

        canvas, _ = jax.lax.scan(scatter, canvas, (outs, out_origins))
        out = canvas[:out_h, :out_w]
        # saturating u8 cast: round-half-even then clamp, matching
        # cv::cuda::GpuMat::convertTo(CV_8U, 255.0) (img2img_render.cpp:342)
        return jnp.clip(jnp.round(out * 255.0), 0.0, 255.0).astype(jnp.uint8)

    fn.plan = plan  # expose for tests/diagnostics
    fn.n_chunks = n_chunks
    return fn


def make_chunked_fns(
    spec: ModelSpec,
    config: RenderConfig,
    frame_hw: tuple[int, int],
    n_dp: int = 1,
):
    """Build the model-independent halves of the chunked render pipeline.

    The monolithic ``make_render_fn`` traces the model INTO the per-frame-
    geometry program, so every new frame size recompiles the (expensive)
    model. The chunked pipeline splits the frame program into

        prepare(frame_u8)  -> (chunk, th, tw, 3) x n_chunks   [per geometry]
        model(params, c)   -> (chunk, oh, ow, 3)              [per tile cfg]
        finalize(*outs)    -> (H*s, W*s, 3) u8                [per geometry]

    so the expensive model executable is shared across all frame geometries
    and is exactly the program ``Upscaler.build()`` AOT-warms
    (registry.tile_apply_fn). The host loop over chunks restores the
    reference's per-batch progress granularity (img2img_render.cpp:336-338)
    and gives one seam for the fused-kernel fallback on both render paths.

    Chunking: full batch-size chunks plus ONE exact-size remainder chunk —
    the reference zero-pads the final partial batch and wastes the FLOPs
    (img2img_render.cpp:281); here the remainder runs at its true size
    (v5e: +18%% over padded chunks at 18 tiles / batch 8). When sharded the
    remainder is padded up to the dp-multiple only. The remainder model
    program compiles per distinct remainder size (cached; cheap next to
    the full-chunk program).

    Packed head (spec.packing = r > 1): the model emits (oh/r, ow/r,
    3*r*r) tiles — no per-tile depth-to-space transpose (minor-dim 3 is
    3/128 TPU lane efficiency) — and blend + scatter-add run in the packed
    layout (48 lanes); the canvas is unpacked ONCE at the end. Bitwise
    math is unchanged: packed ramps index the same per-pixel weights.
    """
    plan = resolve_tile_plan(spec, config, frame_hw)
    compute_dtype = config.precision.dtype
    steps_per_tile = DIHEDRAL_SIZE if config.tta else 1
    n_steps = plan.tile_count * steps_per_tile
    chunk = config.batch_size * n_dp
    p = spec.packing
    px = spec.pack_x
    if (p > 1 or px > 1) and config.tta:
        raise ValueError(
            "packed heads are incompatible with TTA (dihedral inverses act "
            "in pixel space); create the model without head packing")
    if config.tta and plan.input_tile[0] != plan.input_tile[1]:
        # whole-frame --tileSize 0 on a non-square frame: rect-TTA path
        return _make_rect_tta_chunked_fns(plan, config, n_dp)

    n_full = n_steps // chunk
    rem = n_steps - n_full * chunk
    rem_padded = -(-rem // n_dp) * n_dp if rem else 0
    chunk_sizes = [chunk] * n_full + ([rem_padded] if rem else [])
    n_chunks = len(chunk_sizes)

    in_origins = jnp.asarray(plan.input_origins)
    pad_t, pad_b, pad_l, pad_r = plan.pad
    th, tw = plan.input_tile
    oh, ow = plan.output_tile
    canvas_h, canvas_w = plan.canvas_size
    out_h, out_w = plan.output_size

    # Blend ramps + geometry, optionally in packed layout: packed channel
    # index ch = c*p*p + ry*p + rx covers output pixel (y0*p+ry, x0*p+rx)
    # (torch PixelShuffle order, models/swin_unet.py::_pixel_shuffle).
    if p > 1:
        assert oh % p == 0 and ow % p == 0 and out_h % p == 0
        assert canvas_h % p == 0 and canvas_w % p == 0
        assert np.all(plan.output_origins % p == 0), "origins not packable"
        out_origins = jnp.asarray(plan.output_origins // p)
    elif px > 1:
        # packed-x layout (spec.pack_x): bytes equal the pixel layout, so
        # only the x coordinates rescale; y stays pixel-exact
        assert ow % px == 0 and canvas_w % px == 0, (ow, canvas_w, px)
        assert np.all(plan.output_origins[:, 1] % px == 0), \
            "x origins not pack_x-aligned (gate via pack_x_applicable)"
        out_origins = jnp.asarray(np.stack(
            [plan.output_origins[:, 0], plan.output_origins[:, 1] // px],
            axis=1))
    else:
        out_origins = jnp.asarray(plan.output_origins)
    # Keep the jit-captured ramp constants compact ((T, oh) pixel ramps);
    # the packed (T, oh/p, 3p*p) expansion is a cheap in-graph gather —
    # multi-MB closure constants made the remote compile pathologically
    # slow through the tunnel.
    row_w_px = jnp.asarray(plan.row_weights)
    col_w_px = jnp.asarray(plan.col_weights)
    chans = np.arange(3 * p * p)
    ry_idx = jnp.asarray((chans // p) % p)
    rx_idx = jnp.asarray(chans % p)
    if px > 1:
        poh, pow_, pc = oh, ow // px, 3 * px
        lane_rx = jnp.asarray(np.arange(3 * px) // 3)  # lane = 3*rx + c
    else:
        poh, pow_, pc = oh // p, ow // p, 3 * p * p

    def _blend_weights():
        if px > 1:
            cw = col_w_px.reshape(plan.tile_count, pow_, px)[:, :, lane_rx]
            return row_w_px[:, :, None], cw
        if p == 1:
            return row_w_px[:, :, None], col_w_px[:, :, None]
        rw = row_w_px.reshape(plan.tile_count, poh, p)[:, :, ry_idx]
        cw = col_w_px.reshape(plan.tile_count, pow_, p)[:, :, rx_idx]
        return rw, cw

    def prepare_flat(frame_u8):
        """(H, W, 3) u8 -> (n_steps, th, tw, 3) compute-dtype tiles (no
        chunk split, no dp padding) — the TileStream entry point."""
        x = frame_u8.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        padded = jnp.pad(
            x, ((pad_t, pad_b), (pad_l, pad_r), (0, 0)), mode="edge"
        )

        def slice_tile(origin):
            return jax.lax.dynamic_slice(
                padded, (origin[0], origin[1], 0), (th, tw, 3)
            )

        tiles = jax.vmap(slice_tile)(in_origins)
        if config.tta:
            tiles = jnp.concatenate(
                [dihedral_apply(tiles, i) for i in range(DIHEDRAL_SIZE)], 0
            )
        return tiles.astype(compute_dtype)

    def prepare(frame_u8):
        tiles = prepare_flat(frame_u8)
        if rem_padded != rem:
            tiles = jnp.concatenate(
                [tiles,
                 jnp.zeros((rem_padded - rem, th, tw, 3), tiles.dtype)], 0,
            )
        pieces = []
        start = 0
        for size in chunk_sizes:
            pieces.append(
                jax.lax.slice_in_dim(tiles, start, start + size, axis=0))
            start += size
        return tuple(pieces)

    prepare.flat = prepare_flat

    def finalize(*outs):
        row_w, col_w = _blend_weights()
        if px > 1:
            canvas = jnp.zeros((canvas_h, canvas_w // px, pc), jnp.float32)
        else:
            canvas = jnp.zeros((canvas_h // p, canvas_w // p, pc),
                               jnp.float32)

        def scatter(canvas, inp):
            # blend + fp32 cast fused into the per-tile update: the scan
            # reads compute-dtype tiles (half the HBM traffic of a
            # pre-cast fp32 pass) and skips the standalone whole-batch
            # blend multiply (~0.6 ms/frame on v5e). Same multiply/add
            # order as blending first — bit-identical.
            tile_out, origin, rwt, cwt = inp
            t = tile_out.astype(jnp.float32) * rwt[:, None, :] * cwt[None, :, :]
            yy, xx = origin[0], origin[1]
            patch = jax.lax.dynamic_slice(canvas, (yy, xx, 0),
                                          (poh, pow_, pc))
            return (
                jax.lax.dynamic_update_slice(
                    canvas, patch + t, (yy, xx, 0)),
                None,
            )

        if config.tta:
            # inverse in the COMPUTE dtype, cast at the accumulate:
            # dihedral inverses are exact permutations, so permute-then-
            # cast is bit-identical to cast-then-permute while the
            # inverse gathers move half the bytes (bf16 vs fp32).
            y = jnp.concatenate(outs, 0)[:n_steps]
            y = y.reshape(DIHEDRAL_SIZE, plan.tile_count, oh, ow, 3)
            y = sum(
                dihedral_inverse(y[i], i).astype(jnp.float32)
                for i in range(DIHEDRAL_SIZE)
            ) * jnp.float32(1.0 / DIHEDRAL_SIZE)
            canvas, _ = jax.lax.scan(
                scatter, canvas, (y, out_origins, row_w, col_w))
        else:
            # one scan per model chunk — no whole-batch concat copy
            start = 0
            for c in outs:
                n = min(c.shape[0], n_steps - start)  # drop dp-pad rows
                canvas, _ = jax.lax.scan(
                    scatter, canvas,
                    (c[:n], out_origins[start:start + n],
                     row_w[start:start + n], col_w[start:start + n]))
                start += n
        if px > 1:
            # packed-x: u8 cast at 3*px lanes, then the pixel view is a
            # FREE reshape (identical bytes); only the x crop copies.
            gw = -(-out_w // px)
            out = canvas[:out_h, :gw]
            hh, ww16, cc = out.shape
            flat = out.reshape(hh, ww16 * cc)
            flat = jnp.clip(jnp.round(flat * 255.0), 0.0,
                            255.0).astype(jnp.uint8)
            out = flat.reshape(hh, ww16 * px, 3)
            return out[:, :out_w] if ww16 * px != out_w else out
        out = canvas[: out_h // p, : out_w // p]
        if p > 1:  # single whole-canvas unpack (depth-to-space)
            hh, ww = out.shape[0], out.shape[1]
            out = out.reshape(hh, ww, 3, p, p).transpose(0, 3, 1, 4, 2)
            out = out.reshape(hh * p, ww * p, 3)
        # saturating u8 cast on the lane-folded (H, W*C) view — the
        # row-major merge of (W, C) is free and turns a 3/128-lane pass
        # over the full canvas into a full-lane one
        hh, ww, cc = out.shape
        flat = out.reshape(hh, ww * cc)
        flat = jnp.clip(jnp.round(flat * 255.0), 0.0, 255.0).astype(jnp.uint8)
        return flat.reshape(hh, ww, cc)

    return prepare, finalize, plan, chunk_sizes


def _make_rect_tta_chunked_fns(plan, config: RenderConfig, n_dp: int):
    """Chunked prepare/finalize for TTA over RECTANGULAR tiles (whole-frame
    ``--tileSize 0`` on a non-square frame — the reference has neither mode,
    its tiles are always square, src/main.cpp:62-64).

    The 8 dihedral variants split by shape action: the shape-preserving
    group (identity, both flips, rot180) batches at (th, tw) and the
    rot90-family group at (tw, th). Each group chunks independently, the
    model program compiles once per orientation (both are multiples of the
    model's tile divisor, so any geometry the normal whole-frame path
    accepts works transposed too), and finalize inverts every variant back
    to (oh, ow) before the 1/8 mean. Pixel-shuffle packing never applies
    here (TTA excludes packed heads) and cross-frame TileStream cannot ride
    mixed chunk shapes: ``prepare.flat`` is None and ``Upscaler.open_stream``
    degrades to per-frame dispatch for this geometry.
    """
    compute_dtype = config.precision.dtype
    chunk = config.batch_size * n_dp
    half = DIHEDRAL_SIZE // 2
    g_steps = plan.tile_count * half
    g_full = g_steps // chunk
    g_rem = g_steps - g_full * chunk
    g_rem_padded = -(-g_rem // n_dp) * n_dp if g_rem else 0
    g_sizes = [chunk] * g_full + ([g_rem_padded] if g_rem else [])
    chunk_sizes = g_sizes + g_sizes
    n_group_chunks = len(g_sizes)

    in_origins = jnp.asarray(plan.input_origins)
    out_origins = jnp.asarray(plan.output_origins)
    row_w = jnp.asarray(plan.row_weights)  # (T, oh)
    col_w = jnp.asarray(plan.col_weights)  # (T, ow)
    pad_t, pad_b, pad_l, pad_r = plan.pad
    th, tw = plan.input_tile
    oh, ow = plan.output_tile
    canvas_h, canvas_w = plan.canvas_size
    out_h, out_w = plan.output_size

    def prepare(frame_u8):
        x = frame_u8.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        padded = jnp.pad(
            x, ((pad_t, pad_b), (pad_l, pad_r), (0, 0)), mode="edge"
        )

        def slice_tile(origin):
            return jax.lax.dynamic_slice(
                padded, (origin[0], origin[1], 0), (th, tw, 3)
            )

        tiles = jax.vmap(slice_tile)(in_origins)  # (T, th, tw, 3) fp32
        pieces = []
        for idxs, (gh, gw) in (
            (DIHEDRAL_SHAPE_PRESERVING, (th, tw)),
            (DIHEDRAL_TRANSPOSING, (tw, th)),
        ):
            g = jnp.concatenate([dihedral_apply(tiles, i) for i in idxs], 0)
            g = g.astype(compute_dtype)
            if g_rem_padded != g_rem:
                g = jnp.concatenate(
                    [g, jnp.zeros((g_rem_padded - g_rem, gh, gw, 3),
                                  g.dtype)], 0)
            start = 0
            for size in g_sizes:
                pieces.append(
                    jax.lax.slice_in_dim(g, start, start + size, axis=0))
                start += size
        return tuple(pieces)

    prepare.flat = None  # mixed chunk shapes: no cross-frame TileStream

    def finalize(*outs):
        # inverse in the COMPUTE dtype, cast at the accumulate (exact
        # permutations commute with the cast — see make_chunked_fns)
        ya = jnp.concatenate(outs[:n_group_chunks], 0)[:g_steps]
        yb = jnp.concatenate(outs[n_group_chunks:], 0)[:g_steps]
        ya = ya.reshape(half, plan.tile_count, oh, ow, 3)
        yb = yb.reshape(half, plan.tile_count, ow, oh, 3)
        y = (
            sum(dihedral_inverse(ya[k], i).astype(jnp.float32)
                for k, i in enumerate(DIHEDRAL_SHAPE_PRESERVING))
            + sum(dihedral_inverse(yb[k], i).astype(jnp.float32)
                  for k, i in enumerate(DIHEDRAL_TRANSPOSING))
        ) * jnp.float32(1.0 / DIHEDRAL_SIZE)

        canvas = jnp.zeros((canvas_h, canvas_w, 3), jnp.float32)

        def scatter(canvas, inp):
            tile_out, origin, rwt, cwt = inp
            t = tile_out * rwt[:, None, None] * cwt[None, :, None]
            yy, xx = origin[0], origin[1]
            patch = jax.lax.dynamic_slice(canvas, (yy, xx, 0), (oh, ow, 3))
            return (
                jax.lax.dynamic_update_slice(canvas, patch + t, (yy, xx, 0)),
                None,
            )

        canvas, _ = jax.lax.scan(
            scatter, canvas, (y, out_origins, row_w, col_w))
        out = canvas[:out_h, :out_w]
        # saturating u8 cast on the lane-folded view (see make_chunked_fns)
        hh, ww, cc = out.shape
        flat = out.reshape(hh, ww * cc)
        flat = jnp.clip(jnp.round(flat * 255.0), 0.0, 255.0).astype(jnp.uint8)
        return flat.reshape(hh, ww, cc)

    return prepare, finalize, plan, chunk_sizes


def pack_x_applicable(plan, px: int) -> bool:
    """True when the geometry lets the packed-x model layout scatter
    exactly: output tile width and every output x-origin pack_x-aligned
    (all CLI tile sizes x scales are; odd whole-frame widths are not)."""
    return bool(px > 1 and plan.output_tile[1] % px == 0
                and np.all(plan.output_origins[:, 1] % px == 0))


class ChunkedPipeline:
    """Host-composed render pipeline: per-geometry prepare/finalize programs
    around one shared per-tile-config model program.

    ``render`` dispatches chunk-by-chunk, firing ``progress(i, n, it_s)``
    after each model-chunk dispatch — the reference's "batch i/n @ it/s"
    seam (img2img_render.cpp:336-338). All stages run on device; the
    returned array is not fetched (async-dispatch friendly).

    ``module_pack_x`` (optional): a packed-x-head twin of ``module`` over
    the SAME parameters (registry packed_x_head). Geometries whose output
    x-origins are pack_x-aligned render through it — the head
    depth-to-space disappears into ops/head_pack.py and blend/scatter/u8
    run in the byte-identical packed layout; unaligned geometries fall
    back to the pixel module transparently.
    """

    def __init__(
        self,
        module,
        spec: ModelSpec,
        config: RenderConfig,
        sharding: Optional[jax.sharding.NamedSharding] = None,
        module_pack_x=None,
        spec_pack_x: Optional[ModelSpec] = None,
    ) -> None:
        self._jit_kw = {}
        opts = tpu_compiler_options()
        if opts:
            self._jit_kw["compiler_options"] = opts
        self._spec = spec
        self._config = config
        self._sharding = sharding
        self._n_dp = 1
        if sharding is not None:
            self._n_dp = int(np.prod([
                sharding.mesh.shape[a] for a in sharding.spec if a is not None
            ]))
        # Model programs go through the executable store (engine/exe_cache):
        # the expensive remote compile is persisted like the reference's
        # .trt so a fresh process deserializes instead of recompiling.
        # Sharded (dp) pipelines bypass it — multi-device executables bind
        # mesh device ids that a fresh process need not reproduce.
        self._exe_ok = sharding is None
        self._model_prog = self._make_model_prog(module)
        self._spec_px = spec_pack_x if module_pack_x is not None else None
        self._model_prog_px = (
            self._make_model_prog(module_pack_x)
            if module_pack_x is not None else None)
        self._geoms: dict[tuple[int, int], tuple] = {}

    def _make_model_prog(self, module):
        from waifu2x_tensorrt_tpu.engine import exe_cache
        from waifu2x_tensorrt_tpu.models.registry import tile_apply_fn

        fn = tile_apply_fn(module)
        if not self._exe_ok:
            return jax.jit(fn, **self._jit_kw)
        return exe_cache.cached_jit(
            fn, tag=f"model|{exe_cache.module_tag(module)}", **self._jit_kw)

    def set_module(self, module, module_pack_x=None) -> None:
        """Swap the model program(s) (fused-kernel fallback seam); the
        per-geometry prepare/finalize programs are model-independent and
        stay valid."""
        self._model_prog = self._make_model_prog(module)
        if module_pack_x is not None:
            self._model_prog_px = self._make_model_prog(module_pack_x)
        elif self._model_prog_px is not None:
            # twin not rebuilt: disable the packed path rather than mix
            # old/new modules — and drop geometry entries whose finalize
            # was traced for the packed layout
            self._model_prog_px = None
            self._spec_px = None
            self._geoms = {k: e for k, e in self._geoms.items()
                           if not e[0].use_pack_x}

    def _model_for(self, prep_prog):
        if (getattr(prep_prog, "use_pack_x", False)
                and self._model_prog_px is not None):
            return self._model_prog_px
        return self._model_prog

    def get(self, frame_hw: tuple[int, int]):
        key = (int(frame_hw[0]), int(frame_hw[1]))
        entry = self._geoms.get(key)
        if entry is None:
            spec_used = self._spec
            use_px = False
            if self._model_prog_px is not None and not self._config.tta:
                plan_probe = resolve_tile_plan(self._spec, self._config, key)
                use_px = pack_x_applicable(plan_probe, self._spec_px.pack_x)
                if use_px:
                    spec_used = self._spec_px
            prepare, finalize, plan, chunk_sizes = make_chunked_fns(
                spec_used, self._config, key, self._n_dp
            )
            # Pallas gather epilogue (ops/finalize_epilogue): one-pass
            # blend+scatter+u8, bit-identical to the scan. Measured v5e
            # 2026-08-21 (probes/r5_finalize_ab): +6.1% streamed at the
            # headline (461.5 -> 489.6 MP/s) — DEFAULT ON for TPU
            # backends where the geometry applies; the scan remains the
            # fallback and the CPU path (goldens pin it).
            # WAIFU2X_PALLAS_FINALIZE: 0 = off, 1 = force,
            # interpret = CPU interpret mode (tests), unset = TPU auto.
            epi_env = os.environ.get("WAIFU2X_PALLAS_FINALIZE", "auto")
            use_epi = (
                epi_env in ("1", "interpret")
                or (epi_env == "auto"
                    and jax.default_backend() not in ("cpu", "gpu")))
            # dp-sharded pipelines keep the scan: finalize consumes
            # sharded chunk outputs and GSPMD cannot partition the
            # pallas_call (the gather epilogue is a single-device
            # program; the scan replicates fine)
            if self._sharding is not None:
                use_epi = False
            if use_epi:
                from waifu2x_tensorrt_tpu.ops.finalize_epilogue import (
                    epilogue_applicable,
                    make_finalize_epilogue,
                )

                if epilogue_applicable(plan, self._config.tta,
                                       spec_used.packing,
                                       spec_used.pack_x):
                    finalize = make_finalize_epilogue(
                        plan, interpret=epi_env == "interpret")
                    finalize.is_epilogue = True
            out_shardings = None
            if self._sharding is not None:
                out_shardings = (self._sharding,) * len(chunk_sizes)
            if self._exe_ok:
                from waifu2x_tensorrt_tpu.engine import exe_cache

                # geometry (frame H,W) rides in via the argument shapes;
                # everything else shaping the traced program is in the
                # tag — INCLUDING the finalize implementation choice: an
                # env-selected variant is invisible to the source hash
                # and the arg shapes, and omitting it served the scan
                # executable to the epilogue pipeline (round-5 A/B bug)
                gtag = (f"{spec_used}|{self._config}|dp{self._n_dp}"
                        f"|px{int(use_px)}"
                        f"|epi{int(getattr(finalize, 'is_epilogue', False))}")
                prep_prog = exe_cache.cached_jit(prepare, tag=f"prep|{gtag}")
                prep_prog.flat = (
                    exe_cache.cached_jit(prepare.flat, tag=f"prepflat|{gtag}")
                    if prepare.flat is not None else None)
                fin_prog = exe_cache.cached_jit(finalize, tag=f"fin|{gtag}")
            else:
                prep_prog = jax.jit(prepare, out_shardings=out_shardings)
                prep_prog.flat = (jax.jit(prepare.flat)
                                  if prepare.flat is not None else None)
                fin_prog = jax.jit(finalize)
            fin_prog.is_epilogue = getattr(finalize, "is_epilogue", False)
            entry = (prep_prog, fin_prog, plan, len(chunk_sizes))
            entry[0].chunk_sizes = chunk_sizes
            entry[0].use_pack_x = use_px
            self._geoms[key] = entry
        return entry

    def flops_per_frame(self, params, frame_hw: tuple[int, int],
                        compile_fallback: bool = True) -> float:
        """Model FLOPs dispatched per frame at this geometry, from XLA's
        client-side HLO cost analysis of the shared tile program (no
        device compile: ``lower()`` + ``cost_analysis()`` are host-only).
        Prepare/finalize are data movement (pad/slice/blend/scatter) —
        sub-1% of FLOPs — so the model chunks are the honest numerator
        for an MFU figure (bench.py, VERDICT r4 item 1). Rect-TTA
        geometries dispatch half their chunks transposed ((n, tw, th));
        counting them as (n, th, tw) is exact anyway — conv/attention
        FLOPs depend on the pixel count, not the orientation."""
        prep_prog, _fin, plan, _n = self.get(frame_hw)
        model_prog = self._model_for(prep_prog)
        th, tw = plan.input_tile
        p_struct = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
        total = 0.0
        cache: dict[int, float] = {}
        for n in prep_prog.chunk_sizes:  # already n_dp-multiplied
            fl = cache.get(n)
            if fl is None:
                x = jax.ShapeDtypeStruct(
                    (n, int(th), int(tw), 3), self._config.precision.dtype)
                lowered = model_prog.lower(p_struct, x)
                ca = lowered.cost_analysis()
                if ca is None or "flops" not in ca:
                    if not compile_fallback:
                        raise RuntimeError(
                            "lowered cost_analysis unavailable on this "
                            "backend and compile_fallback=False")
                    # Some backends (axon) only attach the analysis
                    # post-compile. For a pipeline render() has already
                    # run, the jit/persistent caches make this a lookup;
                    # for a fresh pipeline (bench's dense-math twin) it
                    # is a REAL one-time compile that the persistent
                    # cache amortizes across runs.
                    ca = lowered.compile().cost_analysis()
                fl = float(ca["flops"])
                cache[n] = fl
            total += fl
        return total

    def render(self, params, frame_u8, progress=None):
        """Dispatch one frame; returns the (device) u8 output array."""
        import time as _time

        prep_prog, fin_prog, plan, n_chunks = self.get(frame_u8.shape[:2])
        model_prog = self._model_for(prep_prog)
        chunks = prep_prog(jnp.asarray(frame_u8))
        outs = []
        t_prev = _time.perf_counter()
        for i, c in enumerate(chunks):
            outs.append(model_prog(params, c))
            if progress is not None:
                t_now = _time.perf_counter()
                # dispatch-to-dispatch rate: at steady state XLA's queue
                # depth throttles dispatch to completion rate (the
                # reference's it/s also measures async enqueue time).
                progress(i + 1, n_chunks, 1.0 / max(t_now - t_prev, 1e-9))
                t_prev = t_now
        return fin_prog(*outs)


class TileStream:
    """Cross-frame tile streaming: the model runs at FULL batch, always.

    Per-frame chunking leaves a remainder program each frame (18 tiles at
    batch 16 -> a 2-tile dispatch) which profiled at 2.4 ms/tile vs
    1.43 ms/tile amortized on v5e — small batches pay fixed layout
    overheads in the stem/decoder. Streaming instead carries leftover
    tiles into the next frame's first chunk, so in steady state every
    model dispatch is a full batch (9 chunks per 8 frames at 720p/tile
    256 instead of 16). A frame's output is ready at most one chunk
    later; ``flush()`` drains the tail with one exact-size dispatch.

    The reference cannot do this: its batch loop is scoped to one frame
    (img2img_render.cpp:260-290). One geometry per stream (the bucketed
    video case). With a dp mesh, chunks span batch*n_dp tiles and each
    chunk is placed with the tile sharding before dispatch, so every
    device stays at full per-device batch; the flush tail is padded up
    to the dp multiple only.
    """

    def __init__(self, pipeline: "ChunkedPipeline", params,
                 frame_hw: tuple[int, int], progress=None) -> None:
        self._pl = pipeline
        self._params = params
        self._progress = progress  # (i, n, it_s) per model chunk
        self._hw = (int(frame_hw[0]), int(frame_hw[1]))
        prep, fin, plan, _ = pipeline.get(self._hw)
        self._prep_flat = prep.flat
        if self._prep_flat is None:
            raise ValueError(
                "TileStream unavailable for this geometry: rectangular-TTA "
                "whole-frame renders batch two tile orientations per frame "
                "and cannot ride one cross-frame carry; render per-frame "
                "(ChunkedPipeline.render) instead")
        self._fin = fin
        self._plan = plan
        self._use_px = getattr(prep, "use_pack_x", False)
        steps_per_tile = DIHEDRAL_SIZE if pipeline._config.tta else 1
        self._n_steps = plan.tile_count * steps_per_tile
        self._sharding = pipeline._sharding
        self._n_dp = pipeline._n_dp
        self._chunk = pipeline._config.batch_size * self._n_dp
        self._carry = None           # (r, th, tw, 3) device tiles
        self._outs: list = []        # [array, consumed] model outputs
        self._pending = 0            # frames submitted, not yet finalized
        self._asm = {}               # jitted assemble programs per carry r

    def _run_chunk(self, c):
        if self._sharding is not None:
            c = jax.device_put(c, self._sharding)
        prog = (self._pl._model_prog_px
                if self._use_px and self._pl._model_prog_px is not None
                else self._pl._model_prog)
        return prog(self._params, c)

    def _assemble(self, tiles):
        """ONE jitted dispatch turning (carry?, frame tiles) into the
        chunk list plus the new carry — replaces an eager concat + k
        slice dispatches (each eager op is a host->device RPC round on
        remote platforms)."""
        chunk = self._chunk
        r = 0 if self._carry is None else int(self._carry.shape[0])
        n = r + int(tiles.shape[0])
        k, left = n // chunk, n % chunk
        fn = self._asm.get(r)
        if fn is None:
            def assemble(carry, t):
                avail = (t if carry is None
                         else jnp.concatenate([carry, t], 0))
                m = avail.shape[0]
                kk = m // chunk
                parts = [
                    jax.lax.slice_in_dim(avail, i * chunk, (i + 1) * chunk,
                                         axis=0)
                    for i in range(kk)
                ]
                if m % chunk:
                    parts.append(
                        jax.lax.slice_in_dim(avail, kk * chunk, m, axis=0))
                return tuple(parts)
            if self._pl._exe_ok:
                from waifu2x_tensorrt_tpu.engine import exe_cache

                fn = (exe_cache.cached_jit(
                          assemble, tag=f"asm|c{chunk}|r{r}") if r
                      else exe_cache.cached_jit(
                          lambda t: assemble(None, t), tag=f"asm|c{chunk}|r0"))
            else:
                fn = (jax.jit(assemble) if r
                      else jax.jit(lambda t: assemble(None, t)))
            self._asm[r] = fn
        parts = fn(self._carry, tiles) if r else fn(tiles)
        chunks = parts[:k]
        self._carry = parts[k] if left else None
        return chunks

    def _avail_out(self) -> int:
        return sum(int(a.shape[0]) - used for a, used in self._outs)

    def _drain(self):
        ready = []
        while self._pending and self._avail_out() >= self._n_steps:
            need = self._n_steps
            pieces = []
            while need:
                a, used = self._outs[0]
                take = min(need, int(a.shape[0]) - used)
                pieces.append(
                    jax.lax.slice_in_dim(a, used, used + take, axis=0))
                need -= take
                if used + take == int(a.shape[0]):
                    self._outs.pop(0)
                else:
                    self._outs[0][1] = used + take
            # finalize consumes the pieces directly (its per-chunk scan
            # handles any piece split) — no gather concat copy/dispatch
            ready.append(self._fin(*pieces))
            self._pending -= 1
        return ready

    def submit(self, frame_u8):
        """Feed one frame; returns the list of frame outputs that became
        ready (device u8 arrays, in submission order). Fires the progress
        callback per model chunk ("batch i/n @ it/s", the reference's
        per-batch granularity, img2img_render.cpp:336-338)."""
        import time as _time

        assert frame_u8.shape[:2] == self._hw, "one geometry per stream"
        tiles = self._prep_flat(jnp.asarray(frame_u8))
        self._pending += 1
        chunks = self._assemble(tiles)
        t_prev = _time.perf_counter()
        for i, c in enumerate(chunks):
            self._outs.append([self._run_chunk(c), 0])
            if self._progress is not None:
                t_now = _time.perf_counter()
                self._progress(i + 1, len(chunks),
                               1.0 / max(t_now - t_prev, 1e-9))
                t_prev = t_now
        return self._drain()

    def warm(self) -> int:
        """Pre-compile every program signature one steady-state carry
        cycle hits: frame boundaries walk through the chunk stream with
        period chunk/gcd(n_steps, chunk), and each distinct split pattern
        is a distinct jitted finalize/assemble signature. bench.py always
        warmed a full cycle before timing but the live CLI video path did
        not, so the first seconds of a stream stuttered through compiles
        (ADVICE r2). Runs the cycle on zero frames through a throwaway
        stream sharing this pipeline — the jitted prepare/finalize come
        from the pipeline's per-geometry cache and the XLA executables
        from the in-memory/persistent compile caches, so the compiles
        transfer. Returns the number of warm frames run. The end-of-video
        flush tail (one arbitrary-size dispatch) still compiles at flush
        time — a single one-off at stream end, not a mid-stream stutter.
        """
        import math

        # even division still needs ONE warm pass (prepare, the model
        # program when the persistent cache is cold, assemble, finalize
        # all compile on the first live submit otherwise); uneven frames
        # warm every split signature in the carry cycle
        cycle = (1 if self._n_steps % self._chunk == 0
                 else self._chunk // math.gcd(self._n_steps, self._chunk))
        throwaway = TileStream(self._pl, self._params, self._hw)
        frame = np.zeros((*self._hw, 3), np.uint8)
        for _ in range(cycle):
            throwaway.submit(frame)
        throwaway.flush()
        return cycle

    def flush(self):
        """Run the carried tail (one exact-size dispatch, padded up to
        the dp multiple when sharded) and return the remaining frame
        outputs."""
        if self._carry is not None:
            c = self._carry
            r = int(c.shape[0])
            r_pad = -(-r // self._n_dp) * self._n_dp
            if r_pad != r:
                c = jnp.concatenate(
                    [c, jnp.zeros((r_pad - r, *c.shape[1:]), c.dtype)], 0)
            out = self._run_chunk(c)
            if r_pad != r:
                out = jax.lax.slice_in_dim(out, 0, r, axis=0)
            self._outs.append([out, 0])
            self._carry = None
        return self._drain()


class RendererCache:
    """jit-compiled render programs keyed by frame geometry.

    The reference compiles one TensorRT engine per tile config and reuses it
    for every frame size; XLA programs are specialized on frame geometry too,
    so we cache per (H, W).
    """

    def __init__(
        self,
        module,
        spec: ModelSpec,
        config: RenderConfig,
        sharding: Optional[jax.sharding.NamedSharding] = None,
    ) -> None:
        self._module = module
        self._spec = spec
        self._config = config
        self._sharding = sharding
        self._programs: dict[tuple[int, int], Callable] = {}

    def get(self, frame_hw: tuple[int, int]) -> Callable:
        key = (int(frame_hw[0]), int(frame_hw[1]))
        prog = self._programs.get(key)
        if prog is None:
            fn = make_render_fn(
                self._module, self._spec, self._config, key, self._sharding
            )
            opts = tpu_compiler_options()
            jit_kw = {"compiler_options": opts} if opts else {}
            if self._sharding is None:
                from waifu2x_tensorrt_tpu.engine import exe_cache

                prog = exe_cache.cached_jit(
                    fn,
                    tag=(f"fused|{exe_cache.module_tag(self._module)}"
                         f"|{self._spec}|{self._config}"),
                    **jit_kw)
            else:
                prog = jax.jit(fn, **jit_kw)
            prog.plan = fn.plan
            prog.n_chunks = fn.n_chunks
            self._programs[key] = prog
        return prog

    def render(self, params, frame_u8: np.ndarray) -> np.ndarray:
        """Render one frame (synchronous convenience wrapper)."""
        prog = self.get(frame_u8.shape[:2])
        return np.asarray(prog(params, jnp.asarray(frame_u8)))


def bucket_frame(frame_u8: np.ndarray, bucket: int) -> tuple[np.ndarray, tuple[int, int]]:
    """Edge-pad a frame up to the next (bucket x bucket) size class.

    Mixed-size directory renders compile one XLA program per distinct frame
    geometry (SURVEY.md §7 hard part (c)); bucketing trades a thin strip of
    blend-boundary pixels near the padded right/bottom edges (they blend
    with replicated-edge content) for a bounded number of compilations.
    Returns (padded_frame, original_hw).
    """
    h, w = frame_u8.shape[:2]
    if bucket <= 1:
        return frame_u8, (h, w)
    ph = (-h) % bucket
    pw = (-w) % bucket
    if not (ph or pw):
        return frame_u8, (h, w)
    padded = np.pad(frame_u8, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return padded, (h, w)
