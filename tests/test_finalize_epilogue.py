"""Pallas finalize epilogue (ops/finalize_epilogue): byte-identity vs the
XLA scan finalize, interpret mode on CPU (compiled path runs on TPU).

The epilogue's contract is BIT-IDENTICAL u8 output to the scan path
(same fp32 addition order per element — module docstring); these tests
pin that across geometries, chunk splits, dtypes, and the applicability
predicate's fallback edges."""

import numpy as np
import pytest

import jax.numpy as jnp

from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
from waifu2x_tensorrt_tpu.engine.renderer import (
    make_chunked_fns,
    resolve_tile_plan,
)
from waifu2x_tensorrt_tpu.models.registry import get_spec
from waifu2x_tensorrt_tpu.ops.finalize_epilogue import (
    epilogue_applicable,
    make_finalize_epilogue,
)


def _cfg(tile, batch=3, tta=False, precision=Precision.TF32, scaling=2):
    return RenderConfig(precision=precision, batch_size=batch, height=tile,
                        width=tile, scaling=scaling,
                        overlap=(1 / 16, 1 / 16), tta=tta)


def _outs_for(plan, chunk_sizes, dtype, seed=0):
    """Random model outputs in the renderer's chunk shapes."""
    oh, ow = plan.output_tile
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.random((n, oh, ow, 3), np.float32)
                        .astype(dtype))
            for n in chunk_sizes]


@pytest.mark.parametrize("frame_hw,tile,batch,dtype", [
    ((100, 110), 64, 3, jnp.float32),   # 2x2 grid, remainder chunk
    ((100, 110), 64, 4, jnp.bfloat16),  # bf16 model outputs (FP16 path)
    ((150, 260), 64, 5, jnp.float32),   # 3x5 grid, uneven chunks
])
def test_epilogue_bit_identical_to_scan(frame_hw, tile, batch, dtype):
    spec = get_spec("swin_unet/art", 2)
    config = _cfg(tile, batch)
    plan = resolve_tile_plan(spec, config, frame_hw)
    assert epilogue_applicable(plan, config.tta, spec.packing, spec.pack_x)
    _prep, fin_scan, plan2, chunk_sizes = make_chunked_fns(
        spec, config, frame_hw, 1)
    outs = _outs_for(plan2, chunk_sizes, dtype)
    want = np.asarray(fin_scan(*outs))
    fin_epi = make_finalize_epilogue(plan2, interpret=True)
    got = np.asarray(fin_epi(*outs))
    assert got.shape == want.shape == (*plan2.output_size, 3)
    np.testing.assert_array_equal(got, want)


def test_epilogue_single_chunk_and_many_chunks_agree():
    """The chunk split must not matter: one concat covers both."""
    spec = get_spec("swin_unet/art", 2)
    config = _cfg(64, 2)
    plan = resolve_tile_plan(spec, config, (100, 110))
    _p, _f, plan2, chunk_sizes = make_chunked_fns(spec, config, (100, 110), 1)
    fin = make_finalize_epilogue(plan2, interpret=True)
    outs = _outs_for(plan2, chunk_sizes, jnp.float32, seed=3)
    got_split = np.asarray(fin(*outs))
    got_whole = np.asarray(fin(jnp.concatenate(outs, 0)))
    np.testing.assert_array_equal(got_split, got_whole)


def test_applicability_edges():
    spec = get_spec("swin_unet/art", 2)
    # single-row grids fall back
    cfg = _cfg(64)
    plan = resolve_tile_plan(spec, cfg, (40, 110))
    assert not epilogue_applicable(plan, cfg.tta, 1, 1)
    # TTA falls back
    plan2 = resolve_tile_plan(spec, cfg, (100, 110))
    assert not epilogue_applicable(plan2, True, 1, 1)
    # packed heads fall back
    assert not epilogue_applicable(plan2, False, 2, 1)
    assert not epilogue_applicable(plan2, False, 1, 16)
    # cunet's 440-px output tile is not 384-lane aligned -> falls back
    cspec = get_spec("cunet/art", 2)
    cplan = resolve_tile_plan(cspec, _cfg(256), (600, 600))
    assert not epilogue_applicable(cplan, False, 1, 1)


def test_epilogue_through_pipeline_env_gate(monkeypatch):
    """ChunkedPipeline picks the epilogue under WAIFU2X_PALLAS_FINALIZE=
    interpret and renders byte-identically to the default scan path."""
    from waifu2x_tensorrt_tpu.engine.renderer import ChunkedPipeline
    from waifu2x_tensorrt_tpu.models.registry import create_model, init_params

    module, spec = create_model("swin_unet/art", 2, -1)
    params = init_params(module, tile=64, seed=0)
    config = _cfg(64, 3)
    frame = np.random.default_rng(1).integers(
        0, 256, (100, 110, 3), np.uint8)

    monkeypatch.delenv("WAIFU2X_PALLAS_FINALIZE", raising=False)
    base = ChunkedPipeline(module, spec, config)
    want = np.asarray(base.render(params, jnp.asarray(frame)))

    monkeypatch.setenv("WAIFU2X_PALLAS_FINALIZE", "interpret")
    epi = ChunkedPipeline(module, spec, config)
    prep_prog, _fin, _plan, _n = epi.get(frame.shape[:2])
    assert getattr(epi.get(frame.shape[:2])[1], "is_epilogue", False)
    got = np.asarray(epi.render(params, jnp.asarray(frame)))
    np.testing.assert_array_equal(got, want)


def test_epilogue_through_tile_stream(monkeypatch):
    """TileStream hands finalize PIECES sliced at arbitrary chunk
    boundaries (cross-frame carry); the epilogue's concat must reproduce
    the scan stream byte-for-byte across a full carry cycle."""
    from waifu2x_tensorrt_tpu.engine.renderer import (
        ChunkedPipeline,
        TileStream,
    )
    from waifu2x_tensorrt_tpu.models.registry import create_model, init_params

    module, spec = create_model("swin_unet/art", 2, -1)
    params = init_params(module, tile=64, seed=0)
    config = _cfg(64, 4)  # 6 tiles/frame at (100,110), chunk 4 -> carry
    frames = [np.random.default_rng(k).integers(0, 256, (100, 110, 3),
                                                np.uint8) for k in range(3)]

    def run_stream():
        pl = ChunkedPipeline(module, spec, config)
        stream = TileStream(pl, params, (100, 110))
        got = []
        for f in frames:
            got.extend(np.asarray(o) for o in stream.submit(f))
        got.extend(np.asarray(o) for o in stream.flush())
        return got

    monkeypatch.delenv("WAIFU2X_PALLAS_FINALIZE", raising=False)
    want = run_stream()
    monkeypatch.setenv("WAIFU2X_PALLAS_FINALIZE", "interpret")
    got = run_stream()
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_epilogue_skipped_on_sharded_pipelines(monkeypatch):
    """dp pipelines must keep the scan finalize: the gather epilogue is a
    single-device pallas program and GSPMD cannot partition it over the
    sharded chunk outputs."""
    import jax

    from waifu2x_tensorrt_tpu.engine.renderer import ChunkedPipeline
    from waifu2x_tensorrt_tpu.models.registry import create_model
    from waifu2x_tensorrt_tpu.parallel import data_parallel_mesh, tile_sharding

    module, spec = create_model("swin_unet/art", 2, -1)
    config = _cfg(64, 1)
    monkeypatch.setenv("WAIFU2X_PALLAS_FINALIZE", "interpret")
    mesh = data_parallel_mesh(8)
    with mesh:
        pl = ChunkedPipeline(module, spec, config,
                             sharding=tile_sharding(mesh))
        fin = pl.get((100, 110))[1]
    assert not getattr(fin, "is_epilogue", False)


def test_exe_cache_tag_distinguishes_finalize_variant(tmp_path, monkeypatch):
    """Round-5 A/B bug regression: with the executable store on, the scan
    and epilogue pipelines' finalize programs MUST have distinct cache
    tags — a shared tag silently served the scan executable to the
    epilogue pipeline (byte-identical output, invalidated measurement)."""
    from waifu2x_tensorrt_tpu.engine import exe_cache
    from waifu2x_tensorrt_tpu.engine.renderer import ChunkedPipeline
    from waifu2x_tensorrt_tpu.models.registry import create_model

    module, spec = create_model("swin_unet/art", 2, -1)
    config = _cfg(64, 3)
    monkeypatch.setenv("WAIFU2X_EXE_CACHE", "1")
    exe_cache.configure(tmp_path)
    try:
        monkeypatch.delenv("WAIFU2X_PALLAS_FINALIZE", raising=False)
        fin_scan = ChunkedPipeline(module, spec, config).get((100, 110))[1]
        monkeypatch.setenv("WAIFU2X_PALLAS_FINALIZE", "interpret")
        fin_epi = ChunkedPipeline(module, spec, config).get((100, 110))[1]
        assert isinstance(fin_scan, exe_cache.CachedProgram)
        assert isinstance(fin_epi, exe_cache.CachedProgram)
        assert fin_epi.is_epilogue and not fin_scan.is_epilogue
        assert fin_scan._tag != fin_epi._tag
    finally:
        exe_cache.configure(None)
