"""Day-one artifact robustness (VERDICT r4 item 2): exporter variations
this repo did not author — external-data sidecars, fp16 initializer
storage, and constant-folded (onnxsim-style) graphs — must parse,
execute, convert, and serve, or fail loud with a named error.

A genuine ``torch.onnx.export(dynamo=True)`` graph is environment-blocked
(the dynamo exporter imports ``onnxscript``, not installed, zero egress
— see ARTIFACTS.md); its distinguishing idioms (static shapes, fused
LayerNormalization, constants promoted to initializers, folded shape
chains) are rehearsed here through the constant-folding rewriter applied
to real torch-tracer exports.
"""

from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_mirror import export_torch_swin  # noqa: E402

from waifu2x_tensorrt_tpu.models.onnx_backend import (  # noqa: E402
    derive_arch,
    swin_params_from_graph,
    verify_swin_conversion,
)
from waifu2x_tensorrt_tpu.models.onnx_build import (  # noqa: E402
    externalize_initializers,
    quantize_initializers_fp16,
)
from waifu2x_tensorrt_tpu.models.onnx_graph import (  # noqa: E402
    read_graph,
    run_graph,
)
from waifu2x_tensorrt_tpu.models.onnx_reader import (  # noqa: E402
    OnnxExternalDataError,
    read_initializers,
)


@pytest.fixture(scope="module")
def torch_export(tmp_path_factory):
    td = tmp_path_factory.mktemp("torch_onnx_robust")
    model, path = export_torch_swin(td / "scale2x.onnx", scale=2,
                                    base_dim=32, tile=64)
    return model, path


def _torch_forward(model, x_nchw: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        return model(torch.from_numpy(x_nchw)).numpy()


# ---------------------------------------------------------------------------
# external data
# ---------------------------------------------------------------------------


def test_externalized_export_round_trips(torch_export, tmp_path):
    """Splitting every initializer into a .data sidecar (the
    save_as_external_data layout) must be invisible to the parser: same
    arrays, same execution."""
    model, path = torch_export
    dst = tmp_path / "ext.onnx"
    externalize_initializers(path, dst)
    assert (tmp_path / "ext.onnx.data").is_file()

    base = read_initializers(path)
    ext = read_initializers(dst)
    assert set(base) == set(ext)
    for k in base:
        assert base[k].dtype == ext[k].dtype, k
        assert np.array_equal(base[k], ext[k]), k

    graph = read_graph(dst)
    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, (1, 3, 64, 64)).astype(np.float32)
    want = _torch_forward(model, x)
    got = run_graph(graph, {graph.inputs[0]: x})[graph.outputs[0]]
    assert np.abs(got - want).max() < 1e-4


def test_externalized_export_converts_and_verifies(torch_export, tmp_path):
    _, path = torch_export
    dst = tmp_path / "ext.onnx"
    externalize_initializers(path, dst)
    graph = read_graph(dst)
    arch = derive_arch(graph)
    assert arch.arch == "swin_unet" and arch.scale == 2
    params = swin_params_from_graph(graph)
    err = verify_swin_conversion(graph, arch, params)
    assert err < 1e-4


def test_external_data_missing_sidecar_fails_loud(torch_export, tmp_path):
    """An .onnx shipped WITHOUT its .data sibling must raise the named
    external-data error telling the user which file to ship — not a
    generic corrupt-protobuf error and not an empty tensor."""
    _, path = torch_export
    dst = tmp_path / "orphan.onnx"
    externalize_initializers(path, dst)
    (tmp_path / "orphan.onnx.data").unlink()
    with pytest.raises(OnnxExternalDataError, match="orphan.onnx.data"):
        read_graph(dst)
    with pytest.raises(OnnxExternalDataError, match="orphan.onnx.data"):
        read_initializers(dst)


def test_external_data_traversal_rejected(torch_export, tmp_path):
    """location entries that escape the model directory are rejected
    (the onnx spec requires locations relative to the model file)."""
    _, path = torch_export
    sub = tmp_path / "sub"
    sub.mkdir()
    dst = sub / "evil.onnx"
    externalize_initializers(path, dst, location="../evil.data")
    assert (tmp_path / "evil.data").is_file()  # written, but unreachable
    with pytest.raises(OnnxExternalDataError, match="escapes"):
        read_graph(dst)


def test_external_data_short_file_fails_loud(torch_export, tmp_path):
    _, path = torch_export
    dst = tmp_path / "short.onnx"
    externalize_initializers(path, dst)
    data = tmp_path / "short.onnx.data"
    data.write_bytes(data.read_bytes()[: data.stat().st_size // 2])
    with pytest.raises(OnnxExternalDataError, match="short"):
        read_graph(dst)


def test_external_data_threshold_keeps_small_tensors_inline(torch_export,
                                                            tmp_path):
    """The onnx.save_model size_threshold convention: only tensors at or
    above the threshold move out; small ones stay inline (mixed
    artifacts are the common real-world layout)."""
    _, path = torch_export
    dst = tmp_path / "mixed.onnx"
    externalize_initializers(path, dst, threshold_bytes=1024)
    base = read_initializers(path)
    ext = read_initializers(dst)
    assert set(base) == set(ext)
    for k in base:
        assert np.array_equal(base[k], ext[k]), k


# ---------------------------------------------------------------------------
# fp16 initializer storage
# ---------------------------------------------------------------------------


def test_fp16_artifact_full_loop(torch_export, tmp_path):
    """An fp16-weights artifact (model.half() export layout) must parse
    (upcast exactly to fp32), execute, derive, convert, and VERIFY —
    the dtype-gated conversion steps must not silently skip half-stored
    tensors."""
    model, path = torch_export
    dst = tmp_path / "half.onnx"
    quantize_initializers_fp16(path, dst)
    graph = read_graph(dst)
    assert graph.had_fp16
    for k, v in graph.initializers.items():
        assert v.dtype != np.float16, k

    arch = derive_arch(graph)
    assert arch.arch == "swin_unet" and arch.scale == 2
    params = swin_params_from_graph(graph)
    # verification ground truth is the artifact's own (upcast) graph —
    # conversion must reproduce IT, not the pre-quantization weights
    err = verify_swin_conversion(graph, arch, params)
    assert err < 1e-4

    # vs the original torch forward only the fp16 weight rounding
    # remains: ~1e-3 scale, NOT the 1e-4 fidelity gate
    rng = np.random.default_rng(1)
    x = rng.uniform(0.0, 1.0, (1, 3, 64, 64)).astype(np.float32)
    want = _torch_forward(model, x)
    got = run_graph(graph, {graph.inputs[0]: x})[graph.outputs[0]]
    assert np.abs(got - want).max() < 5e-2


def test_fp16_cast_nodes_normalized(tmp_path):
    """Explicit Cast-to-fp16 nodes (fp32-I/O half exports insert them at
    the boundaries) are rewritten to fp32 casts so the executor never
    drops to half precision mid-graph."""
    from waifu2x_tensorrt_tpu.models.onnx_build import (
        node_proto,
        write_model,
    )

    w = np.full((4,), 0.5, np.float16)
    nodes = [
        node_proto("Cast", ["x"], ["xh"], to=10),
        node_proto("Add", ["xh", "w"], ["yh"]),
        node_proto("Cast", ["yh"], ["y"], to=1),
    ]
    path = write_model(nodes, {"w": w}, ["x"], ["y"],
                       tmp_path / "casts.onnx")
    graph = read_graph(path)
    assert graph.had_fp16
    assert all(int(n.attrs.get("to", 1)) != 10 for n in graph.nodes
               if n.op_type == "Cast")
    x = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    y = run_graph(graph, {"x": x})["y"]
    assert y.dtype == np.float32
    assert np.allclose(y, x + 0.5)


def test_fp16_external_combo(torch_export, tmp_path):
    """fp16 storage AND external data together (the realistic big-model
    release layout): both rewrites compose."""
    _, path = torch_export
    half = tmp_path / "half.onnx"
    quantize_initializers_fp16(path, half)
    dst = tmp_path / "half_ext.onnx"
    externalize_initializers(half, dst)
    graph = read_graph(dst)
    assert graph.had_fp16
    params = swin_params_from_graph(graph)
    err = verify_swin_conversion(graph, derive_arch(graph), params)
    assert err < 1e-4


# ---------------------------------------------------------------------------
# constant-folded (onnxsim/dynamo-style) graphs
# ---------------------------------------------------------------------------


def test_folded_export_round_trips(torch_export, tmp_path):
    """Constant-folding a real torch-tracer export (collapsing its
    Constant nodes and static arithmetic) must leave execution
    bit-identical and strictly shrink the node count."""
    from waifu2x_tensorrt_tpu.models.onnx_build import fold_model

    model, path = torch_export
    dst = tmp_path / "folded.onnx"
    fold_model(path, dst)
    base = read_graph(path)
    graph = read_graph(dst)
    assert len(graph.nodes) < len(base.nodes)
    assert not any(n.op_type == "Constant" for n in graph.nodes)

    rng = np.random.default_rng(2)
    x = rng.uniform(0.0, 1.0, (1, 3, 64, 64)).astype(np.float32)
    want = _torch_forward(model, x)
    got = run_graph(graph, {graph.inputs[0]: x})[graph.outputs[0]]
    assert np.abs(got - want).max() < 1e-4


def test_folded_export_converts_and_verifies(torch_export, tmp_path):
    from waifu2x_tensorrt_tpu.models.onnx_build import fold_model

    _, path = torch_export
    dst = tmp_path / "folded.onnx"
    fold_model(path, dst)
    graph = read_graph(dst)
    arch = derive_arch(graph)
    assert arch.arch == "swin_unet" and arch.scale == 2
    params = swin_params_from_graph(graph)
    err = verify_swin_conversion(graph, arch, params)
    assert err < 1e-4


def test_fold_collapses_static_shape_chains(tmp_path):
    """A static-geometry export's Shape->Gather->...->Reshape chain must
    fold to a constant Reshape target (the dynamo/onnxsim idiom: no
    shape ops survive when the input geometry is declared static)."""
    from torch_mirror import export_torch_swin as _exp

    # static_batch=True would be ideal but the mirror exports dynamic
    # batch; author a tiny static graph instead
    from waifu2x_tensorrt_tpu.models.onnx_build import (
        _int_field,
        _len_field,
        node_proto,
        tensor_proto,
    )
    from waifu2x_tensorrt_tpu.models.onnx_graph import fold_constants

    nodes = [
        node_proto("Shape", ["x"], ["shp"]),
        node_proto("Gather", ["shp", "zero"], ["n"], axis=0),
        node_proto("Unsqueeze", ["n", "zaxes"], ["n1"]),
        node_proto("Concat", ["n1", "rest"], ["tgt"], axis=0),
        node_proto("Reshape", ["x", "tgt"], ["y"]),
    ]
    inits = {
        "zero": np.asarray(0, np.int64),
        "zaxes": np.asarray([0], np.int64),
        "rest": np.asarray([48], np.int64),
    }
    from waifu2x_tensorrt_tpu.models.onnx_build import write_model

    path = write_model(nodes, inits, ["x"], ["y"], tmp_path / "shapes.onnx")
    # write_model emits no input shape info; inject the static shape the
    # way a static trace declares it
    graph = read_graph(path)
    graph.input_shapes["x"] = (2, 4, 12)
    folded = fold_constants(graph)
    assert folded >= 4
    ops = [n.op_type for n in graph.nodes]
    assert ops == ["Reshape"], ops
    x = np.arange(2 * 4 * 12, dtype=np.float32).reshape(2, 4, 12)
    got = run_graph(graph, {"x": x})["y"]
    assert got.shape == (2, 48)


def test_fold_then_fp16_then_external_compose(torch_export, tmp_path):
    """The full adversarial stack: fold + fp16 storage + external data —
    the acceptance path must survive all three at once."""
    from waifu2x_tensorrt_tpu.models.onnx_build import fold_model

    _, path = torch_export
    folded = tmp_path / "f.onnx"
    fold_model(path, folded)
    half = tmp_path / "fh.onnx"
    quantize_initializers_fp16(folded, half)
    dst = tmp_path / "fhe.onnx"
    externalize_initializers(half, dst)
    graph = read_graph(dst)
    assert graph.had_fp16
    params = swin_params_from_graph(graph)
    err = verify_swin_conversion(graph, derive_arch(graph), params)
    assert err < 1e-4


# ---------------------------------------------------------------------------
# validate.py triage
# ---------------------------------------------------------------------------


def test_validate_triages_missing_external_data(torch_export, tmp_path,
                                                capsys):
    from waifu2x_tensorrt_tpu.models.validate import main as vmain

    _, path = torch_export
    dst = tmp_path / "orphan.onnx"
    externalize_initializers(path, dst)
    (tmp_path / "orphan.onnx.data").unlink()
    rc = vmain([str(dst), "--family", "swin_unet/art", "--scale", "2"])
    out = capsys.readouterr().out
    assert rc == 2
    assert "orphan.onnx.data" in out
    assert "triage" in out


def test_validate_passes_fp16_artifact(torch_export, tmp_path, capsys):
    from waifu2x_tensorrt_tpu.models.validate import main as vmain

    _, path = torch_export
    dst = tmp_path / "half.onnx"
    quantize_initializers_fp16(path, dst)
    rc = vmain([str(dst), "--family", "swin_unet/art", "--scale", "2",
                "--tile", "64"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "fp16" in out
    assert "OK: per-tile forward matches" in out
