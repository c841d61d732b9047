"""ONNX round-trip fidelity tests (SURVEY.md §7 step 2).

No upstream release artifacts exist in this sandbox, so the loop is closed
with export-like graphs (models/onnx_build.py): serialize the upstream
architecture to a real ONNX protobuf, parse it back (models/onnx_graph.py),
execute it with the numpy executor, and require the flax model with
*converted* weights to match. A fault in the protobuf writer, the parser,
the executor ops, the weight converter, or the flax forward fails the
round trip — replacing round 1's circular torch-mirror-only proof.

When real artifacts are available, drop them under models/<family>/ and
``test_real_artifact_matches_flax`` validates them with the same executor.
"""

from pathlib import Path

import numpy as np
import pytest

from waifu2x_tensorrt_tpu.models.convert import (
    cunet_from_onnx,
    cunet_mapping,
    state_from_flax,
    swin_from_torch,
    swin_mapping,
)
from waifu2x_tensorrt_tpu.models.onnx_build import (
    build_cunet_onnx,
    build_swin_onnx,
)
from waifu2x_tensorrt_tpu.models.onnx_graph import (
    read_graph,
    run_graph,
    summarize,
)
from waifu2x_tensorrt_tpu.models.onnx_reader import read_initializers
from waifu2x_tensorrt_tpu.models.registry import _flatten, init_params


# the inverse transforms live in the package now (convert.state_from_flax,
# also used by load-time artifact verification); tests keep this alias
_torch_state_from_flax = state_from_flax


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=path)


@pytest.mark.parametrize("scale", [1, 2])
def test_cunet_onnx_roundtrip_matches_flax(tmp_path, scale):
    import jax.numpy as jnp

    from waifu2x_tensorrt_tpu.models.registry import create_model

    module, spec = create_model("cunet/art", scale, 1)
    params = init_params(module, tile=64)
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    state = _torch_state_from_flax(flat, cunet_mapping(scale))

    f = build_cunet_onnx(state, scale, tmp_path / f"cunet{scale}.onnx")

    # converter round trip: ONNX initializers -> flax tree, bit-exact
    back = cunet_from_onnx(f, scale)
    _tree_equal(params, back)

    # executed graph == flax forward (fp32, <=1e-3 per SURVEY §7 step 2;
    # observed ~1e-5)
    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 0.9, (1, 3, 64, 64)).astype(np.float32)
    got = run_graph(read_graph(f), {"x": x})["y"]
    flax_out = np.asarray(
        module.apply({"params": params},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    assert got.shape == flax_out.shape
    assert np.abs(got - flax_out).max() < 1e-4


@pytest.mark.parametrize("scale,base_dim,depths", [
    (2, 32, (2, 2, 2, 2, 2)),        # small: fast, both shifted stages
    (4, 96, (2, 2, 6, 2, 2)),        # the real swin_unet configuration
])
def test_swin_onnx_roundtrip_matches_flax(tmp_path, scale, base_dim, depths):
    import jax.numpy as jnp

    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    module = SwinUNet(scale=scale, base_dim=base_dim, depths=depths,
                      dtype=jnp.float32)
    params = init_params(module, tile=32)
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    mapping = swin_mapping(scale, depths)
    state = _torch_state_from_flax(flat, mapping)

    f = build_swin_onnx(state, scale, (32, 32),
                        tmp_path / f"swin{scale}.onnx",
                        base_dim=base_dim, depths=depths)

    # converter round trip through the serialized initializers
    back = swin_from_torch(read_initializers(f), scale, depths)
    _tree_equal(params, back)

    rng = np.random.default_rng(1)
    x = rng.uniform(0.1, 0.9, (1, 3, 32, 32)).astype(np.float32)
    got = run_graph(read_graph(f), {"x": x})["y"]
    flax_out = np.asarray(
        module.apply({"params": params},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    assert got.shape == (1, 3, 32 * scale, 32 * scale)
    assert np.abs(got - flax_out).max() < 1e-4


def test_graph_summary_fingerprint(tmp_path):
    """summarize() exposes the topology fingerprint used to diff a real
    export against the reconstruction."""
    import jax.numpy as jnp

    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    module = SwinUNet(scale=2, base_dim=32, depths=(2, 2, 2, 2, 2),
                      dtype=jnp.float32)
    params = init_params(module, tile=32)
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    state = _torch_state_from_flax(flat, swin_mapping(2, (2, 2, 2, 2, 2)))
    f = build_swin_onnx(state, 2, (32, 32), tmp_path / "s.onnx",
                        base_dim=32, depths=(2, 2, 2, 2, 2))
    s = summarize(read_graph(f))
    assert s["inputs"] == ["x"] and s["outputs"] == ["y"]
    ops = s["op_histogram"]
    # structural invariants of the swin_unet export
    assert ops["LayerNormalization"] == 2 * 6   # 2 LN per block, 6 blocks
    assert ops["Softmax"] == 6                  # 1 attention per block
    assert ops["Erf"] == 6                      # exact-GELU MLP per block
    assert ops["DepthToSpace"] == 3             # up2, up1, head
    assert ops["Conv"] == 5                     # stem x2, down x2, to_image
    n_leaves = len(flat)
    assert s["n_initializers"] >= n_leaves


def test_real_artifact_matches_flax():
    """When a real release ONNX export is present (models/<family>/*.onnx),
    validate it end-to-end with the executor. Skipped in sandboxes without
    artifacts (zero egress)."""
    artifacts = sorted(Path("models").glob("**/*.onnx"))
    if not artifacts:
        pytest.skip("no real ONNX artifacts in models/ (zero-egress sandbox)")
    # Executor vs converted-weights flax forward, per artifact.
    import jax.numpy as jnp

    from waifu2x_tensorrt_tpu.models.registry import create_model

    for f in artifacts:
        family = f"{f.parent.parent.name}/{f.parent.name}"
        stem = f.stem  # [noise{N}_][scale{S}x]
        noise = int(stem.split("noise")[1][0]) if "noise" in stem else -1
        scale = int(stem.split("scale")[1][0]) if "scale" in stem else 1
        graph = read_graph(f)
        module, spec = create_model(family, scale, noise)
        if family.startswith("cunet"):
            params = cunet_from_onnx(f, scale)
        else:
            params = swin_from_torch(graph.initializers, scale)
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
        got = run_graph(graph, {graph.inputs[0]: x})[graph.outputs[0]]
        flax_out = np.asarray(
            module.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        ).transpose(0, 3, 1, 2)
        assert np.abs(got - flax_out).max() < 1e-3, family


def test_read_graph_rejects_non_onnx_files(tmp_path):
    """Corrupt/foreign files must fail with a clear ValueError at parse
    time (the nvonnxparser-failure analogue), not an empty graph that
    dies later in derive_arch, nor a leaked IndexError."""
    import pytest

    from waifu2x_tensorrt_tpu.models.onnx_graph import read_graph

    cases = {
        "empty.onnx": b"",
        "image.onnx": b"\x89PNG\r\n\x1a\n" + b"\x00" * 500,
        "garbage.onnx": bytes(range(256)) * 40,
        "truncated.onnx": b"\x3a\xff\xff\xff\xff\xff\xff",
        # graph->node->attribute with a float field truncated mid-fixed32:
        # struct.unpack must not leak a raw struct.error
        "cut_float.onnx": b"\x3a\x07\x0a\x05\x2a\x03\x15\x00\x00",
        # initializer raw_data whose length is not a multiple of 4
        "odd_floats.onnx": b"\x3a\x0b\x2a\x09\x08\x01\x4a\x05"
                           b"\x00\x00\x80\x3f\x00",
    }
    for name, data in cases.items():
        p = tmp_path / name
        p.write_bytes(data)
        with pytest.raises(ValueError,
                           match="ModelProto|no graph nodes"):
            read_graph(p)


def _one_node_graph(node, inputs, outputs, initializers=None):
    from waifu2x_tensorrt_tpu.models.onnx_graph import OnnxGraph

    return OnnxGraph("t", [node], initializers or {}, list(inputs),
                     list(outputs))


def test_split_honors_opset11_sizes_attribute():
    """Opset <= 12 carries unequal split sizes as an ATTRIBUTE (newer
    opsets pass them as a second input); an equal-split fallback would be
    silently wrong whenever the axis length divides evenly."""
    from waifu2x_tensorrt_tpu.models.onnx_graph import OnnxNode, run_graph

    x = np.arange(2 * 6, dtype=np.float32).reshape(2, 6)
    node = OnnxNode("Split", ["x"], ["a", "b"],
                    attrs={"axis": 1, "split": [2, 4]})
    out = run_graph(_one_node_graph(node, ["x"], ["a", "b"]), {"x": x})
    np.testing.assert_array_equal(out["a"], x[:, :2])
    np.testing.assert_array_equal(out["b"], x[:, 2:])


def test_unsqueeze_multiple_negative_axes():
    """Spec: axes index the OUTPUT rank. [-1, -2] on a (3,) tensor is
    (3, 1, 1) — sorting raw negatives produced (1, 3, 1)."""
    from waifu2x_tensorrt_tpu.models.onnx_graph import OnnxNode, run_graph

    x = np.arange(3, dtype=np.float32)
    node = OnnxNode("Unsqueeze", ["x"], ["y"], attrs={"axes": [-1, -2]})
    out = run_graph(_one_node_graph(node, ["x"], ["y"]), {"x": x})
    assert out["y"].shape == (3, 1, 1)
    np.testing.assert_array_equal(out["y"].reshape(-1), x)


def test_average_pool_defaults_and_guards():
    """ONNX defaults strides to 1 (which overlaps windows — unsupported by
    the stride-block reshape and must RAISE, not average the wrong
    window); the non-overlapping form stays exact."""
    from waifu2x_tensorrt_tpu.models.onnx_graph import OnnxNode, run_graph

    x = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    ok = OnnxNode("AveragePool", ["x"], ["y"],
                  attrs={"kernel_shape": [2, 2], "strides": [2, 2]})
    out = run_graph(_one_node_graph(ok, ["x"], ["y"]), {"x": x})
    np.testing.assert_allclose(
        out["y"], x.reshape(1, 1, 2, 2, 2, 2).mean(axis=(3, 5)))

    for attrs in ({"kernel_shape": [3, 3]},  # default stride 1: overlap
                  {"kernel_shape": [2, 2], "strides": [2, 2],
                   "pads": [1, 1, 1, 1]},
                  {"kernel_shape": [2, 2], "strides": [2, 2],
                   "ceil_mode": 1}):
        bad = OnnxNode("AveragePool", ["x"], ["y"], attrs=dict(attrs))
        with pytest.raises(NotImplementedError):
            run_graph(_one_node_graph(bad, ["x"], ["y"]), {"x": x})


def test_parse_tensor_negative_int64_varints():
    """int64_data varints are two's-complement: a -1 Reshape target must
    parse as -1, not 2**64-1 (which overflowed np.int64)."""
    from waifu2x_tensorrt_tpu.models.onnx_reader import _parse_tensor

    # TensorProto: dims=[2] (field 1), data_type=7 int64 (field 2),
    # int64_data=[-1, 12] packed (field 7, wire 2)
    neg1 = bytes([0xFF] * 9 + [0x01])  # varint encoding of -1
    payload = neg1 + bytes([12])
    buf = (bytes([0x08, 0x02])          # dims: 2
           + bytes([0x10, 0x07])        # data_type: INT64
           + bytes([0x3A, len(payload)]) + payload)
    name, arr = _parse_tensor(buf)
    assert arr.dtype == np.int64
    np.testing.assert_array_equal(arr, [-1, 12])


def test_parse_attribute_proto3_zero_scalars():
    """proto3-toolchain writers omit zero-valued scalars; the declared
    AttributeProto.type must recover axis=0 / min=0.0 instead of None."""
    from waifu2x_tensorrt_tpu.models.onnx_graph import _parse_attribute

    # AttributeProto: name="axis" (field 1), type=INT (field 20, value 2),
    # NO i field — the zero was omitted
    buf = bytes([0x0A, 0x04]) + b"axis" + bytes([0xA0, 0x01, 0x02])
    assert _parse_attribute(buf) == ("axis", 0)
    # name="min", type=FLOAT (1), no f field
    buf = bytes([0x0A, 0x03]) + b"min" + bytes([0xA0, 0x01, 0x01])
    assert _parse_attribute(buf) == ("min", 0.0)


def test_run_graph_jax_convs_keep_compute_dtype():
    """The jax serving path must run convolutions in the incoming compute
    dtype — a hard f32 cast would silently void the documented bf16 MXU
    rate for conv-only (cunet) artifacts."""
    import jax.numpy as jnp

    from waifu2x_tensorrt_tpu.models.onnx_graph import _conv

    x = jnp.ones((1, 3, 8, 8), jnp.bfloat16)
    w = jnp.ones((4, 3, 3, 3), jnp.bfloat16)
    y = _conv(x, w, None, {"pads": [1, 1, 1, 1]}, xp=jnp)
    assert y.dtype == jnp.bfloat16
    # ground-truth numpy path stays fp32
    y32 = _conv(np.ones((1, 3, 8, 8), np.float32),
                np.ones((4, 3, 3, 3), np.float32), None,
                {"pads": [1, 1, 1, 1]})
    assert y32.dtype == np.float32
