"""Model-zoo tests: shape contracts, registry validation, numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waifu2x_tensorrt_tpu.models import (
    create_model,
    get_spec,
    model_file_stem,
)
from waifu2x_tensorrt_tpu.models.registry import (
    init_params,
    load_params,
    save_params,
    validate,
)


class TestRegistry:
    def test_validation_parity(self):
        # src/main.cpp:142-145
        with pytest.raises(ValueError, match="cunet/art does not support"):
            validate("cunet/art", 4, 0)
        with pytest.raises(ValueError, match="Noise level -1"):
            validate("swin_unet/art", 1, -1)
        validate("cunet/art", 2, -1)
        validate("swin_unet/photo", 4, 3)

    def test_file_stem_convention(self):
        # src/main.cpp:201-204: noise omitted when -1, scale omitted when 1
        assert model_file_stem(2, 1) == "noise1_scale2x"
        assert model_file_stem(2, -1) == "scale2x"
        assert model_file_stem(1, 3) == "noise3"
        assert model_file_stem(4, 0) == "noise0_scale4x"

    def test_specs(self):
        assert get_spec("cunet/art", 1, 0).output_tile(256) == 200
        assert get_spec("cunet/art", 2, 0).output_tile(256) == 440
        assert get_spec("swin_unet/art", 4, 0).output_tile(256) == 1024
        assert get_spec("swin_unet/art", 2, 0).output_tile(400) == 800

    def test_param_roundtrip(self, tmp_path):
        module, _ = create_model("cunet/art", 1, 0)
        params = init_params(module, tile=64)
        save_params(tmp_path / "w.npz", params)
        loaded = load_params(tmp_path / "w.npz")
        from waifu2x_tensorrt_tpu.models.registry import _flatten

        fa, fb = _flatten(params), _flatten(loaded)
        assert sorted(fa) == sorted(fb)
        for k in fa:
            np.testing.assert_array_equal(fa[k], fb[k])


@pytest.mark.parametrize(
    "family,scale,tile",
    [
        ("cunet/art", 1, 64),
        ("cunet/art", 2, 64),
        ("swin_unet/art", 1, 64),
        ("swin_unet/art", 2, 64),
        ("swin_unet/art", 4, 64),
    ],
)
def test_output_shape_contract(family, scale, tile):
    module, spec = create_model(family, scale, 0)
    params = init_params(module, tile=tile)
    x = jnp.ones((2, tile, tile, 3), jnp.float32) * 0.5
    y = module.apply({"params": params}, x)
    out = spec.output_tile(tile)
    assert y.shape == (2, out, out, 3)
    assert y.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(y)))
    # clamp active
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_swin_non_multiple_of_32():
    """Tile 400 (the one CLI size not divisible by 32) must work via
    internal pad+crop."""
    module, spec = create_model("swin_unet/art", 2, -1)
    params = init_params(module, tile=64)
    x = jnp.ones((1, 72, 40, 3), jnp.float32) * 0.3  # multiples of 8, not 32
    y = module.apply({"params": params}, x)
    assert y.shape == (1, 144, 80, 3)


def test_bf16_close_to_fp32():
    module32, _ = create_model("swin_unet/art", 2, -1)
    module16, _ = create_model("swin_unet/art", 2, -1, dtype=jnp.bfloat16)
    params = init_params(module32, tile=32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    y32 = module32.apply({"params": params}, x)
    y16 = module16.apply({"params": params}, x)
    assert y16.dtype == jnp.bfloat16
    err = float(jnp.max(jnp.abs(y32 - y16.astype(jnp.float32))))
    assert err < 0.25  # random-init activations; loose sanity bound


def test_cunet_translation_equivariance_modulo_se():
    """Valid-conv cunet is translation-equivariant except for its SE blocks
    (whose global pooling depends on the window — inherent to the upstream
    architecture, same behavior through the reference's ONNX). With SE fc
    weights zeroed (gate = sigmoid(0) = 0.5 everywhere) the remaining
    network must be exactly equivariant — validating the valid-conv /
    crop/skip arithmetic."""
    module, spec = create_model("cunet/art", 1, 0)
    params = init_params(module, tile=64)

    def zero_se(tree):
        if isinstance(tree, dict):
            return {
                k: (jax.tree_util.tree_map(jnp.zeros_like, v)
                    if k == "se" else zero_se(v))
                for k, v in tree.items()
            }
        return tree

    params = zero_se(params)
    rng = np.random.default_rng(1)
    big = jnp.asarray(rng.random((1, 80, 80, 3), np.float32))
    y_full = module.apply({"params": params}, big)  # (1, 24, 24, 3)
    sub = big[:, 8:72, 8:72, :]  # shifted 64x64 window
    y_sub = module.apply({"params": params}, sub)  # (1, 8, 8, 3)
    np.testing.assert_allclose(
        np.asarray(y_full[:, 8:16, 8:16, :]), np.asarray(y_sub), atol=2e-5
    )


def test_swin_shift_mask_blocks_cross_region():
    """Shifted-window attention must not mix tokens across the cyclic-shift
    boundary: a constant image region should stay constant."""
    from waifu2x_tensorrt_tpu.models.swin_unet import _shift_attn_mask

    m = _shift_attn_mask(16, 16, 8, 4)
    assert m.shape == (4, 64, 64)
    # first window (interior) has no masking
    assert np.all(m[0] == 0)
    # boundary windows do
    assert np.any(m[-1] < 0)


def test_shuffle_via_deconv_is_equivalent():
    """The stride-2 deconv form of the decoder ups (layout experiment,
    swin_unet._dense_shuffle_as_deconv) is the SAME math as
    Dense + pixel-shuffle over the identical parameter tree."""
    import jax.numpy as jnp
    import jax.tree_util as tu

    from waifu2x_tensorrt_tpu.models.registry import init_params
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    m1 = SwinUNet(scale=2, base_dim=32, depths=(2, 2, 2, 2, 2),
                  dtype=jnp.float32)
    m2 = SwinUNet(scale=2, base_dim=32, depths=(2, 2, 2, 2, 2),
                  dtype=jnp.float32, shuffle_via_deconv=True)
    p = init_params(m1, tile=32)
    assert (tu.tree_structure(p)
            == tu.tree_structure(init_params(m2, tile=32)))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 32, 48, 3)).astype(np.float32))
    y1 = np.asarray(m1.apply({"params": p}, x))
    y2 = np.asarray(m2.apply({"params": p}, x))
    assert np.abs(y1 - y2).max() < 1e-5


@pytest.mark.parametrize("scale", [1, 2])
def test_cunet_ct_as_shuffle_is_equivalent(scale):
    """The GEMM+depth-to-space form of cunet's k2s2 transposed convs
    (models/cunet.py::_CT2x2Shuffle) computes the same sums over the
    identical parameter tree; residual fp32 reassociation drift stays an
    order of magnitude below the u8 output quantization step (1/255)."""
    import jax.numpy as jnp
    import jax.tree_util as tu

    from waifu2x_tensorrt_tpu.models.registry import (
        create_model,
        init_params,
    )

    m1, _ = create_model("cunet/art", scale, 1, dtype=jnp.float32)
    m2, _ = create_model("cunet/art", scale, 1, dtype=jnp.float32,
                         ct_as_shuffle=True)
    p = init_params(m1, tile=80)
    assert (tu.tree_structure(p)
            == tu.tree_structure(init_params(m2, tile=80)))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 80, 80, 3)).astype(np.float32))
    y1 = np.asarray(m1.apply({"params": p}, x))
    y2 = np.asarray(m2.apply({"params": p}, x))
    assert y1.shape == y2.shape
    assert np.abs(y1 - y2).max() < 4e-4  # 1/255 = 3.9e-3


def test_head_via_deconv_is_equivalent():
    """The stride-r transposed-conv form of the head sub-pixel conv
    (swin_unet._conv_shuffle_as_deconv) is the SAME math as
    Conv3x3 + clamp + pixel-shuffle over the identical parameter tree,
    for both scales."""
    import jax.numpy as jnp
    import jax.tree_util as tu

    from waifu2x_tensorrt_tpu.models.registry import init_params
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    for scale in (2, 4):
        m1 = SwinUNet(scale=scale, base_dim=32, depths=(2, 2, 2, 2, 2),
                      dtype=jnp.float32)
        m2 = SwinUNet(scale=scale, base_dim=32, depths=(2, 2, 2, 2, 2),
                      dtype=jnp.float32, head_via_deconv=True)
        p = init_params(m1, tile=32)
        assert (tu.tree_structure(p)
                == tu.tree_structure(init_params(m2, tile=32)))
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (2, 32, 48, 3)).astype(np.float32))
        y1 = np.asarray(m1.apply({"params": p}, x))
        y2 = np.asarray(m2.apply({"params": p}, x))
        assert y1.shape == y2.shape
        assert np.abs(y1 - y2).max() < 1e-5


def test_lane_pad_is_equivalent():
    """lane_pad zero-pads the full-res stem/skip/head-input channels at
    trace time (swin_unet._lane_padded_conv): the padded channels carry
    exact zeros, so the output matches the unpadded model over the
    identical parameter tree — across head variants and scales."""
    import jax.numpy as jnp
    import jax.tree_util as tu

    from waifu2x_tensorrt_tpu.models.registry import init_params
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 32, 48, 3)).astype(np.float32))
    for scale, kw in (
        (4, {}),
        (2, {"shuffle_via_deconv": True}),
        (4, {"shuffle_via_deconv": True, "head_via_deconv": True}),
        (1, {}),
    ):
        m1 = SwinUNet(scale=scale, base_dim=32, depths=(2, 2, 2, 2, 2),
                      dtype=jnp.float32, **kw)
        m2 = SwinUNet(scale=scale, base_dim=32, depths=(2, 2, 2, 2, 2),
                      dtype=jnp.float32, lane_pad=64, **kw)
        p = init_params(m1, tile=32)
        assert (tu.tree_structure(p)
                == tu.tree_structure(init_params(m2, tile=32)))
        y1 = np.asarray(m1.apply({"params": p}, x))
        y2 = np.asarray(m2.apply({"params": p}, x))
        assert y1.shape == y2.shape
        assert np.abs(y1 - y2).max() < 1e-5, (scale, kw)


def test_lane_pad_rejects_packed_heads():
    import jax.numpy as jnp
    import pytest

    from waifu2x_tensorrt_tpu.models.registry import init_params
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

    m = SwinUNet(scale=4, base_dim=32, depths=(2, 2, 2, 2, 2),
                 dtype=jnp.float32, lane_pad=64, packed_head=True)
    with pytest.raises(ValueError, match="lane_pad"):
        init_params(m, tile=32)
