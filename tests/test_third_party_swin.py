"""Third-party cross-check: our SwinBlock vs transformers' SwinLayer.

Every other fidelity arrow in this repo (flax modules, torch mirror, ONNX
writer/parser/executors) was authored here; HuggingFace transformers'
Swin-v1 implementation is independent third-party code implementing the
same published construction nunif's swin_unet uses (shifted windows,
relative position bias, pre-norm, exact-erf GELU). Byte-level agreement
with it pins that our window partition order, relative-position index
construction, cyclic-shift direction, and attention mask are the STANDARD
Swin semantics — not a self-consistent invention.

Reference analogue: the reference trusts nvonnxparser + TensorRT to
implement the artifact's ops correctly (img2img_build.cpp:88); this test
is the rebuild's equivalent outside-evidence for the op semantics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from waifu2x_tensorrt_tpu.models.swin_unet import (  # noqa: E402
    SwinBlock,
    _relative_position_index,
)


def _swin_layer(dim, heads, shift, hw):
    from transformers import SwinConfig
    from transformers.models.swin.modeling_swin import SwinLayer

    config = SwinConfig(
        window_size=8,
        mlp_ratio=2.0,  # nunif swin_unet uses 2x MLP expansion
        qkv_bias=True,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
        hidden_act="gelu",  # exact erf form, like nn.gelu(approximate=False)
        layer_norm_eps=1e-5,
    )
    return SwinLayer(config, dim=dim, input_resolution=hw, num_heads=heads,
                     shift_size=shift).eval()


def _copy_flax_into_torch(layer, params, dim):
    """Load the flax SwinBlock params into the transformers SwinLayer."""
    t = lambda a: torch.from_numpy(  # noqa: E731
        np.array(a, np.float32, copy=True))
    qkv_k = np.asarray(params["attn"]["qkv"]["kernel"])   # (C, 3C)
    qkv_b = np.asarray(params["attn"]["qkv"]["bias"])     # (3C,)
    with torch.no_grad():
        layer.layernorm_before.weight.copy_(t(params["norm1"]["scale"]))
        layer.layernorm_before.bias.copy_(t(params["norm1"]["bias"]))
        # flax fuses qkv as (C, 3C) column blocks q|k|v; torch Linear
        # weights are (out, in)
        sa = layer.attention.self
        sa.query.weight.copy_(t(qkv_k[:, :dim].T))
        sa.key.weight.copy_(t(qkv_k[:, dim:2 * dim].T))
        sa.value.weight.copy_(t(qkv_k[:, 2 * dim:].T))
        sa.query.bias.copy_(t(qkv_b[:dim]))
        sa.key.bias.copy_(t(qkv_b[dim:2 * dim]))
        sa.value.bias.copy_(t(qkv_b[2 * dim:]))
        sa.relative_position_bias_table.copy_(
            t(params["attn"]["relative_position_bias"]))
        layer.attention.output.dense.weight.copy_(
            t(np.asarray(params["attn"]["proj"]["kernel"]).T))
        layer.attention.output.dense.bias.copy_(
            t(params["attn"]["proj"]["bias"]))
        layer.layernorm_after.weight.copy_(t(params["norm2"]["scale"]))
        layer.layernorm_after.bias.copy_(t(params["norm2"]["bias"]))
        layer.intermediate.dense.weight.copy_(
            t(np.asarray(params["mlp_fc1"]["kernel"]).T))
        layer.intermediate.dense.bias.copy_(t(params["mlp_fc1"]["bias"]))
        layer.output.dense.weight.copy_(
            t(np.asarray(params["mlp_fc2"]["kernel"]).T))
        layer.output.dense.bias.copy_(t(params["mlp_fc2"]["bias"]))


def test_relative_position_index_matches_transformers():
    """Our index construction == transformers' registered buffer: the
    ((2ws-1)^2, nh) bias table converted from a real artifact is consumed
    with the same gather order the upstream torch model used."""
    layer = _swin_layer(32, 2, 0, (16, 16))
    theirs = layer.attention.self.relative_position_index.numpy()
    ours = _relative_position_index(8)
    np.testing.assert_array_equal(ours.reshape(theirs.shape), theirs)


@pytest.mark.parametrize("shift", [0, 4])
def test_swin_block_matches_transformers_swinlayer(shift):
    """Same weights, same input: flax SwinBlock (window 8, pre-norm, 2x
    MLP) == transformers SwinLayer to fp32 tolerance, for both the plain
    and the cyclic-shifted (masked-attention) block."""
    dim, heads, hw = 32, 2, (16, 16)
    module = SwinBlock(dim=dim, num_heads=heads, shift=shift,
                       dtype=jnp.float32)
    rng = np.random.default_rng(20 + shift)
    x = rng.standard_normal((1, *hw, dim), np.float32)
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    ours = np.asarray(module.apply({"params": params}, jnp.asarray(x)))

    layer = _swin_layer(dim, heads, shift, hw)
    _copy_flax_into_torch(layer, params, dim)
    with torch.no_grad():
        theirs = layer(torch.from_numpy(x.reshape(1, -1, dim)), hw)[0]
    theirs = theirs.numpy().reshape(ours.shape)

    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-5)
