"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waifu2x_tensorrt_tpu.ops.window_attention import (
    _mask_from_flags,
    fused_window_attention,
    window_attention_reference,
)
from waifu2x_tensorrt_tpu.models.swin_unet import (
    _shift_attn_mask,
    _shift_flags,
)


def _rand_qkv(bw=12, nh=3, n=64, hd=32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((bw, nh, n, hd)), jnp.float32)
    q, k, v = mk(), mk(), mk()
    bias = jnp.asarray(rng.standard_normal((nh, n, n)), jnp.float32) * 0.1
    return q, k, v, bias


def test_analytic_mask_matches_region_mask():
    """The flag-based analytic mask must equal the classical Swin region
    mask for every window of a shifted grid."""
    h = w = 24
    ws, shift = 8, 4
    ref = _shift_attn_mask(h, w, ws, shift)  # (nW, N, N)
    flags = jnp.asarray(_shift_flags(h // ws, w // ws))
    got = np.asarray(_mask_from_flags(flags, ws, shift))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got < -1, ref < -1)


@pytest.mark.parametrize("shift", [0, 4])
def test_fused_matches_reference(shift):
    q, k, v, bias = _rand_qkv(bw=12)
    flags = jnp.asarray(np.tile(_shift_flags(2, 2), 3))  # 3 images, 2x2 grid
    ref = window_attention_reference(q, k, v, bias, flags, shift)
    got = fused_window_attention(
        q, k, v, bias, flags, shift=shift, block_windows=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_pads_ragged_window_count():
    q, k, v, bias = _rand_qkv(bw=10)  # not a multiple of block
    flags = jnp.zeros((10,), jnp.int32)
    ref = window_attention_reference(q, k, v, bias, flags, 0)
    got = fused_window_attention(
        q, k, v, bias, flags, shift=0, block_windows=4, interpret=True
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_swin_pallas_path_matches_dense():
    """Full model: use_pallas=True (interpret via CPU) == dense einsum path."""
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet
    from waifu2x_tensorrt_tpu.models.registry import init_params

    # interpret mode so it runs on CPU
    import waifu2x_tensorrt_tpu.ops.window_attention as wa
    import functools

    orig = wa.fused_window_attention_qkv

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    wa.fused_window_attention_qkv = interp
    try:
        m_dense = SwinUNet(scale=2, use_pallas=False)
        m_pallas = SwinUNet(scale=2, use_pallas=True)
        params = init_params(m_dense, tile=32)
        x = jnp.asarray(
            np.random.default_rng(0).random((1, 32, 32, 3)), jnp.float32
        )
        y0 = m_dense.apply({"params": params}, x)
        y1 = m_pallas.apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(y0), np.asarray(y1), atol=2e-5
        )
    finally:
        wa.fused_window_attention_qkv = orig


@pytest.mark.parametrize("shift", [0, 4])
def test_qkv_kernel_matches_reference(shift):
    """Packed-qkv kernel (v2 layout) == reference attention."""
    from waifu2x_tensorrt_tpu.ops.window_attention import (
        fused_window_attention_qkv,
    )

    bw, nh, n, hd = 12, 3, 64, 32
    c = nh * hd
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.standard_normal((bw, n, 3 * c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((nh, n, n)), jnp.float32) * 0.1
    flags = jnp.asarray(np.tile(_shift_flags(2, 2), 3))

    # unpack to reference layout (BW, nh, N, hd)
    def unpack(off):
        parts = [qkv[:, :, off * c + h * hd:off * c + (h + 1) * hd]
                 for h in range(nh)]
        return jnp.stack(parts, axis=1)  # (BW, nh, N, hd)

    q, k, v = unpack(0), unpack(1), unpack(2)
    ref = window_attention_reference(q, k, v, bias, flags, shift)
    got = fused_window_attention_qkv(
        qkv, bias, flags, num_heads=nh, shift=shift, block_windows=4,
        interpret=True,
    )
    # repack reference (BW, nh, N, hd) -> (BW, N, C)
    ref_packed = ref.transpose(0, 2, 1, 3).reshape(bw, n, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_packed),
                               atol=2e-5)
