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


def _patch_both_interpret(sb):
    """Force interpret mode on the fused-block entry point."""
    orig = sb.fused_swin_block

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    sb.fused_swin_block = interp
    return orig


def _restore_both(sb, orig):
    sb.fused_swin_block = orig


class TestFusedBlock:
    def _patch_interpret(self):
        import waifu2x_tensorrt_tpu.ops.swin_block as sb

        orig = _patch_both_interpret(sb)
        return sb, orig

    @pytest.mark.parametrize("shift", [0, 4])
    def test_fused_block_matches_dense(self, shift):
        """Whole-block fusion == dense SwinBlock (same params)."""
        from waifu2x_tensorrt_tpu.models.swin_unet import SwinBlock

        sb, orig = self._patch_interpret()
        try:
            dense = SwinBlock(96, 3, shift=shift)
            fused = SwinBlock(96, 3, shift=shift, fused_block=True)
            x = jnp.asarray(
                np.random.default_rng(0).random((2, 16, 16, 96)), jnp.float32
            )
            params = dense.init(jax.random.PRNGKey(0), x)["params"]
            y0 = dense.apply({"params": params}, x)
            y1 = fused.apply({"params": params}, x)
            np.testing.assert_allclose(
                np.asarray(y0), np.asarray(y1), atol=3e-5
            )
        finally:
            _restore_both(sb, orig)

    def test_param_trees_identical(self):
        """use_pallas=True and False must init IDENTICAL param trees
        (checkpoints interchange freely)."""
        from waifu2x_tensorrt_tpu.models.swin_unet import SwinBlock
        from waifu2x_tensorrt_tpu.models.registry import _flatten

        sb, orig = self._patch_interpret()
        try:
            x = jnp.zeros((1, 16, 16, 96), jnp.float32)
            pd = SwinBlock(96, 3).init(
                jax.random.PRNGKey(0), x)["params"]
            pp = SwinBlock(96, 3, fused_block=True).init(
                jax.random.PRNGKey(0), x)["params"]
            fd, fp = _flatten(pd), _flatten(pp)
            assert sorted(fd) == sorted(fp)
            for k in fd:
                assert fd[k].shape == fp[k].shape, k
                np.testing.assert_array_equal(fd[k], fp[k])  # same seed
        finally:
            _restore_both(sb, orig)

    def test_full_model_fused_matches_dense(self):
        from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet
        from waifu2x_tensorrt_tpu.models.registry import init_params
        import waifu2x_tensorrt_tpu.ops.window_attention as wa

        sb, orig = self._patch_interpret()
        worig = wa.fused_window_attention_qkv

        def winterp(*a, **kw):
            kw["interpret"] = True
            return worig(*a, **kw)

        wa.fused_window_attention_qkv = winterp
        try:
            m_dense = SwinUNet(scale=2, use_pallas=False)
            m_fused = SwinUNet(scale=2, use_pallas=True)
            params = init_params(m_dense, tile=32)
            x = jnp.asarray(
                np.random.default_rng(1).random((1, 32, 32, 3)), jnp.float32
            )
            y0 = m_dense.apply({"params": params}, x)
            y1 = m_fused.apply({"params": params}, x)
            np.testing.assert_allclose(
                np.asarray(y0), np.asarray(y1), atol=3e-5
            )
        finally:
            _restore_both(sb, orig)
            wa.fused_window_attention_qkv = worig


class TestStageTokenOrchestration:
    def test_stage_fused_matches_dense(self):
        """SwinStage's fused path (one window partition per stage +
        window-space rolls between blocks) == the dense per-block path."""
        from waifu2x_tensorrt_tpu.models.swin_unet import SwinStage
        import waifu2x_tensorrt_tpu.ops.swin_block as sb

        orig = _patch_both_interpret(sb)
        try:
            dense = SwinStage(96, 3, depth=4)
            fused = SwinStage(96, 3, depth=4, fused_block=True)
            x = jnp.asarray(
                np.random.default_rng(3).random((2, 16, 24, 96)), jnp.float32)
            params = dense.init(jax.random.PRNGKey(0), x)["params"]
            y0 = dense.apply({"params": params}, x)
            y1 = fused.apply({"params": params}, x)
            np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                       atol=1e-4)
        finally:
            _restore_both(sb, orig)

    def test_window_roll_equals_pixel_roll(self):
        from waifu2x_tensorrt_tpu.models.swin_unet import (
            _window_merge,
            _window_roll,
            _window_split,
        )

        x = jnp.asarray(
            np.random.default_rng(4).random((2, 16, 24, 5)), jnp.float32)
        xw = _window_split(x, 8)
        for shift in (-4, 4, -3, 3):
            got = _window_roll(xw, 2, 3, shift)
            want = _window_split(jnp.roll(x, (shift, shift), (1, 2)), 8)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("shift", [0, 4])
def test_fused_block_bf16_fast_math_within_bf16_noise(shift):
    """The bf16 kernel path (poly GELU + clamped no-max softmax,
    kernel_math exact=False) must stay within bf16 rounding distance of
    the fp32 dense block — the production precision contract."""
    from waifu2x_tensorrt_tpu.models.swin_unet import SwinBlock
    import waifu2x_tensorrt_tpu.ops.swin_block as sb

    orig = _patch_both_interpret(sb)
    try:
        dense32 = SwinBlock(96, 3, shift=shift, dtype=jnp.float32)
        fused16 = SwinBlock(96, 3, shift=shift, dtype=jnp.bfloat16,
                            fused_block=True)
        x = jnp.asarray(
            np.random.default_rng(5).random((2, 16, 16, 96)), jnp.float32)
        params = dense32.init(jax.random.PRNGKey(0), x)["params"]
        y32 = np.asarray(dense32.apply({"params": params}, x))
        y16 = np.asarray(
            fused16.apply({"params": params}, x.astype(jnp.bfloat16)),
            dtype=np.float32)
        # dense bf16 as the noise yardstick
        dense16 = SwinBlock(96, 3, shift=shift, dtype=jnp.bfloat16)
        yd16 = np.asarray(
            dense16.apply({"params": params}, x.astype(jnp.bfloat16)),
            dtype=np.float32)
        err_fused = np.abs(y16 - y32).max()
        err_dense = np.abs(yd16 - y32).max()
        # fused fast math must not be meaningfully worse than plain bf16
        assert err_fused <= max(2 * err_dense, 0.02), (err_fused, err_dense)
    finally:
        _restore_both(sb, orig)


@pytest.mark.parametrize("r,h,w", [(4, 64, 64), (2, 64, 96)])
def test_pack_head_x16_matches_reference(r, h, w):
    """Fused clamp+shuffle+pack-x16 kernel (ops/head_pack.py) equals the
    jnp reference exactly, and its bytes equal the pixel-layout tensor."""
    import jax.numpy as jnp

    from waifu2x_tensorrt_tpu.models.swin_unet import _pixel_shuffle
    from waifu2x_tensorrt_tpu.ops.head_pack import (
        pack_head_reference,
        pack_head_x16,
    )

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.uniform(-0.3, 1.3, (2, h, w, 3 * r * r))
                    .astype(np.float32))
    want = np.asarray(pack_head_reference(z, r))
    got = np.asarray(pack_head_x16(z, r=r, rows_block=16, interpret=True))
    np.testing.assert_array_equal(got, want)
    pix = np.asarray(_pixel_shuffle(jnp.clip(z, 0, 1), r))
    assert got.tobytes() == pix.tobytes()


@pytest.mark.parametrize("C,nh", [(96, 3), (192, 6)])
def test_fused_block_paired_windows_bitwise(C, nh):
    """pair=True (two windows per attention row block, M=128 MXU matmuls,
    cross-window terms masked to exact 0) must be BITWISE identical to the
    per-window form, for both dtypes and both shift settings."""
    from waifu2x_tensorrt_tpu.ops.swin_block import fused_swin_block

    rng = np.random.default_rng(0)
    N, ws, BW = 64, 8, 24
    params = {
        "n1_scale": jnp.asarray(rng.normal(1, 0.1, C).astype(np.float32)),
        "n1_bias": jnp.asarray(rng.normal(0, 0.1, C).astype(np.float32)),
        "qkv_kernel": jnp.asarray(
            rng.normal(0, 0.05, (C, 3 * C)).astype(np.float32)),
        "qkv_bias": jnp.asarray(
            rng.normal(0, 0.05, 3 * C).astype(np.float32)),
        "proj_kernel": jnp.asarray(
            rng.normal(0, 0.05, (C, C)).astype(np.float32)),
        "proj_bias": jnp.asarray(rng.normal(0, 0.05, C).astype(np.float32)),
        "n2_scale": jnp.asarray(rng.normal(1, 0.1, C).astype(np.float32)),
        "n2_bias": jnp.asarray(rng.normal(0, 0.1, C).astype(np.float32)),
        "fc1_kernel": jnp.asarray(
            rng.normal(0, 0.05, (C, 2 * C)).astype(np.float32)),
        "fc1_bias": jnp.asarray(
            rng.normal(0, 0.05, 2 * C).astype(np.float32)),
        "fc2_kernel": jnp.asarray(
            rng.normal(0, 0.05, (2 * C, C)).astype(np.float32)),
        "fc2_bias": jnp.asarray(rng.normal(0, 0.05, C).astype(np.float32)),
    }
    bias = jnp.asarray(rng.normal(0, 0.2, (nh, N, N)).astype(np.float32))
    flags = jnp.asarray(rng.integers(0, 4, BW).astype(np.int32))
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(
            rng.normal(0, 1, (BW, N, C)).astype(np.float32)).astype(dtype)
        for shift in (0, 4):
            y0 = np.asarray(fused_swin_block(
                x, params, bias, flags, num_heads=nh, shift=shift, ws=ws,
                block_windows=8, interpret=True,
                pair=False).astype(jnp.float32))
            y1 = np.asarray(fused_swin_block(
                x, params, bias, flags, num_heads=nh, shift=shift, ws=ws,
                block_windows=8, interpret=True,
                pair=True).astype(jnp.float32))
            np.testing.assert_array_equal(y0, y1)
