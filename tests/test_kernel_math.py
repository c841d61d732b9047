"""kernel_math accuracy contracts (the fused kernels' precision policy).

These pin the error bounds the kernels rely on (ops/kernel_math.py):
bf16 render paths use the fast forms, fp32 paths the exact forms, and
each fast form's deviation must stay below bf16 activation resolution.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waifu2x_tensorrt_tpu.ops.kernel_math import (
    gelu,
    layernorm,
    softmax_lastdim,
)

_erf = np.vectorize(math.erf)


def _gelu_true(z):
    z = z.astype(np.float64)
    return 0.5 * z * (1.0 + _erf(z * 0.7071067811865476))


@pytest.mark.parametrize("exact,bound", [(False, 1e-4), (True, 5e-7)])
def test_gelu_error_bound(exact, bound):
    z = jnp.asarray(np.linspace(-12, 12, 200001, dtype=np.float32))
    got = np.asarray(gelu(z, exact=exact), dtype=np.float64)
    err = np.abs(got - _gelu_true(np.asarray(z)))
    assert err.max() < bound, err.max()


def test_softmax_exact_matches_jax_nn():
    x = np.random.default_rng(0).standard_normal((4, 64, 64)).astype(np.float32) * 5
    got = np.asarray(softmax_lastdim(jnp.asarray(x), exact=True))
    ref = np.asarray(jax.nn.softmax(jnp.asarray(x), axis=-1))
    np.testing.assert_allclose(got, ref, atol=1e-7)


def test_softmax_fast_in_range_matches():
    """Within the [-75, 75] clamp the no-max form is the same softmax."""
    x = np.random.default_rng(1).standard_normal((4, 64, 64)).astype(np.float32) * 10
    got = np.asarray(softmax_lastdim(jnp.asarray(x), exact=False))
    ref = np.asarray(jax.nn.softmax(jnp.asarray(x), axis=-1))
    np.testing.assert_allclose(got, ref, atol=2e-6)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_softmax_fast_shift_mask_still_masks():
    """The -1e9 cyclic-shift mask must still zero masked tokens through
    the clamp (it lands at -75, far below any in-range logit)."""
    x = np.zeros((1, 8, 8), np.float32)
    x[0, :, 4:] = -1e9
    got = np.asarray(softmax_lastdim(jnp.asarray(x), exact=False))
    assert got[0, :, 4:].max() < 1e-20
    np.testing.assert_allclose(got[0, :, :4], 0.25, atol=1e-6)


def test_softmax_keep_mask_zero_regardless_of_logit_range():
    """ADVICE r2 (medium): the multiplicative keep mask must give masked
    entries weight EXACTLY 0 even when every unmasked logit sits below
    the fast path's -75 clamp (where an additive -1e9 mask would tie with
    the clamped logits and leak cross-window attention)."""
    x = np.full((2, 8, 8), -500.0, np.float32)  # all below the clamp
    keep = np.zeros((2, 8, 8), bool)
    keep[:, :, :4] = True
    for exact in (False, True):
        got = np.asarray(
            softmax_lastdim(jnp.asarray(x), exact=exact,
                            keep=jnp.asarray(keep)))
        assert (got[:, :, 4:] == 0.0).all(), "mask leaked"
        np.testing.assert_allclose(got[:, :, :4], 0.25, atol=1e-6)
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_softmax_keep_mask_matches_additive_reference_in_range():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 16, 16)).astype(np.float32) * 8
    keep = rng.random((4, 16, 16)) > 0.3
    keep[..., 0] = True  # every row keeps at least one entry
    ref = np.asarray(jax.nn.softmax(
        jnp.where(jnp.asarray(keep), jnp.asarray(x), -1e9), axis=-1))
    ref = np.where(keep, ref, 0.0)
    for exact in (False, True):
        got = np.asarray(softmax_lastdim(
            jnp.asarray(x), exact=exact, keep=jnp.asarray(keep)))
        np.testing.assert_allclose(got, ref, atol=2e-6)


def test_softmax_fast_no_overflow_at_extremes():
    x = np.full((2, 8, 8), 1e4, np.float32)
    x[1] = -1e4
    got = np.asarray(softmax_lastdim(jnp.asarray(x), exact=False))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_layernorm_matches_flax():
    import flax.linen as nn

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((32, 64, 96)).astype(np.float32) * 3)
    scale = jnp.asarray(rng.standard_normal(96).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(96).astype(np.float32))
    mod = nn.LayerNorm(epsilon=1e-5, use_fast_variance=True)
    ref = mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = layernorm(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    # exact=True (full-f32 MXU reduction dots, the fp32 CLI path) must
    # agree at least as tightly
    got_exact = layernorm(x, scale, bias, exact=True)
    np.testing.assert_allclose(np.asarray(got_exact), np.asarray(ref),
                               atol=2e-5)


def _hazard_row(c=96):
    """mean ~ 100, std ~ 0.01 across channels: sigma/m = 1e-4, the regime
    where a bf16-pass E[x^2] (relative error ~2^-9) destroys the variance
    — measured on v5e 2026-08-19: the r3 naive form inflated unit-scale
    outputs to 8.7 absolute error here (~|x-mean|/sqrt(eps))."""
    rng = np.random.default_rng(5)
    x = (100.0 + 0.01 * rng.standard_normal((4, 64, c))).astype(np.float32)
    x64 = x.astype(np.float64)
    mu = x64.mean(-1, keepdims=True)
    var = x64.var(-1, keepdims=True)
    ref = (x64 - mu) / np.sqrt(var + 1e-5)
    return x, ref


def test_layernorm_hazard_row_default_form_is_exact(monkeypatch):
    """Catastrophic-cancellation guard (round-4 review), default "pilot"
    (shifted-moments) form: row-exact at every mean/std ratio — and
    measured as fast as the hazardous naive form on v5e (see the
    layernorm docstring's A/B table)."""
    monkeypatch.delenv("WAIFU2X_TPU_LN", raising=False)
    c = 96
    x, ref = _hazard_row(c)
    ones = jnp.ones(c, jnp.float32)
    zeros = jnp.zeros(c, jnp.float32)
    got = np.asarray(layernorm(jnp.asarray(x), ones, zeros))
    assert np.abs(got - ref).max() < 0.05, np.abs(got - ref).max()


def test_layernorm_hazard_row_floor_form_is_bounded(monkeypatch):
    """Opt-in "floor" form: the naive dots stay (zero extra passes) but
    the relative variance floor must cap rsqrt, so the worst case on a
    degenerate high-mean/low-variance row is a bounded attenuation toward
    0 — never the multi-hundred-x blowup that would also void the
    fast-softmax logit-bound guard. The floor is data-dependent, so it
    engages on CPU (exact f32 dots) exactly as on TPU."""
    monkeypatch.setenv("WAIFU2X_TPU_LN", "floor")
    c = 96
    x, _ = _hazard_row(c)
    ones = jnp.ones(c, jnp.float32)
    zeros = jnp.zeros(c, jnp.float32)
    got = np.asarray(layernorm(jnp.asarray(x), ones, zeros))
    # var floored at 2^-6 * E[x^2] ~ 156 here -> |y| ~ std/(|x| * 2^-3);
    # anything <= 1 proves the blowup is gone (r3 naive measured 8.7)
    assert np.abs(got).max() < 1.0, np.abs(got).max()
    assert np.isfinite(got).all()


def test_layernorm_pilot_floor_engages_on_outlier_pilot_row():
    """The pilot form's relative floor (kernel_math._LN_PILOT_FLOOR_REL)
    must engage when the pilot channel is an extreme outlier of its row
    (d^2/var > ~20) — the regime where single-pass bf16 dot error on TPU
    could otherwise zero the computed variance (see LN_VAR_SLACK). On
    CPU (exact dots) engagement shows as a bounded attenuation; the
    exact=True (fp32 CLI) path keeps no floor and stays exact."""
    from waifu2x_tensorrt_tpu.ops.kernel_math import _LN_PILOT_FLOOR_REL

    c = 96
    rng = np.random.default_rng(3)
    x = (0.01 * rng.standard_normal((1, 4, c))).astype(np.float32)
    x[..., 0] = 10.0  # pilot channel carries ~all the row variance
    x64 = x.astype(np.float64)
    mu = x64.mean(-1, keepdims=True)
    var = x64.var(-1, keepdims=True)
    ref = (x64 - mu) / np.sqrt(var + 1e-5)
    s2 = ((x64 - x64[..., 0:1]) ** 2).mean(-1, keepdims=True)
    floor = _LN_PILOT_FLOOR_REL * s2
    assert (floor > var).all()  # the construction reaches the floor
    ones = jnp.ones(c, jnp.float32)
    zeros = jnp.zeros(c, jnp.float32)
    got = np.asarray(layernorm(jnp.asarray(x), ones, zeros)).astype(
        np.float64)
    # attenuated by exactly sqrt(var/floor), never inflated
    np.testing.assert_allclose(got, ref * np.sqrt((var + 1e-5) / (
        floor + 1e-5)), rtol=2e-3, atol=2e-4)
    assert (np.abs(got) <= np.abs(ref) + 1e-6).all()
    # sum(x_hat^2) stays within the logit-bound slack, exactly the
    # property ops/logit_bound.py consumes
    from waifu2x_tensorrt_tpu.ops.kernel_math import LN_VAR_SLACK

    assert ((got ** 2).sum(-1) <= c * LN_VAR_SLACK).all()
    got_exact = np.asarray(layernorm(jnp.asarray(x), ones, zeros,
                                     exact=True))
    np.testing.assert_allclose(got_exact, ref, atol=1e-3)


def _bf16_rtn(a):
    """Round-to-nearest bf16 (the operand truncation of a single-pass
    MXU dot), back to f64."""
    import ml_dtypes

    return np.asarray(a, dtype=ml_dtypes.bfloat16).astype(np.float64)


def test_pilot_floor_bounds_emulated_bf16_dot_error():
    """Adversarial soundness of LN_VAR_SLACK under the documented TPU
    error model (dot OPERANDS truncated to bf16, f32 accumulation):
    emulate the pilot form's two dots with real bf16 operand rounding
    over adversarial two-value rows. WITHOUT the floor, rounding alone
    drives sum(x_hat^2) past C * LN_VAR_SLACK at C=192 (the round-4
    review gap: the error bound 3u*(C+1)*var exceeds var itself); WITH
    the shipped floor every row stays inside the slack, for every C the
    fused kernels run (96 and 192) and far beyond."""
    from waifu2x_tensorrt_tpu.ops.kernel_math import (
        LN_VAR_SLACK,
        _LN_PILOT_FLOOR_REL,
    )

    def sumsq(x, floored: bool) -> float:
        p = x[0]
        xc = x - p
        d = _bf16_rtn(xc).mean()       # operand-truncated dots
        s2 = _bf16_rtn(xc * xc).mean()
        var = s2 - d * d
        var = max(var, _LN_PILOT_FLOOR_REL * s2) if floored else max(
            var, 0.0)
        y = (xc - d) / np.sqrt(var + 1e-5)
        return float((y ** 2).sum())

    worst_unfloored = 0.0
    violations = 0
    for c in (96, 192, 384):
        for k in range(1, 512):
            # all non-pilot channels equal: var_true/s2 = 1/c, the
            # Chebyshev extreme where the d^2 cancellation is sharpest;
            # scan the bf16 grid gap for the worst rounding alignment
            v = 1.0 + k * 2.0 ** -16
            x = np.full(c, v, np.float64)
            x[0] = 0.0
            got = sumsq(x, floored=True)
            assert got <= c * LN_VAR_SLACK, (c, v, got / c)
            un = sumsq(x, floored=False) / c
            worst_unfloored = max(worst_unfloored, un)
            if un > LN_VAR_SLACK:
                violations += 1
    # the hazard is real: without the floor, round-to-nearest bf16
    # operands alone (no adversarial rounding mode needed) break the
    # 1.26 slack on these rows
    assert violations > 0, worst_unfloored


def test_layernorm_hazard_row_exact_flag_is_exact(monkeypatch):
    """exact=True (the fp32 CLI precision path) always uses the pilot
    form with HIGHEST-precision dots, independent of the env knob."""
    monkeypatch.setenv("WAIFU2X_TPU_LN", "floor")
    c = 96
    x, ref = _hazard_row(c)
    ones = jnp.ones(c, jnp.float32)
    zeros = jnp.zeros(c, jnp.float32)
    got = np.asarray(layernorm(jnp.asarray(x), ones, zeros, exact=True))
    assert np.abs(got - ref).max() < 1e-3, np.abs(got - ref).max()
