"""Shared VPU math for the Pallas kernels.

The v5e VPU has no erf primitive and transcendental/divide ops are
multi-pass; ablation-profiled on the fused Swin block (BENCH_NOTES.md
round 2), softmax is ~19% of stage-1 kernel time and GELU ~3%. The
variants here were each measured in-kernel on v5e (2026-08-16 ablation
probe; stage-1 geometry 4096 windows, C=96, bw32):

  softmax: divide > reciprocal-multiply (3.30 vs 3.43 ms/block — Mosaic
    fuses the broadcast divide; an explicit reciprocal adds a pass), and
    dropping the max-subtract pass behind a range clamp saves another
    ~0.3 ms/block.
  gelu: a pure-FMA odd polynomial beats the Abramowitz-Stegun rational
    form (divide + exp) by ~0.07 ms/block.
  layernorm: moving the mean/mean2 row reductions onto the MXU (dot with
    a ones vector) frees VPU passes, ~0.09 ms/block.

Precision policy: each function takes an ``exact`` flag. The fused
kernels pass ``exact=False`` only for bfloat16 compute, where the
approximation error sits below bf16's own rounding noise; float32
("tf32" CLI precision) keeps the numerically-strict forms.

No reference analogue: the reference's model math lives inside opaque
TensorRT engines (SURVEY.md component 22).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Escape hatch: force the numerically-strict softmax everywhere (including
# bf16 kernels) without a code change. Read once at import; it only affects
# traces compiled after that.
_FORCE_EXACT_SOFTMAX = os.environ.get(
    "WAIFU2X_TPU_EXACT_SOFTMAX", "") not in ("", "0")

# erf(x) = x * P(x^2) on |x| <= 3, clamped outside (erf(3) = 1 - 2.2e-5).
# P is a degree-8 Chebyshev fit of erf(sqrt(u))/sqrt(u) on u in [0, 9]
# (well-conditioned, unlike a plain lstsq power fit). Max abs error vs
# true erf, evaluated in fp32 over |x| <= 6: 4.2e-5; the induced GELU
# error is <= 8.7e-5 — below bf16 activation resolution (~4e-3 relative).
_ERF_COEFS = (
    1.1283630048348186,
    -0.37581892351203916,
    0.111862958177743,
    -0.02564989971645592,
    0.004437956389134158,
    -0.000553574520441688,
    4.614906117946642e-05,
    -2.2678240256898596e-06,
    4.918470760351015e-08,
)


def _erf_poly(x):
    """Pure-FMA erf approximation (fp32 in/out), |err| <= 4.2e-5."""
    z = jnp.clip(x, -3.0, 3.0)
    u = z * z
    p = jnp.float32(_ERF_COEFS[-1])
    for c in _ERF_COEFS[-2::-1]:
        p = p * u + jnp.float32(c)
    return z * p


def _erf_as(x):
    """Abramowitz-Stegun 7.1.26 rational erf, |err| <= 1.5e-7 (costs a
    VPU divide and an exp; the fp32-precision path uses this)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    za = jnp.abs(x)
    t = 1.0 / (1.0 + p * za)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-za * za))


def gelu(z, exact: bool = False):
    """erf-GELU matching jax.nn.gelu(approximate=False); fp32 in/out.

    exact=False: polynomial erf, <= 8.7e-5 abs error (bf16-invisible).
    exact=True:  A-S rational erf, <= 1.5e-7.
    """
    x = z * jnp.float32(0.7071067811865476)
    e = _erf_as(x) if exact else _erf_poly(x)
    return 0.5 * z * (1.0 + e)


# Softmax logit clamp for the no-max-subtract fast path: exp(75) stays
# finite in fp32 even summed over a 64-token row (64*e^75 ~ 2.4e34 <<
# 3.4e38), and exp(-75) ~ 2.6e-33 stays comfortably normal (fp32 min
# normal 1.2e-38), so an all--75 row cannot underflow its sum. The clamp
# can only distort the distribution when a TRUE logit falls outside
# [-75, 75]; the loader PROVES per checkpoint that none can
# (ops/logit_bound.py bound <= FAST_SOFTMAX_BUDGET) and selects the
# max-subtracted form otherwise (engine/upscaler._guard_fast_softmax).
# The cyclic-shift mask does NOT ride on this bound: it is applied
# multiplicatively after exp (``keep``), so masked entries get weight
# exactly 0 for any logit values. Set WAIFU2X_TPU_EXACT_SOFTMAX=1 to
# force the max-subtracted form everywhere regardless.
_CLAMP_LO = -75.0
_CLAMP_HI = 75.0

# A checkpoint whose worst-case |logit| (ops/logit_bound.py) stays within
# this budget can NEVER hit the clamp, so the fast path is provably exact
# for it; the loader selects exact softmax otherwise (engine/upscaler.py
# _guard_fast_softmax). The 2% margin below the clamp edge covers the
# arithmetic gap between the proof and the kernel (round-4 review
# finding): the bound is computed in fp64 from the stored weights, while
# the kernel forms logits from bf16-rounded weights/activations (relative
# error ~2^-8 per rounding, a handful accumulated through LN -> qkv ->
# q.k), so a bound within ~1% of the edge could pass while a computed
# logit lands just outside it. Real checkpoints sit 10-400x below the
# budget (tests/test_softmax_guard.py), so the margin costs nothing.
FAST_SOFTMAX_BUDGET = 0.98 * min(-_CLAMP_LO, _CLAMP_HI)


def shift_crossing(tok, tok_m, ws: int, shift: int):
    """Canonical Swin shift-mask law (round-4 review: previously copied
    at four sites; the clamped fast softmax's correctness depends on
    every kernel building the IDENTICAL keep mask). ``tok``/``tok_m`` are
    window-LOCAL token indices (any broadcastable int arrays — jnp arange
    outer pairs or Mosaic broadcasted_iota planes). Returns boolean
    (row_cross, col_cross): does entry (tok, tok_m) pair tokens from
    opposite sides of the cyclic-shift ROW (resp. COLUMN) seam?"""
    row_cross = ((tok // ws) >= (ws - shift)) != (
        (tok_m // ws) >= (ws - shift))
    col_cross = ((tok % ws) >= (ws - shift)) != (
        (tok_m % ws) >= (ws - shift))
    return row_cross, col_cross


def keep_from_flags(bottom, right, row_cross, col_cross):
    """keep = NOT((bottom & row_cross) | (right & col_cross)): an entry
    is masked only in windows wrapping the frame's bottom (flag bit 1) /
    right (bit 2) edge, and only when it crosses the matching seam. All
    arguments pre-broadcast by the caller (flag selection differs per
    kernel layout: plain, pair-folded, jnp)."""
    return ~((bottom & row_cross) | (right & col_cross))


def softmax_lastdim(attn, exact: bool = True, keep=None):
    """Softmax over the last axis, fp32 in/out.

    Args:
      attn: logits, fp32.
      exact: True = standard max-subtracted form (fp32-precision path).
        False = skip the max reduce+subtract behind a [-75, 75] logit
        clamp — two fewer VPU passes over the (N, N) attention tensor,
        measured ~0.3 ms/stage-1 block on v5e. bf16-only.
      keep: optional bool mask broadcastable to ``attn``; False entries
        receive weight exactly 0 in BOTH paths (the mask is multiplied in
        after exp, so it never competes with clamped logits). Every row
        must keep at least one entry (Swin shift masks always do).
    """
    if exact or _FORCE_EXACT_SOFTMAX:
        if keep is not None:
            attn = jnp.where(keep, attn, jnp.float32(-3e38))
        e = jnp.exp(attn - jnp.max(attn, axis=-1, keepdims=True))
    else:
        e = jnp.exp(jnp.clip(attn, _CLAMP_LO, _CLAMP_HI))
    if keep is not None:
        e = e * keep.astype(jnp.float32)
    return e / jnp.sum(e, axis=-1, keepdims=True)


# bf16-path LayerNorm variance form (read at TRACE time):
#   "pilot" — DEFAULT: shifted-moments (pilot = the row's own first
#             channel): row-exact at every mean/std ratio. The extra
#             elementwise subtract fuses away — same-session A/B on the
#             v5e headline stream (2026-08-19, probes/ln_form_ab.py):
#             pilot 478.1 MP/s vs floor 475.6 — within jitter of each
#             other and of the r3 naive form's 475.3-479.4.
#   "floor" — naive E[x^2]-mean^2 dots plus a relative variance floor:
#             zero extra elementwise passes; on rows where cancellation
#             has destroyed the variance the floor bounds rsqrt, so the
#             failure mode degrades to "row normalized toward 0" instead
#             of a multi-hundred-x blowup. Row-exact only while
#             var/E[x^2] > 2^-7 (|mean|/std < ~11 — every healthy
#             activation row; see layernorm docstring). Kept selectable
#             for re-measurement; not the default because pilot costs
#             nothing and is exact everywhere.
_LN_FORM_ENV = "WAIFU2X_TPU_LN"

# Error model for the default-precision f32 dots in-kernel: the OPERAND
# is truncated to bf16 for a single MXU pass and accumulated in f32.
# Per-element relative error u <= 2^-8 (round-to-nearest bf16 unit
# roundoff is 2^-9; 2^-8 also covers a truncate-toward-zero lowering —
# the proof below must not depend on the rounding mode Mosaic happens to
# use). x itself enters the kernels as bf16 activations, so casting it
# to f32 is exact and a dot whose operand is x directly has NO
# truncation error (f32-accumulation error ~C*2^-24, absorbed below).

# Relative variance floors (4x margin over the worst-case dot error of
# the respective form — see LN_VAR_SLACK): any computed var below the
# floor is indistinguishable from rounding noise, so flooring there caps
# rsqrt at its trustworthy range.
#   floor form: one truncated operand (x*x), |dvar| <= u*E[x^2]
#               -> floor 4u = 2^-6 of E[x^2].
#   pilot form: both dots run at deviation scale s2 = var + d^2;
#               |ds2| <= u*s2, |2*d*dd| <= 2u*s2 (|d| <= E|xc|,
#               |dd| <= u*E|xc|, E|xc|^2 <= s2) -> |dvar| <= 3u*s2
#               -> floor 12u = 3*2^-6 of s2.
_LN_FLOOR_REL = 2.0 ** -6
_LN_PILOT_FLOOR_REL = 3.0 * 2.0 ** -6

# Worst-case inflation of sum(x_hat^2) (x_hat = LN-normalized row) over
# the exact-math value C*var/(var+eps) <= C, under the shipped bf16 LN
# forms. The fast-softmax logit bound (ops/logit_bound.py) consumes this:
# its ||x_hat|| <= sqrt(C) step assumes exact LN arithmetic, which bf16
# reduction error can violate — var_used may UNDERSHOOT var_true, so
# sum(x_hat^2) ~ C*var_true/var_used can exceed C.
#
# Both shipped forms floor var_used at 4x their worst-case error bound D
# (the floor constants above), so var_used >= max(var_true - D, 4D) and
#   sum(x_hat^2) / C <= (var_true + dd^2) / var_used
#                    <= max over v of v/max(v - D, 4D) + (u^2*s2)/(4D)
#                    =  (4D + D)/(4D) + 2^-16/(12*2^-8)  <  1.2504.
# (The d-estimate error enters the NUMERATOR only quadratically:
# sum((xc - d_meas)^2) = C*(var + dd^2) exactly — the cross term
# vanishes — so a mis-centered mean cannot inflate the row linearly.)
# This holds for EVERY channel width, mean/std ratio, and input row:
# no "healthy activation" assumption remains. Chebyshev bounds
# d^2 <= C*var for the pilot form (the pilot is an in-row sample), so
# its floor engages only where d^2/var > ~20 — a pilot channel that is
# a >4.5-sigma outlier of its own row; such a row degrades to a bounded
# attenuation (the safe direction for the guard), never a blowup.
#   exact=True: full-f32 multi-pass dots, ratio 1 + O(2^-18); no floor
#     (it would needlessly perturb legitimate extreme-outlier rows).
# 1.2504 -> 1.26 covers every form. The r3 naive form had NO finite
# bound (a degenerate row could zero the computed var and void the
# logit proof); the round-4 review found the first pilot form's bound
# was C-dependent and unbounded for C >= 170 (3u*(C+1) > 1) — both are
# closed, not slack-adjusted, by the floors.
LN_VAR_SLACK = 1.26


def layernorm(x, scale, bias, eps: float = 1e-5, exact: bool = False):
    """Fast-variance LayerNorm in fp32 (nn.LayerNorm semantics) with the
    row reductions on the MXU: mean and variance are dots with a ones
    vector, freeing VPU passes (v5e: ~0.09 ms/stage-1 block).

    Numerics (round-4 review): TPU default-precision f32 dots may multiply
    in single bf16 passes, and the naive E[x^2] - mean^2 form cancels
    catastrophically on high-mean/low-variance token rows — var collapses
    toward 0 and rsqrt(var+eps) inflates the row by up to
    sqrt(var_true/eps), measured 8.7 absolute error on unit-scale outputs
    at mean/std = 1e4 (v5e 2026-08-19). A blown-up LN row would also void
    the fast-softmax guard's proven logit bound (ops/logit_bound.py
    assumes LN rows are unit-scale), so the bf16 path must bound this.
    Every candidate fix was MEASURED on the v5e headline stream the same
    day:

      naive dots (r3 shipped)                      479.4 MP/s, hazard
      Precision.HIGHEST both dots                  364
      Precision.HIGHEST mean dot only              418
      Kahan 3-dot (center, residual, square)       441.9
      pilot shifted-moments (2 dots + 1 sub pass)  478.1  <- default
      naive + relative var floor ("floor")         475.6

    (The last two are a same-session A/B, probes/ln_form_ab.py —
    cross-run tunnel drift is larger than their difference.) The bf16
    form is selected by WAIFU2X_TPU_LN ("pilot" default, or "floor", see
    _LN_FORM_ENV comment above). "floor" keeps the naive dots
    bit-identical on every healthy row (floor engages only when
    var < 2^-7 * E[x^2], i.e. |mean|/std > ~11 across channels — a
    near-degenerate activation row) and converts the blowup into a
    bounded attenuation: var >= 2^-7 * E[x^2] caps rsqrt so |y| stays
    O(2^-5 + std/|mean|), preserving the logit-bound guard. "pilot" is
    row-exact everywhere and measured just as fast, so it is the
    default:

      p   = x[..., 0:1]            # any in-row sample value works
      xc  = x - p                  # deviation-scale operand
      d   = dot(xc)/C              # = mean - p; bf16 error at DEVIATION
                                   #   scale, not mean scale
      s2  = dot(xc*xc)/C           # = var + d^2
      var = s2 - d^2               # d = mean - p is O(std), so the
                                   #   cancellation loses O(1) bits only
      y   = (xc - d) * rsqrt(var + eps)

    exact=True (the fp32 "tf32" CLI path, selected per-block on dtype in
    swin_block) uses the pilot form with full-f32 MXU passes for the two
    dots: golden-grade agreement with the dense flax forward at every
    ratio; cost there is already accepted.
    """
    x32 = x.astype(jnp.float32)
    c = x32.shape[-1]
    ones = jnp.ones((c, 1), jnp.float32)
    dims = (((x32.ndim - 1,), (0,)), ((), ()))
    inv_c = jnp.float32(1.0 / c)
    prec = jax.lax.Precision.HIGHEST if exact else None

    def rowdot(a):
        return jax.lax.dot_general(
            a, ones, dims, precision=prec,
            preferred_element_type=jnp.float32) * inv_c

    form = os.environ.get(_LN_FORM_ENV, "pilot")
    if exact or form != "floor":
        p = jax.lax.slice_in_dim(x32, 0, 1, axis=-1)
        xc = x32 - p
        d = rowdot(xc)           # = mean - p; independent of s2 below
        s2 = rowdot(xc * xc)
        # bf16 path: relative floor at 4x the worst-case dot error so the
        # logit-bound slack holds for EVERY row (see LN_VAR_SLACK). It
        # engages only where the pilot channel is a >4.5-sigma outlier of
        # its row (d^2/var > ~20; Chebyshev caps it at C); exact=True dots
        # are multi-pass f32 and keep the plain non-negative clamp.
        floor = 0.0 if exact else s2 * jnp.float32(_LN_PILOT_FLOOR_REL)
        var = jnp.maximum(s2 - d * d, floor)
        y = (xc - d) * jax.lax.rsqrt(var + jnp.float32(eps))
    else:
        mean = rowdot(x32)
        s2 = rowdot(x32 * x32)
        var = jnp.maximum(s2 - mean * mean,
                          s2 * jnp.float32(_LN_FLOOR_REL))
        y = (x32 - mean) * jax.lax.rsqrt(var + jnp.float32(eps))
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
