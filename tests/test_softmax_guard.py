"""Per-checkpoint fast-softmax guard (VERDICT r3 item 4).

The no-max-subtract bf16 softmax clamps logits to [-75, 75] (round 4; was [-60, 75]); a checkpoint
able to produce logits outside that window would be silently flattened.
These tests prove three things:

1. the logit bound (ops/logit_bound.py) is SOUND — no input can drive a
   real attention layer's logits past the computed bound;
2. the hazard is REAL — an adversarial checkpoint whose logits exceed the
   clamp makes the fast path produce a wrong distribution;
3. the guard CATCHES it — the loader selects exact softmax for exactly
   those checkpoints, and the guarded output matches the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waifu2x_tensorrt_tpu.engine.upscaler import _guard_fast_softmax
from waifu2x_tensorrt_tpu.models import registry
from waifu2x_tensorrt_tpu.ops.kernel_math import (
    FAST_SOFTMAX_BUDGET,
    softmax_lastdim,
)
from waifu2x_tensorrt_tpu.ops.logit_bound import (
    attention_logit_bound,
    swin_max_logit_bound,
)
from waifu2x_tensorrt_tpu.utils.logging import Logger


def _layer(rng, c=32, nh=2, scale=1.0, ws=4):
    norm1 = {
        "scale": rng.normal(1.0, 0.2, c).astype(np.float32),
        "bias": rng.normal(0.0, 0.1, c).astype(np.float32),
    }
    qkv = {
        "kernel": (rng.standard_normal((c, 3 * c)) * 0.1 * scale
                   ).astype(np.float32),
        "bias": (rng.standard_normal(3 * c) * 0.05).astype(np.float32),
    }
    table = (rng.standard_normal(((2 * ws - 1) ** 2, nh)) * 0.5
             ).astype(np.float32)
    return norm1, qkv, table


def _worst_logit(norm1, qkv, table, nh, trials=200, tokens=16):
    """Empirical max |logit| over random token batches, q/k computed the
    way the block does: LN -> packed qkv -> per-head q.k/sqrt(hd) + bias."""
    c = qkv["kernel"].shape[0]
    hd = c // nh
    rng = np.random.default_rng(7)
    worst = 0.0
    for _ in range(trials):
        x = rng.standard_normal((tokens, c)) * rng.uniform(0.01, 100.0)
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        xh = (x - mu) / np.sqrt(var + 1e-5)
        y = xh * norm1["scale"] + norm1["bias"]
        qkv_out = y @ qkv["kernel"] + qkv["bias"]
        for h in range(nh):
            q = qkv_out[:, h * hd:(h + 1) * hd]
            k = qkv_out[:, c + h * hd:c + (h + 1) * hd]
            logits = q @ k.T / np.sqrt(hd)
            worst = max(
                worst,
                float(np.max(np.abs(logits))) + float(
                    np.max(np.abs(table[:, h]))),
            )
    return worst


def test_bound_is_sound():
    """No sampled input drives |logit| past the computed bound."""
    rng = np.random.default_rng(0)
    for scale in (0.2, 1.0, 5.0):
        norm1, qkv, table = _layer(rng, scale=scale)
        bound = attention_logit_bound(norm1, qkv, table, num_heads=2)
        emp = _worst_logit(norm1, qkv, table, nh=2)
        assert emp <= bound, (emp, bound)


def test_bound_is_not_vacuous():
    """The bound tracks the weights (scaling weights scales the bound) and
    sits within a plausible factor of the empirical worst case."""
    rng = np.random.default_rng(1)
    norm1, qkv, table = _layer(rng, scale=1.0)
    b1 = attention_logit_bound(norm1, qkv, table, num_heads=2)
    qkv10 = {"kernel": qkv["kernel"] * 10.0, "bias": qkv["bias"]}
    b10 = attention_logit_bound(norm1, qkv10, table, num_heads=2)
    assert b10 > 50 * b1  # quadratic in the qkv scale (bias-dominated terms aside)
    emp = _worst_logit(norm1, qkv, table, nh=2)
    assert bound_ratio_ok(b1, emp)


def bound_ratio_ok(bound, emp, max_ratio=400.0):
    """Cauchy-Schwarz over random (not adversarial) samples is loose but
    must stay within a sane factor — a 1e6x-slack bound would force exact
    softmax on every real checkpoint and make the fast path dead code."""
    return emp <= bound <= max_ratio * max(emp, 1e-9)


def test_fast_path_wrong_beyond_clamp_exact_right():
    """The hazard: logits past the clamp flatten under the fast path."""
    logits = jnp.asarray([[0.0, 100.0, 200.0]], jnp.float32)
    ref = np.asarray(jax.nn.softmax(logits, axis=-1))
    fast = np.asarray(softmax_lastdim(logits, exact=False))
    exact = np.asarray(softmax_lastdim(logits, exact=True))
    # true distribution is ~one-hot on the 200 logit; the fast path clamps
    # 100 and 200 both to 75 and splits the mass
    assert abs(ref[0, 2] - 1.0) < 1e-6
    assert abs(fast[0, 2] - 0.5) < 1e-3  # provably wrong
    np.testing.assert_allclose(exact, ref, rtol=1e-6)


def _swin_params(scale_qkv=1.0, seed=0):
    module, _ = registry.create_model("swin_unet/art", 2, -1,
                                      dtype=jnp.bfloat16)
    params = registry.init_params_host(module, tile=32, seed=seed)

    def scale_tree(tree):
        for k, v in tree.items():
            if k == "attn" and isinstance(v, dict) and "qkv" in v:
                v["qkv"]["kernel"] = v["qkv"]["kernel"] * scale_qkv
            elif isinstance(v, dict):
                scale_tree(v)

    scale_tree(params)
    return module, params


def test_guard_keeps_fast_path_for_tame_checkpoint():
    module, params = _swin_params(scale_qkv=1.0)
    bound = swin_max_logit_bound(params)
    assert bound is not None and bound <= FAST_SOFTMAX_BUDGET
    guarded, got_bound = _guard_fast_softmax(module, params, Logger())
    assert guarded.fast_softmax is True
    assert got_bound == pytest.approx(bound)


def test_guard_forces_exact_for_adversarial_checkpoint():
    """A checkpoint whose qkv weights are scaled until the PROVEN bound
    exceeds the clamp budget must come out of the loader with
    fast_softmax=False."""
    module, params = _swin_params(scale_qkv=400.0)
    bound = swin_max_logit_bound(params)
    assert bound is not None and bound > FAST_SOFTMAX_BUDGET
    guarded, _ = _guard_fast_softmax(module, params, Logger())
    assert guarded.fast_softmax is False


def test_guard_noop_for_fp32_and_cunet():
    # fp32 compute never uses the fast path — guard is a no-op
    module, _ = registry.create_model("swin_unet/art", 2, -1,
                                      dtype=jnp.float32)
    params = registry.init_params_host(module, tile=32)
    guarded, bound = _guard_fast_softmax(module, params, Logger())
    assert guarded is module and bound is None
    # cunet has no attention layers at all
    cmodule, _ = registry.create_model("cunet/art", 2, 0,
                                       dtype=jnp.bfloat16)
    cparams = registry.init_params_host(cmodule, tile=32)
    assert swin_max_logit_bound(cparams) is None
    cguarded, cbound = _guard_fast_softmax(cmodule, cparams, Logger())
    assert cguarded is cmodule and cbound is None


def test_guarded_kernel_output_matches_reference_beyond_clamp():
    """End-to-end through the fused attention kernel (interpret mode): an
    adversarial qkv whose logits exceed the clamp produces WRONG output
    with fast_softmax=True and CORRECT output with the guard's selection
    (fast_softmax=False), versus the dense jax.nn.softmax reference."""
    from waifu2x_tensorrt_tpu.ops.window_attention import (
        fused_window_attention_qkv,
        window_attention_reference,
    )

    rng = np.random.default_rng(3)
    bw, ws, nh, hd = 4, 4, 2, 8
    n, c = ws * ws, nh * 8
    # logits far past the clamp: q, k rows ~ N(0, 20^2) over hd=8 gives
    # |q.k|/sqrt(hd) ~ O(1000)
    qkv = (rng.standard_normal((bw, n, 3 * c)) * 20.0).astype(np.float32)
    bias = np.zeros((nh, n, n), np.float32)
    flags = np.zeros((bw,), np.int32)

    qkv_j = jnp.asarray(qkv, jnp.bfloat16)
    q, k, v = (
        qkv_j[..., i * c:(i + 1) * c]
        .reshape(bw, n, nh, hd).transpose(0, 2, 1, 3)
        for i in range(3)
    )
    ref = np.asarray(window_attention_reference(
        q, k, v, jnp.asarray(bias), jnp.asarray(flags), shift=0)
    ).astype(np.float32).transpose(0, 2, 1, 3).reshape(bw, n, c)

    outs = {}
    for fast in (True, False):
        outs[fast] = np.asarray(fused_window_attention_qkv(
            qkv_j, jnp.asarray(bias), jnp.asarray(flags),
            num_heads=nh, shift=0, block_windows=4, interpret=True,
            fast_softmax=fast,
        )).astype(np.float32)

    err_fast = float(np.max(np.abs(outs[True] - ref)))
    err_exact = float(np.max(np.abs(outs[False] - ref)))
    tol = 0.1  # bf16-scale tolerance on O(20) outputs
    assert err_fast > 5 * tol, (err_fast, err_exact)  # hazard is real
    assert err_exact < tol, err_exact  # guard fixes it


def test_guard_walks_frozendict_trees():
    """flax FrozenDict layouts must walk identically to plain dicts: a
    dict-only walker failed OPEN on Mappings — the adversarial checkpoint
    below would have kept the clamped fast path (round-4 review)."""
    from flax.core import freeze

    module, params = _swin_params(scale_qkv=400.0)
    bound_dict = swin_max_logit_bound(params)
    bound_frozen = swin_max_logit_bound(freeze(params))
    assert bound_frozen == pytest.approx(bound_dict)
    guarded, _ = _guard_fast_softmax(module, freeze(params), Logger())
    assert guarded.fast_softmax is False


def test_guard_fails_closed_on_opaque_param_tree():
    """A bf16 module carrying fast_softmax=True whose param tree yields
    no attention layers (layout change, scope rename) means NO PROOF —
    the guard must select exact softmax, not silently keep the clamped
    path (round-4 review)."""
    module, _ = _swin_params()
    guarded, bound = _guard_fast_softmax(
        module, {"unrecognized": {"layout": np.zeros(3)}}, Logger())
    assert bound is None
    assert guarded.fast_softmax is False


def test_budget_keeps_margin_below_clamp_edge():
    """The proof runs in fp64 on stored weights; the kernel computes from
    bf16-rounded values (~2^-8 relative per rounding). The budget must sit
    strictly inside the clamp window so 'bound <= budget' covers the
    arithmetic actually executed (round-4 review)."""
    from waifu2x_tensorrt_tpu.ops.kernel_math import _CLAMP_HI, _CLAMP_LO

    edge = min(-_CLAMP_LO, _CLAMP_HI)
    assert FAST_SOFTMAX_BUDGET <= 0.99 * edge


def test_bound_applies_ln_var_slack():
    """The ||x_hat|| <= sqrt(C) step of the proof holds only for EXACT
    LayerNorm arithmetic; the shipped bf16 LN forms can undershoot var
    and inflate it by up to kernel_math.LN_VAR_SLACK (round-4). The bound
    must carry that factor or 'bound <= budget' would not cover the
    arithmetic actually executed. Identity layer makes it analytic:
    gamma=1, beta=0, bias=0, table=0, Wq=Wk=I (nh=1, hd=C) gives
    a = sqrt(C*slack) and bound = a^2/sqrt(C) = sqrt(C)*slack."""
    import math

    from waifu2x_tensorrt_tpu.ops.kernel_math import LN_VAR_SLACK

    c = 16
    kernel = np.zeros((c, 3 * c), np.float32)
    kernel[:, :c] = np.eye(c)
    kernel[:, c:2 * c] = np.eye(c)
    norm1 = {"scale": np.ones(c, np.float32),
             "bias": np.zeros(c, np.float32)}
    qkv = {"kernel": kernel, "bias": np.zeros(3 * c, np.float32)}
    table = np.zeros((49, 1), np.float32)
    got = attention_logit_bound(norm1, qkv, table, num_heads=1)
    expected = math.sqrt(c) * LN_VAR_SLACK
    assert abs(got - expected) < 1e-9 * expected, (got, expected)
    assert LN_VAR_SLACK > 1.0  # the slack must actually widen the bound


def test_bound_walker_finds_layers_in_all_param_layouts():
    """The guard must see the same layers whether the model was created
    dense, with Pallas attention, or with whole-block fusion — the three
    layouts share flax scope names (norm1/attn/qkv), and the selection
    must not silently differ between build (dense trace) and load
    (fused trace)."""
    bounds = []
    for kw in ({}, {"use_pallas": True},
               {"use_pallas": True, "fused_block": True}):
        module, _ = registry.create_model("swin_unet/art", 2, -1,
                                          dtype=jnp.bfloat16, **kw)
        params = registry.init_params_host(module, tile=32, seed=3)
        bounds.append(swin_max_logit_bound(params))
    assert bounds[0] is not None
    assert bounds[0] == pytest.approx(bounds[1]) == pytest.approx(bounds[2])


def test_fused_fallback_preserves_guard_decision(tmp_path):
    """A fused-program failure rebuilds the model (attention-only
    kernels); the rebuilt module (and the packed-x twin, when present)
    must inherit the ORIGINAL guard decision rather than resetting to
    fast_softmax=True — a guarded checkpoint would otherwise silently
    render through the clamped softmax it provably exceeds (round-4
    review finding)."""
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    cfg = RenderConfig(precision=Precision.FP16, batch_size=1, height=32,
                       width=32, scaling=2, overlap=(1 / 16, 1 / 16))
    up = Upscaler(models_dir=tmp_path, allow_random_init=True)
    up.load("swin_unet/art", 2, -1, cfg)
    # simulate a checkpoint the guard rejected (the decision is carried
    # on the module, which is what the fallback must consult)
    up._module = up._module.clone(fast_softmax=False)
    up._fall_back_from_fused(RuntimeError("simulated fused failure"))
    assert up._module.fast_softmax is False
    assert up._fused is False
    # and the swapped-in model still renders
    frame = np.random.default_rng(2).integers(0, 256, (40, 40, 3),
                                              np.uint8)
    out = np.asarray(up.render(frame))
    assert out.shape == (80, 80, 3)
