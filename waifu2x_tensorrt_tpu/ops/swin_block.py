"""Fully fused Swin transformer block as a single Pallas TPU kernel.

One kernel computes, per block of windows, the ENTIRE pre-norm transformer
block:

    LN1 -> qkv GEMM -> per-head window attention (+rel bias, +shift mask)
        -> proj GEMM -> residual -> LN2 -> fc1 GEMM -> erf GELU
        -> fc2 GEMM -> residual

so activations touch HBM exactly twice (read x, write out) instead of the
~10 round-trips of the op-by-op XLA lowering. All weights fit VMEM
(C<=192: qkv 0.11 MB + proj 0.07 + mlp 0.3 MB in bf16). The GEMMs flatten
windows to (wb*64, C) so the MXU sees well-shaped matrices; attention
follows the packed-qkv head-slicing scheme of
ops/window_attention.py::fused_window_attention_qkv (see there for the
analytic shift-mask derivation).

The caller supplies window-partitioned inputs (BW, N, C); cyclic shift and
window partition/merge stay in XLA (cheap strided copies).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waifu2x_tensorrt_tpu.ops.kernel_math import gelu as _gelu
from waifu2x_tensorrt_tpu.ops.kernel_math import (
    keep_from_flags as _keep_from_flags,
)
from waifu2x_tensorrt_tpu.ops.kernel_math import layernorm as _layernorm
from waifu2x_tensorrt_tpu.ops.kernel_math import (
    shift_crossing as _shift_crossing,
)
from waifu2x_tensorrt_tpu.ops.kernel_math import softmax_lastdim as _softmax


def _block_body(x, flags, flags_b, n1s, n1b, qkvk, qkvb, bias, projk,
                projb, n2s, n2b, fc1k, fc1b, fc2k, fc2b,
                *, ws, shift, wb, nh, hd, pair, fast_softmax=True):
    """The whole transformer block on VMEM values: x (wb, Nt, C) window
    tokens -> (wb, Nt, C). flags/flags_b: (wb, 1) int32 shift-boundary
    bits (flags_b only when ``pair``).

    ``pair``: each row block holds TWO windows (Nt = 2*ws*ws) — the
    attention matmuls run at M=K=128 (full MXU sublanes; the unpaired
    M=64 wastes half) and the (Nt, Nt) softmax at full 128-lane VPU
    width. Cross-window entries are killed by a same-window mask
    multiplied in after exp (exactly like the shift masks), so the
    result is bitwise the per-window math; FLOPs double on QK/AV but
    MXU passes halve."""
    N = ws * ws
    Nt = x.shape[1]
    C = nh * hd
    dtype = x.dtype
    # bf16 compute opts into the fast VPU math (kernel_math precision
    # policy); fp32 keeps the numerically-strict forms. The no-max-subtract
    # softmax additionally requires the checkpoint's proven logit bound to
    # clear the clamp budget (ops/logit_bound.py via fast_softmax).
    exact = dtype != jnp.bfloat16
    exact_sm = exact or not fast_softmax

    h = _layernorm(x, n1s, n1b, exact=exact).astype(dtype)
    qkv = jax.lax.dot_general(
        h, qkvk.astype(dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (wb, Nt, 3C)
    qkv = (qkv + qkvb.astype(jnp.float32)).astype(dtype)

    keep = None
    if shift or pair:
        tok = jax.lax.broadcasted_iota(jnp.int32, (Nt, Nt), 0)
        tok_m = jax.lax.broadcasted_iota(jnp.int32, (Nt, Nt), 1)
        if pair:
            keep = ((tok // N) == (tok_m // N))[None]  # (1, Nt, Nt)
    if shift:
        # window-LOCAL token indices: in pair mode tok spans two windows
        row_cross, col_cross = _shift_crossing(tok % N, tok_m % N, ws,
                                               shift)
        if pair:
            # the flag governing an entry is the ROW token's window's —
            # select via int arithmetic (Mosaic rejects bool selects)
            rw = jax.lax.broadcasted_iota(jnp.int32, (Nt, 1), 0) // N
            f_row = (flags[:, None, :] * (1 - rw)[None]
                     + flags_b[:, None, :] * rw[None])  # (wb, Nt, 1)
            bottom = (f_row & 1) > 0
            right = (f_row & 2) > 0
        else:
            bottom = ((flags & 1) > 0)[:, :, None]
            right = ((flags & 2) > 0)[:, :, None]
        keep_cross = _keep_from_flags(bottom, right, row_cross[None],
                                      col_cross[None])
        # (wb, Nt, Nt); zeroed after exp in softmax
        keep = keep_cross if keep is None else (keep & keep_cross)

    scale = jnp.asarray(hd ** -0.5, dtype)
    # MXU-fill variants, each bitwise-exact vs the plain per-head form and
    # measured on v5e (2026-08-16, stage geometries at batch 16):
    #   wide_attn (C==96 stages, -0.22 ms/block): QK contracts over hd=32,
    #   12.5% of the MXU's K dim — zero-padding q/k to K=128 is faster
    #   despite 4x the nominal FLOPs; AV output (minor dim hd=32) is
    #   replaced by per-head-masked dots against the full 96-lane v with
    #   an fp32 accumulate. For C==192 the same tricks LOSE (~+0.08 ms:
    #   more heads -> more pad traffic, fuller base ops), so stage-2 keeps
    #   the per-head slicing.
    wide_attn = C <= 96 and hd < 128
    if wide_attn:
        zpad = jnp.zeros((x.shape[0], Nt, 128 - hd), dtype)
        v_all = qkv[:, :, 2 * C:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    head_outs = []
    acc = None
    for head in range(nh):
        q = qkv[:, :, head * hd:(head + 1) * hd]
        k = qkv[:, :, C + head * hd:C + (head + 1) * hd]
        if wide_attn:
            attn = jax.lax.dot_general(
                jnp.concatenate([q * scale, zpad], -1),
                jnp.concatenate([k, zpad], -1),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        else:
            attn = jax.lax.dot_general(
                q * scale, k,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        attn = attn + bias[head][None].astype(jnp.float32)
        attn = _softmax(attn, exact=exact_sm, keep=keep)
        if wide_attn:
            head_sel = (lane >= head * hd) & (lane < (head + 1) * hd)
            vm = jnp.where(head_sel, v_all, jnp.zeros_like(v_all))
            part = jax.lax.dot_general(
                attn.astype(dtype), vm,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        else:
            v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
            head_outs.append(jax.lax.dot_general(
                attn.astype(dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype))
    a = (acc.astype(dtype) if wide_attn
         else jnp.concatenate(head_outs, axis=-1))  # (wb, N, C)

    a = jax.lax.dot_general(
        a, projk.astype(dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a = a + projb.astype(jnp.float32)
    x1 = x + a.astype(dtype)

    m = _layernorm(x1, n2s, n2b, exact=exact).astype(dtype)
    z = jax.lax.dot_general(
        m, fc1k.astype(dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z = z + fc1b.astype(jnp.float32)
    g = _gelu(z, exact=exact).astype(dtype)
    out = jax.lax.dot_general(
        g, fc2k.astype(dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out + fc2b.astype(jnp.float32)
    return x1 + out.astype(dtype)


def _kernel(x_ref, n1s_ref, n1b_ref, qkvk_ref, qkvb_ref, bias_ref,
            flags_ref, flagsb_ref, projk_ref, projb_ref, n2s_ref, n2b_ref,
            fc1k_ref, fc1b_ref, fc2k_ref, fc2b_ref, o_ref,
            *, ws, shift, wb, nh, hd, pair, fast_softmax):
    o_ref[:] = _block_body(
        x_ref[:], flags_ref[:], flagsb_ref[:], n1s_ref[0], n1b_ref[0],
        qkvk_ref[:], qkvb_ref[0], bias_ref[:], projk_ref[:], projb_ref[0],
        n2s_ref[0], n2b_ref[0], fc1k_ref[:], fc1b_ref[0], fc2k_ref[:],
        fc2b_ref[0], ws=ws, shift=shift, wb=wb, nh=nh, hd=hd, pair=pair,
        fast_softmax=fast_softmax)


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "shift", "ws", "block_windows", "interpret", "pair",
    "fast_softmax"))
def fused_swin_block(x, params, bias, flags, *, num_heads: int,
                     shift: int = 0, ws: int = 8, block_windows: int = 32,
                     interpret: bool = False, pair: bool = False,
                     fast_softmax: bool = True):
    """Run one full Swin block over window-partitioned tokens.

    Args:
      x: (BW, N, C) window tokens.
      params: dict with n1_scale, n1_bias, qkv_kernel (C,3C), qkv_bias,
        proj_kernel (C,C), proj_bias, n2_scale, n2_bias, fc1_kernel (C,2C),
        fc1_bias, fc2_kernel (2C,C), fc2_bias — float32.
      bias: (nh, N, N) float32 relative-position bias (pre-gathered).
      flags: (BW,) int32 shift-boundary bits.
      pair: fold two consecutive windows per attention row block (M=128
        MXU matmuls + 128-lane softmax; see _block_body). Requires BW
        even; same math, cross-window terms masked to exactly 0.
      fast_softmax: allow the no-max-subtract softmax on bf16; pass False
        when the checkpoint's logit bound exceeds the clamp budget
        (ops/logit_bound.py).
    Returns:
      (BW, N, C) in x.dtype.
    """
    BW, N, C = x.shape
    hd = C // num_heads
    pair = pair and BW % 2 == 0 and N * 2 <= 256
    if pair:
        rows, Nt = BW // 2, 2 * N
        # leading-dim merge: the two windows of a pair are contiguous in
        # memory, so this reshape is layout-free
        x = x.reshape(rows, Nt, C)
        flags_a = flags[0::2]
        flags_b = flags[1::2]
        zb = jnp.zeros_like(bias)
        bias = jnp.concatenate([
            jnp.concatenate([bias, zb], -1),
            jnp.concatenate([zb, bias], -1)], -2)  # (nh, Nt, Nt) blockdiag
        wb = max(1, min(block_windows, BW) // 2)
    else:
        rows, Nt = BW, N
        flags_a = flags
        flags_b = flags  # unused in-kernel when not pair
        wb = min(block_windows, BW)
    pad = (-rows) % wb
    if pad:
        x = jnp.pad(x, [(0, pad), (0, 0), (0, 0)])
        flags_a = jnp.pad(flags_a, (0, pad))
        flags_b = jnp.pad(flags_b, (0, pad))
    n_blocks = (rows + pad) // wb

    def vec(name, dim):
        return params[name].reshape(1, dim)

    mlp_dim = params["fc1_kernel"].shape[1]
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                                      memory_space=pltpu.VMEM)
    blocked3 = pl.BlockSpec((wb, Nt, C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    flag_spec = pl.BlockSpec((wb, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            blocked3,                                   # x
            full((1, C)), full((1, C)),                 # n1 scale/bias
            full((C, 3 * C)), full((1, 3 * C)),         # qkv
            full((num_heads, Nt, Nt)),                  # rel bias
            flag_spec, flag_spec,                       # flags a/b
            full((C, C)), full((1, C)),                 # proj
            full((1, C)), full((1, C)),                 # n2 scale/bias
            full((C, mlp_dim)), full((1, mlp_dim)),     # fc1
            full((mlp_dim, C)), full((1, C)),           # fc2
        ],
        out_specs=blocked3,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, ws=ws, shift=shift, wb=wb,
                          nh=num_heads, hd=hd, pair=pair,
                          fast_softmax=fast_softmax),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows + pad, Nt, C), x.dtype),
        interpret=interpret,
    )(
        x,
        vec("n1_scale", C), vec("n1_bias", C),
        # GEMM weights ship to VMEM in the COMPUTE dtype (round-4 review):
        # the kernel multiplies in x.dtype anyway (in-kernel astype), so
        # pre-casting outside is bit-identical while halving the bf16
        # path's weight block VMEM footprint and DMA traffic. Biases and
        # LN params stay f32 — the kernel consumes them in f32.
        params["qkv_kernel"].astype(x.dtype), vec("qkv_bias", 3 * C),
        bias,
        flags_a.reshape(-1, 1).astype(jnp.int32),
        flags_b.reshape(-1, 1).astype(jnp.int32),
        params["proj_kernel"].astype(x.dtype), vec("proj_bias", C),
        vec("n2_scale", C), vec("n2_bias", C),
        params["fc1_kernel"].astype(x.dtype), vec("fc1_bias", mlp_dim),
        params["fc2_kernel"].astype(x.dtype), vec("fc2_bias", C),
    )
    if pad:
        out = out[:rows]
    return out.reshape(BW, N, C) if pair else out

