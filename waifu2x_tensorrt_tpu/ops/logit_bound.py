"""Per-checkpoint attention-logit bound for the fast-softmax guard.

kernel_math.softmax_lastdim's no-max-subtract fast path clamps logits to
[_CLAMP_LO, _CLAMP_HI]; that is exact only while every TRUE logit a
checkpoint can produce stays inside the clamp window. Rather than trusting
an O(10) argument (ADVICE r2 medium finding; VERDICT r3 item 4), the loader
computes a rigorous worst-case bound from the weights and selects the
exact (max-subtracted) softmax whenever the bound exceeds the clamp
budget.

Derivation, per attention layer and head (window attention over pre-norm
LayerNorm output):

  x_hat = LN-normalized token (before affine): with exact arithmetic
          sum(x_hat^2) = C * var / (var + eps) <= C; the shipped bf16 LN
          forms can undershoot var, inflating this by at most
          kernel_math.LN_VAR_SLACK (1.26 — derivation at its
          definition), so ||x_hat||_2 <= sqrt(C * LN_VAR_SLACK).
  y     = gamma * x_hat + beta:
          ||y||_2 <= max|gamma| sqrt(C * LN_VAR_SLACK) + ||beta||_2
  q     = Wq^T y + bq:           ||q||_2 <= sigma_max(Wq) ||y|| + ||bq||_2
  logit = q . k / sqrt(hd) + bias[table]:
          |logit| <= ||q|| ||k|| / sqrt(hd) + max|table|   (Cauchy-Schwarz)

sigma_max is the exact spectral norm of the (C, hd) head slice — eigh of
the (hd, hd) gram, microseconds at these sizes. Every step is a true upper
bound, so `bound <= budget` PROVES the fast path is clamp-free for any
input image; the converse (bound > budget) is conservative — the guard
then costs only the ~0.3 ms/block max-subtract pass (BENCH_NOTES r2).

No reference analogue: the reference's softmax lives inside TensorRT's
closed kernels (SURVEY.md component 22).
"""

from __future__ import annotations

import math
from collections.abc import Mapping
from typing import Optional

import numpy as np

from waifu2x_tensorrt_tpu.ops.kernel_math import LN_VAR_SLACK


def _spectral_norm(w: np.ndarray) -> float:
    """Exact largest singular value of a (C, hd) matrix via the smaller
    gram's eigendecomposition."""
    w = np.asarray(w, np.float64)
    g = w.T @ w if w.shape[0] >= w.shape[1] else w @ w.T
    return float(math.sqrt(max(np.linalg.eigvalsh(g)[-1], 0.0)))


def attention_logit_bound(norm1: dict, qkv: dict, bias_table: np.ndarray,
                          num_heads: int) -> float:
    """Worst-case |attention logit| for one pre-norm window-attention layer.

    Args:
      norm1: {"scale", "bias"} of the LayerNorm feeding the qkv projection.
      qkv: {"kernel" (C, 3C), "bias" (3C,)} packed q|k|v projection.
      bias_table: ((2w-1)^2, nh) relative-position-bias table.
      num_heads: head count (C = kernel.shape[0], hd = C // num_heads).
    """
    gamma = np.asarray(norm1["scale"], np.float64)
    beta = np.asarray(norm1["bias"], np.float64)
    kernel = np.asarray(qkv["kernel"], np.float64)
    qkv_b = np.asarray(qkv["bias"], np.float64)
    table = np.asarray(bias_table, np.float64)
    c = kernel.shape[0]
    hd = c // num_heads
    # sqrt(C * LN_VAR_SLACK): bf16 LN reduction error can undershoot var,
    # inflating ||x_hat|| past the exact-math sqrt(C) — see LN_VAR_SLACK
    # in ops/kernel_math.py for the per-form worst cases.
    a = float(np.max(np.abs(gamma))) * math.sqrt(c * LN_VAR_SLACK) + float(
        np.linalg.norm(beta))
    worst = 0.0
    for h in range(num_heads):
        wq = kernel[:, h * hd:(h + 1) * hd]
        wk = kernel[:, c + h * hd:c + (h + 1) * hd]
        bq = float(np.linalg.norm(qkv_b[h * hd:(h + 1) * hd]))
        bk = float(np.linalg.norm(qkv_b[c + h * hd:c + (h + 1) * hd]))
        nq = _spectral_norm(wq) * a + bq
        nk = _spectral_norm(wk) * a + bk
        bound = nq * nk / math.sqrt(hd) + float(np.max(np.abs(table[:, h])))
        worst = max(worst, bound)
    return worst


def _walk(tree: Mapping, out: list) -> None:
    # Mapping, not dict: flax FrozenDict trees (and any other Mapping the
    # caller hands us) must walk identically — a plain-dict-only walk
    # would fail OPEN on them (no layers found -> no guard).
    attn = tree.get("attn")
    norm1 = tree.get("norm1")
    if (isinstance(attn, Mapping) and isinstance(norm1, Mapping)
            and "qkv" in attn and "relative_position_bias" in attn):
        out.append((norm1, attn["qkv"], attn["relative_position_bias"]))
    for v in tree.values():
        if isinstance(v, Mapping):
            _walk(v, out)


def swin_max_logit_bound(params) -> Optional[float]:
    """Max attention_logit_bound over every Swin block in a param tree
    (dense and fused param layouts share scope names norm1/attn/qkv).
    Returns None when the tree holds no window-attention layers — the
    CALLER must treat None as 'no proof' and fail closed for any module
    that actually contains attention (engine/upscaler._guard_fast_softmax)."""
    layers: list = []
    if isinstance(params, Mapping):
        _walk(params, layers)
    if not layers:
        return None
    worst = 0.0
    for norm1, qkv, table in layers:
        tbl = np.asarray(table)
        nh = tbl.shape[-1]
        worst = max(worst, attention_logit_bound(norm1, qkv, tbl, nh))
    return worst
