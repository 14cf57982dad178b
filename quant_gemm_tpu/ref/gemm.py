"""Numpy golden GEMMs — ground truth for every TPU kernel.

Re-derivation of the reference's CPU goldens (``include/gemm_reference.h``,
``tests/unit/test_gemm_all_quants.cu:23-215``) in vectorized numpy.

Project GEMM convention (docs/CONVENTIONS.md): ``C[M, N] = A[M, K] @ W[N, K]^T``
with **M = tokens, N = output features** — the single convention that replaces
the reference's dual tutorial/optimized conventions (MNK_DEFINITION_ANALYSIS).

The W4A8 compensation math (gemm_reference.h:158-222)::

    x_a = q_a * d_a              (Q8_1)
    x_w = (q_w - 8) * d_w        (Q4_0, raw nibbles in [0, 15])
    dot = d_w * (d_a * sumi - 8 * s_a),   sumi = sum(q_a * q_w) exact int

Per-block integer dots are exact (int32); per-block float terms are computed
in f32 exactly like the CUDA kernels, but accumulated across blocks in f64 so
these goldens are strictly more accurate than any single-precision kernel.

Epilogue divergence (documented, deliberate): for Q4_1/Q5_1 the reference
applies ``m_w * s_a / 4`` once per block (gemm_quant_formats.cuh:146,264) —
a mis-transplant of llama.cpp's ``vec_dot_q4_1_q8_1_impl``, whose ``/4``
cancels the four calls per block llama.cpp makes.  The mathematically correct
once-per-block term is ``m_w * s_a`` (since ``s_a = d_a * sum(q_a)``), which
is also what llama.cpp computes in aggregate.  Default here is the correct
math; pass ``compat="reference"`` to reproduce the reference bit pattern.
"""

from __future__ import annotations

import numpy as np

from ..formats.blocks import QK, Q8_1Tensor
from ..formats.numpy_ref import codes, dequantize


def gemm_fp32(a: np.ndarray, w: np.ndarray) -> np.ndarray:
    """FP32 ground truth: C[M,N] = A[M,K] @ W[N,K]^T (gemm_reference.h:38-58)."""
    return np.asarray(a, np.float32) @ np.asarray(w, np.float32).T


def gemm_wxa16(a: np.ndarray, w_q) -> np.ndarray:
    """Float activations x quantized weights, online dequant.

    Covers the reference's W4A16 (gemm_reference.h:73-112) and W8A16 (:120-147)
    for any weight format.
    """
    return gemm_fp32(a, dequantize(w_q))


def _block_sumi(w_q, a_q: Q8_1Tensor) -> np.ndarray:
    """Exact integer block dots sumi[M, N, nb] from raw stored codes."""
    qw = codes(w_q)  # [N, K] int32, raw (unshifted) codes
    qa = codes(a_q)  # [M, K] int32
    n, k = qw.shape
    m = qa.shape[0]
    nb = k // QK
    qw = qw.reshape(n, nb, QK)
    qa = qa.reshape(m, nb, QK)
    return np.einsum("mbk,nbk->mnb", qa, qw, dtype=np.int64).astype(np.int64)


def gemm_wxa8(w_q, a_q: Q8_1Tensor, compat: str = "exact") -> np.ndarray:
    """Quantized weights x Q8_1 activations with per-format epilogue.

    Epilogues (all scales are f16 storage upcast to f32):

    * q4_0:  d_w * (d_a * sumi - 8 * s_a)      (gemm_reference.h:175-222)
    * q5_0:  d_w * (d_a * sumi - 16 * s_a)     (test_gemm_all_quants.cu:100)
    * q8_0:  d_w * d_a * sumi                  (gemm_reference.h:233-267)
    * q4_1/q5_1: d_w * d_a * sumi + m_w * s_a  (correct math; see module doc)
      with ``compat="reference"``: ``+ m_w * s_a / 4`` (reference bit pattern)
    """
    spec = w_q.spec
    sumi = _block_sumi(w_q, a_q).astype(np.float64)  # [M, N, nb]
    d_w = np.asarray(w_q.d, np.float32).astype(np.float64)  # [N, nb]
    d_a = np.asarray(a_q.d, np.float32).astype(np.float64)  # [M, nb]
    s_a = np.asarray(a_q.s, np.float32).astype(np.float64)  # [M, nb]

    if spec.has_min:
        m_w = np.asarray(w_q.m, np.float32).astype(np.float64)
        min_div = 4.0 if compat == "reference" else 1.0
        terms = (
            d_w[None, :, :] * d_a[:, None, :] * sumi
            + m_w[None, :, :] * s_a[:, None, :] / min_div
        )
    elif spec.offset:
        terms = d_w[None, :, :] * (
            d_a[:, None, :] * sumi - float(spec.offset) * s_a[:, None, :]
        )
    else:
        terms = d_w[None, :, :] * d_a[:, None, :] * sumi

    return terms.sum(axis=-1).astype(np.float32)


def gemm_w4a8(w_q, a_q: Q8_1Tensor) -> np.ndarray:
    """The reference's core W4A8 path (Q4_0 x Q8_1)."""
    assert w_q.spec.name == "q4_0"
    return gemm_wxa8(w_q, a_q)


def gemm_w8a8(w_q, a_q: Q8_1Tensor) -> np.ndarray:
    """Q8_0 x Q8_1 (no compensation needed)."""
    assert w_q.spec.name == "q8_0"
    return gemm_wxa8(w_q, a_q)


# ---------------------------------------------------------------------------
# llama.cpp-signature scalar vec_dots (gemm_reference.h:276-336)
# ---------------------------------------------------------------------------


def vec_dot_q4_0_q8_1(w_row, a_row) -> float:
    """Scalar dot of one Q4_0 row with one Q8_1 row, reference semantics.

    Accumulates per-block f32 terms sequentially in f32 — bit-matching the
    reference CPU loop (gemm_reference.h:276-306) up to rounding mode.
    """
    qw = codes(w_row).reshape(-1, QK)
    qa = codes(a_row).reshape(-1, QK)
    d_w = np.asarray(w_row.d, np.float32).ravel()
    d_a = np.asarray(a_row.d, np.float32).ravel()
    s_a = np.asarray(a_row.s, np.float32).ravel()
    total = np.float32(0.0)
    for b in range(qw.shape[0]):
        sumi = int((qa[b] * qw[b]).sum())
        total = np.float32(total + d_w[b] * (d_a[b] * np.float32(sumi) - np.float32(8.0) * s_a[b]))
    return float(total)


def vec_dot_q8_0_q8_1(w_row, a_row) -> float:
    """Scalar Q8_0 x Q8_1 dot (gemm_reference.h:311-336)."""
    qw = codes(w_row).reshape(-1, QK)
    qa = codes(a_row).reshape(-1, QK)
    d_w = np.asarray(w_row.d, np.float32).ravel()
    d_a = np.asarray(a_row.d, np.float32).ravel()
    total = np.float32(0.0)
    for b in range(qw.shape[0]):
        sumi = int((qa[b] * qw[b]).sum())
        total = np.float32(total + d_w[b] * d_a[b] * np.float32(sumi))
    return float(total)


__all__ = [
    "gemm_fp32",
    "gemm_wxa16",
    "gemm_wxa8",
    "gemm_w4a8",
    "gemm_w8a8",
    "vec_dot_q4_0_q8_1",
    "vec_dot_q8_0_q8_1",
]
