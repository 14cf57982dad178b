"""XLA (plain jnp) GEMM rungs of the kernel ladder.

These are the TPU analogues of the reference's *naive/tutorial* kernels
(``include/gemm_cuda_naive.cuh``): correct for every format, fully fused by
XLA, no hand-written memory schedule.  The Pallas kernels in
:mod:`quant_gemm_tpu.kernels.gemm_pallas` are the optimized ladder.

Convention: ``C[M, N] = A[M, K] @ W[N, K]^T`` (M = tokens, N = out-features).

Three rungs:

* :func:`gemm_wxa16_xla` — dequantize-then-matmul, float activations
  (reference ``gemm_w4a16_naive_kernel`` analogue).
* :func:`gemm_wxa8_scaled_xla` — per-block scales folded into both operands,
  single f32 matmul.  Mathematically equal to the compensation formula with
  the *exact* code sum instead of the f16-rounded ``s_a`` (strictly more
  accurate than the reference formula).
* :func:`gemm_wxa8_compensated_xla` — the reference's W4A8 semantics
  (gemm_reference.h:175-222) vectorized: raw-code matmul plus the rank-nb
  compensation term ``offset * (s_a @ d_w^T)`` — exploiting the
  factorization noted in SURVEY §7.4 that the reference never makes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import jax_quant
from ..formats.blocks import QK, Q8_1Tensor


def gemm_fp32_xla(a: jax.Array, w: jax.Array) -> jax.Array:
    """FP32 baseline: C = A @ W^T."""
    return jnp.dot(a, w.T, preferred_element_type=jnp.float32)


def gemm_wxa16_xla(w_q, a: jax.Array) -> jax.Array:
    """Float activations x any quantized weight format, online dequant."""
    w = jax_quant.dequantize(w_q, jnp.float32)
    return jnp.dot(a.astype(jnp.float32), w.T, preferred_element_type=jnp.float32)


def _scaled_operand(qs_codes: jax.Array, d: jax.Array, offset: int) -> jax.Array:
    return (qs_codes - offset).astype(jnp.float32) * jax_quant.expand_scale(d)


def gemm_wxa8_scaled_xla(w_q, a_q: Q8_1Tensor) -> jax.Array:
    """Fold per-block scales into both operands; one f32 matmul.

    Equivalent to the compensation formula with exact integer sums; the
    most accurate quantized path.
    """
    w = jax_quant.dequantize(w_q, jnp.float32)  # handles offset and min
    a = _scaled_operand(jax_quant.codes(a_q), a_q.d, 0)
    return jnp.dot(a, w.T, preferred_element_type=jnp.float32)


def gemm_wxa8_compensated_xla(w_q, a_q: Q8_1Tensor, compat: str = "exact") -> jax.Array:
    """Reference W4A8 semantics as two matmuls.

    ``d_w*(d_a*sumi - off*s_a)`` summed over blocks splits into:

    * main term: ``(q_a * d_a) @ (q_w_raw * d_w)^T`` — raw (unshifted) codes
      with scales folded per block;
    * compensation: ``- off * (s_a @ d_w^T)`` — a tiny [M,nb]x[nb,N] matmul,
      because the second term is independent of sumi (SURVEY §7.4).

    For q4_1/q5_1 the compensation becomes ``+ s_a @ m_w^T`` (correct math;
    ``compat="reference"`` reproduces the reference's /4 divergence, see
    ref/gemm.py module docstring).
    """
    spec = w_q.spec
    w_raw = _scaled_operand(jax_quant.codes(w_q), w_q.d, 0)
    a = _scaled_operand(jax_quant.codes(a_q), a_q.d, 0)
    main = jnp.dot(a, w_raw.T, preferred_element_type=jnp.float32)
    s_a = a_q.s.astype(jnp.float32)
    if spec.has_min:
        m_w = w_q.m.astype(jnp.float32)
        div = 4.0 if compat == "reference" else 1.0
        return main + jnp.dot(s_a, m_w.T, preferred_element_type=jnp.float32) / div
    if spec.offset:
        d_w = w_q.d.astype(jnp.float32)
        return main - float(spec.offset) * jnp.dot(
            s_a, d_w.T, preferred_element_type=jnp.float32
        )
    return main


def gemm_wxa8_int_xla(w_q, a_q: Q8_1Tensor, compat: str = "exact") -> jax.Array:
    """Exact-integer differential path: per-block int32 dots + f32 epilogue.

    Materializes ``sumi[M, N, nb]`` — O(M*N*K/32) memory — so this is a
    correctness oracle for device-side parity testing, not a serving path.
    """
    spec = w_q.spec
    qw = jax_quant.codes(w_q).astype(jnp.int8 if spec.qmax <= 127 else jnp.int32)
    qa = jax_quant.codes(a_q).astype(jnp.int8)
    n, k = qw.shape
    m = qa.shape[0]
    nb = k // QK
    sumi = jax.lax.dot_general(
        qa.reshape(m, nb, QK).transpose(1, 0, 2),
        qw.reshape(n, nb, QK).transpose(1, 0, 2),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [nb, M, N]
    sumi = sumi.astype(jnp.float32)
    d_w = w_q.d.astype(jnp.float32).T[:, None, :]  # [nb, 1, N]
    d_a = a_q.d.astype(jnp.float32).T[:, :, None]  # [nb, M, 1]
    s_a = a_q.s.astype(jnp.float32).T[:, :, None]
    if spec.has_min:
        m_w = w_q.m.astype(jnp.float32).T[:, None, :]
        div = 4.0 if compat == "reference" else 1.0
        terms = d_w * d_a * sumi + m_w * s_a / div
    elif spec.offset:
        terms = d_w * (d_a * sumi - float(spec.offset) * s_a)
    else:
        terms = d_w * d_a * sumi
    return terms.sum(axis=0)


__all__ = [
    "gemm_fp32_xla",
    "gemm_wxa16_xla",
    "gemm_wxa8_scaled_xla",
    "gemm_wxa8_compensated_xla",
    "gemm_wxa8_int_xla",
]
