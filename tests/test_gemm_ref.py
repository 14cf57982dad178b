"""Golden GEMM tests: quantized goldens vs FP32 and vs scalar loops.

Thresholds follow the reference accuracy table (BASELINE.md):
W4A8 NMSE vs FP32 ~4.7e-3 at 512x4096x4096; per-format unit thresholds
Q4_0/Q4_1 0.015, Q5_x 0.01, Q8_0 0.005 (test_gemm_all_quants.cu:311-396).
"""

import numpy as np
import pytest

from quant_gemm_tpu.formats import numpy_ref
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.harness.metrics import NMSE_VS_FP32, ErrorMetrics
from quant_gemm_tpu.ref import gemm

M, N, K = 4, 48, 512  # tokens, out-features, reduction (small but multi-block)


@pytest.fixture(scope="module")
def data():
    a = datagen.normal((M, K), seed=42)
    w = datagen.normal((N, K), seed=43)
    return a, w


WEIGHT_FORMATS = ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0"]


@pytest.mark.parametrize("fmt", WEIGHT_FORMATS)
def test_wxa16_vs_fp32(fmt, data):
    a, w = data
    w_q = numpy_ref.QUANTIZE[fmt](w)
    ref = gemm.gemm_fp32(a, w)
    m = ErrorMetrics.compute(gemm.gemm_wxa16(a, w_q), ref)
    assert m.check(NMSE_VS_FP32[fmt]), (fmt, m)


@pytest.mark.parametrize("fmt", WEIGHT_FORMATS)
def test_wxa8_vs_fp32(fmt, data):
    a, w = data
    w_q = numpy_ref.QUANTIZE[fmt](w)
    a_q = numpy_ref.quantize_q8_1(a)
    ref = gemm.gemm_fp32(a, w)
    m = ErrorMetrics.compute(gemm.gemm_wxa8(w_q, a_q), ref)
    assert m.check(NMSE_VS_FP32[fmt]), (fmt, m)


def test_w4a8_matches_dequant_math():
    """The compensation formula must equal dequantize-then-matmul up to the
    f16 rounding of s_a (gemm_reference.h derivation :158-173)."""
    a = datagen.normal((2, 256), seed=1)
    w = datagen.normal((3, 256), seed=2)
    w_q = numpy_ref.quantize_q4_0(w)
    a_q = numpy_ref.quantize_q8_1(a)
    via_comp = gemm.gemm_w4a8(w_q, a_q)
    via_deq = gemm.gemm_fp32(numpy_ref.dequantize(a_q), numpy_ref.dequantize(w_q))
    # s_a is f16-rounded, so agreement is ~f16 epsilon relative, not exact
    m = ErrorMetrics.compute(via_comp, via_deq)
    assert m.nmse < 1e-5, m


def test_reference_compat_min_epilogue():
    """compat='reference' reproduces the reference's m*s/4 divergence; the
    default (correct) epilogue must beat it against FP32."""
    a = datagen.normal((4, 256), seed=5)
    w = datagen.normal((8, 256), seed=6) + 0.3  # nonzero mean makes m matter
    w_q = numpy_ref.quantize_q4_1(w)
    a_q = numpy_ref.quantize_q8_1(a)
    ref = gemm.gemm_fp32(a, w)
    good = ErrorMetrics.compute(gemm.gemm_wxa8(w_q, a_q), ref)
    bad = ErrorMetrics.compute(gemm.gemm_wxa8(w_q, a_q, compat="reference"), ref)
    assert good.nmse < NMSE_VS_FP32["q4_1"]
    assert bad.nmse > good.nmse


def test_vec_dot_matches_gemm():
    """Scalar vec_dots (llama.cpp signature analogues) agree with the matrix
    golden to f32-accumulation precision (<1e-6 rel, step5 target)."""
    k = 1024
    a = datagen.normal((1, k), seed=9)
    w = datagen.normal((1, k), seed=10)
    a_q = numpy_ref.quantize_q8_1(a)

    w_q = numpy_ref.quantize_q4_0(w)
    s = gemm.vec_dot_q4_0_q8_1(w_q, a_q)
    want = float(gemm.gemm_w4a8(w_q, a_q)[0, 0])
    assert abs(s - want) <= 1e-6 * max(1.0, abs(want))

    w_q8 = numpy_ref.quantize_q8_0(w)
    s8 = gemm.vec_dot_q8_0_q8_1(w_q8, a_q)
    want8 = float(gemm.gemm_w8a8(w_q8, a_q)[0, 0])
    assert abs(s8 - want8) <= 1e-6 * max(1.0, abs(want8))


def test_w8a8_no_compensation():
    a = datagen.normal((3, 128), seed=20)
    w = datagen.normal((5, 128), seed=21)
    w_q = numpy_ref.quantize_q8_0(w)
    a_q = numpy_ref.quantize_q8_1(a)
    m = ErrorMetrics.compute(gemm.gemm_w8a8(w_q, a_q), gemm.gemm_fp32(a, w))
    assert m.nmse < 1e-4, m
