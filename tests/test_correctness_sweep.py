"""Correctness sweep — reference tests/test_correctness.cu analogue.

The reference sweeps 6 shapes / 93,440 outputs through its best kernel and
requires 99.98% of outputs within tolerance of the quantized CPU golden
(max rel err 0.47% — docs/final_optimization_report.md:171-187).  Here the
serving ``dispatch`` (decode -> exact int kernel, larger M -> dequant MXU
kernel) is swept over 6 shapes totalling ~87k outputs and held to the same
two-level contract:

* vs the integer golden: decode shapes bit-near-exact (NMSE < 1e-12),
  dequant shapes within the bf16-rounding envelope;
* vs FP32: NMSE within the q4_0 budget on every shape.
"""

import numpy as np
import pytest

from quant_gemm_tpu.formats import jax_quant, numpy_ref
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.harness.metrics import NMSE_VS_FP32, ErrorMetrics
from quant_gemm_tpu.kernels import dispatch, prepare
from quant_gemm_tpu.ref import gemm as refg

# (M tokens, N out-features, K) — decode and prefill regimes mixed
SWEEP = [
    (1, 512, 512),
    (3, 384, 1024),
    (4, 512, 2048),
    (8, 640, 512),
    (16, 1024, 1024),
    (96, 768, 512),
]


@pytest.mark.parametrize("m,n,k", SWEEP)
def test_sweep_shape(m, n, k):
    a = datagen.normal((m, k), seed=m + k)
    w = datagen.normal((n, k), seed=n)
    w_q = numpy_ref.quantize_q4_0(w)
    a_q = numpy_ref.quantize_q8_1(a)
    out = np.asarray(dispatch(prepare(w_q), jax_quant.device_put(a_q)))
    assert out.shape == (m, n)

    gold_int = refg.gemm_wxa8(w_q, a_q)
    m_int = ErrorMetrics.compute(out, gold_int)
    if m <= 12:  # exact int kernel route
        assert m_int.nmse < 1e-12, (m, n, k, m_int)
        # the reference's within-tolerance fraction, vs the quantized golden
        denom = np.maximum(np.abs(gold_int), 1e-3)
        rel = np.abs(out - gold_int) / denom
        frac_ok = float((rel < 0.01).mean())
        assert frac_ok > 0.9998, (m, n, k, frac_ok)
    else:  # dequant MXU kernel: bf16 activation rounding envelope
        assert m_int.nmse < 1e-4, (m, n, k, m_int)

    m_fp = ErrorMetrics.compute(out, refg.gemm_fp32(a, w))
    assert m_fp.nmse < NMSE_VS_FP32["q4_0"], (m, n, k, m_fp)


def test_sweep_total_outputs():
    total = sum(m * n for m, n, _ in SWEEP)
    assert total >= 85_000  # reference: 93,440 outputs over 6 shapes
