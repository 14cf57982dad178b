"""Error metrics for differential testing.

Mirrors the reference's ``ErrorMetrics`` (tests/framework/test_framework.cuh:34-77)
and resolves its dual-NMSE ambiguity (SURVEY §2.10.4): the framework normalizes
by sum(ref^2), the bench utils and the Python spec runner normalize by
variance.  Both are provided; ``nmse`` (sum-of-squares) is the default used by
kernel thresholds, matching the thresholds quoted in the reference unit tests
(Q4_0/Q4_1: 0.015, Q5_x: 0.01, Q8_0: 0.005).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class ErrorMetrics:
    mse: float
    nmse: float  # mse / mean(ref^2)   (test_framework.cuh:62)
    nmse_var: float  # mse / var(ref)  (test_utils.h:135-153, python runner)
    max_abs: float
    mean_abs: float

    def check(self, threshold: float) -> bool:
        return bool(np.isfinite(self.nmse)) and self.nmse < threshold

    @staticmethod
    def compute(result, reference) -> "ErrorMetrics":
        res = np.asarray(result, np.float64).ravel()
        ref = np.asarray(reference, np.float64).ravel()
        assert res.shape == ref.shape, (res.shape, ref.shape)
        err = res - ref
        mse = float(np.mean(err**2))
        denom = float(np.mean(ref**2))
        var = float(np.var(ref))
        return ErrorMetrics(
            mse=mse,
            nmse=mse / denom if denom > 0 else (0.0 if mse == 0 else np.inf),
            nmse_var=mse / var if var > 0 else (0.0 if mse == 0 else np.inf),
            max_abs=float(np.max(np.abs(err))) if err.size else 0.0,
            mean_abs=float(np.mean(np.abs(err))) if err.size else 0.0,
        )


# Per-format NMSE thresholds vs the quantized golden and vs FP32
# (tests/unit/test_gemm_all_quants.cu:311-396 and README accuracy tables).
NMSE_VS_FP32 = {
    "q4_0": 0.015,
    "q4_1": 0.015,
    "q5_0": 0.01,
    "q5_1": 0.01,
    "q8_0": 0.005,
    "q8_1": 0.005,
}

# Kernel vs integer-golden agreement: the reference observes <1e-13 because
# CPU and GPU run identical integer math; our Pallas kernels share exact int
# block dots with the golden but accumulate across blocks in f32 while the
# golden accumulates in f64, so the bound is f32 accumulation error.
NMSE_KERNEL_VS_GOLDEN = 1e-9


__all__ = ["ErrorMetrics", "NMSE_VS_FP32", "NMSE_KERNEL_VS_GOLDEN"]
