"""Profiling and roofline accounting (reference §5.1 equivalents).

The reference's observability is cudaEvent timing + an ncu target binary;
the TPU equivalents here are:

* :func:`trace` — context manager around ``jax.profiler`` writing an xplane
  trace viewable in TensorBoard / xprof;
* :func:`roofline` — analytic per-kernel accounting from the block formats'
  exact byte counts (18/20/22/24/34/36 B per 32 elements), reporting the
  memory-bound and compute-bound time floors and which one binds.
"""

from __future__ import annotations

import contextlib
import dataclasses

from .benchmark import gemm_flops, weight_bytes

# TPU v5e single-chip peaks (HBM from the measured streaming probe,
# scripts/perf_lab.py; the 819 GB/s spec figure under-reports this part)
HBM_GBPS = 900.0
BF16_TFLOPS = 197.0
F32_TFLOPS = 197.0 / 8  # via high-precision passes
INT8_TOPS = 394.0


@contextlib.contextmanager
def trace(logdir: str = "/tmp/qgt-trace"):
    """Capture a device trace: ``with profiling.trace(): run()``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class Roofline:
    mem_time_us: float
    compute_time_us: float
    bytes: int
    flops: int

    @property
    def bound(self) -> str:
        return "memory" if self.mem_time_us >= self.compute_time_us else "compute"

    @property
    def time_us(self) -> float:
        return max(self.mem_time_us, self.compute_time_us)

    def efficiency(self, measured_time_s: float) -> float:
        """Fraction of the speed-of-light floor achieved."""
        return self.time_us / (measured_time_s * 1e6)


def roofline(
    qtype: str,
    m: int,
    n: int,
    k: int,
    act_bytes_per_elem: float = 2.0,
    mxu_tflops: float = BF16_TFLOPS,
) -> Roofline:
    """Speed-of-light floors for one quantized GEMM C[M,N]=A[M,K]W[N,K]^T."""
    byts = weight_bytes(qtype, n, k) + int(m * k * act_bytes_per_elem) + m * n * 4
    flops = gemm_flops(m, n, k)
    # MXU rows are fed in >=8-sublane granularity; tiny M rounds up
    m_eff = max(m, 8)
    eff_flops = 2 * m_eff * n * k
    return Roofline(
        mem_time_us=byts / HBM_GBPS / 1e3,
        compute_time_us=eff_flops / (mxu_tflops * 1e6),
        bytes=byts,
        flops=flops,
    )


__all__ = ["trace", "roofline", "Roofline", "HBM_GBPS", "BF16_TFLOPS", "INT8_TOPS"]
