"""Lab: half-stored weight scales A/B at the champion decode shape.

With the x8 kernel at the DMA floor (docs/PERF_NOTES.md round-3 campaign:
kernel 50-52 us vs pure-probe 51.7 us at 4096x4x14336), the f32 scale
planes are the largest remaining byte source: 1792 of 8960 B/row (20%).
Storing the IEEE-f16 bits as int16 (bit-identical decode at tile entry —
tests/test_f16_scales.py) cuts the stream ~10%; round 1 rejected this
while COMPUTE-bound, this lab re-measures it DMA-bound.

Interleaved reps (f32 vs f16 alternating) like lab_x8, so chip-state drift
cannot masquerade as a kernel delta.

Usage: python scripts/lab_f16scales.py [M]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from quant_gemm_tpu.formats import jax_quant, numpy_ref  # noqa: E402
from quant_gemm_tpu.harness import benchmark as bm  # noqa: E402
from quant_gemm_tpu.kernels import gemm_pallas  # noqa: E402
from quant_gemm_tpu.kernels.gemm_exact import (  # noqa: E402
    gemm_exact,
    gemm_exact_fused,
)

N_FEAT, K = 4096, 14336


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(f"shape: out-features {N_FEAT} x tokens {m} x K {K}", flush=True)
    rng = np.random.default_rng(0)
    w = rng.normal(0, 1, (N_FEAT, K)).astype(np.float32)
    a = rng.normal(0, 1, (m, K)).astype(np.float32)
    wq = numpy_ref.quantize_q4_0(w)
    w32 = jax.device_put(gemm_pallas.prepare(wq, scales_dtype=np.float32))
    w16 = jax.device_put(gemm_pallas.prepare(wq, scales_dtype=np.float16))
    aq = jax_quant.device_put(numpy_ref.quantize_q8_1(a))
    ax = jnp.asarray(a)

    o32 = np.asarray(gemm_exact(w32, aq))
    o16 = np.asarray(gemm_exact(w16, aq))
    print(f"f16-scales bit-identical to f32: {(o32 == o16).all()}",
          flush=True)

    flops = bm.gemm_flops(m, N_FEAT, K)
    # dispatch-path denominator: actual prepared bytes (incl. padding and
    # the real scale dtype) + activation/output bytes, matching bench.py
    act_by = m * K + (K // 32) * m * 12 + m * N_FEAT * 4
    by32 = bm.prepared_bytes(w32) + act_by
    by16 = bm.prepared_bytes(w16) + act_by

    variants = [
        ("exact f32-scales", gemm_exact, (w32, aq), by32),
        ("exact f16-scales", gemm_exact, (w16, aq), by16),
        ("fused f32-scales", gemm_exact_fused, (w32, ax), by32),
        ("fused f16-scales", gemm_exact_fused, (w16, ax), by16),
    ]
    results = []
    n_reps = 5
    for rep in range(n_reps):
        for name, fn, args, by in variants:
            r = bm.benchmark_kernel(
                fn, args, name=f"{name} #{rep}",
                flops=flops, bytes_accessed=by)
            gbps_roof = r.bytes / r.time_s / 1e9 / 819 * 100
            print(f"  {r.row()}  roofline={gbps_roof:.0f}%", flush=True)
            if r.valid:
                results.append(r)

    import statistics

    byname: dict[str, list] = {}
    for r in results:
        byname.setdefault(r.name.rsplit(" #", 1)[0], []).append(r.time_s)
    print(f"\nmedian-of-{n_reps} per variant (steady state):", flush=True)
    for key, ts in byname.items():
        med = statistics.median(ts)
        print(f"  {key:<20s} {med*1e6:8.1f} us  best {min(ts)*1e6:8.1f} us",
              flush=True)


if __name__ == "__main__":
    main()
