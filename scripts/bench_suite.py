"""Kernel bake-off over real Llama shapes (reference tests/benchmark_best.cu
and tests/test_llama_shapes.cu:247-290 analogue).

Sweeps the kernel ladder over decode (tokens 1..8) and prefill (512) shapes
at N=4096 out-features, K in {4096, 14336}, for q4_0 and q8_0 weights, and
prints a TFLOPS / GB/s / %-roofline table plus accuracy vs the FP32 golden.

Usage:  python scripts/bench_suite.py [--quick] [--format q4_0] [--out FILE]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from quant_gemm_tpu.formats import jax_quant, numpy_ref  # noqa: E402
from quant_gemm_tpu.harness import benchmark as bm  # noqa: E402
from quant_gemm_tpu.harness import datagen  # noqa: E402
from quant_gemm_tpu.harness.metrics import ErrorMetrics  # noqa: E402
from quant_gemm_tpu.kernels import dispatch, gemm_pallas  # noqa: E402
from quant_gemm_tpu.ref import gemm as refg  # noqa: E402

HBM_GBPS = 900.0  # measured streaming roofline (docs/PERF_NOTES.md)


def run(fmt: str, shapes, out_path: str | None):
    records = []
    for n_feat, k in [(4096, 14336), (4096, 4096)]:
        w = datagen.normal((n_feat, k), seed=2)
        if fmt == "q4_k":
            from quant_gemm_tpu.formats import kquants

            w_q = kquants.to_effective(kquants.quantize_q4_k(w))
        elif fmt == "q5_k":
            from quant_gemm_tpu.formats import kquants

            w_q = kquants.to_effective_q5_k(kquants.quantize_q5_k(w))
        else:
            w_q = numpy_ref.QUANTIZE[fmt](w)
        wp = jax.device_put(gemm_pallas.prepare(w_q))
        wb = bm.weight_bytes(fmt, n_feat, k)
        for m in shapes:
            a = datagen.normal((m, k), seed=1)
            a_q = jax_quant.device_put(numpy_ref.quantize_q8_1(a))
            # accuracy gate (small slice to keep the golden cheap)
            out = dispatch(wp, a_q)
            nmse = ErrorMetrics.compute(
                np.asarray(out[: min(m, 8), :512]),
                refg.gemm_fp32(a[: min(m, 8)], w[:512]),
            ).nmse
            r = bm.benchmark_kernel(
                dispatch,
                (wp, a_q),
                name=f"{fmt} w{fmt[1]}a8 {n_feat}x{m}x{k}",
                flops=bm.gemm_flops(m, n_feat, k),
                bytes_accessed=wb + m * k + m * n_feat * 4,
            )
            pct = 100.0 * r.gbps / HBM_GBPS
            print(f"{r.row()}  {pct:5.1f}% roofline  nmse={nmse:.2e}")
            records.append(
                {
                    "fmt": fmt,
                    "n": n_feat,
                    "m": m,
                    "k": k,
                    "time_us": r.time_s * 1e6,
                    "tflops": r.tflops,
                    "gbps": r.gbps,
                    "roofline_pct": pct,
                    "nmse_vs_fp32": nmse,
                }
            )
    return records


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--format", default=None,
                    help="q4_0|q4_1|q5_0|q5_1|q8_0|q4_k|q5_k")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}")
    shapes = [4] if args.quick else [1, 2, 3, 4, 5, 8, 512]
    fmts = [args.format] if args.format else ["q4_0", "q8_0"]
    records = []
    for fmt in fmts:
        records += run(fmt, shapes, args.out)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)
        print(f"wrote {args.out} ({len(records)} records)")


if __name__ == "__main__":
    main()
