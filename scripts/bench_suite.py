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

# One denominator policy (VERDICT r4 item 6): every headline "% roofline"
# in every committed artifact is a fraction of the 819 GB/s v5e HBM SPEC
# (same as bench.py); the ~900 GB/s measured stream peak (docs/PERF_NOTES.md)
# is reported alongside, labeled, for kernel-vs-probe work.
HBM_SPEC_GBPS = 819.0
HBM_STREAM_GBPS = 900.0


def run(fmt: str, shapes, out_path: str | None, reps: int = 3):
    import statistics

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
        points = []
        for m in shapes:
            a = datagen.normal((m, k), seed=1)
            a_q = jax_quant.device_put(numpy_ref.quantize_q8_1(a))
            # accuracy gate (small slice to keep the golden cheap)
            out = dispatch(wp, a_q)
            nmse = ErrorMetrics.compute(
                np.asarray(out[: min(m, 8), :512]),
                refg.gemm_fp32(a[: min(m, 8)], w[:512]),
            ).nmse
            points.append((m, a_q, nmse))
        # interleaved reps across the m sweep; per-point MEDIAN recorded
        # (the best-of tail on the shared chip overstates steady state)
        times: dict[int, list[float]] = {m: [] for m, _, _ in points}
        for rep in range(reps):
            for m, a_q, _ in points:
                r = bm.benchmark_kernel(
                    dispatch,
                    (wp, a_q),
                    name=f"{fmt} w{fmt[1]}a8 {n_feat}x{m}x{k} #{rep}",
                    flops=bm.gemm_flops(m, n_feat, k),
                    bytes_accessed=wb + m * k + m * n_feat * 4,
                )
                print(f"  {r.row()}")
                if r.valid:
                    times[m].append(r.time_s)
        for m, a_q, nmse in points:
            med = statistics.median(times[m])
            flops = bm.gemm_flops(m, n_feat, k)
            by = wb + m * k + m * n_feat * 4
            gbps = by / med / 1e9
            pct_spec = 100.0 * gbps / HBM_SPEC_GBPS
            pct_stream = 100.0 * gbps / HBM_STREAM_GBPS
            print(f"{fmt} {n_feat}x{m}x{k}: median {med*1e6:8.1f} us "
                  f"{flops/med/1e12:7.2f} TFLOPS {gbps:7.1f} GB/s "
                  f"{pct_spec:5.1f}% of 819 spec ({pct_stream:.1f}% of "
                  f"900 stream)  nmse={nmse:.2e}")
            records.append(
                {
                    "fmt": fmt,
                    "n": n_feat,
                    "m": m,
                    "k": k,
                    "time_us": med * 1e6,
                    "time_us_best": min(times[m]) * 1e6,
                    "tflops": flops / med / 1e12,
                    "gbps": gbps,
                    "roofline_pct": pct_spec,
                    "roofline_denom_gbps": HBM_SPEC_GBPS,
                    "roofline_pct_stream": pct_stream,
                    "nmse_vs_fp32": nmse,
                }
            )
    return records


ALL_FORMATS = ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0", "q4_k", "q5_k"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--format", default=None,
                    help="q4_0|q4_1|q5_0|q5_1|q8_0|q4_k|q5_k|all")
    ap.add_argument("--shapes", default=None,
                    help="comma-separated token counts (default "
                         "1,2,4,8,512; reference matrix "
                         "tests/test_llama_shapes.cu:247-290)")
    ap.add_argument("--out", default=None,
                    help="JSON record file; --append merges into it")
    ap.add_argument("--append", action="store_true",
                    help="merge records into --out instead of overwriting "
                         "(campaign runs one format per timeout window)")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}")
    if args.shapes:
        shapes = [int(s) for s in args.shapes.split(",")]
    else:
        shapes = [4] if args.quick else [1, 2, 4, 8, 512]
    if args.format == "all":
        fmts = ALL_FORMATS
    elif args.format:
        fmts = [args.format]
    else:
        fmts = ["q4_0", "q8_0"]
    records = []
    for fmt in fmts:
        records += run(fmt, shapes, args.out)
    if args.out:
        if args.append:
            import os

            if os.path.exists(args.out):
                with open(args.out) as f:
                    old = json.load(f)
                # new records supersede same-(fmt,n,m,k) old ones
                new_keys = {(r["fmt"], r["n"], r["m"], r["k"])
                            for r in records}
                records = [r for r in old
                           if (r["fmt"], r["n"], r["m"], r["k"])
                           not in new_keys] + records
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)
        print(f"wrote {args.out} ({len(records)} records)")


if __name__ == "__main__":
    main()
