"""Lab: q5 x8 reformulation — separate 5th-bit MXU dot vs the legacy i32 path.

Round-4 bench_suite measured the q5 family far below the rest of the
ladder (q5_k 370 GB/s / 41% roofline, q5_0 ~310 at K=4096 vs q4_0 727 /
81%): ``has_qh`` forced the ENTIRE packed plane through an i32
widen/mask/xor/shift chain plus an i32 bit-expansion add (~8.5 i32 VPU
ops per weight element) before the MXU saw data.

The reformulation (gemm_exact qh_mode="hdot"; the shipping default is the
further nibble-packed "qh2" variant) keeps the
q4-style native-i8 masks for both nibble planes (1 i8 op/elem) and rides
the 5th bits on a SEPARATE int8 MXU dot: per block,
``sumi = nib_dot + 16 * h_dot`` combined exactly at int32 on the stacked
dot results (1/32 of the element count), with the x8 hi-plane fixup
(128*sumq_a hoist) now shared with q4.  The only remaining i32 work is
the h-plane bit expansion itself (repeat + variable shift on [TKP, TN]).

This lab races legacy ("i32") vs reformulated ("hdot") at the headline
decode shapes for q5_0 and q5_1 (the q5_k serving path is EffectiveQ51 →
the same kernel), medians of interleaved reps, with exactness pinned:
both modes produce identical int32 sumi, so outputs must agree to f32
epilogue-regrouping noise (<1e-6 NMSE vs fp32 golden, same as q4).

Usage: python scripts/lab_q5.py [reps]
Match: /root/reference/tests/test_llama_shapes.cu q5 rows.
"""

from __future__ import annotations

import statistics
import sys

import jax
import numpy as np

sys.path.insert(0, ".")

from quant_gemm_tpu.formats import jax_quant, numpy_ref
from quant_gemm_tpu.harness import benchmark as bm
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.harness.metrics import ErrorMetrics
from quant_gemm_tpu.kernels import gemm_pallas
from quant_gemm_tpu.kernels.gemm_exact import gemm_exact
from quant_gemm_tpu.ref import gemm as refg

HBM_SPEC_GBPS = 819.0  # headline denominator (VERDICT r4 item 6)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    m = 4
    cases = []
    for fmt, n_feat, k, tn in [
        ("q5_0", 4096, 14336, 4096),
        ("q5_1", 4096, 14336, 2048),  # q5_1 default tn cap (VMEM)
        ("q5_0", 4096, 4096, 4096),
    ]:
        wf = datagen.normal((n_feat, k), seed=2)
        af = datagen.normal((m, k), seed=1)
        w_q = numpy_ref.QUANTIZE[fmt](wf)
        wp = jax.device_put(gemm_pallas.prepare(w_q))
        a_q = jax_quant.device_put(numpy_ref.quantize_q8_1(af))
        golden = refg.gemm_fp32(af, wf)
        cases.append((fmt, n_feat, k, tn, wp, a_q, golden))

    variants = [
        ("i32-legacy", "i32"),
        ("hdot-x8", "hdot"),
        ("qh2-mask", "qh2"),  # nibble-packed h plane: +K/2 B/col stream,
        #                       zero i32 decode (bit-identical to hdot)
    ]

    # correctness first: both modes share exact integer sumi
    for fmt, n_feat, k, tn, wp, a_q, golden in cases:
        outs = {}
        for name, mode in variants:
            o = np.asarray(gemm_exact(wp, a_q, tn=tn, qh_mode=mode))
            outs[name] = o
            nmse = ErrorMetrics.compute(o, golden).nmse
            print(f"{fmt} {n_feat}x{m}x{k} {name}: nmse {nmse:.3e}",
                  flush=True)
        diff = np.max(np.abs(outs["i32-legacy"] - outs["hdot-x8"]))
        rel = diff / (np.abs(outs["i32-legacy"]).max() + 1e-30)
        print(f"  mode delta (f32 regrouping only): max {rel:.2e} rel",
              flush=True)
        assert rel < 1e-5, f"{fmt}: modes disagree beyond regrouping noise"
        assert np.array_equal(outs["hdot-x8"], outs["qh2-mask"]), \
            f"{fmt}: qh2 must be bit-identical to hdot"

    times: dict[tuple, list[float]] = {}
    for rep in range(reps):
        for fmt, n_feat, k, tn, wp, a_q, _ in cases:
            for name, mode in variants:
                wb = bm.weight_bytes(fmt, n_feat, k)
                by = wb + m * k + m * n_feat * 4
                r = bm.benchmark_kernel(
                    lambda w, aq, tn=tn, mode=mode: gemm_exact(
                        w, aq, tn=tn, qh_mode=mode),
                    (wp, a_q),
                    name=f"{fmt} {k//1024}k {name} #{rep}",
                    flops=bm.gemm_flops(m, n_feat, k),
                    bytes_accessed=by,
                )
                print(f"  {r.row()}", flush=True)
                if r.valid:
                    times.setdefault((fmt, k, name), []).append(r.time_s)

    print("\nmedians:", flush=True)
    for (fmt, k, name), ts in sorted(times.items()):
        med = statistics.median(ts)
        wb = bm.weight_bytes(fmt, 4096, k)
        by = wb + m * k + m * 4096 * 4
        print(f"  {fmt} K={k} {name:<12s} {med*1e6:8.1f} us "
              f"{by/med/1e9:7.1f} GB/s "
              f"{100.0*by/med/1e9/HBM_SPEC_GBPS:5.1f}% of 819 spec")


if __name__ == "__main__":
    main()
