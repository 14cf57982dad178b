"""Lab: decode GEMM throughput at the SERVING step's real shapes.

The round-3 profile_decode breakdown put the 1.2B decode step's GEMMs at
~1540 us/step against a 791 us weight-stream floor (~51%): the per-layer
GEMMs run at only ~340-490 GB/s at their short-K serving shapes (K=2048
mostly), far below the 700-850 GB/s the same kernel reaches at the
4096x14336 champion shape.  This lab races, per serving shape:

* the DMA probe (per-shape floor at the exact operand mix),
* the UNFUSED exact kernel over (tn, tkp) — incl. small tkp (128/256):
  short K leaves a 2-step K grid at tkp=512, so the Pallas pipeline has no
  room to hide its prologue; more, smaller K steps trade DMA size for
  overlap,
* the fused exact kernel (the former dispatch decode path),
* the standalone Q8_1 activation-quantization pass — what the unfused
  path pays per GEMM group; charging it makes fused-vs-unfused an
  end-to-end adjudication (VERDICT r3 item 2).

Shapes (1.2B config, batch 8): wqkv 6144x2048, wo 2048x2048,
wgu 16384x2048, w_down 2048x8192, lm_head 32000x2048.

Reported per case: MEDIAN of interleaved reps (steady state) + best.

Usage: python scripts/lab_serveshapes.py [--quick]
"""

from __future__ import annotations

import statistics
import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from quant_gemm_tpu.formats import jax_quant
from quant_gemm_tpu.harness import benchmark as bm
from quant_gemm_tpu.kernels import gemm_pallas
from quant_gemm_tpu.kernels.gemm_exact import gemm_exact, gemm_exact_fused

sys.path.insert(0, "scripts")
from perf_lab import dma_probe  # noqa: E402

SHAPES = [
    ("wqkv", 6144, 2048),
    ("wo", 2048, 2048),
    ("wgu", 16384, 2048),
    ("w_down", 2048, 8192),
    ("lm_head", 32000, 2048),
]
M = 8


def main():
    quick = "--quick" in sys.argv
    print(f"decode GEMMs at serving shapes, M={M} "
          f"(backend={jax.default_backend()})", flush=True)
    interp = jax.default_backend() == "cpu"

    key = jax.random.key(0)
    step_us = {}
    quant_us = None
    for name, n, k in SHAPES:
        kf = jax.random.fold_in(key, hash(name) % 1000)
        w = jax.random.normal(kf, (n, k), jnp.float32) * (1.0 / k ** 0.5)
        wp = gemm_pallas.prepare_device(jax_quant.quantize_q4_0(w))
        x = jax.random.normal(jax.random.fold_in(kf, 1), (M, k), jnp.float32)
        a_q = jax_quant.quantize_q8_1(x)
        wbytes = bm.weight_bytes("q4_0", n, k)
        flops = bm.gemm_flops(M, n, k)
        print(f"\n--- {name} {n}x{k} ({wbytes/1e6:.1f} MB weights) ---",
              flush=True)

        np_stored = wp.packed_t.shape[1]
        kdim = wp.packed_t.shape[0]

        def eff(tn, tkp):
            tn = min(tn, np_stored)
            tn -= tn % 128
            while np_stored % tn:
                tn -= 128
            tkp = min(tkp, kdim)
            while kdim % tkp:
                tkp //= 2
            return tn, tkp

        probe_tn, probe_tkp = eff(np_stored, 512)
        cases = [("probe", lambda wp_: dma_probe(
            wp_, tn=probe_tn, tkp=probe_tkp), (wp,))]
        seen = set()
        # unfused exact is the round-4 dispatch default.  Contenders only
        # (the r4 campaign's full sweep timed out the stage): the r4 run
        # showed tkp128 Mosaic-illegal, span2/4 slower at every m=8 shape,
        # full-N losing at wqkv (15.2 vs 13.5 us for tn2048) and OOMing at
        # wgu's np=16384; K-resident (tkp=kdim) stays in the race.
        for tn, tkp in [(np_stored, 512), (4096, 512), (2048, 512),
                        (2048, kdim), (1024, kdim)]:
            e = eff(tn, tkp)
            if e in seen:
                continue
            seen.add(e)
            cases.append((
                f"exact tn{e[0]}/tkp{e[1]}",
                lambda wp_, aq_, tn=tn, tkp=tkp: gemm_exact(
                    wp_, aq_, tn=tn, tkp=tkp, interpret=interp), (wp, a_q)))
        ef = eff(np_stored, 512)
        cases.append((
            f"fused tn{ef[0]}/tkp{ef[1]}",
            lambda wp_, x_: gemm_exact_fused(
                wp_, x_, tn=np_stored, tkp=512, interpret=interp), (wp, x)))
        if quick:
            cases = cases[:3]
        times: dict[str, list[float]] = {c[0]: [] for c in cases}
        reps = 2 if quick else 5
        for rep in range(reps):
            for cname, fn, args in cases:
                try:
                    r = bm.benchmark_kernel(
                        fn, args, name=f"{cname} #{rep}", flops=flops,
                        bytes_accessed=wbytes)
                except Exception as e:  # VMEM overflow etc — record & skip
                    print(f"  {cname} FAILED: {e}"[:140], flush=True)
                    cases = [c for c in cases if c[0] != cname]
                    continue
                print(f"  {r.row()}", flush=True)
                if r.valid:
                    times[cname].append(r.time_s)
        med = {c: statistics.median(ts) for c, ts in times.items() if ts}
        if med:
            print("  medians:", flush=True)
            for cname, t in sorted(med.items(), key=lambda kv: kv[1]):
                print(f"    {cname:<24s} {t*1e6:8.1f} us  "
                      f"{wbytes/t/1e9:7.1f} GB/s  best "
                      f"{min(times[cname])*1e6:7.1f} us")
            ex_best = min((t for c, t in med.items()
                           if c.startswith("exact")), default=None)
            if ex_best:
                step_us[name] = ex_best * 1e6

    # the unfused path's extra cost: one standalone Q8_1 quantize per GEMM
    # input (reused by wqkv+wgu?  no — each GEMM input differs; 4/layer)
    xq = jax.random.normal(key, (M, 2048), jnp.float32)
    ts = []
    for _ in range(3 if not quick else 1):
        r = bm.benchmark_kernel(
            lambda x_: jax_quant.quantize_q8_1(x_), (xq,),
            name="quantize_q8_1 [8,2048]", bytes_accessed=M * 2048 * 5)
        print(f"  {r.row()}", flush=True)
        if r.valid:
            ts.append(r.time_s)
    if ts:
        quant_us = statistics.median(ts) * 1e6

    if len(step_us) == len(SHAPES):
        per_layer = sum(v for k_, v in step_us.items() if k_ != "lm_head")
        total = per_layer * 16 + step_us["lm_head"]
        msg = (f"\nprojected step GEMM time at best exact tiles: "
               f"{total:.0f} us (vs 791 us weight floor)")
        if quant_us is not None:
            total_q = total + quant_us * (4 * 16 + 1)
            msg += (f"; + standalone quantize {quant_us:.1f} us x 65 = "
                    f"{total_q:.0f} us end-to-end")
        print(msg, flush=True)


if __name__ == "__main__":
    main()
