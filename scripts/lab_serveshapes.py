"""Lab: decode GEMM throughput at the SERVING step's real shapes.

The round-3 profile_decode breakdown put the 1.2B decode step's GEMMs at
~1540 us/step against a 791 us weight-stream floor (~51%): the per-layer
GEMMs run at only ~340-490 GB/s at their short-K serving shapes (K=2048
mostly), far below the 700-850 GB/s the same kernel reaches at the
4096x14336 champion shape.  This lab races, per serving shape:

* the DMA probe (per-shape floor at the exact operand mix),
* the fused exact kernel (the dispatch decode path) over (tn, tkp),
* the unfused exact kernel (isolates the in-kernel quantization cost).

Shapes (1.2B config, batch 8): wqkv 6144x2048, wo 2048x2048,
wgu 16384x2048, w_down 2048x8192, lm_head 32000x2048.

Usage: python scripts/lab_serveshapes.py [--quick]
"""

from __future__ import annotations

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

        probe_tn, probe_tkp = eff(2048, 512)
        cases = [("probe", lambda wp_: dma_probe(
            wp_, tn=probe_tn, tkp=probe_tkp), (wp,))]
        seen = set()
        for tn, tkp in [(2048, 512), (4096, 512), (2048, 256), (8192, 512),
                        (2048, 1024)]:
            e = eff(tn, tkp)
            if e in seen:  # same resolved tiles -> same executable
                continue
            seen.add(e)
            cases.append((
                f"fused tn{tn}/tkp{tkp}",
                lambda wp_, x_, tn=tn, tkp=tkp: gemm_exact_fused(
                    wp_, x_, tn=tn, tkp=tkp, interpret=interp), (wp, x)))
        cases.append((
            "exact tn2048/tkp512",
            lambda wp_, aq_: gemm_exact(wp_, aq_, tn=2048, tkp=512,
                                        interpret=interp), (wp, a_q)))
        if quick:
            cases = cases[:2]
        best = {}
        reps = 2 if quick else 3
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
                if cname not in best or r.time_s < best[cname].time_s:
                    best[cname] = r
        if best:
            print("  best:", flush=True)
            for cname, r in sorted(best.items(), key=lambda kv: kv[1].time_s):
                print(f"    {r.row()}")
            fused_best = min((r.time_s for c, r in best.items()
                              if c.startswith("fused")), default=None)
            if fused_best:
                step_us[name] = fused_best * 1e6

    if len(step_us) == len(SHAPES):
        per_layer = sum(v for k_, v in step_us.items() if k_ != "lm_head")
        total = per_layer * 16 + step_us["lm_head"]
        print(f"\nprojected step GEMM time at best tiles: "
              f"{total:.0f} us (vs 1540 us measured at defaults, "
              f"791 us weight floor)", flush=True)


if __name__ == "__main__":
    main()
