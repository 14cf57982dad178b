"""Lab: MXU dispatch depth at the headline decode shape (round 4).

lab_layout found the exact kernel's median ~8 us ABOVE its own layout's
pure DMA probe (50.9 vs 42.9 us at 4096x4x14336) even after the epilogue
hoists — the residual is per-dispatch MXU work, not VPU scaling or DMA.
The stack4 path issues 112 block-diagonal dots ([16, 128] lhs each); each
dispatch pays pipeline-fill latency that shallow-M decode cannot amortize.

Two levers, both exact (same MACs, same results within f32 fold order):

* ``span`` — stack 2/4 K128 groups per dispatch ([32, 256] / [64, 512]
  lhs): 1/2, 1/4 the dispatches, each amortizing its fill over a deeper
  contraction.
* ``prediag`` — precompute the block-diagonal lhs in XLA (<1 MB, fused
  into the quantize pass) so the kernel's hot loop is slice+dot with no
  in-kernel broadcast/iota/select.

Races base / span2 / span4 / prediag x span / the DMA probe, interleaved
reps, medians.  Usage: python scripts/lab_depth.py [m] [reps]
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
sys.path.insert(0, "scripts")

from quant_gemm_tpu.formats import jax_quant
from quant_gemm_tpu.harness import benchmark as bm
from quant_gemm_tpu.kernels import gemm_pallas
from quant_gemm_tpu.kernels.gemm_exact import gemm_exact

from perf_lab import dma_probe  # noqa: E402

N_FEAT, K = 4096, 14336


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    m = int(args[0]) if args else 4
    reps = int(args[1]) if len(args) > 1 else 5
    interp = jax.default_backend() == "cpu"
    print(f"dispatch-depth lab: {N_FEAT}x{m}x{K} q4_0, median-of-{reps} "
          f"interleaved (backend={jax.default_backend()})", flush=True)

    key = jax.random.key(0)
    w = jax.random.normal(key, (N_FEAT, K), jnp.float32) * 0.02
    wp = gemm_pallas.prepare_device(jax_quant.quantize_q4_0(w))
    x = jax.random.normal(jax.random.fold_in(key, 1), (m, K), jnp.float32)
    a_q = jax_quant.quantize_q8_1(x)
    wbytes = bm.prepared_bytes(wp) + m * K  # + int8 activation codes
    flops = bm.gemm_flops(m, N_FEAT, K)

    cases = [("probe", lambda wp_: dma_probe(wp_, tn=4096, tkp=512), (wp,))]
    for span in (1, 2, 4):
        for prediag in (False, True):
            tag = f"span{span}" + ("/prediag" if prediag else "")
            cases.append((tag, lambda wp_, aq_, s=span, p=prediag: gemm_exact(
                wp_, aq_, span=s, prediag=p, interpret=interp), (wp, a_q)))
    # f16 scale planes (10% fewer bytes) x deepest span: the r3/r4 f16
    # verdicts predate the dispatch-depth levers — with the hot loop
    # cheaper, the byte cut may now win despite the in-kernel bit-decode
    wp16 = gemm_pallas.prepare_device(jax_quant.quantize_q4_0(w),
                                      scales_dtype=np.float16)
    for span, prediag in ((1, False), (4, True)):
        tag = f"f16sc/span{span}" + ("/prediag" if prediag else "")
        cases.append((tag, lambda wp_, aq_, s=span, p=prediag: gemm_exact(
            wp_, aq_, span=s, prediag=p, interpret=interp), (wp16, a_q)))

    # numerics guard: every variant within f32 fold-order of span1
    base = np.asarray(gemm_exact(wp, a_q, interpret=interp))
    for tag, fn, fargs in cases[1:]:
        out = np.asarray(fn(*fargs))
        err = float(np.max(np.abs(out - base)))
        rel = err / float(np.max(np.abs(base)))
        status = "ok" if rel < 1e-6 else f"MISMATCH rel {rel:.2e}"
        print(f"  {tag}: max abs diff {err:.2e} ({status})", flush=True)

    times: dict[str, list[float]] = {c[0]: [] for c in cases}
    for rep in range(reps):
        for tag, fn, fargs in cases:
            r = bm.benchmark_kernel(fn, fargs, name=f"{tag} #{rep}",
                                    flops=flops, bytes_accessed=wbytes)
            print(f"  {r.row()}", flush=True)
            if r.valid:
                times[tag].append(r.time_s)
    print("medians:", flush=True)
    for tag, ts in sorted(times.items(), key=lambda kv: statistics.median(
            kv[1]) if kv[1] else 9e9):
        if not ts:
            continue
        t = statistics.median(ts)
        print(f"  {tag:<16s} {t*1e6:8.1f} us  {wbytes/t/1e9:7.1f} GB/s  "
              f"best {min(ts)*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
