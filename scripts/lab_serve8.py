"""Tile race for the m=8 serving GEMMs (the 1.2B decode step's per-layer
shapes) — VERDICT r4 item 2.

Round-5 observation: per-GRID-STEP cost at these shapes carries a ~1-2.5 us
fixed component on top of per-step DMA (w_down's 1.2 us-DMA steps run 2.6x
over its stream floor; wgu's 3.1 us-DMA steps only 1.33x), so FEWER, BIGGER
grid steps should win where VMEM allows.  This lab races tkp/tn grids per
serving shape with the hardened interleaved-median runner and prints the
winner vs the shipping default.

Usage: python scripts/lab_serve8.py [reps]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from quant_gemm_tpu.formats import jax_quant  # noqa: E402
from quant_gemm_tpu.harness import benchmark as bm  # noqa: E402
from quant_gemm_tpu.kernels.gemm_exact import gemm_exact  # noqa: E402
from quant_gemm_tpu.models import llama  # noqa: E402

# per-shape variants: (label, kwargs for gemm_exact); {} = shipping default.
# Round-5 second pass: the tkp/tn grid is exhausted (all within 0.4-2 us,
# see tpu_campaign.log) — this round races the COMPUTE levers at m=8:
# span (deeper stacked dispatches, untested at rows=8) and submask (one
# VPU mask saved per step, one extra dot set).
VARIANTS = {
    "wqkv": [("default", {}), ("span2", {"span": 2}),
             ("span4", {"span": 4}), ("submask", {"submask": True}),
             ("span2+submask", {"span": 2, "submask": True})],
    "wo": [("default", {}), ("span2", {"span": 2}),
           ("submask", {"submask": True}),
           ("span2+submask", {"span": 2, "submask": True})],
    "wgu": [("default", {}), ("span2", {"span": 2}),
            ("submask", {"submask": True}),
            ("span2+submask", {"span": 2, "submask": True})],
    "w_down": [("default", {}), ("span2", {"span": 2}),
               ("submask", {"submask": True}),
               ("span2+submask", {"span": 2, "submask": True})],
    "lm_head": [("default", {}), ("span2", {"span": 2}),
                ("submask", {"submask": True}),
                ("span2+submask", {"span": 2, "submask": True})],
}


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = llama.LlamaConfig(vocab=32000, dim=2048, n_layers=1, n_heads=16,
                            n_kv_heads=16, d_ff=8192, max_seq=64)
    qp = llama.init_qparams_device(cfg, "q4_0", seed=0)
    lyr = qp["layers"][0]
    rng = np.random.default_rng(0)
    b = 8
    shapes = [("wqkv", lyr["wqkv"], 2048), ("wo", lyr["wo"], 2048),
              ("wgu", lyr["wgu"], 2048), ("w_down", lyr["w_down"], 8192),
              ("lm_head", qp["lm_head"], 2048)]

    cases = []
    for name, w, kk in shapes:
        x = jnp.asarray(rng.normal(0, 1, (b, kk)), jnp.float32)
        for label, kw in VARIANTS[name]:
            def fn(w, x, kw=kw):
                # the serving dispatch path: XLA quantize + exact GEMM
                return gemm_exact(w, jax_quant.quantize_q8_1(x), **kw)
            cases.append((f"{name} {label}", fn, (w, x),
                          bm.weight_bytes("q4_0", w.n, w.k)))

    med = bm.interleaved_medians(cases, reps=reps)
    print("\nmedians (vs 900 GB/s stream floor):", flush=True)
    best = {}
    for name, _f, _a, by in cases:
        if name not in med:
            continue
        shape = name.split()[0]
        floor = by / 900e9
        line = (f"  {name:<24s} {med[name]*1e6:8.1f} us "
                f"{by/med[name]/1e9:7.1f} GB/s  {med[name]/floor:4.2f}x floor")
        print(line, flush=True)
        if shape not in best or med[name] < med[best[shape]]:
            best[shape] = name
    print("\nwinners:", flush=True)
    for shape, name in best.items():
        print(f"  {shape:<10s} -> {name} ({med[name]*1e6:.1f} us)",
              flush=True)
    tot = sum(med[best[s]] for s in ("wqkv", "wo", "wgu", "w_down")) * 16 \
        + med[best["lm_head"]]
    print(f"\nper-step GEMM total at winners: {tot*1e6:.0f} us "
          f"(16 layers + lm_head)", flush=True)


if __name__ == "__main__":
    main()
