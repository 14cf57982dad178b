"""Decode-attention variant sweep (campaign stage-6 attack tooling).

profile_decode.py attributes the serving step's time to component classes;
this lab races flash_decode FORMULATION knobs at the serving shape so the
dominant term can be attacked with data (VERDICT r2 item 3):

* ts (S-tile): DMA size vs VMEM pressure (all kv heads ride one tile),
* cache dtype: bf16 vs int8+scales (half the slab bytes, +1 mul/tile),
* current-token fold (k_current operands) vs pre-written cache,
* context length (via pos) — the clamped index maps should make cost
  track ACTUAL context, not max_seq; this sweep verifies on-chip.

Each row prints µs/layer-call plus effective GB/s over the cache bytes the
call actually needs (window = pos, all kv heads).  Slope-timed.

Usage: python scripts/bench_attn.py [--slots 8] [--kvh 16] [--hd 128]
           [--seq 1024] [--ctx 896]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from quant_gemm_tpu.harness import benchmark as bm  # noqa: E402
from quant_gemm_tpu.ops import attention  # noqa: E402


def cache_bytes(b, kvh, ctx, hd, quant):
    per = 1 if quant else 2
    slab = b * kvh * ctx * hd * per * 2  # k and v
    scales = b * kvh * ctx * 4 * 2 if quant else 0
    return slab + scales


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--kvh", type=int, default=16)
    ap.add_argument("--rep", type=int, default=1)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--ctx", type=int, default=896)
    ap.add_argument("--layers", type=int, default=16,
                    help="stacked-cache depth (layer picked = 3)")
    args = ap.parse_args()
    b, kvh, rep, hd = args.slots, args.kvh, args.rep, args.hd
    L, S = args.layers, args.seq
    print(f"device: {jax.devices()[0]}", flush=True)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, kvh, rep, hd)).astype(np.float32))
    kc = jnp.asarray(rng.normal(size=(b, kvh, 1, hd)).astype(np.float32))
    pos = jnp.full((b,), args.ctx, jnp.int32)

    kbf = jnp.asarray(rng.normal(size=(L, b, kvh, S, hd)),
                      jnp.bfloat16)
    vbf = jnp.asarray(rng.normal(size=(L, b, kvh, S, hd)),
                      jnp.bfloat16)
    k8 = jnp.asarray(rng.integers(-127, 127, (L, b, kvh, S, hd)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 127, (L, b, kvh, S, hd)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (L, b, kvh, S)), jnp.float32)

    rows = []

    def race(tag, fn, operands, quant, ctx):
        # operands ride as REAL loop-carried args (q is the perturbed float
        # leaf) so XLA cannot hoist the kernel out of the timing fori_loop
        # (docs/PERF_NOTES.md methodology)
        r = bm.benchmark_kernel(
            fn, operands, name=tag,
            bytes_accessed=cache_bytes(b, kvh, ctx, hd, quant),
        )
        rows.append((tag, r.time_s * 1e6, r.gbps))
        print(f"  {tag:44s} {r.time_s*1e6:8.1f} us  {r.gbps:6.0f} GB/s",
              flush=True)

    for ts in (256, 512):
        race(f"bf16 ts={ts} fold-current ctx={args.ctx}",
             lambda q_, k_, v_, p_, kc_, ts=ts: attention.flash_decode(
                 q_, k_, v_, p_, k_current=kc_, v_current=kc_, layer=3,
                 ts=ts, interpret=False),
             (q, kbf, vbf, pos, kc), False, args.ctx)
    for ts in (256, 512, 1024):
        race(f"q8   ts={ts} fold-current ctx={args.ctx}",
             lambda q_, k_, v_, p_, kc_, ks_, ts=ts: attention.flash_decode(
                 q_, k_, v_, p_, k_current=kc_, v_current=kc_,
                 k_scale=ks_, v_scale=ks_, layer=3, ts=ts,
                 interpret=False),
             (q, k8, v8, pos, kc, ks), True, args.ctx)
    # no current-token fold (cache pre-written): isolates the fold cost
    race(f"q8   ts=512 pre-written ctx={args.ctx}",
         lambda q_, k_, v_, p_, ks_: attention.flash_decode(
             q_, k_, v_, p_, k_scale=ks_, v_scale=ks_, layer=3, ts=512,
             interpret=False),
         (q, k8, v8, pos, ks), True, args.ctx)
    # context proportionality: half the context must cost ~half (the
    # clamped index maps dedup DMAs past pos)
    pos_half = jnp.full((b,), args.ctx // 2, jnp.int32)
    race(f"q8   ts=512 fold-current ctx={args.ctx//2}",
         lambda q_, k_, v_, p_, kc_, ks_: attention.flash_decode(
             q_, k_, v_, p_, k_current=kc_, v_current=kc_,
             k_scale=ks_, v_scale=ks_, layer=3, ts=512, interpret=False),
         (q, k8, v8, pos_half, kc, ks), True, args.ctx // 2)

    best = min(rows, key=lambda r: r[1])
    print(f"\nbest: {best[0]} at {best[1]:.1f} us ({best[2]:.0f} GB/s); "
          f"x{args.layers} layers -> {best[1]*args.layers/1e3:.2f} ms "
          f"attention per decode step", flush=True)


if __name__ == "__main__":
    main()
