"""Decode-step component breakdown: where does the serving floor gap go?

VERDICT r1 weak #3: the end-to-end decode step ran at ~52% of its combined
weights+KV DMA floor.  This script decomposes the step on the real chip by
timing each component CLASS with the slope method (the same measurement
the serving bench uses), then compares the sum against the measured full
step:

  1. the step's quantized GEMMs, measured stand-alone at serving shapes
     (fused-exact decode kernels, one per linear);
  2. flash_decode per layer at the benched context;
  3. the per-step cache writes (dus inserts into a donated cache);
  4. the full fori_loop step (scripts/bench_serve.py methodology).

The gap (full - sum of parts) is dispatch/fusion overhead XLA adds between
Pallas calls — the thing to attack if it dominates.

Usage: python scripts/profile_decode.py [--layers 16 --dim 2048 ...]
"""

from __future__ import annotations

import argparse
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from quant_gemm_tpu.harness import benchmark as bm  # noqa: E402
from quant_gemm_tpu.models import llama  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--dff", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--ctx", type=int, default=896)
    ap.add_argument("--kv", default="q8", choices=["bf16", "q8"])
    ap.add_argument("--strict", action="store_true",
                    help="exit 1 if the breakdown's unexplained residual "
                         "is >=10% of the full step")
    args = ap.parse_args()

    cfg = llama.LlamaConfig(
        vocab=args.vocab, dim=args.dim, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.heads, d_ff=args.dff,
        max_seq=args.seq,
    )
    print(f"device: {jax.devices()[0]}", flush=True)
    # on-device init: the host numpy path takes ~10 min for 1.2B params
    # on this single-core box; only shapes matter for a step breakdown
    qparams = llama.init_qparams_device(cfg, "q4_0", seed=0)
    rope = llama.make_rope_cache(cfg.max_seq, cfg.head_dim, cfg.rope_base,
                                 freq_scale=cfg.rope_scale)
    b = args.slots
    rng = np.random.default_rng(0)

    # ---- 1+2. stand-alone GEMMs and flash_decode, interleaved medians ----
    # Single-shot per-GEMM numbers swung 2-4x between script runs in the
    # round-3 campaign (wqkv 456.8 vs 190.7 GB/s) — too noisy to steer the
    # serving-floor attack.  All per-component rows now come from REPS
    # interleaved rounds (every component measured once per round, so chip
    # drift hits all rows equally) and report the per-component MEDIAN;
    # back-to-back script runs agree within ~±10% per row (VERDICT r3 #7).
    import statistics

    from quant_gemm_tpu.kernels import dispatch
    from quant_gemm_tpu.ops.attention import flash_decode

    REPS = 5
    lyr = qparams["layers"][0]
    shapes = [
        ("wqkv", lyr["wqkv"], cfg.dim),
        ("wo", lyr["wo"], args.heads * cfg.head_dim),
        ("wgu", lyr["wgu"], cfg.dim),
        ("w_down", lyr["w_down"], cfg.d_ff),
        ("lm_head", qparams["lm_head"], cfg.dim),
    ]
    comps = []
    for name, w, kk in shapes:
        x = jnp.asarray(rng.normal(0, 1, (b, kk)), jnp.float32)
        comps.append((f"gemm {name}",
                      functools.partial(dispatch, quantize_act=True),
                      (w, x), bm.weight_bytes("q4_0", w.n, w.k)))

    cache = llama.KVCache.init(cfg, b, args.kv)
    cache = cache._replace(pos=jnp.full((b,), args.ctx, jnp.int32))
    q = jnp.asarray(rng.normal(0, 1, (b, args.heads, 1, cfg.head_dim)),
                    jnp.float32)
    kc = jnp.asarray(rng.normal(0, 1, (b, args.heads, 1, cfg.head_dim)),
                     jnp.bfloat16)
    cache_rd = (b * args.heads * args.ctx * cfg.head_dim
                * np.dtype(cache.k.dtype).itemsize * 2)  # k + v
    comps.append((
        f"flash_decode ctx{args.ctx}",
        lambda qq, kk, vv, pp: flash_decode(
            qq, kk, vv, pp, layer=0, k_current=kc, v_current=kc,
            k_scale=cache.ks, v_scale=cache.vs),
        (q, cache.k, cache.v, cache.pos), cache_rd))

    # Robust runner (VERDICT r4 weak #5): rejects physically-impossible
    # reps (the round-4 log once recorded a 0.6 us / 18,973 GB/s w_down),
    # drops >3x-from-median outliers, and adds full extra rounds until
    # every row has REPS surviving samples — sub-30 us rows get them too.
    med = bm.interleaved_medians(comps, reps=REPS)
    print(f"\nper-component medians (of >={REPS} interleaved, outlier-"
          f"rejected):", flush=True)
    for name, _fn, _a, by in comps:
        print(f"  {name:<24s} {med[name]*1e6:8.1f} us "
              f"{by/med[name]/1e9:7.1f} GB/s", flush=True)

    layers_gemm_us = sum(
        med[f"gemm {n}"] for n in ("wqkv", "wo", "wgu", "w_down")
    ) * 1e6 * args.layers
    lmhead_us = med["gemm lm_head"] * 1e6
    attn_us = med[f"flash_decode ctx{args.ctx}"] * 1e6 * args.layers
    print(f"GEMMs: {layers_gemm_us:.0f} us/step (layers) + "
          f"{lmhead_us:.0f} (lm_head); attention {attn_us:.0f} us/step",
          flush=True)

    # ---- 3. cache writes --------------------------------------------------
    # The cache must be THREADED through the timing loop (as the real decode
    # fori_loop threads it) so the dus is in-place.  Passing the same cache
    # array to repeated calls — the generic benchmark_kernel pattern — keeps
    # the input alive across calls, XLA cannot donate, and the "write"
    # measures a full ~0.5 GB cache copy instead (the round-3 campaign's
    # bogus 2075 us / -166% breakdown).
    vals = jnp.zeros((args.layers, b, args.heads, 1, cfg.head_dim),
                     cache.k.dtype)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("n",))
    def write_loop(k_buf, vals, pos, n):
        def body(i, buf):
            v = vals + buf[0, 0, 0, 0, 0]  # loop-carried dep, never hoisted
            for bb in range(b):
                buf = jax.lax.dynamic_update_slice(
                    buf, v[:, bb][:, None], (0, bb, 0, pos[bb], 0))
            return buf

        return jax.lax.fori_loop(0, n, body, k_buf)

    import time as _t

    def _run_writes(n):
        buf = jnp.zeros_like(cache.k)
        jax.block_until_ready(buf)
        t0 = _t.perf_counter()
        jax.block_until_ready(write_loop(buf, vals, cache.pos, n))
        return _t.perf_counter() - t0

    for n in (64, 320):  # compile both loop lengths before timing
        _run_writes(n)
    w1 = min(_run_writes(64) for _ in range(2))
    w2 = min(_run_writes(320) for _ in range(2))
    per_write = max((w2 - w1) / 256, 0.0)
    wbytes = args.layers * b * args.heads * cfg.head_dim * (
        np.dtype(cache.k.dtype).itemsize)
    r = bm.BenchResult("cache write (k, in-place)", max(per_write, 1e-9),
                       bytes=wbytes)
    print(f"  {r.row()}", flush=True)
    write_us = per_write * 1e6 * 2  # k and v

    # ---- 4. the full step -------------------------------------------------
    @functools.partial(jax.jit, donate_argnums=(1,), static_argnames=("n",))
    def decode_loop(qp, c, toks, n):
        def body(_, carry):
            t, cc = carry
            logits, cc = llama.forward(qp, cfg, t, cc, act_mode="q8_1",
                                       rope_cache=rope)
            return jnp.argmax(logits[:, -1:], -1).astype(jnp.int32), cc
        return jax.lax.fori_loop(0, n, body, (toks, c))

    toks = jnp.asarray(rng.integers(1, cfg.vocab, (b, 1)), jnp.int32)
    import time as _time

    def fresh():
        c = llama.KVCache.init(cfg, b, args.kv)
        return c._replace(pos=jnp.full((b,), args.ctx, jnp.int32))

    # compile both loop lengths BEFORE timing (each n is its own program;
    # without warmup the slope would difference two compile times)
    for n in (8, 40):
        jax.block_until_ready(decode_loop(qparams, fresh(), toks, n))
    slopes = []
    for _ in range(3):
        ts = {}
        for n in (8, 40):
            c = fresh()
            t0 = _time.perf_counter()
            jax.block_until_ready(decode_loop(qparams, c, toks, n))
            ts[n] = _time.perf_counter() - t0
        slopes.append((ts[40] - ts[8]) / 32 * 1e6)
    step_us = statistics.median(slopes)
    print(f"full step: {step_us:.0f} us (median of "
          f"{', '.join(f'{s:.0f}' for s in slopes)})", flush=True)

    parts = layers_gemm_us + lmhead_us + attn_us + write_us
    resid_pct = 100 * (step_us - parts) / step_us
    print(
        f"\nbreakdown: gemms {layers_gemm_us + lmhead_us:.0f} + attention "
        f"{attn_us:.0f} + writes {write_us:.0f} = {parts:.0f} us; full "
        f"{step_us:.0f} us -> unexplained {step_us - parts:.0f} us "
        f"({resid_pct:.0f}%)",
        flush=True,
    )
    # A breakdown that cannot account for >=10% of the step (either way)
    # must not steer kernel work (VERDICT r4 item 7).
    ok = abs(resid_pct) < 10
    print(f"residual-check: {'PASS' if ok else 'FAIL'} "
          f"(|{resid_pct:.1f}%| {'<' if ok else '>='} 10%)", flush=True)
    if not ok and args.strict:
        sys.exit(1)


if __name__ == "__main__":
    main()
