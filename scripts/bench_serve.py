"""End-to-end serving throughput on a real chip: tokens/s for the quantized
Llama runtime under continuous batching.

This is the system-level number the kernel ladder exists for: a ~1B-param
Llama (dim 2048, 16 layers, d_ff 8192) quantized to q4_0, decoding with
M = n_slots tokens per step through the serving dispatch (exact int8-MXU
kernels at decode shapes).

Reports: decode tokens/s (steady state), per-step latency, the
weight-streaming speed-of-light bound, and prefill throughput.

Usage: python scripts/bench_serve.py [--layers 16] [--dim 2048] [--slots 8]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from quant_gemm_tpu.harness.benchmark import weight_bytes  # noqa: E402
from quant_gemm_tpu.models import llama  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--dff", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--prefill", type=int, default=512)
    ap.add_argument("--kv", default="bf16", choices=["bf16", "q8"],
                    help="KV cache precision")
    ap.add_argument("--window", type=int, default=0,
                    help="sliding-window attention width (0 = full causal)")
    ap.add_argument("--ring", action="store_true",
                    help="ring-buffer KV cache (O(window) memory; needs "
                         "--window)")
    ap.add_argument("--fast-init", action="store_true",
                    help="generate+quantize the synthetic model on-device "
                         "(seconds) instead of host numpy (~10 min)")
    ap.add_argument("--ctx", type=int, default=0,
                    help="pre-filled context length per slot for the decode "
                         "bench (cache-read cost is proportional to it)")
    ap.add_argument("--fused", choices=["on", "off"], default=None,
                    help="override kernels.registry.FUSED_DECODE (in-kernel "
                         "vs standalone Q8_1 activation quantization) for "
                         "the end-to-end A/B")
    ap.add_argument("--prefill-a16", action="store_true",
                    help="run the PREFILL phase in W4A16 (bf16 activations, "
                         "no per-layer Q8_1 quantize; decode stays W4A8)")
    ap.add_argument("--w-down-a16", action="store_true",
                    help="opt-in W4A16 down-projection (r5 lab_dequant8: "
                         "the one serving GEMM where the dequant rung "
                         "beats exact, ~58 us/step; trades W4A8 parity "
                         "on that GEMM for float activations)")
    ap.add_argument("--mega", choices=["on", "off"], default=None,
                    help="override kernels.gemm_megalayer.ENABLED (whole-"
                         "layer decode megakernels vs the per-GEMM dispatch "
                         "chain) for the end-to-end A/B")
    args = ap.parse_args()

    if args.fused is not None:
        from quant_gemm_tpu.kernels import registry

        registry.FUSED_DECODE = args.fused == "on"
        print(f"FUSED_DECODE={registry.FUSED_DECODE}", flush=True)
    if args.mega is not None:
        from quant_gemm_tpu.kernels import gemm_megalayer

        gemm_megalayer.ENABLED = args.mega == "on"
        print(f"MEGA={gemm_megalayer.ENABLED}", flush=True)

    cfg = llama.LlamaConfig(
        vocab=args.vocab, dim=args.dim, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.heads, d_ff=args.dff,
        max_seq=args.seq, window=args.window, ring=args.ring,
        w_down_a16=args.w_down_a16,
    )
    if args.w_down_a16:
        print("W_DOWN_A16=True", flush=True)
    if args.ring:
        assert args.window, "--ring needs --window"
        print(f"ring cache: {cfg.ring_capacity + cfg.ring_chunk} slots "
              f"(window {args.window}) vs max_seq {args.seq}", flush=True)
    print(f"device: {jax.devices()[0]}", flush=True)
    t0 = time.time()
    if args.fast_init:
        # on-device generation + quantization (the host path takes ~10+
        # minutes for 1.2B params on a single-core box); weight VALUES
        # differ from the host path but every shape/layout is identical
        qparams = llama.init_qparams_device(cfg, "q4_0", seed=0)
        jax.block_until_ready(jax.tree.leaves(qparams)[0])
        n_params = cfg.n_layers * (
            (cfg.n_heads + 2 * cfg.n_kv_heads) * cfg.head_dim * cfg.dim
            + cfg.dim * cfg.n_heads * cfg.head_dim + 3 * cfg.d_ff * cfg.dim
        ) + 2 * cfg.vocab * cfg.dim
        print(f"model: {n_params/1e9:.2f}B params, device init "
              f"{time.time()-t0:.0f}s", flush=True)
    else:
        params = llama.init_params(cfg, seed=0)
        n_params = sum(int(np.prod(np.asarray(v).shape))
                       for v in jax.tree.leaves(params))
        print(f"model: {n_params/1e9:.2f}B params, init "
              f"{time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        qparams = llama.quantize_params(params, "q4_0")
        del params
        print(f"quantized to q4_0 in {time.time()-t0:.0f}s", flush=True)

    # per-decode-step HBM floor: every q4_0 linear streams once
    lin_bytes = args.layers * (
        2 * weight_bytes("q4_0", args.dim, args.dim)  # wq, wo
        + 2 * weight_bytes("q4_0", args.heads * (args.dim // args.heads), args.dim)  # wk, wv
        + 2 * weight_bytes("q4_0", args.dff, args.dim)  # gate, up
        + weight_bytes("q4_0", args.dim, args.dff)  # down
    ) + weight_bytes("q4_0", args.vocab, args.dim)  # lm head
    floor_us = lin_bytes / 900e3  # ~900 GB/s measured stream
    print(f"weight stream per step: {lin_bytes/1e9:.3f} GB -> "
          f"{floor_us:.0f} us floor (at the 900 GB/s measured stream)",
          flush=True)

    rope = llama.make_rope_cache(cfg.max_seq, cfg.head_dim, cfg.rope_base, freq_scale=cfg.rope_scale)

    def fresh_cache():
        c = llama.KVCache.init(cfg, args.slots, args.kv)
        if args.ctx:
            c = c._replace(pos=jnp.full((args.slots,), args.ctx, jnp.int32))
        return c

    cache = fresh_cache()
    if args.ctx:
        kv_bytes_elem = 1 + 4 / cfg.head_dim if args.kv == "q8" else 2
        cache_bytes = (2 * args.layers * args.slots * cfg.n_kv_heads
                       * args.ctx * cfg.head_dim * kv_bytes_elem)
        print(f"cache read per step ({args.kv}, ctx {args.ctx}): "
              f"{cache_bytes/1e9:.3f} GB -> {cache_bytes/900e3:.0f} us floor",
              flush=True)

    # the serving engine buckets the attention tile by the batch's max
    # context (serve.Server.step); the bench mirrors it, sized for the
    # loop's final position
    from quant_gemm_tpu.ops.attention import decode_ts_bucket

    max_ctx = (args.ctx or 0) + 8 + args.steps
    if cfg.window:
        max_ctx = min(max_ctx, cfg.window)
    attn_ts, attn_s_hi = decode_ts_bucket(max_ctx, quant=args.kv == "q8")

    @functools.partial(jax.jit, donate_argnums=(1,), static_argnames=("n",))
    def decode_loop(qp, cache, toks, n):
        def body(_, carry):
            t, c = carry
            logits, c = llama.forward(qp, cfg, t, c,
                                      act_mode="q8_1", rope_cache=rope,
                                      attn_ts=attn_ts, attn_s_hi=attn_s_hi)
            return jnp.argmax(logits[:, -1:], -1).astype(jnp.int32), c
        return jax.lax.fori_loop(0, n, body, (toks, cache))

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, cfg.vocab, (args.slots, 1)), jnp.int32)
    # Slope methodology: this dev environment has a large per-program-call
    # overhead (tens of ms — the donated multi-hundred-MB cache pytree rides
    # the tunnel each call), so time two in-jit loop lengths and report the
    # marginal per-step cost, which is what a production serving loop sees.
    n_lo, n_hi = 8, 8 + args.steps
    t0 = time.time()
    nxt, _ = decode_loop(qparams, cache, toks, n=n_lo)
    jax.block_until_ready(nxt)
    print(f"decode compile: {time.time()-t0:.1f}s", flush=True)
    times = {}
    for n in (n_lo, n_hi):
        best = float("inf")
        for _ in range(3):
            c = fresh_cache()
            jax.block_until_ready(c.k)
            t0 = time.time()
            nxt, _ = decode_loop(qparams, c, toks, n=n)
            jax.block_until_ready(nxt)
            best = min(best, time.time() - t0)
        times[n] = best
    dt = (times[n_hi] - times[n_lo]) / (n_hi - n_lo)
    toks_s = args.slots / dt
    print(
        f"decode: {dt*1e6:8.0f} us/step @ batch {args.slots} -> "
        f"{toks_s:8.0f} tokens/s  "
        f"(weight-stream floor {args.slots/(floor_us/1e6):.0f} tok/s, "
        f"{100*floor_us/1e6/dt:.0f}% of floor)",
        flush=True,
    )

    # prefill throughput.  Ring caches bound each forward call by
    # cfg.ring_chunk (llama.forward asserts t <= ring_chunk) — chunk the
    # prompt exactly like the serving engine does (models/serve.py:275-283);
    # the round-3 campaign crashed here feeding 512 tokens in one call.
    t = args.prefill
    chunk = cfg.ring_chunk if cfg.ring else t
    ptoks = jnp.asarray(rng.integers(1, cfg.vocab, (1, t)), jnp.int32)

    pf_mode = "bf16" if args.prefill_a16 else "q8_1"

    @jax.jit
    def prefill(qp, toks):
        c1 = llama.KVCache.init(cfg, 1)
        for i in range(0, t, chunk):  # static unroll; 1 chunk when not ring
            logits, c1 = llama.forward(qp, cfg, toks[:, i : i + chunk], c1,
                                       act_mode=pf_mode, rope_cache=rope)
        return logits[0, -1]

    r = prefill(qparams, ptoks)
    jax.block_until_ready(r)
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        r = prefill(qparams, ptoks)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps
    print(f"prefill: {t} tokens in {dt*1e3:.1f} ms -> {t/dt:,.0f} tokens/s",
          flush=True)


if __name__ == "__main__":
    main()
