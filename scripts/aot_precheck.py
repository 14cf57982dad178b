"""Deviceless precheck of the TPU campaign: compile every stage's kernels
at their EXACT on-chip shapes through the real XLA:TPU + Mosaic pipeline
(harness/aot.py) and report generated-code sizes + peak memory.

tests/test_mosaic_gate.py gates scaled-down shapes on every CI run; the
campaign shapes (4096x4x14336 headline GEMM, the 1.2B serving decode step,
vocab-sized lm_head, long-context ring attention) are big enough that VMEM
budgets and window tiling can fail where small shapes pass.  Running this
while the tunnel is down means stage failures surface NOW, not mid-
campaign.

Usage: python scripts/aot_precheck.py          (~2-6 min of compiles)
"""

from __future__ import annotations

import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from quant_gemm_tpu.formats import jax_quant, numpy_ref  # noqa: E402
from quant_gemm_tpu.harness import aot, datagen  # noqa: E402
from quant_gemm_tpu.kernels import prepare  # noqa: E402
from quant_gemm_tpu.kernels.gemm_exact import (  # noqa: E402
    gemm_exact,
    gemm_exact_fused,
    gemm_exact_k16,
    prepare_k16,
)
from quant_gemm_tpu.kernels import gemm_pallas  # noqa: E402
from quant_gemm_tpu.ops import attention  # noqa: E402


def check(tag, fn, *args, **kw):
    t0 = time.time()
    try:
        c = aot.aot_compile(fn, *args, **kw)
        ma = c.memory_analysis()
        print(f"  ok  {tag}: code {ma.generated_code_size_in_bytes//1024} KiB,"
              f" argument {ma.argument_size_in_bytes//(1<<20)} MiB,"
              f" temp {ma.temp_size_in_bytes//(1<<20)} MiB"
              f" ({time.time()-t0:.0f}s)", flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"  FAIL {tag}: {msg} ({time.time()-t0:.0f}s)", flush=True)
        return False


def main() -> int:
    failures = 0

    # stage 1/2: headline decode GEMM, x8 exact + fused, bench.py shape
    n_feat, m, k = 4096, 4, 14336
    w = prepare(numpy_ref.quantize_q4_0(datagen.normal((n_feat, k), seed=0)))
    a = datagen.normal((m, k), seed=1).astype(np.float32)
    a_q = jax_quant.device_put(numpy_ref.quantize_q8_1(a))
    ok = check("exact q4_0 4096x4x14336 tn2048",
               lambda wq, aq: gemm_exact(wq, aq, interpret=False), w, a_q)
    failures += not ok
    ok = check("exact q4_0 4096x4x14336 tn4096/tkp512",
               lambda wq, aq: gemm_exact(wq, aq, tn=4096, tkp=512,
                                         interpret=False), w, a_q)
    failures += not ok
    # q5_1 carries the largest operand set (qh + min planes, i32-widened
    # q5 path): the format most likely to blow scoped VMEM first
    w51 = prepare(numpy_ref.quantize_q5_1(datagen.normal((n_feat, k),
                                                         seed=0)))
    ok = check("exact q5_1 4096x4x14336 (bench_suite shape)",
               lambda wq, aq: gemm_exact(wq, aq, interpret=False), w51, a_q)
    failures += not ok
    ok = check("exact q4_0 span4/prediag 4096x4x14336",
               lambda wq, aq: gemm_exact(wq, aq, span=4, prediag=True,
                                         interpret=False), w, a_q)
    failures += not ok
    ok = check("fused q4_0 4096x4x14336",
               lambda wq, x: gemm_exact_fused(wq, x, interpret=False),
               w, jnp.asarray(a))
    failures += not ok

    # stage 3: 1.2B serving GEMM set (bench_serve defaults, dim 2048/dff 8192)
    for (nn, kk, tag) in [(6144, 2048, "wqkv"), (2048, 2048, "wo"),
                          (16384, 2048, "wgu"), (2048, 8192, "w_down"),
                          (32000, 2048, "lm_head")]:
        wq = prepare(numpy_ref.quantize_q4_0(datagen.normal((nn, kk), seed=2)))
        x = datagen.normal((8, kk), seed=3).astype(np.float32)
        ok = check(f"fused serving {tag} {nn}x8x{kk}",
                   lambda w_, x_: gemm_exact_fused(w_, x_, interpret=False),
                   wq, jnp.asarray(x))
        failures += not ok

    # stage 3/4: decode attention at serving cache shapes (16 layers stacked,
    # 8 slots, 16 kv heads, hd 128, seq 1024 bf16 + q8; ring window 4096)
    L, B, KV, HD, S = 16, 8, 16, 128, 1024
    q = jnp.zeros((B, KV, 1, HD), jnp.float32)
    pos = jnp.full((B,), S - 10, jnp.int32)
    kc = jnp.zeros((B, KV, 1, HD), jnp.float32)
    ok = check(
        f"flash_decode bf16 L{L} B{B} KV{KV} S{S}",
        lambda q_, k_, v_, p_, kc_, vc_: attention.flash_decode(
            q_, k_, v_, p_, k_current=kc_, v_current=vc_, layer=3,
            interpret=False),
        q, jnp.zeros((L, B, KV, S, HD), jnp.bfloat16),
        jnp.zeros((L, B, KV, S, HD), jnp.bfloat16), pos, kc, kc)
    failures += not ok
    ks = jnp.zeros((L, B, KV, S), jnp.float32)
    ok = check(
        f"flash_decode q8 L{L} B{B} KV{KV} S{S}",
        lambda q_, k_, v_, p_, kc_, vc_, ks_, vs_: attention.flash_decode(
            q_, k_, v_, p_, k_current=kc_, v_current=vc_, k_scale=ks_,
            v_scale=vs_, layer=3, interpret=False),
        q, jnp.zeros((L, B, KV, S, HD), jnp.int8),
        jnp.zeros((L, B, KV, S, HD), jnp.int8), pos, kc, kc, ks, ks)
    failures += not ok
    # ring window at 4096-seq config (campaign stage 4)
    ring_s = 1024 + 128
    pos4 = jnp.full((B,), 3500, jnp.int32)
    ks_r = jnp.zeros((L, B, KV, ring_s), jnp.float32)
    ok = check(
        f"flash_decode q8 ring window1024 S{ring_s}",
        lambda q_, k_, v_, p_, kc_, vc_, ks_, vs_: attention.flash_decode(
            q_, k_, v_, p_, k_current=kc_, v_current=vc_, k_scale=ks_,
            v_scale=vs_, layer=3, window=1024, ring=ring_s,
            interpret=False),
        q, jnp.zeros((L, B, KV, ring_s, HD), jnp.int8),
        jnp.zeros((L, B, KV, ring_s, HD), jnp.int8), pos4, kc, kc,
        ks_r, ks_r)
    failures += not ok

    # prefill attention at bench_serve prefill shape (t=512)
    t = 512
    ok = check(
        "flash_prefill bf16 t512",
        lambda q_, k_, v_, p_: attention.flash_prefill(
            q_, k_, v_, p_, rep=1, interpret=False),
        jnp.zeros((1, KV, t, HD), jnp.float32),
        jnp.zeros((1, KV, S, HD), jnp.bfloat16),
        jnp.zeros((1, KV, S, HD), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32))
    failures += not ok

    # stage 5: per-16 K-quant decode at lm-head shape
    from quant_gemm_tpu.formats import kquants

    wq6 = prepare_k16(kquants.quantize_q6_k(
        datagen.normal((4096, 2048), seed=4)))
    aq6 = jax_quant.device_put(
        numpy_ref.quantize_q8_1(datagen.normal((4, 2048), seed=5)))
    ok = check("exact q6_k 4096x4x2048",
               lambda w_, a_: gemm_exact_k16(w_, a_, interpret=False),
               wq6, aq6)
    failures += not ok

    # prefill dequant rung at the big shape (stage 2's M>12 sibling)
    ab = jnp.asarray(datagen.normal((256, k), seed=6), jnp.bfloat16)
    ok = check("dequant q4_0 4096x256x14336",
               lambda w_, x_: gemm_pallas.gemm(w_, x_, interpret=False),
               w, ab)
    failures += not ok

    print(f"\n{'ALL STAGES COMPILE' if not failures else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
