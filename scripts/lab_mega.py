"""On-chip A/B: decode layer megakernels vs the unfused per-GEMM chain.

Measures, at the 1.2B serving config (dim 2048, d_ff 8192, M = 8):

* ``norm_qkv`` (one Pallas call) vs rms_norm + quantize + gemm_exact;
* ``attn_tail`` (one Pallas call) vs the wo + residual + norm + wgu +
  silu*mul + w_down + residual chain;

with interleaved median-of-REPS rounds (the perf_lab methodology), plus a
numerics check of each fused kernel against the unfused chain first.

Usage: python scripts/lab_mega.py [reps]
"""

from __future__ import annotations

import statistics
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from quant_gemm_tpu.formats import jax_quant  # noqa: E402
from quant_gemm_tpu.harness import benchmark as bm  # noqa: E402
from quant_gemm_tpu.kernels import gemm_megalayer as mega  # noqa: E402
from quant_gemm_tpu.kernels.gemm_exact import gemm_exact  # noqa: E402
from quant_gemm_tpu.models import llama  # noqa: E402
from quant_gemm_tpu.ops.activations import silu_mul  # noqa: E402
from quant_gemm_tpu.ops.rms_norm import rms_norm  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    dim, dff, m = 2048, 8192, 8
    eps = 1e-5
    print(f"device: {jax.devices()[0]}", flush=True)

    cfg = llama.LlamaConfig(vocab=256, dim=dim, n_layers=1, n_heads=16,
                            n_kv_heads=16, d_ff=dff, max_seq=64)
    qp = llama.init_qparams_device(cfg, "q4_0", seed=0)
    lyr = qp["layers"][0]
    wqkv, wo, wgu, wd = (lyr["wqkv"], lyr["wo"], lyr["wgu"], lyr["w_down"])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (m, dim)), jnp.float32)
    attn = jnp.asarray(rng.normal(0, 1, (m, dim)), jnp.float32)
    nw_a = lyr["attn_norm"]
    nw_m = lyr["mlp_norm"]

    def unfused_qkv(x):
        h = rms_norm(x, nw_a, eps)
        return gemm_exact(wqkv, jax_quant.quantize_q8_1(h))

    def unfused_tail(attn, x):
        o = gemm_exact(wo, jax_quant.quantize_q8_1(attn))
        xm = x + o
        h = rms_norm(xm, nw_m, eps)
        gu = gemm_exact(wgu, jax_quant.quantize_q8_1(h))
        ff = silu_mul(gu[:, :dff], gu[:, dff:])
        return xm + gemm_exact(wd, jax_quant.quantize_q8_1(ff))

    # ---- numerics --------------------------------------------------------
    # On CPU-interpret the megakernels are BIT-identical to the unfused
    # chain (tests/test_megalayer.py).  On hardware the in-kernel glue
    # (Mosaic rsqrt/sigmoid/mean) rounds differently than the XLA ops at
    # f32 ulp level, which can flip individual Q8_1 codes — so the honest
    # on-chip criterion is "mega-vs-unfused disagreement is small relative
    # to the quantization noise both share", measured as NMSE of the
    # mega-unfused delta over the unfused output's own variance.
    def nmse(a, b):
        return float(((a - b) ** 2).mean() / (b.var() + 1e-30))

    r_ref = np.asarray(jax.jit(unfused_qkv)(x))
    r_meg = np.asarray(jax.jit(
        lambda x: mega.norm_qkv(wqkv, x, nw_a, eps))(x))
    d, e = np.abs(r_ref - r_meg).max(), nmse(r_meg, r_ref)
    print(f"  norm_qkv:  max abs diff {d:.2e}  delta-NMSE {e:.2e} "
          f"({'ok' if e < 1e-5 else 'BAD'})", flush=True)

    t_ref = np.asarray(jax.jit(unfused_tail)(attn, x))
    t_meg = np.asarray(jax.jit(
        lambda a, x: mega.attn_tail(a, x, nw_m, wo, wgu, wd, eps, dff)
    )(attn, x))
    d, e = np.abs(t_ref - t_meg).max(), nmse(t_meg, t_ref)
    print(f"  attn_tail: max abs diff {d:.2e}  delta-NMSE {e:.2e} "
          f"({'ok' if e < 1e-5 else 'BAD'})", flush=True)

    # ---- interleaved timing ---------------------------------------------
    by_qkv = bm.weight_bytes("q4_0", wqkv.n, wqkv.k)
    by_tail = sum(bm.weight_bytes("q4_0", w.n, w.k) for w in (wo, wgu, wd))
    cases = [
        ("mega norm_qkv",
         lambda x: mega.norm_qkv(wqkv, x, nw_a, eps), (x,), by_qkv),
        ("unfused qkv chain", unfused_qkv, (x,), by_qkv),
        ("mega attn_tail",
         lambda a, x: mega.attn_tail(a, x, nw_m, wo, wgu, wd, eps, dff),
         (attn, x), by_tail),
        ("unfused tail chain", unfused_tail, (attn, x), by_tail),
    ]
    times: dict[str, list[float]] = {name: [] for name, *_ in cases}
    for rep in range(reps):
        for name, fn, args, by in cases:
            r = bm.benchmark_kernel(fn, args, name=f"{name} #{rep}",
                                    bytes_accessed=by)
            print(f"  {r.row()}", flush=True)
            if r.valid:
                times[name].append(r.time_s)

    print("\nmedians:", flush=True)
    for name, _fn, _a, by in cases:
        med = statistics.median(times[name])
        print(f"  {name:<22s} {med*1e6:8.1f} us  {by/med/1e9:7.1f} GB/s",
              flush=True)
    qkv_gain = (statistics.median(times["unfused qkv chain"])
                - statistics.median(times["mega norm_qkv"])) * 1e6
    tail_gain = (statistics.median(times["unfused tail chain"])
                 - statistics.median(times["mega attn_tail"])) * 1e6
    per_layer = qkv_gain + tail_gain
    print(f"\nper-layer gain: qkv {qkv_gain:+.1f} us, tail {tail_gain:+.1f} "
          f"us -> {per_layer:+.1f} us/layer ({16 * per_layer:+.0f} us/step "
          f"at 16 layers)", flush=True)


if __name__ == "__main__":
    main()
