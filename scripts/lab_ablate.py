"""Compute-cost ablation of the headline decode kernel (4096x4x14336 q4_0).

VERDICT r4 weak #1 / item 4: the kernel's median (~51 us) sits ~8 us above
its own layout's pure-DMA probe (~43 us), and round 4 rejected every
structural hypothesis.  The remaining question is WHERE the per-step
compute goes — if the kernel is compute-bound per step (compute ~3.6 us
vs DMA ~3.1 us per K-512 tile), better overlap cannot help and the fix is
LESS COMPUTE.  This lab races stripped variants of the exact kernel's
step (NOT bit-exact — timing only) to attribute the microseconds:

  full        the shipping step structure (masks + 8 stacked dots +
              dense scaling)
  nomask      packed tile used directly as both planes, full scaling
              (isolates the 2 VPU masks over [512, 4096] int8)
  noscale     masks + dots + convert-only accumulation (isolates the
              dense-scaling VPU epilogue)
  dotsonly    no masks, convert-only accumulation (MXU + DMA + acc)
  dot1        lo plane only (halves MXU dispatches AND MACs — MXU
              sensitivity)
  submask     ONE mask (hi) + lo-plane dots as dot(p) - dot(hi) at int32
              (exact: p int8 == lo + hi-masked) — trades a [512, TN] VPU
              mask pass for one extra stacked dot set per step

Each variant runs as a real pallas_call over the same grid/BlockSpecs as
gemm_exact (same DMA stream), so pairwise deltas attribute the VPU/MXU
microseconds and (dotsonly - probe) bounds the pipeline overhead.

Usage: python scripts/lab_ablate.py [reps]
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from quant_gemm_tpu.formats import jax_quant, numpy_ref  # noqa: E402
from quant_gemm_tpu.harness import benchmark as bm  # noqa: E402
from quant_gemm_tpu.harness import datagen  # noqa: E402
from quant_gemm_tpu.kernels import gemm_pallas  # noqa: E402
from quant_gemm_tpu.kernels.gemm_exact import (  # noqa: E402
    _int_dot,
    _stacked_da,
    gemm_exact,
)
from quant_gemm_tpu.formats.blocks import QK  # noqa: E402
from quant_gemm_tpu.kernels.gemm_pallas import scale_f32  # noqa: E402

N, M, K = 4096, 4, 14336
TKP, TN = 512, 4096


def _diag4(qa_t):
    """[4, 128] int8 -> [16, 128] block-diagonal (4 blocks x 4 tokens)."""
    rep = jnp.broadcast_to(qa_t[None], (4, 4, 128))
    col_g = jax.lax.broadcasted_iota(jnp.int32, (4, 4, 128), 2) // QK
    row_g = jax.lax.broadcasted_iota(jnp.int32, (4, 4, 128), 0)
    return jnp.where(col_g == row_g, rep, jnp.int8(0)).reshape(16, 128)


def _ablate_kernel(packed_ref, dlo_ref, dhi_ref, qa_ref, da_ref, out_ref,
                   *, tkb, variant):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = packed_ref[:]
    masked = variant in ("full", "noscale")
    sub = variant == "submask"
    if sub:
        hi = p & jnp.int8(-16)
        lo = p  # lo dots become dot(p) - dot(hi) at int32
    else:
        lo = (p & jnp.int8(0x0F)) if masked else p
        hi = (p & jnp.int8(-16)) if masked else p
    scaled = variant in ("full", "nomask", "submask")

    gs = 4
    acc = jnp.zeros_like(out_ref)
    for pi, (qw, d_ref) in enumerate([(lo, dlo_ref), (hi, dhi_ref)]):
        if variant == "dot1" and pi == 1:
            break
        koff = kt + pi * pl.num_programs(1)
        d = scale_f32(d_ref[:])
        for t in range(tkb // gs):
            qa_t = qa_ref[0:4, pl.ds(koff * TKP + t * 128, 128)]
            diag = _diag4(qa_t)
            res = _int_dot(diag, qw[t * 128:(t + 1) * 128, :])  # [16, N]
            if sub and pi == 0:
                res = res - _int_dot(diag, hi[t * 128:(t + 1) * 128, :])
            if scaled:  # the shipping dense-scaling epilogue
                sl = da_ref[pl.ds(koff * tkb + t * gs, gs), 0:4]
                v = _stacked_da(sl, 4)
                dd = jnp.repeat(d[t * gs:(t + 1) * gs, :], 4, axis=0)
                s = dd * (v * res.astype(jnp.float32))
                acc += s[0:8, :] + s[8:16, :]
            else:
                acc += res[0:8].astype(jnp.float32)
    out_ref[:] += acc


def run_variant(wp, qa, da_t, variant):
    kdim, np_ = wp.packed_t.shape
    tkb = TKP // QK
    nkt = kdim // TKP
    kern = functools.partial(_ablate_kernel, tkb=tkb, variant=variant)

    def wspec(bs, off=0):
        return pl.BlockSpec(bs, lambda nt, kt, o=off: (kt + o, nt),
                            memory_space=pltpu.VMEM)

    def full(arr):
        return pl.BlockSpec(arr.shape, lambda nt, kt: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=(np_ // TN, nkt),
        in_specs=[wspec((TKP, TN)), wspec((tkb, TN)),
                  wspec((tkb, TN), off=nkt), full(qa), full(da_t)],
        out_specs=pl.BlockSpec((8, TN), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(wp.packed_t, wp.d_t, wp.d_t, qa, da_t)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print(f"device: {jax.devices()[0]}", flush=True)
    w = datagen.normal((N, K), seed=2)
    a = datagen.normal((M, K), seed=1)
    wp = jax.device_put(gemm_pallas.prepare(numpy_ref.quantize_q4_0(w)))
    aq = jax_quant.device_put(numpy_ref.quantize_q8_1(a))
    qa = jnp.pad(jnp.asarray(aq.qs), ((0, 4), (0, 0)))
    da_t = jnp.pad(jnp.asarray(aq.d, jnp.float32), ((0, 4), (0, 0))).T
    by = bm.prepared_bytes(wp) + M * K + M * N * 4

    cases = [("shipping gemm_exact", lambda w_, a_: gemm_exact(w_, a_),
              (wp, aq), by)]
    for v in ("full", "nomask", "noscale", "dotsonly", "dot1", "submask"):
        cases.append((f"ablate {v}",
                      functools.partial(run_variant, variant=v),
                      (wp, qa, da_t), by))
    med = bm.interleaved_medians(cases, reps=reps)
    print("\nmedians (43 us = r4 pure-DMA probe of this stream):",
          flush=True)
    for name, *_ , byy in cases:
        if name in med:
            print(f"  {name:<22s} {med[name]*1e6:8.1f} us "
                  f"{byy/med[name]/1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
