"""Lab: x8 decode (integrated in gemm_exact) vs the legacy i32 unpack chain.

prepare() now stores 4/5-bit packed bytes XOR 0x80 as int8 (the "x8
encoding"); gemm_exact decodes q4 planes with one native-i8 mask each plus
an exact int32 hi-plane fixup (see kernels/gemm_exact.py docstring).  This
lab races the integrated kernel against a LEGACY variant that recovers the
raw bytes in-kernel at i32 (mask+xor, then the old widen/shift/mask chain)
— arithmetically identical, so the delta isolates the unpack cost that
capped decode at ~74% of the ~900 GB/s roofline (docs/PERF_NOTES.md).

Usage: python scripts/lab_x8.py [M]
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

from quant_gemm_tpu.formats import jax_quant, numpy_ref
from quant_gemm_tpu.formats.blocks import QK
from quant_gemm_tpu.harness import benchmark as bm
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.harness.metrics import ErrorMetrics
from quant_gemm_tpu.kernels import gemm_pallas
from quant_gemm_tpu.kernels.gemm_exact import gemm_exact
from quant_gemm_tpu.kernels.gemm_pallas import pad_activation_k, pad_scales_k
from quant_gemm_tpu.ref import gemm as refg
from quant_gemm_tpu.utils import round_up


def _int_dot(qa, qw):
    return jax.lax.dot_general(
        qa.astype(jnp.int8), qw.astype(jnp.int8),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _kernel_legacy(packed_ref, dlo_ref, dhi_ref, qa_ref, da_ref, sa_ref,
                   out_ref, *, tkb, tkp, nkt):
    """Old unpack chain, reading the x8 store: i8 -> i32, un-xor, shift."""
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    packed = (packed_ref[:].astype(jnp.int32) & 0xFF) ^ 0x80  # raw bytes

    def plane(qw, d_ref, koff):
        qa = qa_ref[:, pl.ds(koff * tkp, tkp)]
        da = da_ref[pl.ds(koff * tkb, tkb), :]
        sa = sa_ref[pl.ds(koff * tkb, tkb), :]
        acc = jnp.zeros_like(out_ref)
        d = d_ref[:]
        for b in range(tkb):
            sl = slice(b * QK, (b + 1) * QK)
            sumi = _int_dot(qa[:, sl], qw[sl, :]).astype(jnp.float32)
            acc += d[b, :][None, :] * (
                da[b, :][:, None] * sumi - 8.0 * sa[b, :][:, None]
            )
        return acc

    out_ref[:] += plane(packed & 0x0F, dlo_ref, kt)
    out_ref[:] += plane(packed >> 4, dhi_ref, kt + nkt)


def gemm_legacy(w, a_q, *, tn=4096, tkp=512, interpret=False):
    m, k = a_q.qs.shape
    kdim = w.packed_t.shape[0]
    tkp = min(tkp, kdim)
    while kdim % tkp:
        tkp //= 2
    tkb = tkp // QK
    nkt = kdim // tkp
    tm = round_up(m, 8)
    np_ = w.packed_t.shape[1]
    tn = min(tn, np_)
    tn -= tn % 128
    while np_ % tn:
        tn -= 128

    def padm(x):
        x = jnp.asarray(x)
        pr = tm - x.shape[0]
        return jnp.pad(x, ((0, pr), (0, 0))) if pr else x

    qa = pad_activation_k(padm(a_q.qs), k, kdim, True)
    da_t = pad_scales_k(padm(a_q.d).astype(jnp.float32), k, kdim, True).T
    sa_t = pad_scales_k(padm(a_q.s).astype(jnp.float32), k, kdim, True).T

    def wspec(bs, off=0):
        return pl.BlockSpec(bs, lambda nt, kt, o=off: (kt + o, nt),
                            memory_space=pltpu.VMEM)

    def full_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda nt, kt: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_legacy, tkb=tkb, tkp=tkp, nkt=nkt),
        grid=(np_ // tn, nkt),
        in_specs=[
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off=nkt),
            full_spec(qa), full_spec(da_t), full_spec(sa_t),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tm, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(w.packed_t, w.d_t, w.d_t, qa, da_t, sa_t)
    return out[:m, : w.n]


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_feat, k = 4096, 14336
    print(f"shape: out-features {n_feat} x tokens {m} x K {k}", flush=True)

    wf = datagen.normal((n_feat, k), seed=2)
    af = datagen.normal((m, k), seed=1)
    w_q = numpy_ref.quantize_q4_0(wf)
    a_q_np = numpy_ref.quantize_q8_1(af)
    wp = jax.device_put(gemm_pallas.prepare(w_q))
    a_q = jax_quant.device_put(a_q_np)
    golden = refg.gemm_fp32(af, wf)

    flops = bm.gemm_flops(m, n_feat, k)
    wbytes = bm.weight_bytes("q4_0", n_feat, k)
    total_bytes = wbytes + m * k + m * n_feat * 4

    legacy = np.asarray(gemm_legacy(wp, a_q, tn=4096, tkp=512))
    out = np.asarray(gemm_exact(wp, a_q, tn=4096, tkp=512))
    exact_equal = np.array_equal(legacy, out)
    met = ErrorMetrics.compute(out, golden)
    print(f"x8 bit-identical to legacy: {exact_equal}; nmse vs fp32 "
          f"{met.nmse:.3e}", flush=True)
    if not exact_equal:
        bad = np.abs(legacy - out)
        print("max abs diff:", bad.max(),
              "at", np.unravel_index(bad.argmax(), bad.shape))
        return

    results = []
    for rep in range(3):  # interleaved A/B (±10% chip variance)
        for name, fn, args in [
            ("legacy tn4096/tkp512",
             lambda w, aq: gemm_legacy(w, aq, tn=4096, tkp=512), (wp, a_q)),
            ("x8 tn4096/tkp512",
             lambda w, aq: gemm_exact(w, aq, tn=4096, tkp=512), (wp, a_q)),
            ("x8 tn2048/tkp512",
             lambda w, aq: gemm_exact(w, aq, tn=2048, tkp=512), (wp, a_q)),
            ("x8 tn4096/tkp1024",
             lambda w, aq: gemm_exact(w, aq, tn=4096, tkp=1024), (wp, a_q)),
        ]:
            r = bm.benchmark_kernel(fn, args, name=f"{name} #{rep}",
                                    flops=flops, bytes_accessed=total_bytes)
            results.append(r)
            print(f"{r.row()}  roofline={r.gbps / 9.0:.0f}%", flush=True)

    print("\nbest:", flush=True)
    for r in sorted(results, key=lambda t: t.time_s)[:4]:
        print(f"  {r.row()}")


if __name__ == "__main__":
    main()
