"""Lab: XOR-0x80 repacked exact kernel — can it break the 74% decode plateau?

Formulation (new vs the rejected "signed-nibble bitcast" idea): the weight
bytes are repacked ONCE at prepare time as ``int8(p ^ 0x80)``.  Then

* low plane:  ``p & 0x0F``  == the raw low-nibble codes (0..15), already i8;
* high plane: ``p & 0xF0``  (i8 arithmetic, mask = -16) == ``16*hi - 128``
  EXACTLY for every hi in 0..15 (the xor flips the nibble's top bit, which
  in two's-complement i8 turns the 0..15 range into a biased linear code).

So both planes reach the MXU with ONE native-i8 mask each — no u8->i32
widen, no vector shift, no i32->i8 narrowing (the ~24 us VPU unpack cost in
docs/PERF_NOTES.md).  The high-plane dot returns ``16*sumi_hi - 128*sumq_a``
which is fixed up exactly in int32 with the activation's per-block code sums
(one extra tiny [nb, M] i32 operand; ``s_a`` cannot substitute — it is
f16-rounded).

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


def _kernel_x8(packed_ref, dlo_ref, dhi_ref, qa_ref, da_ref, sa_ref,
               sq_ref, out_ref, *, tkb, tkp, nkt):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = packed_ref[:]  # int8 [tkp, tn], xored
    lo = p & jnp.int8(0x0F)           # raw low codes 0..15
    hi16 = p & jnp.int8(-16)          # == 16*hi - 128 exactly

    def plane(qw, d_ref, koff, is_hi):
        qa = qa_ref[:, pl.ds(koff * tkp, tkp)]
        da = da_ref[pl.ds(koff * tkb, tkb), :]
        sa = sa_ref[pl.ds(koff * tkb, tkb), :]
        sq = sq_ref[pl.ds(koff * tkb, tkb), :]
        acc = jnp.zeros_like(out_ref)
        d = d_ref[:]
        for b in range(tkb):
            sl = slice(b * QK, (b + 1) * QK)
            raw = _int_dot(qa[:, sl], qw[sl, :])
            if is_hi:
                # raw = 16*sumi - 128*sumq ; exact i32 fixup
                sumi = (raw + 128 * sq[b, :][:, None]) >> 4
            else:
                sumi = raw
            sumi = sumi.astype(jnp.float32)
            d_w = d[b, :][None, :]
            d_a = da[b, :][:, None]
            s_a = sa[b, :][:, None]
            acc += d_w * (d_a * sumi - 8.0 * s_a)
        return acc

    out_ref[:] += plane(lo, dlo_ref, kt, False)
    out_ref[:] += plane(hi16, dhi_ref, kt + nkt, True)


def gemm_exact_x8(wx, d_t, a_q, sumq_t, *, n, k, tn=4096, tkp=512,
                  interpret=False):
    """wx: int8[KP/2, NP] xored packed (K-major); d_t f32[KBP, NP]."""
    m = a_q.qs.shape[0]
    kdim = wx.shape[0]
    tkp = min(tkp, kdim)
    while kdim % tkp:
        tkp //= 2
    tkb = tkp // QK
    nkt = kdim // tkp
    tm = round_up(m, 8)
    np_ = wx.shape[1]
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
    sq_t = pad_scales_k(padm(sumq_t).astype(jnp.int32), k, kdim, True).T

    grid = (np_ // tn, nkt)

    def wspec(bs, off=0):
        return pl.BlockSpec(bs, lambda nt, kt, o=off: (kt + o, nt),
                            memory_space=pltpu.VMEM)

    def full_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda nt, kt: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_x8, tkb=tkb, tkp=tkp, nkt=nkt),
        grid=grid,
        in_specs=[
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off=nkt),
            full_spec(qa), full_spec(da_t), full_spec(sa_t), full_spec(sq_t),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tm, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(wx, d_t, d_t, qa, da_t, sa_t, sq_t)
    return out[:m, :n]


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

    # xored weight (one-time repack, emulating a prepare() change)
    wx = jnp.asarray(
        (np.asarray(wp.packed_t) ^ 0x80).view(np.int8)
    )
    d_t = wp.d_t
    # per-block activation code sums [M, nb] (int32)
    nb = k // QK
    sumq = np.asarray(a_q_np.qs).reshape(m, nb, QK).astype(np.int64).sum(-1)
    sumq_t = jnp.asarray(sumq.astype(np.int32))

    flops = bm.gemm_flops(m, n_feat, k)
    wbytes = bm.weight_bytes("q4_0", n_feat, k)
    total_bytes = wbytes + m * k + m * n_feat * 4

    base = np.asarray(gemm_exact(wp, a_q, tn=4096, tkp=512))
    out = np.asarray(gemm_exact_x8(wx, d_t, a_q, sumq_t, n=n_feat, k=k))
    exact_equal = np.array_equal(base, out)
    met = ErrorMetrics.compute(out, golden)
    print(f"bit-identical to gemm_exact: {exact_equal}; nmse vs fp32 "
          f"{met.nmse:.3e}", flush=True)
    if not exact_equal:
        bad = np.abs(base - out)
        print("max abs diff:", bad.max(), "at", np.unravel_index(bad.argmax(), bad.shape))
        return

    results = []
    # interleaved A/B runs
    for rep in range(3):
        for name, fn, args in [
            ("exact tn4096/tkp512",
             lambda w, aq: gemm_exact(w, aq, tn=4096, tkp=512), (wp, a_q)),
            ("x8 tn4096/tkp512",
             lambda w, d, aq, sq: gemm_exact_x8(w, d, aq, sq, n=n_feat, k=k,
                                                tn=4096, tkp=512),
             (wx, d_t, a_q, sumq_t)),
            ("x8 tn2048/tkp512",
             lambda w, d, aq, sq: gemm_exact_x8(w, d, aq, sq, n=n_feat, k=k,
                                                tn=2048, tkp=512),
             (wx, d_t, a_q, sumq_t)),
            ("x8 tn4096/tkp1024",
             lambda w, d, aq, sq: gemm_exact_x8(w, d, aq, sq, n=n_feat, k=k,
                                                tn=4096, tkp=1024),
             (wx, d_t, a_q, sumq_t)),
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
