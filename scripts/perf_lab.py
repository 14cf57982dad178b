"""Decode-kernel perf lab: candidate W4A8 kernels raced on the real chip.

Goal: q4_0 decode (4096 out-features x 4 tokens x K 14336) from 64% to
>=90% of the ~820 GB/s HBM roofline.  PERF_NOTES.md shows the current
dequant kernel is VPU-bound at ~6 vector ops per weight element; the
candidates here cut that count:

  comp      dequant kernel minus the per-element "-8" (compensated by a
            block-sum matmul against d_w):   ~5 ops/elem
  blockdot  raw-code dot (no *d, no -8 per element); d_w folded into a
            per-block epilogue contraction:  ~2.5 ops/elem
  exact     the existing integer-parity kernel at serving tiles

Each candidate is verified against the FP32 golden before timing.
Usage: python scripts/perf_lab.py [M]
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
from quant_gemm_tpu.ref import gemm as refg
from quant_gemm_tpu.utils import round_up


# ---------------------------------------------------------------------------
# V1 comp: dequant kernel without the per-element offset subtraction
# ---------------------------------------------------------------------------


def _kernel_comp(packed_ref, dlo_ref, dhi_ref, alo_ref, ahi_ref,
                 blo_ref, bhi_ref, out_ref, *, offset):
    """q*d dequant (raw codes!), offset compensated by ablk @ (offset*d)."""

    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    packed = packed_ref[:].astype(jnp.int32)

    def plane(nib, d_ref, a_ref, ablk_ref):
        d = d_ref[:]
        w = (nib.astype(jnp.float32) * jnp.repeat(d, QK, axis=0)).astype(
            jnp.bfloat16
        )
        main = jax.lax.dot_general(
            a_ref[:], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # ablk_ref is [TKB, TM] (transposed); contract over blocks
        comp = jax.lax.dot_general(
            ablk_ref[:], d * float(offset), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return main - comp

    out_ref[:] += plane(packed & 0x0F, dlo_ref, alo_ref, blo_ref)
    out_ref[:] += plane(packed >> 4, dhi_ref, ahi_ref, bhi_ref)


def gemm_comp(w, a, *, tn=2048, tkp=1024, interpret=False):
    m, k = a.shape
    khalf = k // 2
    tkb = tkp // QK
    nkt = khalf // tkp
    mp = round_up(m, 8)
    np_ = round_up(w.n, tn)
    a = jnp.pad(a, ((0, mp - m), (0, 0))) if mp != m else a
    nb = k // QK
    ablk_t = a.reshape(mp, nb, QK).sum(axis=2).T  # [nb, mp] f32 block sums

    def wspec(bs, off=0):
        return pl.BlockSpec(bs, lambda mt, nt, kt, o=off: (kt + o, nt),
                            memory_space=pltpu.VMEM)

    def aspec(bs, off=0):
        return pl.BlockSpec(bs, lambda mt, nt, kt, o=off: (mt, kt + o),
                            memory_space=pltpu.VMEM)

    def bspec(bs, off=0):  # [nb, mp] sliced on blocks
        return pl.BlockSpec(bs, lambda mt, nt, kt, o=off: (kt + o, mt),
                            memory_space=pltpu.VMEM)

    grid = (mp // min(mp, 256), np_ // tn, nkt)
    tm = mp // grid[0]
    out = pl.pallas_call(
        functools.partial(_kernel_comp, offset=8),
        grid=grid,
        in_specs=[
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off=nkt),
            aspec((tm, tkp)),
            aspec((tm, tkp), off=nkt),
            bspec((tkb, tm)),
            bspec((tkb, tm), off=nkt),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda mt, nt, kt: (mt, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(w.packed_t, w.d_t, w.d_t, a.astype(jnp.bfloat16),
      a.astype(jnp.bfloat16), ablk_t, ablk_t)
    return out[:m, : w.n]


# ---------------------------------------------------------------------------
# V2 blockdot: raw-code batched dot, d_w folded into the epilogue
# ---------------------------------------------------------------------------


def _kernel_blockdot(packed_ref, dlo_ref, dhi_ref, a3lo_ref, a3hi_ref,
                     blo_ref, bhi_ref, out_ref, *, offset, tkb, dot_dtype):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    packed = packed_ref[:].astype(jnp.int32)

    def plane(nib, d_ref, a3_ref, ablk_ref):
        q = nib.astype(jnp.float32)
        if dot_dtype is not None:
            q = q.astype(dot_dtype)
        tn = q.shape[1]
        qw3 = q.reshape(tkb, QK, tn)  # sublane split: free
        a3 = a3_ref[:].astype(q.dtype)  # [tkb, tm, QK]
        part = jax.lax.dot_general(
            a3, qw3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [tkb, tm, tn]
        d = d_ref[:]  # [tkb, tn]
        acc = jnp.sum(part * d[:, None, :], axis=0)  # [tm, tn]
        # ablk_ref is [TKB, TM] (transposed); contract over blocks
        comp = jax.lax.dot_general(
            ablk_ref[:], d * float(offset), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return acc - comp

    out_ref[:] += plane(packed & 0x0F, dlo_ref, a3lo_ref, blo_ref)
    out_ref[:] += plane(packed >> 4, dhi_ref, a3hi_ref, bhi_ref)


def gemm_blockdot(w, a, *, tn=2048, tkp=512, dot_dtype=jnp.bfloat16,
                  interpret=False):
    m, k = a.shape
    khalf = k // 2
    tkb = tkp // QK
    nkt = khalf // tkp
    mp = round_up(m, 8)
    np_ = round_up(w.n, tn)
    a = jnp.pad(a, ((0, mp - m), (0, 0))) if mp != m else a
    nb = k // QK
    a3 = a.reshape(mp, nb, QK).transpose(1, 0, 2)  # [nb, mp, QK]
    ablk_t = a3.sum(axis=2)  # [nb, mp]

    def wspec(bs, off=0):
        return pl.BlockSpec(bs, lambda nt, kt, o=off: (kt + o, nt),
                            memory_space=pltpu.VMEM)

    def a3spec(off=0):
        return pl.BlockSpec((tkb, mp, QK), lambda nt, kt, o=off: (kt + o, 0, 0),
                            memory_space=pltpu.VMEM)

    def bspec(off=0):
        return pl.BlockSpec((tkb, mp), lambda nt, kt, o=off: (kt + o, 0),
                            memory_space=pltpu.VMEM)

    grid = (np_ // tn, nkt)
    out = pl.pallas_call(
        functools.partial(_kernel_blockdot, offset=8, tkb=tkb,
                          dot_dtype=dot_dtype),
        grid=grid,
        in_specs=[
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off=nkt),
            a3spec(),
            a3spec(off=nkt),
            bspec(),
            bspec(off=nkt),
        ],
        out_specs=pl.BlockSpec((mp, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(w.packed_t, w.d_t, w.d_t, a3, a3, ablk_t, ablk_t)
    return out[:m, : w.n]


# ---------------------------------------------------------------------------
# V6 exact2: gemm_exact with a refactored epilogue —
#   s_a compensation factored out of the block loop into ONE dot per tile,
#   per-block scaling as a single outer product d_a (x) d_w.
# Optional f16-bit-packed scales (u16 decoded in-kernel) cut ~9% of traffic.
# ---------------------------------------------------------------------------


def _f16_bits_to_f32(bits_u16: jax.Array) -> jax.Array:
    """Decode IEEE f16 bit patterns (as uint16) to f32 on i32 lanes."""
    b = bits_u16.astype(jnp.int32)
    sign = (b & 0x8000) << 16
    expo = (b >> 10) & 0x1F
    mant = b & 0x3FF
    # normal: f32 = sign | (expo+112)<<23 | mant<<13
    normal = sign | ((expo + 112) << 23) | (mant << 13)
    fnormal = jax.lax.bitcast_convert_type(normal, jnp.float32)
    # subnormal: mant * 2^-24 (sign applied); zero handled by mant==0
    fsub = jax.lax.bitcast_convert_type(sign | 0x3F800000, jnp.float32) * (
        mant.astype(jnp.float32) * (2.0 ** -24)
    )
    return jnp.where(expo == 0, fsub, fnormal)


def _kernel_exact2(packed_ref, dlo_ref, dhi_ref, qa_lo_ref, qa_hi_ref,
                   dalo_ref, dahi_ref, salo_ref, sahi_ref, out_ref,
                   *, tkb, offset, half_scales):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    packed = packed_ref[:].astype(jnp.int32)

    def plane(qw_i8, d_ref, qa_ref, da_ref, sa_ref):
        d = d_ref[:]
        if half_scales:
            d = _f16_bits_to_f32(d)
        comp = jax.lax.dot_general(
            sa_ref[:], d * float(offset), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        da = da_ref[:]  # [tkb, tm]
        acc = -comp
        for b in range(tkb):
            sl = slice(b * QK, (b + 1) * QK)
            sumi = jax.lax.dot_general(
                qa_ref[:, sl], qw_i8[sl, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            dd = da[b, :][:, None] * d[b, :][None, :]  # [tm, tn] outer
            acc += sumi.astype(jnp.float32) * dd
        return acc

    out_ref[:] += plane((packed & 0x0F).astype(jnp.int8), dlo_ref,
                        qa_lo_ref, dalo_ref, salo_ref)
    out_ref[:] += plane((packed >> 4).astype(jnp.int8), dhi_ref,
                        qa_hi_ref, dahi_ref, sahi_ref)


def gemm_exact2(w, a_q, *, tn=4096, tkp=512, half_scales=False,
                interpret=False):
    m, k = a_q.qs.shape
    khalf = k // 2
    tkb = tkp // QK
    nkt = khalf // tkp
    mp = round_up(m, 8)
    np_ = round_up(w.n, tn)

    def padm(x):
        return jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x

    qa = padm(a_q.qs)
    da_t = padm(a_q.d).T.astype(jnp.float32)
    sa_t = padm(a_q.s).T.astype(jnp.float32)
    d_op = (
        jax.lax.bitcast_convert_type(w.d_t.astype(jnp.float16), jnp.uint16)
        if half_scales else w.d_t
    )

    def wspec(bs, off=0):
        return pl.BlockSpec(bs, lambda nt, kt, o=off: (kt + o, nt),
                            memory_space=pltpu.VMEM)

    def aspec(off=0):
        return pl.BlockSpec((mp, tkp), lambda nt, kt, o=off: (0, kt + o),
                            memory_space=pltpu.VMEM)

    def vspec(off=0):
        return pl.BlockSpec((tkb, mp), lambda nt, kt, o=off: (kt + o, 0),
                            memory_space=pltpu.VMEM)

    grid = (np_ // tn, nkt)
    out = pl.pallas_call(
        functools.partial(_kernel_exact2, tkb=tkb, offset=8,
                          half_scales=half_scales),
        grid=grid,
        in_specs=[
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off=nkt),
            aspec(),
            aspec(off=nkt),
            vspec(),
            vspec(off=nkt),
            vspec(),
            vspec(off=nkt),
        ],
        out_specs=pl.BlockSpec((mp, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(w.packed_t, d_op, d_op, qa, qa, da_t, da_t, sa_t, sa_t)
    return out[:m, : w.n]


# ---------------------------------------------------------------------------
# V5 bdi8: int8 batched block-dot (exact integer math, lean epilogue)
#   part[b,m,n] = int8dot(qa[b,m,:], qw[b,:,n])          (MXU int8)
#   out += sum_b part*d_a[b,m]*d_w[b,n] - 8*(s_a @ d_w)  (VPU + tiny dot)
# ---------------------------------------------------------------------------


def _kernel_bdi8(packed_ref, dlo_ref, dhi_ref, qa3lo_ref, qa3hi_ref,
                 dalo_ref, dahi_ref, salo_ref, sahi_ref, out_ref,
                 *, offset, tkb):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    packed = packed_ref[:].astype(jnp.int32)

    def plane(nib, d_ref, qa3_ref, da_ref, sa_ref):
        tn = nib.shape[1]
        qw3 = nib.astype(jnp.int8).reshape(tkb, QK, tn)
        part = jax.lax.dot_general(
            qa3_ref[:], qw3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # [tkb, tm, tn] exact int32
        d = d_ref[:]  # [tkb, tn]
        da = da_ref[:]  # [tkb, tm]
        acc = jnp.sum(
            part.astype(jnp.float32) * da[:, :, None] * d[:, None, :], axis=0
        )
        comp = jax.lax.dot_general(
            sa_ref[:], d * float(offset), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return acc - comp

    out_ref[:] += plane(packed & 0x0F, dlo_ref, qa3lo_ref, dalo_ref, salo_ref)
    out_ref[:] += plane(packed >> 4, dhi_ref, qa3hi_ref, dahi_ref, sahi_ref)


def gemm_bdi8(w, a_q, *, tn=4096, tkp=512, interpret=False):
    m, k = a_q.qs.shape
    khalf = k // 2
    tkb = tkp // QK
    nkt = khalf // tkp
    mp = round_up(m, 8)
    np_ = round_up(w.n, tn)
    nb = k // QK

    def padm(x):
        return jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x

    qa3 = padm(a_q.qs).reshape(mp, nb, QK).transpose(1, 0, 2)  # [nb, mp, QK]
    da_t = padm(a_q.d).T.astype(jnp.float32)  # [nb, mp]
    sa_t = padm(a_q.s).T.astype(jnp.float32)

    def wspec(bs, off=0):
        return pl.BlockSpec(bs, lambda nt, kt, o=off: (kt + o, nt),
                            memory_space=pltpu.VMEM)

    def a3spec(off=0):
        return pl.BlockSpec((tkb, mp, QK), lambda nt, kt, o=off: (kt + o, 0, 0),
                            memory_space=pltpu.VMEM)

    def vspec(off=0):
        return pl.BlockSpec((tkb, mp), lambda nt, kt, o=off: (kt + o, 0),
                            memory_space=pltpu.VMEM)

    grid = (np_ // tn, nkt)
    out = pl.pallas_call(
        functools.partial(_kernel_bdi8, offset=8, tkb=tkb),
        grid=grid,
        in_specs=[
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off=nkt),
            a3spec(),
            a3spec(off=nkt),
            vspec(),
            vspec(off=nkt),
            vspec(),
            vspec(off=nkt),
        ],
        out_specs=pl.BlockSpec((mp, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(w.packed_t, w.d_t, w.d_t, qa3, qa3, da_t, da_t, sa_t, sa_t)
    return out[:m, : w.n]


# ---------------------------------------------------------------------------
# V3 dequant-f32: current dequant dataflow, f32 operands, DEFAULT precision
# (the MXU rounds to bf16 internally — same numerics, no explicit cast ops)
# ---------------------------------------------------------------------------


def _kernel_dequant_f32(packed_ref, dlo_ref, dhi_ref, alo_ref, ahi_ref,
                        out_ref, *, offset):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    packed = packed_ref[:].astype(jnp.int32)

    def plane(nib, d_ref, a_ref):
        d = jnp.repeat(d_ref[:], QK, axis=0)
        w = (nib.astype(jnp.float32) - float(offset)) * d
        return jax.lax.dot_general(
            a_ref[:], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out_ref[:] += plane(packed & 0x0F, dlo_ref, alo_ref)
    out_ref[:] += plane(packed >> 4, dhi_ref, ahi_ref)


def gemm_dequant_f32(w, a, *, tn=2048, tkp=1024, interpret=False):
    m, k = a.shape
    khalf = k // 2
    tkb = tkp // QK
    nkt = khalf // tkp
    mp = round_up(m, 8)
    np_ = round_up(w.n, tn)
    a = jnp.pad(a, ((0, mp - m), (0, 0))) if mp != m else a

    def wspec(bs, off=0):
        return pl.BlockSpec(bs, lambda mt, nt, kt, o=off: (kt + o, nt),
                            memory_space=pltpu.VMEM)

    def aspec(off=0):
        return pl.BlockSpec((mp, tkp), lambda mt, nt, kt, o=off: (mt, kt + o),
                            memory_space=pltpu.VMEM)

    grid = (1, np_ // tn, nkt)
    out = pl.pallas_call(
        functools.partial(_kernel_dequant_f32, offset=8),
        grid=grid,
        in_specs=[
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off=nkt),
            aspec(),
            aspec(off=nkt),
        ],
        out_specs=pl.BlockSpec((mp, tn), lambda mt, nt, kt: (mt, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(w.packed_t, w.d_t, w.d_t, a, a)
    return out[:m, : w.n]


# ---------------------------------------------------------------------------
# V4 DMA floor probe: touch every weight byte, minimal compute
# ---------------------------------------------------------------------------


def _kernel_probe(packed_ref, dlo_ref, dhi_ref, out_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = packed_ref[:8, :].astype(jnp.int32).astype(jnp.float32)
    out_ref[:] += p + dlo_ref[:8, :] + dhi_ref[:8, :]


def dma_probe(w, *, tn=2048, tkp=512, interpret=False):
    khalf = w.k // 2
    tkb = tkp // QK
    nkt = khalf // tkp
    np_ = round_up(w.n, tn)

    def wspec(bs, off=0):
        return pl.BlockSpec(bs, lambda nt, kt, o=off: (kt + o, nt),
                            memory_space=pltpu.VMEM)

    grid = (np_ // tn, nkt)
    return pl.pallas_call(
        _kernel_probe,
        grid=grid,
        in_specs=[
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off=nkt),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(w.packed_t, w.d_t, w.d_t)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_feat, k = 4096, 14336
    print(f"shape: out-features {n_feat} x tokens {m} x K {k}", flush=True)

    wf = datagen.normal((n_feat, k), seed=2)
    af = datagen.normal((m, k), seed=1)
    w_q = numpy_ref.quantize_q4_0(wf)
    a_q_np = numpy_ref.quantize_q8_1(af)
    wp = jax.device_put(gemm_pallas.prepare(w_q))
    # the lab kernels in this file decode the PRE-x8 raw uint8 layout;
    # prepare() now stores packed bytes XOR 0x80 (int8) — undo it for them
    wp_raw = jax.device_put(gemm_pallas.PreparedWeight(
        wp.qtype, wp.n, wp.k,
        jnp.asarray((np.asarray(wp.packed_t).view(np.uint8) ^ 0x80)),
        wp.qs_t, wp.d_t, wp.m_t, wp.qh_t,
    ))
    a_q = jax_quant.device_put(a_q_np)
    golden = refg.gemm_fp32(af, wf)

    # folded f32 activations (same fold the serving kernel uses)
    afold = (a_q.qs.astype(jnp.float32) * jax_quant.expand_scale(a_q.d))
    afold = jax.device_put(afold)
    abf = afold.astype(jnp.bfloat16)

    flops = bm.gemm_flops(m, n_feat, k)
    wbytes = bm.weight_bytes("q4_0", n_feat, k)
    total_bytes = wbytes + m * k + m * n_feat * 4
    results = []

    def race(name, fn, args):
        try:
            out = np.asarray(fn(*args))
        except Exception as e:  # noqa: BLE001
            print(f"{name:<28s} FAILED: {type(e).__name__}: {e}"[:200],
                  flush=True)
            return
        met = ErrorMetrics.compute(out, golden)
        if met.nmse > 1.5e-2:
            print(f"{name:<28s} WRONG: nmse={met.nmse:.3e}", flush=True)
            return
        r = bm.benchmark_kernel(fn, args, name=name, flops=flops,
                                bytes_accessed=total_bytes)
        results.append((r, met.nmse))
        print(f"{r.row()}  nmse={met.nmse:.2e}  "
              f"roofline={r.gbps / 8.2:.0f}%", flush=True)

    # DMA floor: what the pipeline can stream regardless of compute
    for tn, tkp in [(4096, 512)]:
        try:
            fn = lambda w, tn=tn, tkp=tkp: dma_probe(w, tn=tn, tkp=tkp)
            _ = np.asarray(fn(wp))
            r = bm.benchmark_kernel(fn, (wp,), name=f"probe tn{tn}/tkp{tkp}",
                                    bytes_accessed=wbytes)
            print(f"{r.row()}  roofline={r.gbps / 8.2:.0f}%", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"probe tn{tn}/tkp{tkp} FAILED: {e}"[:160], flush=True)

    race("exact tn4096/tkp512",
         lambda w, aq: gemm_exact(w, aq, tn=4096, tkp=512), (wp, a_q))
    for tn, tkp in [(4096, 512), (4096, 256), (2048, 512)]:
        race(f"exact2 tn{tn}/tkp{tkp}",
             lambda w, aq, tn=tn, tkp=tkp: gemm_exact2(w, aq, tn=tn, tkp=tkp),
             (wp_raw, a_q))
    race("exact2h tn4096/tkp512",
         lambda w, aq: gemm_exact2(w, aq, tn=4096, tkp=512,
                                   half_scales=True), (wp_raw, a_q))

    print("\nbest:", flush=True)
    for r, nmse in sorted(results, key=lambda t: t[0].time_s)[:3]:
        print(f"  {r.row()}  nmse={nmse:.2e}")


if __name__ == "__main__":
    main()
