"""Exact-integer W4A8/W8A8 Pallas kernel — bit-parity with the reference.

Reproduces the reference's integer dataflow (gemm_reference.h:175-222,
gemm_quant_formats.cuh vec_dots) on the MXU: per 32-block **exact int32
dot products** of raw codes, then the per-block f32 epilogue

* q4_0:  ``d_w * (d_a * sumi - 8 * s_a)``
* q8_0:  ``d_w * d_a * sumi``

accumulated across blocks in f32.  The dp4a lane parallelism of the CUDA
version becomes an int8 ``dot_general`` with contraction width 32 per block —
deliberately narrow (25% MXU K-utilization) because this kernel's job is
*numerical parity with the integer golden*, not speed; the serving path is
:mod:`quant_gemm_tpu.kernels.gemm_pallas`.

Layout notes: weights use the same K-major planar PreparedWeight; activation
scale/sum vectors are passed transposed ([nb, M]) so per-block rows can be
sliced on sublanes.  The K grid walks packed-byte tiles; each grid step
processes the tile's lo-nibble blocks and hi-nibble blocks with their
matching activation blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.blocks import QK, Q8_1Tensor
from ..utils import round_up
from .gemm_pallas import PreparedWeight, _interpret_default


def _int_dot(qa: jax.Array, qw: jax.Array) -> jax.Array:
    """Exact int32 [TM, TN] = qa[TM, 32] @ qw[32, TN] on the MXU."""
    return jax.lax.dot_general(
        qa.astype(jnp.int8),
        qw.astype(jnp.int8),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _kernel(
    packed_ref,  # uint8 [TKP, TN]
    d_lo_ref,  # f32 [TKB, TN]
    d_hi_ref,
    qa_lo_ref,  # int8 [TM, TKP]
    qa_hi_ref,
    da_lo_ref,  # f32 [TKB, TM] (transposed act scales)
    da_hi_ref,
    sa_lo_ref,  # f32 [TKB, TM]
    sa_hi_ref,
    out_ref,  # f32 [TM, TN]
    *,
    tkb: int,
    offset: int,
):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    packed = packed_ref[:].astype(jnp.int32)

    def plane(nib_i32, qa_ref, d_ref, da_ref, sa_ref):
        acc = jnp.zeros_like(out_ref)
        qw = nib_i32  # [TKP, TN] codes 0..15
        for b in range(tkb):
            sl = slice(b * QK, (b + 1) * QK)
            sumi = _int_dot(qa_ref[:, sl], qw[sl, :]).astype(jnp.float32)
            d_w = d_ref[b, :][None, :]  # [1, TN]
            d_a = da_ref[b, :][:, None]  # [TM, 1]
            s_a = sa_ref[b, :][:, None]
            acc += d_w * (d_a * sumi - float(offset) * s_a)
        return acc

    out_ref[:] += plane(packed & 0x0F, qa_lo_ref, d_lo_ref, da_lo_ref, sa_lo_ref)
    out_ref[:] += plane(packed >> 4, qa_hi_ref, d_hi_ref, da_hi_ref, sa_hi_ref)


def _kernel_w8(
    qs_ref, d_ref, qa_ref, da_ref, sa_ref, out_ref, *, tkb: int, offset: int
):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc = jnp.zeros_like(out_ref)
    for b in range(tkb):
        sl = slice(b * QK, (b + 1) * QK)
        sumi = _int_dot(qa_ref[:, sl], qs_ref[sl, :]).astype(jnp.float32)
        d_w = d_ref[b, :][None, :]
        d_a = da_ref[b, :][:, None]
        acc += d_w * d_a * sumi
    out_ref[:] += acc


def gemm_exact(
    w: PreparedWeight,
    a_q: Q8_1Tensor,
    *,
    tn: int | None = None,
    tkp: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Reference-semantics W4A8 (q4_0) / W8A8 (q8_0) integer GEMM.

    ``C[M, N] = sum_blocks d_w * (d_a * sumi - offset * s_a)`` with exact
    int32 sumi and the f16-stored (f32-upcast) d/s values — matching the
    numpy golden ``ref.gemm.gemm_wxa8`` to f32 accumulation order.

    This is also the fastest *decode* (M <= ~12) serving kernel: raw int4/8
    codes go straight from HBM to int8 MXU dots with no per-element dequant
    arithmetic, so it runs at the weight-streaming DMA floor (measured 9.9
    TFLOPS on 4096x4x14336 vs 6.7 for the dequant kernel — docs/PERF_NOTES.md).
    Wide-N tiles maximize the DMA transfer size per grid step.
    """
    assert w.qtype in ("q4_0", "q8_0"), w.qtype
    if interpret is None:
        interpret = _interpret_default()
    m, k = a_q.qs.shape
    assert k == w.k
    if tn is None:
        tn = 4096
    is4 = w.qtype == "q4_0"
    kdim = k // 2 if is4 else k
    tkp = min(tkp, kdim)
    while kdim % tkp:
        tkp //= 2
    tkb = tkp // QK
    nkt = kdim // tkp
    nb = k // QK

    tm = round_up(m, 8)
    tn = min(tn, round_up(w.n, 128))
    np_ = round_up(w.n, tn)

    def padm(x):
        pr = tm - x.shape[0]
        return jnp.pad(x, ((0, pr), (0, 0))) if pr else x

    def padn(x):
        pc = np_ - x.shape[1]
        return jnp.pad(x, ((0, 0), (0, pc))) if pc else x

    qa = padm(a_q.qs)
    da_t = padm(a_q.d).T.astype(jnp.float32)  # [nb, TM]
    sa_t = padm(a_q.s).T.astype(jnp.float32)

    grid = (np_ // tn, nkt)

    def wspec(bs, off=0):
        return pl.BlockSpec(
            bs, lambda nt, kt, o=off: (kt + o, nt), memory_space=pltpu.VMEM
        )

    def aspec(bs, off=0):
        return pl.BlockSpec(
            bs, lambda nt, kt, o=off: (0, kt + o), memory_space=pltpu.VMEM
        )

    def avspec(bs, off=0):  # activation scale vectors [nb, TM]
        return pl.BlockSpec(
            bs, lambda nt, kt, o=off: (kt + o, 0), memory_space=pltpu.VMEM
        )

    if is4:
        operands = [
            padn(w.packed_t),
            padn(w.d_t),
            padn(w.d_t),
            qa,
            qa,
            da_t,
            da_t,
            sa_t,
            sa_t,
        ]
        in_specs = [
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off=nkt),
            aspec((tm, tkp)),
            aspec((tm, tkp), off=nkt),
            avspec((tkb, tm)),
            avspec((tkb, tm), off=nkt),
            avspec((tkb, tm)),
            avspec((tkb, tm), off=nkt),
        ]
        kernel = functools.partial(_kernel, tkb=tkb, offset=8)
    else:
        operands = [padn(w.qs_t), padn(w.d_t), qa, da_t, sa_t]
        in_specs = [
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            aspec((tm, tkp)),
            avspec((tkb, tm)),
            avspec((tkb, tm)),
        ]
        kernel = functools.partial(_kernel_w8, tkb=tkb, offset=0)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tm, tn), lambda nt, kt: (0, nt), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((tm, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return out[:m, : w.n]


__all__ = ["gemm_exact"]
