"""Exact-integer WxA8 Pallas kernel — bit-parity with the reference, and the
serving DECODE kernel (fastest at M <= ~12).

Reproduces the reference's integer dataflow (gemm_reference.h:175-267,
gemm_quant_formats.cuh vec_dot_{q4_0,q4_1,q5_0,q5_1,q8_0}_q8_1) on the MXU:
per 32-block **exact int32 dot products** of raw codes, then the per-block
f32 epilogue

* q4_0:       ``d_w * (d_a * sumi - 8 * s_a)``
* q5_0:       ``d_w * (d_a * sumi - 16 * s_a)``
* q4_1/q5_1:  ``d_w * d_a * sumi + m_w * s_a``  (the min term is factored
  out of the block loop into ONE ``s_a @ m_w`` dot per tile — exact, since
  it is linear across blocks)
* q8_0:       ``d_w * d_a * sumi``

accumulated across blocks in f32.  The dp4a lane parallelism of the CUDA
version becomes an int8 ``dot_general`` with contraction width 32 per block.
Despite the narrow contraction this is the FASTEST decode kernel: raw codes
go straight from HBM to the MXU with ~2.5 VPU ops per weight element vs ~6
for dequant-then-matmul (9.9 vs 6.7 TFLOPS at 4096x4x14336 —
docs/PERF_NOTES.md), and it is bit-exact against the integer golden.

Layout notes: weights use the same K-major planar PreparedWeight; activation
scale/sum vectors are passed transposed ([nb, M]) so per-block rows can be
sliced on sublanes.  The K grid walks packed-byte tiles; each grid step
processes the tile's lo-nibble blocks and hi-nibble blocks with their
matching activation blocks.  5-bit formats expand their planar ``qh`` bit
planes to int lanes in-kernel (codes 0..31 still fit int8).

x8 decode (4-bit formats): ``prepare()`` stores packed bytes XOR 0x80 as
int8, so both nibble planes reach the MXU with one native-i8 mask each —
no u8->i32 widen / vector shift / i32->i8 narrow (the VPU unpack chain
that capped decode at ~74% of the DMA roofline, docs/PERF_NOTES.md):

* ``p & 0x0F``  == raw low codes 0..15 (xor only touches bit 7);
* ``p & -16``   == ``16*hi - 128`` exactly (two's-complement bias), so the
  hi-plane dot returns ``16*sumi - 128*sumq_a`` and the true ``sumi`` is
  recovered with an exact int32 fixup ``(raw + 128*sumq_a) >> 4`` from the
  per-block activation CODE sums (``s_a`` cannot substitute — it is the
  f16-rounded ``d*sumq``).

q5 x8 (5-bit formats): the nibble planes stay on the same native-i8 mask
path, and the 5th bits ride a SEPARATE int8 MXU dot combined exactly at
int32 on the stacked per-block results: ``sumi = nib_dot + 16*h_dot``
(x16 again on the 16x-scaled hi plane).  Three h decodes, raced on-chip
(scripts/lab_q5.py, 4096x4x14336 medians): ``qh_mode="qh2"`` (default)
reads the prepare()-built nibble-packed h plane with one i8 mask per
plane — zero i32 work, +K/2 bytes/col stream, 134 -> ~81 us; ``"hdot"``
expands the bit-packed qh plane in-kernel (i32 repeat+shift, ~108 us);
``"i32"`` is the legacy whole-plane i32 widen (~134 us), kept for A/Bs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.blocks import QK, Q8_1Tensor
from ..utils import F16_MAX, round_up
from .gemm_pallas import (
    PreparedWeight,
    _interpret_default,
    pad_activation_k,
    pad_scales_k,
    scale_f32,
)


def _f16_round(x: jax.Array) -> jax.Array:
    """f32 -> nearest-f16 (ties-to-even) -> f32, in Mosaic-legal bit math.

    Mosaic has no f16 compute, but the Q8_1 contract stores d/s as IEEE
    f16 (compat/ggml_types.h:186-191); the fused kernel must reproduce that
    rounding IN-kernel to stay bit-identical to ``jax_quant.quantize_q8_1``.
    Normal f16 range uses the classic add-half-ulp-and-mask on the f32
    bits (carry into the exponent rounds up binades correctly); subnormal
    f16 (|x| < 2^-14) rounds to the 2^-24 quantum with an exact rint
    (x * 2^24 < 1024 is exact in f32).  Inputs must be finite and pre-
    clipped to +-F16_MAX (no inf/nan), which quantize_q8_1 guarantees.
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    sign = bits & jnp.int32(-0x80000000)
    absbits = bits & 0x7FFFFFFF
    lsb = (absbits >> 13) & 1
    rounded = (absbits + 0x0FFF + lsb) & ~0x1FFF
    normal = jax.lax.bitcast_convert_type(rounded | sign, jnp.float32)
    sub = jnp.rint(x * 16777216.0) * 5.9604644775390625e-08  # 2^24, 2^-24
    return jnp.where(jnp.abs(x) < 6.103515625e-05, sub, normal)


def _quant_block_q8_1(blk: jax.Array):
    """In-kernel Q8_1 quantization of one [TM, 32] f32 block.

    Bit-identical to ``jax_quant.quantize_q8_1`` (which the tests pin to
    the numpy reference): d = f16(amax/127), q = clip(rint(x/d), -127, 127),
    s = f16(d * sum(q)).  Returns (q int8, d f32[TM,1], s f32[TM,1],
    sumq int32[TM,1]) with d/s already carrying their f16 rounding.
    """
    amax = jnp.max(jnp.abs(blk), axis=1, keepdims=True)  # [TM, 1]
    d = _f16_round(jnp.clip(amax / 127.0, None, F16_MAX))
    inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    q = jnp.clip(jnp.rint(blk * inv), -127, 127).astype(jnp.int8)
    sumq = jnp.sum(q.astype(jnp.int32), axis=1, keepdims=True)
    s = _f16_round(jnp.clip(sumq.astype(jnp.float32) * d, -F16_MAX, F16_MAX))
    return q, d, s, sumq


def _int_dot(qa: jax.Array, qw: jax.Array) -> jax.Array:
    """Exact int32 [TM, TN] = qa[TM, 32] @ qw[32, TN] on the MXU."""
    return jax.lax.dot_general(
        qa.astype(jnp.int8),
        qw.astype(jnp.int8),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _f32_dot_bt(a_bt: jax.Array, b_bt: jax.Array) -> jax.Array:
    """[TM, TN] = sum_b a[b, m] * b[b, n] — exact f32 contraction."""
    return jax.lax.dot_general(
        a_bt, b_bt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _block_dots_diag(qa: jax.Array, qw: jax.Array, nblk: int, tm: int,
                     blk: int = QK, stacked: bool = False,
                     span: int = 1) -> list[jax.Array]:
    """Per-block int dots, ``128 // blk`` blocks per MXU dispatch.

    A K=32 (or K=16, K-quants) ``dot_general`` under-fills the MXU's
    128-deep contraction; laying 4 (8) adjacent blocks' activation codes
    block-diagonally into [g*TM, 128] makes one K=128 dot return the
    per-block ``sumi`` stacked on the M axis (rows j*TM..(j+1)*TM =
    block j) — exact int32, 4-8x fewer/deeper MXU dispatches.  Measured
    on-chip: 51.5 -> ~48.5 us at 4096x4x14336 q4_0 decode
    (scripts/lab_decode2.py round 3); the int8 masking on [g, TM, 128]
    is noise.  Requires ``nblk * blk`` divisible by 128 (prepare()/
    prepare_k16 pad K-planes to 256+ rows, so it always is).

    With ``stacked=True`` the per-dispatch [g*TM, TN] results are returned
    UNsliced (one per K128 group, block j in rows j*TM..(j+1)*TM): at
    decode M <= 4 the caller scales them densely instead of paying 8-row
    VPU tiles per block that are half m-padding (see ``_kernel``).

    ``span`` stacks that many 128-deep groups into ONE deeper dispatch
    ([g*span*TM, 128*span] block-diagonal, contraction folded by the MXU
    as span chained passes): same MAC count, 1/span the dispatch fill
    latencies.  Requires ``nblk`` divisible by ``(128 // blk) * span``.
    """
    g = 128 // blk
    gs, d128 = g * span, 128 * span
    dots = []
    for t in range(nblk // gs):
        qa_t = qa[:, t * d128:(t + 1) * d128]  # [TM, 128*span] = gs blocks
        rep = jnp.broadcast_to(qa_t[None], (gs, tm, d128))
        col_g = jax.lax.broadcasted_iota(jnp.int32, (gs, tm, d128), 2) // blk
        row_g = jax.lax.broadcasted_iota(jnp.int32, (gs, tm, d128), 0)
        diag = jnp.where(col_g == row_g, rep, jnp.int8(0)).reshape(
            gs * tm, d128)
        res = _int_dot(diag, qw[t * d128:(t + 1) * d128, :])  # [gs*TM, TN]
        if stacked:
            dots.append(res)
        else:
            dots.extend(res[j * tm:(j + 1) * tm, :] for j in range(gs))
    return dots


def build_diag4(qa: jax.Array, span: int = 1) -> jax.Array:
    """Precompute the stacked block-diagonal activation operand in XLA.

    ``qa`` [M<=4, Kpad] int8 codes -> [4 * nblocks, 128 * span] int8 where
    dispatch t's rows t*4*gs..(t+1)*4*gs hold its block-diagonal lhs
    (row-within-dispatch j*4+i = block j, token i).  Under 1 MB even at
    K=14336, XLA fuses the layout into the quantize pass — the kernel's
    hot loop then slices + dots with NO in-kernel broadcast/iota/select
    (the ``prediag`` decode variant).
    """
    m, kpad = qa.shape
    assert m <= 4
    if m < 4:
        qa = jnp.pad(qa, ((0, 4 - m), (0, 0)))
    d128 = 128 * span
    nd = kpad // d128  # dispatches
    gs = d128 // QK
    # [nd, 4, d128] -> broadcast to [nd, gs, 4, d128] -> mask block-diagonal
    qa_t = qa.T.reshape(nd, d128, 4).transpose(0, 2, 1)  # [nd, 4, d128]
    rep = jnp.broadcast_to(qa_t[:, None], (nd, gs, 4, d128))
    col_g = jax.lax.broadcasted_iota(jnp.int32, (nd, gs, 4, d128), 3) // QK
    row_g = jax.lax.broadcasted_iota(jnp.int32, (nd, gs, 4, d128), 1)
    diag = jnp.where(col_g == row_g, rep, jnp.int8(0))
    return diag.reshape(nd * gs * 4, d128)


def _stacked_da(sl: jax.Array, rows: int) -> jax.Array:
    """[gs, rows] per-block activation scales -> stacked [rows*gs, 1]
    (row j*rows+i = block j, token i) via repeat+mask — Mosaic has no
    [gs, r] -> [r*gs, 1] shape cast.  Exact (select/sum-with-zeros)."""
    gs = sl.shape[0]
    rep = jnp.repeat(sl, rows, axis=0)  # [rows*gs, rows] row j*rows+i = blk j
    shape = (rows * gs, rows)
    tok = jax.lax.broadcasted_iota(jnp.int32, shape, 0) % rows
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return jnp.sum(jnp.where(col == tok, rep, 0.0), axis=1, keepdims=True)


def _scaled_block_sums(qa, qw, tkb, d, da, acc, v_of=None, span=1, qd=None,
                       qw2=None, mult2=0, rows=4, c_of=None):
    """``acc += sum_b d[b, :] * (da[b, :] * sumi_b)`` over a plane's blocks.

    The shared post-hoist epilogue of the exact kernels (compensation/min
    terms are handled by the callers' per-tile MXU dots).  ``v_of`` enables
    the decode M <= 8 stacked fast path (``rows`` = the stacked row count,
    4 for M <= 4, 8 for 4 < M <= 8): per-block [8, TN] VPU tiles would be
    half m-padding at M <= 4 and one dispatch per block at M <= 8, so the
    K128-group diag dots stay STACKED [rows*gs, TN] (gs = 4*span blocks x
    ``rows`` m-rows) and are scaled densely — ~40% fewer VPU row-ops at
    the headline decode shape, and 8-row-aligned direct folds at M = 8
    (the serving batch — no deferred cross-m fold needed).  ``v_of(t)``
    must return dispatch t's stacked activation scales [rows*gs, 1] (row
    j*rows+i = block j, token i) — built OUTSIDE this helper because
    Mosaic has no [gs,r]->[r*gs,1] shape cast (see :func:`_stacked_da`):
    the unfused kernel repeats+masks rows of its resident da plane, the
    fused kernel sublane-concats its in-kernel quant columns.  ``qd``
    (rows=4 only) is a PREDIAGONALIZED lhs slice
    [4*tkb, 128*span] built by :func:`build_diag4` — the hot loop is then
    slice + dot with no in-kernel broadcast/iota/select.  The cross-m fold
    it defers (acc rows 4..7 hold the other half of the block partial
    sums) happens ONCE at the last grid step (``_fold_stack4``).

    ``qw2``/``mult2`` add a SECOND weight plane whose per-block dots are
    combined into the primary plane's at int32 (``res + mult2 * res2``,
    exact) before the f32 epilogue — the q5 5th-bit plane: sumi =
    nib_dot + 16*h_dot (x16 again on the 16x-scaled hi plane).  The i32
    combine touches only the [4gs, TN]-per-dispatch dot results (~1/32 of
    the element count), so the h plane rides the same epilogue for free.

    ``c_of(t)`` (stacked path only) returns dispatch t's stacked per-block
    compensation terms [rows*gs, 1] (same row layout as ``v_of``): the
    epilogue becomes ``s = d * (da * sumi + c)`` — the GOLDEN's own
    per-block parenthesization (ref gemm_reference.h:175-222's
    ``d_w * (d_a * sumi - 8 * s_a)``) — replacing the per-grid-step f32
    MXU compensation dot entirely (the ~4 us/kernel the round-5 ablation
    attributed to the hoisted dots; lab_ablate / QGT_FUSECOMP A/B).
    """
    def _plane_dots(w):
        if v_of is not None:
            gs = 4 * span
            if qd is not None:
                return [
                    _int_dot(qd[t * 4 * gs:(t + 1) * 4 * gs, :],
                             w[t * 128 * span:(t + 1) * 128 * span, :])
                    for t in range(tkb // gs)
                ]
            return _block_dots_diag(qa[:rows, :], w, tkb, rows, stacked=True,
                                    span=span)
        return _block_dots_diag(qa, w, tkb, acc.shape[0], span=span)

    dots = _plane_dots(qw)
    if qw2 is not None:
        dots = [a + mult2 * b for a, b in zip(dots, _plane_dots(qw2))]
    if v_of is not None:
        gs = 4 * span
        for t, res in enumerate(dots):
            dd = jnp.repeat(d[t * gs:(t + 1) * gs, :], rows, axis=0)
            inner = v_of(t) * res.astype(jnp.float32)
            if c_of is not None:
                inner = inner + c_of(t)
            s = dd * inner  # [rows*gs, TN]
            tot = s[0:8, :]
            for h in range(1, rows * gs // 8):
                tot = tot + s[h * 8:(h + 1) * 8, :]
            acc += tot
        return acc
    for b, res in enumerate(dots):
        acc += d[b, :][None, :] * (
            da[b, :][:, None] * res.astype(jnp.float32))
    return acc


def _fold_stack4(out_ref, kt, last_kt):
    """Final cross-m fold of the stack4 epilogue: rows 4..7 carry the
    second half of the block partial sums (the hoisted-term dots put zeros
    there — their m columns are zero-padded), so one add at the last grid
    step completes rows 0..3.  Rows 4..7 end up holding the same sums
    (a+b == b+a bit-exactly); the caller slices them away with out[:m]."""

    @pl.when(kt == last_kt)
    def _fold():
        o = out_ref[:]
        out_ref[:] = o + jnp.concatenate([o[4:8, :], o[0:4, :]], axis=0)


def _merged_epilogue(pieces):
    """Contract ALL hoisted block-linear epilogue terms of a grid step in
    ONE exact f32 dot; returns the [TM, TN] result (None if no pieces).

    Each piece is ``(lhs [tkb, TM], rhs [tkb, TN])`` — a compensation term
    (``coeff @ d``) or a min term (``s_a @ m``) of one nibble plane.  The
    round-5 ablation (scripts/lab_ablate.py, tpu_campaign.log) attributed
    ~4 µs/kernel of the headline decode's kernel-over-probe residual to
    these dots: f32 HIGHEST runs as a 6-pass bf16 decomposition on the
    MXU, so per-DOT cost dominates per-MAC cost at tkb-deep contractions
    — stacking the pieces row-wise halves (q4_0) or thirds (q4_1/q5_1)
    the 6-pass dispatches for the price of two VMEM concats.  Exact: f32
    dot accumulation order changes, which the goldens tolerate (<1e-12
    NMSE) and the fused/megalayer twins mirror operation-for-operation.
    """
    if not pieces:
        return None
    if len(pieces) == 1:
        return _f32_dot_bt(*pieces[0])
    lhs = jnp.concatenate([l for l, _ in pieces], axis=0)
    rhs = jnp.concatenate([r for _, r in pieces], axis=0)
    return _f32_dot_bt(lhs, rhs)


def _expand_bits_int(qh_tile: jax.Array) -> jax.Array:
    """Planar 5th bits uint8[TKP/8, TN] -> int32[TKP, TN] (0/1 per row).

    Row r takes bit ``r % 8`` of input row ``r // 8``: a sublane ``repeat``
    (cheap) then an elementwise variable shift.  A stack-8-planes+reshape
    formulation measured 5x slower (347 vs ~66 us on the q5_0 decode shape)
    — the sublane interleave relayout dominates.
    """
    tkb8, tn = qh_tile.shape
    rep = jnp.repeat(qh_tile.astype(jnp.int32), 8, axis=0)  # [TKP, TN]
    amt = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 0) % 8
    return (rep >> amt) & 1


def _kernel(*refs, tkb: int, tkp: int, nkt: int, offset: int,
            has_min: bool, has_qh: bool, stack_rows: int = 0,
            span: int = 1, prediag: bool = False, qh_mode: str = "qh2",
            submask: bool = False, bundled: bool = False,
            fusecomp: bool = False):
    """4/5-bit weights.  Ref order:

    packed, d_lo, d_hi, [m_lo, m_hi,] [qh_lo, qh_hi,] qa, da, sa, [sq,]
    [qd,] out            (bundled: ... qa, scl, [qd,] out)

    Weight planes arrive as per-grid-step tiles; the small activation-side
    operands (qa int8 codes, d_a/s_a per-block vectors, sq int32 per-block
    code sums for the x8 hi-plane fixup) arrive as FULL VMEM-resident
    arrays with constant index maps — fetched once and deduped by the
    pipeline instead of 6 tiny DMAs per grid step (the tiny fetches cost
    ~2x the whole-kernel DMA floor on vocab-sized N).  The kernel slices
    them at the K offset of the current grid step.

    ``bundled`` (decode M <= 4): the three per-block vectors arrive as ONE
    plane-major f32 array ``scl`` [3 * nb_p, 8] (rows 0:nb_p = d_a, nb_p:
    2nb_p = s_a, 2nb_p: = sumq as exact f32) built by a single XLA fusion
    — the round-5 glue adjudication (scripts/lab_ablate.py) attributed
    several us/call of the dispatch path to the separate pad/transpose/
    reduce ops feeding the kernel, and sublane row slices of one resident
    operand replace three 128-lane-padded operands at the same total VMEM.
    """
    it = iter(refs)
    packed_ref = next(it)
    dlo_ref, dhi_ref = next(it), next(it)
    mlo_ref, mhi_ref = (next(it), next(it)) if has_min else (None, None)
    qhlo_ref = qhhi_ref = qh2_ref = None
    if has_qh and qh_mode == "qh2":
        qh2_ref = next(it)  # nibble-packed h plane, one tile serves both
    elif has_qh:
        qhlo_ref, qhhi_ref = next(it), next(it)
    qa_ref = next(it)  # [TM or 4, 2*kdim] int8 (full)
    legacy_qh = has_qh and qh_mode == "i32"
    if bundled:
        scl_ref = next(it)  # [3 * nb_p, 8] f32 (full): d_a / s_a / sumq
        nb_p = scl_ref.shape[0] // 3
        da_ref = sa_ref = sq_ref = None
    else:
        scl_ref = None
        da_ref = next(it)  # [nb_p, TM] f32 (full)
        sa_ref = next(it)
        sq_ref = None if legacy_qh else next(it)  # [nb_p, TM] i32 (full)
    # [4*nb_p, 128*span], stack4 (rows=4) only
    qd_ref = next(it) if (stack_rows == 4 and prediag) else None
    out_ref = refs[-1]

    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    if legacy_qh:
        # legacy q5 path (qh_mode="i32", kept for the on-chip A/B): the
        # 16*qh add is done at i32 on the full plane — undo the x8 store
        # with one mask+xor (sign-extended i8 -> original byte)
        packed = (packed_ref[:].astype(jnp.int32) & 0xFF) ^ 0x80
        lo, hi = packed & 0x0F, packed >> 4
        hi_fix = False
    else:
        # x8 fast path: native-i8 masks only (see module docstring).  q5
        # formats stay on it too (qh_mode="hdot"): the 5th-bit plane rides
        # a SEPARATE i8 MXU dot combined exactly at i32 in the epilogue
        # (sumi = nib_dot + 16*h_dot), so the packed plane never widens.
        p = packed_ref[:]
        hi = p & jnp.int8(-16)
        # submask: skip the second [TKP, TN] VPU mask — the lo plane dots
        # the UNMASKED packed tile and subtracts the hi-mask dots at int32
        # (exact: p as int8 == lo + (p & -16), so dot(p) - dot(hi) ==
        # dot(lo) element-for-element).  Costs one extra stacked dot set
        # per step; q5 formats keep both masks (their qw2 slot carries the
        # 5th-bit plane).
        do_sub = submask and not has_qh
        lo = p if do_sub else p & jnp.int8(0x0F)
        hi_fix = True

    def plane(qw, d_ref, m_ref, qh_ref, koff, fixup):
        qw2, mult2 = None, 0
        if not legacy_qh and not has_qh and not fixup and submask:
            qw2, mult2 = hi, -1
        if has_qh and legacy_qh:
            qw = qw + 16 * _expand_bits_int(qh_ref[:])  # codes 0..31
        elif has_qh and qh2_ref is not None:
            # mask-only h decode off the nibble-packed qh2 plane: lo rows
            # carry h at bit 0 (& 0x0F -> h, dot = h_sum, x16), hi rows at
            # bit 4 (& -16 -> 16*h, dot = 16*h_sum, x16 = the 256*h_sum
            # the 16x-scaled hi plane needs) — zero i32 decode work
            p2 = qh2_ref[:]
            qw2 = (p2 & jnp.int8(-16)) if fixup else (p2 & jnp.int8(0x0F))
            mult2 = 16
        elif has_qh:
            # h in {0,1} as native i8; its dot adds 16*h_dot to the 1x lo
            # plane and 256*h_dot to the 16x-scaled hi plane — both exact
            # at i32 (|h_dot| <= 32*127 per block)
            qw2 = _expand_bits_int(qh_ref[:]).astype(jnp.int8)
            mult2 = 256 if fixup else 16
        qa = qa_ref[:, pl.ds(koff * tkp, tkp)]  # [TM or 4, tkp]
        if bundled:
            da = scl_ref[pl.ds(koff * tkb, tkb), :]  # [tkb, 8]
            sa = scl_ref[pl.ds(nb_p + koff * tkb, tkb), :]
        else:
            da = da_ref[pl.ds(koff * tkb, tkb), :]  # [tkb, TM]
            sa = sa_ref[pl.ds(koff * tkb, tkb), :]
        d = scale_f32(d_ref[:])  # [tkb, tn]
        if fixup:
            # "noshift": keep the x8 hi-plane dot at 16x and rescale the
            # epilogue instead — fl((d/16)*(16*t)) == fl(d*t) EXACTLY
            # (power-of-two scalings are exact in f32, no over/underflow
            # at these magnitudes), so this is bit-identical to the
            # >>4-per-block form while dropping one i32 [TM, TN] op per
            # block (51.5 -> ~48 us with diag4, lab_decode2 round 3).
            d = d * 0.0625
        # The compensation terms are LINEAR across blocks (the same
        # identity the q4_1/q5_1 min term already exploits), so they hoist
        # out of the per-block loop into ONE small f32 MXU dot per tile:
        #   sum_b d[b,n] * (-offset * sa[b,m])               (lo/q5 planes)
        #   sum_b d'[b,n] * (128*da*sq - 16*offset*sa)[b,m]  (x8 hi plane,
        #     folding the per-element "raw + 128*sumq_a" fixup add as well)
        # dropping 1-2 VPU [TM, TN] ops per block from the hot loop — the
        # epilogue is the kernel's non-overlapped compute at the DMA-bound
        # decode shapes (round-4 layout lab: the pure DMA probe streams the
        # same bytes in 43.5 us vs the kernel's 49.4 us median).
        coeff = None
        if fixup and (bundled or sq_ref is not None):
            # 128 * da * sumq_a: exact — |sumq_a| <= 32*127 fits f32
            sq = (scl_ref[pl.ds(2 * nb_p + koff * tkb, tkb), :] if bundled
                  else sq_ref[pl.ds(koff * tkb, tkb), :])
            coeff = 128.0 * (da * sq.astype(jnp.float32))
        if offset:
            t = float(offset * (16 if fixup else 1)) * sa
            coeff = -t if coeff is None else coeff - t
        acc = jnp.zeros_like(out_ref)
        v_of = None
        qd = None
        c_of = None
        if stack_rows:
            gs = 4 * span

            def v_of(t, koff=koff):  # noqa: E306 — stacked scales
                # [rows*gs, 1], row j*rows+i = da[block, token i], built
                # from the resident da plane (a dedicated [rows*nb, 1]
                # operand padded to 918 KB of 128-lane VMEM rows and
                # OOM'd q5_1's operand set)
                src = scl_ref if bundled else da_ref
                sl = src[pl.ds(koff * tkb + t * gs, gs), 0:stack_rows]
                return _stacked_da(sl, stack_rows)
            if fusecomp and coeff is not None and not has_min:
                # fold the per-block compensation into the stacked dense
                # epilogue (s = d * (da*sumi + c) — the golden's own
                # parenthesization) instead of a per-grid-step f32 MXU
                # dot; see _scaled_block_sums
                cf = coeff
                coeff = None

                def c_of(t):  # noqa: E306 — stacked compensation terms
                    return _stacked_da(
                        cf[t * gs:(t + 1) * gs, 0:stack_rows], stack_rows)
            if prediag and stack_rows == 4:
                qd = qd_ref[pl.ds(koff * tkb * 4, tkb * 4), :]
        acc = _scaled_block_sums(qa, qw, tkb, d, da, acc, v_of,
                                 span=span, qd=qd, qw2=qw2, mult2=mult2,
                                 rows=stack_rows or 4, c_of=c_of)
        # hoisted block-linear terms (compensation + min) are returned as
        # (lhs [tkb, TM], rhs [tkb, TN]) pieces and contracted in ONE
        # merged f32 dot per grid step below — see _merged_epilogue_dot
        pieces = []
        if coeff is not None:
            pieces.append((coeff, d))
        if has_min:
            pieces.append((sa, scale_f32(m_ref[:])))
        return acc, pieces

    a_lo, p_lo = plane(lo, dlo_ref, mlo_ref, qhlo_ref, kt, False)
    a_hi, p_hi = plane(hi, dhi_ref, mhi_ref, qhhi_ref, kt + nkt, hi_fix)
    out_ref[:] += a_lo
    out_ref[:] += a_hi
    merged = _merged_epilogue(p_lo + p_hi)
    if merged is not None:
        out_ref[:] += merged
    if stack_rows == 4:  # rows=8 folds are 8-row-aligned, no deferred fold
        _fold_stack4(out_ref, kt, nkt - 1)


def _kernel_w8(
    qs_ref, d_ref, qa_ref, da_ref, sa_ref, out_ref, *,
    tkb: int, tkp: int, offset: int
):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    qa = qa_ref[:, pl.ds(kt * tkp, tkp)]
    da = da_ref[pl.ds(kt * tkb, tkb), :]
    d = scale_f32(d_ref[:])
    acc = jnp.zeros_like(out_ref)
    for b in range(tkb):
        sl = slice(b * QK, (b + 1) * QK)
        sumi = _int_dot(qa[:, sl], qs_ref[sl, :]).astype(jnp.float32)
        d_w = d[b, :][None, :]
        d_a = da[b, :][:, None]
        acc += d_w * d_a * sumi
    out_ref[:] += acc


def gemm_exact(
    w: PreparedWeight,
    a_q: Q8_1Tensor,
    *,
    tn: int | None = None,
    tkp: int | None = None,
    span: int = 1,
    prediag: bool = False,
    qh_mode: str = "qh2",
    submask: bool | None = None,
    bundle: bool | None = None,
    fusecomp: bool | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Reference-semantics WxA8 integer GEMM, all five weight formats.

    ``C[M, N] = sum_blocks <per-format epilogue>`` with exact int32 sumi and
    the f16-stored (f32-upcast) d/m/s values — matching the numpy golden
    ``ref.gemm.gemm_wxa8`` to f32 accumulation order.

    This is also the fastest *decode* (M <= ~12) serving kernel: raw int
    codes go straight from HBM to int8 MXU dots with no per-element dequant
    arithmetic, so it runs near the weight-streaming DMA floor.  Default
    tn=2048 (measured best across serving shapes — see below).
    """
    if interpret is None:
        interpret = _interpret_default()
    assert qh_mode in ("qh2", "hdot", "i32"), f"bad qh_mode {qh_mode!r}"
    if submask is None or bundle is None:
        # A/B knobs for the on-chip races (bit-identical either way;
        # submask trades the lo-plane mask for one extra stacked dot set,
        # bundle trades 4-6 prep ops for one fused scales operand)
        import os

        if submask is None:
            submask = os.environ.get("QGT_SUBMASK", "0") == "1"
        if bundle is None:
            bundle = os.environ.get("QGT_BUNDLE", "0") == "1"
    if fusecomp is None:
        # DEFAULT ON (r5 on-chip race, 4096x4x14336 q4_0, interleaved
        # medians: fusecomp 49.3/49.9 us = 90-91% of the 819 spec vs the
        # merged-dot path 51.3/51.4 = 88%; fusecomp+submask 50.5 — the
        # spare dot set costs more once the epilogue dots are gone, so
        # submask stays off).  has_min formats fall back automatically.
        import os

        fusecomp = os.environ.get("QGT_FUSECOMP", "1") == "1"
    m, k = a_q.qs.shape
    assert k == w.k
    is4 = w.packed_t is not None
    np_stored = (w.packed_t if is4 else w.qs_t).shape[1]
    # padded packed column space (prepare() zero-pads K to 256-row packs)
    kdim = w.packed_t.shape[0] if is4 else w.qs_t.shape[0]
    # Short-K weights (K <= 2048 4-bit, the per-layer serving GEMMs) go
    # K-RESIDENT: the whole packed K in one grid step, pipeline streaming
    # N tiles — measured fastest at 5-rep medians on every short-K serving
    # shape except vocab-sized N (r4 lab_serveshapes: wqkv tn1024/tkp1024
    # 13.5 vs full-N 15.2 us; wo 5.2 vs 6.9; wgu tn2048/tkp1024 29.4;
    # lm_head keeps tkp512 — 55.5 vs 57.4 K-resident)
    short_k = kdim <= 1024 and np_stored <= 16384
    if tkp is None:
        # vocab-sized N at decode: halve the K grid (r5 lab_serve8 medians,
        # lm_head 32000x8x2048: tkp1024 56.6 vs tkp512 58.6 us).  q5
        # formats keep tkp512 — their qh2 plane doubles the tile bytes
        # and a 1024-row tile pair would brush the scoped-VMEM limit.
        tkp = kdim if short_k else (
            1024 if np_stored > 16384 and m <= 8 and w.qh_t is None else 512)
    if tn is None:
        if short_k:
            tn = 1024 if np_stored <= 2048 else 2048
        else:
            # long-K: larger tiles win (r3 lab); cap at 8192 (q4 packed
            # tile 512x8192 = 4 MB x2 buffers; q4_1/q5_x extra planes fit)
            tn = np_stored if np_stored <= 8192 else 4096
        if w.qh_t is not None and w.m_t is not None:
            # q5_1 carries BOTH qh and min planes on top of packed+d:
            # tn=4096 blew the 16 MB scoped-VMEM budget at K=14336 under
            # the old in-kernel i32 widen (bench_suite r4 OOM).  The
            # default qh2 mode no longer widens, but the qh2 plane is as
            # large as packed itself, so the budget stays tight — keep
            # the 2048 cap (re-raced post-qh2: see scripts/lab_q5.py)
            tn = min(tn, 2048)
    tkp = min(tkp, kdim)
    while kdim % tkp:
        tkp //= 2
    tkb = tkp // QK
    nkt = kdim // tkp

    tm = round_up(m, 8)
    # N was padded to a 256 multiple at prepare(); pick a dividing tile
    np_ = (w.packed_t if is4 else w.qs_t).shape[1]
    # largest 128-multiple divisor of the stored extent that is <= tn
    # (halving would miss e.g. np_=32000 -> tn=1280, settling for 256)
    tn = min(tn, np_)
    tn -= tn % 128
    while np_ % tn:
        tn -= 128

    def padm(x, rows=tm):
        import jax.numpy as _jnp

        x = _jnp.asarray(x)
        pr = rows - x.shape[0]
        return _jnp.pad(x, ((0, pr), (0, 0))) if pr else x

    has_qh = w.qh_t is not None
    if qh_mode == "qh2" and getattr(w, "qh2_t", None) is None:
        qh_mode = "hdot"  # qh2 plane not prepared (e.g. prepare_device)
    legacy_qh = has_qh and qh_mode == "i32"
    bundled = is4 and not legacy_qh and m <= 8 and bundle
    scl = None
    if bundled:
        # decode/serving M <= 8 bundled prep: qa stays m-native (no row
        # pad at m == 4 / m == 8) and ONE [3 * nb_p, 8] f32 operand
        # carries d_a / s_a / sumq plane-major — a single XLA fusion
        # instead of 4-6 separate pad/transpose/reduce ops per dispatch
        # (round-5 glue adjudication, scripts/lab_ablate.py)
        qa = pad_activation_k(padm(a_q.qs, 4 if m <= 4 else 8),
                              k, kdim, is4)
        sumq = jnp.asarray(a_q.qs, jnp.int32).reshape(m, k // QK, QK).sum(-1)
        trio = jnp.concatenate([
            jnp.asarray(a_q.d, jnp.float32),
            jnp.asarray(a_q.s, jnp.float32),
            sumq.astype(jnp.float32),  # exact: |sumq| <= 32*127
        ], axis=0)                                     # [3m, nb]
        trio = pad_scales_k(trio, k, kdim, is4)        # [3m, nb_p]
        nb_p = trio.shape[1]
        scl = jnp.pad(
            trio.reshape(3, m, nb_p).transpose(0, 2, 1),
            ((0, 0), (0, 0), (0, 8 - m)),
        ).reshape(3 * nb_p, 8)
        da_t = sa_t = sq_t = None
    else:
        qa = pad_activation_k(padm(a_q.qs), k, kdim, is4)
        da_t = pad_scales_k(
            padm(a_q.d).astype(jnp.float32), k, kdim, is4).T
        sa_t = pad_scales_k(
            padm(a_q.s).astype(jnp.float32), k, kdim, is4).T
        if is4 and not legacy_qh:
            # per-block int32 activation code sums for the x8 hi-plane
            # fixup (fused by XLA into the quantization pass under jit)
            sumq = jnp.asarray(a_q.qs, jnp.int32).reshape(
                m, k // QK, QK).sum(-1)
            sq_t = pad_scales_k(padm(sumq), k, kdim, is4).T
        else:
            sq_t = None

    grid = (np_ // tn, nkt)

    def wspec(bs, off=0):
        return pl.BlockSpec(
            bs, lambda nt, kt, o=off: (kt + o, nt), memory_space=pltpu.VMEM
        )

    def full_spec(arr):  # whole small operand, fetched once (constant index)
        nd = arr.ndim
        return pl.BlockSpec(
            arr.shape, lambda nt, kt: (0,) * nd, memory_space=pltpu.VMEM
        )

    if is4:
        has_min = w.m_t is not None
        operands = [w.packed_t, w.d_t, w.d_t]
        in_specs = [
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off=nkt),
        ]
        if has_min:
            operands += [w.m_t, w.m_t]
            in_specs += [wspec((tkb, tn)), wspec((tkb, tn), off=nkt)]
        if has_qh and qh_mode == "qh2":
            # one nibble-packed h tile serves BOTH planes (rows match the
            # packed tile's lo-half K range; bit 4 = the hi-half element)
            operands.append(w.qh2_t)
            in_specs.append(wspec((tkp, tn)))
        elif has_qh:
            operands += [w.qh_t, w.qh_t]
            in_specs += [
                wspec((tkp // 8, tn)),
                wspec((tkp // 8, tn), off=nkt),
            ]
        if bundled:
            operands += [qa, scl]
            in_specs += [full_spec(qa), full_spec(scl)]
        else:
            operands += [qa, da_t, sa_t]
            in_specs += [full_spec(qa), full_spec(da_t), full_spec(sa_t)]
            if sq_t is not None:
                operands.append(sq_t)
                in_specs.append(full_spec(sq_t))
        # stacked dense-scaling epilogue: 4-row stacks at M <= 4 (decode),
        # 8-row stacks at 4 < M <= 8 (the serving batch) — see
        # _scaled_block_sums; unstacked per-block tiles beyond
        stack_rows = 4 if m <= 4 else (8 if m <= 8 else 0)
        if tkb % (4 * span) or span < 1:
            span = 1  # span must divide the plane tile's block count
        if stack_rows == 4 and prediag:
            qd = build_diag4(qa[:4, :], span=span)
            operands.append(qd)
            in_specs.append(full_spec(qd))
        kernel = functools.partial(
            _kernel,
            tkb=tkb,
            tkp=tkp,
            nkt=nkt,
            offset={"q4_0": 8, "q5_0": 16}.get(w.qtype, 0),
            has_min=has_min,
            has_qh=has_qh,
            stack_rows=stack_rows,
            span=span,
            prediag=prediag and stack_rows == 4,
            qh_mode=qh_mode,
            submask=submask,
            bundled=bundled,
            fusecomp=fusecomp,
        )
    else:
        operands = [w.qs_t, w.d_t, qa, da_t, sa_t]
        in_specs = [
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            full_spec(qa),
            full_spec(da_t),
            full_spec(sa_t),
        ]
        kernel = functools.partial(_kernel_w8, tkb=tkb, tkp=tkp, offset=0)

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


def _kernel_fused(*refs, tkb: int, tkp: int, nkt: int, offset: int,
                  has_min: bool, stack_rows: int = 0, span: int = 1,
                  fusecomp: bool = False):
    """Fused-quantization exact kernel (4-bit, non-q5 — x8 fast path).

    Ref order: packed, d_lo, d_hi, [m_lo, m_hi,] ax, out.  ``ax`` is the
    FLOAT activation [TM, 2*kdim-aligned K] (full, VMEM-resident); each
    32-block is quantized to Q8_1 in VMEM (gemm_fused.cuh:76-143 analogue)
    right before its int8 dot — float activations never round-trip to HBM
    as codes.  Quantization is bit-identical to jax_quant.quantize_q8_1
    (f16-rounded d, clip(rint(x/d)) codes, s = f16(d*sumq)), so the output
    equals quantize-then-gemm_exact EXACTLY.
    """
    it = iter(refs)
    packed_ref = next(it)
    dlo_ref, dhi_ref = next(it), next(it)
    mlo_ref, mhi_ref = (next(it), next(it)) if has_min else (None, None)
    ax_ref = next(it)  # [TM, 2*kdim] f32 (full)
    out_ref = refs[-1]

    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = packed_ref[:]  # int8, x8-encoded
    lo, hi = p & jnp.int8(0x0F), p & jnp.int8(-16)

    def plane(qw, d_ref, m_ref, koff, fixup):
        ax = ax_ref[:, pl.ds(koff * tkp, tkp)]  # [TM, tkp] f32
        acc = jnp.zeros_like(out_ref)
        d = scale_f32(d_ref[:])  # [tkb, tn]
        if fixup:
            d = d * 0.0625  # "noshift" (see _kernel): exact rescale
        blocks = [_quant_block_q8_1(ax[:, b * QK:(b + 1) * QK])
                  for b in range(tkb)]
        qa_cat = jnp.concatenate([blk[0] for blk in blocks], axis=1)
        # hoisted block-linear compensation terms, mirroring _kernel
        # operation-for-operation (bit-identity is pinned by
        # tests/test_kernels.py::test_fused_exact_bit_identical)
        da = jnp.concatenate([blk[1] for blk in blocks], axis=1).T  # [tkb,TM]
        sa = jnp.concatenate([blk[2] for blk in blocks], axis=1).T
        coeff = None
        if fixup:
            sq = jnp.concatenate([blk[3] for blk in blocks], axis=1).T
            coeff = 128.0 * (da * sq.astype(jnp.float32))
        if offset:
            t = float(offset * (16 if fixup else 1)) * sa
            coeff = -t if coeff is None else coeff - t
        v_of = None
        c_of = None
        if stack_rows:
            gs = 4 * span

            def v_of(t):  # stacked scales [rows*gs, 1] (_kernel's layout)
                return jnp.concatenate(
                    [blocks[t * gs + j][1][:stack_rows, :]
                     for j in range(gs)], axis=0)
            if fusecomp and coeff is not None and not has_min:
                # mirror _kernel's fused compensation (golden's own
                # per-block parenthesization) — bit-identity preserved:
                # _stacked_da is exact selection of the same f32 values
                cf = coeff
                coeff = None

                def c_of(t):  # noqa: E306
                    return _stacked_da(
                        cf[t * gs:(t + 1) * gs, 0:stack_rows], stack_rows)
        acc = _scaled_block_sums(qa_cat, qw, tkb, d, da, acc, v_of,
                                 span=span, rows=stack_rows or 4, c_of=c_of)
        pieces = []
        if coeff is not None:
            pieces.append((coeff, d))
        if has_min:
            pieces.append((sa, scale_f32(m_ref[:])))
        return acc, pieces

    a_lo, p_lo = plane(lo, dlo_ref, mlo_ref, kt, False)
    a_hi, p_hi = plane(hi, dhi_ref, mhi_ref, kt + nkt, True)
    out_ref[:] += a_lo
    out_ref[:] += a_hi
    merged = _merged_epilogue(p_lo + p_hi)
    if merged is not None:
        out_ref[:] += merged
    if stack_rows == 4:
        _fold_stack4(out_ref, kt, nkt - 1)


def _kernel_w8_fused(qs_ref, d_ref, ax_ref, out_ref, *, tkb: int, tkp: int):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    ax = ax_ref[:, pl.ds(kt * tkp, tkp)]
    acc = jnp.zeros_like(out_ref)
    for b in range(tkb):
        sl = slice(b * QK, (b + 1) * QK)
        qa, d_a, _s, _sq = _quant_block_q8_1(ax[:, sl])
        sumi = _int_dot(qa, qs_ref[sl, :]).astype(jnp.float32)
        acc += scale_f32(d_ref[b, :])[None, :] * d_a * sumi
    out_ref[:] += acc


def gemm_exact_fused(
    w: PreparedWeight,
    x: jax.Array,
    *,
    tn: int | None = None,
    tkp: int = 512,
    span: int = 1,
    fusecomp: bool | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Exact WxA8 GEMM with IN-KERNEL Q8_1 activation quantization.

    The parity item for the reference's fused kernel
    (kernels/gemm/gemm_fused.cuh:158-302): float activations are quantized
    to true Q8_1 semantics (f16-rounded ``d``, stored-sum ``s``) inside the
    GEMM, then hit the same int8 MXU dots + compensation epilogue as
    :func:`gemm_exact` — bit-identical to ``quantize_q8_1`` + ``gemm_exact``
    while skipping the activation's code/scale HBM round-trip (one fewer
    pass per decode GEMM).  Supports q4_0/q4_1 (x8 fast path) and q8_0;
    q5 formats take the unfused path (their 5th-bit plane needs the extra
    qh2/hdot operand plumbing that only ``gemm_exact`` carries).
    """
    if interpret is None:
        interpret = _interpret_default()
    if fusecomp is None:
        import os

        fusecomp = os.environ.get("QGT_FUSECOMP", "1") == "1"
    assert w.qh_t is None, "q5 formats: use quantize_q8_1 + gemm_exact"
    m, k = x.shape
    assert k == w.k
    # the float activation rides VMEM-resident ([M, Kpad] f32); decode
    # shapes only — prefill must quantize outside (dispatch handles this)
    assert m <= 64, f"fused exact kernel is decode-only (M={m})"
    if tn is None:
        tn = 2048
    x = x.astype(jnp.float32)
    is4 = w.packed_t is not None
    kdim = w.packed_t.shape[0] if is4 else w.qs_t.shape[0]
    tkp = min(tkp, kdim)
    while kdim % tkp:
        tkp //= 2
    tkb = tkp // QK
    nkt = kdim // tkp

    tm = round_up(m, 8)
    np_ = (w.packed_t if is4 else w.qs_t).shape[1]
    tn = min(tn, np_)
    tn -= tn % 128
    while np_ % tn:
        tn -= 128

    if tm != m:
        x = jnp.pad(x, ((0, tm - m), (0, 0)))
    ax = pad_activation_k(x, k, kdim, is4)

    grid = (np_ // tn, nkt)

    def wspec(bs, off=0):
        return pl.BlockSpec(
            bs, lambda nt, kt, o=off: (kt + o, nt), memory_space=pltpu.VMEM
        )

    def full_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(
            arr.shape, lambda nt, kt: (0,) * nd, memory_space=pltpu.VMEM
        )

    if is4:
        has_min = w.m_t is not None
        operands = [w.packed_t, w.d_t, w.d_t]
        in_specs = [
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off=nkt),
        ]
        if has_min:
            operands += [w.m_t, w.m_t]
            in_specs += [wspec((tkb, tn)), wspec((tkb, tn), off=nkt)]
        operands.append(ax)
        in_specs.append(full_spec(ax))
        kernel = functools.partial(
            _kernel_fused,
            tkb=tkb,
            tkp=tkp,
            nkt=nkt,
            offset={"q4_0": 8}.get(w.qtype, 0),
            has_min=has_min,
            stack_rows=4 if m <= 4 else (8 if m <= 8 else 0),
            span=span if tkb % (4 * span) == 0 else 1,
            fusecomp=fusecomp,
        )
    else:
        operands = [w.qs_t, w.d_t, ax]
        in_specs = [wspec((tkp, tn)), wspec((tkb, tn)), full_spec(ax)]
        kernel = functools.partial(_kernel_w8_fused, tkb=tkb, tkp=tkp)

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


# ---------------------------------------------------------------------------
# K16: native per-16-scale serving kernel for Q2_K / Q3_K / Q6_K
# (no requantization — the exact stored codes reach the MXU)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class PreparedK16:
    """K-major device layout for the per-16-scale K-quants.

    Codes are stored pre-shifted as int8 (exact: q6_K q-32 in [-32,31],
    q3_K q' in [-4,3], q2_K 0..3), so the per-16 int dots need no offset
    compensation; ``scp = f32(d) * f32(sc)`` is the exact per-16 effective
    scale (products are not f16-representable).  ``mp_t`` carries q2_K's
    per-16 additive term (-dmin*mn); None for q3_K/q6_K.
    """

    def __init__(self, qtype, n, k, qs_t, scp_t, mp_t=None):
        self.qtype = qtype
        self.n = n
        self.k = k
        self.qs_t = qs_t  # int8 [Kp, Np] shifted codes
        self.scp_t = scp_t  # f32 [Kp/16, Np]
        self.mp_t = mp_t  # f32 [Kp/16, Np] or None

    def tree_flatten(self):
        return (self.qs_t, self.scp_t, self.mp_t), (self.qtype, self.n, self.k)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)


def prepare_k16(t) -> PreparedK16:
    """Q2_K/Q3_K/Q6_KTensor (SoA, row-major) -> K-major padded layout."""
    import numpy as np

    qs = np.asarray(t.qs, np.int8)
    n, k = qs.shape
    kp = round_up(k, 512)
    np_pad = round_up(n, 256)

    def pad(x, rows, cols):
        return np.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))

    qs = pad(qs, np_pad, kp)
    scp = pad(np.asarray(t.scp, np.float32), np_pad, kp // 16)
    mp = getattr(t, "mp", None)
    mp_t = (
        jnp.asarray(pad(np.asarray(mp, np.float32), np_pad, kp // 16)).T
        if mp is not None else None
    )
    qtype = type(t).__name__.removesuffix("Tensor").lower()  # q2_k/q3_k/q6_k
    return PreparedK16(qtype, n, k, jnp.asarray(qs).T, jnp.asarray(scp).T,
                       mp_t)


# Q6_K-era aliases (PreparedK16 generalizes the original Q6_K-only class)
PreparedQ6K = PreparedK16
prepare_q6k = prepare_k16


def _kernel_k16(*refs, tkb16: int, tkp: int, has_min: bool):
    """Per-16-scale exact kernel: out += scp_j * d_a[j//2] * int16dot_j
    [+ mp_j * (d_a*sumq16)_j via one f32 dot per tile].

    Same skeleton as _kernel_w8 but the block loop walks 16-element
    sub-blocks (the K-quant scale granularity) and indexes the per-32
    Q8_1 activation scale at j//2."""
    it = iter(refs)
    scp_ref = next(it)
    mp_ref = next(it) if has_min else None
    qs_ref = next(it)
    qa_ref = next(it)
    da_ref = next(it)
    asq_ref = next(it) if has_min else None  # [nj_p, TM] f32 d_a*sumq16
    out_ref = refs[-1]
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    qa = qa_ref[:, pl.ds(kt * tkp, tkp)]
    da = da_ref[pl.ds(kt * (tkb16 // 2), tkb16 // 2), :]  # per-32 [.., TM]
    acc = jnp.zeros_like(out_ref)
    scp = scp_ref[:]  # [tkb16, tn]
    # 8 sub-blocks per K=128 MXU dispatch (vs 8x under-filled K=16 dots)
    dots = _block_dots_diag(qa, qs_ref[:], tkb16, out_ref.shape[0], blk=16)
    for j in range(tkb16):
        sumi = dots[j].astype(jnp.float32)
        acc += scp[j, :][None, :] * da[j // 2, :][:, None] * sumi
    if has_min:
        # additive per-16 term is linear across sub-blocks: ONE exact f32
        # dot per tile (the q4_1 min-term trick at per-16 granularity)
        asq = asq_ref[pl.ds(kt * tkb16, tkb16), :]
        acc += _f32_dot_bt(asq, mp_ref[:])
    out_ref[:] += acc


def gemm_exact_k16(
    w: PreparedK16,
    a_q: Q8_1Tensor,
    *,
    tn: int | None = None,
    tkp: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Native per-16-scale K-quant GEMM (Q2_K/Q3_K/Q6_K x Q8_1).

    Serves llama.cpp K-quant tensors (e.g. the Q6_K output layers of
    Q4_K_M models, or whole Q2_K/Q3_K models) with their EXACT stored
    codes and per-16 scales, instead of the old decode-then-requantize
    fallback.  Matches ``formats.kquants.gemm_k16_ref`` to f32
    accumulation order."""
    if interpret is None:
        interpret = _interpret_default()
    m, k = a_q.qs.shape
    assert k == w.k
    if tn is None:
        tn = 2048
    kdim = w.qs_t.shape[0]
    tkp = min(tkp, kdim)
    while kdim % tkp:
        tkp //= 2
    tkb16 = tkp // 16
    nkt = kdim // tkp
    tm = round_up(m, 8)
    np_ = w.qs_t.shape[1]
    tn = min(tn, np_)
    tn -= tn % 128
    while np_ % tn:
        tn -= 128
    has_min = w.mp_t is not None

    def padm(x):
        x = jnp.asarray(x)
        pr = tm - x.shape[0]
        return jnp.pad(x, ((0, pr), (0, 0))) if pr else x

    qa = pad_activation_k(padm(a_q.qs), k, kdim, False)
    da_t = pad_scales_k(padm(a_q.d).astype(jnp.float32), k, kdim, False).T
    if has_min:
        # exact per-16 activation code sums scaled by d_a (f32 products)
        sumq16 = jnp.asarray(a_q.qs, jnp.int32).reshape(m, k // 16, 16).sum(-1)
        d_a16 = jnp.repeat(jnp.asarray(a_q.d, jnp.float32), 2, axis=-1)
        asq = padm(sumq16.astype(jnp.float32) * d_a16)  # [tm, k/16]
        kb16 = kdim // 16
        if asq.shape[1] != kb16:
            asq = jnp.pad(asq, ((0, 0), (0, kb16 - asq.shape[1])))
        asq_t = asq.T
    else:
        asq_t = None

    def wspec(bs):
        return pl.BlockSpec(
            bs, lambda nt, kt: (kt, nt), memory_space=pltpu.VMEM
        )

    def full_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(
            arr.shape, lambda nt, kt: (0,) * nd, memory_space=pltpu.VMEM
        )

    operands = [w.scp_t]
    in_specs = [wspec((tkb16, tn))]
    if has_min:
        operands.append(w.mp_t)
        in_specs.append(wspec((tkb16, tn)))
    operands += [w.qs_t, qa, da_t]
    in_specs += [wspec((tkp, tn)), full_spec(qa), full_spec(da_t)]
    if has_min:
        operands.append(asq_t)
        in_specs.append(full_spec(asq_t))

    out = pl.pallas_call(
        functools.partial(_kernel_k16, tkb16=tkb16, tkp=tkp, has_min=has_min),
        grid=(np_ // tn, nkt),
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


gemm_exact_q6k = gemm_exact_k16  # Q6_K-era alias


__all__ = ["gemm_exact", "gemm_exact_fused", "PreparedK16", "prepare_k16",
           "gemm_exact_k16", "PreparedQ6K", "prepare_q6k", "gemm_exact_q6k"]
