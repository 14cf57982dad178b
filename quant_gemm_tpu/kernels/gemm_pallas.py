"""Pallas TPU GEMM kernels — the optimized rungs of the ladder.

TPU-first redesign of the reference's CUDA kernel ladder
(``kernels/gemm/gemm_warp_optimized.cuh``, ``gemm_async_copy.cuh``,
``gemm_fused.cuh``): instead of warps/smem/dp4a, the design maps onto

* **MXU**: dequantized bf16 (or f32) matmuls with f32 accumulation over full
  K tiles — not 32-wide blocks — for systolic-array efficiency;
* **VMEM/BlockSpec pipelining**: the HBM->VMEM double buffering the
  reference builds by hand (gemm_async_copy.cuh:66-232) falls out of the
  Pallas grid pipeline automatically;
* **VPU**: in-register int4 unpacking.

Device weight layout (produced once by :func:`prepare`): **K-major planar**

* ``packed: uint8[K/2, N]`` — byte ``(c, n)`` holds ``x[n, c]`` in the low
  nibble and ``x[n, c + K/2]`` in the high nibble.  ``packed & 0xF`` and
  ``packed >> 4`` each yield a `[TKP, TN]` slab of ``W^T`` in natural K
  order, so each byte is touched exactly once and the matmul runs in the
  MXU-native ``A[M,K] @ Wt[K,N]`` orientation with no transposes.
* ``d/m: float16[K/32, N]`` — per-block scales, expanded to per-row inside
  the kernel by a 0/1 expansion matmul (``E[TKP,TKB] @ d``), avoiding
  sub-lane reshapes entirely.

Activation-side per-block scales (the Q8_1 ``d_a``) are folded *outside* the
kernel by XLA (one fused pass over the small activation tensor); the kernel
always consumes float activations.  The exact-integer compensation kernel
(parity with gemm_reference.h:175-222 semantics) lives in
:mod:`quant_gemm_tpu.kernels.gemm_exact`.

Grid is ``(M tiles, N tiles, K tiles)`` with K innermost; the f32 output
block stays VMEM-resident across the K loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.blocks import QK, Q8_1Tensor
from ..formats import jax_quant
from ..utils import round_up


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@jax.tree_util.register_pytree_node_class
class PreparedWeight:
    """Kernel-ready K-major weight layout (built once at load time).

    A pytree whose static metadata (qtype, N, K) rides in the treedef, so
    instances pass through ``jit`` / ``device_put`` / shardings cleanly.
    """

    def __init__(self, qtype, n, k, packed_t, qs_t, d_t, m_t, qh_t,
                 qh2_t=None):
        self.qtype = qtype  # format name
        self.n = n  # out-features
        self.k = k  # reduction dim
        # int8[K/2, N] (4/5-bit): stored XOR 0x80 ("x8 encoding", see
        # prepare()) so both nibble planes decode with one native-i8 mask
        self.packed_t = packed_t
        self.qs_t = qs_t  # int8[K, N] (8-bit) or None
        self.d_t = d_t  # float32[K/32, N]
        self.m_t = m_t  # float32[K/32, N] (q4_1/q5_1)
        self.qh_t = qh_t  # uint8[K/8, N] planar 5th bits (q5_x)
        # int8[K/2, N] nibble-packed 5th bits (q5_x serving fast path):
        # row r = h(lo-half elem r) | h(hi-half elem r) << 4, so the exact
        # kernel decodes BOTH planes' h with one native-i8 mask each
        # (& 0x0F -> h, & -16 -> 16*h) — zero i32 work.  Costs +K/2 bytes
        # per column over the bit-packed qh_t it supplements (see
        # gemm_exact qh_mode="qh2"); built by prepare() for q5 formats.
        self.qh2_t = qh2_t

    def tree_flatten(self):
        return (
            (self.packed_t, self.qs_t, self.d_t, self.m_t, self.qh_t,
             self.qh2_t),
            (self.qtype, self.n, self.k),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)


# Storage dtype for the per-block weight scales (d/m planes).  With the x8
# kernel at the DMA floor the scale planes are ~20% of the decode stream,
# so half storage (LOSSLESS: the container d is IEEE f16 already) cuts
# decode bytes ~10%.  Mosaic has NO f16 dialect type ("Unsupported type in
# mosaic dialect: 'f16'", verified via the AOT gate), so np.float16 here
# means "f16 bits stored as int16", decoded to f32 at tile entry by
# :func:`scale_f32` — exact for every finite f16 incl. subnormals; the
# CUDA reference upcasts at entry the same way (gemm_quant_formats.cuh:97).
# Module-level so serving/model init flips it in one place; default stays
# f32 until the on-chip A/B (scripts/lab_f16scales.py) records the win.
SCALES_DTYPE = np.float32

# 2^112: rebias factor for the shift-based half->float bit decode (exactly
# representable; multiplying by a power of two is exact in f32)
_F16_REBIAS = np.float32(np.ldexp(1.0, 112))


def scale_f32(tile: jax.Array) -> jax.Array:
    """Upcast a scale tile to f32 inside a kernel.

    int16 tiles hold raw IEEE-f16 bits (see :data:`SCALES_DTYPE`): place
    sign/exponent/mantissa into f32 bit positions and rescale by 2^112 —
    exact for all finite f16 values including subnormals (inf/nan cannot
    occur: quantizers produce finite d/m by construction).  Anything else
    is a plain convert.
    """
    if tile.dtype == jnp.int16:
        h = tile.astype(jnp.int32) & 0xFFFF
        bits = ((h & 0x8000) << 16) | ((h & 0x7FFF) << 13)
        normal = jax.lax.bitcast_convert_type(bits, jnp.float32) * _F16_REBIAS
        # f16 subnormals (exponent field 0): m * 2^-24 computed WITHOUT f32
        # subnormal intermediates — the shift+rebias path's intermediate IS
        # an f32 subnormal there and gets flushed to zero on the VPU
        sub = (h & 0x3FF).astype(jnp.float32) * np.float32(np.ldexp(1., -24))
        sub = jnp.where(h & 0x8000, -sub, sub)
        return jnp.where(h & 0x7C00, normal, sub)
    return tile.astype(jnp.float32)


def _store_scales(x: np.ndarray, sdt) -> np.ndarray:
    """Materialize a host-side scale plane in its storage dtype.

    float16 storage is applied ONLY when the plane round-trips exactly
    (x == f32(f16(x)) elementwise): the five q-format containers carry
    native IEEE-f16 d/m so this always holds, but K-quant *effective*
    containers (kquants.to_effective) carry f32 ``super_d * ls`` products
    that are generally not f16-representable — those planes silently keep
    f32 so the half-storage flip stays lossless everywhere
    (tests/test_f16_scales.py::test_kquant_effective_scales_keep_f32).
    """
    x = np.asarray(x, np.float32)
    if np.dtype(sdt) == np.float16:
        h = x.astype(np.float16)
        if np.array_equal(h.astype(np.float32), x):
            return h.view(np.int16)
        return x  # not f16-representable: lossless f32 fallback
    return x.astype(sdt)


def prepare(w_q, scales_dtype=None, build_qh2: bool = True) -> PreparedWeight:
    """Transpose a row-major SoA container into the K-major kernel layout.

    Scales are stored as ``scales_dtype`` (default :data:`SCALES_DTYPE`)
    and upcast to f32 at kernel entry (exact: the container d/m are IEEE
    f16 values; the CUDA kernels upcast at entry anyway,
    gemm_quant_formats.cuh:97).

    4/5-bit packed bytes are stored **XOR 0x80 as int8** (the "x8
    encoding"): flipping the high nibble's top bit makes

    * ``p & 0x0F``  == the raw low-nibble codes (0..15), already int8;
    * ``p & 0xF0``  == ``16*hi - 128`` EXACTLY (two's-complement bias trick)

    so both planes reach the MXU with ONE native-i8 mask each — no u8->i32
    widen, no vector shift, no narrowing (the ~24 us VPU unpack cost that
    capped decode at 74% of roofline, docs/PERF_NOTES.md).  The exact
    kernel recovers the true hi-plane dot with an int32 fixup from the
    activation block sums: ``sumi_hi = (dot + 128*sumq_a) >> 4``.

    K is **zero-padded per nibble plane to a 256-packed-row multiple** so
    real-model dims that are not 512-multiples (e.g. Llama-7B's d_ff=11008)
    still tile: padded blocks carry d=0 (and m=0), so they contribute
    exactly nothing regardless of activation content.  ``PreparedWeight.k``
    stays the TRUE K; kernels read the padded extent off the array shapes
    and pad/reindex the activation to match (see :func:`pad_activation_k`).

    For q5 formats, ``build_qh2`` (default on) additionally materializes
    the nibble-packed 5th-bit plane ``qh2_t`` — the serving fast path's
    operand (gemm_exact qh_mode='qh2').  HBM cost: +k/2 bytes per column
    on top of the retained k/8 bit plane, i.e. q5 device weight memory
    grows ~1.65x vs hdot-only; pass ``build_qh2=False`` to trade the
    ~1.6x q5 decode speedup back for memory.
    """

    sdt = SCALES_DTYPE if scales_dtype is None else scales_dtype

    spec = w_q.spec
    name = spec.name

    def padcols(x, cols_to, dtype=None):
        x = np.asarray(x)
        pc = cols_to - x.shape[1]
        if pc:
            x = np.pad(x, ((0, 0), (0, pc)))
        return x if dtype is None else x.astype(dtype)

    def pad_halves(x, half, half_p):
        """Pad each K-half of a row-major [N, 2*half] field to half_p."""
        x = np.asarray(x)
        return np.concatenate(
            [padcols(x[:, :half], half_p), padcols(x[:, half:], half_p)],
            axis=1,
        )

    def padrows(x, rows_to):
        # N is ALSO padded here (to a 256 multiple): kernels then only need
        # a tile size dividing the stored extent — padding weight planes at
        # call time materialized a full padded copy per GEMM call
        x = np.asarray(x)
        pr = rows_to - x.shape[0]
        return np.pad(x, ((0, pr), (0, 0))) if pr else x

    if spec.bits == 8:
        n, k = np.asarray(w_q.qs).shape
        np_pad = round_up(n, 256)
        kp = round_up(k, 512)
        qs = padrows(padcols(w_q.qs, kp), np_pad)
        # keep f32 through padding; _store_scales decides the storage dtype
        # (with a per-plane exactness guard for the f16 flip)
        d = padrows(padcols(np.asarray(w_q.d, np.float32), kp // QK), np_pad)
        return PreparedWeight(
            name, n, k, None, jnp.asarray(qs).T,
            jnp.asarray(_store_scales(d, sdt)).T, None, None
        )

    n, khalf = np.asarray(w_q.packed).shape
    # The planar layout splits K into lo/hi nibble halves of khalf = K/2
    # elements; each half must cover whole 32-blocks or the half boundary
    # lands MID-block and the per-block epilogue silently mixes planes
    # (caught in the r5 fusecomp adjudication: K=352 diverged from the
    # golden on the BASE kernel too).  llama dims always satisfy this.
    assert (khalf % QK) == 0, (
        f"4/5-bit planar layout needs K % {2 * QK} == 0, got K={2 * khalf}")
    np_pad = round_up(n, 256)
    khalf_p = round_up(khalf, 256)
    packed = padrows(padcols(w_q.packed, khalf_p), np_pad)
    # x8 encoding (see docstring); pad bytes 0x00 become 0x80 = (lo 0,
    # hi 0 raw) — contributes nothing since padded blocks carry d = 0
    packed = (np.asarray(packed, np.uint8) ^ 0x80).view(np.int8)
    nbh, nbh_p = khalf // QK, khalf_p // QK
    d = padrows(pad_halves(np.asarray(w_q.d, np.float32), nbh, nbh_p), np_pad)
    d = _store_scales(d, sdt)
    m_t = (
        jnp.asarray(_store_scales(
            padrows(pad_halves(np.asarray(w_q.m, np.float32), nbh, nbh_p),
                    np_pad),
            sdt,
        )).T
        if spec.has_min else None
    )
    qh_t = (
        jnp.asarray(
            padrows(pad_halves(w_q.qh, khalf // 8, khalf_p // 8), np_pad)
        ).T
        if hasattr(w_q, "qh") else None
    )
    qh2_t = None
    if hasattr(w_q, "qh") and build_qh2:
        # nibble-packed 5th bits (see PreparedWeight.qh2_t): expand each
        # half's bit plane to one 0/1 byte per element, then pair lo/hi
        # halves into nibbles so the kernel's h decode is mask-only
        qh = np.asarray(w_q.qh, np.uint8)  # [N, 2*khalf/8], LSB-first
        hb = np.unpackbits(qh, axis=1, bitorder="little")  # [N, 2*khalf]
        h_lo = padcols(hb[:, :khalf], khalf_p)
        h_hi = padcols(hb[:, khalf:], khalf_p)
        qh2_t = jnp.asarray(
            padrows((h_lo | (h_hi << 4)).view(np.int8), np_pad)
        ).T
    return PreparedWeight(
        name, n, khalf * 2, jnp.asarray(packed).T, None, jnp.asarray(d).T,
        m_t, qh_t, qh2_t,
    )


def prepare_device(w_q, scales_dtype=None) -> PreparedWeight:
    """Device-side twin of :func:`prepare` for q4_0/q8_0 jnp containers.

    Same layout decisions (256-padded planes, x8 int8 encoding, K-major
    transpose) executed as jnp ops so a quantized model can be BUILT on
    the chip — ``prepare()`` is numpy-based and pulls every tensor to the
    (single-core) host, which made synthetic-model benchmark init take
    ~10 minutes for a 1.2B model.  Used by ``llama.init_qparams_device``.
    """
    spec = w_q.spec
    name = spec.name

    def padrc(x, rows_to, cols_to):
        return jnp.pad(
            x, ((0, rows_to - x.shape[0]), (0, cols_to - x.shape[1])))

    sdt = SCALES_DTYPE if scales_dtype is None else scales_dtype

    def store_dev(x):  # device twin of _store_scales
        if np.dtype(sdt) == np.float16:
            return jax.lax.bitcast_convert_type(
                x.astype(jnp.float16), jnp.int16)
        return x.astype(sdt)

    if spec.bits == 8:
        n, k = w_q.qs.shape
        np_pad, kp = round_up(n, 256), round_up(k, 512)
        qs = padrc(jnp.asarray(w_q.qs, jnp.int8), np_pad, kp)
        d = store_dev(padrc(jnp.asarray(w_q.d, jnp.float32), np_pad, kp // QK))
        return PreparedWeight(name, n, k, None, qs.T, d.T, None, None)

    assert name == "q4_0", f"prepare_device supports q4_0/q8_0, not {name}"
    n, khalf = w_q.packed.shape
    np_pad = round_up(n, 256)
    khalf_p = round_up(khalf, 256)
    packed = padrc(jnp.asarray(w_q.packed, jnp.uint8), np_pad, khalf_p)
    packed = jax.lax.bitcast_convert_type(  # x8 encoding (bit-preserving)
        packed ^ jnp.uint8(0x80), jnp.int8)
    nbh, nbh_p = khalf // QK, khalf_p // QK
    d = pad_scales_k(jnp.asarray(w_q.d, jnp.float32), khalf * 2,
                     khalf_p, True)
    d = store_dev(jnp.pad(d, ((0, np_pad - n), (0, 0))))
    return PreparedWeight(name, n, khalf * 2, packed.T, None, d.T, None,
                          None)


def pad_activation_k(a: jax.Array, k: int, kdim_p: int, is4: bool) -> jax.Array:
    """Reindex [M, K] activations to a K-padded weight's layout.

    4/5-bit planar weights pad each K-half independently, so the activation
    gets zeros inserted after each half; 8-bit pads at the end only.
    """
    if is4:
        half, half_p = k // 2, kdim_p
        if half == half_p:
            return a
        m = a.shape[0]
        z = jnp.zeros((m, half_p - half), a.dtype)
        return jnp.concatenate([a[:, :half], z, a[:, half:], z], axis=1)
    if kdim_p == k:
        return a
    return jnp.pad(a, ((0, 0), (0, kdim_p - k)))


def pad_scales_k(x: jax.Array, k: int, kdim_p: int, is4: bool) -> jax.Array:
    """Reindex per-block [M, K/32] vectors (d/s) to a K-padded layout."""
    x = jnp.asarray(x)
    if is4:
        nbh, nbh_p = k // 64, kdim_p // QK
        if nbh == nbh_p:
            return x
        z = jnp.zeros((x.shape[0], nbh_p - nbh), x.dtype)
        return jnp.concatenate([x[:, :nbh], z, x[:, nbh:], z], axis=1)
    nb, nb_p = k // QK, kdim_p // QK
    if nb == nb_p:
        return x
    return jnp.pad(x, ((0, 0), (0, nb_p - nb)))


def _expand_rows(d_tile: jax.Array, reps: int) -> jax.Array:
    """[TKB, TN] per-block values -> [TKB*reps, TN] per-row (dtype preserved).

    Sublane repeat is a broadcast + leading-dim reshape on the VPU — exact
    (no matmul rounding) and free compared with lane-dim expansion.
    """
    return jnp.repeat(d_tile, reps, axis=0)


def _expand_bits(qh_tile: jax.Array) -> jax.Array:
    """Planar 5th bits uint8[TKP/8, TN] -> f32[TKP, TN] (0/1 per row).

    Row r takes bit ``r % 8`` of input row ``r // 8``: sublane ``repeat``
    (cheap) + elementwise variable shift.  A stack-8-planes+reshape
    formulation measured 5x slower on q5 decode shapes — the sublane
    interleave relayout dominates (docs/PERF_NOTES.md).
    """
    rep = jnp.repeat(qh_tile.astype(jnp.int32), 8, axis=0)  # [TKP, TN]
    amt = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 0) % 8
    return ((rep >> amt) & 1).astype(jnp.float32)


def _mxu_cast_dtype(mxu_dtype):
    """Kernel-side operand dtype for a given MXU mode (None -> f32)."""
    return jnp.float32 if mxu_dtype is None else mxu_dtype


def _dot(a: jax.Array, wt: jax.Array, mxu_dtype=None) -> jax.Array:
    """C[M, N] += A[M, K] @ Wt[K, N], f32 accumulation on the MXU.

    MXU modes (the ``mxu_dtype`` contract used across this module):

    * ``None`` (serving default): **f32 operands, DEFAULT precision** — the
      MXU rounds inputs to bf16 internally, numerically identical to the
      explicit-cast path but without its VPU cast ops (measured 86 -> 72 us
      at 4096x64x14336, docs/PERF_NOTES.md).
    * ``jnp.bfloat16``: explicit bf16 casts (legacy fast mode).
    * ``jnp.float32``: accuracy mode — Precision.HIGHEST multi-pass so the
      result is true f32, not silently truncated.
    """
    precision = (
        jax.lax.Precision.HIGHEST if mxu_dtype == jnp.float32 else None
    )
    return jax.lax.dot_general(
        a, wt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------


def _kernel_w4(*refs, offset, has_min, has_qh, mxu_dtype, fused_q8_act):
    """4/5-bit weights.  Ref order:

    packed, d_lo, d_hi, [m_lo, m_hi,] [qh_lo, qh_hi,] a_lo, a_hi, out
    """
    it = iter(refs)
    packed_ref = next(it)
    dlo_ref, dhi_ref = next(it), next(it)
    mlo_ref, mhi_ref = (next(it), next(it)) if has_min else (None, None)
    qhlo_ref, qhhi_ref = (next(it), next(it)) if has_qh else (None, None)
    alo_ref, ahi_ref = next(it), next(it)
    out_ref = refs[-1]

    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    cast_dt = _mxu_cast_dtype(mxu_dtype)

    def act_slab(a_ref):
        a = a_ref[:]
        if fused_q8_act:
            # Fused on-the-fly Q8_1 fake-quantization (gemm_fused.cuh
            # analogue): per-32-block amax -> int8 codes -> rescale, all in
            # VMEM, so quantized-activation numerics come at zero extra HBM
            # traffic.  Block structure along lanes via segment-max matmul.
            a = _fake_quant_q8(a)
        return a if a.dtype == cast_dt else a.astype(cast_dt)

    # f32 dequant math with f16-exact scales, cast to mxu_dtype at the dot.
    # prepare() stores packed bytes XOR 0x80 as int8 (x8 encoding): the lo
    # nibble masks out directly, and (p & -16) == 16*hi - 128 exactly, so
    # hi codes come from ONE i8 mask + an f32 multiply-add — no u8->i32
    # widen and no vector shift (int8 shifts don't legalize in Mosaic; the
    # old i32 unpack chain was the decode bottleneck, docs/PERF_NOTES.md).
    p8 = packed_ref[:]
    lo_codes = (p8 & jnp.int8(0x0F)).astype(jnp.float32)  # 0..15
    hi_codes = (p8 & jnp.int8(-16)).astype(jnp.float32) * 0.0625 + 8.0

    def weight_slab(q, d_ref, m_ref, qh_ref):
        if has_qh:
            q = q + 16.0 * _expand_bits(qh_ref[:])
        d = _expand_rows(scale_f32(d_ref[:]), QK)
        if has_min:
            w = q * d + _expand_rows(scale_f32(m_ref[:]), QK)
        else:
            w = (q - float(offset)) * d
        return w if w.dtype == cast_dt else w.astype(cast_dt)

    w_lo = weight_slab(lo_codes, dlo_ref, mlo_ref, qhlo_ref)
    w_hi = weight_slab(hi_codes, dhi_ref, mhi_ref, qhhi_ref)

    out_ref[:] += _dot(act_slab(alo_ref), w_lo, mxu_dtype) + _dot(
        act_slab(ahi_ref), w_hi, mxu_dtype
    )


def _fake_quant_q8(a: jax.Array) -> jax.Array:
    """Per-32-block symmetric int8 fake-quant of [TM, TK] float tile.

    Lane-blocked amax without reshapes: segment-sum style matmuls with the
    0/1 block-membership matrix.
    """
    tm, tk = a.shape
    tkb = tk // QK
    member = (
        jax.lax.broadcasted_iota(jnp.int32, (tk, tkb), 0) // QK
        == jax.lax.broadcasted_iota(jnp.int32, (tk, tkb), 1)
    ).astype(jnp.float32)
    a32 = a.astype(jnp.float32)
    # amax per block: max-plus "matmul" is unavailable; use two passes of
    # masked max via where on the broadcasted membership would need 3D.
    # Cheap trick: amax = max over lanes of |a| * membership column, done as
    # tkb static slices (tkb is small and static).
    scales = []
    for b in range(tkb):
        blk = a32[:, b * QK : (b + 1) * QK]
        scales.append(jnp.max(jnp.abs(blk), axis=1, keepdims=True) / 127.0)
    d = jnp.concatenate(scales, axis=1)  # [TM, tkb]
    d_exp = jax.lax.dot_general(
        d, member.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TM, TK]
    inv = jnp.where(d_exp > 0, 1.0 / jnp.where(d_exp > 0, d_exp, 1.0), 0.0)
    q = jnp.clip(jnp.round(a32 * inv), -127, 127)
    return q * d_exp


def _kernel_w8(*refs, mxu_dtype, fused_q8_act):
    qs_ref, d_ref, a_ref, out_ref = refs

    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    cast_dt = _mxu_cast_dtype(mxu_dtype)
    wt = qs_ref[:].astype(jnp.float32) * _expand_rows(
        scale_f32(d_ref[:]), QK)
    wt = wt if wt.dtype == cast_dt else wt.astype(cast_dt)
    a = a_ref[:]
    if fused_q8_act:
        a = _fake_quant_q8(a)
    a = a if a.dtype == cast_dt else a.astype(cast_dt)
    out_ref[:] += _dot(a, wt, mxu_dtype)


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def supports(k: int) -> bool:
    """Pallas fast path: prepare() zero-pads K to 256-row packs, so any
    K whose 32-blocks align with the nibble planes (K % 64 == 0) tiles —
    including real-model dims like Llama-7B's d_ff=11008."""
    return k % 64 == 0


def gemm(
    w: PreparedWeight,
    act,
    *,
    tm: int = 256,
    tn: int | None = None,
    tkp: int | None = None,
    mxu_dtype=None,
    fused_quant: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Quantized GEMM: ``C[M, N] = act[M, K] @ dequant(w)[N, K]^T``.

    ``act``: float array [M, K] (W4A16/W8A16), or a Q8_1Tensor (W4A8/W8A8 —
    activation scales folded by XLA before the kernel), or float with
    ``fused_quant=True`` (on-the-fly in-kernel Q8_1 quantization, the
    gemm_fused.cuh analogue).

    ``tn``/``tkp`` default to the measured-best tiles per regime on v5e:
    decode (M <= 32) favours wide N tiles (tn=2048) to maximize the
    weight-streaming DMA size; prefill favours tn=1024 for MXU efficiency.
    """
    if isinstance(act, Q8_1Tensor):
        assert not fused_quant
        a = act.qs.astype(jnp.float32) * jax_quant.expand_scale(act.d)
        # fold to bf16 except in f32-HIGHEST accuracy mode: the MXU rounds
        # f32 operands to bf16 anyway at DEFAULT precision, and bf16 halves
        # the activation HBM bytes (matters at prefill M)
        a = a.astype(
            jnp.float32 if mxu_dtype == jnp.float32 else jnp.bfloat16
        )
    else:
        a = act
    m, k = a.shape
    assert k == w.k, (a.shape, w.k)
    if tn is None:
        tn = 2048 if m <= 32 else 1024
    if tkp is None:
        tkp = 1024
    if interpret is None:
        interpret = _interpret_default()

    is4 = w.packed_t is not None
    # padded packed column space (prepare() zero-pads K to 256-row packs)
    kdim = w.packed_t.shape[0] if is4 else w.qs_t.shape[0]
    a = pad_activation_k(a, k, kdim, is4)
    khalf = kdim if is4 else kdim // 2
    tkp = min(tkp, kdim)
    while kdim % tkp:
        tkp //= 2
    tkb = tkp // QK
    assert tkp % 256 == 0, (
        f"K={k} not supported by the Pallas path (need K/2 divisible by a "
        f"multiple of 256); use the XLA rung instead"
    )
    mp = round_up(m, 8)
    tm = min(tm, mp)
    mp = round_up(mp, tm)
    # N was padded to a 256 multiple at prepare(); pick a dividing tile
    np_ = (w.packed_t if is4 else w.qs_t).shape[1]
    # largest 128-multiple divisor of the stored extent that is <= tn
    # (halving would miss e.g. np_=32000 -> tn=1280, settling for 256)
    tn = min(tn, np_)
    tn -= tn % 128
    while np_ % tn:
        tn -= 128
    nkt = kdim // tkp

    def padm(x):
        pr = mp - x.shape[0]
        return jnp.pad(x, ((0, pr), (0, 0))) if pr else x

    a = padm(a)
    grid = (mp // tm, np_ // tn, nkt)

    def wspec(bs, off_kt=0, row_scale=1):
        return pl.BlockSpec(
            bs,
            lambda mt, nt, kt, o=off_kt: (kt + o, nt),
            memory_space=pltpu.VMEM,
        )

    def aspec(off_kt=0):
        return pl.BlockSpec(
            (tm, tkp),
            lambda mt, nt, kt, o=off_kt: (mt, kt + o),
            memory_space=pltpu.VMEM,
        )

    if is4:
        operands = [w.packed_t, w.d_t, w.d_t]
        in_specs = [
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off_kt=nkt),
        ]
        if w.m_t is not None:
            operands += [w.m_t, w.m_t]
            in_specs += [wspec((tkb, tn)), wspec((tkb, tn), off_kt=nkt)]
        if w.qh_t is not None:
            operands += [w.qh_t, w.qh_t]
            in_specs += [
                wspec((tkp // 8, tn)),
                wspec((tkp // 8, tn), off_kt=nkt),
            ]
        operands += [a, a]
        in_specs += [aspec(), aspec(off_kt=nkt)]
        kernel = functools.partial(
            _kernel_w4,
            offset={"q4_0": 8, "q5_0": 16}.get(w.qtype, 0),
            has_min=w.m_t is not None,
            has_qh=w.qh_t is not None,
            mxu_dtype=mxu_dtype,
            fused_q8_act=fused_quant,
        )
        wbytes = khalf * np_ + (k // QK) * np_ * 2 * (2 if w.m_t is not None else 1)
    else:
        operands = [w.qs_t, w.d_t, a]
        in_specs = [
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            aspec(),
        ]
        kernel = functools.partial(
            _kernel_w8, mxu_dtype=mxu_dtype, fused_q8_act=fused_quant
        )
        wbytes = k * np_ + (k // QK) * np_ * 2

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tm, tn), lambda mt, nt, kt: (mt, nt), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=wbytes + mp * k * a.dtype.itemsize + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:m, : w.n]


__all__ = ["PreparedWeight", "prepare", "gemm", "supports"]
