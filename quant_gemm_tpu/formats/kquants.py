"""Q4_K super-block quantization (llama.cpp K-quants, byte-exact layout).

The reference lists K-quants as unimplemented future work
(OPERATOR_LIST.md:58-78); Q4_K is llama.cpp's dominant real-world weight
format (Q4_K_M models), so the TPU engine supports it natively.

Format (`block_q4_K`, 144 bytes per super-block of 256 elements):

* ``d``/``dmin``: f16 super-scales,
* ``scales[12]``: eight 6-bit (scale, min) pairs for the 32-element
  sub-blocks, packed per llama.cpp ``get_scale_min_k4``,
* ``qs[128]``: 4-bit codes; within each 64-element chunk byte ``l`` holds
  element ``l`` (low nibble) and ``l+32`` (high nibble).

Dequantization of sub-block j: ``x = d*ls[j]*q - dmin*lm[j]`` with
``q in [0,15]`` — i.e. per-32 **effective** scale ``d' = d*ls`` and min
``m' = -dmin*lm``.  That is exactly the q4_1 per-block form, so the device
path converts Q4_K to an effective-q4_1 SoA container (f32 scales — the
products are NOT f16-representable) and reuses the whole q4_1 kernel
ladder, including the exact int8-MXU decode kernel and its
``d_w*d_a*sumi + m_w*s_a`` epilogue.

Q4_K/Q5_K ENCODERS run a make_qkx2-style weighted least-squares scale/min
search by default (``_qkx2_search`` — llama.cpp quantize_row_q4_K_ref's
parameters), with the fast min/max encoder available via ``search=False``;
Q2/Q3/Q6_K use the simple encoders.  Decode of any llama.cpp-produced
bytes is bit-exact either way.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..utils import F16_MAX, f16_sat
from .blocks import QK

QK_K = 256  # super-block size
NSB = QK_K // QK  # 8 sub-blocks
BLOCK_BYTES = 144  # 2 + 2 + 12 + 128


class Q4_KTensor(NamedTuple):
    """SoA Q4_K: super-scales + unpacked 6-bit sub-scales + planar codes.

    ``packed`` uses the project's global planar layout (byte c holds
    elements c and c+K/2) like every other 4-bit container, NOT the AoS
    per-64 interleave — that exists only in the serialized form.
    """

    d: np.ndarray  # f16 [N, K/256]
    dmin: np.ndarray  # f16 [N, K/256]
    ls: np.ndarray  # u8 [N, K/32] 6-bit sub-block scales
    lm: np.ndarray  # u8 [N, K/32] 6-bit sub-block mins
    packed: np.ndarray  # u8 [N, K/2] planar codes 0..15

    @property
    def k(self) -> int:
        return self.packed.shape[-1] * 2


class _EffSpec(NamedTuple):
    name: str
    bits: int
    has_min: bool
    has_sum: bool
    offset: int


class EffectiveQ41(NamedTuple):
    """Per-32 effective (d', m') view of a Q4_K tensor — q4_1-shaped, f32
    scales; feeds gemm_pallas.prepare() / the kernel ladder directly."""

    packed: np.ndarray  # u8 [N, K/2] planar
    d: np.ndarray  # f32 [N, K/32]
    m: np.ndarray  # f32 [N, K/32]

    @property
    def spec(self):
        return _EffSpec("q4_k", 4, True, False, 0)


def _qkx2_search(
    xs: np.ndarray, nmax: int, rmin: float, rdelta: float, nstep: int
) -> tuple[np.ndarray, np.ndarray]:
    """Weighted least-squares (scale, min) search per 32-element sub-block —
    llama.cpp ``make_qkx2_quants`` semantics (use_mad=false), vectorized.

    For each candidate inverse scale ``(rmin + rdelta*s + nmax) / span`` the
    codes are rounded, then (scale, min) are REFIT by weighted least squares
    over those codes; the candidate with the lowest weighted SSE wins
    against the plain min/max initialization.  Weights are llama.cpp's
    ``sqrt(mean(x^2)) + |x|`` importance (big-magnitude rows count more).

    Returns ``(scale, minv)`` with minv stored positive (m = -min), both
    f32 ``[..., B]``.  Degenerate (constant) sub-blocks return scale 0.
    """
    w = np.sqrt((xs * xs).mean(axis=-1, keepdims=True)) + np.abs(xs)
    mn = np.minimum(xs.min(axis=-1), 0.0)
    mx = xs.max(axis=-1)
    span = mx - mn
    ok = span > 0
    span_safe = np.where(ok, span, 1.0)
    sum_w = w.sum(axis=-1)
    sum_x = (w * xs).sum(axis=-1)

    def sse(scale, minv_neg, codes):
        r = scale[..., None] * codes + minv_neg[..., None] - xs
        return (w * r * r).sum(axis=-1)

    # initialization: plain min/max rounding, no refit
    l0 = np.clip(
        np.floor((xs - mn[..., None]) * (nmax / span_safe)[..., None] + 0.5),
        0, nmax)
    best_scale = span / nmax
    best_min = mn.copy()
    best_err = sse(best_scale, best_min, l0)

    for s in range(nstep + 1):
        isc = (rmin + rdelta * s + nmax) / span_safe
        l = np.clip(np.floor(isc[..., None] * (xs - mn[..., None]) + 0.5),
                    0, nmax)
        sum_l = (w * l).sum(axis=-1)
        sum_l2 = (w * l * l).sum(axis=-1)
        sum_xl = (w * l * xs).sum(axis=-1)
        det = sum_w * sum_l2 - sum_l * sum_l
        valid = det > 0
        det_safe = np.where(valid, det, 1.0)
        this_scale = (sum_w * sum_xl - sum_x * sum_l) / det_safe
        this_min = (sum_l2 * sum_x - sum_l * sum_xl) / det_safe
        # a positive min is clamped to 0 and the scale refit unconstrained
        pos = this_min > 0
        l2_safe = np.where(sum_l2 > 0, sum_l2, 1.0)
        this_scale = np.where(pos, sum_xl / l2_safe, this_scale)
        this_min = np.where(pos, 0.0, this_min)
        err = np.where(valid, sse(this_scale, this_min, l), np.inf)
        better = err < best_err
        best_err = np.where(better, err, best_err)
        best_scale = np.where(better, this_scale, best_scale)
        best_min = np.where(better, this_min, best_min)

    scale = np.where(ok, best_scale, 0.0).astype(np.float32)
    minv = np.where(ok, -best_min, -mn).astype(np.float32)
    return scale, np.maximum(minv, 0.0)


def quantize_q4_k(x: np.ndarray, search: bool = True) -> Q4_KTensor:
    """float [N, K] -> Q4_K (K % 256 == 0).

    ``search=True`` (default) runs the make_qkx2-style weighted scale/min
    search (rmin=-1, 20 steps — llama.cpp quantize_row_q4_K_ref's
    parameters); ``search=False`` is the fast min/max encoder.
    """
    x = np.asarray(x, np.float32)
    n, k = x.shape
    assert k % QK_K == 0, k
    xs = x.reshape(n, k // QK, QK)  # per sub-block
    if search:
        scale, minv = _qkx2_search(xs, 15, rmin=-1.0, rdelta=0.1, nstep=20)
    else:
        mn = np.minimum(xs.min(axis=2), 0.0)  # mins stored positive: m = -mn
        mx = xs.max(axis=2)
        scale = (mx - mn) / 15.0  # [N, nb]
        minv = -mn

    sup_scale = scale.reshape(n, -1, NSB).max(axis=2)  # [N, nsb]
    sup_min = minv.reshape(n, -1, NSB).max(axis=2)
    d = f16_sat(sup_scale / 63.0)
    dmin = f16_sat(sup_min / 63.0)
    d32 = d.astype(np.float32)
    dmin32 = dmin.astype(np.float32)

    def six_bit(vals, sup):  # vals [N, nb], sup [N, nsb] (f32 of the f16)
        rep = np.repeat(sup, NSB, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor(vals / np.where(rep > 0, rep, 1.0) + 0.5)
        return np.clip(np.where(rep > 0, q, 0), 0, 63).astype(np.uint8)

    ls = six_bit(scale, d32)
    lm = six_bit(minv, dmin32)

    d_eff = np.repeat(d32, NSB, axis=1) * ls  # [N, nb]
    m_eff = np.repeat(dmin32, NSB, axis=1) * lm
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.floor(
            (xs + m_eff[:, :, None]) / np.where(d_eff > 0, d_eff, 1.0)[:, :, None]
            + 0.5
        )
    codes = np.clip(np.where(d_eff[:, :, None] > 0, q, 0), 0, 15).astype(np.uint8)
    codes = codes.reshape(n, k)
    half = k // 2
    packed = (codes[:, :half] | (codes[:, half:] << 4)).astype(np.uint8)
    return Q4_KTensor(d, dmin, ls, lm, packed)


def _codes(t: Q4_KTensor) -> np.ndarray:
    half = t.packed.shape[-1]
    lo = (t.packed & 0x0F).astype(np.int32)
    hi = (t.packed >> 4).astype(np.int32)
    return np.concatenate([lo, hi], axis=-1)  # [N, K] natural order


def to_effective(t: Q4_KTensor) -> EffectiveQ41:
    """Per-32 effective scales: d' = d*ls (f32), m' = -dmin*lm (f32)."""
    d32 = np.repeat(t.d.astype(np.float32), NSB, axis=1) * t.ls
    m32 = -(np.repeat(t.dmin.astype(np.float32), NSB, axis=1) * t.lm)
    return EffectiveQ41(t.packed, d32.astype(np.float32), m32.astype(np.float32))


def dequantize_q4_k(t: Q4_KTensor) -> np.ndarray:
    eff = to_effective(t)
    n, k = _codes(t).shape
    codes = _codes(t).reshape(n, k // QK, QK).astype(np.float32)
    return (codes * eff.d[:, :, None] + eff.m[:, :, None]).reshape(n, k)


# ---------------------------------------------------------------------------
# byte-exact AoS serialization (block_q4_K)
# ---------------------------------------------------------------------------


def _pack_scales(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """[..., 8] 6-bit pairs -> [..., 12] bytes (get_scale_min_k4 inverse)."""
    out = np.zeros(ls.shape[:-1] + (12,), np.uint8)
    for j in range(4):
        out[..., j] = (ls[..., j] & 63) | ((ls[..., j + 4] >> 4) << 6)
        out[..., j + 4] = (lm[..., j] & 63) | ((lm[..., j + 4] >> 4) << 6)
        out[..., j + 8] = (ls[..., j + 4] & 0xF) | ((lm[..., j + 4] & 0xF) << 4)
    return out


def _unpack_scales(b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[..., 12] bytes -> ([..., 8] ls, [..., 8] lm) per get_scale_min_k4."""
    ls = np.zeros(b.shape[:-1] + (8,), np.uint8)
    lm = np.zeros_like(ls)
    for j in range(4):
        ls[..., j] = b[..., j] & 63
        lm[..., j] = b[..., j + 4] & 63
        ls[..., j + 4] = (b[..., j + 8] & 0xF) | ((b[..., j] >> 6) << 4)
        lm[..., j + 4] = (b[..., j + 8] >> 4) | ((b[..., j + 4] >> 6) << 4)
    return ls, lm


def to_bytes(t: Q4_KTensor) -> np.ndarray:
    """SoA -> AoS uint8 [N, K/256, 144] (bit-identical to block_q4_K)."""
    n = t.packed.shape[0]
    k = t.k
    nsb = k // QK_K
    out = np.zeros((n, nsb, BLOCK_BYTES), np.uint8)
    out[:, :, 0:2] = t.d.reshape(n, nsb, 1).view(np.uint8).reshape(n, nsb, 2)
    out[:, :, 2:4] = t.dmin.reshape(n, nsb, 1).view(np.uint8).reshape(n, nsb, 2)
    out[:, :, 4:16] = _pack_scales(
        t.ls.reshape(n, nsb, 8), t.lm.reshape(n, nsb, 8)
    )
    codes = _codes(t).reshape(n, nsb, QK_K).astype(np.uint8)
    # per-64 chunk: byte l = q[c+l] | q[c+l+32] << 4
    c4 = codes.reshape(n, nsb, 4, 2, 32)  # [..., chunk, half-of-chunk, 32]
    qs = (c4[:, :, :, 0, :] | (c4[:, :, :, 1, :] << 4)).reshape(n, nsb, 128)
    out[:, :, 16:144] = qs
    return out


def from_bytes(raw: np.ndarray) -> Q4_KTensor:
    """AoS uint8 [N, K/256, 144] -> SoA (accepts llama.cpp-written bytes).

    Routes through the native C++ codec when built (model-load hot path —
    bit-identical, asserted by tests/test_native.py); numpy fallback below.
    """
    from .. import native

    if native.kquants_available():
        return native.q4_k_from_aos(raw)
    raw = np.asarray(raw, np.uint8)
    n, nsb, bb = raw.shape
    assert bb == BLOCK_BYTES, bb
    k = nsb * QK_K
    d = raw[:, :, 0:2].copy().view(np.float16).reshape(n, nsb)
    dmin = raw[:, :, 2:4].copy().view(np.float16).reshape(n, nsb)
    ls8, lm8 = _unpack_scales(raw[:, :, 4:16])
    qs = raw[:, :, 16:144].reshape(n, nsb, 4, 32)
    codes = np.zeros((n, nsb, 4, 2, 32), np.uint8)
    codes[:, :, :, 0, :] = qs & 0x0F
    codes[:, :, :, 1, :] = qs >> 4
    codes = codes.reshape(n, k)
    half = k // 2
    packed = (codes[:, :half] | (codes[:, half:] << 4)).astype(np.uint8)
    return Q4_KTensor(d, dmin, ls8.reshape(n, -1), lm8.reshape(n, -1), packed)


# ---------------------------------------------------------------------------
# Q5_K: full support (block_q5_K, 176 B per 256 elements)
#
# Same super-block structure as Q4_K (d/dmin f16 + eight 6-bit (scale, min)
# pairs) with 5-bit codes: low nibbles in qs[128] (per-64 interleave like
# Q4_K), 5th bits in qh[32] (byte l bit 2c   -> element 64c + l,
#                                    bit 2c+1 -> element 64c + 32 + l).
# Dequant of sub-block j: x = d*ls[j]*q - dmin*lm[j], q in [0, 31] — the
# per-32 effective (d', m') form with 5-bit codes, i.e. exactly the q5_1
# kernel shape (planar packed low nibbles + planar qh plane), so Q5_K rides
# the whole q5_1 ladder including the exact int8-MXU decode kernel.
# ---------------------------------------------------------------------------

QK5_BLOCK_BYTES = 176  # 2 + 2 + 12 + 32 + 128


class Q5_KTensor(NamedTuple):
    """SoA Q5_K: super-scales, 6-bit sub-scales, planar low codes + 5th bits."""

    d: np.ndarray  # f16 [N, K/256]
    dmin: np.ndarray  # f16 [N, K/256]
    ls: np.ndarray  # u8 [N, K/32]
    lm: np.ndarray  # u8 [N, K/32]
    packed: np.ndarray  # u8 [N, K/2] planar low nibbles
    qh: np.ndarray  # u8 [N, K/8] planar 5th bits

    @property
    def k(self) -> int:
        return self.packed.shape[-1] * 2


class EffectiveQ51(NamedTuple):
    """Per-32 effective (d', m') view of a Q5_K tensor — q5_1-shaped, f32
    scales; feeds gemm_pallas.prepare() / the kernel ladder directly."""

    packed: np.ndarray  # u8 [N, K/2] planar low nibbles
    qh: np.ndarray  # u8 [N, K/8] planar 5th bits
    d: np.ndarray  # f32 [N, K/32]
    m: np.ndarray  # f32 [N, K/32]

    @property
    def spec(self):
        return _EffSpec("q5_k", 5, True, False, 0)


def _codes5(t: Q5_KTensor) -> np.ndarray:
    """[N, K] natural-order codes 0..31."""
    lo = (t.packed & 0x0F).astype(np.int32)
    hi = (t.packed >> 4).astype(np.int32)
    low4 = np.concatenate([lo, hi], axis=-1)
    shifts = np.arange(8, dtype=np.uint8)
    bits = ((t.qh[..., None] >> shifts) & 1).reshape(t.qh.shape[:-1] + (-1,))
    return low4 + 16 * bits.astype(np.int32)


def quantize_q5_k(x: np.ndarray, search: bool = True) -> Q5_KTensor:
    """float [N, K] -> Q5_K (K % 256 == 0).

    ``search=True`` (default) runs the make_qkx2-style weighted scale/min
    search (rmin=-0.5, 15 steps — llama.cpp quantize_row_q5_K_ref's
    parameters); ``search=False`` is the fast min/max encoder.
    """
    x = np.asarray(x, np.float32)
    n, k = x.shape
    assert k % QK_K == 0, k
    xs = x.reshape(n, k // QK, QK)
    if search:
        scale, minv = _qkx2_search(xs, 31, rmin=-0.5, rdelta=0.1, nstep=15)
    else:
        mn = np.minimum(xs.min(axis=2), 0.0)
        mx = xs.max(axis=2)
        scale = (mx - mn) / 31.0
        minv = -mn

    sup_scale = scale.reshape(n, -1, NSB).max(axis=2)
    sup_min = minv.reshape(n, -1, NSB).max(axis=2)
    d = f16_sat(sup_scale / 63.0)
    dmin = f16_sat(sup_min / 63.0)
    d32 = d.astype(np.float32)
    dmin32 = dmin.astype(np.float32)

    def six_bit(vals, sup):
        rep = np.repeat(sup, NSB, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor(vals / np.where(rep > 0, rep, 1.0) + 0.5)
        return np.clip(np.where(rep > 0, q, 0), 0, 63).astype(np.uint8)

    ls = six_bit(scale, d32)
    lm = six_bit(minv, dmin32)

    d_eff = np.repeat(d32, NSB, axis=1) * ls
    m_eff = np.repeat(dmin32, NSB, axis=1) * lm
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.floor(
            (xs + m_eff[:, :, None]) / np.where(d_eff > 0, d_eff, 1.0)[:, :, None]
            + 0.5
        )
    codes = np.clip(np.where(d_eff[:, :, None] > 0, q, 0), 0, 31).astype(np.uint8)
    codes = codes.reshape(n, k)
    half = k // 2
    packed = ((codes[:, :half] & 0xF) | ((codes[:, half:] & 0xF) << 4)).astype(
        np.uint8
    )
    bits = (codes >> 4).reshape(n, k // 8, 8)
    qh = (bits << np.arange(8, dtype=np.uint8)).sum(axis=-1).astype(np.uint8)
    return Q5_KTensor(d, dmin, ls, lm, packed, qh)


def to_effective_q5_k(t: Q5_KTensor) -> EffectiveQ51:
    """Per-32 effective scales: d' = d*ls (f32), m' = -dmin*lm (f32)."""
    d32 = np.repeat(t.d.astype(np.float32), NSB, axis=1) * t.ls
    m32 = -(np.repeat(t.dmin.astype(np.float32), NSB, axis=1) * t.lm)
    return EffectiveQ51(
        t.packed, t.qh, d32.astype(np.float32), m32.astype(np.float32)
    )


def dequantize_q5_k(t: Q5_KTensor) -> np.ndarray:
    eff = to_effective_q5_k(t)
    n = t.packed.shape[0]
    k = t.k
    codes = _codes5(t).reshape(n, k // QK, QK).astype(np.float32)
    return (codes * eff.d[:, :, None] + eff.m[:, :, None]).reshape(n, k)


def to_bytes_q5_k(t: Q5_KTensor) -> np.ndarray:
    """SoA -> AoS uint8 [N, K/256, 176] (bit-identical to block_q5_K)."""
    n = t.packed.shape[0]
    k = t.k
    nsb = k // QK_K
    out = np.zeros((n, nsb, QK5_BLOCK_BYTES), np.uint8)
    out[:, :, 0:2] = t.d.reshape(n, nsb, 1).view(np.uint8).reshape(n, nsb, 2)
    out[:, :, 2:4] = t.dmin.reshape(n, nsb, 1).view(np.uint8).reshape(n, nsb, 2)
    out[:, :, 4:16] = _pack_scales(
        t.ls.reshape(n, nsb, 8), t.lm.reshape(n, nsb, 8)
    )
    codes = _codes5(t).reshape(n, nsb, 4, 2, 32)  # [..., chunk, half, 32]
    hi = ((codes >> 4) & 1).astype(np.uint8)
    qh = np.zeros((n, nsb, 32), np.uint8)
    for c in range(4):
        qh |= (hi[:, :, c, 0, :] << (2 * c)) | (hi[:, :, c, 1, :] << (2 * c + 1))
    out[:, :, 16:48] = qh
    low4 = (codes & 0xF).astype(np.uint8)
    out[:, :, 48:176] = (
        low4[:, :, :, 0, :] | (low4[:, :, :, 1, :] << 4)
    ).reshape(n, nsb, 128)
    return out


def from_bytes_q5_k(raw: np.ndarray) -> Q5_KTensor:
    """AoS uint8 [N, K/256, 176] -> SoA (accepts llama.cpp-written bytes).

    Routes through the native C++ codec when built; numpy fallback below.
    """
    from .. import native

    if native.kquants_available():
        return native.q5_k_from_aos(raw)
    raw = np.asarray(raw, np.uint8)
    n, nsb, bb = raw.shape
    assert bb == QK5_BLOCK_BYTES, bb
    k = nsb * QK_K
    d = raw[:, :, 0:2].copy().view(np.float16).reshape(n, nsb)
    dmin = raw[:, :, 2:4].copy().view(np.float16).reshape(n, nsb)
    ls8, lm8 = _unpack_scales(raw[:, :, 4:16])
    qh_aos = raw[:, :, 16:48].astype(np.int32)  # [n, nsb, 32]
    qs = raw[:, :, 48:176].reshape(n, nsb, 4, 32)
    codes = np.zeros((n, nsb, 4, 2, 32), np.int32)
    codes[:, :, :, 0, :] = qs & 0x0F
    codes[:, :, :, 1, :] = qs >> 4
    for c in range(4):
        codes[:, :, c, 0, :] |= ((qh_aos >> (2 * c)) & 1) << 4
        codes[:, :, c, 1, :] |= ((qh_aos >> (2 * c + 1)) & 1) << 4
    codes = codes.reshape(n, k)
    half = k // 2
    packed = (
        (codes[:, :half] & 0xF) | ((codes[:, half:] & 0xF) << 4)
    ).astype(np.uint8)
    bits = ((codes >> 4) & 1).reshape(n, k // 8, 8)
    qh = (bits << np.arange(8)).sum(axis=-1).astype(np.uint8)
    return Q5_KTensor(
        d, dmin, ls8.reshape(n, -1), lm8.reshape(n, -1), packed, qh
    )


# ---------------------------------------------------------------------------
# Q2_K / Q3_K: decode-only (per-16 scales don't fit the per-32 ladder;
# like Q6_K, the loader decodes byte-exactly and re-quantizes for serving)
# ---------------------------------------------------------------------------

QK2_BLOCK_BYTES = 84  # 16 scales + 64 qs + 2 d + 2 dmin
QK3_BLOCK_BYTES = 110  # 32 hmask + 64 qs + 12 scales + 2 d

# element e of a 256-super-block lives in 2-bit plane: byte
# (e//128)*32 + e%32 at shift 2*((e%128)//32)  (llama.cpp q2_K/q3_K layout)
_E = np.arange(QK_K)
_Q2_BYTE = (_E // 128) * 32 + (_E % 32)
_Q2_SHIFT = 2 * ((_E % 128) // 32)


def dequantize_q2_k_bytes(raw: np.ndarray) -> np.ndarray:
    """AoS uint8 [N, K/256, 84] -> float32 [N, K], llama.cpp
    dequantize_row_q2_K semantics (2-bit codes, per-16 4-bit scale/min)."""
    raw = np.asarray(raw, np.uint8)
    n, nsb, bb = raw.shape
    assert bb == QK2_BLOCK_BYTES, bb
    scales = raw[:, :, 0:16].astype(np.int32)  # sc & 0xF | m << 4
    qs = raw[:, :, 16:80].astype(np.int32)
    d = raw[:, :, 80:82].copy().view(np.float16).astype(np.float32)[:, :, 0]
    dmin = raw[:, :, 82:84].copy().view(np.float16).astype(np.float32)[:, :, 0]

    q = (qs[:, :, _Q2_BYTE] >> _Q2_SHIFT) & 3  # [n, nsb, 256]
    sc = scales[:, :, _E // 16]
    out = d[:, :, None] * (sc & 0xF) * q - dmin[:, :, None] * (sc >> 4)
    return out.astype(np.float32).reshape(n, nsb * QK_K)


def _q3_scales(s12: np.ndarray) -> np.ndarray:
    """[..., 12] packed bytes -> [..., 16] int 6-bit scales (0..63), the
    llama.cpp kmask1/kmask2 aux unpacking expressed per byte."""
    s = s12.astype(np.int32)
    i = np.arange(4)
    w0 = (s[..., i] & 0xF) | ((s[..., 8 + i] & 3) << 4)
    w1 = (s[..., 4 + i] & 0xF) | (((s[..., 8 + i] >> 2) & 3) << 4)
    w2 = (s[..., i] >> 4) | (((s[..., 8 + i] >> 4) & 3) << 4)
    w3 = (s[..., 4 + i] >> 4) | (((s[..., 8 + i] >> 6) & 3) << 4)
    return np.concatenate([w0, w1, w2, w3], axis=-1)


def dequantize_q3_k_bytes(raw: np.ndarray) -> np.ndarray:
    """AoS uint8 [N, K/256, 110] -> float32 [N, K], llama.cpp
    dequantize_row_q3_K semantics (2+1-bit codes, per-16 6-bit scales)."""
    raw = np.asarray(raw, np.uint8)
    n, nsb, bb = raw.shape
    assert bb == QK3_BLOCK_BYTES, bb
    hmask = raw[:, :, 0:32].astype(np.int32)
    qs = raw[:, :, 32:96].astype(np.int32)
    sc16 = _q3_scales(raw[:, :, 96:108])  # [n, nsb, 16]
    d = raw[:, :, 108:110].copy().view(np.float16).astype(np.float32)[:, :, 0]

    q = (qs[:, :, _Q2_BYTE] >> _Q2_SHIFT) & 3
    hbit = (hmask[:, :, _E % 32] >> (_E // 32)) & 1
    q = q - np.where(hbit, 0, 4)  # high bit SET means no -4 offset
    sc = sc16[:, :, _E // 16] - 32
    out = d[:, :, None] * sc * q
    return out.astype(np.float32).reshape(n, nsb * QK_K)


__all__ = [
    "QK_K",
    "BLOCK_BYTES",
    "QK5_BLOCK_BYTES",
    "QK2_BLOCK_BYTES",
    "QK3_BLOCK_BYTES",
    "Q4_KTensor",
    "Q5_KTensor",
    "EffectiveQ41",
    "EffectiveQ51",
    "quantize_q4_k",
    "quantize_q5_k",
    "dequantize_q4_k",
    "dequantize_q5_k",
    "to_effective",
    "to_effective_q5_k",
    "to_bytes",
    "from_bytes",
    "to_bytes_q5_k",
    "from_bytes_q5_k",
    "dequantize_q2_k_bytes",
    "dequantize_q3_k_bytes",
]


# ---------------------------------------------------------------------------
# Q6_K: NATIVE serving support (block_q6_K, 210 B per 256 elements)
#
# Real Q4_K_M GGUF models store a few tensors (typically output.weight) as
# Q6_K.  Its scales are per-16 (not per-32), so it does not map onto the
# per-32 kernel ladder; Q6_KTensor + kernels.gemm_exact.gemm_exact_q6k
# serve the exact stored codes with a per-16-block kernel (no
# requantization).  dequantize_q6_k_bytes remains the llama.cpp-exact
# byte-decode golden.
# ---------------------------------------------------------------------------

QK6_BLOCK_BYTES = 210  # 128 ql + 64 qh + 16 scales + 2 d


def dequantize_q6_k_bytes(raw: np.ndarray) -> np.ndarray:
    """AoS uint8 [N, K/256, 210] -> float32 [N, K], llama.cpp
    dequantize_row_q6_K semantics (6-bit codes, per-16 int8 scales)."""
    raw = np.asarray(raw, np.uint8)
    n, nsb, bb = raw.shape
    assert bb == QK6_BLOCK_BYTES, bb
    ql = raw[:, :, 0:128].astype(np.int32)
    qh = raw[:, :, 128:192].astype(np.int32)
    scales = raw[:, :, 192:208].copy().view(np.int8).astype(np.float32)
    d = raw[:, :, 208:210].copy().view(np.float16).astype(np.float32)[:, :, 0]

    out = np.zeros((n, nsb, QK_K), np.float32)
    for half in range(2):  # two 128-element halves
        lql = ql[:, :, half * 64 : half * 64 + 64]
        lqh = qh[:, :, half * 32 : half * 32 + 32]
        base = half * 128
        q1 = (lql[:, :, :32] & 0xF) | ((lqh & 3) << 4)
        q2 = (lql[:, :, 32:] & 0xF) | (((lqh >> 2) & 3) << 4)
        q3 = (lql[:, :, :32] >> 4) | (((lqh >> 4) & 3) << 4)
        q4 = (lql[:, :, 32:] >> 4) | (((lqh >> 6) & 3) << 4)
        for seg, q in enumerate((q1, q2, q3, q4)):
            idx = base + seg * 32
            sc = np.repeat(
                scales[:, :, (idx // 16) : (idx // 16) + 2], 16, axis=2
            )
            out[:, :, idx : idx + 32] = (
                d[:, :, None] * sc * (q.astype(np.float32) - 32.0)
            )
    return out.reshape(n, nsb * QK_K)


class Q6_KTensor(NamedTuple):
    """SoA Q6_K for NATIVE serving (no requantization).

    llama.cpp semantics: x = d * sc[j] * (q - 32) with 6-bit codes q and
    per-16 int8 sub-scales sc (dequantize_row_q6_K).  The SoA form stores
    the SHIFTED codes q-32 directly as int8 (exact — they span [-32, 31]),
    so the serving kernel needs NO offset compensation: the per-16 int dot
    against Q8_1 activation codes is already centered.  Byte cost on
    device is 8 bits/weight vs the serialized 6.5625 — the price of
    lane-aligned int8 MXU feeds; numerics are EXACTLY the stored codes,
    unlike the previous decode-then-requantize fallback.
    """

    d: np.ndarray  # f16 [N, K/256] super-scales
    sc: np.ndarray  # i8 [N, K/16] per-16 sub-scales
    qs: np.ndarray  # i8 [N, K] codes - 32

    @property
    def k(self) -> int:
        return self.qs.shape[-1]

    @property
    def scp(self) -> np.ndarray:
        """Effective per-16 f32 scale d*sc (exact f32 products)."""
        d16 = np.repeat(np.asarray(self.d, np.float32), QK_K // 16, axis=-1)
        return d16 * np.asarray(self.sc, np.float32)


def _q6k_codes_from_bytes(raw: np.ndarray) -> np.ndarray:
    """AoS uint8 [N, NSB, 210] -> raw 6-bit codes int32 [N, NSB, 256]."""
    ql = raw[:, :, 0:128].astype(np.int32)
    qh = raw[:, :, 128:192].astype(np.int32)
    q = np.zeros(raw.shape[:2] + (QK_K,), np.int32)
    for half in range(2):
        lql = ql[:, :, half * 64 : half * 64 + 64]
        lqh = qh[:, :, half * 32 : half * 32 + 32]
        base = half * 128
        q[:, :, base + 0 : base + 32] = (lql[:, :, :32] & 0xF) | ((lqh & 3) << 4)
        q[:, :, base + 32 : base + 64] = (lql[:, :, 32:] & 0xF) | (((lqh >> 2) & 3) << 4)
        q[:, :, base + 64 : base + 96] = (lql[:, :, :32] >> 4) | (((lqh >> 4) & 3) << 4)
        q[:, :, base + 96 : base + 128] = (lql[:, :, 32:] >> 4) | (((lqh >> 6) & 3) << 4)
    return q


def from_bytes_q6_k(raw: np.ndarray) -> Q6_KTensor:
    """AoS uint8 [N, K/256, 210] -> SoA container (byte-exact decode).

    Routes through the native C++ codec when built (the Q4_K_M model-load
    hot path — bit-identical, asserted by tests/test_native.py)."""
    from .. import native

    if native.q6k_available():
        return native.q6_k_from_aos(raw)
    raw = np.asarray(raw, np.uint8)
    n, nsb, bb = raw.shape
    assert bb == QK6_BLOCK_BYTES, bb
    sc = raw[:, :, 192:208].copy().view(np.int8).reshape(n, nsb * 16)
    d = raw[:, :, 208:210].copy().view(np.float16)[:, :, 0]
    q = _q6k_codes_from_bytes(raw)
    qs = (q - 32).astype(np.int8).reshape(n, nsb * QK_K)
    return Q6_KTensor(d, sc, qs)


def to_bytes_q6_k(t: Q6_KTensor) -> np.ndarray:
    """SoA -> AoS uint8 [N, K/256, 210] (inverse of from_bytes_q6_k)."""
    n, k = t.qs.shape
    nsb = k // QK_K
    q = (np.asarray(t.qs, np.int32) + 32).reshape(n, nsb, QK_K)
    raw = np.zeros((n, nsb, QK6_BLOCK_BYTES), np.uint8)
    for half in range(2):
        base = half * 128
        s1 = q[:, :, base + 0 : base + 32]
        s2 = q[:, :, base + 32 : base + 64]
        s3 = q[:, :, base + 64 : base + 96]
        s4 = q[:, :, base + 96 : base + 128]
        raw[:, :, half * 64 : half * 64 + 32] = ((s1 & 0xF) | ((s3 & 0xF) << 4))
        raw[:, :, half * 64 + 32 : half * 64 + 64] = ((s2 & 0xF) | ((s4 & 0xF) << 4))
        raw[:, :, 128 + half * 32 : 128 + half * 32 + 32] = (
            (s1 >> 4) | ((s2 >> 4) << 2) | ((s3 >> 4) << 4) | ((s4 >> 4) << 6)
        )
    raw[:, :, 192:208] = np.asarray(t.sc, np.int8).reshape(n, nsb, 16).view(np.uint8)
    raw[:, :, 208:210] = (
        np.asarray(t.d, np.float16).reshape(n, nsb, 1).view(np.uint8)
    )
    return raw


def dequantize_q6_k(t: Q6_KTensor) -> np.ndarray:
    """Golden dequant from the SoA form (== dequantize_q6_k_bytes)."""
    scp16 = np.repeat(t.scp, 16, axis=-1)  # [N, K]
    return scp16 * np.asarray(t.qs, np.float32)


def gemm_q6k_ref(t: Q6_KTensor, a_q) -> np.ndarray:
    """Numpy golden W6A8 GEMM: per-16 exact int dots, f32 epilogue.

    out[m, n] = sum_j scp[n, j] * d_a[m, j//2] * sum_{i in 16_j} qa*qs —
    the contract the Pallas q6k kernel matches (f32 accumulation order may
    differ; compare with a small tolerance like the other exact kernels).
    """
    qa = np.asarray(a_q.qs, np.int32)  # [M, K]
    m, k = qa.shape
    nj = k // 16
    sumi = np.einsum(
        "mji,nji->mnj",
        qa.reshape(m, nj, 16),
        np.asarray(t.qs, np.int32).reshape(t.qs.shape[0], nj, 16),
    ).astype(np.float64)  # exact int dot per 16
    d_a = np.repeat(np.asarray(a_q.d, np.float32).astype(np.float64), 2, axis=-1)
    scp = t.scp.astype(np.float64)
    return np.einsum("mnj,mj,nj->mn", sumi, d_a, scp).astype(np.float32)


# ---------------------------------------------------------------------------
# Q2_K / Q3_K: NATIVE serving containers (per-16 scales, like Q6_K)
# ---------------------------------------------------------------------------


class Q2_KTensor(NamedTuple):
    """SoA Q2_K for native serving: x = d*sc_j*q - dmin*mn_j (q in 0..3,
    per-16 4-bit sc/mn).  Codes stored unpacked int8 (exact)."""

    d: np.ndarray  # f16 [N, K/256]
    dmin: np.ndarray  # f16 [N, K/256]
    sc: np.ndarray  # u8 [N, K/16] 4-bit scales
    mn: np.ndarray  # u8 [N, K/16] 4-bit mins
    qs: np.ndarray  # i8 [N, K] codes 0..3

    @property
    def k(self) -> int:
        return self.qs.shape[-1]

    @property
    def scp(self) -> np.ndarray:
        d16 = np.repeat(np.asarray(self.d, np.float32), QK_K // 16, axis=-1)
        return d16 * np.asarray(self.sc, np.float32)

    @property
    def mp(self) -> np.ndarray:
        """Per-16 additive term: x = scp*q + mp (mp = -dmin*mn)."""
        m16 = np.repeat(np.asarray(self.dmin, np.float32), QK_K // 16, axis=-1)
        return -m16 * np.asarray(self.mn, np.float32)


class Q3_KTensor(NamedTuple):
    """SoA Q3_K for native serving: x = d*(sc_j-32)*q' with SHIFTED codes
    q' = q2 - (0 if hbit else 4) in [-4, 3] stored directly as int8."""

    d: np.ndarray  # f16 [N, K/256]
    sc: np.ndarray  # i8 [N, K/16] 6-bit scales minus 32
    qs: np.ndarray  # i8 [N, K] shifted codes

    @property
    def k(self) -> int:
        return self.qs.shape[-1]

    @property
    def scp(self) -> np.ndarray:
        d16 = np.repeat(np.asarray(self.d, np.float32), QK_K // 16, axis=-1)
        return d16 * np.asarray(self.sc, np.float32)

    mp = None


def from_bytes_q2_k(raw: np.ndarray) -> Q2_KTensor:
    from .. import native

    if native.k16_available():
        return native.q2_k_from_aos(raw)
    raw = np.asarray(raw, np.uint8)
    n, nsb, bb = raw.shape
    assert bb == QK2_BLOCK_BYTES, bb
    scales = raw[:, :, 0:16]
    qs = raw[:, :, 16:80].astype(np.int32)
    d = raw[:, :, 80:82].copy().view(np.float16)[:, :, 0]
    dmin = raw[:, :, 82:84].copy().view(np.float16)[:, :, 0]
    q = ((qs[:, :, _Q2_BYTE] >> _Q2_SHIFT) & 3).astype(np.int8)
    return Q2_KTensor(
        d, dmin,
        (scales & 0xF).reshape(n, nsb * 16),
        (scales >> 4).reshape(n, nsb * 16),
        q.reshape(n, nsb * QK_K),
    )


def to_bytes_q2_k(t: Q2_KTensor) -> np.ndarray:
    n, k = t.qs.shape
    nsb = k // QK_K
    raw = np.zeros((n, nsb, QK2_BLOCK_BYTES), np.uint8)
    raw[:, :, 0:16] = (
        np.asarray(t.sc, np.uint8) | (np.asarray(t.mn, np.uint8) << 4)
    ).reshape(n, nsb, 16)
    q = np.asarray(t.qs, np.int32).reshape(n, nsb, QK_K)
    packed = np.zeros((n, nsb, 64), np.int32)
    np.add.at(packed.transpose(2, 0, 1), _Q2_BYTE,
              (q & 3).transpose(2, 0, 1) << _Q2_SHIFT[:, None, None])
    raw[:, :, 16:80] = packed.astype(np.uint8)
    raw[:, :, 80:82] = np.asarray(t.d, np.float16).reshape(n, nsb, 1).view(np.uint8)
    raw[:, :, 82:84] = np.asarray(t.dmin, np.float16).reshape(n, nsb, 1).view(np.uint8)
    return raw


def from_bytes_q3_k(raw: np.ndarray) -> Q3_KTensor:
    from .. import native

    if native.k16_available():
        return native.q3_k_from_aos(raw)
    raw = np.asarray(raw, np.uint8)
    n, nsb, bb = raw.shape
    assert bb == QK3_BLOCK_BYTES, bb
    hmask = raw[:, :, 0:32].astype(np.int32)
    qs = raw[:, :, 32:96].astype(np.int32)
    sc16 = (_q3_scales(raw[:, :, 96:108]) - 32).astype(np.int8)
    d = raw[:, :, 108:110].copy().view(np.float16)[:, :, 0]
    q = (qs[:, :, _Q2_BYTE] >> _Q2_SHIFT) & 3
    hbit = (hmask[:, :, _E % 32] >> (_E // 32)) & 1
    q = (q - np.where(hbit, 0, 4)).astype(np.int8)
    return Q3_KTensor(d, sc16.reshape(n, nsb * 16), q.reshape(n, nsb * QK_K))


def to_bytes_q3_k(t: Q3_KTensor) -> np.ndarray:
    n, k = t.qs.shape
    nsb = k // QK_K
    raw = np.zeros((n, nsb, QK3_BLOCK_BYTES), np.uint8)
    qshift = np.asarray(t.qs, np.int32).reshape(n, nsb, QK_K)
    hbit = (qshift >= 0).astype(np.int32)  # shifted >= 0 iff high bit set
    q2 = (qshift + np.where(hbit, 0, 4)) & 3
    packed = np.zeros((n, nsb, 64), np.int32)
    np.add.at(packed.transpose(2, 0, 1), _Q2_BYTE,
              q2.transpose(2, 0, 1) << _Q2_SHIFT[:, None, None])
    raw[:, :, 32:96] = packed.astype(np.uint8)
    hm = np.zeros((n, nsb, 32), np.int32)
    np.add.at(hm.transpose(2, 0, 1), _E % 32,
              hbit.transpose(2, 0, 1) << (_E // 32)[:, None, None])
    raw[:, :, 0:32] = hm.astype(np.uint8)
    # scales: inverse of _q3_scales (w0..w3 per llama.cpp kmask packing)
    sc = (np.asarray(t.sc, np.int32) + 32).reshape(n, nsb, 16)
    w0, w1, w2, w3 = sc[..., 0:4], sc[..., 4:8], sc[..., 8:12], sc[..., 12:16]
    s12 = np.zeros((n, nsb, 12), np.int32)
    s12[..., 0:4] = (w0 & 0xF) | ((w2 & 0xF) << 4)
    s12[..., 4:8] = (w1 & 0xF) | ((w3 & 0xF) << 4)
    s12[..., 8:12] = (
        (w0 >> 4) | ((w1 >> 4) << 2) | ((w2 >> 4) << 4) | ((w3 >> 4) << 6)
    )
    raw[:, :, 96:108] = s12.astype(np.uint8)
    raw[:, :, 108:110] = np.asarray(t.d, np.float16).reshape(n, nsb, 1).view(np.uint8)
    return raw


def dequantize_q2_k(t: Q2_KTensor) -> np.ndarray:
    return (np.repeat(t.scp, 16, axis=-1) * np.asarray(t.qs, np.float32)
            + np.repeat(t.mp, 16, axis=-1))


def dequantize_q3_k(t: Q3_KTensor) -> np.ndarray:
    return np.repeat(t.scp, 16, axis=-1) * np.asarray(t.qs, np.float32)


def gemm_k16_ref(t, a_q) -> np.ndarray:
    """Numpy golden for the per-16 native kernels (Q2_K/Q3_K/Q6_K):

    out[m,n] = sum_j scp[n,j] * d_a[m,j//2] * sumi16 [+ mp[n,j] * d_a[m,j//2]
    * sumq16] — exact int dots, f64 epilogue accumulation."""
    qa = np.asarray(a_q.qs, np.int32)
    m, k = qa.shape
    nj = k // 16
    qa3 = qa.reshape(m, nj, 16)
    qw3 = np.asarray(t.qs, np.int32).reshape(t.qs.shape[0], nj, 16)
    sumi = np.einsum("mji,nji->mnj", qa3, qw3).astype(np.float64)
    d_a = np.repeat(np.asarray(a_q.d, np.float32).astype(np.float64), 2, axis=-1)
    out = np.einsum("mnj,mj,nj->mn", sumi, d_a, t.scp.astype(np.float64))
    mp = getattr(t, "mp", None)
    if mp is not None:
        sumq = qa3.sum(-1).astype(np.float64)  # [m, nj]
        out = out + np.einsum("mj,mj,nj->mn", sumq, d_a, mp.astype(np.float64))
    return out.astype(np.float32)


def quantize_q6_k(x: np.ndarray) -> Q6_KTensor:
    """Format-exact Q6_K encoder (simplified two-level scale search).

    Per-16: float scale f = amax/31, then 8-bit sub-scale sc = rint(f/d)
    against the super-scale d = max|f|/127.  llama.cpp's make_qx_quants
    would search harder; decode of either's bytes is identical semantics.
    """
    x = np.asarray(x, np.float32)
    n, k = x.shape
    assert k % QK_K == 0, k
    g = x.reshape(n, k // 16, 16)
    f = np.abs(g).max(-1) / 31.0  # [n, k/16]
    d = f16_sat(f.reshape(n, -1, 16).max(-1) / 127.0)  # [n, k/256]
    d32 = np.repeat(d.astype(np.float32), 16, axis=-1)
    sc = np.where(d32 > 0, np.rint(f / np.where(d32 > 0, d32, 1.0)), 0.0)
    sc = sc.clip(0, 127).astype(np.int8)
    scp = d32 * sc.astype(np.float32)
    inv = np.where(scp > 0, 1.0 / np.where(scp > 0, scp, 1.0), 0.0)
    q = np.clip(np.rint(g * inv[..., None]), -32, 31).astype(np.int8)
    return Q6_KTensor(d, sc, q.reshape(n, k))


def quantize_q3_k(x: np.ndarray) -> Q3_KTensor:
    """Format-exact Q3_K encoder (simplified; codes in [-4, 3])."""
    x = np.asarray(x, np.float32)
    n, k = x.shape
    assert k % QK_K == 0, k
    g = x.reshape(n, k // 16, 16)
    f = np.abs(g).max(-1) / 4.0
    d = f16_sat(f.reshape(n, -1, 16).max(-1) / 31.0)
    d32 = np.repeat(d.astype(np.float32), 16, axis=-1)
    sc = np.where(d32 > 0, np.rint(f / np.where(d32 > 0, d32, 1.0)), 0.0)
    sc = sc.clip(-32, 31).astype(np.int8)
    scp = d32 * sc.astype(np.float32)
    inv = np.where(scp != 0, 1.0 / np.where(scp != 0, scp, 1.0), 0.0)
    q = np.clip(np.rint(g * inv[..., None]), -4, 3).astype(np.int8)
    return Q3_KTensor(d, sc, q.reshape(n, k))


def quantize_q2_k(x: np.ndarray) -> Q2_KTensor:
    """Format-exact Q2_K encoder (simplified; x ~ d*sc*q - dmin*mn)."""
    x = np.asarray(x, np.float32)
    n, k = x.shape
    assert k % QK_K == 0, k
    g = x.reshape(n, k // 16, 16)
    mn_f = np.minimum(g.min(-1), 0.0)  # llama.cpp clamps positive mins to 0
    sc_f = (g.max(-1) - mn_f) / 3.0
    d = f16_sat(sc_f.reshape(n, -1, 16).max(-1) / 15.0)
    dmin = f16_sat((-mn_f).reshape(n, -1, 16).max(-1) / 15.0)
    d32 = np.repeat(d.astype(np.float32), 16, axis=-1)
    dm32 = np.repeat(dmin.astype(np.float32), 16, axis=-1)
    sc = np.where(d32 > 0, np.rint(sc_f / np.where(d32 > 0, d32, 1.0)), 0.0)
    sc = sc.clip(0, 15).astype(np.uint8)
    mn = np.where(dm32 > 0, np.rint(-mn_f / np.where(dm32 > 0, dm32, 1.0)), 0.0)
    mn = mn.clip(0, 15).astype(np.uint8)
    scp = d32 * sc.astype(np.float32)
    mp = dm32 * mn.astype(np.float32)  # x ~ scp*q - mp
    inv = np.where(scp > 0, 1.0 / np.where(scp > 0, scp, 1.0), 0.0)
    q = np.clip(np.rint((g + mp[..., None]) * inv[..., None]), 0, 3)
    return Q2_KTensor(d, dmin, sc, mn, q.astype(np.int8).reshape(n, k))


#: Per-16-scale K-quant containers (served by kernels.gemm_exact_k16);
#: the single source of truth for type dispatch across the engine.
K16_TENSORS = (Q2_KTensor, Q3_KTensor, Q6_KTensor)

#: Container -> dequantizer (float32 [N, K]) for every K-quant SoA type.
DEQUANT = {
    Q4_KTensor: dequantize_q4_k,
    Q5_KTensor: dequantize_q5_k,
    Q2_KTensor: dequantize_q2_k,
    Q3_KTensor: dequantize_q3_k,
    Q6_KTensor: dequantize_q6_k,
}


# ---------------------------------------------------------------------------
# IQ4_NL (block_iq4_nl, 18 B per 32 elements): non-linear 4-bit via a fixed
# 16-entry int8 codebook.  x = d * KVALUES[q].  Not in the reference repo
# (an llama.cpp i-quant); supported because real HF GGUFs use it.  The
# codebook values are int8, so serving maps EXACTLY onto the q8_0 path:
# the loader expands codes through the LUT into a Q8_0Tensor (d f16 kept
# verbatim) and the exact int8-MXU kernel serves it unchanged.
# ---------------------------------------------------------------------------

IQ4_NL_BLOCK_BYTES = 18
KVALUES_IQ4NL = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89,
     113], np.int8)


def from_bytes_iq4_nl(raw: np.ndarray):
    """AoS uint8 [N, K/32, 18] -> Q8_0Tensor with LUT-expanded int8 codes
    (dequant q*d is bit-identical to llama.cpp dequantize_row_iq4_nl)."""
    from .blocks import Q8_0Tensor

    raw = np.asarray(raw, np.uint8)
    n, nb, bb = raw.shape
    assert bb == IQ4_NL_BLOCK_BYTES, bb
    d = raw[:, :, 0:2].copy().view(np.float16)[:, :, 0]
    qs = raw[:, :, 2:18].astype(np.uint8)
    lo = KVALUES_IQ4NL[qs & 0xF]  # elements 0..15 of each block
    hi = KVALUES_IQ4NL[qs >> 4]  # elements 16..31
    codes = np.concatenate([lo, hi], axis=-1).reshape(n, nb * QK)
    return Q8_0Tensor(codes, d)


def quantize_iq4_nl(x: np.ndarray) -> np.ndarray:
    """Format-exact IQ4_NL encoder -> AoS bytes [N, K/32, 18].

    Simplified scale fit (d = amax/127, nearest codebook value per code);
    llama.cpp's quantize_row_iq4_nl searches scale candidates — decode of
    either's bytes is identical semantics."""
    x = np.asarray(x, np.float32)
    n, k = x.shape
    assert k % QK == 0
    xb = x.reshape(n, k // QK, QK)
    amax = np.abs(xb).max(-1)
    d = f16_sat(amax / 127.0)
    inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1).astype(np.float32), 0.0)
    scaled = xb * inv[..., None]  # target codebook values
    q = np.abs(scaled[..., None] - KVALUES_IQ4NL.astype(np.float32)).argmin(-1)
    raw = np.zeros((n, k // QK, IQ4_NL_BLOCK_BYTES), np.uint8)
    raw[:, :, 0:2] = d.reshape(n, -1, 1).view(np.uint8)
    raw[:, :, 2:18] = (q[:, :, :16] | (q[:, :, 16:] << 4)).astype(np.uint8)
    return raw


def dequantize_iq4_nl_bytes(raw: np.ndarray) -> np.ndarray:
    t = from_bytes_iq4_nl(raw)
    return (np.asarray(t.qs, np.float32)
            * np.repeat(np.asarray(t.d, np.float32), QK, axis=-1))


# ---------------------------------------------------------------------------
# IQ4_XS (block_iq4_xs, 136 B per 256 elements): the super-block variant of
# IQ4_NL — per-32 6-bit sub-scales over the same 16-entry int8 codebook.
# x = d * (sc_j - 32) * KVALUES[q].  Served via the q8_0-style exact kernel
# with F32 effective per-32 scales (d*(sc-32) is not f16-representable).
# ---------------------------------------------------------------------------

IQ4_XS_BLOCK_BYTES = 136  # 2 d + 2 scales_h + 4 scales_l + 128 qs


class EffectiveQ80(NamedTuple):
    """q8_0-shaped view with f32 per-32 scales (IQ4_XS effective form);
    feeds gemm_pallas.prepare() / the exact kernel directly."""

    qs: np.ndarray  # i8 [N, K] codebook values
    d: np.ndarray  # f32 [N, K/32] effective scales

    spec = _EffSpec("iq4_xs", 8, False, False, 0)

    @property
    def k(self) -> int:
        return self.qs.shape[-1]


def _iq4xs_scales(raw: np.ndarray) -> np.ndarray:
    """[N, nsb, 136] bytes -> int32 [N, nsb, 8] 6-bit sub-scales minus 32."""
    sh = (raw[:, :, 2].astype(np.int32)
          | (raw[:, :, 3].astype(np.int32) << 8))  # u16 scales_h
    sl = raw[:, :, 4:8].astype(np.int32)  # 4 bytes of 4-bit pairs
    j = np.arange(8)
    lo = (sl[:, :, j // 2] >> (4 * (j % 2))) & 0xF
    hi = (sh[:, :, None] >> (2 * j)) & 3
    return (lo | (hi << 4)) - 32


def from_bytes_iq4_xs(raw: np.ndarray) -> EffectiveQ80:
    raw = np.asarray(raw, np.uint8)
    n, nsb, bb = raw.shape
    assert bb == IQ4_XS_BLOCK_BYTES, bb
    d = raw[:, :, 0:2].copy().view(np.float16).astype(np.float32)[:, :, 0]
    sc = _iq4xs_scales(raw)  # [n, nsb, 8]
    # per 32-element sub-block: 16 bytes, byte j holds elements j (lo
    # nibble) and j+16 (hi) — llama.cpp dequantize_row_iq4_xs
    qs = raw[:, :, 8:136].astype(np.uint8).reshape(n, nsb, 8, 16)
    lo = KVALUES_IQ4NL[qs & 0xF]
    hi = KVALUES_IQ4NL[qs >> 4]
    codes = np.concatenate([lo, hi], axis=-1).reshape(n, nsb, 256)
    eff = (d[:, :, None] * sc).reshape(n, nsb * 8)  # f32 per-32
    return EffectiveQ80(codes.reshape(n, nsb * QK_K), eff)


def dequantize_iq4_xs_bytes(raw: np.ndarray) -> np.ndarray:
    t = from_bytes_iq4_xs(raw)
    return (np.asarray(t.qs, np.float32)
            * np.repeat(t.d, QK, axis=-1))
