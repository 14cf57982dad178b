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

The ENCODER here is format-exact but deliberately simple (per-sub-block
min/max, 6-bit rounding of scales) — llama.cpp's ``make_qkx2_quants``
search would produce slightly different codes; decode of any llama.cpp-
produced bytes is bit-exact.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

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


def quantize_q4_k(x: np.ndarray) -> Q4_KTensor:
    """float [N, K] -> Q4_K (K % 256 == 0)."""
    x = np.asarray(x, np.float32)
    n, k = x.shape
    assert k % QK_K == 0, k
    xs = x.reshape(n, k // QK, QK)  # per sub-block
    mn = np.minimum(xs.min(axis=2), 0.0)  # mins stored positive: m = -mn
    mx = xs.max(axis=2)
    scale = (mx - mn) / 15.0  # [N, nb]
    minv = -mn

    sup_scale = scale.reshape(n, -1, NSB).max(axis=2)  # [N, nsb]
    sup_min = minv.reshape(n, -1, NSB).max(axis=2)
    d = (sup_scale / 63.0).astype(np.float16)
    dmin = (sup_min / 63.0).astype(np.float16)
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
    """AoS uint8 [N, K/256, 144] -> SoA (accepts llama.cpp-written bytes)."""
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


__all__ = [
    "QK_K",
    "BLOCK_BYTES",
    "Q4_KTensor",
    "EffectiveQ41",
    "quantize_q4_k",
    "dequantize_q4_k",
    "to_effective",
    "to_bytes",
    "from_bytes",
]


# ---------------------------------------------------------------------------
# Q6_K: decode-only support (block_q6_K, 210 B per 256 elements)
#
# Real Q4_K_M GGUF models store a few tensors (typically output.weight) as
# Q6_K.  Its scales are per-16 (not per-32), so it does not map onto the
# per-32 kernel ladder; the loader decodes it byte-exactly and re-quantizes
# to a serving format (q8_0 preserves its accuracy class).
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
