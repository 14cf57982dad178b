"""Byte-exact AoS (llama.cpp / GGUF) boundary for the block formats.

Serializes the SoA planar containers to the exact byte layout of the
reference's structs (``compat/ggml_types.h:62-196``):

* ``block_q4_0`` (18 B): ``d`` f16 LE, ``qs[16]`` with ``qs[j] = x[j] |
  (x[j+16] << 4)`` — the per-block i/i+16 nibble interleave.
* ``block_q4_1`` (20 B): ``d``, ``m``, ``qs[16]``.
* ``block_q5_0`` (22 B): ``d``, ``qh`` LE u32 (bit c = 5th bit of x[c]),
  ``qs[16]``.
* ``block_q5_1`` (24 B): ``d``, ``m``, ``qh``, ``qs[16]``.
* ``block_q8_0`` (34 B): ``d``, ``qs[32]`` int8 sequential.
* ``block_q8_1`` (36 B): ``ds = (d, s)`` f16x2, ``qs[32]``.

``to_bytes``/``from_bytes`` return/accept ``uint8[..., nb, block_bytes]``
arrays, so real GGUF weight data round-trips unchanged.  Struct-size
equality with the reference is asserted by tests/test_formats.py.
"""

from __future__ import annotations

import numpy as np

from .blocks import QK, SPECS, Q4_0Tensor, Q4_1Tensor, Q5_0Tensor, Q5_1Tensor, Q8_0Tensor, Q8_1Tensor
from .numpy_ref import (
    codes,
    pack_planar_4bit,
    pack_planar_bits,
)


def _f16_bytes(d: np.ndarray) -> np.ndarray:
    """float16[..., nb] -> uint8[..., nb, 2] little-endian."""
    return np.ascontiguousarray(d.astype("<f2")).view(np.uint8).reshape(d.shape + (2,))


def _bytes_f16(b: np.ndarray) -> np.ndarray:
    """uint8[..., nb, 2] -> float16[..., nb]."""
    return np.ascontiguousarray(b).view("<f2").reshape(b.shape[:-1])


def _interleave_nibbles(q: np.ndarray) -> np.ndarray:
    """codes uint8[..., nb, 32] -> AoS qs uint8[..., nb, 16] (low=x[j], high=x[j+16])."""
    lo = q[..., :16] & 0x0F
    hi = q[..., 16:] & 0x0F
    return (lo | (hi << 4)).astype(np.uint8)


def _deinterleave_nibbles(qs: np.ndarray) -> np.ndarray:
    """AoS qs uint8[..., nb, 16] -> codes uint8[..., nb, 32] natural order."""
    return np.concatenate([qs & 0x0F, qs >> 4], axis=-1)


def _qh_bytes(q: np.ndarray) -> np.ndarray:
    """5-bit codes [..., nb, 32] -> qh uint8[..., nb, 4] (LE u32, bit c = x[c] bit 4)."""
    bits = ((q >> 4) & 1).astype(np.uint8).reshape(q.shape[:-1] + (4, 8))
    shifts = np.arange(8, dtype=np.uint8)
    return (bits << shifts).sum(axis=-1).astype(np.uint8)


def _bytes_qh(qh: np.ndarray) -> np.ndarray:
    """qh uint8[..., nb, 4] -> high bits uint8[..., nb, 32]."""
    shifts = np.arange(8, dtype=np.uint8)
    bits = (qh[..., None] >> shifts) & 1
    return bits.reshape(qh.shape[:-1] + (32,))


def _block_codes(t) -> np.ndarray:
    """SoA container -> per-block codes uint8[..., nb, 32]."""
    q = codes(t).astype(np.uint8)
    return q.reshape(q.shape[:-1] + (q.shape[-1] // QK, QK))


def to_bytes(t) -> np.ndarray:
    """Serialize a SoA container to AoS block bytes ``uint8[..., nb, B]``."""
    q = _block_codes(t)
    d = _f16_bytes(np.asarray(t.d))
    name = t.spec.name
    if name == "q4_0":
        return np.concatenate([d, _interleave_nibbles(q)], axis=-1)
    if name == "q4_1":
        m = _f16_bytes(np.asarray(t.m))
        return np.concatenate([d, m, _interleave_nibbles(q)], axis=-1)
    if name == "q5_0":
        return np.concatenate([d, _qh_bytes(q), _interleave_nibbles(q)], axis=-1)
    if name == "q5_1":
        m = _f16_bytes(np.asarray(t.m))
        return np.concatenate([d, m, _qh_bytes(q), _interleave_nibbles(q)], axis=-1)
    if name == "q8_0":
        return np.concatenate([d, q.view(np.uint8)], axis=-1)
    if name == "q8_1":
        s = _f16_bytes(np.asarray(t.s))
        return np.concatenate([d, s, q.view(np.uint8)], axis=-1)
    raise ValueError(name)


def from_bytes(raw: np.ndarray, qtype: str):
    """Parse AoS block bytes ``uint8[..., nb, B]`` into a SoA container."""
    spec = SPECS[qtype]
    raw = np.asarray(raw, dtype=np.uint8)
    assert raw.shape[-1] == spec.block_bytes, (raw.shape, spec.block_bytes)
    nb = raw.shape[-2]
    k = nb * QK
    lead = raw.shape[:-2]

    def flat(q_blocks: np.ndarray) -> np.ndarray:
        return q_blocks.reshape(lead + (k,))

    d = _bytes_f16(raw[..., 0:2])
    if qtype == "q4_0":
        q = flat(_deinterleave_nibbles(raw[..., 2:18]))
        return Q4_0Tensor(pack_planar_4bit(q), d)
    if qtype == "q4_1":
        m = _bytes_f16(raw[..., 2:4])
        q = flat(_deinterleave_nibbles(raw[..., 4:20]))
        return Q4_1Tensor(pack_planar_4bit(q), d, m)
    if qtype == "q5_0":
        hi = _bytes_qh(raw[..., 2:6])
        q = _deinterleave_nibbles(raw[..., 6:22]) | (hi << 4)
        q = flat(q)
        return Q5_0Tensor(pack_planar_4bit(q & 0x0F), pack_planar_bits(q >> 4), d)
    if qtype == "q5_1":
        m = _bytes_f16(raw[..., 2:4])
        hi = _bytes_qh(raw[..., 4:8])
        q = _deinterleave_nibbles(raw[..., 8:24]) | (hi << 4)
        q = flat(q)
        return Q5_1Tensor(pack_planar_4bit(q & 0x0F), pack_planar_bits(q >> 4), d, m)
    if qtype == "q8_0":
        qs = flat(raw[..., 2:34].view(np.int8))
        return Q8_0Tensor(qs, d)
    if qtype == "q8_1":
        s = _bytes_f16(raw[..., 2:4])
        qs = flat(raw[..., 4:36].view(np.int8))
        return Q8_1Tensor(qs, d, s)
    raise ValueError(qtype)


__all__ = ["to_bytes", "from_bytes"]
