"""llama.cpp 32-element block-quantization formats, TPU-native representation.

The reference (``compat/ggml_types.h:32-299``) defines six AoS block structs:

======  =====  ======================================================
format  bytes  contents per 32-element block
======  =====  ======================================================
q4_0      18   d: f16, qs: 16 B  (nibble j = x[j], nibble j+16 high)
q4_1      20   d: f16, m: f16, qs: 16 B
q5_0      22   d: f16, qh: 4 B (5th bits), qs: 16 B
q5_1      24   d: f16, m: f16, qh: 4 B, qs: 16 B
q8_0      34   d: f16, qs: 32 x int8
q8_1      36   ds: (d, s) f16x2, qs: 32 x int8
======  =====  ======================================================

The TPU build stores quantized tensors as **struct-of-arrays pytrees** with a
*planar* packed layout designed for lane-aligned unpacking on the VPU:

* 4/5-bit ``packed``: ``uint8[..., K/2]`` where byte ``c`` holds ``x[c]`` in
  the low nibble and ``x[c + K/2]`` in the high nibble — the nibble split is
  at the *row* level, not per 32-block, so ``packed & 0xF`` yields the first
  half of the row and ``packed >> 4`` the second half, both in natural K
  order.  Concatenation along the lane axis is lane-aligned whenever
  ``K/2 % 128 == 0``; no sub-lane shuffles are ever needed in a kernel.
* ``q5_x`` 5th bits: ``uint8[..., K/8]`` planar, bit ``c % 8`` of byte
  ``c // 8`` is the high bit of ``x[c]`` (natural order).
* scales ``d`` (and ``m``/``s``): ``float16[..., K/32]`` — fp16 storage for
  byte-compat with llama.cpp, upcast to f32 at kernel entry.

The 18/20/22/24/34/36-byte AoS layout exists only at the GGUF import/export
boundary (:mod:`quant_gemm_tpu.formats.gguf`), byte-exact against the
reference structs.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

QK = 32  # block size shared by all six formats (reference QK4_0..QK8_1)


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static metadata for one block format (reference get_block_size/bytes)."""

    name: str
    block_bytes: int  # serialized AoS bytes per 32-element block
    bits: int  # bits per quantized value (before scales)
    has_min: bool  # asymmetric (q4_1/q5_1): stores m = min
    has_sum: bool  # q8_1: stores s = d * sum(q)
    offset: int  # value subtracted at dequant (q4_0: 8, q5_0: 16, else 0)
    qmax: int  # max stored code

    @property
    def bytes_per_elem(self) -> float:
        return self.block_bytes / QK


Q4_0 = QuantSpec("q4_0", 18, 4, has_min=False, has_sum=False, offset=8, qmax=15)
Q4_1 = QuantSpec("q4_1", 20, 4, has_min=True, has_sum=False, offset=0, qmax=15)
Q5_0 = QuantSpec("q5_0", 22, 5, has_min=False, has_sum=False, offset=16, qmax=31)
Q5_1 = QuantSpec("q5_1", 24, 5, has_min=True, has_sum=False, offset=0, qmax=31)
Q8_0 = QuantSpec("q8_0", 34, 8, has_min=False, has_sum=False, offset=0, qmax=127)
Q8_1 = QuantSpec("q8_1", 36, 8, has_min=False, has_sum=True, offset=0, qmax=127)

SPECS = {s.name: s for s in (Q4_0, Q4_1, Q5_0, Q5_1, Q8_0, Q8_1)}


class Q4_0Tensor(NamedTuple):
    """Q4_0: symmetric 4-bit, d = amax/7, dequant x = (q - 8) * d."""

    packed: object  # uint8[..., K/2] planar
    d: object  # float16[..., K/32]

    spec = Q4_0

    @property
    def k(self) -> int:
        return self.packed.shape[-1] * 2


class Q4_1Tensor(NamedTuple):
    """Q4_1: asymmetric 4-bit, d = (max-min)/15, dequant x = q * d + m."""

    packed: object
    d: object
    m: object  # float16[..., K/32]

    spec = Q4_1

    @property
    def k(self) -> int:
        return self.packed.shape[-1] * 2


class Q5_0Tensor(NamedTuple):
    """Q5_0: symmetric 5-bit, d = amax/15, dequant x = (q - 16) * d."""

    packed: object  # low 4 bits, planar
    qh: object  # uint8[..., K/8] planar 5th bits
    d: object

    spec = Q5_0

    @property
    def k(self) -> int:
        return self.packed.shape[-1] * 2


class Q5_1Tensor(NamedTuple):
    """Q5_1: asymmetric 5-bit, d = (max-min)/31, dequant x = q * d + m."""

    packed: object
    qh: object
    d: object
    m: object

    spec = Q5_1

    @property
    def k(self) -> int:
        return self.packed.shape[-1] * 2


class Q8_0Tensor(NamedTuple):
    """Q8_0: symmetric 8-bit, d = amax/127, dequant x = q * d."""

    qs: object  # int8[..., K]
    d: object

    spec = Q8_0

    @property
    def k(self) -> int:
        return self.qs.shape[-1]


class Q8_1Tensor(NamedTuple):
    """Q8_1 (activations): like Q8_0 plus per-block s = f16(d * sum(q)).

    ``s`` follows the llama.cpp-exact semantics (reference
    tests/framework/test_framework.cuh:213-223), NOT the tutorial's
    sum-of-floats variant (include/quantize.h:174-184); see SURVEY §2.1.
    """

    qs: object
    d: object
    s: object  # float16[..., K/32]

    spec = Q8_1

    @property
    def k(self) -> int:
        return self.qs.shape[-1]


WEIGHT_TENSOR_TYPES = {
    "q4_0": Q4_0Tensor,
    "q4_1": Q4_1Tensor,
    "q5_0": Q5_0Tensor,
    "q5_1": Q5_1Tensor,
    "q8_0": Q8_0Tensor,
}

TENSOR_TYPES = dict(WEIGHT_TENSOR_TYPES, q8_1=Q8_1Tensor)
