"""Jittable (jnp) quantize/dequantize for the block formats.

TPU analogue of the reference's GPU quantization kernels
(``include/quantize.h:221-368``): one fused XLA computation per tensor,
vectorized over all 32-element blocks at once instead of one CUDA thread per
block.  Semantics are identical to :mod:`quant_gemm_tpu.formats.numpy_ref`
(nearest-even rounding, f16 scale storage, llama.cpp-exact Q8_1 sum), and the
test suite asserts bit-equality between the two paths.

These run under ``jit`` and are the building blocks the model runtime uses to
quantize activations on the fly; the in-kernel (fused) Q8_1 activation
quantizer lives in :mod:`quant_gemm_tpu.kernels.gemm_exact` (fused variant)
and :mod:`quant_gemm_tpu.kernels.gemm_pallas` (``fused_quant=True``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import F16_MAX
from .blocks import (
    QK,
    Q4_0Tensor,
    Q4_1Tensor,
    Q5_0Tensor,
    Q5_1Tensor,
    Q8_0Tensor,
    Q8_1Tensor,
)

# ---------------------------------------------------------------------------
# planar packing (jnp mirrors of numpy_ref)
# ---------------------------------------------------------------------------


def pack_planar_4bit(q: jax.Array) -> jax.Array:
    k = q.shape[-1]
    lo = q[..., : k // 2].astype(jnp.uint8)
    hi = q[..., k // 2 :].astype(jnp.uint8)
    return (lo & 0x0F) | (hi << 4)


def unpack_planar_4bit(packed: jax.Array) -> jax.Array:
    return jnp.concatenate([packed & 0x0F, packed >> 4], axis=-1)


def pack_planar_bits(b: jax.Array) -> jax.Array:
    k = b.shape[-1]
    b = (b.astype(jnp.uint8) & 1).reshape(b.shape[:-1] + (k // 8, 8))
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return (b << shifts).sum(axis=-1).astype(jnp.uint8)


def unpack_planar_bits(packed: jax.Array) -> jax.Array:
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1
    return bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))


def _blocks(x: jax.Array) -> jax.Array:
    k = x.shape[-1]
    assert k % QK == 0, f"K={k} must be a multiple of {QK}"
    return x.reshape(x.shape[:-1] + (k // QK, QK)).astype(jnp.float32)


def _safe_inv(d_f16: jax.Array) -> jax.Array:
    d = d_f16.astype(jnp.float32)
    return jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)


def expand_scale(d: jax.Array) -> jax.Array:
    """Per-block scale [..., nb] -> per-element f32 [..., nb*32]."""
    d = d.astype(jnp.float32)
    return jnp.repeat(d, QK, axis=-1)


# ---------------------------------------------------------------------------
# quantize
# ---------------------------------------------------------------------------


def quantize_q4_0(x: jax.Array) -> Q4_0Tensor:
    xb = _blocks(x)
    amax = jnp.abs(xb).max(axis=-1)
    d = (amax / 7.0).clip(-F16_MAX, F16_MAX).astype(jnp.float16)
    q = jnp.clip(jnp.rint(xb * _safe_inv(d)[..., None]), -8, 7).astype(jnp.int8) + 8
    return Q4_0Tensor(pack_planar_4bit(q.reshape(x.shape)), d)


def quantize_q4_1(x: jax.Array) -> Q4_1Tensor:
    xb = _blocks(x)
    mn = xb.min(axis=-1)
    mx = xb.max(axis=-1)
    d = ((mx - mn) / 15.0).clip(-F16_MAX, F16_MAX).astype(jnp.float16)
    q = jnp.clip(jnp.rint((xb - mn[..., None]) * _safe_inv(d)[..., None]), 0, 15)
    return Q4_1Tensor(
        pack_planar_4bit(q.astype(jnp.uint8).reshape(x.shape)), d, mn.clip(-F16_MAX, F16_MAX).astype(jnp.float16)
    )


def quantize_q5_0(x: jax.Array) -> Q5_0Tensor:
    xb = _blocks(x)
    amax = jnp.abs(xb).max(axis=-1)
    d = (amax / 15.0).clip(-F16_MAX, F16_MAX).astype(jnp.float16)
    q = jnp.clip(jnp.rint(xb * _safe_inv(d)[..., None]) + 16, 0, 31).astype(jnp.uint8)
    q = q.reshape(x.shape)
    return Q5_0Tensor(pack_planar_4bit(q & 0x0F), pack_planar_bits(q >> 4), d)


def quantize_q5_1(x: jax.Array) -> Q5_1Tensor:
    xb = _blocks(x)
    mn = xb.min(axis=-1)
    mx = xb.max(axis=-1)
    d = ((mx - mn) / 31.0).clip(-F16_MAX, F16_MAX).astype(jnp.float16)
    q = jnp.clip(jnp.rint((xb - mn[..., None]) * _safe_inv(d)[..., None]), 0, 31)
    q = q.astype(jnp.uint8).reshape(x.shape)
    return Q5_1Tensor(
        pack_planar_4bit(q & 0x0F), pack_planar_bits(q >> 4), d, mn.clip(-F16_MAX, F16_MAX).astype(jnp.float16)
    )


def quantize_q8_0(x: jax.Array) -> Q8_0Tensor:
    xb = _blocks(x)
    amax = jnp.abs(xb).max(axis=-1)
    d = (amax / 127.0).clip(-F16_MAX, F16_MAX).astype(jnp.float16)
    q = jnp.clip(jnp.rint(xb * _safe_inv(d)[..., None]), -127, 127).astype(jnp.int8)
    return Q8_0Tensor(q.reshape(x.shape), d)


def quantize_q8_1(x: jax.Array) -> Q8_1Tensor:
    """Activation quantizer with the llama.cpp-exact s = f16(d * sum(q))."""
    xb = _blocks(x)
    amax = jnp.abs(xb).max(axis=-1)
    d = (amax / 127.0).clip(-F16_MAX, F16_MAX).astype(jnp.float16)
    q = jnp.clip(jnp.rint(xb * _safe_inv(d)[..., None]), -127, 127).astype(jnp.int8)
    sum_q = q.astype(jnp.int32).sum(axis=-1)
    s = (sum_q.astype(jnp.float32) * d.astype(jnp.float32)).clip(-F16_MAX, F16_MAX).astype(jnp.float16)
    return Q8_1Tensor(q.reshape(x.shape), d, s)


QUANTIZE = {
    "q4_0": quantize_q4_0,
    "q4_1": quantize_q4_1,
    "q5_0": quantize_q5_0,
    "q5_1": quantize_q5_1,
    "q8_0": quantize_q8_0,
    "q8_1": quantize_q8_1,
}


# ---------------------------------------------------------------------------
# codes + dequantize
# ---------------------------------------------------------------------------


def codes(t) -> jax.Array:
    """Raw stored integer codes ``int32[..., K]`` in natural order."""
    if isinstance(t, (Q4_0Tensor, Q4_1Tensor)):
        return unpack_planar_4bit(t.packed).astype(jnp.int32)
    if isinstance(t, (Q5_0Tensor, Q5_1Tensor)):
        lo = unpack_planar_4bit(t.packed).astype(jnp.int32)
        hi = unpack_planar_bits(t.qh).astype(jnp.int32)
        return lo | (hi << 4)
    if isinstance(t, (Q8_0Tensor, Q8_1Tensor)):
        return t.qs.astype(jnp.int32)
    raise TypeError(type(t))


def dequantize(t, dtype=jnp.float32) -> jax.Array:
    """Dequantize any block tensor to ``dtype`` (default f32)."""
    q = codes(t)
    spec = t.spec
    d = expand_scale(t.d)
    if spec.has_min:
        x = q.astype(jnp.float32) * d + expand_scale(t.m)
    else:
        x = (q - spec.offset).astype(jnp.float32) * d
    return x.astype(dtype)


def device_put(t_np):
    """Move a numpy SoA container onto the default JAX device unchanged."""
    return type(t_np)(*(jnp.asarray(a) for a in t_np))


__all__ = [
    "pack_planar_4bit",
    "unpack_planar_4bit",
    "pack_planar_bits",
    "unpack_planar_bits",
    "expand_scale",
    "quantize_q4_0",
    "quantize_q4_1",
    "quantize_q5_0",
    "quantize_q5_1",
    "quantize_q8_0",
    "quantize_q8_1",
    "QUANTIZE",
    "codes",
    "dequantize",
    "device_put",
]
