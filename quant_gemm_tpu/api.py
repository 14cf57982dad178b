"""Drop-in ``quant_gemm``-compatible Python API.

Mirrors the reference's PyTorch extension surface
(python/quant_gemm/__init__.py:33-102 + csrc/bindings.cpp:19-91): quantized
tensors cross this boundary as **uint8 AoS block bytes** with shapes
``[..., K/32, 18]`` (Q4_0) / ``[..., K/32, 36]`` (Q8_1), and the GEMM uses
the reference's *weight-first* convention::

    gemm_q4_0_q8_1(weight_q, activation_q, M, N, K) -> [M, N]
    # M = weight rows (out-features), N = activation rows (batch)

Internally everything converts to the SoA planar containers and runs on the
TPU kernel ladder (framework-native code should use those directly; this
module exists so reference users can port scripts unchanged).

Input arrays may be numpy, jax, or **torch** tensors (the reference's API is
a PyTorch extension — torch in means torch comes back out); numpy/jax inputs
return numpy (quantize/dequantize) or jax (gemm) arrays as before.
"""

from __future__ import annotations

import numpy as np

from .formats import gguf, numpy_ref
from .formats.blocks import QK, SPECS
from .kernels import dispatch


def _is_torch(x) -> bool:
    return type(x).__module__.partition(".")[0] == "torch"


def _as_array(x) -> np.ndarray:
    """numpy | jax | torch -> numpy (zero-copy where the backend allows)."""
    if _is_torch(x):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _wrap(out, *inputs):
    """Return torch if any input was torch, else the array unchanged."""
    if any(_is_torch(x) for x in inputs):
        import torch

        arr = np.ascontiguousarray(np.asarray(out))
        if not arr.flags.writeable:  # jax arrays are read-only views;
            arr = arr.copy()         # torch tensors must own writable memory
        return torch.from_numpy(arr)
    return out

BLOCK_Q4_0_BYTES = 18
BLOCK_Q8_1_BYTES = 36
QK4_0 = QK
QK8_1 = QK


def _check_k(x, what: str) -> int:
    k = x.shape[-1]
    if k % QK:
        raise ValueError(f"{what}: last dim K={k} must be divisible by {QK}")
    return k


def quantize(x, qtype: str) -> np.ndarray:
    """Quantize float ``[..., K]`` to AoS block bytes ``[..., K/32, B]``."""
    if qtype not in SPECS:
        raise ValueError(f"unknown quant type {qtype!r}; have {sorted(SPECS)}")
    xa = _as_array(x).astype(np.float32)
    _check_k(xa, f"quantize_{qtype}")
    return _wrap(gguf.to_bytes(numpy_ref.QUANTIZE[qtype](xa)), x)


def quantize_q4_0(x) -> np.ndarray:
    """FP32 [..., K] -> uint8 [..., K/32, 18] (reference __init__.py:33-43)."""
    return quantize(x, "q4_0")


def quantize_q8_1(x) -> np.ndarray:
    """FP32 [..., K] -> uint8 [..., K/32, 36] (reference __init__.py:46-56)."""
    return quantize(x, "q8_1")


def dequantize(x_q, qtype: str, K: int) -> np.ndarray:
    spec = SPECS[qtype]
    xa = _as_array(x_q)
    if xa.dtype != np.uint8:
        raise ValueError(f"dequantize_{qtype}: expected uint8, got {xa.dtype}")
    if xa.shape[-2:] != (K // QK, spec.block_bytes):
        raise ValueError(
            f"dequantize_{qtype}: expected [..., {K // QK}, {spec.block_bytes}], "
            f"got {xa.shape}"
        )
    return _wrap(numpy_ref.dequantize(gguf.from_bytes(xa, qtype)), x_q)


def dequantize_q4_0(x_q, K: int) -> np.ndarray:
    """uint8 [..., K/32, 18] -> FP32 [..., K] (reference __init__.py:78-89)."""
    return dequantize(x_q, "q4_0", K)


def gemm_q4_0_q8_1(weight_q, activation_q, M: int, N: int, K: int):
    """C[M, N] = W[M, K] @ A[N, K]^T, reference convention (M = out-features).

    Validation mirrors bindings.cpp:49-91 (numel/shape/dtype checks).
    """
    w_in, a_in = weight_q, activation_q
    weight_q = _as_array(weight_q)
    activation_q = _as_array(activation_q)
    nb = K // QK
    if weight_q.dtype != np.uint8 or activation_q.dtype != np.uint8:
        raise ValueError("gemm_q4_0_q8_1: block tensors must be uint8")
    if weight_q.size != M * nb * BLOCK_Q4_0_BYTES:
        raise ValueError(
            f"weight numel {weight_q.size} != M*(K/32)*18 = {M * nb * BLOCK_Q4_0_BYTES}"
        )
    if activation_q.size != N * nb * BLOCK_Q8_1_BYTES:
        raise ValueError(
            f"activation numel {activation_q.size} != N*(K/32)*36 = "
            f"{N * nb * BLOCK_Q8_1_BYTES}"
        )
    w = gguf.from_bytes(weight_q.reshape(M, nb, BLOCK_Q4_0_BYTES), "q4_0")
    a = gguf.from_bytes(activation_q.reshape(N, nb, BLOCK_Q8_1_BYTES), "q8_1")
    # project convention is activation-first: C_proj[N, M]; transpose back.
    out = dispatch(w, a)
    return _wrap(out.T, w_in, a_in)


__all__ = [
    "quantize",
    "quantize_q4_0",
    "quantize_q8_1",
    "dequantize",
    "dequantize_q4_0",
    "gemm_q4_0_q8_1",
    "QK4_0",
    "QK8_1",
    "BLOCK_Q4_0_BYTES",
    "BLOCK_Q8_1_BYTES",
]
