"""SiLU and GELU (reference kernels/activation/{silu,gelu}.cuh).

Semantics preserved exactly:

* ``silu(x) = x * sigmoid(x)``; ``silu_mul(x, gate) = silu(x) * gate`` — the
  fused llama FFN form (silu.cuh:23-173).
* ``gelu(x) = 0.5 x (1 + erf(x / sqrt(2)))`` — exact form (gelu.cuh:30-44).
* ``gelu_quick(x) = 0.5 x (1 + tanh(sqrt(2/pi) x (1 + 0.044715 x^2)))`` —
  the llama.cpp-compatible tanh approximation (gelu.cuh:46-53), constants
  GELU_COEF_A = 0.044715, SQRT_2_OVER_PI = 0.7978845608028654.

The reference's scalar/vec4/fp16 CUDA kernel variants collapse into single
fused XLA computations on TPU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

GELU_COEF_A = 0.044715
SQRT_2_OVER_PI = 0.7978845608028654


def silu(x):
    return x * jax.nn.sigmoid(x)


def silu_mul(x, gate):
    """Fused SiLU(x) * gate — the llama FFN activation (silu.cuh:118-173)."""
    return silu(x) * gate


def gelu(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x * (1.0 / np.sqrt(2.0).astype(np.float32))))


def gelu_quick(x):
    return 0.5 * x * (1.0 + jnp.tanh(SQRT_2_OVER_PI * x * (1.0 + GELU_COEF_A * x * x)))


# --- numpy references (independent scalar math) ---

_erf_vec = np.vectorize(math.erf)


def silu_ref(x):
    x = np.asarray(x, np.float32)
    return x / (1.0 + np.exp(-x))


def silu_mul_ref(x, gate):
    return silu_ref(x) * np.asarray(gate, np.float32)


def gelu_ref(x):
    x = np.asarray(x, np.float32)
    return (0.5 * x * (1.0 + _erf_vec(x / math.sqrt(2.0)))).astype(np.float32)


def gelu_quick_ref(x):
    x = np.asarray(x, np.float32)
    return 0.5 * x * (1.0 + np.tanh(SQRT_2_OVER_PI * x * (1.0 + GELU_COEF_A * x * x)))


__all__ = [
    "silu",
    "silu_mul",
    "gelu",
    "gelu_quick",
    "silu_ref",
    "silu_mul_ref",
    "gelu_ref",
    "gelu_quick_ref",
    "GELU_COEF_A",
    "SQRT_2_OVER_PI",
]
