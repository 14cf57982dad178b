"""RMSNorm (reference kernels/normalization/rms_norm.cuh:32-292).

``y = x / sqrt(mean(x^2) + eps) * weight``, eps default 1e-5.

Two device paths:

* :func:`rms_norm` — jnp (XLA fuses the reduction + scale into one pass);
* :func:`rms_norm_pallas` — fused single-kernel Pallas variant (the
  block-per-row CUDA kernel analogue): grid over row tiles, full row in
  VMEM, VPU reduction.  Useful when fusing with neighbours manually.

The CPU reference accumulates the square sum in f64 exactly like the
reference's ``rms_norm_cpu_f32`` (rms_norm.cuh:44-48).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import round_up

EPS_DEFAULT = 1e-5


def rms_norm(x, weight, eps: float = EPS_DEFAULT):
    """y[r, :] = x[r, :] * rsqrt(mean(x[r]^2) + eps) * weight."""
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(ms + eps) * weight.astype(jnp.float32)).astype(x.dtype)


def _rms_kernel(x_ref, w_ref, o_ref, *, eps: float, n_cols: int):
    x = x_ref[:].astype(jnp.float32)
    ms = jnp.sum(x * x, axis=-1, keepdims=True) / float(n_cols)
    o_ref[:] = (x * jax.lax.rsqrt(ms + eps) * w_ref[:].astype(jnp.float32)).astype(
        o_ref.dtype
    )


def rms_norm_pallas(x, weight, eps: float = EPS_DEFAULT, block_rows: int = 256,
                    interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows, n = x.shape
    rp = round_up(rows, 8)
    br = min(block_rows, rp)
    rp = round_up(rp, br)
    if rp != rows:
        x = jnp.pad(x, ((0, rp - rows), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps, n_cols=n),
        grid=(rp // br,),
        in_specs=[
            pl.BlockSpec((br, n), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, n), lambda r: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, n), x.dtype),
        interpret=interpret,
    )(x, weight.reshape(1, n))
    return out[:rows]


def rms_norm_ref(x, weight, eps: float = EPS_DEFAULT):
    x = np.asarray(x, np.float32)
    ss = (x.astype(np.float64) ** 2).sum(axis=-1, keepdims=True)
    rms = np.sqrt((ss / x.shape[-1]).astype(np.float32) + np.float32(eps))
    return x / rms * np.asarray(weight, np.float32)


__all__ = ["rms_norm", "rms_norm_pallas", "rms_norm_ref", "EPS_DEFAULT"]
