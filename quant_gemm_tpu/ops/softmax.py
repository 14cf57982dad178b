"""Softmax with optional causal masking (reference kernels/attention/softmax.cuh).

Row-wise numerically stable softmax: max-subtract, exp, normalize
(softmax.cuh:31-120).  The causal variant reproduces the reference's
semantics (softmax.cuh:203-316): scores are pre-scaled by ``scale``, only
positions ``< valid_len = min(pos + 1, n_cols)`` participate, and masked
positions are written as exact zeros.

The reference's block-per-row / single-warp small-row kernel split is an
XLA fusion decision on TPU; a fused Pallas variant is provided for the
ladder and for manual fusion into attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import round_up


def softmax(x, axis: int = -1):
    x32 = x.astype(jnp.float32)
    m = jnp.max(x32, axis=axis, keepdims=True)
    e = jnp.exp(x32 - m)
    return (e / jnp.sum(e, axis=axis, keepdims=True)).astype(x.dtype)


def softmax_causal(x, pos, scale: float = 1.0):
    """Causal-masked scaled softmax over the last axis.

    ``pos``: current position (int or [rows] int array); positions
    ``> pos`` are masked out and written as 0 (softmax.cuh:216-260).
    """
    x32 = x.astype(jnp.float32) * scale
    n = x.shape[-1]
    idx = jnp.arange(n)
    pos = jnp.asarray(pos)
    valid = idx[None, :] <= pos[..., None]  # valid_len = pos + 1
    neg = jnp.finfo(jnp.float32).min
    masked = jnp.where(valid, x32, neg)
    m = jnp.max(masked, axis=-1, keepdims=True)
    e = jnp.where(valid, jnp.exp(masked - m), 0.0)
    return (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)


def _softmax_kernel(x_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    o_ref[:] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(o_ref.dtype)


def softmax_pallas(x, block_rows: int = 256, interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows, n = x.shape
    rp = round_up(rows, 8)
    br = min(block_rows, rp)
    rp = round_up(rp, br)
    if rp != rows:
        x = jnp.pad(x, ((0, rp - rows), (0, 0)))
    out = pl.pallas_call(
        _softmax_kernel,
        grid=(rp // br,),
        in_specs=[pl.BlockSpec((br, n), lambda r: (r, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, n), lambda r: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, n), x.dtype),
        interpret=interpret,
    )(x)
    return out[:rows]


def softmax_ref(x):
    x = np.asarray(x, np.float32)
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


def softmax_causal_ref(x, pos, scale: float = 1.0):
    x = np.asarray(x, np.float32) * np.float32(scale)
    out = np.zeros_like(x)
    pos = np.broadcast_to(np.asarray(pos), x.shape[:-1])
    n = x.shape[-1]
    for r in np.ndindex(x.shape[:-1]):
        valid = min(int(pos[r]) + 1, n)
        row = x[r][:valid]
        e = np.exp(row - row.max())
        out[r][:valid] = e / e.sum()
    return out


__all__ = [
    "softmax",
    "softmax_causal",
    "softmax_pallas",
    "softmax_ref",
    "softmax_causal_ref",
]
