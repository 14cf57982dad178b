"""Elementwise ops (reference kernels/elementwise/elementwise.cuh:22-331).

On TPU these are single fused XLA computations; the reference's scalar /
vec4 / inplace / fp16 CUDA variants collapse into one jnp expression each
(XLA vectorizes and fuses automatically — there is nothing to hand-tune for
a pure streaming op).  Numpy references included for the differential
harness.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def add(x, y):
    return jnp.add(x, y)


def mul(x, y):
    return jnp.multiply(x, y)


def scale(x, s: float):
    return x * s


def add_scale(x, y, s: float):
    """Residual update: x + s * y (reference add_scale kernels)."""
    return x + s * y


def add_ref(x, y):
    return np.asarray(x, np.float32) + np.asarray(y, np.float32)


def mul_ref(x, y):
    return np.asarray(x, np.float32) * np.asarray(y, np.float32)


def scale_ref(x, s):
    return np.asarray(x, np.float32) * np.float32(s)


def add_scale_ref(x, y, s):
    return np.asarray(x, np.float32) + np.float32(s) * np.asarray(y, np.float32)


__all__ = ["add", "mul", "scale", "add_scale", "add_ref", "mul_ref", "scale_ref", "add_scale_ref"]
