"""Shared numeric helpers for the TPU quantized-GEMM engine.

Conventions (fixed project-wide, see docs/CONVENTIONS.md):

* GEMM: ``C[M, N] = A[M, K] @ W[N, K]^T`` where M = tokens (batch/sequence),
  N = output features, K = reduction.  This resolves the dual-convention
  hazard documented in the reference (MNK_DEFINITION_ANALYSIS.md): the
  reference's optimized kernels put weights first with M = out-features;
  adapters in :mod:`quant_gemm_tpu.api` translate.
* Rounding: round-half-to-even everywhere (numpy/jnp default, and what
  llama.cpp's CUDA quantizers use via ``__float2int_rn``).  The reference's
  CPU paths use C ``roundf`` (half away from zero); we standardize on
  nearest-even and document the divergence (reference include/quantize.h:59
  vs :250 mixes both).
* Scales are stored as IEEE float16 for byte-compat with llama.cpp block
  structs, upcast to float32 at kernel entry.
"""

from __future__ import annotations

import numpy as np


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m``."""
    return cdiv(x, m) * m


def round_nearest_even(x):
    """Round half to even, returning an integer-valued array of x's dtype.

    Matches CUDA ``__float2int_rn`` / numpy ``rint`` semantics, which is what
    llama.cpp uses when quantizing on-GPU.
    """
    return np.rint(x)


def f16(x):
    """Cast to float16 (the storage dtype of all block scales)."""
    return np.asarray(x, dtype=np.float16)


#: Largest finite float16 value — the saturation bound for stored scales.
F16_MAX = 65504.0


def f16_sat(x):
    """Saturating cast to float16 (degenerate-block policy).

    Project policy (docs/CONVENTIONS.md "Degenerate blocks"): f16-stored
    block values (``d``/``m``/``s``) **saturate** to ±65504 instead of
    overflowing to inf — an inf scale turns ``0 * inf`` into NaN in the f32
    epilogues, poisoning whole output tiles.  llama.cpp's plain f16 cast has
    the inf cliff (same storage, no guard); any input whose scales fit f16
    is bit-identical to the unsaturated cast.
    """
    return np.asarray(np.clip(x, -F16_MAX, F16_MAX), dtype=np.float16)


__all__ = ["cdiv", "round_up", "round_nearest_even", "f16", "F16_MAX", "f16_sat"]
