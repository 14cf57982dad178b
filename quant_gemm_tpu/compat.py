"""llama.cpp / ggml compatibility adapter.

TPU-native analogue of the reference's two adapter layers:

* ``include/llama_adapter.h:49-137`` — ggml_tensor -> (M, N, K) extraction
  (``ne[0] = K``, ``ne[1] = rows``) and ``gemm_*_from_ggml`` entry points
  with a kernel-name string selector ("naive"/"tiled"/"dp4a" there;
  the registry ladder names here);
* ``compat/ggml_cuda_compat.cuh:41-271`` — drop-in ``ggml_cuda_op_*``
  operators that unpack ggml ``op_params`` exactly like llama.cpp.

Here the ggml boundary is the GGUF container (the CUDA-specific tensor
structs do not exist on TPU): :class:`GGMLTensorView` carries the same
``ne``/type/data contract, built from :class:`~..formats.gguf_file.GGUFFile`
entries or raw AoS bytes, and the ``ggml_op_*`` functions mirror the ggml
operator semantics (rms_norm does NOT multiply the weight — that is a
separate ggml mul, exactly as in llama.cpp).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .formats import gguf as gguf_blocks
from .formats.blocks import QK, SPECS
from .kernels import registry
from .kernels import gemm_pallas
from .ops.activations import gelu_quick as _gelu_quick, silu as _silu
from .ops.rope import rope as _rope
from .ops.softmax import softmax as _softmax


# ---------------------------------------------------------------------------
# tensor view + GEMM entry points (llama_adapter.h analogue)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GGMLTensorView:
    """A ggml-convention tensor: ``ne[0]`` = innermost (K), ``ne[1]`` = rows.

    ``data`` is the AoS byte stream for quantized types (bit-identical to
    ggml's block structs) or a float ndarray for f32/f16.
    """

    name: str
    qtype: str  # "q4_0" .. "q8_1", "f32", "f16"
    ne: tuple  # ggml dim order: (K, rows, ...)
    data: Any

    @property
    def k(self) -> int:
        return int(self.ne[0])

    @property
    def rows(self) -> int:
        return int(np.prod(self.ne[1:])) if len(self.ne) > 1 else 1

    def to_soa(self):
        """AoS bytes -> SoA container (float tensors pass through)."""
        if self.qtype in ("f32", "f16"):
            return np.asarray(self.data, np.float32).reshape(self.rows, self.k)
        spec = SPECS[self.qtype]
        raw = np.asarray(self.data, np.uint8).reshape(
            self.rows, self.k // QK, spec.block_bytes
        )
        return gguf_blocks.from_bytes(raw, self.qtype)


def tensor_view_from_gguf(gf, name: str) -> GGMLTensorView:
    """Build a view over one GGUF tensor (reference ggml_tensor access)."""
    info = gf.tensors[name]
    shape = info["shape"]  # row-major (rows..., K)
    ne = tuple(reversed(shape))
    qt = info["qtype"]
    data = gf.raw(name) if qt in SPECS else gf.load(name)
    return GGMLTensorView(name, qt, ne, data)


def prepare_from_gguf(gf, name: str) -> gemm_pallas.PreparedWeight:
    """GGUF tensor -> kernel-ready PreparedWeight (device layout)."""
    return gemm_pallas.prepare(tensor_view_from_gguf(gf, name).to_soa())


def gemm_from_ggml(w: GGMLTensorView, act, kernel: str = "auto"):
    """The ``gemm_{w4a8,w4a16,fp32}_from_ggml`` entry point
    (llama_adapter.h:71-104), kernel selected by registry ladder name.

    ``act``: float [M, K] or Q8_1Tensor.  ``kernel``: "auto" (dispatch) or
    any name in :data:`~.kernels.registry.KERNELS`.
    """
    w_soa = w.to_soa()
    if isinstance(w_soa, np.ndarray):  # fp32 weights: plain matmul
        a = act if not hasattr(act, "qs") else None
        assert a is not None, "fp32 weights take float activations"
        return jnp.asarray(a) @ jnp.asarray(w_soa).T
    if kernel == "auto":
        return registry.dispatch(w_soa, act)
    return registry.KERNELS[kernel](w_soa, act)


# ---------------------------------------------------------------------------
# ggml op drop-ins (ggml_cuda_compat.cuh analogue)
# ---------------------------------------------------------------------------


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def ggml_op_silu(x):
    """ggml_cuda_op_silu_custom (compat/ggml_cuda_compat.cuh:41)."""
    return _silu(_f32(x))


def ggml_op_gelu(x):
    """ggml GELU is the tanh ('quick'/approximate) variant."""
    return _gelu_quick(_f32(x))


def ggml_op_rms_norm(x, op_params: bytes | float = 1e-5):
    """ggml rms_norm: normalize only (no weight multiply — llama.cpp applies
    the weight via a separate ggml_mul).  ``op_params`` is either the eps
    float or the raw 4-byte op_params blob ggml stores it in."""
    eps = (
        struct.unpack("<f", op_params[:4])[0]
        if isinstance(op_params, (bytes, bytearray))
        else float(op_params)
    )
    x = _f32(x)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps)


def ggml_op_soft_max(x, scale: float = 1.0):
    """ggml soft_max with the optional pre-softmax scale op_param."""
    return _softmax(_f32(x) * scale)


def ggml_op_rope(x, pos, op_params: Optional[dict] = None):
    """ggml rope: op_params carries n_dims/mode/freq_base/freq_scale
    (unpacked exactly like compat/ggml_cuda_compat.cuh:154-158).

    mode 0 = original llama interleaved pairs; mode 2 (NEOX) = split halves.
    """
    p = op_params or {}
    mode = int(p.get("mode", 0))
    return _rope(
        _f32(x),
        pos,
        base=float(p.get("freq_base", 10000.0)),
        freq_scale=float(p.get("freq_scale", 1.0)),
        interleaved=(mode & 2) == 0,
    )


def ggml_op_add(a, b):
    return _f32(a) + _f32(b)


def ggml_op_mul(a, b):
    return _f32(a) * _f32(b)


GGML_OPS = {
    "silu": ggml_op_silu,
    "gelu": ggml_op_gelu,
    "rms_norm": ggml_op_rms_norm,
    "soft_max": ggml_op_soft_max,
    "rope": ggml_op_rope,
    "add": ggml_op_add,
    "mul": ggml_op_mul,
}

__all__ = [
    "GGMLTensorView",
    "tensor_view_from_gguf",
    "prepare_from_gguf",
    "gemm_from_ggml",
    "GGML_OPS",
] + [f"ggml_op_{n}" for n in GGML_OPS]
