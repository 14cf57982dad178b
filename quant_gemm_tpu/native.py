"""ctypes bindings for the native C++ block codec (native/blockcodec.cpp).

Host-side bulk conversion at the GGUF boundary.  The library auto-builds on
first use (``make -C native``); if no C++ toolchain is available everything
degrades to the numpy implementations, which are bit-identical (asserted by
tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

from .formats.blocks import QK, Q4_0Tensor, Q8_0Tensor, Q8_1Tensor

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libblockcodec.so"
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:  # pragma: no cover - toolchain missing
            raise NativeUnavailable(f"cannot build blockcodec: {e}") from e
    lib = ctypes.CDLL(str(_LIB_PATH))
    i64, p = ctypes.c_int64, ctypes.POINTER
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    lib.qgt_quantize_q4_0.argtypes = [f32p, i64, i64, u8p, u16p]
    lib.qgt_quantize_q8_0.argtypes = [f32p, i64, i64, i8p, u16p]
    lib.qgt_quantize_q8_1.argtypes = [f32p, i64, i64, i8p, u16p, u16p]
    lib.qgt_dequantize_q4_0.argtypes = [u8p, u16p, i64, i64, f32p]
    lib.qgt_dequantize_q8_0.argtypes = [i8p, u16p, i64, i64, f32p]
    lib.qgt_q4_0_aos_to_planar.argtypes = [u8p, i64, i64, u8p, u16p]
    lib.qgt_q4_0_planar_to_aos.argtypes = [u8p, u16p, i64, i64, u8p]
    if hasattr(lib, "qgt_q4_k_aos_to_planar"):
        lib.qgt_q4_k_aos_to_planar.argtypes = [
            u8p, i64, i64, u8p, u16p, u16p, u8p, u8p
        ]
        lib.qgt_q5_k_aos_to_planar.argtypes = [
            u8p, i64, i64, u8p, u8p, u16p, u16p, u8p, u8p
        ]
    if hasattr(lib, "qgt_q6_k_aos_to_soa"):
        lib.qgt_q6_k_aos_to_soa.argtypes = [u8p, i64, i64, u16p, i8p, i8p]
    if hasattr(lib, "qgt_q2_k_aos_to_soa"):
        lib.qgt_q2_k_aos_to_soa.argtypes = [u8p, i64, i64, u16p, u16p, u8p,
                                            u8p, i8p]
        lib.qgt_q3_k_aos_to_soa.argtypes = [u8p, i64, i64, u16p, i8p, i8p]
    lib.qgt_version.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        return _load().qgt_version() >= 1
    except NativeUnavailable:
        return False


def _2d(x) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32)
    assert x.ndim == 2 and x.shape[1] % QK == 0, x.shape
    return x


def quantize_q4_0(x) -> Q4_0Tensor:
    x = _2d(x)
    rows, k = x.shape
    packed = np.zeros((rows, k // 2), np.uint8)
    d = np.empty((rows, k // QK), np.uint16)
    _load().qgt_quantize_q4_0(x, rows, k, packed, d)
    return Q4_0Tensor(packed, d.view(np.float16))


def quantize_q8_0(x) -> Q8_0Tensor:
    x = _2d(x)
    rows, k = x.shape
    qs = np.empty((rows, k), np.int8)
    d = np.empty((rows, k // QK), np.uint16)
    _load().qgt_quantize_q8_0(x, rows, k, qs, d)
    return Q8_0Tensor(qs, d.view(np.float16))


def quantize_q8_1(x) -> Q8_1Tensor:
    x = _2d(x)
    rows, k = x.shape
    qs = np.empty((rows, k), np.int8)
    d = np.empty((rows, k // QK), np.uint16)
    s = np.empty((rows, k // QK), np.uint16)
    _load().qgt_quantize_q8_1(x, rows, k, qs, d, s)
    return Q8_1Tensor(qs, d.view(np.float16), s.view(np.float16))


def dequantize(t) -> np.ndarray:
    lib = _load()
    if isinstance(t, Q4_0Tensor):
        rows, kh = t.packed.shape
        out = np.empty((rows, kh * 2), np.float32)
        lib.qgt_dequantize_q4_0(
            np.ascontiguousarray(t.packed),
            np.ascontiguousarray(np.asarray(t.d).view(np.uint16)),
            rows, kh * 2, out,
        )
        return out
    if isinstance(t, (Q8_0Tensor, Q8_1Tensor)):
        rows, k = t.qs.shape
        out = np.empty((rows, k), np.float32)
        lib.qgt_dequantize_q8_0(
            np.ascontiguousarray(t.qs),
            np.ascontiguousarray(np.asarray(t.d).view(np.uint16)),
            rows, k, out,
        )
        return out
    raise TypeError(type(t))


def q4_0_from_aos(aos: np.ndarray) -> Q4_0Tensor:
    """AoS block bytes [rows, nb, 18] -> planar container (GGUF import)."""
    aos = np.ascontiguousarray(aos, np.uint8)
    rows, nb, bb = aos.shape
    assert bb == 18
    k = nb * QK
    packed = np.zeros((rows, k // 2), np.uint8)
    d = np.empty((rows, nb), np.uint16)
    _load().qgt_q4_0_aos_to_planar(aos, rows, k, packed, d)
    return Q4_0Tensor(packed, d.view(np.float16))


def q4_0_to_aos(t: Q4_0Tensor) -> np.ndarray:
    rows, kh = t.packed.shape
    nb = kh * 2 // QK
    aos = np.empty((rows, nb, 18), np.uint8)
    _load().qgt_q4_0_planar_to_aos(
        np.ascontiguousarray(t.packed),
        np.ascontiguousarray(np.asarray(t.d).view(np.uint16)),
        rows, kh * 2, aos,
    )
    return aos


def kquants_available() -> bool:
    try:
        return _load().qgt_version() >= 2
    except NativeUnavailable:
        return False


def q4_k_from_aos(aos: np.ndarray):
    """AoS block_q4_K bytes [rows, nsb, 144] -> Q4_KTensor (GGUF import)."""
    from .formats.kquants import Q4_KTensor, QK_K

    aos = np.ascontiguousarray(aos, np.uint8)
    rows, nsb, bb = aos.shape
    assert bb == 144, bb
    k = nsb * QK_K
    packed = np.zeros((rows, k // 2), np.uint8)
    d = np.empty((rows, nsb), np.uint16)
    dmin = np.empty((rows, nsb), np.uint16)
    ls = np.empty((rows, nsb * 8), np.uint8)
    lm = np.empty((rows, nsb * 8), np.uint8)
    _load().qgt_q4_k_aos_to_planar(aos, rows, k, packed, d, dmin, ls, lm)
    return Q4_KTensor(d.view(np.float16), dmin.view(np.float16), ls, lm, packed)


def q5_k_from_aos(aos: np.ndarray):
    """AoS block_q5_K bytes [rows, nsb, 176] -> Q5_KTensor (GGUF import)."""
    from .formats.kquants import Q5_KTensor, QK_K

    aos = np.ascontiguousarray(aos, np.uint8)
    rows, nsb, bb = aos.shape
    assert bb == 176, bb
    k = nsb * QK_K
    packed = np.zeros((rows, k // 2), np.uint8)
    qh = np.zeros((rows, k // 8), np.uint8)
    d = np.empty((rows, nsb), np.uint16)
    dmin = np.empty((rows, nsb), np.uint16)
    ls = np.empty((rows, nsb * 8), np.uint8)
    lm = np.empty((rows, nsb * 8), np.uint8)
    _load().qgt_q5_k_aos_to_planar(aos, rows, k, packed, qh, d, dmin, ls, lm)
    return Q5_KTensor(d.view(np.float16), dmin.view(np.float16), ls, lm,
                      packed, qh)


def q6k_available() -> bool:
    try:
        return _load().qgt_version() >= 3
    except NativeUnavailable:
        return False


def k16_available() -> bool:
    """Native per-16 K-quant decoders (q2/q3/q6_K) present."""
    try:
        return _load().qgt_version() >= 4
    except NativeUnavailable:
        return False


def q2_k_from_aos(aos: np.ndarray):
    """AoS block_q2_K bytes [rows, nsb, 84] -> Q2_KTensor."""
    from .formats.kquants import Q2_KTensor, QK_K

    aos = np.ascontiguousarray(aos, np.uint8)
    rows, nsb, bb = aos.shape
    assert bb == 84, bb
    k = nsb * QK_K
    d = np.empty((rows, nsb), np.uint16)
    dmin = np.empty((rows, nsb), np.uint16)
    sc = np.empty((rows, nsb * 16), np.uint8)
    mn = np.empty((rows, nsb * 16), np.uint8)
    qs = np.empty((rows, k), np.int8)
    _load().qgt_q2_k_aos_to_soa(aos, rows, k, d, dmin, sc, mn, qs)
    return Q2_KTensor(d.view(np.float16), dmin.view(np.float16), sc, mn, qs)


def q3_k_from_aos(aos: np.ndarray):
    """AoS block_q3_K bytes [rows, nsb, 110] -> Q3_KTensor."""
    from .formats.kquants import Q3_KTensor, QK_K

    aos = np.ascontiguousarray(aos, np.uint8)
    rows, nsb, bb = aos.shape
    assert bb == 110, bb
    k = nsb * QK_K
    d = np.empty((rows, nsb), np.uint16)
    sc = np.empty((rows, nsb * 16), np.int8)
    qs = np.empty((rows, k), np.int8)
    _load().qgt_q3_k_aos_to_soa(aos, rows, k, d, sc, qs)
    return Q3_KTensor(d.view(np.float16), sc, qs)


def q6_k_from_aos(aos: np.ndarray):
    """AoS block_q6_K bytes [rows, nsb, 210] -> Q6_KTensor (GGUF import;
    the Q4_K_M hot path — q6_K output.weight/attn_v tensors)."""
    from .formats.kquants import Q6_KTensor, QK_K

    aos = np.ascontiguousarray(aos, np.uint8)
    rows, nsb, bb = aos.shape
    assert bb == 210, bb
    k = nsb * QK_K
    d = np.empty((rows, nsb), np.uint16)
    sc = np.empty((rows, nsb * 16), np.int8)
    qs = np.empty((rows, k), np.int8)
    _load().qgt_q6_k_aos_to_soa(aos, rows, k, d, sc, qs)
    return Q6_KTensor(d.view(np.float16), sc, qs)


__all__ = [
    "available",
    "kquants_available",
    "quantize_q4_0",
    "quantize_q8_0",
    "quantize_q8_1",
    "dequantize",
    "q4_0_from_aos",
    "q4_0_to_aos",
    "q4_k_from_aos",
    "q5_k_from_aos",
    "q6_k_from_aos",
    "q6k_available",
    "q2_k_from_aos",
    "q3_k_from_aos",
    "k16_available",
    "NativeUnavailable",
]
