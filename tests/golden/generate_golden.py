"""Generate recorded golden vectors for llama.cpp-semantics parity.

Pins the cross-implementation contract the reference validates against
llama.cpp itself (/root/reference/tests/step5_llama_comparison.cu:64-124):
given identical quantized BYTES (llama.cpp AoS wire format), the scalar
``vec_dot_q4_0_q8_1`` / ``vec_dot_q8_0_q8_1`` must agree to < 1e-6.

This generator is deliberately INDEPENDENT of quant_gemm_tpu: it quantizes,
packs, and dots at the byte level with plain numpy, implementing the format
contract from first principles (SURVEY.md §2.1/§2.3):

* block_q4_0: 18 B = f16 d + 16 B qs; byte j holds codes for elements j
  (low nibble) and j+16 (high nibble); d = amax/7, q = clip(rint(x/d),-8,7)+8
* block_q8_0: 34 B = f16 d + 32 int8; d = amax/127
* block_q8_1: 36 B = f16 d + f16 s + 32 int8; s = f16(f32(d) * sum(q))
  (llama.cpp-exact form), codes clipped to [-127, 127]
* vec_dot: per block ``sumi = sum(q_w_raw * q_a)`` on RAW nibbles (no -8),
  f32-sequential accumulate of ``d_w*(d_a*sumi - 8*s_a)`` (q4_0) /
  ``d_w*d_a*sumi`` (q8_0)

Rounding is half-to-even (np.rint), the project-wide convention matching
CUDA __float2int_rn (docs/CONVENTIONS.md).

Run: ``python tests/golden/generate_golden.py`` (writes llama_vec_dot.npz
next to itself).  The committed .npz is the recorded artifact; the test
also re-runs this generator to catch drift in either direction.
"""

from __future__ import annotations

import pathlib

import numpy as np

QK = 32


def f16(x):
    return np.asarray(x, np.float16)


def f16_bytes(v):
    return np.asarray(v, "<f2").tobytes()


# -- byte-level quantizers (independent reimplementation) -------------------


def quant_block_q4_0(x32: np.ndarray) -> bytes:
    amax = np.abs(x32).max()
    d = f16(amax / 7.0)
    inv = 0.0 if float(d) == 0.0 else 1.0 / np.float32(d)
    q = np.clip(np.rint(x32.astype(np.float32) * inv), -8, 7).astype(np.int64) + 8
    qs = bytearray(16)
    for j in range(16):  # AoS interleave: byte j = elem j | elem j+16 << 4
        qs[j] = int(q[j]) | (int(q[j + 16]) << 4)
    return f16_bytes(d) + bytes(qs)


def quant_block_q8_0(x32: np.ndarray) -> bytes:
    amax = np.abs(x32).max()
    d = f16(amax / 127.0)
    inv = 0.0 if float(d) == 0.0 else 1.0 / np.float32(d)
    q = np.clip(np.rint(x32.astype(np.float32) * inv), -127, 127).astype(np.int8)
    return f16_bytes(d) + q.tobytes()


def quant_block_q8_1(x32: np.ndarray) -> bytes:
    amax = np.abs(x32).max()
    d = f16(amax / 127.0)
    inv = 0.0 if float(d) == 0.0 else 1.0 / np.float32(d)
    q = np.clip(np.rint(x32.astype(np.float32) * inv), -127, 127).astype(np.int8)
    s = f16(np.float32(d) * np.float32(int(q.astype(np.int64).sum())))
    return f16_bytes(d) + f16_bytes(s) + q.tobytes()


def quant_row(x: np.ndarray, fn) -> bytes:
    return b"".join(fn(x[i : i + QK]) for i in range(0, len(x), QK))


# -- byte-level vec_dots -----------------------------------------------------


def vec_dot_q4_0_q8_1_bytes(w_bytes: bytes, a_bytes: bytes, n: int) -> float:
    nb = n // QK
    total = np.float32(0.0)
    for b in range(nb):
        wb = w_bytes[b * 18 : (b + 1) * 18]
        ab = a_bytes[b * 36 : (b + 1) * 36]
        d_w = np.float32(np.frombuffer(wb[0:2], "<f2")[0])
        d_a = np.float32(np.frombuffer(ab[0:2], "<f2")[0])
        s_a = np.float32(np.frombuffer(ab[2:4], "<f2")[0])
        qs = np.frombuffer(wb[2:18], np.uint8)
        qa = np.frombuffer(ab[4:36], np.int8).astype(np.int64)
        sumi = 0
        for j in range(16):  # raw nibbles (no -8): compensation handles it
            sumi += (qs[j] & 0x0F) * qa[j] + (qs[j] >> 4) * qa[j + 16]
        total = np.float32(
            total + d_w * (d_a * np.float32(sumi) - np.float32(8.0) * s_a)
        )
    return float(total)


def vec_dot_q8_0_q8_1_bytes(w_bytes: bytes, a_bytes: bytes, n: int) -> float:
    nb = n // QK
    total = np.float32(0.0)
    for b in range(nb):
        wb = w_bytes[b * 34 : (b + 1) * 34]
        ab = a_bytes[b * 36 : (b + 1) * 36]
        d_w = np.float32(np.frombuffer(wb[0:2], "<f2")[0])
        d_a = np.float32(np.frombuffer(ab[0:2], "<f2")[0])
        qw = np.frombuffer(wb[2:34], np.int8).astype(np.int64)
        qa = np.frombuffer(ab[4:36], np.int8).astype(np.int64)
        sumi = int((qw * qa).sum())
        total = np.float32(total + d_w * d_a * np.float32(sumi))
    return float(total)


def generate() -> dict:
    rng = np.random.default_rng(42)  # the reference's fixed seed
    out = {}
    for k in (128, 1024):  # 1024 = step5's K
        w = (rng.standard_normal(k) * 0.5).astype(np.float32)
        a = (rng.standard_normal(k) * 0.5).astype(np.float32)
        w40 = quant_row(w, quant_block_q4_0)
        w80 = quant_row(w, quant_block_q8_0)
        a81 = quant_row(a, quant_block_q8_1)
        out[f"w_f32_{k}"] = w
        out[f"a_f32_{k}"] = a
        out[f"w_q4_0_bytes_{k}"] = np.frombuffer(w40, np.uint8)
        out[f"w_q8_0_bytes_{k}"] = np.frombuffer(w80, np.uint8)
        out[f"a_q8_1_bytes_{k}"] = np.frombuffer(a81, np.uint8)
        out[f"dot_q4_0_q8_1_{k}"] = np.float64(
            vec_dot_q4_0_q8_1_bytes(w40, a81, k)
        )
        out[f"dot_q8_0_q8_1_{k}"] = np.float64(
            vec_dot_q8_0_q8_1_bytes(w80, a81, k)
        )
    return out


if __name__ == "__main__":
    path = pathlib.Path(__file__).parent / "llama_vec_dot.npz"
    np.savez(path, **generate())
    print(f"wrote {path}")
