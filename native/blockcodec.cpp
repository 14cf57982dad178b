// blockcodec: native host-side codec for llama.cpp 32-element block formats.
//
// TPU-native counterpart of the reference's C++/CUDA host quantizers
// (include/quantize.h:35-211, tests/framework/test_framework.cuh:162-367):
// the device compute path is Pallas/XLA, but bulk weight conversion at the
// GGUF boundary (quantize, dequantize, AoS <-> planar repack) is host work,
// implemented here in C++ for speed and exposed to Python via ctypes
// (quant_gemm_tpu/native.py).
//
// Semantics are identical to quant_gemm_tpu/formats/numpy_ref.py:
//   * rounding: nearest-even (nearbyintf under default FP env);
//   * scales stored as IEEE f16 bit patterns (uint16);
//   * q8_1: s = f16(f32(d) * sum(q)), codes clamped to [-127, 127];
//   * planar device layout: byte c of a row holds x[c] (low nibble) and
//     x[c + K/2] (high nibble); q5 high bits: bit (c%8) of byte c/8.
//
// Layouts are row-major [rows, K]; planar outputs [rows, K/2] etc.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

using std::int8_t;
using std::int64_t;
using std::uint16_t;
using std::uint32_t;
using std::uint8_t;

namespace {

inline uint16_t f16_bits(float x) {
    _Float16 h = (_Float16)x;
    uint16_t b;
    std::memcpy(&b, &h, 2);
    return b;
}

inline float f16_val(uint16_t b) {
    _Float16 h;
    std::memcpy(&h, &b, 2);
    return (float)h;
}

inline float rne(float x) { return nearbyintf(x); }  // round-to-nearest-even

struct Block {
    float amax = 0.f, mn = 0.f, mx = 0.f;
};

inline Block scan(const float* x, int n) {
    Block b;
    b.mn = b.mx = x[0];
    for (int i = 0; i < n; i++) {
        b.amax = std::max(b.amax, std::fabs(x[i]));
        b.mn = std::min(b.mn, x[i]);
        b.mx = std::max(b.mx, x[i]);
    }
    return b;
}

constexpr int QK = 32;

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// quantize: float32 [rows, k] -> planar SoA
// ---------------------------------------------------------------------------

void qgt_quantize_q4_0(const float* x, int64_t rows, int64_t k,
                       uint8_t* packed /*[rows, k/2]*/, uint16_t* d /*[rows, k/32]*/) {
    const int64_t nb = k / QK, kh = k / 2;
    for (int64_t r = 0; r < rows; r++) {
        const float* row = x + r * k;
        // temp codes in natural order, then planar pack
        for (int64_t b = 0; b < nb; b++) {
            const float* blk = row + b * QK;
            float amax = 0.f;
            for (int i = 0; i < QK; i++) amax = std::max(amax, std::fabs(blk[i]));
            uint16_t db = f16_bits(amax / 7.0f);
            d[r * nb + b] = db;
            float dv = f16_val(db);
            float inv = dv > 0 ? 1.0f / dv : 0.0f;
            for (int i = 0; i < QK; i++) {
                int q = (int)rne(blk[i] * inv);
                q = std::max(-8, std::min(7, q)) + 8;
                int64_t c = b * QK + i;  // natural column
                uint8_t* byte = packed + r * kh + (c < kh ? c : c - kh);
                if (c < kh)
                    *byte = (*byte & 0xF0) | (uint8_t)q;
                else
                    *byte = (*byte & 0x0F) | ((uint8_t)q << 4);
            }
        }
    }
}

void qgt_quantize_q8_0(const float* x, int64_t rows, int64_t k,
                       int8_t* qs /*[rows, k]*/, uint16_t* d) {
    const int64_t nb = k / QK;
    for (int64_t r = 0; r < rows; r++) {
        for (int64_t b = 0; b < nb; b++) {
            const float* blk = x + r * k + b * QK;
            float amax = 0.f;
            for (int i = 0; i < QK; i++) amax = std::max(amax, std::fabs(blk[i]));
            uint16_t db = f16_bits(amax / 127.0f);
            d[r * nb + b] = db;
            float dv = f16_val(db);
            float inv = dv > 0 ? 1.0f / dv : 0.0f;
            int8_t* out = qs + r * k + b * QK;
            for (int i = 0; i < QK; i++) {
                int q = (int)rne(blk[i] * inv);
                out[i] = (int8_t)std::max(-127, std::min(127, q));
            }
        }
    }
}

void qgt_quantize_q8_1(const float* x, int64_t rows, int64_t k,
                       int8_t* qs, uint16_t* d, uint16_t* s) {
    const int64_t nb = k / QK;
    qgt_quantize_q8_0(x, rows, k, qs, d);
    for (int64_t r = 0; r < rows; r++) {
        for (int64_t b = 0; b < nb; b++) {
            const int8_t* q = qs + r * k + b * QK;
            int sum = 0;
            for (int i = 0; i < QK; i++) sum += q[i];
            s[r * nb + b] = f16_bits(f16_val(d[r * nb + b]) * (float)sum);
        }
    }
}

// ---------------------------------------------------------------------------
// dequantize: planar SoA -> float32
// ---------------------------------------------------------------------------

void qgt_dequantize_q4_0(const uint8_t* packed, const uint16_t* d,
                         int64_t rows, int64_t k, float* out) {
    const int64_t nb = k / QK, kh = k / 2;
    for (int64_t r = 0; r < rows; r++) {
        for (int64_t c = 0; c < k; c++) {
            uint8_t byte = packed[r * kh + (c < kh ? c : c - kh)];
            int q = (c < kh) ? (byte & 0x0F) : (byte >> 4);
            float dv = f16_val(d[r * nb + c / QK]);
            out[r * k + c] = (float)(q - 8) * dv;
        }
    }
}

void qgt_dequantize_q8_0(const int8_t* qs, const uint16_t* d,
                         int64_t rows, int64_t k, float* out) {
    const int64_t nb = k / QK;
    for (int64_t r = 0; r < rows; r++)
        for (int64_t c = 0; c < k; c++)
            out[r * k + c] = (float)qs[r * k + c] * f16_val(d[r * nb + c / QK]);
}

// ---------------------------------------------------------------------------
// AoS (llama.cpp / GGUF block bytes) <-> planar SoA, q4_0
//   AoS: per block 18 B = d (f16 LE) + qs[16] (low nibble j = x[j],
//   high nibble j = x[j+16])    (compat/ggml_types.h:62-88)
// ---------------------------------------------------------------------------

void qgt_q4_0_aos_to_planar(const uint8_t* aos /*[rows, nb, 18]*/, int64_t rows,
                            int64_t k, uint8_t* packed, uint16_t* d) {
    const int64_t nb = k / QK, kh = k / 2;
    for (int64_t r = 0; r < rows; r++) {
        for (int64_t b = 0; b < nb; b++) {
            const uint8_t* blk = aos + (r * nb + b) * 18;
            std::memcpy(&d[r * nb + b], blk, 2);
            for (int j = 0; j < 16; j++) {
                uint8_t lo = blk[2 + j] & 0x0F;        // x[32b + j]
                uint8_t hi = blk[2 + j] >> 4;          // x[32b + 16 + j]
                int64_t c0 = b * QK + j, c1 = b * QK + 16 + j;
                uint8_t* p0 = packed + r * kh + (c0 < kh ? c0 : c0 - kh);
                uint8_t* p1 = packed + r * kh + (c1 < kh ? c1 : c1 - kh);
                if (c0 < kh) *p0 = (*p0 & 0xF0) | lo; else *p0 = (*p0 & 0x0F) | (lo << 4);
                if (c1 < kh) *p1 = (*p1 & 0xF0) | hi; else *p1 = (*p1 & 0x0F) | (hi << 4);
            }
        }
    }
}

void qgt_q4_0_planar_to_aos(const uint8_t* packed, const uint16_t* d,
                            int64_t rows, int64_t k, uint8_t* aos) {
    const int64_t nb = k / QK, kh = k / 2;
    for (int64_t r = 0; r < rows; r++) {
        for (int64_t b = 0; b < nb; b++) {
            uint8_t* blk = aos + (r * nb + b) * 18;
            std::memcpy(blk, &d[r * nb + b], 2);
            for (int j = 0; j < 16; j++) {
                int64_t c0 = b * QK + j, c1 = b * QK + 16 + j;
                uint8_t b0 = packed[r * kh + (c0 < kh ? c0 : c0 - kh)];
                uint8_t b1 = packed[r * kh + (c1 < kh ? c1 : c1 - kh)];
                uint8_t lo = (c0 < kh) ? (b0 & 0x0F) : (b0 >> 4);
                uint8_t hi = (c1 < kh) ? (b1 & 0x0F) : (b1 >> 4);
                blk[2 + j] = lo | (hi << 4);
            }
        }
    }
}

int qgt_version(void) { return 1; }

}  // extern "C"
