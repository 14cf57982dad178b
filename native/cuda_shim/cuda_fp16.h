/* Minimal host-side stand-in for CUDA's cuda_fp16.h, used ONLY to compile
 * the reference project's CPU-reference quantize/GEMM functions with g++
 * for cross-implementation fixture generation (native/ref_fixture_gen.cpp).
 *
 * The conversions implement IEEE-754 binary16 with round-to-nearest-even —
 * the same semantics CUDA's __float2half/__half2float provide on device.
 * Original code (no CUDA sources consulted); layout matches the 2-byte
 * `half` / 4-byte `half2` the reference's block structs require
 * (quant_types.h static_asserts 18/34/36-byte blocks).
 */
#ifndef QGT_CUDA_FP16_SHIM_H
#define QGT_CUDA_FP16_SHIM_H

#include <cstdint>
#include <cstring>

typedef struct half_s {
    uint16_t __x;
} half;

typedef struct half2_s {
    half x, y;
} half2;

static inline half __float2half(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    uint32_t mant = x & 0x7FFFFFu;
    int exp = (int)((x >> 23) & 0xFFu);
    uint16_t bits;
    if (exp == 0xFF) {                       /* inf / nan */
        bits = (uint16_t)(sign | 0x7C00u | (mant ? 0x200u : 0));
    } else {
        int e = exp - 127 + 15;
        if (e >= 31) {                       /* overflow -> inf */
            bits = (uint16_t)(sign | 0x7C00u);
        } else if (e <= 0) {                 /* subnormal / zero */
            if (e < -10) {
                bits = (uint16_t)sign;
            } else {
                mant |= 0x800000u;
                int shift = 14 - e;          /* 13 mantissa bits + (1 - e) */
                uint32_t hm = mant >> shift;
                uint32_t rem = mant & ((1u << shift) - 1);
                uint32_t halfway = 1u << (shift - 1);
                if (rem > halfway || (rem == halfway && (hm & 1)))
                    hm++;
                bits = (uint16_t)(sign | hm);
            }
        } else {
            uint32_t h = sign | ((uint32_t)e << 10) | (mant >> 13);
            uint32_t rem = mant & 0x1FFFu;
            if (rem > 0x1000u || (rem == 0x1000u && (h & 1)))
                h++;                          /* may carry into exponent: OK */
            bits = (uint16_t)h;
        }
    }
    half r;
    r.__x = bits;
    return r;
}

static inline float __half2float(half h) {
    uint32_t sign = (uint32_t)(h.__x & 0x8000u) << 16;
    uint32_t exp = (h.__x >> 10) & 0x1Fu;
    uint32_t mant = h.__x & 0x3FFu;
    uint32_t out;
    if (exp == 0) {
        if (mant == 0) {
            out = sign;
        } else {                              /* subnormal: normalize */
            int e = -1;
            do {
                mant <<= 1;
                e++;
            } while (!(mant & 0x400u));
            out = sign | ((uint32_t)(127 - 15 - e) << 23)
                | ((mant & 0x3FFu) << 13);
        }
    } else if (exp == 31) {
        out = sign | 0x7F800000u | (mant << 13);
    } else {
        out = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &out, 4);
    return f;
}

static inline half2 make_half2(half x, half y) {
    half2 r;
    r.x = x;
    r.y = y;
    return r;
}

static inline half __low2half(half2 h) { return h.x; }
static inline half __high2half(half2 h) { return h.y; }

#endif /* QGT_CUDA_FP16_SHIM_H */
