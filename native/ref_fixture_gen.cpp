// Cross-implementation fixture generator: runs the REFERENCE project's own
// CPU-reference quantizers / dequantizers / GEMMs (compiled read-only from
// /root/reference/include — quant_types.h, quantize.h CPU section,
// gemm_reference.h — via the host-side shims in native/cuda_shim/) and dumps
// inputs + block bytes + outputs to a binary fixture.
//
// Purpose (tests/test_ref_cpp_interop.py): every other golden in this repo
// was produced by this repo's own Python; this fixture's bytes and numbers
// come from an INDEPENDENTLY COMPILED C++ implementation of the same
// contracts (the reference's gemm_reference.h:38-330 /
// include/quantize.h:35-210), so parsing them through quant_gemm_tpu.api
// validates the byte layout (pack order, f16 scale storage, 18/34/36-byte
// strides) and the epilogue math across implementations — the closest
// available stand-in for llama.cpp-produced bytes in this zero-egress
// environment (the reference's own llama.cpp comparison,
// tests/step5_llama_comparison.cu:64-124, is likewise gated on an absent
// llama.cpp checkout).
//
// Build (see native/Makefile target `ref_fixture`):
//   awk '/^__global__/{exit}{print}' $REF/include/quantize.h > refcpu/quantize.h
//   echo '#endif' >> refcpu/quantize.h
//   g++ -O2 -I refcpu -I $REF/include -I cuda_shim ref_fixture_gen.cpp
//
// Deterministic inputs: 64-bit LCG (Knuth MMIX constants), uniform [-1, 1],
// seeded per tensor — recorded here so the fixture is reproducible.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <cuda_runtime.h>  // the host shim: defines __host__/__device__

#include "quant_types.h"
#include "quantize.h"
#include "gemm_reference.h"

static uint64_t lcg_state;

static void lcg_seed(uint64_t s) { lcg_state = s; }

static float lcg_uniform() {  // [-1, 1)
    lcg_state = lcg_state * 6364136223846793005ULL + 1442695040888963407ULL;
    return 2.0f * (float)((lcg_state >> 40) / 16777216.0) - 1.0f;
}

static void fill(float* p, int n, uint64_t seed) {
    lcg_seed(seed);
    for (int i = 0; i < n; i++) p[i] = lcg_uniform();
}

static void wr(FILE* f, const void* p, size_t bytes) {
    if (fwrite(p, 1, bytes, f) != bytes) {
        fprintf(stderr, "short write\n");
        exit(1);
    }
}

int main(int argc, char** argv) {
    const char* out = argc > 1 ? argv[1] : "tests/golden/ref_cpp_fixture.bin";
    const int M = 4, N = 8, K = 256;
    const int nb = K / QK4_0;

    static_assert(sizeof(block_q4_0) == 18, "q4_0 block must be 18 B");
    static_assert(sizeof(block_q8_0) == 34, "q8_0 block must be 34 B");
    static_assert(sizeof(block_q8_1) == 36, "q8_1 block must be 36 B");

    float* A = new float[M * K];
    float* W = new float[N * K];
    fill(A, M * K, 0x5151u);
    fill(W, N * K, 0x5252u);

    block_q8_1* Aq = new block_q8_1[M * nb];
    block_q4_0* W4 = new block_q4_0[N * nb];
    block_q8_0* W8 = new block_q8_0[N * nb];
    for (int i = 0; i < M; i++)
        quantize_row_q8_1_ref(A + i * K, Aq + i * nb, K);
    for (int j = 0; j < N; j++) {
        quantize_row_q4_0_ref(W + j * K, W4 + j * nb, K);
        quantize_row_q8_0_ref(W + j * K, W8 + j * nb, K);
    }

    float* deqA = new float[M * K];
    float* deqW4 = new float[N * K];
    float* deqW8 = new float[N * K];
    for (int i = 0; i < M; i++)
        dequantize_row_q8_1(Aq + i * nb, deqA + i * K, K);
    for (int j = 0; j < N; j++) {
        dequantize_row_q4_0(W4 + j * nb, deqW4 + j * K, K);
        dequantize_row_q8_0(W8 + j * nb, deqW8 + j * K, K);
    }

    float* Cfp32 = new float[M * N];
    float* Cw4a8 = new float[M * N];
    float* Cw8a8 = new float[M * N];
    float* Cw4a16 = new float[M * N];
    gemm_fp32_reference(A, W, Cfp32, M, N, K);
    gemm_w4a8_reference(Aq, W4, Cw4a8, M, N, K);
    gemm_w8a8_reference(Aq, W8, Cw8a8, M, N, K);
    gemm_w4a16_reference(A, W4, Cw4a16, M, N, K);

    float vd4 = 0.0f, vd8 = 0.0f;
    vec_dot_q4_0_q8_1(K, &vd4, W4, Aq);
    vec_dot_q8_0_q8_1(K, &vd8, W8, Aq);

    FILE* f = fopen(out, "wb");
    if (!f) {
        fprintf(stderr, "cannot open %s\n", out);
        return 1;
    }
    int32_t hdr[5] = {0x51475446, 1, M, N, K};  // 'QGTF', version
    wr(f, hdr, sizeof(hdr));
    wr(f, A, M * K * 4);
    wr(f, W, N * K * 4);
    wr(f, Aq, (size_t)M * nb * sizeof(block_q8_1));
    wr(f, W4, (size_t)N * nb * sizeof(block_q4_0));
    wr(f, W8, (size_t)N * nb * sizeof(block_q8_0));
    wr(f, deqA, M * K * 4);
    wr(f, deqW4, N * K * 4);
    wr(f, deqW8, N * K * 4);
    wr(f, Cfp32, M * N * 4);
    wr(f, Cw4a8, M * N * 4);
    wr(f, Cw8a8, M * N * 4);
    wr(f, Cw4a16, M * N * 4);
    wr(f, &vd4, 4);
    wr(f, &vd8, 4);
    fclose(f);
    printf("wrote %s (M=%d N=%d K=%d)\n", out, M, N, K);
    return 0;
}
