/* Host-only stand-in for cuda_runtime.h so the reference's CPU-reference
 * headers compile under g++ (see native/ref_fixture_gen.cpp).  Only the
 * qualifiers the CPU code paths touch are defined; no CUDA API is provided
 * (the fixture generator never calls any). */
#ifndef QGT_CUDA_RUNTIME_SHIM_H
#define QGT_CUDA_RUNTIME_SHIM_H

#define __host__
#define __device__
#define __global__
#define __forceinline__ inline
#define __restrict__

typedef int cudaStream_t;

#include "cuda_fp16.h"

#endif /* QGT_CUDA_RUNTIME_SHIM_H */
