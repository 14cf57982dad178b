"""Hand-calculation sanity walkthrough of the W4A8 compensation formula.

The reference keeps two scratch scripts (detailed_calc.py, manual_calc.py)
that verify the dp4a nibble math by hand on one block; this is the TPU-side
equivalent: one 32-element block taken through quantization, the raw-nibble
integer dot, and the compensation identity

    sum_j (q_w[j] - 8) * d_w * x_a[j]
  = d_w * ( d_a * sum_j q_w[j] * q_a[j]  -  8 * s_a ),   s_a = d_a * sum_j q_a[j]

printing every intermediate so a human can follow the arithmetic.
"""

import numpy as np

import sys
sys.path.insert(0, ".")
from quant_gemm_tpu.formats import numpy_ref

rng = np.random.default_rng(42)
x_w = rng.standard_normal(32).astype(np.float32) * 0.5  # one weight block
x_a = rng.standard_normal(32).astype(np.float32) * 0.5  # one activation block

w = numpy_ref.quantize_q4_0(x_w[None])
a = numpy_ref.quantize_q8_1(x_a[None])
q_w = numpy_ref.codes(w)[0].astype(np.int32)  # raw nibbles 0..15
q_a = a.qs[0].astype(np.int32)
d_w = np.float32(w.d[0, 0])
d_a = np.float32(a.d[0, 0])
s_a = np.float32(a.s[0, 0])

print(f"d_w = {d_w:.6f}   d_a = {d_a:.6f}   s_a = f16(d_a*sum q_a) = {s_a:.6f}")
print(f"q_w[:8]  = {q_w[:8]}")
print(f"q_a[:8]  = {q_a[:8]}")

sumi = int((q_w * q_a).sum())
print(f"sumi = sum q_w*q_a = {sumi}")

direct = float(((q_w - 8) * d_w * (q_a * d_a)).sum())
compensated = float(d_w * (d_a * sumi - 8.0 * s_a))
exact_fp = float((numpy_ref.dequantize(w)[0] * numpy_ref.dequantize(a)[0]).sum())
print(f"direct dequant dot        = {direct:.6f}")
print(f"compensated formula       = {compensated:.6f}")
print(f"dequantize-then-dot       = {exact_fp:.6f}")
print(f"fp32 (unquantized) dot    = {float((x_w * x_a).sum()):.6f}")
assert abs(direct - compensated) < 1e-4 * max(1, abs(direct))
print("compensation identity holds")
