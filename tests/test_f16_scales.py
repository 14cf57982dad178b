"""Half-stored weight scales (SCALES_DTYPE=np.float16 -> int16 bit planes).

The scale planes are ~20% of the decode stream at f32; storing the IEEE-f16
bits (the container's native scale precision, compat/ggml_types.h:62-191)
as int16 cuts decode bytes ~10% and MUST be bit-identical: the kernel-entry
decode (gemm_pallas.scale_f32) reconstructs exactly the f32 value the f32
path stores, for every finite f16 including subnormals.

Mosaic legality of the int16 decode is covered by the AOT gate
(tests/test_mosaic_gate.py); on-chip speed by scripts/lab_f16scales.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from quant_gemm_tpu.formats import jax_quant, numpy_ref
from quant_gemm_tpu.kernels import gemm_pallas
from quant_gemm_tpu.kernels.gemm_exact import gemm_exact, gemm_exact_fused
from quant_gemm_tpu.kernels.gemm_pallas import scale_f32

QUANTIZERS = {
    "q4_0": numpy_ref.quantize_q4_0,
    "q4_1": numpy_ref.quantize_q4_1,
    "q5_0": numpy_ref.quantize_q5_0,
    "q5_1": numpy_ref.quantize_q5_1,
    "q8_0": numpy_ref.quantize_q8_0,
}


def test_scale_f32_decodes_every_finite_f16_exactly():
    # every normal binade + explicit subnormals, +-0, extremes
    rng = np.random.default_rng(7)
    vals = rng.normal(0, 1, 8192).astype(np.float16)
    vals[:10] = np.array(
        [6.1e-5, 5.96e-8, -5.96e-8, 0.0, -0.0, 65504.0, -65504.0,
         2.0 ** -14, 1e-7, -3e-5], np.float16)
    dec = np.asarray(scale_f32(jnp.asarray(vals.view(np.int16))))
    ref = vals.astype(np.float32)
    np.testing.assert_array_equal(dec, ref)


@pytest.mark.parametrize("qt", list(QUANTIZERS))
def test_half_scales_bit_identical(qt):
    rng = np.random.default_rng(3)
    w = rng.normal(0, 1, (256, 512)).astype(np.float32)
    w[0, :64] *= 1e-4  # drive some block d into f16-subnormal range
    a = rng.normal(0, 1, (4, 512)).astype(np.float32)
    wq = QUANTIZERS[qt](w)
    w32 = gemm_pallas.prepare(wq, scales_dtype=np.float32)
    w16 = gemm_pallas.prepare(wq, scales_dtype=np.float16)
    assert w16.d_t.dtype == jnp.int16
    aq = jax_quant.device_put(numpy_ref.quantize_q8_1(a))

    np.testing.assert_array_equal(
        np.asarray(gemm_exact(w32, aq)), np.asarray(gemm_exact(w16, aq)))
    np.testing.assert_array_equal(
        np.asarray(gemm_pallas.gemm(w32, jnp.asarray(a))),
        np.asarray(gemm_pallas.gemm(w16, jnp.asarray(a))))
    if qt in ("q4_0", "q4_1", "q8_0"):  # fused path excludes q5 (qh)
        np.testing.assert_array_equal(
            np.asarray(gemm_exact_fused(w32, jnp.asarray(a))),
            np.asarray(gemm_exact_fused(w16, jnp.asarray(a))))


def test_kquant_effective_scales_keep_f32():
    """K-quant effective containers carry f32 super_d*ls products that are
    generally NOT f16-representable: the f16 flip must silently fall back
    to f32 per plane (lossless) instead of rounding them (ADVICE r3)."""
    from quant_gemm_tpu.formats import kquants

    rng = np.random.default_rng(11)
    w = rng.normal(0, 1, (64, 512)).astype(np.float32)
    wq = kquants.to_effective(kquants.quantize_q4_k(w))
    # sanity: the effective d really is not f16-exact (else the test is vacuous)
    d = np.asarray(wq.d, np.float32)
    assert not np.array_equal(d.astype(np.float16).astype(np.float32), d)
    w32 = gemm_pallas.prepare(wq, scales_dtype=np.float32)
    w16 = gemm_pallas.prepare(wq, scales_dtype=np.float16)
    assert w16.d_t.dtype == jnp.float32  # guarded fallback, not int16
    a = rng.normal(0, 1, (4, 512)).astype(np.float32)
    aq = jax_quant.device_put(numpy_ref.quantize_q8_1(a))
    np.testing.assert_array_equal(
        np.asarray(gemm_exact(w32, aq)), np.asarray(gemm_exact(w16, aq)))


def test_half_scales_device_prepare_matches_host():
    rng = np.random.default_rng(5)
    w = rng.normal(0, 1, (64, 256)).astype(np.float32)
    wq = numpy_ref.quantize_q4_0(w)
    host = gemm_pallas.prepare(wq, scales_dtype=np.float16)
    dev = gemm_pallas.prepare_device(
        jax_quant.quantize_q4_0(jnp.asarray(w)), scales_dtype=np.float16)
    assert dev.d_t.dtype == jnp.int16
    np.testing.assert_array_equal(np.asarray(host.d_t), np.asarray(dev.d_t))
    np.testing.assert_array_equal(
        np.asarray(host.packed_t), np.asarray(dev.packed_t))
