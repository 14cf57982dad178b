"""Native C++ block codec: bit-exact differential tests vs the numpy golden."""

import numpy as np
import pytest

from quant_gemm_tpu import native
from quant_gemm_tpu.formats import gguf, numpy_ref
from quant_gemm_tpu.harness import datagen

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def x():
    return datagen.normal((16, 512), seed=5)


@pytest.mark.parametrize("fmt", ["q4_0", "q8_0", "q8_1"])
def test_native_quantize_bitexact(fmt, x):
    t_np = numpy_ref.QUANTIZE[fmt](x)
    t_c = getattr(native, f"quantize_{fmt}")(x)
    for f, a, b in zip(t_np._fields, t_np, t_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f"{fmt}.{f}")


@pytest.mark.parametrize("fmt", ["q4_0", "q8_0", "q8_1"])
def test_native_dequantize_bitexact(fmt, x):
    t = numpy_ref.QUANTIZE[fmt](x)
    np.testing.assert_array_equal(native.dequantize(t), numpy_ref.dequantize(t))


def test_native_aos_repack_bitexact(x):
    t = numpy_ref.quantize_q4_0(x)
    aos_np = gguf.to_bytes(t)
    aos_c = native.q4_0_to_aos(t)
    np.testing.assert_array_equal(aos_np, aos_c)
    t_back = native.q4_0_from_aos(aos_np)
    for f, a, b in zip(t._fields, t, t_back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f)


def test_native_faster_than_numpy():
    """The point of native: bulk conversion speed (sanity, not a tight bound)."""
    import time

    big = datagen.normal((512, 4096), seed=6)
    t0 = time.perf_counter()
    native.quantize_q4_0(big)
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    numpy_ref.quantize_q4_0(big)
    t_np = time.perf_counter() - t0
    # don't assert a ratio (CI variance); just record both are sane
    assert t_c < 5.0 and t_np < 30.0, (t_c, t_np)


def test_native_kquant_decode_bitexact():
    """C++ q4_K/q5_K AoS->SoA decoders vs the numpy reference, bit for bit
    (random bytes exercise every scale-packing and nibble path)."""
    if not native.kquants_available():
        pytest.skip("native codec not built")
    from quant_gemm_tpu.formats import kquants

    rng = np.random.default_rng(40)
    raw4 = rng.integers(0, 256, (16, 4, 144)).astype(np.uint8)
    raw5 = rng.integers(0, 256, (16, 4, 176)).astype(np.uint8)

    def np_q4(raw):  # numpy path, bypassing the native routing
        import unittest.mock as mock

        with mock.patch.object(native, "kquants_available", lambda: False):
            return kquants.from_bytes(raw)

    def np_q5(raw):
        import unittest.mock as mock

        with mock.patch.object(native, "kquants_available", lambda: False):
            return kquants.from_bytes_q5_k(raw)

    for nat, ref in ((native.q4_k_from_aos(raw4), np_q4(raw4)),
                     (native.q5_k_from_aos(raw5), np_q5(raw5))):
        for a, b in zip(nat, ref):
            np.testing.assert_array_equal(
                np.asarray(a).view(np.uint8), np.asarray(b).view(np.uint8)
            )


def test_native_kquant_roundtrip_through_encoder():
    """quantize_q4_k/q5_k -> to_bytes -> native decode == original SoA."""
    if not native.kquants_available():
        pytest.skip("native codec not built")
    from quant_gemm_tpu.formats import kquants
    from quant_gemm_tpu.harness import datagen

    x = datagen.normal((8, 512), seed=41)
    t4 = kquants.quantize_q4_k(x)
    n4 = native.q4_k_from_aos(kquants.to_bytes(t4))
    for a, b in zip(t4, n4):
        np.testing.assert_array_equal(np.asarray(a).view(np.uint8),
                                      np.asarray(b).view(np.uint8))
    t5 = kquants.quantize_q5_k(x)
    n5 = native.q5_k_from_aos(kquants.to_bytes_q5_k(t5))
    for a, b in zip(t5, n5):
        np.testing.assert_array_equal(np.asarray(a).view(np.uint8),
                                      np.asarray(b).view(np.uint8))


def test_native_q6k_decode_bitexact():
    """C++ q6_K AoS->SoA decoder vs the numpy reference, bit for bit
    (random bytes exercise every ql/qh segment and scale path)."""
    if not native.q6k_available():
        pytest.skip("native codec not built / too old")
    import unittest.mock as mock

    from quant_gemm_tpu.formats import kquants

    rng = np.random.default_rng(42)
    raw = rng.integers(0, 256, (16, 4, 210)).astype(np.uint8)
    got = native.q6_k_from_aos(raw)
    with mock.patch.object(native, "q6k_available", lambda: False):
        ref = kquants.from_bytes_q6_k(raw)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(
            np.asarray(a).view(np.uint8), np.asarray(b).view(np.uint8))


def test_native_q6k_roundtrip_through_encoder():
    if not native.q6k_available():
        pytest.skip("native codec not built / too old")
    from quant_gemm_tpu.formats import kquants
    from quant_gemm_tpu.harness import datagen

    x = datagen.normal((8, 512), seed=43)
    t6 = kquants.quantize_q6_k(x)
    n6 = native.q6_k_from_aos(kquants.to_bytes_q6_k(t6))
    for a, b in zip(t6, n6):
        np.testing.assert_array_equal(
            np.asarray(a).view(np.uint8), np.asarray(b).view(np.uint8))


def test_native_q2k_q3k_decode_bitexact():
    """C++ q2_K/q3_K AoS->SoA decoders vs the numpy reference, bit for bit
    (random bytes exercise every code group, hmask bit, and scale path)."""
    if not native.k16_available():
        pytest.skip("native codec not built / too old")
    import unittest.mock as mock

    from quant_gemm_tpu.formats import kquants

    rng = np.random.default_rng(44)
    raw2 = rng.integers(0, 256, (16, 4, 84)).astype(np.uint8)
    raw3 = rng.integers(0, 256, (16, 4, 110)).astype(np.uint8)
    got2 = native.q2_k_from_aos(raw2)
    got3 = native.q3_k_from_aos(raw3)
    with mock.patch.object(native, "k16_available", lambda: False):
        ref2 = kquants.from_bytes_q2_k(raw2)
        ref3 = kquants.from_bytes_q3_k(raw3)
    for got, ref in ((got2, ref2), (got3, ref3)):
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(
                np.asarray(a).view(np.uint8), np.asarray(b).view(np.uint8))
