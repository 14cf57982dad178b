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
