"""Format layer tests: struct sizes, packing, round-trips, AoS byte layout.

Differential strategy (reference test philosophy, SURVEY §4): the vectorized
numpy quantizers are checked against an independent *scalar* transcription of
the reference C++ loops (include/quantize.h, test_framework.cuh:162-367), and
the AoS serialization against hand-constructed byte patterns.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quant_gemm_tpu.formats import SPECS, gguf, jax_quant, numpy_ref
from quant_gemm_tpu.formats.blocks import QK
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.harness.metrics import ErrorMetrics

FORMATS = list(SPECS)


def test_struct_sizes():
    """Byte sizes match compat/ggml_types.h static_asserts: 18/20/22/24/34/36."""
    expected = {"q4_0": 18, "q4_1": 20, "q5_0": 22, "q5_1": 24, "q8_0": 34, "q8_1": 36}
    for name, spec in SPECS.items():
        assert spec.block_bytes == expected[name]
        x = datagen.normal((2, 64))
        raw = gguf.to_bytes(numpy_ref.QUANTIZE[name](x))
        assert raw.shape == (2, 2, expected[name])


def test_planar_pack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, size=(3, 128)).astype(np.uint8)
    assert (numpy_ref.unpack_planar_4bit(numpy_ref.pack_planar_4bit(q)) == q).all()
    b = rng.integers(0, 2, size=(3, 128)).astype(np.uint8)
    assert (numpy_ref.unpack_planar_bits(numpy_ref.pack_planar_bits(b)) == b).all()


# ---------------------------------------------------------------------------
# scalar transcriptions of the reference quantizers (independent golden)
# ---------------------------------------------------------------------------


def _scalar_quant_dequant(x_row, fmt):
    """Quantize+dequantize one row with scalar loops following the reference
    C++ semantics literally (nearest-even rounding standardization applied)."""
    k = len(x_row)
    out = np.zeros(k, np.float32)
    for b in range(k // QK):
        blk = x_row[b * QK : (b + 1) * QK].astype(np.float32)
        if fmt in ("q4_0", "q5_0", "q8_0", "q8_1"):
            amax = float(np.max(np.abs(blk)))
            div = {"q4_0": 7.0, "q5_0": 15.0, "q8_0": 127.0, "q8_1": 127.0}[fmt]
            d = np.float16(amax / div)
            inv = 1.0 / np.float32(d) if d > 0 else 0.0
            lo, hi = {"q4_0": (-8, 7), "q5_0": (-16, 15), "q8_0": (-127, 127), "q8_1": (-127, 127)}[fmt]
            q = np.clip(np.rint(blk * inv), lo, hi)
            out[b * QK : (b + 1) * QK] = q * np.float32(d)
        else:
            mn, mx = float(blk.min()), float(blk.max())
            div = 15.0 if fmt == "q4_1" else 31.0
            d = np.float16((mx - mn) / div)
            m = np.float16(mn)
            inv = 1.0 / np.float32(d) if d > 0 else 0.0
            q = np.clip(np.rint((blk - mn) * inv), 0, div)
            out[b * QK : (b + 1) * QK] = q * np.float32(d) + np.float32(m)
    return out


@pytest.mark.parametrize("fmt", FORMATS)
def test_quantize_matches_scalar_reference(fmt):
    x = datagen.normal((4, 256), seed=7)
    t = numpy_ref.QUANTIZE[fmt](x)
    got = numpy_ref.dequantize(t)
    want = np.stack([_scalar_quant_dequant(row, fmt) for row in x])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_nmse(fmt):
    """Round-trip accuracy targets from TEST_RESULTS.md:59-62 (uniform data):
    Q4_0 NMSE ~4.65e-3, Q8_x ~1.39e-5."""
    x = datagen.uniform((8, 1024), seed=42)
    t = numpy_ref.QUANTIZE[fmt](x)
    m = ErrorMetrics.compute(numpy_ref.dequantize(t), x)
    budget = {
        "q4_0": 5.5e-3,
        "q4_1": 5.5e-3,
        "q5_0": 1.4e-3,
        "q5_1": 1.4e-3,
        "q8_0": 2e-5,
        "q8_1": 2e-5,
    }[fmt]
    assert m.nmse < budget, m
    if fmt == "q4_0":
        assert 3.5e-3 < m.nmse  # sanity: matches the published 4.65e-3 scale


def test_q8_1_sum_semantics():
    """s must be f16(d * sum(q)) — llama.cpp-exact, NOT sum(x) (SURVEY §2.1)."""
    x = datagen.normal((1, 64), seed=3)
    t = numpy_ref.quantize_q8_1(x)
    q = np.asarray(t.qs, np.int32).reshape(-1, QK)
    d = np.asarray(t.d, np.float32).ravel()
    want = (q.sum(axis=-1) * d).astype(np.float16)
    np.testing.assert_array_equal(np.asarray(t.s).ravel(), want)


@pytest.mark.parametrize("fmt", FORMATS)
def test_aos_bytes_roundtrip(fmt):
    x = datagen.normal((3, 128), seed=11)
    t = numpy_ref.QUANTIZE[fmt](x)
    raw = gguf.to_bytes(t)
    t2 = gguf.from_bytes(raw, fmt)
    for a, b in zip(t, t2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the parsed container dequantizes identically
    np.testing.assert_array_equal(numpy_ref.dequantize(t), numpy_ref.dequantize(t2))


def test_q4_0_aos_byte_layout_exact():
    """Hand-check the per-block interleave: qs[j] = x[j] | x[j+16]<<4
    (compat/ggml_types.h:62-88), d at offset 0 as LE f16."""
    x = np.zeros((1, 32), np.float32)
    x[0, 0] = -7.0  # q=-7 -> code 1
    x[0, 5] = 7.0  # q=7 -> code 15  => d = 7/7 = 1.0
    x[0, 16] = 3.0  # q=3 -> code 11
    t = numpy_ref.quantize_q4_0(x)
    raw = gguf.to_bytes(t)[0, 0]
    assert raw.shape == (18,)
    d = raw[0:2].view("<f2")[0]
    assert float(d) == 1.0
    qs = raw[2:18]
    assert qs[0] == (1 | (11 << 4))  # x[0] low nibble, x[16] high nibble
    assert qs[5] == (15 | (8 << 4))  # x[5]=code 15, x[21]=0 -> code 8
    assert qs[1] == (8 | (8 << 4))  # zeros -> code 8 both nibbles


def test_q5_0_qh_bit_layout():
    """qh bit c is the 5th bit of x[c] (natural order, LE u32)."""
    x = np.zeros((1, 32), np.float32)
    x[0, 2] = 15.0  # d = 1.0; q = 15+16 = 31 -> high bit set
    x[0, 20] = -15.0  # q = -15+16 = 1 -> high bit clear, code 1
    t = numpy_ref.quantize_q5_0(x)
    raw = gguf.to_bytes(t)[0, 0]
    qh = int(raw[2:6].view("<u4")[0])
    assert (qh >> 2) & 1 == 1
    assert (qh >> 20) & 1 == 0
    # zero maps to code 16 -> bit set
    assert (qh >> 0) & 1 == 1
    qs = raw[6:22]
    assert qs[2] & 0x0F == 15  # low nibble of code 31
    assert (qs[4] >> 4) & 0x0F == 1  # x[20] -> byte 4 high nibble, code 1


def test_degenerate_blocks():
    """All-zero and extreme blocks (SURVEY §2.10.5 reminder) must not NaN."""
    for fmt in FORMATS:
        z = np.zeros((2, 64), np.float32)
        t = numpy_ref.QUANTIZE[fmt](z)
        np.testing.assert_array_equal(numpy_ref.dequantize(t), z)
        big = np.full((1, 32), 6.5e4, np.float32)  # near f16 max
        out = numpy_ref.dequantize(numpy_ref.QUANTIZE[fmt](big))
        assert np.isfinite(out).all()


def test_degenerate_saturation_policy():
    """Pinned policy (docs/CONVENTIONS.md): f16-stored block values saturate
    to +-65504 instead of overflowing to inf, so every stored scale is finite
    and no downstream `0 * inf` NaN can occur.  Exercises the actual
    overflow cliff: a Q8_1 block whose d * sum(q) exceeds f16 max."""
    import warnings

    # all-max block: d = f16(3e38/127) would be inf without saturation
    huge = np.full((1, 32), 3e38, np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the old code path warned here
        t = numpy_ref.quantize_q8_1(huge)
    assert np.isfinite(np.asarray(t.d, np.float32)).all()
    assert np.isfinite(np.asarray(t.s, np.float32)).all()
    assert float(np.asarray(t.d)[0, 0]) == 65504.0
    assert float(np.asarray(t.s)[0, 0]) == 65504.0  # d*sum(q) >> f16 max
    assert np.isfinite(numpy_ref.dequantize(t)).all()
    # jit twin agrees bit-for-bit
    tj = jax_quant.quantize_q8_1(jnp.asarray(huge))
    np.testing.assert_array_equal(np.asarray(tj.d), np.asarray(t.d))
    np.testing.assert_array_equal(np.asarray(tj.s), np.asarray(t.s))
    for fmt in FORMATS:
        tn = numpy_ref.QUANTIZE[fmt](huge)
        assert np.isfinite(np.asarray(tn.d, np.float32)).all()


def test_checkpoint_roundtrip(tmp_path):
    """save_npz/load_npz round-trips containers and nested trees bit-exactly."""
    from quant_gemm_tpu.formats import checkpoint

    x = datagen.normal((4, 128), seed=20)
    tree = {
        "layer0": {"w": numpy_ref.quantize_q4_0(x), "norm": x[0]},
        "acts": numpy_ref.quantize_q8_1(x),
    }
    p = tmp_path / "ckpt.npz"
    checkpoint.save_npz(p, tree)
    back = checkpoint.load_npz(p)
    for f, want in zip(back["layer0/w"]._fields, tree["layer0"]["w"]):
        np.testing.assert_array_equal(getattr(back["layer0/w"], f), np.asarray(want))
    np.testing.assert_array_equal(back["layer0/norm"], x[0])
    for f, want in zip(back["acts"]._fields, tree["acts"]):
        np.testing.assert_array_equal(getattr(back["acts"], f), np.asarray(want))
