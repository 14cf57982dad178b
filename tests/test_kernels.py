"""Kernel ladder differential tests (CPU interpret mode; TPU when
QGT_TEST_TPU=1).

Every rung is verified against the numpy integer golden and against FP32,
mirroring the reference's three-level differential strategy (SURVEY §4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.formats import jax_quant, numpy_ref
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.harness.metrics import NMSE_VS_FP32, ErrorMetrics
from quant_gemm_tpu.kernels import KERNELS, dispatch, gemm_exact, prepare
from quant_gemm_tpu.ref import gemm as refg

M, N, K = 4, 384, 512
WEIGHT_FORMATS = ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0"]


@pytest.fixture(scope="module")
def data():
    a = datagen.normal((M, K), seed=1)
    w = datagen.normal((N, K), seed=2)
    a_q = numpy_ref.quantize_q8_1(a)
    return a, w, a_q


@pytest.mark.parametrize("fmt", WEIGHT_FORMATS)
def test_pallas_wxa16_vs_golden(fmt, data):
    """f32-MXU Pallas kernels must near-bit-match the dequant golden
    (the reference observes <1e-13 GPU-vs-CPU NMSE; same class here)."""
    a, w, _ = data
    w_q = numpy_ref.QUANTIZE[fmt](w)
    gold = refg.gemm_wxa16(a, w_q)
    out = KERNELS["pallas_f32"](w_q, jnp.asarray(a))
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, (fmt, m)


@pytest.mark.parametrize("fmt", WEIGHT_FORMATS)
def test_pallas_wxa8_scaled_vs_fp32(fmt, data):
    a, w, a_q = data
    w_q = numpy_ref.QUANTIZE[fmt](w)
    ref = refg.gemm_fp32(a, w)
    out = KERNELS["pallas_f32"](w_q, jax_quant.device_put(a_q))
    m = ErrorMetrics.compute(out, ref)
    assert m.check(NMSE_VS_FP32[fmt]), (fmt, m)


@pytest.mark.parametrize("fmt", ["q4_0", "q8_0"])
def test_pallas_exact_matches_integer_golden(fmt, data):
    """The exact-int kernel reproduces reference W4A8 semantics (f16 s_a and
    all): agreement with the numpy golden is f32-accumulation-limited."""
    a, w, a_q = data
    w_q = numpy_ref.QUANTIZE[fmt](w)
    gold = refg.gemm_wxa8(w_q, a_q)
    out = gemm_exact(prepare(w_q), jax_quant.device_put(a_q))
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, (fmt, m)


def test_xla_int_bitexact_vs_golden(data):
    a, w, a_q = data
    w_q = numpy_ref.quantize_q4_0(w)
    gold = refg.gemm_w4a8(w_q, a_q)
    out = KERNELS["xla_int"](w_q, jax_quant.device_put(a_q))
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-13, m


@pytest.mark.parametrize(
    "impl", ["xla_dequant", "xla_compensated", "pallas", "pallas_f32"]
)
def test_ladder_rungs_vs_fp32(impl, data):
    """Every ladder rung must stay within the reference W4A8 NMSE budget."""
    a, w, a_q = data
    w_q = numpy_ref.quantize_q4_0(w)
    ref = refg.gemm_fp32(a, w)
    out = KERNELS[impl](w_q, jax_quant.device_put(a_q))
    m = ErrorMetrics.compute(out, ref)
    assert m.check(NMSE_VS_FP32["q4_0"]), (impl, m)


def test_fused_quant_matches_separate_quant(data):
    """In-kernel activation quantization ~= quantize-then-gemm (both vs the
    compensation golden; fused uses exact sums and per-tile rounding)."""
    a, w, a_q = data
    w_q = numpy_ref.quantize_q4_0(w)
    gold = refg.gemm_w4a8(w_q, a_q)
    out = KERNELS["pallas_fused_quant"](w_q, jnp.asarray(a), mxu_dtype=jnp.float32)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-4, m


def test_dispatch_fallback_small_k():
    """K not Pallas-tileable falls back to the XLA rung."""
    a = datagen.normal((2, 96), seed=5)
    w = datagen.normal((64, 96), seed=6)
    w_q = numpy_ref.quantize_q4_0(w)
    out = dispatch(w_q, jnp.asarray(a))
    m = ErrorMetrics.compute(out, refg.gemm_wxa16(a, w_q))
    assert m.nmse < 1e-10, m


def test_odd_shapes_padding():
    """M/N not tile-aligned must be handled by padding, bit-identically."""
    a = datagen.normal((3, 512), seed=7)
    w = datagen.normal((130, 512), seed=8)
    w_q = numpy_ref.quantize_q4_0(w)
    out = KERNELS["pallas_f32"](w_q, jnp.asarray(a))
    m = ErrorMetrics.compute(out, refg.gemm_wxa16(a, w_q))
    assert m.nmse < 1e-12, m
    assert out.shape == (3, 130)


def test_decode_m1(data):
    _, w, _ = data
    a = datagen.normal((1, K), seed=9)
    a_q = numpy_ref.quantize_q8_1(a)
    w_q = numpy_ref.quantize_q4_0(w)
    out = KERNELS["pallas_f32"](w_q, jax_quant.device_put(a_q))
    gold = refg.gemm_wxa8(w_q, a_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-5, m  # scaled path: differs from golden only via f16 s_a
    assert out.shape == (1, N)


def test_jax_quantize_matches_numpy():
    """jnp quantizers are bit-identical to the numpy goldens."""
    x = datagen.normal((4, 256), seed=11)
    for fmt, qfn in numpy_ref.QUANTIZE.items():
        t_np = qfn(x)
        t_j = jax_quant.QUANTIZE[fmt](jnp.asarray(x))
        for a_np, a_j in zip(t_np, t_j):
            np.testing.assert_array_equal(
                np.asarray(a_np), np.asarray(a_j), err_msg=fmt
            )
        np.testing.assert_allclose(
            numpy_ref.dequantize(t_np),
            np.asarray(jax_quant.dequantize(t_j)),
            atol=0,
            rtol=0,
        )


@pytest.mark.parametrize("fmt", ["q4_0", "q4_1"])
@pytest.mark.parametrize("m", [4, 8])
def test_submask_bit_identical(fmt, m):
    """submask=True (lo dots = dot(p) - dot(hi) at int32, one VPU mask
    saved) must be BIT-identical to the two-mask default — the int32
    subtraction is exact, so the f32 epilogue sees identical sumi."""
    a = datagen.normal((m, K), seed=21)
    w = datagen.normal((N, K), seed=22)
    a_q = numpy_ref.quantize_q8_1(a)
    wp = prepare(numpy_ref.QUANTIZE[fmt](w))
    aqd = jax_quant.device_put(a_q)
    base = np.asarray(gemm_exact(wp, aqd))
    sub = np.asarray(gemm_exact(wp, aqd, submask=True))
    np.testing.assert_array_equal(base, sub)


@pytest.mark.parametrize("fmt", ["q4_0", "q4_1", "q5_0", "q5_1"])
@pytest.mark.parametrize("m", [1, 3, 4, 5, 8])
def test_bundle_bit_identical(fmt, m):
    """bundle=True (decode/serving M <= 8: m-native qa + ONE fused
    [3*nb, 8] f32 scales operand replacing the separate da/sa/sq pads +
    transposes) must be BIT-identical to the unbundled dispatch — same
    kernel math, only the operand layout and XLA prep-op count change."""
    a = datagen.normal((m, K), seed=23)
    w = datagen.normal((N, K), seed=24)
    a_q = numpy_ref.quantize_q8_1(a)
    wp = prepare(numpy_ref.QUANTIZE[fmt](w))
    aqd = jax_quant.device_put(a_q)
    base = np.asarray(gemm_exact(wp, aqd, bundle=False))
    bun = np.asarray(gemm_exact(wp, aqd, bundle=True))
    np.testing.assert_array_equal(base, bun)
    sub = np.asarray(gemm_exact(wp, aqd, bundle=True, submask=True))
    np.testing.assert_array_equal(base, sub)


@pytest.mark.parametrize("fmt", ["q4_0", "q5_0", "q4_1"])
@pytest.mark.parametrize("m", [1, 4, 8])
def test_fusecomp_golden_and_fallback(fmt, m):
    """fusecomp=True (default, r5: the per-block compensation rides the
    stacked dense epilogue ``s = d*(da*sumi + c)`` — the golden's own
    parenthesization — instead of a merged f32 MXU dot per grid step)
    must stay golden-exact; min-plane formats must fall back to the
    merged-dot path bit-identically (their s_a @ m term has a different
    rhs plane and keeps the hoisted dot)."""
    a = datagen.normal((m, K), seed=31)
    w = datagen.normal((N, K), seed=32)
    w_q = numpy_ref.QUANTIZE[fmt](w)
    wp = prepare(w_q)
    a_q = numpy_ref.quantize_q8_1(a)
    aqd = jax_quant.device_put(a_q)
    gold = refg.gemm_wxa8(w_q, a_q)
    on = np.asarray(gemm_exact(wp, aqd, fusecomp=True))
    assert ErrorMetrics.compute(on, gold).nmse < 1e-12
    if fmt == "q4_1":  # has_min -> fusecomp is a no-op
        off = np.asarray(gemm_exact(wp, aqd, fusecomp=False))
        np.testing.assert_array_equal(on, off)


def test_dispatch_decode_routes_to_exact(data):
    """Decode-regime Q8_1 dispatch must hit the exact int kernel: the output
    matches the integer golden bit-for-bit (the dequant rung would not)."""
    a, w, a_q = data
    w_q = numpy_ref.quantize_q4_0(w)
    wp = prepare(w_q)
    out = dispatch(wp, jax_quant.device_put(a_q))
    gold = refg.gemm_wxa8(w_q, a_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m


def test_dispatch_prefill_routes_to_dequant(data):
    """Above the decode crossover the dequant kernel serves; accuracy is
    checked against FP32 at the format budget."""
    _, w, _ = data
    a = datagen.normal((32, K), seed=13)
    a_q = numpy_ref.quantize_q8_1(a)
    w_q = numpy_ref.quantize_q4_0(w)
    out = dispatch(prepare(w_q), jax_quant.device_put(a_q))
    m = ErrorMetrics.compute(out, refg.gemm_fp32(a, w))
    assert m.nmse < NMSE_VS_FP32["q4_0"], m


@pytest.mark.parametrize("fmt", WEIGHT_FORMATS)
def test_exact_kernel_all_formats(data, fmt):
    """The exact int kernel must match the integer golden for EVERY weight
    format (reference vec_dot_{q4_0,q4_1,q5_0,q5_1,q8_0}_q8_1 parity)."""
    a, w, a_q = data
    w_q = numpy_ref.QUANTIZE[fmt](w)
    out = gemm_exact(prepare(w_q), jax_quant.device_put(a_q))
    gold = refg.gemm_wxa8(w_q, a_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-11, (fmt, m)
    assert out.shape == (M, N)


@pytest.mark.parametrize("m_tok", [1, 3])
@pytest.mark.parametrize("fmt", ["q4_0", "q4_1"])
def test_exact_stack4_odd_m(fmt, m_tok):
    """The stacked m<=4 decode epilogue (gemm_exact stack4 path) must stay
    golden-exact and fused/unfused bit-identical when m leaves padding rows
    INSIDE the 4-token stack (m=1, 3), not just at the aligned m=4."""
    from quant_gemm_tpu.kernels import gemm_exact_fused

    a = datagen.normal((m_tok, K), seed=11)
    w = datagen.normal((N, K), seed=12)
    w_q = numpy_ref.QUANTIZE[fmt](w)
    wp = prepare(w_q)
    a_q = numpy_ref.quantize_q8_1(a)
    out = gemm_exact(wp, jax_quant.device_put(a_q))
    gold = refg.gemm_wxa8(w_q, a_q)
    met = ErrorMetrics.compute(out, gold)
    assert met.nmse < 1e-11, (fmt, m_tok, met)
    assert out.shape == (m_tok, N)
    fused = np.asarray(gemm_exact_fused(wp, jnp.asarray(a, jnp.float32)))
    assert np.array_equal(np.asarray(out), fused)


@pytest.mark.parametrize("fmt", ["q4_0", "q5_1", "q8_0"])
def test_non_512_multiple_k(fmt):
    """Real-model dims like Llama-7B's d_ff=11008 are not 512-multiples;
    prepare() zero-pads K so both serving kernels still tile (padded blocks
    carry d=0 and contribute nothing)."""
    k = 1088  # = 17 * 64; khalf = 544 pads to 768
    a = datagen.normal((4, k), seed=21)
    w = datagen.normal((256, k), seed=22)
    w_q = numpy_ref.QUANTIZE[fmt](w)
    a_q = numpy_ref.quantize_q8_1(a)
    wp = prepare(w_q)
    gold = refg.gemm_wxa8(w_q, a_q)

    out_exact = gemm_exact(wp, jax_quant.device_put(a_q))
    m1 = ErrorMetrics.compute(out_exact, gold)
    assert m1.nmse < 1e-11, (fmt, m1)

    out_deq = KERNELS["pallas_f32"](w_q, jnp.asarray(a))
    m2 = ErrorMetrics.compute(out_deq, refg.gemm_wxa16(a, w_q))
    assert m2.nmse < 1e-10, (fmt, m2)

    out_disp = dispatch(wp, jax_quant.device_put(a_q))
    m3 = ErrorMetrics.compute(out_disp, gold)
    assert m3.nmse < 1e-11, (fmt, m3)


# ---------------------------------------------------------------------------
# fused exact kernel (in-kernel true-Q8_1 activation quantization)
# ---------------------------------------------------------------------------


def test_f16_round_matches_ieee():
    """The Mosaic-legal bit-math f16 rounding must equal the IEEE cast
    (ties-to-even, subnormals included) — it carries the Q8_1 d/s
    semantics inside the fused kernel."""
    from quant_gemm_tpu.kernels.gemm_exact import _f16_round

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.normal(0, 1, 50_000),
        rng.normal(0, 1e-5, 20_000),  # f16-subnormal range
        rng.uniform(-65504, 65504, 20_000),
        np.array([0.0, -0.0, 65504.0, -65504.0, 6.103515625e-05,
                  6.1e-05, 5.96e-08, 2.98e-08, 2.9e-08, 1e-8, -1e-8]),
    ]).astype(np.float32)
    vals = np.clip(vals, -65504, 65504)
    emu = np.asarray(_f16_round(jnp.asarray(vals)))
    ref = vals.astype(np.float16).astype(np.float32)
    assert np.array_equal(emu, ref)


@pytest.mark.parametrize(
    "fmt",
    ["q4_0", pytest.param("q4_1", marks=pytest.mark.slow), "q8_0"],
)
def test_fused_exact_bit_identical(fmt, data):
    """gemm_exact_fused(w, x) == gemm_exact(w, quantize_q8_1(x)) EXACTLY —
    the reference's fused kernel contract (gemm_fused.cuh:158-302) with
    true Q8_1 semantics, not a float fake-quant."""
    from quant_gemm_tpu.kernels import gemm_exact_fused

    a, w, a_q = data
    w_q = numpy_ref.QUANTIZE[fmt](w)
    wp = prepare(w_q)
    x = jnp.asarray(a, jnp.float32)
    base = np.asarray(gemm_exact(wp, jax_quant.device_put(a_q)))
    fused = np.asarray(gemm_exact_fused(wp, x))
    assert np.array_equal(base, fused)


def test_dispatch_quantize_act_decode_fuses(data):
    """dispatch(float x, quantize_act=True) on a decode shape must produce
    the exact quantize-then-integer-GEMM result (i.e. it took the fused
    exact path, not the W4A16 dequant path)."""
    a, w, a_q = data
    w_q = numpy_ref.quantize_q4_0(w)
    out = np.asarray(
        dispatch(prepare(w_q), jnp.asarray(a, jnp.float32),
                 quantize_act=True)
    )
    gold = refg.gemm_wxa8(w_q, a_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m


def test_dispatch_quantize_act_prefill(data):
    """Prefill shapes with quantize_act=True quantize outside the kernel
    and serve through the dequant rung at the format accuracy budget."""
    _, w, _ = data
    a = datagen.normal((32, K), seed=13)
    w_q = numpy_ref.quantize_q4_0(w)
    out = dispatch(prepare(w_q), jnp.asarray(a, jnp.float32),
                   quantize_act=True)
    m = ErrorMetrics.compute(out, refg.gemm_fp32(a, w))
    assert m.nmse < NMSE_VS_FP32["q4_0"], m


def test_dispatch_quantize_act_q5_unfused(data):
    """q5 weights can't take the fused path (qh planes); quantize_act must
    still produce the exact integer result via quantize + gemm_exact."""
    a, w, a_q = data
    w_q = numpy_ref.quantize_q5_0(w)
    out = np.asarray(
        dispatch(prepare(w_q), jnp.asarray(a, jnp.float32),
                 quantize_act=True)
    )
    gold = refg.gemm_wxa8(w_q, a_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m


def test_fused_exact_degenerate_blocks(data):
    """Fused in-kernel quantization handles degenerate activation blocks
    exactly like quantize_q8_1: all-zero blocks (d=0 -> codes 0, s=0) and
    f16-saturating amax blocks (d clips to F16_MAX — the documented
    saturation policy) stay bit-identical to the unfused path."""
    from quant_gemm_tpu.kernels import gemm_exact_fused

    _, w, _ = data
    rng = np.random.default_rng(3)
    a = rng.normal(0, 1, (4, K)).astype(np.float32)
    a[0, 0:32] = 0.0  # zero block
    a[1, 32:64] = 7e8  # amax/127 overflows f16 -> saturates
    a[2, 64:96] = -7e8
    w_q = numpy_ref.quantize_q4_0(w)
    wp = prepare(w_q)
    a_q = jax_quant.quantize_q8_1(jnp.asarray(a))
    base = np.asarray(gemm_exact(wp, a_q))
    fused = np.asarray(gemm_exact_fused(wp, jnp.asarray(a)))
    assert np.array_equal(base, fused)
    assert np.isfinite(fused).all()


@pytest.mark.parametrize("fmt", ["q4_0", "q8_0"])
def test_prepare_device_matches_prepare(fmt, data):
    """prepare_device (on-device init path) is layout-identical to prepare."""
    from quant_gemm_tpu.kernels import gemm_pallas

    _, w, _ = data
    w_np = numpy_ref.QUANTIZE[fmt](w)
    w_j = {"q4_0": jax_quant.quantize_q4_0,
           "q8_0": jax_quant.quantize_q8_0}[fmt](jnp.asarray(w))
    host = gemm_pallas.prepare(w_np)
    dev = gemm_pallas.prepare_device(w_j)
    assert (host.qtype, host.n, host.k) == (dev.qtype, dev.n, dev.k)
    for name in ("packed_t", "qs_t", "d_t", "m_t", "qh_t"):
        h, d = getattr(host, name), getattr(dev, name)
        if h is None:
            assert d is None
        else:
            np.testing.assert_array_equal(np.asarray(h), np.asarray(d),
                                          err_msg=name)


@pytest.mark.parametrize("m_tok", [1, 4, 9])
@pytest.mark.parametrize("fmt", ["q5_0", "q5_1"])
def test_exact_q5_hdot_modes_agree(fmt, m_tok):
    """The q5 x8 reformulation (qh_mode="hdot": native-i8 nibble masks +
    a separate 5th-bit MXU dot combined exactly at int32) must stay
    golden-exact and agree with the legacy i32 path to f32 epilogue-
    regrouping noise — both modes compute the identical integer sumi, so
    any divergence beyond last-ulp regrouping is a decode bug.  Covers
    the stack4 decode path (m<=4) and the per-block path (m=9)."""
    a = datagen.normal((m_tok, K), seed=31)
    w = datagen.normal((N, K), seed=32)
    w_q = numpy_ref.QUANTIZE[fmt](w)
    wp = prepare(w_q)
    a_q = numpy_ref.quantize_q8_1(a)
    aqd = jax_quant.device_put(a_q)
    gold = refg.gemm_wxa8(w_q, a_q)
    hdot = np.asarray(gemm_exact(wp, aqd, qh_mode="hdot"))
    legacy = np.asarray(gemm_exact(wp, aqd, qh_mode="i32"))
    for name, out in (("hdot", hdot), ("i32", legacy)):
        met = ErrorMetrics.compute(out, gold)
        assert met.nmse < 1e-11, (fmt, m_tok, name, met)
    rel = np.max(np.abs(hdot - legacy)) / (np.abs(legacy).max() + 1e-30)
    assert rel < 1e-6, (fmt, m_tok, rel)
    # the mask-only qh2 plane computes the SAME integer sumi through the
    # same f32 grouping as hdot -> bit-identical, not just close
    qh2 = np.asarray(gemm_exact(wp, aqd, qh_mode="qh2"))
    assert np.array_equal(hdot, qh2), (fmt, m_tok)
