"""Q4_K super-block format tests: byte layout, roundtrip, kernel path."""

import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.formats import gguf_file, kquants, numpy_ref
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.harness.metrics import ErrorMetrics
from quant_gemm_tpu.kernels import dispatch, prepare
from quant_gemm_tpu.ref import gemm as refg


def test_block_bytes():
    assert kquants.BLOCK_BYTES == 144  # 2 + 2 + 12 + 128 (block_q4_K)
    assert kquants.QK_K == 256


def test_scale_pack_roundtrip():
    rng = np.random.default_rng(0)
    ls = rng.integers(0, 64, (5, 8)).astype(np.uint8)
    lm = rng.integers(0, 64, (5, 8)).astype(np.uint8)
    b = kquants._pack_scales(ls, lm)
    ls2, lm2 = kquants._unpack_scales(b)
    np.testing.assert_array_equal(ls, ls2)
    np.testing.assert_array_equal(lm, lm2)


def test_bytes_roundtrip_exact():
    x = datagen.normal((4, 512), seed=1)
    t = kquants.quantize_q4_k(x)
    t2 = kquants.from_bytes(kquants.to_bytes(t))
    for a, b in zip(t, t2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantize_roundtrip_accuracy():
    """Q4_K should beat q4_0 (it has sub-block mins + super-scales)."""
    x = datagen.uniform((8, 1024), seed=2)
    back = kquants.dequantize_q4_k(kquants.quantize_q4_k(x))
    m = ErrorMetrics.compute(back, x)
    back40 = numpy_ref.dequantize(numpy_ref.quantize_q4_0(x))
    m40 = ErrorMetrics.compute(back40, x)
    assert m.nmse < 4.5e-3, m  # 15 levels over [min,max]: ~3.6e-3 on uniform
    assert m.nmse < m40.nmse, (m.nmse, m40.nmse)


def test_gemm_via_effective_q41():
    """Q4_K through the kernel ladder (effective per-32 d/m) matches the
    dequantize-then-dot golden near-exactly, and FP32 within budget."""
    a = datagen.normal((4, 512), seed=3)
    w = datagen.normal((384, 512), seed=4)
    t = kquants.quantize_q4_k(w)
    wp = prepare(kquants.to_effective(t))
    assert wp.qtype == "q4_k"
    a_q = numpy_ref.quantize_q8_1(a)
    from quant_gemm_tpu.formats import jax_quant

    out = dispatch(wp, jax_quant.device_put(a_q))
    w_deq = kquants.dequantize_q4_k(t)
    gold = refg.gemm_fp32(numpy_ref.dequantize(a_q), w_deq)
    m = ErrorMetrics.compute(out, gold)
    # exact int dots + f32 effective scales; the kernel's min term uses the
    # f16-stored Q8_1 s_a (llama.cpp semantics) while this golden sums the
    # dequantized activations exactly -> f16-rounding envelope ~2e-7
    assert m.nmse < 1e-6, m
    m_fp = ErrorMetrics.compute(out, refg.gemm_fp32(a, w))
    assert m_fp.nmse < 1e-2, m_fp  # ~6e-3 on normal data (q4_0: ~9.5e-3)


def test_gguf_q4k_roundtrip(tmp_path):
    w = datagen.normal((64, 512), seed=5)
    t = kquants.quantize_q4_k(w)
    path = tmp_path / "k.gguf"
    gguf_file.write_gguf(path, {"w.weight": t})
    gf = gguf_file.GGUFFile(path)
    assert gf.tensors["w.weight"]["qtype"] == "q4_K"
    t2 = gf.load("w.weight")
    for a, b in zip(t, t2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_llamacpp_layout_contract():
    """Hand-decode one serialized super-block exactly like llama.cpp's
    dequantize_row_q4_K (d/dmin f16, get_scale_min_k4, per-64 nibbles)."""
    x = datagen.normal((1, 256), seed=6)
    t = kquants.quantize_q4_k(x)
    blk = kquants.to_bytes(t)[0, 0]  # 144 bytes
    d = np.frombuffer(blk[0:2].tobytes(), np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(blk[2:4].tobytes(), np.float16)[0].astype(np.float32)
    sc = blk[4:16]
    qs = blk[16:144]
    out = np.zeros(256, np.float32)
    for j in range(8):  # get_scale_min_k4
        if j < 4:
            ls, lm = sc[j] & 63, sc[j + 4] & 63
        else:
            ls = (sc[j + 4] & 0xF) | ((sc[j - 4] >> 6) << 4)
            lm = (sc[j + 4] >> 4) | ((sc[j] >> 6) << 4)
        dd, mm = d * ls, dmin * lm
        for i in range(32):
            idx = j * 32 + i
            chunk, off = idx // 64, idx % 64
            byte = qs[chunk * 32 + off % 32]
            q = (byte & 0xF) if off < 32 else (byte >> 4)
            out[idx] = dd * q - mm
    np.testing.assert_allclose(out, kquants.dequantize_q4_k(t)[0], rtol=1e-6)


def test_q6k_decode_llamacpp_semantics():
    """Hand-decode a random block_q6_K byte pattern with a scalar transcription
    of llama.cpp dequantize_row_q6_K and compare to the vectorized decoder."""
    rng = np.random.default_rng(9)
    n, nsb = 2, 3
    raw = rng.integers(0, 256, (n, nsb, 210)).astype(np.uint8)
    # keep d finite: overwrite the f16 bytes with a sane value
    d_val = np.full((n, nsb), 0.01, np.float16)
    raw[:, :, 208:210] = d_val.view(np.uint8).reshape(n, nsb, 2)

    out = kquants.dequantize_q6_k_bytes(raw)

    for ni in range(n):
        for si in range(nsb):
            blk = raw[ni, si]
            ql, qh = blk[0:128], blk[128:192]
            sc = blk[192:208].copy().view(np.int8)
            d = float(blk[208:210].copy().view(np.float16)[0])
            y = np.zeros(256, np.float32)
            for half in range(2):
                for l in range(32):
                    b = half * 128
                    is_ = half * 64
                    ih = half * 32
                    q1 = (ql[is_ + l] & 0xF) | (((qh[ih + l] >> 0) & 3) << 4)
                    q2 = (ql[is_ + l + 32] & 0xF) | (((qh[ih + l] >> 2) & 3) << 4)
                    q3 = (ql[is_ + l] >> 4) | (((qh[ih + l] >> 4) & 3) << 4)
                    q4 = (ql[is_ + l + 32] >> 4) | (((qh[ih + l] >> 6) & 3) << 4)
                    for seg, q in enumerate((q1, q2, q3, q4)):
                        idx = b + seg * 32 + l
                        y[idx] = d * float(sc[idx // 16]) * (int(q) - 32)
            np.testing.assert_allclose(
                out[ni, si * 256 : (si + 1) * 256], y, rtol=1e-6, atol=1e-7
            )


def test_gguf_loader_q6k_lm_head(tmp_path):
    """q6_K byte decoding sanity on the Q4_K_M output.weight pattern
    (native serving covered by test_gguf_q6k_native_load below)."""
    import struct as _struct

    w = datagen.normal((64, 512), seed=10)
    # build q6_K bytes by... encoding is out of scope; emulate a file by
    # writing f32 then checking the q6_K read path with synthetic bytes
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 256, (64, 2, 210)).astype(np.uint8)
    d_val = np.full((64, 2), 0.01, np.float16)
    raw[:, :, 208:210] = d_val.view(np.uint8).reshape(64, 2, 2)
    x = kquants.dequantize_q6_k_bytes(raw)
    assert x.shape == (64, 512)
    assert np.isfinite(x).all()


# ---------------------------------------------------------------------------
# Q5_K
# ---------------------------------------------------------------------------


def test_q5k_block_bytes():
    assert kquants.QK5_BLOCK_BYTES == 176  # 2 + 2 + 12 + 32 + 128


def test_q5k_bytes_roundtrip_exact():
    x = datagen.normal((4, 512), seed=21)
    t = kquants.quantize_q5_k(x)
    t2 = kquants.from_bytes_q5_k(kquants.to_bytes_q5_k(t))
    for a, b in zip(t, t2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_q5k_quantize_roundtrip_accuracy():
    """Q5_K (31 levels + sub-block mins) should beat both q5_0 and q4_k."""
    x = datagen.uniform((8, 1024), seed=22)
    back = kquants.dequantize_q5_k(kquants.quantize_q5_k(x))
    m = ErrorMetrics.compute(back, x)
    m50 = ErrorMetrics.compute(
        numpy_ref.dequantize(numpy_ref.quantize_q5_0(x)), x
    )
    m4k = ErrorMetrics.compute(
        kquants.dequantize_q4_k(kquants.quantize_q4_k(x)), x
    )
    assert m.nmse < 1.1e-3, m
    assert m.nmse < m50.nmse, (m.nmse, m50.nmse)
    assert m.nmse < m4k.nmse, (m.nmse, m4k.nmse)


def test_q5k_gemm_via_effective_q51():
    """Q5_K through the kernel ladder (effective per-32 d/m + qh plane)
    matches the dequantize-then-dot golden near-exactly."""
    a = datagen.normal((4, 512), seed=23)
    w = datagen.normal((384, 512), seed=24)
    t = kquants.quantize_q5_k(w)
    wp = prepare(kquants.to_effective_q5_k(t))
    assert wp.qtype == "q5_k"
    assert wp.qh_t is not None
    a_q = numpy_ref.quantize_q8_1(a)
    from quant_gemm_tpu.formats import jax_quant

    out = dispatch(wp, jax_quant.device_put(a_q))
    w_deq = kquants.dequantize_q5_k(t)
    gold = refg.gemm_fp32(numpy_ref.dequantize(a_q), w_deq)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-6, m
    m_fp = ErrorMetrics.compute(out, refg.gemm_fp32(a, w))
    assert m_fp.nmse < 6e-3, m_fp  # 5-bit + mins: tighter than q4_k


def test_gguf_q5k_roundtrip(tmp_path):
    w = datagen.normal((64, 512), seed=25)
    t = kquants.quantize_q5_k(w)
    path = tmp_path / "k5.gguf"
    gguf_file.write_gguf(path, {"w.weight": t})
    gf = gguf_file.GGUFFile(path)
    assert gf.tensors["w.weight"]["qtype"] == "q5_K"
    t2 = gf.load("w.weight")
    for a, b in zip(t, t2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_q5k_llamacpp_layout_contract():
    """Hand-decode one serialized super-block exactly like llama.cpp's
    dequantize_row_q5_K (per-64 nibbles, qh bit pairs u1/u2 per chunk)."""
    x = datagen.normal((1, 256), seed=26)
    t = kquants.quantize_q5_k(x)
    blk = kquants.to_bytes_q5_k(t)[0, 0]  # 176 bytes
    d = np.frombuffer(blk[0:2].tobytes(), np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(blk[2:4].tobytes(), np.float16)[0].astype(np.float32)
    sc = blk[4:16]
    qh = blk[16:48]
    ql = blk[48:176]
    out = np.zeros(256, np.float32)
    u1, u2 = 1, 2
    y = 0
    for c in range(4):  # 64-element chunks; two sub-blocks each
        for j2, u in ((2 * c, u1), (2 * c + 1, u2)):
            if j2 < 4:
                ls, lm = sc[j2] & 63, sc[j2 + 4] & 63
            else:
                ls = (sc[j2 + 4] & 0xF) | ((sc[j2 - 4] >> 6) << 4)
                lm = (sc[j2 + 4] >> 4) | ((sc[j2] >> 6) << 4)
            dd, mm = d * ls, dmin * lm
            for l in range(32):
                byte = ql[c * 32 + l]
                q = (byte & 0xF) if j2 % 2 == 0 else (byte >> 4)
                if qh[l] & u:
                    q += 16
                out[y] = dd * q - mm
                y += 1
        u1 <<= 2
        u2 <<= 2
    np.testing.assert_allclose(out, kquants.dequantize_q5_k(t)[0], rtol=1e-6,
                               atol=1e-7)


@pytest.mark.slow
def test_q5k_model_serving():
    """quantize_params(qtype='q5_k') serves a whole model."""
    import jax.numpy as _jnp

    from quant_gemm_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, dim=256, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=256, max_seq=32)
    params = llama.init_params(cfg, seed=27)
    qp = llama.quantize_params(params, "q5_k")
    toks = _jnp.asarray(np.random.default_rng(3).integers(1, 64, (1, 8)),
                        _jnp.int32)
    out, _ = llama.forward(qp, cfg, toks, llama.KVCache.init(cfg, 1))
    ref, _ = llama.forward_float(params, cfg, toks, llama.KVCache.init(cfg, 1))
    m = ErrorMetrics.compute(out, ref)
    assert m.nmse < 2e-2, m


# ---------------------------------------------------------------------------
# Q2_K / Q3_K decode
# ---------------------------------------------------------------------------


def test_q2k_decode_llamacpp_semantics():
    """Random block_q2_K bytes vs a scalar transcription of llama.cpp
    dequantize_row_q2_K (2-bit codes, per-16 4|4-bit scale/min bytes)."""
    rng = np.random.default_rng(30)
    n, nsb = 2, 3
    raw = rng.integers(0, 256, (n, nsb, 84)).astype(np.uint8)
    for off in (80, 82):  # keep d/dmin finite
        v = np.full((n, nsb), 0.01, np.float16)
        raw[:, :, off:off + 2] = v.view(np.uint8).reshape(n, nsb, 2)

    out = kquants.dequantize_q2_k_bytes(raw)

    for ni in range(n):
        for si in range(nsb):
            blk = raw[ni, si]
            scales, q = blk[0:16], blk[16:80]
            d = float(blk[80:82].copy().view(np.float16)[0])
            dmin = float(blk[82:84].copy().view(np.float16)[0])
            y = np.zeros(256, np.float32)
            yi = 0
            qoff = 0
            is_ = 0
            for nn in range(0, 256, 128):
                shift = 0
                for j in range(4):
                    for half in range(2):
                        sc = scales[is_]
                        is_ += 1
                        dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
                        for l in range(half * 16, half * 16 + 16):
                            y[yi] = dl * ((q[qoff + l] >> shift) & 3) - ml
                            yi += 1
                    shift += 2
                qoff += 32
            np.testing.assert_allclose(
                out[ni, si * 256 : (si + 1) * 256], y, rtol=1e-6, atol=1e-7
            )


def test_q3k_decode_llamacpp_semantics():
    """Random block_q3_K bytes vs a scalar transcription of llama.cpp
    dequantize_row_q3_K (kmask aux scale unpack, hmask high bits)."""
    rng = np.random.default_rng(31)
    n, nsb = 2, 3
    raw = rng.integers(0, 256, (n, nsb, 110)).astype(np.uint8)
    v = np.full((n, nsb), 0.01, np.float16)
    raw[:, :, 108:110] = v.view(np.uint8).reshape(n, nsb, 2)

    out = kquants.dequantize_q3_k_bytes(raw)

    kmask1, kmask2 = 0x03030303, 0x0F0F0F0F
    for ni in range(n):
        for si in range(nsb):
            blk = raw[ni, si]
            hm, qs = blk[0:32], blk[32:96]
            d_all = float(blk[108:110].copy().view(np.float16)[0])
            aux = list(np.frombuffer(blk[96:108].tobytes(), np.uint32))
            tmp = int(aux[2])
            a = [0] * 4
            a[0] = (int(aux[0]) & kmask2) | (((tmp >> 0) & kmask1) << 4)
            a[1] = (int(aux[1]) & kmask2) | (((tmp >> 2) & kmask1) << 4)
            a[2] = ((int(aux[0]) >> 4) & kmask2) | (((tmp >> 4) & kmask1) << 4)
            a[3] = ((int(aux[1]) >> 4) & kmask2) | (((tmp >> 6) & kmask1) << 4)
            sc16 = np.array(a, np.uint32).view(np.uint8).astype(np.int32)
            y = np.zeros(256, np.float32)
            yi = 0
            qoff = 0
            m = 1
            is_ = 0
            for nn in range(0, 256, 128):
                shift = 0
                for j in range(4):
                    for half in range(2):
                        dl = d_all * (int(sc16[is_]) - 32)
                        is_ += 1
                        for l in range(half * 16, half * 16 + 16):
                            qv = (int(qs[qoff + l]) >> shift) & 3
                            if not (int(hm[l]) & m):
                                qv -= 4
                            y[yi] = dl * qv
                            yi += 1
                    shift += 2
                    m <<= 1  # hmask bit advances per 32-group (8 bits/byte)
                qoff += 32
            np.testing.assert_allclose(
                out[ni, si * 256 : (si + 1) * 256], y, rtol=1e-6, atol=1e-7
            )


def test_gguf_q2k_q3k_load_native(tmp_path):
    """q2_K/q3_K tensors in a GGUF load as native SoA containers whose
    dequant matches the llama.cpp byte decoder (byte-preserving)."""
    rng = np.random.default_rng(32)
    for qt, bb in (("q2_K", 84), ("q3_K", 110)):
        raw = rng.integers(0, 256, (8, 2, bb)).astype(np.uint8)
        offs = {"q2_K": (80, 82), "q3_K": (108,)}[qt]  # d (and dmin)
        v = np.full((8, 2), 0.01, np.float16)
        for off in offs:
            raw[:, :, off:off + 2] = v.view(np.uint8).reshape(8, 2, 2)
        path = tmp_path / f"{qt}.gguf"
        gguf_file.write_gguf(
            path, {"w.weight": gguf_file.RawTensor(qt, (8, 512), raw.tobytes())}
        )
        gf = gguf_file.GGUFFile(path)
        assert gf.tensors["w.weight"]["qtype"] == qt
        t = gf.load("w.weight")
        decode = {"q2_K": kquants.dequantize_q2_k_bytes,
                  "q3_K": kquants.dequantize_q3_k_bytes}[qt]
        deq = {"q2_K": kquants.dequantize_q2_k,
               "q3_K": kquants.dequantize_q3_k}[qt]
        enc = {"q2_K": kquants.to_bytes_q2_k,
               "q3_K": kquants.to_bytes_q3_k}[qt]
        np.testing.assert_array_equal(deq(t), decode(raw))
        np.testing.assert_array_equal(enc(t), raw)


# ---------------------------------------------------------------------------
# Q6_K native serving (per-16-scale exact kernel — no requantization)
# ---------------------------------------------------------------------------


def _random_q6k(n, k, seed):
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, (n, k // 256, 210), dtype=np.uint8)
    raw[:, :, 209] &= 0x7B  # keep the f16 super-scale finite
    return raw


def test_q6k_container_roundtrip():
    """from_bytes_q6_k / to_bytes_q6_k are exact inverses, and the SoA
    dequant equals the llama.cpp byte decoder."""
    raw = _random_q6k(5, 768, seed=0)
    t = kquants.from_bytes_q6_k(raw)
    assert np.array_equal(kquants.to_bytes_q6_k(t), raw)
    assert np.array_equal(kquants.dequantize_q6_k(t),
                          kquants.dequantize_q6_k_bytes(raw))


def test_q6k_native_kernel_vs_golden():
    """gemm_exact_q6k serves the EXACT stored codes with per-16 scales;
    matches the numpy integer golden to f32-accumulation tolerance."""
    from quant_gemm_tpu.formats import jax_quant
    from quant_gemm_tpu.kernels.gemm_exact import gemm_exact_q6k, prepare_q6k

    t = kquants.from_bytes_q6_k(_random_q6k(256, 512, seed=1))
    a = datagen.normal((5, 512), seed=2)
    a_q = numpy_ref.quantize_q8_1(a)
    gold = kquants.gemm_q6k_ref(t, a_q)
    out = np.asarray(gemm_exact_q6k(prepare_q6k(t), jax_quant.device_put(a_q)))
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m

    # dispatch routes the container AND float activations (quantize_act)
    out2 = np.asarray(dispatch(t, jax_quant.device_put(a_q)))
    assert np.array_equal(out, out2)
    out3 = np.asarray(
        dispatch(t, jnp.asarray(a, jnp.float32), quantize_act=True)
    )
    assert np.array_equal(out, out3)


def test_gguf_q6k_native_load(tmp_path):
    """A GGUF q6_K tensor now loads as a Q6_KTensor container (native
    serving), byte-preserving through write/read."""
    raw = _random_q6k(64, 512, seed=3)
    path = tmp_path / "q6k.gguf"
    gguf_file.write_gguf(
        path,
        {"output.weight": gguf_file.RawTensor("q6_K", (64, 512),
                                              raw.tobytes())},
    )
    t = gguf_file.GGUFFile(path).load("output.weight")
    assert t.__class__.__name__ == "Q6_KTensor"
    assert np.array_equal(kquants.to_bytes_q6_k(t), raw)


@pytest.mark.parametrize("qt", ["q2_K", "q3_K"])
def test_q23k_native_roundtrip_and_kernel(qt):
    """Q2_K/Q3_K: byte round-trip exact, SoA dequant == llama.cpp byte
    decoder, native per-16 kernel matches the integer golden, dispatch
    routes the container."""
    from quant_gemm_tpu.formats import jax_quant
    from quant_gemm_tpu.kernels.gemm_exact import gemm_exact_k16, prepare_k16

    rng = np.random.default_rng(11)
    bb = {"q2_K": 84, "q3_K": 110}[qt]
    raw = rng.integers(0, 256, (256, 2, bb), dtype=np.uint8)
    if qt == "q2_K":
        raw[:, :, 81] &= 0x7B  # finite d
        raw[:, :, 83] &= 0x7B  # finite dmin
        t = kquants.from_bytes_q2_k(raw)
        assert np.array_equal(kquants.to_bytes_q2_k(t), raw)
        assert np.array_equal(kquants.dequantize_q2_k(t),
                              kquants.dequantize_q2_k_bytes(raw))
    else:
        raw[:, :, 109] &= 0x7B
        t = kquants.from_bytes_q3_k(raw)
        assert np.array_equal(kquants.to_bytes_q3_k(t), raw)
        assert np.array_equal(kquants.dequantize_q3_k(t),
                              kquants.dequantize_q3_k_bytes(raw))

    a = datagen.normal((5, 512), seed=2)
    a_q = numpy_ref.quantize_q8_1(a)
    gold = kquants.gemm_k16_ref(t, a_q)
    out = np.asarray(gemm_exact_k16(prepare_k16(t), jax_quant.device_put(a_q)))
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m
    out2 = np.asarray(dispatch(t, jax_quant.device_put(a_q)))
    assert np.array_equal(out, out2)


@pytest.mark.parametrize("qt,budget", [("q6_k", 2e-3), ("q3_k", 8e-2),
                                       ("q2_k", 3e-1)])
def test_k16_quantize_roundtrip(qt, budget):
    """Encode direction for the per-16 K-quants: format-exact bytes
    (stable through to_bytes/from_bytes) at the expected accuracy class."""
    qf = {"q2_k": kquants.quantize_q2_k, "q3_k": kquants.quantize_q3_k,
          "q6_k": kquants.quantize_q6_k}[qt]
    deq = {"q2_k": kquants.dequantize_q2_k, "q3_k": kquants.dequantize_q3_k,
           "q6_k": kquants.dequantize_q6_k}[qt]
    enc = {"q2_k": kquants.to_bytes_q2_k, "q3_k": kquants.to_bytes_q3_k,
           "q6_k": kquants.to_bytes_q6_k}[qt]
    dec = {"q2_k": kquants.from_bytes_q2_k, "q3_k": kquants.from_bytes_q3_k,
           "q6_k": kquants.from_bytes_q6_k}[qt]
    x = datagen.normal((8, 512), seed=4)
    t = qf(x)
    y = deq(t)
    nmse = float(((y - x) ** 2).mean() / (x ** 2).mean())
    assert nmse < budget, (qt, nmse)
    assert np.array_equal(deq(dec(enc(t))), y)


@pytest.mark.slow
def test_q6k_model_serving():
    """A tiny llama quantized to q6_k serves through the native per-16
    kernel; logits track the float reference at the format budget."""
    import jax

    from quant_gemm_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=48, dim=256, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=256, max_seq=32)
    params = llama.init_params(cfg, seed=1)
    qp = llama.quantize_params(params, "q6_k")  # K dims must be 256-mults
    toks = jnp.asarray([[3, 7, 9, 2]], jnp.int32)
    out, _ = llama.jit_forward(qp, cfg, toks, llama.KVCache.init(cfg, 1))
    ref, _ = jax.jit(llama.forward_float, static_argnames=("cfg",))(
        params, cfg, toks, llama.KVCache.init(cfg, 1)
    )
    m = ErrorMetrics.compute(np.asarray(out), np.asarray(ref))
    assert m.nmse < 2e-2, m


def test_k16_a16_accuracy_mode():
    """dispatch(k16 weight, float act) without quantize_act serves the
    WxA16 accuracy mode (XLA dequant + matmul), matching dequantize-then-
    dot instead of silently quantizing the activations."""
    t = kquants.quantize_q6_k(datagen.normal((256, 512), seed=7))
    a = datagen.normal((4, 512), seed=8)
    out = np.asarray(dispatch(t, jnp.asarray(a, jnp.float32)))
    gold = refg.gemm_fp32(a, kquants.dequantize_q6_k(t))
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-9, m  # no activation quantization in this mode


def test_iq4_nl_roundtrip_and_gguf(tmp_path):
    """IQ4_NL (llama.cpp i-quant, GGUF type 20): format-exact encoder,
    LUT-expanded Q8_0 container serving, GGUF load path."""
    x = datagen.normal((64, 256), seed=9)
    raw = kquants.quantize_iq4_nl(x)
    y = kquants.dequantize_iq4_nl_bytes(raw)
    nmse = float(((y - x) ** 2).mean() / (x ** 2).mean())
    assert nmse < 9e-3  # non-linear codebook beats q4_0's ~9.4e-3 class
    t = kquants.from_bytes_iq4_nl(raw)
    assert type(t).__name__ == "Q8_0Tensor"  # serves via the q8_0 path

    path = tmp_path / "iq4.gguf"
    gguf_file.write_gguf(
        path,
        {"w.weight": gguf_file.RawTensor("iq4_nl", (64, 256), raw.tobytes())},
    )
    t2 = gguf_file.GGUFFile(path).load("w.weight")
    np.testing.assert_array_equal(np.asarray(t.qs), np.asarray(t2.qs))
    np.testing.assert_array_equal(np.asarray(t.d), np.asarray(t2.d))

    # exact kernel serves the container through dispatch
    from quant_gemm_tpu.formats import jax_quant

    a = datagen.normal((4, 256), seed=10)
    a_q = numpy_ref.quantize_q8_1(a)
    out = np.asarray(dispatch(prepare(t), jax_quant.device_put(a_q)))
    gold = refg.gemm_wxa8(t, a_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m


@pytest.mark.slow
def test_q4km_pattern_model_serving(tmp_path):
    """The real Q4_K_M file pattern: q4_K layer weights + a q6_K
    output.weight in ONE GGUF, loaded and served end to end — the q6_K
    lm_head goes through the native per-16 kernel, not requantization."""
    from quant_gemm_tpu.formats.gguf_file import write_gguf
    from quant_gemm_tpu.kernels.gemm_exact import PreparedK16
    from quant_gemm_tpu.models import llama
    from quant_gemm_tpu.models.gguf_loader import load_llama

    cfg = llama.LlamaConfig(vocab=64, dim=256, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=256, max_seq=32)
    params = llama.init_params(cfg, seed=2)
    tensors = {
        "token_embd.weight": np.asarray(params["embed"], np.float32),
        "output_norm.weight": np.asarray(params["final_norm"], np.float32),
        "output.weight": kquants.quantize_q6_k(
            np.asarray(params["lm_head"], np.float32)),
    }
    lyr = params["layers"][0]
    names = {"attn_norm": "blk.0.attn_norm.weight",
             "mlp_norm": "blk.0.ffn_norm.weight"}
    for k_, n_ in names.items():
        tensors[n_] = np.asarray(lyr[k_], np.float32)
    for k_, n_ in [("wq", "blk.0.attn_q.weight"), ("wk", "blk.0.attn_k.weight"),
                   ("wv", "blk.0.attn_v.weight"), ("wo", "blk.0.attn_output.weight"),
                   ("w_gate", "blk.0.ffn_gate.weight"), ("w_up", "blk.0.ffn_up.weight"),
                   ("w_down", "blk.0.ffn_down.weight")]:
        tensors[n_] = kquants.quantize_q4_k(np.asarray(lyr[k_], np.float32))
    path = tmp_path / "q4km.gguf"
    write_gguf(path, tensors, metadata={
        "general.architecture": "llama",
        "llama.embedding_length": cfg.dim,
        "llama.block_count": cfg.n_layers,
        "llama.attention.head_count": cfg.n_heads,
        "llama.attention.head_count_kv": cfg.n_kv_heads,
        "llama.feed_forward_length": cfg.d_ff,
        "llama.context_length": cfg.max_seq,
        "llama.vocab_size": cfg.vocab,
    })

    qparams, cfg2 = load_llama(path)
    assert isinstance(qparams["lm_head"], PreparedK16)  # native q6_K
    toks = jnp.asarray([[3, 7, 9, 2]], jnp.int32)
    out, cache = llama.jit_forward(qparams, cfg2, toks,
                                   llama.KVCache.init(cfg2, 1))
    import jax

    ref, _ = jax.jit(llama.forward_float, static_argnames=("cfg",))(
        params, cfg2, toks, llama.KVCache.init(cfg2, 1))
    m = ErrorMetrics.compute(np.asarray(out), np.asarray(ref))
    assert m.nmse < 5e-2, m  # 4-bit weights end to end on random params
    nxt = jnp.argmax(out[:, -1:], -1).astype(jnp.int32)
    d, _ = llama.jit_forward(qparams, cfg2, nxt, cache)
    assert bool(jnp.isfinite(d).all())


def test_iq4_xs_decode_and_kernel(tmp_path):
    """IQ4_XS (GGUF type 23): vectorized decode pinned against a scalar
    llama.cpp dequantize_row_iq4_xs transcription; served through the
    q8_0-style exact kernel with f32 effective per-32 scales."""
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (256, 2, 136), dtype=np.uint8)
    raw[:, :, 1] &= 0x3B  # keep d finite and small-ish
    t = kquants.from_bytes_iq4_xs(raw)
    # scalar transcription on one block
    blk = raw[5, 1]
    d = float(blk[0:2].copy().view(np.float16)[0])
    sh = int(blk[2]) | (int(blk[3]) << 8)
    y = np.zeros(256, np.float32)
    for ib in range(8):
        ls = (((int(blk[4 + ib // 2]) >> (4 * (ib % 2))) & 0xF)
              | (((sh >> (2 * ib)) & 3) << 4))
        dl = d * (ls - 32)
        for j in range(16):
            q = int(blk[8 + ib * 16 + j])
            y[ib * 32 + j] = dl * float(kquants.KVALUES_IQ4NL[q & 0xF])
            y[ib * 32 + j + 16] = dl * float(kquants.KVALUES_IQ4NL[q >> 4])
    got = kquants.dequantize_iq4_xs_bytes(raw)[5, 256:512]
    np.testing.assert_allclose(got, y, rtol=1e-6)

    # GGUF round trip + exact kernel serving
    path = tmp_path / "iq4xs.gguf"
    gguf_file.write_gguf(path, {"w.weight": gguf_file.RawTensor(
        "iq4_xs", (256, 512), raw.tobytes())})
    t2 = gguf_file.GGUFFile(path).load("w.weight")
    np.testing.assert_array_equal(np.asarray(t.qs), np.asarray(t2.qs))
    np.testing.assert_array_equal(t.d, t2.d)

    from quant_gemm_tpu.formats import jax_quant

    a = datagen.normal((4, 512), seed=11)
    a_q = numpy_ref.quantize_q8_1(a)
    out = np.asarray(dispatch(prepare(t), jax_quant.device_put(a_q)))
    gold = refg.gemm_wxa8(t, a_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-10, m


def test_k16_prefill_dispatch_routes_to_dequant():
    """Prefill-shaped (M > DECODE_M_MAX) GEMMs on per-16 K-quants must NOT
    run the 16-deep exact MXU kernel; dispatch routes them to the dequant
    matmul (same policy as the per-32 ladder)."""
    from quant_gemm_tpu.formats import jax_quant
    from quant_gemm_tpu.kernels.gemm_exact import gemm_exact_q6k, prepare_q6k
    from quant_gemm_tpu.kernels.registry import DECODE_M_MAX, _k16_dequant_gemm

    t = kquants.from_bytes_q6_k(_random_q6k(128, 512, seed=7))
    m = DECODE_M_MAX + 4
    a = datagen.normal((m, 512), seed=8)
    a_q = numpy_ref.quantize_q8_1(a)
    wq = prepare_q6k(t)

    out = np.asarray(dispatch(t, jax_quant.device_put(a_q)))
    want = np.asarray(
        _k16_dequant_gemm(wq, jax_quant.dequantize(jax_quant.device_put(a_q)))
    )
    assert np.array_equal(out, want)
    # float path with quantize_act skips quantization entirely in prefill
    outf = np.asarray(dispatch(t, jnp.asarray(a, jnp.float32),
                               quantize_act=True))
    assert np.array_equal(
        outf, np.asarray(_k16_dequant_gemm(wq, jnp.asarray(a, jnp.float32)))
    )
    # both stay close to the exact kernel's answer (same weights)
    gold = np.asarray(gemm_exact_q6k(wq, jax_quant.device_put(a_q)))
    assert ErrorMetrics.compute(out, gold).nmse < 1e-3


def test_k16_tp_stacking_raises_clear_error():
    """PreparedK16 tensors are single-chip only: TP stacking must raise a
    scoped TypeError, not a bare AttributeError mid-forward."""
    import jax

    import pytest

    from quant_gemm_tpu.kernels.gemm_exact import prepare_q6k
    from quant_gemm_tpu.models import llama_tp
    from quant_gemm_tpu.parallel import sharding as sh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (virtual CPU mesh)")
    mesh = sh.make_mesh({"tp": 4})
    wq = prepare_q6k(kquants.from_bytes_q6_k(_random_q6k(16, 256, seed=9)))
    with pytest.raises(TypeError, match="single-chip"):
        llama_tp._stack_prepared([wq] * 4, mesh, "tp")


@pytest.mark.parametrize(
    "quantize,dequantize",
    [
        (kquants.quantize_q4_k, kquants.dequantize_q4_k),
        (kquants.quantize_q5_k, kquants.dequantize_q5_k),
    ],
    ids=["q4_k", "q5_k"],
)
def test_qkx2_search_beats_simple_encoder(quantize, dequantize):
    """The make_qkx2-style weighted search (default) must round-trip
    measurably better than the min/max encoder on normal data (~5-8%
    RMSE, matching llama.cpp's quantize_row_qX_K_ref gain), and both
    must stay format-exact (byte round-trip covered elsewhere)."""
    x = datagen.normal((64, 1024), seed=7)
    simple = dequantize(quantize(x, search=False))
    searched = dequantize(quantize(x, search=True))
    rmse_simple = float(np.sqrt(((simple - x) ** 2).mean()))
    rmse_search = float(np.sqrt(((searched - x) ** 2).mean()))
    assert rmse_search < 0.98 * rmse_simple, (rmse_search, rmse_simple)


def test_qkx2_search_degenerate_blocks():
    """Constant / zero / all-positive-constant sub-blocks must not NaN and
    must reconstruct exactly under the search encoder."""
    x = np.zeros((2, 512), np.float32)
    x[0, :32] = 3.25  # constant positive block: scale 0, min clamped to 0 -> codes 0? reconstruct via min
    x[1, 64:96] = -1.5  # constant negative block
    t = kquants.quantize_q4_k(x, search=True)
    back = kquants.dequantize_q4_k(t)
    assert np.isfinite(back).all()
    # negative-constant block is exactly representable via the min term
    assert np.allclose(back[1, 64:96], -1.5, atol=2e-2), back[1, 64:96][:4]
