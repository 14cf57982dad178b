"""Direct unit tests for the decode layer megakernels
(kernels/gemm_megalayer.py).

The megakernels fuse RMSNorm + Q8_1 quantization + GEMM chains into single
Pallas calls for the T=1 serving path.  Their contract: bit-identical to
the unfused quantize-then-``gemm_exact`` chain on the CPU backend (same
XLA ops in the same order under interpret mode); on hardware the in-kernel
glue may differ at f32-ulp level (adjudicated on-chip by
scripts/lab_mega.py).  These tests pin the CPU bit-identity per kernel,
odd/padded batch handling, and the unsupported-layer fallback predicates.

Reference parity note: the reference's fused kernel analogue is
kernels/gemm/gemm_fused.cuh:158-302 (quantize fused into GEMM); the layer-
level fusion has no CUDA counterpart.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.formats import jax_quant, numpy_ref
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.kernels import gemm_megalayer as mega
from quant_gemm_tpu.kernels.gemm_exact import gemm_exact
from quant_gemm_tpu.kernels.gemm_pallas import prepare
from quant_gemm_tpu.ops.activations import silu_mul
from quant_gemm_tpu.ops.rms_norm import rms_norm

DIM, DFF = 512, 1024
EPS = 1e-5

ON_TPU = jax.default_backend() == "tpu"


@pytest.fixture(scope="module")
def weights():
    rng = np.random.default_rng(7)
    wqkv = prepare(numpy_ref.quantize_q4_0(
        rng.normal(0, 0.05, (3 * DIM, DIM)).astype(np.float32)))
    wo = prepare(numpy_ref.quantize_q4_0(
        rng.normal(0, 0.05, (DIM, DIM)).astype(np.float32)))
    wgu = prepare(numpy_ref.quantize_q4_0(
        rng.normal(0, 0.05, (2 * DFF, DIM)).astype(np.float32)))
    wd = prepare(numpy_ref.quantize_q4_0(
        rng.normal(0, 0.05, (DIM, DFF)).astype(np.float32)))
    nw = jnp.asarray(rng.normal(1, 0.02, (DIM,)), jnp.float32)
    return wqkv, wo, wgu, wd, nw


def _unfused_qkv(wqkv, x, nw):
    h = rms_norm(x, nw, EPS)
    return gemm_exact(wqkv, jax_quant.quantize_q8_1(h))


def _unfused_tail(attn, x, nw, wo, wgu, wd):
    o = gemm_exact(wo, jax_quant.quantize_q8_1(attn))
    xm = x + o
    h = rms_norm(xm, nw, EPS)
    gu = gemm_exact(wgu, jax_quant.quantize_q8_1(h))
    ff = silu_mul(gu[:, :DFF], gu[:, DFF:])
    return xm + gemm_exact(wd, jax_quant.quantize_q8_1(ff))


def _close(a, b, exact=True):
    """Bit-identity on CPU; quant-noise-bounded delta on real hardware.

    ``exact=False`` covers m <= 4, where the unfused ``gemm_exact`` takes
    its stack4 decode epilogue (different f32 accumulation order than the
    megakernel's unstacked plane) — agreement is then f32-ulp-limited.
    """
    a, b = np.asarray(a), np.asarray(b)
    delta = ((a - b) ** 2).mean() / (b.var() + 1e-30)
    if not ON_TPU and exact:
        np.testing.assert_array_equal(a, b)
    elif not ON_TPU:
        assert delta < 1e-10, f"delta-NMSE {delta:.2e}"
    else:
        assert delta < 1e-5, f"on-chip delta-NMSE {delta:.2e}"


@pytest.mark.parametrize("m", [8, 5, 1])
def test_norm_qkv_matches_unfused(weights, m):
    wqkv, _wo, _wgu, _wd, nw = weights
    x = jnp.asarray(datagen.normal((m, DIM), seed=m), jnp.float32)
    got = mega.norm_qkv(wqkv, x, nw, EPS)
    want = _unfused_qkv(wqkv, x, nw)
    assert got.shape == want.shape == (m, 3 * DIM)
    _close(got, want, exact=m > 4)


@pytest.mark.parametrize("m", [8, 5, 1])
def test_attn_tail_matches_unfused(weights, m):
    _wqkv, wo, wgu, wd, nw = weights
    attn = jnp.asarray(datagen.normal((m, DIM), seed=10 + m), jnp.float32)
    x = jnp.asarray(datagen.normal((m, DIM), seed=20 + m), jnp.float32)
    got = mega.attn_tail(attn, x, nw, wo, wgu, wd, EPS, DFF)
    want = _unfused_tail(attn, x, nw, wo, wgu, wd)
    assert got.shape == want.shape == (m, DIM)
    _close(got, want, exact=m > 4)


@pytest.mark.parametrize("fmt", ["q4_1", "q4_k"])
@pytest.mark.parametrize("m", [8, 3])
def test_norm_qkv_min_plane_formats(fmt, m):
    """Min-plane weights (q4_1 and the K-quant effective container a
    Q4_K_M GGUF loads) take the megakernel too (VERDICT r4 item 5)."""
    rng = np.random.default_rng(11)
    wf = rng.normal(0, 0.05, (3 * DIM, DIM)).astype(np.float32)
    if fmt == "q4_1":
        wq = numpy_ref.quantize_q4_1(wf)
    else:
        from quant_gemm_tpu.formats import kquants

        wq = kquants.to_effective(kquants.quantize_q4_k(wf))
    w = prepare(wq)
    assert w.m_t is not None and w.qtype == fmt
    assert mega._supported_w(w, k=DIM)
    nw = jnp.asarray(rng.normal(1, 0.02, (DIM,)), jnp.float32)
    x = jnp.asarray(datagen.normal((m, DIM), seed=30 + m), jnp.float32)
    got = mega.norm_qkv(w, x, nw, EPS)
    want = _unfused_qkv(w, x, nw)
    assert got.shape == want.shape == (m, 3 * DIM)
    _close(got, want, exact=m > 4)


@pytest.mark.parametrize("fmt", ["q5_0", "q5_1", "q5_k"])
def test_norm_qkv_q5_family(fmt):
    """The q5 family rides the megakernel via the nibble-packed qh2 plane
    (sumi = nib_dot + 16*h_dot at int32, as gemm_exact qh_mode='qh2')."""
    rng = np.random.default_rng(13)
    wf = rng.normal(0, 0.05, (3 * DIM, DIM)).astype(np.float32)
    if fmt == "q5_k":
        from quant_gemm_tpu.formats import kquants

        wq = kquants.to_effective_q5_k(kquants.quantize_q5_k(wf))
    else:
        wq = numpy_ref.QUANTIZE[fmt](wf)
    w = prepare(wq)
    assert w.qh2_t is not None and mega._supported_w(w, k=DIM)
    nw = jnp.asarray(rng.normal(1, 0.02, (DIM,)), jnp.float32)
    x = jnp.asarray(datagen.normal((8, DIM), seed=40), jnp.float32)
    got = mega.norm_qkv(w, x, nw, EPS)
    want = _unfused_qkv(w, x, nw)
    assert got.shape == want.shape == (8, 3 * DIM)
    _close(got, want, exact=True)


def test_q4k_model_decode_mega_on_off():
    """A q4_k-quantized model's decode must route through norm_qkv and
    produce identical logits with the megakernel on and off."""
    from quant_gemm_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=128, dim=DIM, n_layers=1, n_heads=8,
                            n_kv_heads=8, d_ff=DFF, max_seq=16)
    params = llama.init_params(cfg, seed=0)
    qp = llama.quantize_params(params, "q4_k")
    assert qp["layers"][0]["wqkv"].qtype == "q4_k"
    assert mega.qkv_supported(qp["layers"][0], cfg, 2) == (
        mega.ENABLED and mega.ENABLE_QKV)
    toks = jnp.asarray([[3], [5]], jnp.int32)
    rope = llama.make_rope_cache(cfg.max_seq, cfg.head_dim, cfg.rope_base)

    def run(on):
        old = mega.ENABLED
        mega.ENABLED = on
        try:
            cache = llama.KVCache.init(cfg, 2)
            logits, _ = llama.forward(qp, cfg, toks, cache,
                                      act_mode="q8_1", rope_cache=rope)
            return np.asarray(logits)
        finally:
            mega.ENABLED = old

    _close(run(True), run(False))


def test_norm_qkv_under_jit(weights):
    wqkv, *_rest, nw = weights
    x = jnp.asarray(datagen.normal((8, DIM), seed=3), jnp.float32)
    got = jax.jit(lambda x: mega.norm_qkv(wqkv, x, nw, EPS))(x)
    _close(got, _unfused_qkv(wqkv, x, nw))


class _Cfg:
    def __init__(self, dim, dff):
        self.dim, self.d_ff = dim, dff


def test_supported_predicates(weights):
    wqkv, wo, wgu, wd, _nw = weights
    lyr = {"wqkv": wqkv, "wo": wo, "wgu": wgu, "w_down": wd}
    cfg = _Cfg(DIM, DFF)
    assert mega.qkv_supported(lyr, cfg, 8) == mega.ENABLE_QKV
    assert mega.tail_supported(lyr, cfg, 8) == mega.ENABLE_TAIL
    # batch beyond the row tile falls back
    assert not mega.qkv_supported(lyr, cfg, 9)
    assert not mega.tail_supported(lyr, cfg, 9)
    # non-512-multiple dims fall back
    assert not mega.qkv_supported(lyr, _Cfg(DIM + 32, DFF), 8)
    # q5 with the qh2 plane is supported; WITHOUT it (build_qh2=False,
    # e.g. prepare_device) it falls back; q8 (qs plane) falls back
    rng1 = np.random.default_rng(1)
    w5f = rng1.normal(0, 0.05, (DIM, DIM)).astype(np.float32)
    assert mega._supported_w(prepare(numpy_ref.quantize_q5_0(w5f)),
                             k=DIM, n=DIM)
    from quant_gemm_tpu.kernels.gemm_pallas import prepare as _prep

    w5nq = _prep(numpy_ref.quantize_q5_0(w5f), build_qh2=False)
    assert not mega._supported_w(w5nq, k=DIM, n=DIM)
    w8 = prepare(numpy_ref.quantize_q8_0(w5f))
    assert not mega._supported_w(w8, k=DIM, n=DIM)


def test_model_decode_routes_through_mega(weights, monkeypatch):
    """forward() must produce identical logits with the megakernel on and
    off (CPU bit-identity), proving the dispatch seam is transparent."""
    from quant_gemm_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=128, dim=DIM, n_layers=2, n_heads=8,
                            n_kv_heads=8, d_ff=DFF, max_seq=16)
    qp = llama.init_qparams_device(cfg, "q4_0", seed=0)
    toks = jnp.asarray([[3], [5]], jnp.int32)
    rope = llama.make_rope_cache(cfg.max_seq, cfg.head_dim, cfg.rope_base)

    def run():
        cache = llama.KVCache.init(cfg, 2)
        logits, _ = llama.forward(qp, cfg, toks, cache, act_mode="q8_1",
                                  rope_cache=rope)
        return np.asarray(logits)

    monkeypatch.setattr(mega, "ENABLED", True)
    monkeypatch.setattr(mega, "ENABLE_QKV", True)
    on = run()
    monkeypatch.setattr(mega, "ENABLED", False)
    off = run()
    _close(on, off)
