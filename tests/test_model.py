"""Flagship quantized-Llama runtime tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.models import llama

pytestmark = pytest.mark.slow  # full-model interpret-mode: `pytest -m ""`

# Jitted entry points: the suite runs interpret-mode Pallas on one CPU core,
# where an EAGER forward re-traces every call (~15 s each); jit compiles once
# per shape and replays in ~16 ms.  These wrappers are the single biggest
# test-suite speedup (531 s -> well under 2 min for this file).
FWD = llama.jit_forward  # the shared-jit-cache entry point under test
FWD_FLOAT = jax.jit(llama.forward_float, static_argnames=("cfg",))
GREEDY = jax.jit(llama.greedy_decode,
                 static_argnames=("cfg", "steps", "act_mode"))
SAMPLE = jax.jit(
    llama.sample_decode,
    static_argnames=("cfg", "steps", "act_mode", "temperature", "top_k",
                     "top_p"),
)
SHIFT = jax.jit(llama.shift_context, static_argnames=("cfg", "keep", "trigger"))

CFG = llama.LlamaConfig(
    vocab=128, dim=512, n_layers=2, n_heads=8, n_kv_heads=4, d_ff=1024, max_seq=64
)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(CFG, seed=0)


@pytest.fixture(scope="module")
def qparams(params):
    return llama.quantize_params(params, "q4_0")


def test_quantized_forward_close_to_float(params, qparams):
    """Error must scale with bit-width (random weights are the q4 worst
    case: measured rel err ~2.6% q8_0, ~15% q5_0, ~31% q4_0)."""
    tokens = jnp.asarray(np.arange(12, dtype=np.int32).reshape(2, 6) % CFG.vocab)
    cache = llama.KVCache.init(CFG, 2)
    ref, _ = FWD_FLOAT(params, CFG, tokens, cache)

    q8 = llama.quantize_params(params, "q8_0")
    out8, cache2 = FWD(q8, CFG, tokens, cache, act_mode="q8_1")
    assert out8.shape == (2, 6, CFG.vocab)
    assert int(cache2.pos[0]) == 6
    rel8 = float(jnp.linalg.norm(out8 - ref) / jnp.linalg.norm(ref))
    assert rel8 < 0.05, rel8
    assert float(jnp.mean(jnp.argmax(out8, -1) == jnp.argmax(ref, -1))) == 1.0

    out4, _ = FWD(qparams, CFG, tokens, cache, act_mode="q8_1")
    rel4 = float(jnp.linalg.norm(out4 - ref) / jnp.linalg.norm(ref))
    assert rel8 < rel4 < 0.5, (rel8, rel4)
    agree = float(jnp.mean(jnp.argmax(out4, -1) == jnp.argmax(ref, -1)))
    assert agree >= 0.5, agree


def test_w_down_a16_opt_in(params, qparams):
    """cfg.w_down_a16 routes ONLY the down-projection through the W4A16
    dequant rung (r5 lab_dequant8: the one serving GEMM where dequant
    beats exact).  Output must stay close to the W4A8 default (only one
    GEMM's activation quantization changes) and at least as close to the
    float reference (float activations lose no accuracy)."""
    cfg16 = CFG._replace(w_down_a16=True)
    tokens = jnp.asarray(
        np.arange(12, dtype=np.int32).reshape(2, 6) % CFG.vocab)
    cache = llama.KVCache.init(CFG, 2)
    ref, _ = FWD_FLOAT(params, CFG, tokens, cache)
    base, _ = FWD(qparams, CFG, tokens, cache, act_mode="q8_1")
    a16, _ = FWD(qparams, cfg16, tokens, cache, act_mode="q8_1")
    rel = float(jnp.linalg.norm(a16 - base) / jnp.linalg.norm(base))
    assert 0 < rel < 0.2, rel  # changed, but only by one GEMM's act quant
    err_base = float(jnp.linalg.norm(base - ref) / jnp.linalg.norm(ref))
    err_a16 = float(jnp.linalg.norm(a16 - ref) / jnp.linalg.norm(ref))
    assert err_a16 < err_base * 1.1, (err_a16, err_base)


def test_prefill_then_decode_consistency(qparams):
    """Prefill(T)+decode(1) must equal prefill(T+1) on the shared prefix."""
    toks = jnp.asarray([[3, 5, 7, 9, 11, 13]], dtype=jnp.int32)
    cache = llama.KVCache.init(CFG, 1)
    full, _ = FWD(qparams, CFG, toks, cache, act_mode="q8_1")

    cache = llama.KVCache.init(CFG, 1)
    _, cache = FWD(qparams, CFG, toks[:, :5], cache, act_mode="q8_1")
    last, cache = FWD(qparams, CFG, toks[:, 5:6], cache, act_mode="q8_1")
    np.testing.assert_allclose(
        np.asarray(last[0, 0]), np.asarray(full[0, 5]), rtol=2e-2, atol=2e-2
    )


def test_batch8_decode_matches_batch_split(qparams):
    """Batch-8 decode (the serving batch — stack8 GEMM epilogue + the qkv
    megakernel row tile) vs the same slots decoded in two batches of 4
    (stack4 path).  The paths differ at f32-accumulation/in-kernel-glue
    ulp level, which can flip individual Q8_1 codes — so agreement is at
    quantization-noise scale, and greedy argmax must match exactly (a
    broken stack8 epilogue would diverge wildly, not by ~1e-2)."""
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(1, CFG.vocab, (8, 1)), jnp.int32)
    cache8 = llama.KVCache.init(CFG, 8)
    out8, _ = FWD(qparams, CFG, toks, cache8, act_mode="q8_1")
    outs = []
    for half in (slice(0, 4), slice(4, 8)):
        cache4 = llama.KVCache.init(CFG, 4)
        o, _ = FWD(qparams, CFG, toks[half], cache4, act_mode="q8_1")
        outs.append(np.asarray(o))
    split = np.concatenate(outs)
    out8 = np.asarray(out8)
    nmse = ((out8 - split) ** 2).mean() / (split.var() + 1e-30)
    assert nmse < 1e-4, nmse
    np.testing.assert_array_equal(out8.argmax(-1), split.argmax(-1))


def test_greedy_decode_jits(qparams):
    prompt = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    toks, cache = GREEDY(qparams, CFG, prompt, steps=4)
    assert toks.shape == (1, 4)
    # prompt (3) + steps-1 fed-back tokens; the last generated token is
    # returned but never fed through the model
    assert int(cache.pos[0]) == 3 + 4 - 1
    assert np.all(np.asarray(toks) >= 0) and np.all(np.asarray(toks) < CFG.vocab)


def test_bf16_act_mode(qparams):
    tokens = jnp.asarray([[1, 2, 3, 4]], dtype=jnp.int32)
    cache = llama.KVCache.init(CFG, 1)
    out, _ = FWD(qparams, CFG, tokens, cache, act_mode="bf16")
    assert out.shape == (1, 4, CFG.vocab)
    assert bool(jnp.isfinite(out).all())


def test_gguf_roundtrip_serving(tmp_path):
    """Export float params as a llama.cpp-named quantized GGUF, load it
    back, and check the loaded model decodes identically to directly
    quantized params (the 'switch from llama.cpp' workflow)."""
    from quant_gemm_tpu.models import gguf_loader

    cfg = CFG
    params = llama.init_params(cfg, seed=3)
    path = tmp_path / "model.gguf"
    gguf_loader.export_gguf(path, params, cfg, qtype="q4_0")

    qparams, cfg2 = gguf_loader.load_llama(path)
    assert cfg2.dim == cfg.dim and cfg2.n_layers == cfg.n_layers
    assert cfg2.d_ff == cfg.d_ff and cfg2.n_kv_heads == cfg.n_kv_heads

    direct = llama.quantize_params(params, "q4_0")
    tokens = jnp.asarray(np.array([[5, 7, 2]], dtype=np.int32))
    out_a, _ = FWD(qparams, cfg2, tokens, llama.KVCache.init(cfg2, 1))
    out_b, _ = FWD(direct, cfg, tokens, llama.KVCache.init(cfg, 1))
    # embed stored f32 in GGUF vs bf16 directly: allow tiny diff
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-2, rtol=1e-2)


def test_q4k_model_forward():
    """The whole model serves in Q4_K (requires dim/d_ff % 256 == 0)."""
    cfg = llama.LlamaConfig(
        vocab=128, dim=512, n_layers=2, n_heads=8, n_kv_heads=8, d_ff=1024,
        max_seq=32,
    )
    params = llama.init_params(cfg, seed=7)
    qk = llama.quantize_params(params, "q4_k")
    tokens = jnp.asarray(np.array([[3, 9, 4]], dtype=np.int32))
    out_k, _ = FWD(qk, cfg, tokens, llama.KVCache.init(cfg, 1))
    cache = llama.KVCache.init(cfg, 1)
    out_f, _ = FWD_FLOAT(params, cfg, tokens, cache)
    # quantization error bounded like the q4 family
    rel = np.linalg.norm(np.asarray(out_k) - np.asarray(out_f)) / np.linalg.norm(
        np.asarray(out_f)
    )
    assert rel < 0.35, rel


def test_sample_decode():
    """sample_decode: temp=0 == greedy; temp>0 deterministic per key and
    in-vocab."""
    import jax

    from quant_gemm_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, dim=128, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=256, max_seq=32)
    qp = llama.quantize_params(llama.init_params(cfg, seed=3), "q8_0")
    prompt = jnp.asarray([[3, 7, 9], [5, 2, 8]], jnp.int32)
    key = jax.random.PRNGKey(11)

    greedy, _ = GREEDY(qp, cfg, prompt, steps=5)
    zero_t, _ = SAMPLE(qp, cfg, prompt, steps=5, key=key,
                                    temperature=0.0)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(zero_t))

    s1, _ = SAMPLE(qp, cfg, prompt, steps=5, key=key,
                                temperature=0.9, top_k=16)
    s2, _ = SAMPLE(qp, cfg, prompt, steps=5, key=key,
                                temperature=0.9, top_k=16)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert (np.asarray(s1) >= 0).all() and (np.asarray(s1) < cfg.vocab).all()
    s3, _ = SAMPLE(qp, cfg, prompt, steps=5,
                                key=jax.random.PRNGKey(12), temperature=0.9,
                                top_k=16)
    assert not np.array_equal(np.asarray(s1), np.asarray(s3))


def test_q8_kv_cache_matches_bf16():
    """int8 KV cache (per-vector scales): prefill + decode stay close to the
    bf16-cache path, and greedy continuation agrees."""
    from quant_gemm_tpu.harness.metrics import ErrorMetrics
    from quant_gemm_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, dim=128, n_layers=2, n_heads=4,
                            n_kv_heads=2, d_ff=256, max_seq=64)
    qp = llama.quantize_params(llama.init_params(cfg, seed=4), "q8_0")
    rng = np.random.default_rng(6)
    toks = jnp.asarray(rng.integers(1, 64, (2, 12)), jnp.int32)

    lb, cb = FWD(qp, cfg, toks, llama.KVCache.init(cfg, 2))
    lq, cq = FWD(qp, cfg, toks, llama.KVCache.init(cfg, 2, "q8"))
    assert cq.k.dtype == jnp.int8 and cq.ks is not None
    m = ErrorMetrics.compute(np.asarray(lq), np.asarray(lb))
    assert m.nmse < 1e-3, m  # int8 per-vector cache noise

    # decode continues from the quantized cache
    nxt = jnp.argmax(lb[:, -1], -1)[:, None].astype(jnp.int32)
    db, _ = FWD(qp, cfg, nxt, cb)
    dq, _ = FWD(qp, cfg, nxt, cq)
    m = ErrorMetrics.compute(np.asarray(dq), np.asarray(db))
    assert m.nmse < 1e-3, m

    # long prefill (flash_prefill route, T >= 64): q8 vs bf16
    cfg2 = cfg._replace(max_seq=160)
    toks2 = jnp.asarray(rng.integers(1, 64, (1, 96)), jnp.int32)
    l2b, _ = FWD(qp, cfg2, toks2, llama.KVCache.init(cfg2, 1))
    l2q, _ = FWD(qp, cfg2, toks2, llama.KVCache.init(cfg2, 1, "q8"))
    m = ErrorMetrics.compute(np.asarray(l2q), np.asarray(l2b))
    assert m.nmse < 1e-3, m


def test_rope_scale_threads_through_forward():
    """cfg.rope_scale changes positional encoding (long-context linear
    scaling); scale 1.0 is the identity; GGUF factor round-trips."""
    from quant_gemm_tpu.models import gguf_loader, llama

    cfg = llama.LlamaConfig(vocab=64, dim=128, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=256, max_seq=32)
    params = llama.init_params(cfg, seed=13)
    qp = llama.quantize_params(params, "q8_0")
    toks = jnp.asarray([[3, 7, 9, 2]], jnp.int32)
    base, _ = FWD(qp, cfg, toks, llama.KVCache.init(cfg, 1))
    same, _ = FWD(qp, cfg._replace(rope_scale=1.0), toks,
                            llama.KVCache.init(cfg, 1))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    scaled_cfg = cfg._replace(rope_scale=0.25)  # factor-4 linear scaling
    scaled, _ = FWD(qp, scaled_cfg, toks,
                              llama.KVCache.init(scaled_cfg, 1))
    assert np.abs(np.asarray(base) - np.asarray(scaled)).max() > 1e-3

    md = {"llama.embedding_length": 128, "llama.block_count": 1,
          "llama.attention.head_count": 2, "llama.feed_forward_length": 256,
          "llama.rope.scaling.factor": 4.0}
    assert gguf_loader.config_from_metadata(md).rope_scale == 0.25


def test_context_shift_preserves_windowed_logits():
    """Windowed model: shifting keeps the attention set intact, so decode
    after shift_context matches the unshifted continuation (both cache
    precisions)."""
    from quant_gemm_tpu.models import llama

    for qtype, tol in (("bf16", 3e-2), ("q8", 6e-2)):
        cfg = llama.LlamaConfig(vocab=64, dim=128, n_layers=2, n_heads=2,
                                n_kv_heads=2, d_ff=256, max_seq=64, window=12)
        params = llama.init_params(cfg, seed=20)
        qp = llama.quantize_params(params, "q8_0")
        rng = np.random.default_rng(7)
        toks = jnp.asarray(rng.integers(1, 64, (2, 40)), jnp.int32)
        _, cache = FWD(qp, cfg, toks,
                                 llama.KVCache.init(cfg, 2, qtype))

        shifted = SHIFT(cache, cfg, keep=16, trigger=0)
        assert int(shifted.pos[0]) == 16
        nxt = jnp.asarray(rng.integers(1, 64, (2, 1)), jnp.int32)
        ref, _ = FWD(qp, cfg, nxt, cache)
        got, _ = FWD(qp, cfg, nxt, shifted)
        err = float(jnp.abs(got - ref).max())
        rel = err / float(jnp.abs(ref).max())
        assert rel < tol, (qtype, err, rel)


def test_context_shift_noop_below_trigger():
    """Slots below the trigger keep their cache bit-identically."""
    from quant_gemm_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, dim=128, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=256, max_seq=32)
    qp = llama.quantize_params(llama.init_params(cfg, seed=21), "q8_0")
    toks = jnp.asarray([[5, 9, 3]], jnp.int32)
    _, cache = FWD(qp, cfg, toks, llama.KVCache.init(cfg, 1))
    shifted = SHIFT(cache, cfg, keep=8)  # trigger = max_seq-1
    assert int(shifted.pos[0]) == int(cache.pos[0])
    np.testing.assert_array_equal(np.asarray(shifted.k[:, :, :, :3]),
                                  np.asarray(cache.k[:, :, :, :3]))


@pytest.mark.slow
def test_rope_inv_freq_attached_to_params():
    """A loader-attached rope_inv_freq (Llama-3.1 scaling / GGUF
    rope_freqs.weight) changes the model's rotation: forward runs finite
    and differs from the default spectrum."""
    cfg = llama.LlamaConfig(vocab=48, dim=64, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=128, max_seq=32)
    params = llama.init_params(cfg, seed=1)
    qp = llama.quantize_params(params, "q8_0")
    toks = jnp.asarray([[3, 7, 9, 2]], jnp.int32)
    base, _ = llama.jit_forward(qp, cfg, toks, llama.KVCache.init(cfg, 1))

    from quant_gemm_tpu.ops.rope import llama3_inv_freq

    qp2 = dict(qp)
    qp2["rope_inv_freq"] = jnp.asarray(
        llama3_inv_freq(cfg.head_dim, cfg.rope_base, 8.0, 1.0, 4.0, 16))
    out, _ = llama.jit_forward(qp2, cfg, toks, llama.KVCache.init(cfg, 1))
    assert bool(jnp.isfinite(out).all())
    assert not np.allclose(np.asarray(out), np.asarray(base))
    # rope_for picks the attached spectrum up
    c1, s1 = llama.rope_for(cfg, qp2)
    t = np.arange(cfg.max_seq, dtype=np.float64)[:, None] * np.asarray(
        qp2["rope_inv_freq"], np.float64)[None, :]
    np.testing.assert_allclose(np.asarray(c1), np.cos(t), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.slow
def test_explicit_head_dim():
    """Mistral-Nemo-class configs: head_dim != dim // n_heads round-trips
    through init/quantize/forward and the GGUF export/load metadata."""
    import tempfile

    from quant_gemm_tpu.models.gguf_loader import export_gguf, load_llama

    cfg = llama.LlamaConfig(vocab=48, dim=128, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=128, max_seq=32,
                            head_dim_override=32)  # != 128 // 2
    assert cfg.head_dim == 32
    params = llama.init_params(cfg, seed=1)
    assert params["layers"][0]["wq"].shape == (2 * 32, 128)
    qp = llama.quantize_params(params, "q8_0")
    toks = jnp.asarray([[3, 7, 9, 2]], jnp.int32)
    out, _ = llama.jit_forward(qp, cfg, toks, llama.KVCache.init(cfg, 1))
    assert bool(jnp.isfinite(out).all())

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/hd.gguf"
        export_gguf(path, params, cfg, qtype="q8_0")
        qp2, cfg2 = load_llama(path)
        assert cfg2.head_dim == 32
        out2, _ = llama.jit_forward(qp2, cfg2, toks,
                                    llama.KVCache.init(cfg2, 1))
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_rope_inv_freq_export_roundtrip():
    """export_gguf writes rope_freqs.weight divisors so the Llama-3.1
    spectrum survives an export/reload; decode helpers honor it too."""
    import tempfile

    from quant_gemm_tpu.models.gguf_loader import export_gguf, load_llama
    from quant_gemm_tpu.ops.rope import llama3_inv_freq

    cfg = llama.LlamaConfig(vocab=48, dim=64, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=128, max_seq=32)
    params = llama.init_params(cfg, seed=1)
    inv = llama3_inv_freq(cfg.head_dim, cfg.rope_base, 8.0, 1.0, 4.0, 16)
    params_x = dict(params)
    params_x["rope_inv_freq"] = inv
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/l31.gguf"
        export_gguf(path, params_x, cfg, qtype="q8_0")
        qp, cfg2 = load_llama(path)
        assert "rope_inv_freq" in qp
        np.testing.assert_allclose(np.asarray(qp["rope_inv_freq"]), inv,
                                   rtol=1e-5)
    # greedy_decode uses the attached spectrum (differs from default-rope)
    qp_plain = {k: v for k, v in qp.items() if k != "rope_inv_freq"}
    toks = jnp.asarray([[3, 7, 9, 2]], jnp.int32)
    out = llama.greedy_decode(qp, cfg2, toks, steps=2)
    out_plain = llama.greedy_decode(qp_plain, cfg2, toks, steps=2)
    assert jax.tree.structure(out) == jax.tree.structure(out_plain)


def test_embed_pooling_modes():
    """llama.embed: final-norm hidden states with mean/last/none pooling
    (the llama.cpp --embedding surface)."""
    import jax.numpy as jnp

    from quant_gemm_tpu.models import llama as L

    cfg = L.LlamaConfig(vocab=64, dim=128, n_layers=1, n_heads=2,
                        n_kv_heads=2, d_ff=256, max_seq=16)
    qp = L.quantize_params(L.init_params(cfg, seed=12), "q8_0")
    toks = jnp.asarray([[3, 9, 17]], jnp.int32)
    full = L.embed(qp, cfg, toks, pooling="none")
    assert full.shape == (1, 3, 128)
    mean = L.embed(qp, cfg, toks, pooling="mean")
    last = L.embed(qp, cfg, toks, pooling="last")
    assert mean.shape == last.shape == (1, 128)
    for v in (mean, last):
        assert abs(float(jnp.linalg.norm(v[0])) - 1.0) < 1e-5
    # pooling='none' is the raw state: its normalized last row == 'last'
    import numpy as np

    raw_last = np.array(full[0, -1])
    raw_last = raw_last / np.linalg.norm(raw_last)
    np.testing.assert_allclose(np.asarray(last[0]), raw_last, atol=1e-5)
