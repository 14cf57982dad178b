"""Perplexity evaluator tests (llama.cpp `perplexity` tool analogue)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.models import evaluate, llama

CFG = llama.LlamaConfig(vocab=64, dim=128, n_layers=1, n_heads=2,
                        n_kv_heads=2, d_ff=256, max_seq=32)


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(CFG, seed=40)
    return params, llama.quantize_params(params, "q8_0")


@pytest.mark.slow
def test_nll_matches_manual_cross_entropy(setup):
    params, qp = setup
    toks = jnp.asarray(np.random.default_rng(0).integers(1, 64, (1, 12)),
                       jnp.int32)
    nll = np.asarray(evaluate.nll_of_chunk(qp, CFG, toks))
    logits, _ = llama.forward(qp, CFG, toks, llama.KVCache.init(CFG, 1))
    lp = jax.nn.log_softmax(np.asarray(logits[:, :-1], np.float32), axis=-1)
    want = -np.take_along_axis(
        np.asarray(lp), np.asarray(toks[:, 1:])[..., None], axis=-1
    )[..., 0]
    np.testing.assert_allclose(nll, want, rtol=1e-5, atol=1e-5)


def test_perplexity_single_window_equals_mean_nll(setup):
    _, qp = setup
    stream = np.random.default_rng(1).integers(1, 64, 20)
    r = evaluate.perplexity(qp, CFG, stream, ctx=32)
    nll = np.asarray(
        evaluate.nll_of_chunk(qp, CFG, jnp.asarray(
            np.pad(stream, (0, 12))[None].astype(np.int32)))
    )[0][:19]
    np.testing.assert_allclose(r["nll"], nll.mean(), rtol=1e-6)
    assert r["tokens"] == 19
    assert r["ppl"] == pytest.approx(float(np.exp(nll.mean())), rel=1e-6)


def test_perplexity_sliding_covers_long_stream(setup):
    """A stream longer than ctx is scored with overlapping windows; every
    position past the first window gets >= ctx - stride context."""
    _, qp = setup
    stream = np.random.default_rng(2).integers(1, 64, 100)
    r = evaluate.perplexity(qp, CFG, stream, ctx=32, stride=16)
    assert r["tokens"] > 60  # most positions scored
    assert np.isfinite(r["ppl"]) and r["ppl"] > 1.0


def test_quantization_quality_ordering(setup):
    """q8_0 serving should perplex no worse than q4_0 on the same stream
    (the end-to-end analogue of the per-format NMSE ordering)."""
    params, _ = setup
    stream = np.random.default_rng(3).integers(1, 64, 31)
    ppl8 = evaluate.perplexity(
        llama.quantize_params(params, "q8_0"), CFG, stream)["ppl"]
    ppl4 = evaluate.perplexity(
        llama.quantize_params(params, "q4_0"), CFG, stream)["ppl"]
    # random-init toy model: differences are small; just require sane order
    # within a tolerance band (q4 noise can occasionally flip it slightly)
    assert ppl8 < ppl4 * 1.15, (ppl8, ppl4)
