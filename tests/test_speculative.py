"""Speculative decoding: exact greedy equivalence + acceptance accounting."""

import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.models import llama, speculative

pytestmark = pytest.mark.slow  # full-model interpret-mode: `pytest -m ""`

CFG_T = llama.LlamaConfig(vocab=64, dim=128, n_layers=2, n_heads=2,
                          n_kv_heads=2, d_ff=256, max_seq=64)
CFG_D = llama.LlamaConfig(vocab=64, dim=64, n_layers=1, n_heads=2,
                          n_kv_heads=2, d_ff=128, max_seq=64)


@pytest.fixture(scope="module")
def models():
    qp_t = llama.quantize_params(llama.init_params(CFG_T, seed=0), "q8_0")
    qp_d = llama.quantize_params(llama.init_params(CFG_D, seed=1), "q8_0")
    return qp_t, qp_d


def test_matches_target_greedy(models):
    """Speculation must be invisible in the output: token-for-token equal to
    the target model's plain greedy decode, whatever the draft proposes."""
    qp_t, qp_d = models
    prompt = jnp.asarray([[3, 14, 15, 9], [26, 5, 3, 5]], jnp.int32)
    steps = 12
    want, _ = llama.greedy_decode(qp_t, CFG_T, prompt, steps=steps)
    got, rate = speculative.speculative_greedy_decode(
        qp_t, CFG_T, qp_d, CFG_D, prompt, steps, k=3
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert rate >= 0.5  # even a useless draft can't halve throughput more


def test_perfect_draft_accepts_most(models):
    """Draft == target: proposals should (almost) all match, driving
    ~k+1 tokens per target call.

    The occasional miss is numeric: the draft decodes through the T=1 path
    while verification runs the T=k+1 block path, and near-tied logits can
    argmax differently between the two.  Output equality with plain greedy
    still holds (the verify pass is the arbiter)."""
    qp_t, _ = models
    prompt = jnp.asarray([[7, 9, 2]], jnp.int32)
    steps, k = 12, 3
    got, rate = speculative.speculative_greedy_decode(
        qp_t, CFG_T, qp_t, CFG_T, prompt, steps, k=k
    )
    want, _ = llama.greedy_decode(qp_t, CFG_T, prompt, steps=steps)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert rate >= 2.5, rate  # measured 3.25 (2.0 before the
    #                           draft-cache-hole fix)


def test_accept_residual_preserves_target_distribution():
    """The rejection-sampling identity, checked ANALYTICALLY (no sampling):
    P(y) = p_d(y)*min(1, p_t(y)/p_d(y)) + P(reject)*residual(y) == p_t(y)."""
    rng = np.random.default_rng(3)
    for _ in range(20):
        v = 16
        p_t = rng.dirichlet(np.ones(v) * 0.5)
        p_d = rng.dirichlet(np.ones(v) * 0.5)
        accept = np.minimum(1.0, p_t / np.maximum(p_d, 1e-30))
        p_reject = 1.0 - np.sum(p_d * accept)
        res = np.maximum(p_t - p_d, 0.0)
        res = res / res.sum() if res.sum() > 0 else p_t
        induced = p_d * accept + p_reject * res
        np.testing.assert_allclose(induced, p_t, atol=1e-12)
        # and the code path agrees with the formula on a concrete draw
        x = int(rng.integers(v))
        ok, r = speculative.accept_or_residual(p_t, p_d, x, 0.0)
        assert ok  # u=0 always accepts
        ok, r = speculative.accept_or_residual(p_t, p_d, x, 1.0)
        if p_t[x] < p_d[x]:  # u=1 rejects whenever ratio < 1
            assert not ok
            np.testing.assert_allclose(r, res, atol=1e-12)


def test_sample_decode_deterministic_and_greedy_collapse(models):
    """Sampled speculation: deterministic per seed, in-vocab, and
    temperature<=0 delegates to the greedy variant exactly."""
    qp_t, qp_d = models
    prompt = jnp.asarray([[5, 6, 7]], jnp.int32)
    a, _ = speculative.speculative_sample_decode(
        qp_t, CFG_T, qp_d, CFG_D, prompt, 8, k=3, temperature=0.8, seed=4)
    b, _ = speculative.speculative_sample_decode(
        qp_t, CFG_T, qp_d, CFG_D, prompt, 8, k=3, temperature=0.8, seed=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ((np.asarray(a) >= 0) & (np.asarray(a) < CFG_T.vocab)).all()
    c, _ = speculative.speculative_sample_decode(
        qp_t, CFG_T, qp_d, CFG_D, prompt, 8, k=3, temperature=0.8, seed=5)
    assert not np.array_equal(np.asarray(a), np.asarray(c))

    g1, _ = speculative.speculative_sample_decode(
        qp_t, CFG_T, qp_d, CFG_D, prompt, 8, k=3, temperature=0.0)
    g2, _ = speculative.speculative_greedy_decode(
        qp_t, CFG_T, qp_d, CFG_D, prompt, 8, k=3)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
