"""Speculative decoding: exact greedy equivalence + acceptance accounting."""

import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.models import llama, speculative

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
