"""Fast default-suite smoke coverage of the model + serving stack.

The full model/serve/train/speculative/parallel suites are `slow`-marked
(interpret-mode Pallas on the 1-core CPU backend; run with `pytest -m ""`).
This file keeps one end-to-end path in the DEFAULT suite: quantize a tiny
llama, check logits against the float reference, greedy-decode, and drain a
2-request continuous-batching server.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quant_gemm_tpu.harness.metrics import ErrorMetrics
from quant_gemm_tpu.models import llama, serve

CFG = llama.LlamaConfig(vocab=48, dim=64, n_layers=1, n_heads=2,
                        n_kv_heads=2, d_ff=128, max_seq=32)


def test_smoke_forward_decode_serve():
    params = llama.init_params(CFG, seed=1)
    qp = llama.quantize_params(params, "q8_0")
    toks = jnp.asarray([[3, 7, 9, 2]], jnp.int32)

    out, cache = llama.jit_forward(qp, CFG, toks, llama.KVCache.init(CFG, 1))
    ref, _ = jax.jit(llama.forward_float, static_argnames=("cfg",))(
        params, CFG, toks, llama.KVCache.init(CFG, 1)
    )
    assert out.shape == (1, 4, CFG.vocab) and int(cache.pos[0]) == 4
    m = ErrorMetrics.compute(np.asarray(out), np.asarray(ref))
    assert m.nmse < 2e-2, m

    # decode continues from the prefill cache (T=1 flash-decode path)
    nxt = jnp.argmax(out[:, -1:], -1).astype(jnp.int32)
    d, cache = llama.jit_forward(qp, CFG, nxt, cache)
    assert d.shape == (1, 1, CFG.vocab) and int(cache.pos[0]) == 5
    assert bool(jnp.isfinite(d).all())

    # continuous-batching server drains and stays in-vocab
    srv = serve.Server(qp, CFG, n_slots=2)
    rids = [srv.submit([5, 9], max_new=3), srv.submit([1, 2, 3], max_new=2)]
    results = srv.run_until_done()
    assert set(results) == set(rids)
    assert [len(results[r]) for r in rids] == [3, 2]
    assert all(0 <= t < CFG.vocab for r in rids for t in results[r])


def test_sampling_min_p_and_repeat_penalty():
    """min-p keeps only tokens near the mode; repetition penalty pushes
    recent tokens down (llama.cpp llama_sample_* semantics)."""
    import jax

    from quant_gemm_tpu.models import sampling

    logits = jnp.asarray([[0.0, 3.0, 2.9, -2.0, 1.0]], jnp.float32)
    # min_p = 0.5: keep tokens with prob >= 0.5 * p_max -> ids 1, 2 only
    filt = sampling.min_p_filter(logits, jnp.asarray([0.5]))
    kept = np.isfinite(np.asarray(filt))[0]
    assert list(np.where(kept)[0]) == [1, 2]

    # repeat penalty: id 1 was recent; positive logit divides
    pen = sampling.apply_repeat_penalty(
        logits, jnp.asarray([[1, -1, -1]]), jnp.asarray([2.0]))
    assert np.asarray(pen)[0, 1] == 1.5  # 3.0 / 2.0
    assert np.asarray(pen)[0, 2] == 2.9  # untouched
    # negative recent logit multiplies
    pen2 = sampling.apply_repeat_penalty(
        logits, jnp.asarray([[3, -1, -1]]), jnp.asarray([2.0]))
    assert np.asarray(pen2)[0, 3] == -4.0
    # penalty 1.0 disables exactly
    pen3 = sampling.apply_repeat_penalty(
        logits, jnp.asarray([[1, 3, -1]]), jnp.asarray([1.0]))
    np.testing.assert_array_equal(np.asarray(pen3), np.asarray(logits))

    # full sample() with greedy + penalty: recent argmax gets dethroned
    keys = jnp.zeros((1, 2), jnp.uint32)
    tok = sampling.sample(logits, keys, jnp.asarray([0]),
                          jnp.asarray([0.0]),
                          recent=jnp.asarray([[1, -1, -1]]),
                          repeat_penalty=jnp.asarray([4.0]))
    assert int(tok[0]) == 2  # 3.0/4 = 0.75 < 2.9


def test_logit_bias_bans_and_forces():
    """Sparse logit bias: -inf bans a token; a huge positive bias forces it
    (llama.cpp --logit-bias semantics)."""
    from quant_gemm_tpu.models import sampling

    logits = jnp.asarray([[0.0, 3.0, 2.9, -2.0, 1.0]], jnp.float32)
    keys = jnp.zeros((1, 2), jnp.uint32)
    banned = sampling.sample(
        logits, keys, jnp.asarray([0]), jnp.asarray([0.0]),
        bias_ids=jnp.asarray([[1, -1]]),
        bias_vals=jnp.asarray([[float("-inf"), 0.0]]))
    assert int(banned[0]) == 2
    forced = sampling.sample(
        logits, keys, jnp.asarray([0]), jnp.asarray([0.0]),
        bias_ids=jnp.asarray([[3, -1]]), bias_vals=jnp.asarray([[100.0, 0.0]]))
    assert int(forced[0]) == 3


def test_min_p_before_temperature():
    """min-p's keep set comes from the RAW distribution (llama.cpp chain
    order), independent of temperature."""
    from quant_gemm_tpu.models import sampling

    logits = jnp.asarray([[0.0, 3.0, 2.9, 1.9, 1.0]], jnp.float32)
    keys = jnp.zeros((1, 2), jnp.uint32)
    # raw: p(3)/p_max = exp(1.9-3.0) = 0.33; min_p=0.4 excludes id 3.
    # at temp 4.0 the SCALED ratio would be exp(-0.275) = 0.76 > 0.4 —
    # a scaled-space min_p would wrongly keep it.
    tok_counts = set()
    for i in range(24):
        k = jnp.asarray([[0, i]], jnp.uint32)
        t = sampling.sample(logits, k, jnp.asarray([i]),
                            jnp.asarray([4.0]), min_p=jnp.asarray([0.4]))
        tok_counts.add(int(t[0]))
    assert 3 not in tok_counts and 4 not in tok_counts
    assert tok_counts <= {1, 2}
