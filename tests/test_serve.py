"""Continuous-batching server tests.

The key property: interleaved slot scheduling must produce exactly the same
greedy tokens as running each request alone (per-slot positions isolate
sequences)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.models import llama, serve

CFG = llama.LlamaConfig(
    vocab=128, dim=512, n_layers=1, n_heads=8, n_kv_heads=4, d_ff=1024, max_seq=64
)


@pytest.fixture(scope="module")
def qparams():
    return llama.quantize_params(llama.init_params(CFG, seed=0), "q8_0")


def _solo(qparams, prompt, steps):
    toks, _ = llama.greedy_decode(
        qparams, CFG, jnp.asarray([prompt], jnp.int32), steps=steps
    )
    return list(np.asarray(toks)[0])


def test_continuous_batching_matches_solo(qparams):
    prompts = [[3, 14, 15], [9, 2, 6, 5, 35], [8, 97]]
    max_new = 6
    srv = serve.Server(qparams, CFG, n_slots=2, prefill_bucket=8)
    rids = [srv.submit(p, max_new=max_new) for p in prompts]
    results = srv.run_until_done()
    assert set(results) == set(rids)
    for rid, prompt in zip(rids, prompts):
        want = _solo(qparams, prompt, max_new)
        assert results[rid] == want, (rid, results[rid], want)


def test_more_requests_than_slots_all_finish(qparams):
    srv = serve.Server(qparams, CFG, n_slots=2)
    rids = [srv.submit([i + 1, i + 2], max_new=3) for i in range(5)]
    results = srv.run_until_done()
    assert set(results) == set(rids)
    assert all(len(v) == 3 for v in results.values())


def test_step_returns_tokens(qparams):
    srv = serve.Server(qparams, CFG, n_slots=2)
    rid = srv.submit([1, 2, 3, 4], max_new=4)
    toks = []
    while not srv.finished.get(rid):
        out = srv.step()
        toks += [t for r, t in out.items() if r == rid]
        if not out:
            break
    assert len(srv.finished[rid].generated) == 4
