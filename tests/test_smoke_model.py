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
