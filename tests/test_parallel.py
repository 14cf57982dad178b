"""Tensor-parallel GEMM tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.formats import jax_quant, numpy_ref
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.harness.metrics import ErrorMetrics
from quant_gemm_tpu.parallel import sharding as sh
from quant_gemm_tpu.ref import gemm as refg

pytestmark = pytest.mark.slow  # full-model interpret-mode: `pytest -m ""`

M, N, K = 4, 512, 2048


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (virtual CPU mesh)")
    return sh.make_mesh({"tp": 4})


@pytest.fixture(scope="module")
def data():
    a = datagen.normal((M, K), seed=1)
    w = datagen.normal((N, K), seed=2)
    return a, w, numpy_ref.quantize_q4_0(w)


def test_col_parallel(mesh, data):
    a, w, w_q = data
    sw = sh.shard_weight(w_q, mesh, mode="col")
    out = sh.gemm_col_parallel(sw, jnp.asarray(a), mesh, gather_output=True,
                               mxu_dtype=jnp.float32)
    gold = refg.gemm_wxa16(a, w_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m
    assert out.shape == (M, N)


def test_col_parallel_sharded_output(mesh, data):
    a, _, w_q = data
    sw = sh.shard_weight(w_q, mesh, mode="col")
    out = sh.gemm_col_parallel(sw, jnp.asarray(a), mesh, mxu_dtype=jnp.float32)
    assert out.shape == (M, N)
    # output is N-sharded across tp
    assert len(set(d.device for d in out.addressable_shards)) == 4


def test_row_parallel_psum(mesh, data):
    a, w, w_q = data
    sw = sh.shard_weight(w_q, mesh, mode="row")
    out = sh.gemm_row_parallel(sw, jnp.asarray(a), mesh, mxu_dtype=jnp.float32)
    gold = refg.gemm_wxa16(a, w_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m


def test_row_parallel_reduce_scatter(mesh, data):
    a, w, w_q = data
    sw = sh.shard_weight(w_q, mesh, mode="row")
    out = sh.gemm_row_parallel(sw, jnp.asarray(a), mesh, scatter_output=True,
                               mxu_dtype=jnp.float32)
    gold = refg.gemm_wxa16(a, w_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m
    assert out.shape == (M, N)


def test_w4a8_col_parallel(mesh, data):
    """Quantized activations through the sharded path."""
    a, w, w_q = data
    a_q = jax_quant.device_put(numpy_ref.quantize_q8_1(a))
    sw = sh.shard_weight(w_q, mesh, mode="col")
    out = sh.gemm_col_parallel(sw, a_q, mesh, gather_output=True,
                               mxu_dtype=jnp.float32)
    gold = refg.gemm_wxa8(w_q, numpy_ref.quantize_q8_1(a))
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-5, m


@pytest.mark.parametrize("qtype", ["q4_0", "q5_1", "q8_0"])
def test_col_ring_matches_unsharded(mesh, qtype):
    """Ring all-gather GEMM (overlapped Q8_1 rotation) == unsharded W4A8."""
    a = datagen.normal((M, K), seed=1)
    w = datagen.normal((N, K), seed=2)
    w_q = numpy_ref.QUANTIZE[qtype](w)
    sw = sh.shard_weight_ring(w_q, mesh, mode="col")
    out = sh.gemm_col_parallel_ring(
        sw, jnp.asarray(a, jnp.float32), mesh, gather_output=True)
    gold = refg.gemm_wxa8(w_q, numpy_ref.quantize_q8_1(a))
    m = ErrorMetrics.compute(np.asarray(out), gold)
    assert m.nmse < 1e-5, (qtype, m)
    assert out.shape == (M, N)


@pytest.mark.parametrize("qtype", ["q4_0", "q4_1"])
def test_row_ring_matches_unsharded(mesh, qtype):
    """Ring reduce-scatter GEMM (overlapped partial rotation) == unsharded."""
    a = datagen.normal((M, K), seed=3)
    w = datagen.normal((N, K), seed=4)
    w_q = numpy_ref.QUANTIZE[qtype](w)
    sw = sh.shard_weight_ring(w_q, mesh, mode="row")
    out = sh.gemm_row_parallel_ring(sw, jnp.asarray(a, jnp.float32), mesh)
    gold = refg.gemm_wxa8(w_q, numpy_ref.quantize_q8_1(a))
    m = ErrorMetrics.compute(np.asarray(out), gold)
    assert m.nmse < 1e-5, (qtype, m)
    assert out.shape == (M, N)


def test_ring_chain_row_feeds_col(mesh):
    """The composed layout: row_ring output (N-sharded) feeds col_ring
    activations (K-sharded) with no resharding — the Megatron layer pair."""
    a = datagen.normal((M, K), seed=5)
    w1 = numpy_ref.quantize_q4_0(datagen.normal((K, K), seed=6))
    w2 = numpy_ref.quantize_q4_0(datagen.normal((N, K), seed=7))
    sw1 = sh.shard_weight_ring(w1, mesh, mode="row")
    sw2 = sh.shard_weight_ring(w2, mesh, mode="col")
    mid = sh.gemm_row_parallel_ring(sw1, jnp.asarray(a, jnp.float32), mesh)
    out = sh.gemm_col_parallel_ring(sw2, mid, mesh, gather_output=True)
    mid_gold = refg.gemm_wxa8(w1, numpy_ref.quantize_q8_1(a))
    gold = refg.gemm_wxa8(w2, numpy_ref.quantize_q8_1(mid_gold))
    m = ErrorMetrics.compute(np.asarray(out), gold)
    assert m.nmse < 1e-4, m


def test_dp_tp_mesh_quantize():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = sh.make_mesh({"dp": 2, "tp": 4})
    x = datagen.normal((8, 256), seed=9)
    a_q = sh.quantize_q8_1_sharded(jnp.asarray(x), mesh)
    ref = numpy_ref.quantize_q8_1(x)
    np.testing.assert_array_equal(np.asarray(a_q.qs), np.asarray(ref.qs))


def test_tp_serving_matches_single_chip():
    """Megatron-sharded serving forward must match the single-chip model
    (up to f32 psum ordering) at tp=4, prefill AND flash-decode step."""
    import jax.numpy as jnp

    from quant_gemm_tpu.models import llama, llama_tp
    from quant_gemm_tpu.parallel.sharding import make_mesh

    cfg = llama.LlamaConfig(
        vocab=64, dim=256, n_layers=2, n_heads=8, n_kv_heads=8, d_ff=512,
        max_seq=32,
    )
    params = llama.init_params(cfg, seed=5)
    mesh = make_mesh({"tp": 4})
    qtp = llama_tp.shard_params_tp(params, cfg, mesh, "q4_0")
    q1 = llama.quantize_params(params, "q4_0")

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, cfg.vocab, (2, 5)), jnp.int32)

    cache_tp = llama_tp.init_cache_tp(cfg, 2, mesh)
    cache_1 = llama.KVCache.init(cfg, 2)
    out_tp, cache_tp = llama_tp.forward_tp(qtp, cfg, toks, cache_tp, mesh)
    out_1, cache_1 = llama.forward(q1, cfg, toks, cache_1)
    np.testing.assert_allclose(
        np.asarray(out_tp), np.asarray(out_1), atol=1e-3, rtol=1e-3
    )

    nxt = jnp.argmax(out_1[:, -1:], -1).astype(jnp.int32)
    d_tp, _ = llama_tp.forward_tp(qtp, cfg, nxt, cache_tp, mesh)
    d_1, _ = llama.forward(q1, cfg, nxt, cache_1)
    np.testing.assert_allclose(
        np.asarray(d_tp), np.asarray(d_1), atol=1e-3, rtol=1e-3
    )


def test_tp_decode_takes_qkv_megakernel(monkeypatch):
    """At a mega-eligible dim (%512) the TP decode step must ENGAGE the
    norm_qkv megakernel per shard (column-parallel wqkv is self-contained
    — r5 extension of the single-chip default) and still match the
    single-chip model."""
    from quant_gemm_tpu.kernels import gemm_megalayer as mega
    from quant_gemm_tpu.models import llama, llama_tp
    from quant_gemm_tpu.parallel.sharding import make_mesh

    cfg = llama.LlamaConfig(
        vocab=64, dim=512, n_layers=2, n_heads=8, n_kv_heads=8, d_ff=1024,
        max_seq=16,
    )
    params = llama.init_params(cfg, seed=6)
    mesh = make_mesh({"tp": 2})
    qtp = llama_tp.shard_params_tp(params, cfg, mesh, "q4_0")
    q1 = llama.quantize_params(params, "q4_0")

    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(1, cfg.vocab, (1, 4)), jnp.int32)
    cache_tp = llama_tp.init_cache_tp(cfg, 1, mesh)
    cache_1 = llama.KVCache.init(cfg, 1)
    _, cache_tp = llama_tp.forward_tp(qtp, cfg, toks, cache_tp, mesh)
    out_1, cache_1 = llama.forward(q1, cfg, toks, cache_1)

    hits = []
    real = mega.norm_qkv

    def probe(*a, **kw):
        hits.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(mega, "norm_qkv", probe)
    nxt = jnp.argmax(out_1[:, -1:], -1).astype(jnp.int32)
    d_tp, _ = llama_tp.forward_tp(qtp, cfg, nxt, cache_tp, mesh)
    assert hits, "TP decode step did not engage the qkv megakernel"
    d_1, _ = llama.forward(q1, cfg, nxt, cache_1)
    np.testing.assert_allclose(
        np.asarray(d_tp), np.asarray(d_1), atol=1e-3, rtol=1e-3
    )


def test_health_check_virtual_mesh():
    from quant_gemm_tpu.parallel import health

    r = health.check(timeout_s=60.0)
    assert r.ok, r.row()
    assert r.n_devices == 8
    assert r.heartbeat_ms is not None


def test_tp_serving_q8_cache():
    """Megatron TP decode with the int8 KV cache (kv-head-sharded scales)."""
    import jax

    from quant_gemm_tpu.models import llama, llama_tp
    from quant_gemm_tpu.parallel.sharding import make_mesh

    devices = jax.devices()[:4]
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh({"tp": 4}, devices)
    cfg = llama.LlamaConfig(vocab=64, dim=256, n_layers=1, n_heads=4,
                            n_kv_heads=4, d_ff=512, max_seq=32)
    params = llama.init_params(cfg, seed=2)
    sp = llama_tp.shard_params_tp(params, cfg, mesh, "q4_0")
    toks = jnp.asarray([[3], [9]], jnp.int32)

    cache_b = llama_tp.init_cache_tp(cfg, 2, mesh)
    lg_b, _ = llama_tp.forward_tp(sp, cfg, toks, cache_b, mesh)
    cache_q = llama_tp.init_cache_tp(cfg, 2, mesh, qtype="q8")
    assert cache_q.k.dtype.name == "int8"
    lg_q, cache_q2 = llama_tp.forward_tp(sp, cfg, toks, cache_q, mesh)
    assert cache_q2.ks is not None
    np.testing.assert_allclose(np.asarray(lg_q), np.asarray(lg_b),
                               rtol=2e-2, atol=2e-2)


def test_tp_serving_sliding_window():
    """TP decode applies cfg.window identically to the single-chip path."""
    import jax

    from quant_gemm_tpu.models import llama, llama_tp
    from quant_gemm_tpu.parallel.sharding import make_mesh

    devices = jax.devices()[:2]
    if len(devices) < 2:
        pytest.skip("needs 2 virtual devices")
    mesh = make_mesh({"tp": 2}, devices)
    cfg = llama.LlamaConfig(vocab=64, dim=128, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=256, max_seq=64, window=8)
    params = llama.init_params(cfg, seed=5)
    qp = llama.quantize_params(params, "q8_0")
    sp = llama_tp.shard_params_tp(params, cfg, mesh, "q8_0")
    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.integers(1, 64, (2, 20)), jnp.int32)

    # prefill + one decode step on both paths
    c1 = llama.KVCache.init(cfg, 2)
    l1, c1 = llama.forward(qp, cfg, toks, c1)
    ct = llama_tp.init_cache_tp(cfg, 2, mesh)
    l2, ct = llama_tp.forward_tp(sp, cfg, toks, ct, mesh)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-2,
                               rtol=2e-2)
    nxt = jnp.argmax(l1[:, -1], -1)[:, None].astype(jnp.int32)
    d1, _ = llama.forward(qp, cfg, nxt, c1)
    d2, _ = llama_tp.forward_tp(sp, cfg, nxt, ct, mesh)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-2,
                               rtol=2e-2)
