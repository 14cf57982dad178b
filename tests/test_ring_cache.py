"""Ring-buffer sliding-window KV cache (cfg.ring): O(window) memory.

The linear windowed cache still allocates max_seq slots; the ring holds
window + chunk slots and wraps token g to slot g % R.  These tests drive
chunked prefill ACROSS the wrap point plus decode, and pin the ring run's
logits to the linear windowed run on the same tokens (the attention sets
are identical; only the flash-recurrence tile ORDER differs, so agreement
is to f32-accumulation tolerance, not bitwise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.models import llama

BASE = dict(vocab=48, dim=64, n_layers=2, n_heads=2, n_kv_heads=2, d_ff=128,
            window=48)
CHUNK = 32
RING_CFG = llama.LlamaConfig(max_seq=512, ring=True, ring_chunk=CHUNK, **BASE)
LIN_CFG = llama.LlamaConfig(max_seq=512, **BASE)


def _run(cfg, qp, toks, qtype, n_decode):
    """Chunked prefill + greedy decode; returns per-call logits list."""
    b = 1
    cache = llama.KVCache.init(cfg, b, qtype)
    outs = []
    for c0 in range(0, toks.shape[1], CHUNK):
        chunk = toks[:, c0 : c0 + CHUNK]
        out, cache = llama.jit_forward(qp, cfg, chunk, cache)
        outs.append(np.asarray(out))
    nxt = jnp.argmax(out[:, -1:], -1).astype(jnp.int32)
    for _ in range(n_decode):
        out, cache = llama.jit_forward(qp, cfg, nxt, cache)
        outs.append(np.asarray(out))
        nxt = jnp.argmax(out[:, -1:], -1).astype(jnp.int32)
    return outs, cache


def _compare(qtype, tol):
    params = llama.init_params(RING_CFG, seed=3)
    qp = llama.quantize_params(params, "q8_0")
    rng = np.random.default_rng(0)
    n_tok = 160  # > ring capacity (128): prefill wraps the ring
    assert RING_CFG.ring_capacity == 128
    toks = jnp.asarray(rng.integers(0, BASE["vocab"], (1, n_tok)), jnp.int32)

    ring_outs, ring_cache = _run(RING_CFG, qp, toks, qtype, n_decode=3)
    lin_outs, _ = _run(LIN_CFG, qp, toks, qtype, n_decode=3)

    assert len(ring_outs) == len(lin_outs)
    for i, (r, l) in enumerate(zip(ring_outs, lin_outs)):
        err = np.max(np.abs(r - l)) / max(np.max(np.abs(l)), 1e-9)
        assert err < tol, (i, err)
    # O(window) memory: buffer is R + chunk slots, NOT max_seq
    sbuf = ring_cache.k.shape[3]
    assert sbuf == RING_CFG.ring_capacity + CHUNK == 160
    assert sbuf < RING_CFG.max_seq


@pytest.mark.slow
def test_ring_matches_linear_windowed_bf16():
    _compare("bf16", 2e-2)  # bf16 cache rounding dominates the tolerance


@pytest.mark.slow
def test_ring_matches_linear_windowed_q8():
    _compare("q8", 2e-2)


def test_ring_memory_allocation():
    """Default-suite: ring cache allocates O(window), not O(max_seq)."""
    cache = llama.KVCache.init(RING_CFG, 2, "q8")
    assert cache.k.shape[3] == RING_CFG.ring_capacity + CHUNK == 160
    assert cache.k.shape[3] < RING_CFG.max_seq
    assert cache.ks.shape == cache.k.shape[:-1]


@pytest.mark.slow
def test_ring_decode_smoke():
    """Ring cache: a 1-layer ring model runs the dense-prefill +
    flash-decode paths with finite logits."""
    cfg = RING_CFG._replace(n_layers=1)
    params = llama.init_params(cfg, seed=3)
    qp = llama.quantize_params(params, "q8_0")
    cache = llama.KVCache.init(cfg, 1, "bf16")
    assert cache.k.shape[3] == cfg.ring_capacity + CHUNK == 160
    assert cache.k.shape[3] < cfg.max_seq
    toks = jnp.asarray([[3, 7, 9, 2, 11, 5, 1, 4]], jnp.int32)
    out, cache = llama.jit_forward(qp, cfg, toks, cache)  # dense path T=8
    assert bool(jnp.isfinite(out).all())
    nxt = jnp.argmax(out[:, -1:], -1).astype(jnp.int32)
    d, cache = llama.jit_forward(qp, cfg, nxt, cache)  # flash-decode path
    assert bool(jnp.isfinite(d).all()) and int(cache.pos[0]) == 9


@pytest.mark.slow
def test_ring_short_prefill_matches_linear():
    """Dense-path (T < 64) ring masking equals the linear windowed run."""
    params = llama.init_params(RING_CFG, seed=3)
    qp = llama.quantize_params(params, "q8_0")
    toks = jnp.asarray([[3, 7, 9, 2, 11, 5, 1, 4]], jnp.int32)
    out, _ = llama.jit_forward(qp, RING_CFG, toks,
                               llama.KVCache.init(RING_CFG, 1, "bf16"))
    ref, _ = llama.jit_forward(qp, LIN_CFG, toks,
                               llama.KVCache.init(LIN_CFG, 1, "bf16"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_flash_decode_ring_kernel():
    """Kernel-level: flash_decode(ring=R) on a ring-laid-out cache equals
    the reference on the window's tokens in linear order."""
    from quant_gemm_tpu.ops.attention import flash_decode, flash_decode_ref

    rng = np.random.default_rng(5)
    b, kv, rep, hd = 2, 2, 2, 128
    R, W = 128, 48
    pos = np.array([150, 40], np.int32)  # slot 0 wrapped; slot 1 not yet
    q = jnp.asarray(rng.normal(0, 1, (b, kv, rep, hd)), jnp.float32)
    kc = jnp.asarray(rng.normal(0, 1, (b, kv, 1, hd)), jnp.float32)
    vc = jnp.asarray(rng.normal(0, 1, (b, kv, 1, hd)), jnp.float32)

    # dense token history per slot, laid out both linearly and as a ring
    smax = 256
    hist_k = rng.normal(0, 1, (b, kv, smax, hd)).astype(np.float32)
    hist_v = rng.normal(0, 1, (b, kv, smax, hd)).astype(np.float32)
    ring_k = np.zeros((b, kv, R, hd), np.float32)
    ring_v = np.zeros((b, kv, R, hd), np.float32)
    for bb in range(b):
        for g in range(max(pos[bb] - W + 1, 0), pos[bb]):  # cached: g < pos
            ring_k[bb, :, g % R] = hist_k[bb, :, g]
            ring_v[bb, :, g % R] = hist_v[bb, :, g]

    out = np.asarray(flash_decode(
        q, jnp.asarray(ring_k), jnp.asarray(ring_v), jnp.asarray(pos),
        k_current=kc, v_current=vc, window=W, ring=R, ts=64,
    ))

    # reference: linear cache WITH the current token, full causal over the
    # window's slots only (mask everything outside the window)
    lin_k, lin_v = hist_k.copy(), hist_v.copy()
    for bb in range(b):
        lin_k[bb, :, pos[bb]] = np.asarray(kc)[bb, :, 0]
        lin_v[bb, :, pos[bb]] = np.asarray(vc)[bb, :, 0]
        lo = max(pos[bb] - W + 1, 0)
        lin_k[bb, :, :lo] = 0
        lin_v[bb, :, :lo] = 0
        # zero masked slots influence the ref softmax: mask via -inf trick
    # build ref scores manually with the window mask
    scores = np.einsum("bgrd,bgsd->bgrs", np.asarray(q), lin_k) / np.sqrt(hd)
    span = np.arange(smax)[None, :]
    mask = (span <= pos[:, None]) & (span > pos[:, None] - W)
    scores = np.where(mask[:, None, None], scores,
                      np.finfo(np.float32).min)
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    ref = np.einsum("bgrs,bgsd->bgrd", np.asarray(probs), lin_v)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_ring_server_long_generation():
    """Continuous-batching server on a ring cache: a prompt + generation
    crossing the ring wrap produces the same tokens as the linear windowed
    server (greedy, window-covered attention sets)."""
    from quant_gemm_tpu.models import serve

    params = llama.init_params(RING_CFG, seed=3)
    qp = llama.quantize_params(params, "q8_0")
    rng = np.random.default_rng(1)
    prompt = [int(x) for x in rng.integers(0, BASE["vocab"], 120)]

    def run(cfg):
        srv = serve.Server(qp, cfg, n_slots=1, prefill_bucket=16,
                           max_prefill_chunk=32)
        rid = srv.submit(prompt, max_new=24)  # pos crosses R=128
        return srv.run_until_done()[rid]

    assert run(RING_CFG) == run(LIN_CFG)


def test_ring_server_clamps_chunk_to_bucket_multiple():
    """Bucket padding must never exceed the ring write margin: with a
    bucket that doesn't divide ring_chunk, max_chunk clamps to the largest
    bucket multiple <= ring_chunk (round_up(chunk, bucket) <= ring_chunk)."""
    from quant_gemm_tpu.models import serve

    cfg = RING_CFG._replace(n_layers=1, ring_chunk=256)
    params = llama.init_params(cfg, seed=3)
    qp = llama.quantize_params(params, "q8_0")
    srv = serve.Server(qp, cfg, n_slots=1, prefill_bucket=96)
    assert srv.max_chunk == 192  # 256 // 96 * 96
    padded = (srv.max_chunk + 95) // 96 * 96  # worst-case bucket padding
    assert padded <= cfg.ring_chunk


def test_ring_prefill_longer_than_chunk_in_one_jit():
    """Regression (round-3 campaign crash, bench_serve.py): a prompt longer
    than ring_chunk must prefill as ring_chunk-sized forward calls — one
    unchunked call trips llama.py's ``t <= ring_chunk`` assert.  This runs
    the exact chunked-jit pattern scripts/bench_serve.py now uses."""
    cfg = RING_CFG._replace(n_layers=1)
    params = llama.init_params(cfg, seed=3)
    qp = llama.quantize_params(params, "q8_0")
    rng = np.random.default_rng(2)
    t = 3 * CHUNK + 8  # > ring_chunk, non-multiple tail
    toks = jnp.asarray(rng.integers(0, BASE["vocab"], (1, t)), jnp.int32)

    @jax.jit
    def prefill(qp, toks):
        c1 = llama.KVCache.init(cfg, 1)
        for i in range(0, t, CHUNK):
            logits, c1 = llama.forward(qp, cfg, toks[:, i : i + CHUNK], c1)
        return logits[0, -1], c1.pos

    last, pos = prefill(qp, toks)
    assert bool(jnp.isfinite(last).all()) and int(pos[0]) == t


@pytest.mark.slow
def test_tp_serving_ring_cache():
    """Megatron-TP serving over the ring cache matches the single-chip
    ring run (kv-head-sharded ring buffers; same forward loop)."""
    from quant_gemm_tpu.models import llama_tp
    from quant_gemm_tpu.parallel.sharding import make_mesh

    devices = jax.devices()[:2]
    if len(devices) < 2:
        pytest.skip("needs 2 virtual devices")
    mesh = make_mesh({"tp": 2}, devices)
    cfg = llama.LlamaConfig(vocab=64, dim=128, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=256, max_seq=512, window=48,
                            ring=True, ring_chunk=32)
    params = llama.init_params(cfg, seed=5)
    qp = llama.quantize_params(params, "q8_0")
    sp = llama_tp.shard_params_tp(params, cfg, mesh, "q8_0")
    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.integers(1, 64, (2, 20)), jnp.int32)

    c1 = llama.KVCache.init(cfg, 2)
    l1, c1 = llama.forward(qp, cfg, toks, c1)
    ct = llama_tp.init_cache_tp(cfg, 2, mesh)
    assert ct.k.shape[3] == cfg.ring_capacity + cfg.ring_chunk
    l2, ct = llama_tp.forward_tp(sp, cfg, toks, ct, mesh)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-2,
                               rtol=2e-2)
    nxt = jnp.argmax(l1[:, -1], -1)[:, None].astype(jnp.int32)
    d1, _ = llama.forward(qp, cfg, nxt, c1)
    d2, _ = llama_tp.forward_tp(sp, cfg, nxt, ct, mesh)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-2,
                               rtol=2e-2)
