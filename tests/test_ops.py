"""Element-op tests vs scalar numpy references (reference tests/unit/test_{rms_norm,rope,silu,softmax}.cu analogues)."""

import jax.numpy as jnp
import numpy as np
import pytest

import importlib

# ops/__init__ exports functions under the same names as their modules
# (rms_norm, rope, softmax), so fetch the modules explicitly.
rms_norm = importlib.import_module("quant_gemm_tpu.ops.rms_norm")
rope = importlib.import_module("quant_gemm_tpu.ops.rope")
softmax = importlib.import_module("quant_gemm_tpu.ops.softmax")
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.ops import activations, elementwise

R, C = 5, 512


@pytest.fixture(scope="module")
def x():
    return datagen.normal((R, C), seed=1)


def _close(a, b, tol=2e-6):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol, atol=tol)


def test_silu(x):
    _close(activations.silu(jnp.asarray(x)), activations.silu_ref(x))


def test_silu_mul(x):
    g = datagen.normal((R, C), seed=2)
    _close(activations.silu_mul(jnp.asarray(x), jnp.asarray(g)),
           activations.silu_mul_ref(x, g))


def test_gelu(x):
    _close(activations.gelu(jnp.asarray(x)), activations.gelu_ref(x))


def test_gelu_quick(x):
    _close(activations.gelu_quick(jnp.asarray(x)), activations.gelu_quick_ref(x))


def test_gelu_quick_vs_exact(x):
    """tanh approximation stays within ~3e-3 of exact gelu (llama.cpp claim)."""
    d = np.abs(activations.gelu_ref(x) - activations.gelu_quick_ref(x))
    assert d.max() < 3e-3


def test_elementwise(x):
    y = datagen.normal((R, C), seed=3)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    _close(elementwise.add(xj, yj), elementwise.add_ref(x, y))
    _close(elementwise.mul(xj, yj), elementwise.mul_ref(x, y))
    _close(elementwise.scale(xj, 0.7), elementwise.scale_ref(x, 0.7))
    _close(elementwise.add_scale(xj, yj, 1.3), elementwise.add_scale_ref(x, y, 1.3))


def test_rms_norm(x):
    w = datagen.uniform((C,), 0.5, 1.5, seed=4)
    ref = rms_norm.rms_norm_ref(x, w)
    _close(rms_norm.rms_norm(jnp.asarray(x), jnp.asarray(w)), ref)
    _close(rms_norm.rms_norm_pallas(jnp.asarray(x), jnp.asarray(w)), ref)


def test_rms_norm_odd_rows():
    x = datagen.normal((3, 256), seed=5)
    w = datagen.uniform((256,), 0.5, 1.5, seed=6)
    out = rms_norm.rms_norm_pallas(jnp.asarray(x), jnp.asarray(w))
    assert out.shape == (3, 256)
    _close(out, rms_norm.rms_norm_ref(x, w))


def test_softmax(x):
    ref = softmax.softmax_ref(x)
    _close(softmax.softmax(jnp.asarray(x)), ref)
    _close(softmax.softmax_pallas(jnp.asarray(x)), ref)


def test_softmax_causal(x):
    for pos in [0, 5, C // 2, C - 1, C + 7]:
        ref = softmax.softmax_causal_ref(x, pos, scale=0.125)
        out = softmax.softmax_causal(jnp.asarray(x), pos, scale=0.125)
        _close(out, ref)
        # masked tail must be exact zeros
        if pos + 1 < C:
            assert np.all(np.asarray(out)[:, pos + 1 :] == 0)


def test_softmax_causal_per_row_pos(x):
    pos = np.array([0, 3, 100, C - 1, 2])
    ref = softmax.softmax_causal_ref(x, pos)
    _close(softmax.softmax_causal(jnp.asarray(x), jnp.asarray(pos)), ref)


@pytest.mark.parametrize("interleaved", [False, True])
def test_rope_single_pos(interleaved):
    x = datagen.normal((4, 64), seed=7).reshape(1, 4, 64)  # [1, heads, dim]
    ref = rope.rope_ref(x, 17, interleaved=interleaved)
    out = rope.rope(jnp.asarray(x), 17, interleaved=interleaved)
    _close(out, ref, tol=1e-5)


def test_rope_batched_and_cache():
    x = datagen.normal((6, 4, 64), seed=8)  # [seq, heads, dim]
    pos = np.arange(10, 16)
    ref = rope.rope_ref(x, pos)
    cache = rope.rope_cache(64, 64)
    out = rope.apply_rope(jnp.asarray(x), jnp.asarray(pos), cache)
    _close(out, ref, tol=1e-5)


def test_rope_freq_scale():
    x = datagen.normal((1, 2, 32), seed=9)
    ref = rope.rope_ref(x, 9, freq_scale=0.5)
    cache = rope.rope_cache(16, 32, freq_scale=0.5)
    _close(rope.apply_rope(jnp.asarray(x), 9, cache), ref, tol=1e-5)


def test_rope_norm_preserved():
    """Rotation must preserve pair norms (sanity independent of layout)."""
    x = datagen.normal((1, 2, 64), seed=10)
    out = np.asarray(rope.rope(jnp.asarray(x), 123))
    n_in = np.linalg.norm(x)
    n_out = np.linalg.norm(out)
    assert abs(n_in - n_out) < 1e-3


def test_flash_decode_matches_reference():
    """Fused decode attention vs the dense reference, ragged positions."""
    import jax.numpy as jnp

    from quant_gemm_tpu.ops.attention import flash_decode, flash_decode_ref

    rng = np.random.default_rng(3)
    b, kv, rep, s, hd = 4, 2, 4, 256, 128
    q = jnp.asarray(rng.standard_normal((b, kv, rep, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    pos = jnp.asarray([0, 31, 100, 255], jnp.int32)
    out = flash_decode(q, k, v, pos, ts=64)
    ref = flash_decode_ref(q, k, v, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_decode_bounded_grid():
    """s_hi (the serving bucket's static grid bound) must not change the
    result for positions under the bound, and a STALE position past the
    bound (an inactive serving slot) must stay in-bounds (garbage output
    allowed there, crash not)."""
    import jax.numpy as jnp

    from quant_gemm_tpu.ops.attention import decode_ts_bucket, flash_decode
    from quant_gemm_tpu.ops.attention import flash_decode_ref

    rng = np.random.default_rng(5)
    b, kv, rep, s, hd = 4, 2, 4, 512, 128
    q = jnp.asarray(rng.standard_normal((b, kv, rep, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    pos = jnp.asarray([0, 31, 100, 200], jnp.int32)
    ts, s_hi = decode_ts_bucket(int(pos.max()))
    assert (ts, s_hi) == (128, 256)
    out = flash_decode(q, k, v, pos, ts=ts, s_hi=s_hi)
    ref = flash_decode_ref(q, k, v, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # stale slot past the bound: rows 0..2 (in-bucket) still exact
    pos2 = jnp.asarray([0, 31, 100, 500], jnp.int32)
    out2 = flash_decode(q, k, v, pos2, ts=ts, s_hi=s_hi)
    np.testing.assert_allclose(np.asarray(out2[:3]), np.asarray(ref[:3]),
                               atol=2e-5)
    assert np.isfinite(np.asarray(out2)).all()


def test_flash_decode_gqa_single_rep():
    """rep=1 (MHA) and bf16 cache dtypes go through the same kernel."""
    import jax.numpy as jnp

    from quant_gemm_tpu.ops.attention import flash_decode, flash_decode_ref

    rng = np.random.default_rng(4)
    b, kv, rep, s, hd = 2, 4, 1, 128, 128
    q = jnp.asarray(rng.standard_normal((b, kv, rep, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.bfloat16)
    pos = jnp.asarray([5, 127], jnp.int32)
    out = flash_decode(q, k, v, pos, ts=64)
    ref = flash_decode_ref(q, k, v, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2)


def test_flash_prefill_matches_dense():
    """Causal prefill kernel vs dense softmax, ragged start positions."""
    import jax.numpy as jnp

    from quant_gemm_tpu.ops.attention import flash_prefill

    rng = np.random.default_rng(5)
    b, kv, rep, t, s, hd = 2, 2, 2, 32, 128, 128
    pos0 = jnp.asarray([0, 50], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, kv, t * rep, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    out = flash_prefill(q, k, v, pos0, rep=rep, tq=16, ts=32)

    qn = np.asarray(q).reshape(b, kv, t, rep, hd)
    sc = np.einsum("bgtrd,bgsd->bgtrs", qn, np.asarray(k)) / np.sqrt(hd)
    for bb in range(b):
        mask = np.arange(s)[None, :] > (int(pos0[bb]) + np.arange(t))[:, None]
        sc[bb][:, np.broadcast_to(mask[:, None, :], (t, rep, s))] = -1e30
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bgtrs,bgsd->bgtrd", p, np.asarray(v)).reshape(
        b, kv, t * rep, hd
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


@pytest.mark.slow
def test_model_prefill_flash_path():
    """T >= 64 prefill routes through flash_prefill; result must match the
    dense einsum path (T < 64) run in two halves."""
    import jax.numpy as jnp

    from quant_gemm_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, dim=128, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=256, max_seq=128)
    params = llama.init_params(cfg, seed=8)
    qp = llama.quantize_params(params, "q4_0")
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(1, cfg.vocab, (1, 64)), jnp.int32)

    out_flash, _ = llama.forward(qp, cfg, toks, llama.KVCache.init(cfg, 1))
    c = llama.KVCache.init(cfg, 1)
    out_a, c = llama.forward(qp, cfg, toks[:, :32], c)
    out_b, c = llama.forward(qp, cfg, toks[:, 32:], c)
    dense = np.concatenate([np.asarray(out_a), np.asarray(out_b)], axis=1)
    np.testing.assert_allclose(np.asarray(out_flash), dense, atol=2e-3,
                               rtol=2e-3)


def test_flash_prefill_sliding_window():
    """window > 0 masks slots older than (qpos - window); matches a dense
    masked-softmax reference with ragged start positions."""
    import jax.numpy as jnp

    from quant_gemm_tpu.ops.attention import flash_prefill

    rng = np.random.default_rng(15)
    b, kv, rep, t, s, hd, win = 2, 2, 2, 32, 128, 64, 24
    pos0 = jnp.asarray([0, 60], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, kv, t * rep, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    out = flash_prefill(q, k, v, pos0, rep=rep, tq=16, ts=32, window=win)

    qn = np.asarray(q).reshape(b, kv, t, rep, hd)
    sc = np.einsum("bgtrd,bgsd->bgtrs", qn, np.asarray(k)) / np.sqrt(hd)
    for bb in range(b):
        qpos = int(pos0[bb]) + np.arange(t)[:, None]
        span = np.arange(s)[None, :]
        bad = (span > qpos) | (span <= qpos - win)
        sc[bb][:, np.broadcast_to(bad[:, None, :], (t, rep, s))] = -1e30
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bgtrs,bgsd->bgtrd", p, np.asarray(v)).reshape(
        b, kv, t * rep, hd)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_flash_decode_sliding_window():
    import jax.numpy as jnp

    from quant_gemm_tpu.ops.attention import flash_decode

    rng = np.random.default_rng(16)
    b, kv, rep, s, hd, win = 2, 2, 2, 256, 64, 48
    pos = jnp.asarray([30, 200], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, kv, rep, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    out = flash_decode(q, k, v, pos, ts=64, window=win)

    sc = np.einsum("bgrd,bgsd->bgrs", np.asarray(q), np.asarray(k)) / np.sqrt(hd)
    span = np.arange(s)[None, :]
    p_np = np.asarray(pos)[:, None]
    bad = (span > p_np) | (span <= p_np - win)
    sc[np.broadcast_to(bad[:, None, None, :], sc.shape)] = -1e30
    pr = np.exp(sc - sc.max(-1, keepdims=True))
    pr /= pr.sum(-1, keepdims=True)
    ref = np.einsum("bgrs,bgsd->bgrd", pr, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)


@pytest.mark.slow
def test_model_sliding_window_consistency():
    """cfg.window: the flash-routed long prefill (T>=64), chunked dense
    prefill, and decode all apply the same window."""
    import jax.numpy as jnp

    from quant_gemm_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, dim=128, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=256, max_seq=128, window=24)
    params = llama.init_params(cfg, seed=12)
    qp = llama.quantize_params(params, "q8_0")
    rng = np.random.default_rng(2)
    toks = jnp.asarray(rng.integers(1, 64, (1, 64)), jnp.int32)

    out_flash, c1 = llama.forward(qp, cfg, toks, llama.KVCache.init(cfg, 1))
    c = llama.KVCache.init(cfg, 1)
    out_a, c = llama.forward(qp, cfg, toks[:, :32], c)
    out_b, c = llama.forward(qp, cfg, toks[:, 32:], c)
    dense = np.concatenate([np.asarray(out_a), np.asarray(out_b)], axis=1)
    np.testing.assert_allclose(np.asarray(out_flash), dense, atol=2e-3,
                               rtol=2e-3)
    # decode continues under the window
    nxt = jnp.argmax(out_flash[:, -1], -1)[:, None].astype(jnp.int32)
    d1, _ = llama.forward(qp, cfg, nxt, c1)
    d2, _ = llama.forward(qp, cfg, nxt, c)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-3,
                               rtol=2e-3)
    # windowed logits differ from full-causal (sanity that masking bites)
    full, _ = llama.forward(qp, cfg._replace(window=0), toks,
                            llama.KVCache.init(cfg, 1))
    assert np.abs(np.asarray(full) - np.asarray(out_flash)).max() > 1e-3


def test_flash_decode_window_with_current_token_multi_tile():
    """Production decode config: k_current/v_current fold + sliding window
    across MULTIPLE KV tiles, incl. the window=1-at-tile-boundary edge
    where the low clamp could exceed the last valid tile."""
    import jax.numpy as jnp

    from quant_gemm_tpu.ops.attention import flash_decode

    rng = np.random.default_rng(17)
    b, kv, rep, s, hd = 2, 2, 2, 256, 64
    k = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, kv, rep, hd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, kv, 1, hd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, kv, 1, hd)), jnp.float32)

    for pos_vals, win in (((70, 200), 48), ((64, 128), 1), ((130, 250), 100)):
        pos = jnp.asarray(pos_vals, jnp.int32)
        out = flash_decode(q, k, v, pos, ts=64, window=win,
                           k_current=kc, v_current=vc)
        # dense reference: cached slots (pos-win, pos) + the current token
        kf = np.concatenate([np.asarray(k), np.zeros((b, kv, 1, hd))], 2)
        vf = np.concatenate([np.asarray(v), np.zeros((b, kv, 1, hd))], 2)
        for bb in range(b):
            kf[bb, :, s] = np.asarray(kc)[bb, :, 0]
            vf[bb, :, s] = np.asarray(vc)[bb, :, 0]
        sc = np.einsum("bgrd,bgsd->bgrs", np.asarray(q), kf) / np.sqrt(hd)
        span = np.arange(s + 1)[None, :]
        p_np = np.asarray(pos)[:, None]
        # cached span valid: span < pos and span > pos - win; slot s (the
        # appended current token) always valid
        bad = (span >= p_np) | (span <= p_np - win)
        bad[:, s] = False
        sc[np.broadcast_to(bad[:, None, None, :], sc.shape)] = -1e30
        pr = np.exp(sc - sc.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        ref = np.einsum("bgrs,bgsd->bgrd", pr, vf)
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5,
                                   err_msg=f"pos={pos_vals} win={win}")


def test_llama3_rope_scaling_matches_transformers():
    """llama3_inv_freq pins against HF transformers' rope init (the
    Llama-3.1 frequency-dependent scaling contract)."""
    from quant_gemm_tpu.ops.rope import llama3_inv_freq

    try:
        from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
    except ImportError:
        import pytest as _pytest

        _pytest.skip("transformers unavailable")

    class Cfg:
        rope_theta = 500000.0
        head_dim = 128
        hidden_size = 4096
        num_attention_heads = 32
        max_position_embeddings = 131072
        rope_scaling = {"rope_type": "llama3", "factor": 8.0,
                        "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                        "original_max_position_embeddings": 8192}
        partial_rotary_factor = 1.0

    hf_inv, _ = ROPE_INIT_FUNCTIONS["llama3"](Cfg(), device="cpu")
    mine = llama3_inv_freq(128, 500000.0, 8.0, 1.0, 4.0, 8192)
    np.testing.assert_allclose(mine, hf_inv.numpy(), rtol=1e-6)


def test_rope_cache_inv_freq_override():
    """rope_cache(inv_freq=...) rotates with the supplied spectrum."""
    from quant_gemm_tpu.ops.rope import rope_cache

    inv = np.array([1.0, 0.5, 0.25, 0.125], np.float32)
    cos_t, sin_t = rope_cache(8, 8, inv_freq=inv)
    t = np.arange(8, dtype=np.float32)[:, None] * inv[None, :]
    np.testing.assert_allclose(np.asarray(cos_t), np.cos(t), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sin_t), np.sin(t), rtol=1e-6)
