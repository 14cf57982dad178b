"""Qwen2-family support: arch-prefixed GGUF metadata, QKV biases, tied
embeddings (llama.cpp LLM_ARCH_QWEN2 — same llama graph + per-layer
attn_{q,k,v}.bias + frequently-tied output weights)."""

import json
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quant_gemm_tpu.formats.gguf_file import write_gguf
from quant_gemm_tpu.harness.metrics import ErrorMetrics
from quant_gemm_tpu.models import gguf_loader, hf_loader, llama

CFG = llama.LlamaConfig(vocab=64, dim=256, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=256, max_seq=32,
                        rope_base=1000000.0)


def _biased_params(seed=3):
    params = llama.init_params(CFG, seed=seed)
    rng = np.random.default_rng(seed + 1)
    for lyr in params["layers"]:
        lyr["bq"] = rng.normal(size=CFG.n_heads * CFG.head_dim).astype(np.float32)
        lyr["bk"] = rng.normal(size=CFG.n_kv_heads * CFG.head_dim).astype(np.float32)
        lyr["bv"] = rng.normal(size=CFG.n_kv_heads * CFG.head_dim).astype(np.float32)
    return params


def _qwen2_gguf(path, params, tied=True):
    from quant_gemm_tpu.formats import numpy_ref

    q = numpy_ref.quantize_q4_0
    tensors = {
        "token_embd.weight": np.asarray(params["embed"], np.float32),
        "output_norm.weight": np.asarray(params["final_norm"], np.float32),
    }
    if not tied:
        tensors["output.weight"] = q(np.asarray(params["lm_head"], np.float32))
    for i, lyr in enumerate(params["layers"]):
        tensors[f"blk.{i}.attn_norm.weight"] = np.asarray(lyr["attn_norm"], np.float32)
        tensors[f"blk.{i}.ffn_norm.weight"] = np.asarray(lyr["mlp_norm"], np.float32)
        for t, w in [("q", "wq"), ("k", "wk"), ("v", "wv")]:
            tensors[f"blk.{i}.attn_{t}.weight"] = q(np.asarray(lyr[w], np.float32))
            tensors[f"blk.{i}.attn_{t}.bias"] = lyr[f"b{t}"]
        tensors[f"blk.{i}.attn_output.weight"] = q(np.asarray(lyr["wo"], np.float32))
        tensors[f"blk.{i}.ffn_gate.weight"] = q(np.asarray(lyr["w_gate"], np.float32))
        tensors[f"blk.{i}.ffn_up.weight"] = q(np.asarray(lyr["w_up"], np.float32))
        tensors[f"blk.{i}.ffn_down.weight"] = q(np.asarray(lyr["w_down"], np.float32))
    write_gguf(path, tensors, metadata={
        "general.architecture": "qwen2",
        "qwen2.embedding_length": CFG.dim,
        "qwen2.block_count": CFG.n_layers,
        "qwen2.attention.head_count": CFG.n_heads,
        "qwen2.attention.head_count_kv": CFG.n_kv_heads,
        "qwen2.feed_forward_length": CFG.d_ff,
        "qwen2.context_length": CFG.max_seq,
        "qwen2.vocab_size": CFG.vocab,
        "qwen2.rope.freq_base": CFG.rope_base,
        "qwen2.attention.layer_norm_rms_epsilon": CFG.eps,
    })


def test_qwen2_arch_metadata(tmp_path):
    params = _biased_params()
    path = tmp_path / "qwen2.gguf"
    _qwen2_gguf(path, params)
    qp, cfg = gguf_loader.load_llama(path)
    assert cfg.dim == CFG.dim and cfg.rope_base == CFG.rope_base
    assert "bqkv" in qp["layers"][0]
    nq = CFG.n_heads * CFG.head_dim
    np.testing.assert_allclose(
        np.asarray(qp["layers"][0]["bqkv"])[:nq], params["layers"][0]["bq"])
    # tied embeddings: lm_head present despite no output.weight tensor
    assert qp["lm_head"] is not None


def test_qwen2_bias_forward_matches_float(tmp_path):
    """Quantized serving with biases tracks the float+bias reference (and
    DIFFERS from the no-bias forward — the bias actually applies)."""
    params = _biased_params()
    path = tmp_path / "qwen2.gguf"
    _qwen2_gguf(path, params)
    qp, cfg = gguf_loader.load_llama(path)
    toks = jnp.asarray([[3, 9, 17, 30]], jnp.int32)

    out, _ = llama.jit_forward(qp, cfg, toks, llama.KVCache.init(cfg, 1))
    # float reference with tied lm_head (the file omits output.weight)
    fparams = {**params, "lm_head": params["embed"]}
    ref, _ = jax.jit(llama.forward_float, static_argnames=("cfg",))(
        fparams, cfg, toks, llama.KVCache.init(cfg, 1))
    m = ErrorMetrics.compute(np.asarray(out), np.asarray(ref))
    assert m.nmse < 5e-2, m

    nobias = {**qp, "layers": [
        {k: v for k, v in lyr.items() if k != "bqkv"} for lyr in qp["layers"]]}
    out_nb, _ = llama.jit_forward(nobias, cfg, toks, llama.KVCache.init(cfg, 1))
    assert float(np.abs(np.asarray(out) - np.asarray(out_nb)).max()) > 1e-3


def test_qwen2_unknown_arch_fails_loudly():
    with pytest.raises(ValueError, match="architecture"):
        gguf_loader.config_from_metadata(
            {"general.architecture": "mamba", "mamba.embedding_length": 64})


def test_quantize_params_carries_bias():
    params = _biased_params()
    qp = llama.quantize_params(params, "q4_0")
    assert "bqkv" in qp["layers"][0]
    toks = jnp.asarray([[1, 2]], jnp.int32)
    out, _ = llama.jit_forward(qp, CFG, toks, llama.KVCache.init(CFG, 1))
    ref, _ = jax.jit(llama.forward_float, static_argnames=("cfg",))(
        params, CFG, toks, llama.KVCache.init(CFG, 1))
    m = ErrorMetrics.compute(np.asarray(out), np.asarray(ref))
    assert m.nmse < 8e-2, m  # 4-bit end to end on random params + biases


def test_hf_loader_qwen2_biases(tmp_path):
    """HF Qwen2 layout (q/k/v_proj.bias, tied embeddings) loads and serves."""
    params = _biased_params(seed=7)
    tensors = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_norm"], np.float32),
    }
    for i, lyr in enumerate(params["layers"]):
        for ours, hf in hf_loader._HF_BLK.items():
            tensors[hf.format(i=i)] = np.asarray(lyr[ours], np.float32)
        for t in ("q", "k", "v"):
            tensors[f"model.layers.{i}.self_attn.{t}_proj.bias"] = lyr[f"b{t}"]
    hf_loader.write_safetensors(tmp_path / "model.safetensors", tensors)
    (tmp_path / "config.json").write_text(json.dumps({
        "vocab_size": CFG.vocab, "hidden_size": CFG.dim,
        "num_hidden_layers": CFG.n_layers,
        "num_attention_heads": CFG.n_heads,
        "num_key_value_heads": CFG.n_kv_heads,
        "intermediate_size": CFG.d_ff,
        "max_position_embeddings": CFG.max_seq,
        "rope_theta": CFG.rope_base,
    }))
    qp, cfg = hf_loader.load_hf_llama(tmp_path)
    assert "bqkv" in qp["layers"][0]
    toks = jnp.asarray([[5, 11]], jnp.int32)
    out, _ = llama.jit_forward(qp, cfg, toks, llama.KVCache.init(cfg, 1))
    fparams = {**params, "lm_head": params["embed"]}
    ref, _ = jax.jit(llama.forward_float, static_argnames=("cfg",))(
        fparams, cfg, toks, llama.KVCache.init(cfg, 1))
    m = ErrorMetrics.compute(np.asarray(out), np.asarray(ref))
    assert m.nmse < 5e-2, m


@pytest.mark.slow
def test_qwen2_tp_bias_matches_single_chip():
    """Megatron-TP with head-chunked biases == single-chip logits."""
    from quant_gemm_tpu.models import llama_tp
    from quant_gemm_tpu.parallel.sharding import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    params = _biased_params(seed=9)
    mesh = make_mesh({"tp": 2})
    sp = llama_tp.shard_params_tp(params, CFG, mesh, "q4_0")
    assert "bqkv" in sp["layers"][0]
    cache = llama_tp.init_cache_tp(CFG, 1, mesh)
    toks = jnp.asarray([[3, 9]], jnp.int32)
    out_tp, _ = llama_tp.forward_tp(sp, CFG, toks, cache, mesh)

    qp = llama.quantize_params(params, "q4_0")
    out_1, _ = llama.jit_forward(qp, CFG, toks, llama.KVCache.init(CFG, 1))
    m = ErrorMetrics.compute(np.asarray(out_tp), np.asarray(out_1))
    assert m.nmse < 1e-4, m


def test_gguf_export_roundtrips_bias(tmp_path):
    params = _biased_params(seed=11)
    path = tmp_path / "rt.gguf"
    gguf_loader.export_gguf(path, params, CFG, qtype="q4_0")
    qp, cfg = gguf_loader.load_llama(path)
    assert "bqkv" in qp["layers"][0]
    nq = CFG.n_heads * CFG.head_dim
    np.testing.assert_allclose(
        np.asarray(qp["layers"][1]["bqkv"])[:nq], params["layers"][1]["bq"])
