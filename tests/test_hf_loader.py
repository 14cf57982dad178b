"""HF safetensors loader tests: byte-exact parse, full-model round trip."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.models import hf_loader, llama

CFG = llama.LlamaConfig(vocab=64, dim=128, n_layers=2, n_heads=2,
                        n_kv_heads=2, d_ff=256, max_seq=32)


def test_safetensors_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a": rng.standard_normal((4, 8)).astype(np.float32),
        "b": rng.standard_normal((3,)).astype(np.float16),
    }
    p = tmp_path / "t.safetensors"
    hf_loader.write_safetensors(p, tensors, {"format": "pt"})
    f = hf_loader.SafetensorsFile(p)
    assert f.names == ["a", "b"]
    for k, v in tensors.items():
        np.testing.assert_array_equal(f.load(k), v)


def test_bf16_decode():
    x = np.asarray([1.5, -2.0, 3.25], np.float32)
    bf = ((x.view(np.uint32) >> 16).astype(np.uint16))  # truncate to bf16
    back = hf_loader._bf16_to_f32(bf)
    np.testing.assert_array_equal(back, x)  # exactly representable values


def test_config_from_hf():
    cfg = hf_loader.config_from_hf({
        "vocab_size": 32000, "hidden_size": 4096, "num_hidden_layers": 32,
        "num_attention_heads": 32, "num_key_value_heads": 8,
        "intermediate_size": 14336, "max_position_embeddings": 32768,
        "rope_theta": 1e6, "rms_norm_eps": 1e-5, "sliding_window": 4096,
    })
    assert cfg.n_kv_heads == 8 and cfg.window == 4096
    assert cfg.rope_base == 1e6 and cfg.d_ff == 14336


@pytest.mark.slow
def test_load_hf_llama_matches_native_quantize(tmp_path):
    """A synthetic HF checkpoint loads and serves identically to
    quantize_params on the same float weights."""
    params = llama.init_params(CFG, seed=50)
    hf_tensors = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_norm"], np.float32),
        "lm_head.weight": np.asarray(params["lm_head"], np.float32),
    }
    name_map = {
        "attn_norm": "input_layernorm.weight",
        "wq": "self_attn.q_proj.weight", "wk": "self_attn.k_proj.weight",
        "wv": "self_attn.v_proj.weight", "wo": "self_attn.o_proj.weight",
        "mlp_norm": "post_attention_layernorm.weight",
        "w_gate": "mlp.gate_proj.weight", "w_up": "mlp.up_proj.weight",
        "w_down": "mlp.down_proj.weight",
    }
    for i, lyr in enumerate(params["layers"]):
        for ours, hf in name_map.items():
            hf_tensors[f"model.layers.{i}.{hf}"] = np.asarray(
                lyr[ours], np.float32)
    hf_loader.write_safetensors(tmp_path / "model.safetensors", hf_tensors)
    (tmp_path / "config.json").write_text(json.dumps({
        "vocab_size": CFG.vocab, "hidden_size": CFG.dim,
        "num_hidden_layers": CFG.n_layers,
        "num_attention_heads": CFG.n_heads,
        "num_key_value_heads": CFG.n_kv_heads,
        "intermediate_size": CFG.d_ff, "max_position_embeddings": CFG.max_seq,
    }))

    qp_hf, cfg = hf_loader.load_hf_llama(tmp_path, "q8_0")
    assert cfg == CFG._replace(max_seq=CFG.max_seq)
    qp_native = llama.quantize_params(params, "q8_0")
    toks = jnp.asarray([[5, 9, 3, 7]], jnp.int32)
    l1, _ = llama.forward(qp_hf, cfg, toks, llama.KVCache.init(cfg, 1))
    l2, _ = llama.forward(qp_native, cfg, toks, llama.KVCache.init(cfg, 1))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
