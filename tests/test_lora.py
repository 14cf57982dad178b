"""Runtime LoRA adapters (llama.cpp --lora adapter.gguf analogue)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quant_gemm_tpu.harness.metrics import ErrorMetrics
from quant_gemm_tpu.models import llama, lora

CFG = llama.LlamaConfig(vocab=64, dim=256, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=256, max_seq=32)
RANK, ALPHA = 8, 16.0


def _adapter_tensors(cfg, seed=5):
    """LoRA A/B for q, v, gate, down of every layer + lm_head (a typical
    PEFT target set), scaled small like real finetunes."""
    rng = np.random.default_rng(seed)
    nq = cfg.n_heads * cfg.head_dim
    nkv = cfg.n_kv_heads * cfg.head_dim

    def ab(n, k):
        return (rng.normal(size=(RANK, k)).astype(np.float32) * 0.05,
                rng.normal(size=(n, RANK)).astype(np.float32) * 0.05)

    out = {}
    for i in range(cfg.n_layers):
        out[f"blk.{i}.attn_q.weight"] = ab(nq, cfg.dim)
        out[f"blk.{i}.attn_v.weight"] = ab(nkv, cfg.dim)
        out[f"blk.{i}.ffn_gate.weight"] = ab(cfg.d_ff, cfg.dim)
        out[f"blk.{i}.ffn_down.weight"] = ab(cfg.dim, cfg.d_ff)
    out["output.weight"] = ab(cfg.vocab, cfg.dim)
    return out


def _merged_float_params(params, tensors, scale):
    """Reference: the LoRA deltas merged into the float weights."""
    merged = {k: (np.asarray(v, np.float32) if not isinstance(v, list) else v)
              for k, v in params.items()}
    merged["layers"] = [dict(lyr) for lyr in params["layers"]]
    name_of = {"attn_q": "wq", "attn_v": "wv", "ffn_gate": "w_gate",
               "ffn_down": "w_down"}
    for base, (a, b) in tensors.items():
        if base == "output.weight":
            merged["lm_head"] = np.asarray(
                params["lm_head"], np.float32) + scale * (b @ a)
            continue
        _, i, part, _ = base.split(".")
        lyr = merged["layers"][int(i)]
        key = name_of[part]
        lyr[key] = np.asarray(lyr[key], np.float32) + scale * (b @ a)
    return merged


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    params = llama.init_params(CFG, seed=4)
    tensors = _adapter_tensors(CFG)
    path = tmp_path_factory.mktemp("lora") / "adapter.gguf"
    lora.export_lora(path, ALPHA, tensors)
    adapter = lora.load_lora(path)
    return params, tensors, adapter


def test_adapter_gguf_roundtrip(setup):
    _, tensors, adapter = setup
    assert adapter.alpha == ALPHA
    assert set(adapter.tensors) == set(tensors)
    a, b = tensors["blk.0.attn_q.weight"]
    np.testing.assert_array_equal(adapter.tensors["blk.0.attn_q.weight"].a, a)
    np.testing.assert_array_equal(adapter.tensors["blk.0.attn_q.weight"].b, b)


def test_lora_forward_matches_merged_reference(setup):
    """Quantized base + runtime deltas == float weights with LoRA merged
    (up to 4-bit quantization error of the BASE only — the delta path is
    exact float, so the gap must match the no-LoRA quantization gap)."""
    params, tensors, adapter = setup
    qp = llama.quantize_params(params, "q4_0")
    qp_lora = lora.attach_lora(qp, adapter, CFG)
    assert isinstance(qp_lora["layers"][0]["wqkv"], lora.LoraLinear)
    assert isinstance(qp_lora["lm_head"], lora.LoraLinear)
    # base qparams untouched (hot-swappable)
    assert not isinstance(qp["layers"][0]["wqkv"], lora.LoraLinear)

    toks = jnp.asarray([[3, 9, 17, 30]], jnp.int32)
    out, _ = llama.jit_forward(qp_lora, CFG, toks, llama.KVCache.init(CFG, 1))

    merged = _merged_float_params(params, tensors, adapter.scale(RANK))
    ref, _ = jax.jit(llama.forward_float, static_argnames=("cfg",))(
        merged, CFG, toks, llama.KVCache.init(CFG, 1))
    m = ErrorMetrics.compute(np.asarray(out), np.asarray(ref))

    # the delta path is exact float, so the lora-model gap to its merged
    # float reference must equal the BASE model's pure quantization gap
    base_out, _ = llama.jit_forward(qp, CFG, toks, llama.KVCache.init(CFG, 1))
    base_ref, _ = jax.jit(llama.forward_float, static_argnames=("cfg",))(
        params, CFG, toks, llama.KVCache.init(CFG, 1))
    m0 = ErrorMetrics.compute(np.asarray(base_out), np.asarray(base_ref))
    assert m.nmse < 1.3 * m0.nmse + 1e-4, (m, m0)
    assert m.nmse < 0.1, m

    # and the adapter actually changes the output
    assert float(np.abs(np.asarray(out) - np.asarray(base_out)).max()) > 1e-3


def test_fused_slot_column_offsets(setup):
    """The q and v deltas land in THEIR slices of the fused wqkv output:
    adapting only v must leave q/k columns bit-identical."""
    params, _, _ = setup
    rng = np.random.default_rng(8)
    nkv = CFG.n_kv_heads * CFG.head_dim
    only_v = {"blk.0.attn_v.weight": (
        rng.normal(size=(RANK, CFG.dim)).astype(np.float32),
        rng.normal(size=(nkv, RANK)).astype(np.float32))}
    adapter = lora.LoraAdapter(ALPHA, {
        k: lora.LoraDelta(a, b) for k, (a, b) in only_v.items()})
    qp = llama.quantize_params(params, "q4_0")
    qp_v = lora.attach_lora(qp, adapter, CFG)
    x = jnp.asarray(np.random.default_rng(9).normal(
        size=(2, CFG.dim)).astype(np.float32))
    from quant_gemm_tpu.models.llama import _linear

    y0 = np.asarray(_linear(qp["layers"][0]["wqkv"], x, "q8_1"))
    y1 = np.asarray(_linear(qp_v["layers"][0]["wqkv"], x, "q8_1"))
    nq = CFG.n_heads * CFG.head_dim
    np.testing.assert_array_equal(y0[:, : nq + nkv], y1[:, : nq + nkv])
    assert np.abs(y0[:, nq + nkv:] - y1[:, nq + nkv:]).max() > 1e-4


def test_unknown_tensor_fails_loudly(setup):
    params, _, _ = setup
    adapter = lora.LoraAdapter(ALPHA, {
        "blk.0.bogus.weight": lora.LoraDelta(
            np.zeros((4, CFG.dim), np.float32),
            np.zeros((CFG.dim, 4), np.float32))})
    qp = llama.quantize_params(params, "q4_0")
    with pytest.raises(ValueError, match="no serving slot"):
        lora.attach_lora(qp, adapter, CFG)
