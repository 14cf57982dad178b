"""Load HuggingFace Llama checkpoints (.safetensors) into the serving
runtime.

The GGUF boundary covers llama.cpp interchange; this covers the other half
of the real-world checkpoint universe: an HF `LlamaForCausalLM` directory
(config.json + model*.safetensors) quantizes straight into the kernel-ready
PreparedWeight layout.

The safetensors parser is self-contained (the format is an 8-byte little-
endian header length, a JSON header mapping tensor name -> {dtype, shape,
data_offsets}, then the raw buffer) — no external dependency.

HF stores q/k projections PERMUTED relative to the interleaved-rope
convention (rotate_half): rows are grouped as [head, 2, hd/2] where our
split-layout RoPE expects [head, hd/2, 2]-interleaved... both HF
transformers and this runtime use the SPLIT (rotate-half) convention, so
q/k need NO permutation — weights map 1:1 by name.
"""

from __future__ import annotations

import json
import pathlib
import struct

import numpy as np
import jax.numpy as jnp

from . import llama

_DTYPES = {
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled via uint16 -> float32 expansion below
    "I32": np.int32,
    "I8": np.int8,
    "U8": np.uint8,
}


def _bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    u = raw.view(np.uint16).astype(np.uint32) << 16
    return u.view(np.float32)


class SafetensorsFile:
    """Parsed .safetensors: ``names`` + lazy per-tensor loads."""

    def __init__(self, path):
        self.path = path
        with open(path, "rb") as f:
            (hlen,) = struct.unpack("<Q", f.read(8))
            self.header = json.loads(f.read(hlen).decode("utf-8"))
            self._data_start = 8 + hlen
        self.header.pop("__metadata__", None)

    @property
    def names(self):
        return sorted(self.header)

    def load(self, name: str) -> np.ndarray:
        info = self.header[name]
        dt, shape = info["dtype"], info["shape"]
        o0, o1 = info["data_offsets"]
        with open(self.path, "rb") as f:
            f.seek(self._data_start + o0)
            raw = np.frombuffer(f.read(o1 - o0), np.uint8)
        if dt == "BF16":
            return _bf16_to_f32(raw.view(np.uint16)).reshape(shape)
        np_dt = _DTYPES.get(dt)
        if np_dt is None:
            raise ValueError(f"unsupported safetensors dtype {dt}")
        return raw.view(np_dt).reshape(shape)


def write_safetensors(path, tensors: dict, metadata: dict | None = None):
    """Minimal writer (tests / export): {name: float ndarray}."""
    header: dict = {}
    if metadata:
        header["__metadata__"] = {k: str(v) for k, v in metadata.items()}
    blobs = []
    off = 0
    for name, arr in tensors.items():
        arr = np.asarray(arr)
        dt = {np.dtype(np.float32): "F32", np.dtype(np.float16): "F16"}[arr.dtype]
        b = arr.tobytes()
        header[name] = {"dtype": dt, "shape": list(arr.shape),
                        "data_offsets": [off, off + len(b)]}
        blobs.append(b)
        off += len(b)
    hjson = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)


# HF LlamaForCausalLM tensor names -> our layout
_HF_BLK = {
    "attn_norm": "model.layers.{i}.input_layernorm.weight",
    "wq": "model.layers.{i}.self_attn.q_proj.weight",
    "wk": "model.layers.{i}.self_attn.k_proj.weight",
    "wv": "model.layers.{i}.self_attn.v_proj.weight",
    "wo": "model.layers.{i}.self_attn.o_proj.weight",
    "mlp_norm": "model.layers.{i}.post_attention_layernorm.weight",
    "w_gate": "model.layers.{i}.mlp.gate_proj.weight",
    "w_up": "model.layers.{i}.mlp.up_proj.weight",
    "w_down": "model.layers.{i}.mlp.down_proj.weight",
}


def config_from_hf(cfg_json: dict) -> llama.LlamaConfig:
    """HF config.json -> LlamaConfig.

    rope_scaling types: 'linear' maps to cfg.rope_scale; 'llama3'
    (frequency-dependent, Llama-3.1+) is handled by the LOADER attaching
    per-dim inverse frequencies to the params (cfg stays scale=1); other
    types (yarn, ...) are refused loudly rather than mispositioning."""
    rs = cfg_json.get("rope_scaling") or {}
    rope_scale = 1.0
    if rs:
        stype = rs.get("rope_type", rs.get("type", "linear"))
        if stype == "linear":
            rope_scale = 1.0 / float(rs.get("factor", 1.0))
        elif stype != "llama3":
            raise ValueError(f"unsupported rope scaling {rs!r}")
    return llama.LlamaConfig(
        vocab=int(cfg_json["vocab_size"]),
        dim=int(cfg_json["hidden_size"]),
        n_layers=int(cfg_json["num_hidden_layers"]),
        n_heads=int(cfg_json["num_attention_heads"]),
        n_kv_heads=int(cfg_json.get("num_key_value_heads",
                                    cfg_json["num_attention_heads"])),
        d_ff=int(cfg_json["intermediate_size"]),
        max_seq=int(cfg_json.get("max_position_embeddings", 2048)),
        rope_base=float(cfg_json.get("rope_theta", 10000.0)),
        eps=float(cfg_json.get("rms_norm_eps", 1e-5)),
        window=int(cfg_json.get("sliding_window") or 0),
        rope_scale=rope_scale,
        head_dim_override=int(cfg_json.get("head_dim") or 0),
    )


def load_hf_llama(model_dir, qtype: str = "q4_0"):
    """HF Llama directory -> (qparams ready for llama.forward, config).

    Reads config.json + every model*.safetensors shard; linears quantize
    to ``qtype`` via :func:`llama.quantize_params` (QKV / gate-up fusion and
    the K-quant effective-scale mapping all apply).
    """
    model_dir = pathlib.Path(model_dir)
    cfg_json = json.loads((model_dir / "config.json").read_text())
    cfg = config_from_hf(cfg_json)
    shards = sorted(model_dir.glob("*.safetensors"))
    assert shards, f"no .safetensors under {model_dir}"
    where: dict[str, SafetensorsFile] = {}
    for sh in shards:
        f = SafetensorsFile(sh)
        for n in f.names:
            where[n] = f

    def get(name):
        return np.asarray(where[name].load(name), np.float32)

    def layer(i):
        lyr = {k: get(v.format(i=i)) for k, v in _HF_BLK.items()}
        bn = f"model.layers.{i}.self_attn.{{}}_proj.bias"
        if bn.format("q") in where:  # Qwen2-family QKV biases
            for t in ("q", "k", "v"):
                lyr[f"b{t}"] = get(bn.format(t))
        return lyr

    params = {
        "embed": get("model.embed_tokens.weight"),
        "final_norm": get("model.norm.weight"),
        "lm_head": (get("lm_head.weight") if "lm_head.weight" in where
                    else get("model.embed_tokens.weight")),  # tied embeds
        "layers": [layer(i) for i in range(cfg.n_layers)],
    }
    qparams = llama.quantize_params(params, qtype)
    rs = cfg_json.get("rope_scaling") or {}
    if rs.get("rope_type", rs.get("type")) == "llama3":
        from ..ops.rope import llama3_inv_freq

        qparams["rope_inv_freq"] = jnp.asarray(llama3_inv_freq(
            cfg.head_dim, cfg.rope_base, float(rs["factor"]),
            float(rs["low_freq_factor"]), float(rs["high_freq_factor"]),
            int(rs["original_max_position_embeddings"]),
        ))
    return qparams, cfg


__all__ = ["SafetensorsFile", "write_safetensors", "config_from_hf",
           "load_hf_llama"]
