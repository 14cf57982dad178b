"""Load / export quantized Llama checkpoints as GGUF with llama.cpp naming.

This is the "switch from llama.cpp" workflow: a GGUF file with llama.cpp's
tensor names (``token_embd.weight``, ``blk.{i}.attn_q.weight``, ...,
``output.weight``) and ``llama.*`` metadata keys loads straight into the
serving runtime — quantized tensors stay in their block formats and are
re-packed into the kernel-ready PreparedWeight layout (QKV and gate/up
fused, exactly like :func:`~.llama.quantize_params`).

``export_gguf`` writes the same convention, so checkpoints round-trip and
are readable by llama.cpp itself (byte-exact block layouts —
formats/gguf.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..formats import numpy_ref
from ..formats.gguf_file import GGUFFile, write_gguf
from ..kernels import gemm_pallas
from . import llama

# llama.cpp tensor-name convention (gguf.md / llama.cpp convert scripts)
_EMBED = "token_embd.weight"
_OUT_NORM = "output_norm.weight"
_OUTPUT = "output.weight"
_BLK = {
    "attn_norm": "blk.{i}.attn_norm.weight",
    "wq": "blk.{i}.attn_q.weight",
    "wk": "blk.{i}.attn_k.weight",
    "wv": "blk.{i}.attn_v.weight",
    "wo": "blk.{i}.attn_output.weight",
    "mlp_norm": "blk.{i}.ffn_norm.weight",
    "w_gate": "blk.{i}.ffn_gate.weight",
    "w_up": "blk.{i}.ffn_up.weight",
    "w_down": "blk.{i}.ffn_down.weight",
}


# llama-architecture family: same graph (RMSNorm + RoPE + SwiGLU), config
# keys prefixed by general.architecture, optional QKV biases (qwen2)
SUPPORTED_ARCHS = ("llama", "qwen2", "mistral")


def config_from_metadata(md: dict) -> llama.LlamaConfig:
    """Build a LlamaConfig from ``<arch>.*`` GGUF metadata keys.

    llama.cpp prefixes every model-config key with the architecture name
    (``llama.embedding_length``, ``qwen2.embedding_length``, ...); the
    llama-family archs here share the graph, differing only in metadata
    prefix and optional attention biases."""
    arch = md.get("general.architecture", "llama")
    if arch not in SUPPORTED_ARCHS:
        raise ValueError(
            f"general.architecture={arch!r} is not a supported llama-family "
            f"architecture (known: {SUPPORTED_ARCHS})")

    def get(key, default=None):
        v = md.get(f"{arch}.{key}", default)
        if v is None:
            raise KeyError(f"GGUF metadata missing {arch}.{key}")
        return v

    n_heads = int(get("attention.head_count"))
    return llama.LlamaConfig(
        vocab=int(get("vocab_size",
                      md.get("tokenizer.ggml.tokens_count", 32000))),
        dim=int(get("embedding_length")),
        n_layers=int(get("block_count")),
        n_heads=n_heads,
        n_kv_heads=int(get("attention.head_count_kv", n_heads)),
        d_ff=int(get("feed_forward_length")),
        max_seq=int(get("context_length", 2048)),
        rope_base=float(get("rope.freq_base", 10000.0)),
        eps=float(get("attention.layer_norm_rms_epsilon", 1e-5)),
        window=int(get("attention.sliding_window", 0)),
        rope_scale=_rope_scale_from_metadata(md, arch),
        head_dim_override=int(get("attention.key_length", 0)),
    )


def _rope_scale_from_metadata(md: dict, arch: str = "llama") -> float:
    """llama.cpp LINEAR rope scaling divides positions by `factor`; other
    scaling types (yarn, ...) are not linear-equivalent — refuse loudly
    rather than silently mispositioning every token."""
    factor = float(md.get(f"{arch}.rope.scaling.factor", 1.0))
    stype = md.get(f"{arch}.rope.scaling.type", "linear")
    if factor in (0.0, 1.0):
        return 1.0
    if stype != "linear":
        raise ValueError(
            f"unsupported rope scaling type {stype!r} (factor {factor}); "
            "only linear scaling is implemented"
        )
    return 1.0 / factor


def _rows(t) -> np.ndarray:
    """Loaded GGUF tensor -> dequantizable container or float array."""
    return t


def _concat_quantized(parts):
    """Concat SoA containers on the out-feature (row) axis.

    Block quantization is row-local, so concatenation of containers is
    bit-identical to quantizing the concatenated float matrix.  Parts with
    HETEROGENEOUS formats (a real Q4_K_M file mixes q6_K into attn_v —
    llama.cpp llama_tensor_get_type) cannot fuse; they are returned as-is
    for a :class:`~.llama.SplitLinear` per-part serving slot.
    """
    t0 = parts[0]
    if any(type(p) is not type(t0) for p in parts):
        return None  # heterogeneous: caller keeps the parts unfused
    if isinstance(t0, np.ndarray):
        return np.concatenate([np.asarray(p) for p in parts], axis=0)
    fields = {}
    for name in t0._fields:
        fields[name] = np.concatenate(
            [np.asarray(getattr(p, name)) for p in parts], axis=0
        )
    return type(t0)(**fields)


def _prep(t) -> gemm_pallas.PreparedWeight:
    if isinstance(t, np.ndarray):  # float tensor in a quantized slot
        return gemm_pallas.prepare(numpy_ref.quantize_q4_0(np.asarray(t, np.float32)))
    from ..formats import kquants

    if isinstance(t, kquants.Q4_KTensor):  # K-quants: effective q4_1 form
        return gemm_pallas.prepare(kquants.to_effective(t))
    if isinstance(t, kquants.Q5_KTensor):  # K-quants: effective q5_1 form
        return gemm_pallas.prepare(kquants.to_effective_q5_k(t))
    if isinstance(t, kquants.K16_TENSORS):  # native per-16 serving
        from ..kernels.gemm_exact import prepare_k16

        return prepare_k16(t)
    return gemm_pallas.prepare(t)


def load_llama(path) -> tuple[dict, llama.LlamaConfig]:
    """GGUF file (path or an open GGUFFile) -> (qparams, config)."""
    gf = path if isinstance(path, GGUFFile) else GGUFFile(path)
    cfg = config_from_metadata(gf.metadata)
    embed = gf.load(_EMBED)
    if not isinstance(embed, np.ndarray):
        from ..formats import kquants

        deq = kquants.DEQUANT.get(type(embed))
        embed = deq(embed) if deq else numpy_ref.dequantize(embed)
    out = {
        "embed": jnp.asarray(embed, jnp.bfloat16),
        "final_norm": jnp.asarray(np.asarray(gf.load(_OUT_NORM), np.float32)),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        names = {k: v.format(i=i) for k, v in _BLK.items()}
        lyr = {
            "attn_norm": jnp.asarray(np.asarray(gf.load(names["attn_norm"]), np.float32)),
            "mlp_norm": jnp.asarray(np.asarray(gf.load(names["mlp_norm"]), np.float32)),
        }
        qkv_parts = [gf.load(names["wq"]), gf.load(names["wk"]),
                     gf.load(names["wv"])]
        gu_parts = [gf.load(names["w_gate"]), gf.load(names["w_up"])]
        qkv = _concat_quantized(qkv_parts)
        gu = _concat_quantized(gu_parts)
        lyr["wqkv"] = (llama.SplitLinear(_prep(p) for p in qkv_parts)
                       if qkv is None else _prep(qkv))
        lyr["wo"] = _prep(gf.load(names["wo"]))
        lyr["wgu"] = (llama.SplitLinear(_prep(p) for p in gu_parts)
                      if gu is None else _prep(gu))
        lyr["w_down"] = _prep(gf.load(names["w_down"]))
        bias_names = [f"blk.{i}.attn_{t}.bias" for t in ("q", "k", "v")]
        if all(n in gf.tensors for n in bias_names):  # qwen2 family
            lyr["bqkv"] = jnp.asarray(np.concatenate(
                [np.asarray(gf.load(n), np.float32).reshape(-1)
                 for n in bias_names]))
        out["layers"].append(lyr)
    if _OUTPUT in gf.tensors:
        out["lm_head"] = _prep(gf.load(_OUTPUT))
    else:
        # tied word embeddings (small qwen2 checkpoints omit output.weight;
        # llama.cpp falls back to token_embd the same way)
        out["lm_head"] = _prep(gf.load(_EMBED))
    if "rope_freqs.weight" in gf.tensors:
        # llama.cpp bakes Llama-3.1 frequency scaling as per-dim DIVISORS
        # (ggml rope_ext: theta = theta_base / freq_factor)
        factors = np.asarray(gf.load("rope_freqs.weight"), np.float32)
        base_inv = 1.0 / (cfg.rope_base ** (
            np.arange(0, cfg.head_dim, 2, dtype=np.float64) / cfg.head_dim))
        out["rope_inv_freq"] = jnp.asarray(
            base_inv.astype(np.float32) / factors.reshape(-1))
    return out, cfg


def export_gguf(path, params: dict, cfg: llama.LlamaConfig,
                qtype: str = "q4_0",
                tokenizer_metadata: dict | None = None) -> None:
    """Write float params (llama.init_params layout) as a quantized GGUF.

    Linears quantize to ``qtype``; embeddings and norms stay f32.  Output
    uses llama.cpp tensor names + ``llama.*`` metadata, so the file loads
    back via :func:`load_llama` AND into llama.cpp itself.

    ``tokenizer_metadata``: extra ``tokenizer.ggml.*`` keys (tokens/scores/
    token_type/...) to embed, making the file self-contained for
    ``scripts/generate.py`` prompt->text runs.
    """
    quantize = numpy_ref.QUANTIZE[qtype]
    tensors: dict = {
        _EMBED: np.asarray(params["embed"], np.float32),
        _OUT_NORM: np.asarray(params["final_norm"], np.float32),
        _OUTPUT: quantize(np.asarray(params["lm_head"], np.float32)),
    }
    for i, lyr in enumerate(params["layers"]):
        names = {k: v.format(i=i) for k, v in _BLK.items()}
        for norm in ("attn_norm", "mlp_norm"):
            tensors[names[norm]] = np.asarray(lyr[norm], np.float32)
        for lin in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
            tensors[names[lin]] = quantize(np.asarray(lyr[lin], np.float32))
        for bn in ("bq", "bk", "bv"):  # qwen2-family QKV bias (f32)
            if bn in lyr:
                tensors[f"blk.{i}.attn_{bn[1]}.bias"] = np.asarray(
                    lyr[bn], np.float32)
    metadata = {
        "general.architecture": "llama",
        "general.name": "quant_gemm_tpu export",
        "llama.embedding_length": cfg.dim,
        "llama.block_count": cfg.n_layers,
        "llama.attention.head_count": cfg.n_heads,
        "llama.attention.head_count_kv": cfg.n_kv_heads,
        "llama.feed_forward_length": cfg.d_ff,
        "llama.context_length": cfg.max_seq,
        "llama.vocab_size": cfg.vocab,
        "llama.rope.freq_base": cfg.rope_base,
        "llama.attention.layer_norm_rms_epsilon": cfg.eps,
    }
    if cfg.window:
        metadata["llama.attention.sliding_window"] = cfg.window
    if cfg.head_dim_override:
        metadata["llama.attention.key_length"] = cfg.head_dim_override
        metadata["llama.attention.value_length"] = cfg.head_dim_override
    if cfg.rope_scale != 1.0:
        metadata["llama.rope.scaling.type"] = "linear"
        metadata["llama.rope.scaling.factor"] = 1.0 / cfg.rope_scale
    if "rope_inv_freq" in params:
        # round-trip Llama-3.1 frequency scaling as llama.cpp's baked
        # rope_freqs.weight divisor tensor (theta = theta_base / factor)
        inv = np.asarray(params["rope_inv_freq"], np.float32)
        base_inv = 1.0 / (cfg.rope_base ** (
            np.arange(0, cfg.head_dim, 2, dtype=np.float64) / cfg.head_dim))
        tensors["rope_freqs.weight"] = (
            base_inv.astype(np.float32) / inv).astype(np.float32)
    if tokenizer_metadata:
        metadata.update(tokenizer_metadata)
    write_gguf(path, tensors, metadata)


__all__ = ["load_llama", "export_gguf", "config_from_metadata"]
