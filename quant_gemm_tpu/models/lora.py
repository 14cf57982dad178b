"""GGUF LoRA adapters applied at RUNTIME over quantized base weights.

llama.cpp's ``--lora adapter.gguf`` flow (llama_adapter_lora: tensors
``<base>.weight.lora_a`` [r, K] / ``<base>.weight.lora_b`` [N, r],
``adapter.lora.alpha`` metadata, effective scale alpha/r) re-expressed
TPU-first: instead of dequantize-merge-requantize, the low-rank delta runs
as two skinny bf16 matmuls fused by XLA alongside the quantized GEMM —

    y = W_q(x) + scale * (x @ A^T) @ B^T

which keeps the packed base weights byte-identical (swappable adapters,
no quality loss from requantization) and costs O(r*(N+K)) per token, noise
next to the quantized GEMM for the usual r in [8, 64].

Fused slots (wqkv / wgu) carry one delta per constituent tensor, each
adding into its column slice of the fused output.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama


class LoraDelta(NamedTuple):
    a: jax.Array  # [r, K]
    b: jax.Array  # [n_part, r]


class LoraLinear:
    """A quantized linear plus low-rank column-slice deltas (a pytree).

    ``deltas``: tuple of (col_offset, scale) static metadata with matching
    (a, b) children — offset places the part inside a fused slot's output.
    """

    def __init__(self, inner, deltas, meta=None):
        # deltas: sequence of (offset, scale, LoraDelta) OR, when
        # reconstructed from tree_unflatten, children + meta
        if meta is None:
            self.inner = inner
            self.meta = tuple((off, float(s)) for off, s, _ in deltas)
            self.parts = tuple(d for _, _, d in deltas)
        else:
            self.inner = inner
            self.meta = meta
            self.parts = tuple(deltas)

    def tree_flatten(self):
        return (self.inner, self.parts), self.meta

    @classmethod
    def tree_unflatten(cls, meta, children):
        inner, parts = children
        return cls(inner, parts, meta=meta)


jax.tree_util.register_pytree_node_class(LoraLinear)


def apply_lora(w: LoraLinear, y: jax.Array, x: jax.Array) -> jax.Array:
    """Add every low-rank delta into its column slice of y [M, N]."""
    xf = x.astype(jnp.float32)
    for (off, scale), d in zip(w.meta, w.parts):
        delta = (xf @ d.a.astype(jnp.float32).T) @ d.b.astype(jnp.float32).T
        n = d.b.shape[0]
        y = y.at[:, off:off + n].add(scale * delta)
    return y


class LoraAdapter(NamedTuple):
    alpha: float
    tensors: dict  # base tensor name -> LoraDelta (numpy)

    def scale(self, r: int) -> float:
        return self.alpha / r


def load_lora(path) -> LoraAdapter:
    """Read a llama.cpp LoRA adapter GGUF (convert_lora_to_gguf.py output:
    f16/f32 ``*.lora_a``/``*.lora_b`` pairs + adapter.lora.alpha)."""
    from ..formats.gguf_file import GGUFFile

    gf = path if isinstance(path, GGUFFile) else GGUFFile(path)
    md = gf.metadata
    if md.get("adapter.type", "lora") != "lora":
        raise ValueError(f"adapter.type={md.get('adapter.type')!r} != 'lora'")
    alpha = float(md.get("adapter.lora.alpha", 16.0))
    tensors: dict[str, dict] = {}
    for name in gf.tensors:
        for suffix, field in ((".lora_a", "a"), (".lora_b", "b")):
            if name.endswith(suffix):
                base = name[: -len(suffix)]
                tensors.setdefault(base, {})[field] = np.asarray(
                    gf.load(name), np.float32)
    out = {}
    for base, ab in tensors.items():
        if "a" not in ab or "b" not in ab:
            raise ValueError(f"LoRA pair incomplete for {base}")
        out[base] = LoraDelta(ab["a"], ab["b"])
    return LoraAdapter(alpha, out)


# fused-slot composition: slot -> [(llama.cpp base tensor fmt, offset_fn)]
def _slot_parts(cfg: llama.LlamaConfig):
    nq = cfg.n_heads * cfg.head_dim
    nkv = cfg.n_kv_heads * cfg.head_dim
    return {
        "wqkv": [("blk.{i}.attn_q.weight", 0),
                 ("blk.{i}.attn_k.weight", nq),
                 ("blk.{i}.attn_v.weight", nq + nkv)],
        "wo": [("blk.{i}.attn_output.weight", 0)],
        "wgu": [("blk.{i}.ffn_gate.weight", 0),
                ("blk.{i}.ffn_up.weight", cfg.d_ff)],
        "w_down": [("blk.{i}.ffn_down.weight", 0)],
    }


def attach_lora(qparams: dict, adapter: LoraAdapter,
                cfg: llama.LlamaConfig) -> dict:
    """Wrap every adapted linear in qparams with its runtime LoRA deltas.

    Returns a NEW qparams dict (the base packed weights are shared, not
    copied — adapters are hot-swappable).  Unknown adapter tensors raise:
    silently dropping a delta would serve the wrong model.
    """
    used = set()
    out = {k: v for k, v in qparams.items()}
    out["layers"] = []
    parts_map = _slot_parts(cfg)
    for i, lyr in enumerate(qparams["layers"]):
        new = dict(lyr)
        for slot, parts in parts_map.items():
            deltas = []
            for fmt, off in parts:
                base = fmt.format(i=i)
                if base in adapter.tensors:
                    d = adapter.tensors[base]
                    r = d.a.shape[0]
                    deltas.append((off, adapter.scale(r),
                                   LoraDelta(jnp.asarray(d.a),
                                             jnp.asarray(d.b))))
                    used.add(base)
            if deltas:
                new[slot] = LoraLinear(lyr[slot], deltas)
        out["layers"].append(new)
    if "output.weight" in adapter.tensors:
        d = adapter.tensors["output.weight"]
        out["lm_head"] = LoraLinear(
            qparams["lm_head"],
            [(0, adapter.scale(d.a.shape[0]),
              LoraDelta(jnp.asarray(d.a), jnp.asarray(d.b)))])
        used.add("output.weight")
    unknown = set(adapter.tensors) - used
    if unknown:
        raise ValueError(
            f"LoRA adapter tensors with no serving slot: {sorted(unknown)} "
            "(token_embd LoRA is not supported)")
    return out


def export_lora(path, alpha: float, tensors: dict) -> None:
    """Write a llama.cpp-convention LoRA adapter GGUF.

    ``tensors``: base tensor name -> (A [r, K], B [N, r]) float arrays.
    """
    from ..formats.gguf_file import write_gguf

    blobs = {}
    for base, (a, b) in tensors.items():
        blobs[base + ".lora_a"] = np.asarray(a, np.float32)
        blobs[base + ".lora_b"] = np.asarray(b, np.float32)
    write_gguf(path, blobs, metadata={
        "general.type": "adapter",
        "adapter.type": "lora",
        "adapter.lora.alpha": float(alpha),
    })


__all__ = ["LoraAdapter", "LoraDelta", "LoraLinear", "apply_lora",
           "load_lora", "attach_lora", "export_lora"]
