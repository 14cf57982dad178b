"""Quantization-aware training step (straight-through estimator).

The reference ships no training loop (SURVEY: "no training ... in the
reference"); this module adds the TPU-native one the framework needs to
*produce* Q4_0-friendly weights: a full next-token cross-entropy training
step over the Llama architecture where every linear runs through
fake-quantization (quantize -> dequantize) with a straight-through gradient
(``w + stop_grad(fq(w) - w)``), so the trained weights land on the 4-bit
grid they will be served from.

Parallelism: data-parallel over the batch axis ('dp') and Megatron-style
tensor parallelism over out-features ('tp'), expressed purely as
``NamedSharding`` annotations on params/batch — XLA inserts the ICI
collectives (all-reduce of grads over dp, activation collectives around the
tp-sharded matmuls).  This is the multi-chip path exercised by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats import jax_quant
from ..ops.activations import silu_mul
from ..ops.rms_norm import rms_norm
from ..ops.rope import apply_rope, rope_cache as make_rope_cache
from .llama import LlamaConfig, LINEAR_NAMES, _attention, init_params


def fake_quant_ste(w: jax.Array, qtype: str = "q4_0") -> jax.Array:
    """Quantize->dequantize with identity gradient (STE)."""
    fq = jax_quant.dequantize(jax_quant.QUANTIZE[qtype](w))
    return w + jax.lax.stop_gradient(fq - w)


def _train_forward(params, cfg: LlamaConfig, tokens, qtype: str):
    """Full-sequence causal forward with fake-quantized linears."""
    b, t = tokens.shape

    def lin(w, x):
        wq = fake_quant_ste(w, qtype)
        return jnp.dot(x, wq.T, preferred_element_type=jnp.float32)

    rc = make_rope_cache(cfg.max_seq, cfg.head_dim, cfg.rope_base)
    x = params["embed"][tokens].astype(jnp.float32)
    positions = jnp.arange(t)
    for lyr in params["layers"]:
        h = rms_norm(x, lyr["attn_norm"], cfg.eps)
        flat = h.reshape(b * t, cfg.dim)
        q = lin(lyr["wq"], flat).reshape(b, t, cfg.n_heads, cfg.head_dim)
        k = lin(lyr["wk"], flat).reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
        v = lin(lyr["wv"], flat).reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
        q = apply_rope(q, positions[None, :], rc)
        k = apply_rope(k, positions[None, :], rc)
        # _attention takes cache-layout k/v: [B, KV, S, hd]
        attn = _attention(
            cfg,
            q,
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            jnp.broadcast_to(jnp.arange(t)[None, :], (b, t)),
        )
        x = x + lin(lyr["wo"], attn.reshape(b * t, -1)).reshape(b, t, cfg.dim)
        h = rms_norm(x, lyr["mlp_norm"], cfg.eps)
        flat = h.reshape(b * t, cfg.dim)
        ff = silu_mul(lin(lyr["w_gate"], flat), lin(lyr["w_up"], flat))
        x = x + lin(lyr["w_down"], ff).reshape(b, t, cfg.dim)
    x = rms_norm(x, params["final_norm"], cfg.eps)
    return lin(params["lm_head"], x.reshape(b * t, cfg.dim)).reshape(b, t, cfg.vocab)


def loss_fn(params, cfg: LlamaConfig, tokens, qtype: str = "q4_0"):
    """Next-token cross-entropy."""
    logits = _train_forward(params, cfg, tokens[:, :-1], qtype)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)


def train_step(params, cfg: LlamaConfig, tokens, lr: float = 1e-3, qtype: str = "q4_0"):
    """One SGD step; returns (new_params, loss)."""
    loss, grads = jax.value_and_grad(loss_fn)(params, cfg, tokens, qtype)
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss


# ---------------------------------------------------------------------------
# sharding annotations
# ---------------------------------------------------------------------------


def param_shardings(params, mesh: Mesh):
    """Megatron-style TP layout: out-feature dim of each linear on 'tp'.

    wq/wk/wv/w_gate/w_up are column-parallel (dim 0 = out-features
    sharded); wo/w_down are row-parallel (dim 1 = K sharded); embeddings
    vocab-sharded; norms replicated.
    """
    col = NamedSharding(mesh, P("tp", None))
    row = NamedSharding(mesh, P(None, "tp"))
    rep = NamedSharding(mesh, P())

    def one_layer(lyr):
        out = {}
        for k in lyr:
            if k.endswith("norm"):
                out[k] = rep
            elif k in ("wo", "w_down"):
                out[k] = row
            else:
                out[k] = col
        return out

    return {
        "embed": col,
        "layers": [one_layer(l) for l in params["layers"]],
        "final_norm": rep,
        "lm_head": col,
    }


def make_sharded_step(params, cfg: LlamaConfig, mesh: Mesh, lr: float = 1e-3,
                      qtype: str = "q4_0"):
    """jit the train step with dp batch sharding + tp param sharding."""
    pshard = param_shardings(params, mesh)
    dshard = NamedSharding(mesh, P("dp", None))
    params = jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), params, pshard,
        is_leaf=lambda x: isinstance(x, np.ndarray),
    )

    @functools.partial(
        jax.jit,
        in_shardings=(pshard, dshard),
        out_shardings=(pshard, NamedSharding(mesh, P())),
        static_argnums=(),
    )
    def step(params, tokens):
        return train_step(params, cfg, tokens, lr=lr, qtype=qtype)

    return params, step


__all__ = [
    "fake_quant_ste",
    "loss_fn",
    "train_step",
    "param_shardings",
    "make_sharded_step",
]
