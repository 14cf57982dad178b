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


def _layer(lyr, x, cfg: LlamaConfig, rc, qtype: str):
    """One transformer block with fake-quantized linears."""
    b, t, _ = x.shape

    def lin(w, h):
        wq = fake_quant_ste(w, qtype)
        return jnp.dot(h, wq.T, preferred_element_type=jnp.float32)

    positions = jnp.arange(t)
    h = rms_norm(x, lyr["attn_norm"], cfg.eps)
    flat = h.reshape(b * t, cfg.dim)
    q = lin(lyr["wq"], flat).reshape(b, t, cfg.n_heads, cfg.head_dim)
    k = lin(lyr["wk"], flat).reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
    v = lin(lyr["wv"], flat).reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
    q = apply_rope(q, positions[None, :], rc)
    k = apply_rope(k, positions[None, :], rc)
    # _attention takes cache-layout k/v: [B, KV, S, hd]; differentiable=
    # True keeps the einsum path (the flash kernel has no autodiff rule)
    attn = _attention(
        cfg,
        q,
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        jnp.broadcast_to(jnp.arange(t)[None, :], (b, t)),
        differentiable=True,
    )
    x = x + lin(lyr["wo"], attn.reshape(b * t, -1)).reshape(b, t, cfg.dim)
    h = rms_norm(x, lyr["mlp_norm"], cfg.eps)
    flat = h.reshape(b * t, cfg.dim)
    ff = silu_mul(lin(lyr["w_gate"], flat), lin(lyr["w_up"], flat))
    return x + lin(lyr["w_down"], ff).reshape(b, t, cfg.dim)


def _train_forward(params, cfg: LlamaConfig, tokens, qtype: str,
                   remat: bool = False):
    """Full-sequence causal forward with fake-quantized linears.

    ``remat=True`` wraps each block in ``jax.checkpoint``: activations are
    recomputed in the backward pass instead of stored — the standard
    HBM-for-FLOPs trade that lets long-sequence QAT batches fit (per-layer
    live memory drops from O(L·b·t·dim) to O(b·t·dim) + one block).
    """
    b, t = tokens.shape
    rc = make_rope_cache(cfg.max_seq, cfg.head_dim, cfg.rope_base, freq_scale=cfg.rope_scale)
    x = params["embed"][tokens].astype(jnp.float32)
    blk = functools.partial(_layer, cfg=cfg, rc=rc, qtype=qtype)
    if remat:
        blk = jax.checkpoint(blk)
    for lyr in params["layers"]:
        x = blk(lyr, x)
    x = rms_norm(x, params["final_norm"], cfg.eps)
    wq = fake_quant_ste(params["lm_head"], qtype)
    return jnp.dot(
        x.reshape(b * t, cfg.dim), wq.T, preferred_element_type=jnp.float32
    ).reshape(b, t, cfg.vocab)


def loss_fn(params, cfg: LlamaConfig, tokens, qtype: str = "q4_0",
            remat: bool = False):
    """Next-token cross-entropy."""
    logits = _train_forward(params, cfg, tokens[:, :-1], qtype, remat=remat)
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
# optax training state (AdamW etc.), gradient accumulation, checkpointing
# ---------------------------------------------------------------------------


def make_optimizer(name: str = "adamw", lr: float = 1e-3, **kw):
    """optax transform by name ('adamw' | 'adam' | 'sgd' | 'lion')."""
    import optax

    fns = {"adamw": optax.adamw, "adam": optax.adam, "sgd": optax.sgd,
           "lion": optax.lion}
    return fns[name](lr, **kw)


def make_state_step(params, cfg: LlamaConfig, mesh: Mesh | None = None,
                    optimizer: str = "adamw", lr: float = 1e-3,
                    qtype: str = "q4_0", remat: bool = False,
                    accum_steps: int = 1):
    """Full QAT trainer: returns (params, opt_state, step_fn).

    ``step_fn(params, opt_state, tokens) -> (params, opt_state, loss)``,
    donated in/out.  With ``mesh``, params get the Megatron dp×tp layout
    (`param_shardings`) and the optimizer state inherits it by GSPMD
    propagation (mu/nu mirror the params, scalars replicate) — no hand
    sharding of optax internals.  ``accum_steps > 1`` splits the batch into
    microbatches accumulated in a ``lax.scan`` loop (grad averaging exact).
    """
    import optax

    tx = make_optimizer(optimizer, lr)
    if mesh is not None:
        pshard = param_shardings(params, mesh)
        params = jax.tree.map(
            lambda x, s: jax.device_put(jnp.asarray(x), s), params, pshard,
            is_leaf=lambda x: isinstance(x, np.ndarray),
        )
        dshard = NamedSharding(mesh, P("dp", None))
    else:
        # copy: the returned params feed a donating step_fn, so they must
        # not alias caller-held arrays (donation would invalidate them)
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        dshard = None
    opt_state = jax.jit(tx.init)(params)

    def grads_of(params, tokens):
        if accum_steps == 1:
            return jax.value_and_grad(loss_fn)(params, cfg, tokens, qtype,
                                               remat)
        micro = tokens.reshape(accum_steps, -1, tokens.shape[-1])

        def body(carry, mb):
            loss_acc, g_acc = carry
            loss, g = jax.value_and_grad(loss_fn)(params, cfg, mb, qtype,
                                                  remat)
            return (loss_acc + loss,
                    jax.tree.map(jnp.add, g_acc, g)), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        (loss_sum, g_sum), _ = jax.lax.scan(body, (0.0, zeros), micro)
        scale = 1.0 / accum_steps
        return loss_sum * scale, jax.tree.map(lambda g: g * scale, g_sum)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, tokens):
        if dshard is not None:
            tokens = jax.lax.with_sharding_constraint(tokens, dshard)
        loss, grads = grads_of(params, tokens)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return params, opt_state, step


def save_train_state(path, params, opt_state, step: int = 0) -> None:
    """Checkpoint params + optimizer state + step counter to one .npz."""
    leaves = jax.tree.leaves((params, opt_state))
    np.savez(
        path, __step__=np.int64(step),
        **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)},
    )


def load_train_state(path, params_template, opt_state_template):
    """Restore (params, opt_state, step) saved by :func:`save_train_state`.

    Templates (e.g. fresh ``init_params`` + ``tx.init``) supply the pytree
    structure; leaves are restored in flattening order.
    """
    data = np.load(path)
    treedef = jax.tree.structure((params_template, opt_state_template))
    leaves = [data[f"leaf_{i}"] for i in range(treedef.num_leaves)]
    params, opt_state = jax.tree.unflatten(treedef, leaves)
    return params, opt_state, int(data["__step__"])


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
    "make_optimizer",
    "make_state_step",
    "save_train_state",
    "load_train_state",
]
