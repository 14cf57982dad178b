"""Tensor-parallel quantized Llama serving (Megatron sharding over ICI).

The north-star serving topology (BASELINE.json): packed-INT4 weights stay
packed and are tensor-sharded across chips; per layer the attention block
runs column-parallel QKV -> local-heads attention -> row-parallel out-proj
-> ``psum``, and the MLP runs column-parallel gate/up -> row-parallel down
-> ``psum`` — two collectives per layer, both riding ICI, overlapped with
compute by XLA's scheduler.

* weights: every device holds a self-contained K-major planar
  PreparedWeight chunk (stacked on a leading ``[tp, ...]`` axis, sharded
  there — XLA never re-lays-out the packed uint8 payload).
* QKV / gate-up fusion is preserved *per device*: chunk i is
  ``concat(wq_i, wk_i, wv_i)`` over that device's head group, so local
  GEMM shapes match the single-chip fused path.
* KV cache is sharded on the kv-head axis; the fused flash-decode kernel
  runs on local heads with no communication.
* activations are replicated; each device quantizes them to Q8_1 locally
  (deterministic — no divergence across chips).

Validated on the virtual CPU mesh: tp=1..8 outputs match the single-chip
model bit-for-bit up to f32 psum ordering (tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels import gemm_pallas
from . import llama


def _split_rows(w: np.ndarray, parts: int) -> list[np.ndarray]:
    n = w.shape[0]
    assert n % parts == 0, (n, parts)
    step = n // parts
    return [w[i * step : (i + 1) * step] for i in range(parts)]


def _split_cols(w: np.ndarray, parts: int) -> list[np.ndarray]:
    k = w.shape[1]
    assert k % parts == 0, (k, parts)
    step = k // parts
    return [w[:, i * step : (i + 1) * step] for i in range(parts)]


def _stack_prepared(chunks, mesh: Mesh, axis: str):
    """[PreparedWeight] -> one PreparedWeight of stacked, tp-sharded arrays."""
    c0 = chunks[0]
    if not isinstance(c0, gemm_pallas.PreparedWeight):
        # e.g. PreparedK16 from a natively-served Q4_K_M GGUF (q6_k
        # output.weight): per-16 K-quants have no TP stacking yet
        raise TypeError(
            f"TP stacking supports per-32 PreparedWeight only, got "
            f"{type(c0).__name__}: per-16 K-quant tensors (q2_k/q3_k/q6_k) "
            "are single-chip only — requantize to a per-32 format "
            "(q4_0/q5_0/q8_0 or q4_k/q5_k effective forms) for TP serving"
        )

    def stack(field):
        vals = [getattr(c, field) for c in chunks]
        if vals[0] is None:
            return None
        arr = jnp.stack([jnp.asarray(v) for v in vals])
        return jax.device_put(arr, NamedSharding(mesh, P(axis, None, None)))

    return gemm_pallas.PreparedWeight(
        c0.qtype, c0.n, c0.k, stack("packed_t"), stack("qs_t"),
        stack("d_t"), stack("m_t"), stack("qh_t"), stack("qh2_t"),
    )


def _local(stacked: gemm_pallas.PreparedWeight) -> gemm_pallas.PreparedWeight:
    """Inside shard_map: strip the (length-1) leading device axis."""
    def first(x):
        return None if x is None else x[0]

    s = stacked
    return gemm_pallas.PreparedWeight(
        s.qtype, s.n, s.k, first(s.packed_t), first(s.qs_t),
        first(s.d_t), first(s.m_t), first(s.qh_t), first(s.qh2_t),
    )


def shard_params_tp(params: dict, cfg: llama.LlamaConfig, mesh: Mesh,
                    qtype: str = "q4_0", axis: str = "tp") -> dict:
    """Quantize + Megatron-shard float params over ``mesh[axis]``.

    Column-parallel (head/feature-sharded rows): wqkv, wgu.  Row-parallel
    (K-sharded): wo (by head group), w_down (by d_ff shard).  Embedding,
    norms and lm_head are replicated.
    """
    from ..formats import numpy_ref

    tp = mesh.shape[axis]
    assert cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0, (cfg, tp)
    assert cfg.d_ff % tp == 0
    if qtype == "q4_k":  # K-quant: effective per-32 q4_1 form
        from ..formats import kquants

        def quantize(w):
            return kquants.to_effective(kquants.quantize_q4_k(np.asarray(w)))
    elif qtype == "q5_k":  # K-quant: effective per-32 q5_1 form
        from ..formats import kquants

        def quantize(w):
            return kquants.to_effective_q5_k(
                kquants.quantize_q5_k(np.asarray(w))
            )
    else:
        quantize = numpy_ref.QUANTIZE[qtype]

    def prep_chunks(chunks):
        return _stack_prepared(
            [gemm_pallas.prepare(quantize(np.asarray(c, np.float32)))
             for c in chunks],
            mesh, axis,
        )

    def repl(x, dtype=None):
        arr = jnp.asarray(x) if dtype is None else jnp.asarray(x, dtype)
        spec = P(*([None] * arr.ndim))
        return jax.device_put(arr, NamedSharding(mesh, spec))

    out = {
        "embed": repl(params["embed"], jnp.bfloat16),
        "final_norm": repl(params["final_norm"]),
        "lm_head": _stack_prepared(
            [gemm_pallas.prepare(quantize(np.asarray(params["lm_head"])))] * tp,
            mesh, axis,
        ),
        "layers": [],
    }
    for lyr in params["layers"]:
        q_parts = _split_rows(np.asarray(lyr["wq"]), tp)
        k_parts = _split_rows(np.asarray(lyr["wk"]), tp)
        v_parts = _split_rows(np.asarray(lyr["wv"]), tp)
        gate_parts = _split_rows(np.asarray(lyr["w_gate"]), tp)
        up_parts = _split_rows(np.asarray(lyr["w_up"]), tp)
        extra = {}
        if "bq" in lyr:  # Qwen2-family QKV bias: head-chunked like wqkv,
            # stacked [tp, 1, n_local] so forward's tp strip (b[0, 0]) and
            # forward_tp's 3-D -> P(tp) spec rule both apply
            bq = _split_rows(np.asarray(lyr["bq"], np.float32)[:, None], tp)
            bk = _split_rows(np.asarray(lyr["bk"], np.float32)[:, None], tp)
            bv = _split_rows(np.asarray(lyr["bv"], np.float32)[:, None], tp)
            stacked_b = jnp.stack([
                jnp.concatenate([bq[i], bk[i], bv[i]])[None, :, 0]
                for i in range(tp)
            ])  # [tp, 1, 3n/tp]
            extra["bqkv"] = jax.device_put(
                stacked_b, NamedSharding(mesh, P(axis, None, None)))
        out["layers"].append({
            "attn_norm": repl(lyr["attn_norm"]),
            "mlp_norm": repl(lyr["mlp_norm"]),
            **extra,
            "wqkv": prep_chunks(
                [np.concatenate([q_parts[i], k_parts[i], v_parts[i]], axis=0)
                 for i in range(tp)]
            ),
            "wo": prep_chunks(_split_cols(np.asarray(lyr["wo"]), tp)),
            "wgu": prep_chunks(
                [np.concatenate([gate_parts[i], up_parts[i]], axis=0)
                 for i in range(tp)]
            ),
            "w_down": prep_chunks(_split_cols(np.asarray(lyr["w_down"]), tp)),
        })
    return out


def init_cache_tp(cfg: llama.LlamaConfig, batch: int, mesh: Mesh,
                  axis: str = "tp", qtype: str = "bf16") -> llama.KVCache:
    """KV cache sharded on the kv-head axis (bf16 or int8 per-token q8)."""
    cache = llama.KVCache.init(cfg, batch, qtype)
    spec = NamedSharding(mesh, P(None, None, axis, None, None))
    sspec = NamedSharding(mesh, P(None, None, axis, None))
    return llama.KVCache(
        jax.device_put(cache.k, spec),
        jax.device_put(cache.v, spec),
        jax.device_put(cache.pos, NamedSharding(mesh, P(None))),
        jax.device_put(cache.ks, sspec) if cache.quantized else None,
        jax.device_put(cache.vs, sspec) if cache.quantized else None,
    )


class TPContext:
    """Per-device parameters for llama.forward's TP mode: local widths, the
    stacked-weight unwrapper, and the row-parallel output reduction."""

    def __init__(self, n_heads, n_kv_heads, d_ff, get_w, reduce):
        self.n_heads = n_heads
        self.n_kv_heads = n_kv_heads
        self.d_ff = d_ff
        self.get_w = get_w
        self.reduce = reduce


def forward_tp(qparams: dict, cfg: llama.LlamaConfig, tokens, cache,
               mesh: Mesh, *, act_mode: str = "q8_1", axis: str = "tp"):
    """TP forward: llama.forward's OWN layer loop run per device under
    shard_map with a TPContext (two psums per layer, local-head attention).
    One loop for single-chip and TP keeps the paths from drifting."""
    tp = mesh.shape[axis]
    rope_cache = llama.rope_for(cfg, qparams)

    def spec_of(leaf):
        # stacked weight planes are [tp, rows, cols]; norms/embed replicated
        if getattr(leaf, "ndim", 0) == 3:
            return P(axis, None, None)
        return P(*([None] * leaf.ndim))

    param_specs = jax.tree.map(spec_of, qparams)
    sspec = P(None, None, axis, None) if cache.quantized else None
    cache_specs = llama.KVCache(
        P(None, None, axis, None, None), P(None, None, axis, None, None),
        P(None), sspec, sspec,
    )
    ctx = TPContext(
        n_heads=cfg.n_heads // tp,
        n_kv_heads=cfg.n_kv_heads // tp,
        d_ff=cfg.d_ff // tp,
        get_w=_local,
        reduce=lambda y: jax.lax.psum(y, axis),
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, P(None, None), cache_specs),
        out_specs=(P(None, None, None), cache_specs),
        check_rep=False,
    )
    def run(qp, toks, cache):
        return llama.forward(
            qp, cfg, toks, cache, act_mode=act_mode, rope_cache=rope_cache,
            tp_ctx=ctx,
        )

    return run(qparams, tokens, cache)


__all__ = ["shard_params_tp", "init_cache_tp", "forward_tp"]
