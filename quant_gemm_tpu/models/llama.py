"""Quantized Llama model runtime — the framework's flagship integration.

The reference is a kernel library whose operator catalogue is explicitly
"everything in a llama transformer block except attention-matmul/KV-cache"
(OPERATOR_LIST.md:88-137).  This module assembles those operators into the
full TPU-native inference runtime the reference points at:

* RMSNorm -> QKV projections (quantized GEMMs) -> RoPE -> causal attention
  with a static-shape KV cache -> out-proj -> residual,
* RMSNorm -> gate/up (quantized) -> fused SiLU*gate -> down (quantized),
* activations quantized on the fly to Q8_1 (act_mode='q8_1', the W4A8
  serving path) or kept bf16 (act_mode='bf16', W4A16).

Weights are stored packed (PreparedWeight); attention math runs in bf16 on
the MXU with f32 softmax.  Everything is jit-compatible: static shapes,
``lax.dynamic_update_slice`` KV cache, position-indexed RoPE cache.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import jax_quant
from ..kernels import gemm_pallas
from ..ops.rms_norm import rms_norm
from ..ops.rope import apply_rope, rope_cache as make_rope_cache
from ..ops.activations import silu_mul


class LlamaConfig(NamedTuple):
    vocab: int = 256
    dim: int = 512
    n_layers: int = 2
    n_heads: int = 8
    n_kv_heads: int = 8
    d_ff: int = 1024
    max_seq: int = 256
    rope_base: float = 10000.0
    eps: float = 1e-5
    window: int = 0  # sliding-window attention width (0 = full causal)
    rope_scale: float = 1.0  # linear RoPE position scaling (1/factor)
    ring: bool = False  # O(window) ring-buffer KV cache (needs window > 0)
    ring_chunk: int = 256  # max tokens per forward() call in ring mode
    head_dim_override: int = 0  # explicit head_dim (Mistral-Nemo class); 0 = dim/heads
    # Opt-in: route the down-projection through the W4A16 dequant rung
    # (float activations, no Q8_1 quantize) instead of the exact W4A8
    # kernel.  r5 lab_dequant8 (tpu_campaign.log, m=8 medians): w_down is
    # the ONE serving GEMM where dequant-a16 beats exact (22.8 vs 26.4 us
    # at N=2048 K=8192) — ~58 us/decode-step on the 1.2B model.  Off by
    # default: it trades the reference's W4A8 integer parity on that GEMM
    # for a (slightly more accurate) float-activation path.
    w_down_a16: bool = False

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.dim // self.n_heads

    @property
    def ring_capacity(self) -> int:
        """Ring slots R: token g lives at slot g % R.  Sized so a full
        prefill chunk never overwrites a live window slot
        (R >= window + ring_chunk), rounded so the flash tile sizes stay
        large (serving rings align to 512; tiny test rings to 128)."""
        assert self.ring and self.window > 0
        r = self.window + self.ring_chunk
        align = 512 if r > 512 else 128
        return (r + align - 1) // align * align


LINEAR_NAMES = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def init_params(cfg: LlamaConfig, seed: int = 0) -> dict:
    """Random float32 parameters (numpy, host-side) in [N, K] row-major."""
    rng = np.random.default_rng(seed)

    def lin(n, k):
        return (rng.standard_normal((n, k)) * (1.0 / np.sqrt(k))).astype(np.float32)

    layers = []
    for _ in range(cfg.n_layers):
        layers.append(
            {
                "attn_norm": np.ones(cfg.dim, np.float32),
                "wq": lin(cfg.n_heads * cfg.head_dim, cfg.dim),
                "wk": lin(cfg.n_kv_heads * cfg.head_dim, cfg.dim),
                "wv": lin(cfg.n_kv_heads * cfg.head_dim, cfg.dim),
                "wo": lin(cfg.dim, cfg.n_heads * cfg.head_dim),
                "mlp_norm": np.ones(cfg.dim, np.float32),
                "w_gate": lin(cfg.d_ff, cfg.dim),
                "w_up": lin(cfg.d_ff, cfg.dim),
                "w_down": lin(cfg.dim, cfg.d_ff),
            }
        )
    return {
        "embed": (rng.standard_normal((cfg.vocab, cfg.dim)) * 0.02).astype(np.float32),
        "layers": layers,
        "final_norm": np.ones(cfg.dim, np.float32),
        "lm_head": lin(cfg.vocab, cfg.dim),
    }


def quantize_params(params: dict, qtype: str = "q4_0") -> dict:
    """Quantize every linear to ``qtype`` packed weights (PreparedWeight).

    QKV and gate/up are **fused** into single packed weights (Megatron
    convention): block quantization is row-local, so the concat quantizes
    bit-identically to the parts, and one wide GEMM replaces three — fixed
    per-kernel-call cost (~30 us on a pipeline-ramped Pallas call) dominated
    the decode step before this fusion (57 -> 33 calls per step on a
    16-layer model).  Embedding/norms stay float.
    """
    from ..formats import numpy_ref

    if qtype == "q4_k":  # K-quant: effective per-32 q4_1 form
        from ..formats import kquants

        def quantize(w):
            return kquants.to_effective(kquants.quantize_q4_k(w))
    elif qtype == "q5_k":  # K-quant: effective per-32 q5_1 form
        from ..formats import kquants

        def quantize(w):
            return kquants.to_effective_q5_k(kquants.quantize_q5_k(w))
    elif qtype in ("q2_k", "q3_k", "q6_k"):  # per-16 K-quants: native kernel
        from ..formats import kquants
        from ..kernels.gemm_exact import prepare_k16

        qfn = {"q2_k": kquants.quantize_q2_k, "q3_k": kquants.quantize_q3_k,
               "q6_k": kquants.quantize_q6_k}[qtype]

        def prep(w):
            return prepare_k16(qfn(np.asarray(w, np.float32)))
    else:
        quantize = numpy_ref.QUANTIZE[qtype]

    if qtype not in ("q2_k", "q3_k", "q6_k"):
        def prep(w):
            return gemm_pallas.prepare(quantize(np.asarray(w)))

    out = {
        "embed": jnp.asarray(params["embed"], jnp.bfloat16),
        "final_norm": jnp.asarray(params["final_norm"]),
        "layers": [],
    }
    for lyr in params["layers"]:
        q = {k: jnp.asarray(v) for k, v in lyr.items() if k.endswith("norm")}
        if "bq" in lyr:  # Qwen2-family QKV bias (stays float)
            q["bqkv"] = jnp.concatenate(
                [jnp.asarray(lyr["bq"], jnp.float32),
                 jnp.asarray(lyr["bk"], jnp.float32),
                 jnp.asarray(lyr["bv"], jnp.float32)])
        q["wqkv"] = prep(
            np.concatenate(
                [np.asarray(lyr["wq"]), np.asarray(lyr["wk"]), np.asarray(lyr["wv"])],
                axis=0,
            )
        )
        q["wo"] = prep(lyr["wo"])
        q["wgu"] = prep(
            np.concatenate([np.asarray(lyr["w_gate"]), np.asarray(lyr["w_up"])], axis=0)
        )
        q["w_down"] = prep(lyr["w_down"])
        out["layers"].append(q)
    out["lm_head"] = prep(params["lm_head"])
    return out


def init_qparams_device(cfg: LlamaConfig, qtype: str = "q4_0",
                        seed: int = 0) -> dict:
    """Random quantized model built ENTIRELY on-device (benchmark init).

    ``init_params`` + ``quantize_params`` generate and quantize on the
    host; on a single-core box that takes ~10+ minutes for a 1.2B model
    (measured during the round-3 campaign) while the chip sits idle.
    This twin draws weights with ``jax.random``, quantizes with the
    ``jax_quant`` jit twins (bit-equal semantics to the numpy reference,
    pinned by tests), and lays them out with ``prepare_device`` — same
    PreparedWeight structure, different (device-PRNG) weight values, so
    use it where only the SHAPE of the model matters (throughput
    benches), never for golden-value tests."""
    import jax.random as jrandom

    assert qtype in ("q4_0", "q8_0"), "device init supports q4_0/q8_0"
    qfn = {"q4_0": jax_quant.quantize_q4_0,
           "q8_0": jax_quant.quantize_q8_0}[qtype]
    key = jrandom.key(seed)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def draw_prepared_parts(k, n, kdim):
        w = jrandom.normal(k, (n, kdim), jnp.float32) * (1.0 / kdim ** 0.5)
        return gemm_pallas.prepare_device(qfn(w))

    # one compile per distinct (n, k) shape; layers reuse the executable
    def prep(k, n, kdim):
        return draw_prepared_parts(k, n, kdim)

    kq = cfg.n_heads * cfg.head_dim
    kv = cfg.n_kv_heads * cfg.head_dim
    out = {
        "embed": (jrandom.normal(jrandom.fold_in(key, 1),
                                 (cfg.vocab, cfg.dim), jnp.float32)
                  * 0.02).astype(jnp.bfloat16),
        "final_norm": jnp.ones(cfg.dim, jnp.float32),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        lk = jrandom.fold_in(key, 100 + i)
        out["layers"].append({
            "attn_norm": jnp.ones(cfg.dim, jnp.float32),
            "mlp_norm": jnp.ones(cfg.dim, jnp.float32),
            "wqkv": prep(jrandom.fold_in(lk, 0), kq + 2 * kv, cfg.dim),
            "wo": prep(jrandom.fold_in(lk, 1), cfg.dim, kq),
            "wgu": prep(jrandom.fold_in(lk, 2), 2 * cfg.d_ff, cfg.dim),
            "w_down": prep(jrandom.fold_in(lk, 3), cfg.dim, cfg.d_ff),
        })
    out["lm_head"] = prep(jrandom.fold_in(key, 2), cfg.vocab, cfg.dim)
    return out


def rope_for(cfg: LlamaConfig, params: dict | None = None):
    """The model's RoPE tables: cfg's base/linear-scale spectrum, or the
    per-dimension inverse frequencies a loader attached to the params
    (``params["rope_inv_freq"]`` — Llama-3.1-style frequency scaling /
    GGUF ``rope_freqs.weight``)."""
    inv = params.get("rope_inv_freq") if isinstance(params, dict) else None
    return make_rope_cache(cfg.max_seq, cfg.head_dim, cfg.rope_base,
                           freq_scale=cfg.rope_scale, inv_freq=inv)


class SplitLinear:
    """A fused slot (wqkv / wgu) whose parts carry HETEROGENEOUS block
    formats and therefore stay unfused — e.g. a real Q4_K_M file's q6_K
    ``attn_v`` next to q4_K ``attn_q``/``attn_k`` (llama.cpp
    llama_tensor_get_type mixes formats per tensor; llama.cpp never fuses
    its q/k/v mat_muls, so per-part GEMMs are the exact equivalent).

    A pytree: parts are children, so it flows through jit/device_put.
    """

    def __init__(self, parts):
        self.parts = tuple(parts)

    def tree_flatten(self):
        return self.parts, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children)


jax.tree_util.register_pytree_node_class(SplitLinear)


def _linear(w, x: jax.Array, act_mode: str) -> jax.Array:
    """y[M, N] = x[M, K] @ W^T through the quantized kernel ladder.

    Routed through the registry dispatch: decode-shaped W4A8/W8A8 calls hit
    the exact int8-MXU kernel, prefill hits the dequant MXU kernel.
    SplitLinear slots run one GEMM per part and concatenate on N.
    """
    from .. import kernels as _k

    if isinstance(w, SplitLinear):
        return jnp.concatenate(
            [_linear(p, x, act_mode) for p in w.parts], axis=-1)
    if act_mode == "q8_1":
        # dispatch(quantize_act=True) fuses the Q8_1 quantization INTO the
        # exact kernel on decode shapes (bit-identical to quantizing here)
        # and quantizes via jax_quant on prefill shapes
        return _k.dispatch(w, x.astype(jnp.float32), quantize_act=True)
    return _k.dispatch(w, x.astype(jnp.bfloat16))


class KVCache(NamedTuple):
    """KV cache in attention-native layout.

    ``[L, B, KV, S, hd]`` keeps the sequence dim adjacent to head_dim so the
    decode-step score/value einsums read the cache with **no transposes** —
    with the earlier ``[L, B, S, KV, hd]`` layout XLA re-laid-out the full
    multi-hundred-MB cache every step (measured 4.1 -> 1.1 ms/step on a 0.7B
    model just from this layout + the no-materialization GQA einsum below).

    ``qtype='q8'`` stores k/v as int8 with one f32 scale per (layer, slot,
    head, token) vector (``ks``/``vs`` [L, B, KV, S]) — HALF the bf16
    cache's bytes, which dominate the decode step's HBM floor.  The flash
    kernels never dequantize the slabs: the k scale factors out of the hd
    contraction (applied on scores), the v scale folds into the softmax
    weights p before the pv dot.
    """

    k: jax.Array  # [L, B, n_kv, max_seq, head_dim] bf16 | int8
    v: jax.Array
    pos: jax.Array  # int32 [B]: tokens already cached, per slot
    ks: jax.Array | None = None  # [L, B, n_kv, max_seq] f32 (q8 only)
    vs: jax.Array | None = None

    @property
    def quantized(self) -> bool:
        return self.ks is not None

    @staticmethod
    def init(cfg: LlamaConfig, batch: int, qtype: str = "bf16") -> "KVCache":
        if cfg.ring:
            # O(window) ring: R attended slots + a ring_chunk write margin
            # (chunked-prefill writes land in ONE static-size dus past the
            # ring edge, then fold back to the ring head — see forward());
            # memory is ~window + 2*chunk regardless of max_seq
            sbuf = cfg.ring_capacity + cfg.ring_chunk
        else:
            sbuf = cfg.max_seq
        shape = (cfg.n_layers, batch, cfg.n_kv_heads, sbuf, cfg.head_dim)
        if qtype == "q8":
            return KVCache(
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape, jnp.int8),
                jnp.zeros((batch,), jnp.int32),
                jnp.zeros(shape[:-1], jnp.float32),
                jnp.zeros(shape[:-1], jnp.float32),
            )
        assert qtype == "bf16", qtype
        return KVCache(
            jnp.zeros(shape, jnp.bfloat16),
            jnp.zeros(shape, jnp.bfloat16),
            jnp.zeros((batch,), jnp.int32),
        )


def _quant_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., hd] f32 -> (int8 codes, f32 scale [...]): per-vector amax/127."""
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = (amax / 127.0).astype(jnp.float32)
    inv = jnp.where(scale > 0, 1.0 / scale, 0.0)
    codes = jnp.round(x * inv[..., None]).astype(jnp.int8)
    return codes, scale


def shift_context(cache: KVCache, cfg: LlamaConfig, keep: int,
                  rope_cache=None, trigger: int | None = None) -> KVCache:
    """llama.cpp-style context shift: drop each triggered slot's oldest
    tokens, keep the newest ``keep``, re-positioned to 0..keep-1.

    RoPE is a per-pair rotation by theta(pos), so rotating a slot's cached
    KEYS by the uniform inverse rotation theta(delta) shifts every cached
    position by -delta at once; values are position-free and only compact.
    Slots with ``pos < trigger`` (default: only slots about to overflow,
    ``trigger = max_seq - 1``) are left untouched (delta = 0).

    For sliding-window models with ``keep >= cfg.window`` the attention set
    is preserved exactly, so continuation logits match the unshifted run to
    rope-rotation numerics.  For full-causal models this is the
    StreamingLLM-style trade: old context is dropped to generate forever in
    bounded memory.

    int8 (q8) caches dequantize -> rotate -> requantize the shifted keys
    (rotation mixes lanes, so per-vector scales are recomputed).

    Models with a loader-attached spectrum (``rope_inv_freq``) must pass
    ``rope_cache=rope_for(cfg, qparams)`` — the inverse rotation has to
    use the SAME frequencies the keys were rotated with (the Server does).

    Ring caches (cfg.ring) don't support shifting: the slot mapping
    g % R is not shift-invariant.  A ring model's generation length is
    bounded by max_seq (the RoPE table) — size max_seq generously; the
    table is tiny next to the O(window) cache.
    """
    assert not cfg.ring, "context shift is for linear caches (see docstring)"
    if rope_cache is None:
        rope_cache = make_rope_cache(cfg.max_seq, cfg.head_dim, cfg.rope_base,
                                     freq_scale=cfg.rope_scale)
    if trigger is None:
        trigger = cfg.max_seq - 1
    cos_t, sin_t = rope_cache
    l, b, kv, smax, hd = cache.k.shape
    assert 0 < keep <= smax
    pos = cache.pos
    delta = jnp.where(pos >= trigger, jnp.maximum(pos - keep, 0), 0)

    def rotate_back(k_slab, d_b):  # [L, KV, keep, hd] by -theta(delta)
        cos = cos_t[d_b][None, None, None, :]
        sin = sin_t[d_b][None, None, None, :]
        x = k_slab.astype(jnp.float32)
        x0, x1 = x[..., : hd // 2], x[..., hd // 2 :]
        return jnp.concatenate(
            [x0 * cos + x1 * sin, -x0 * sin + x1 * cos], axis=-1
        )

    new_k, new_v = cache.k, cache.v
    new_ks, new_vs = cache.ks, cache.vs
    for bb in range(b):
        st = delta[bb]
        kslab = jax.lax.dynamic_slice(
            cache.k[:, bb], (0, 0, st, 0), (l, kv, keep, hd)
        )
        vslab = jax.lax.dynamic_slice(
            cache.v[:, bb], (0, 0, st, 0), (l, kv, keep, hd)
        )
        if cache.quantized:
            kss = jax.lax.dynamic_slice(
                cache.ks[:, bb], (0, 0, st), (l, kv, keep)
            )
            vss = jax.lax.dynamic_slice(
                cache.vs[:, bb], (0, 0, st), (l, kv, keep)
            )
            kf = rotate_back(
                kslab.astype(jnp.float32) * kss[..., None], delta[bb]
            )
            kq, ks_new = _quant_kv(kf)
            new_k = new_k.at[:, bb, :, :keep].set(kq)
            new_ks = new_ks.at[:, bb, :, :keep].set(ks_new)
            new_v = new_v.at[:, bb, :, :keep].set(vslab)
            new_vs = new_vs.at[:, bb, :, :keep].set(vss)
        else:
            kf = rotate_back(kslab, delta[bb]).astype(cache.k.dtype)
            new_k = new_k.at[:, bb, :, :keep].set(kf)
            new_v = new_v.at[:, bb, :, :keep].set(vslab)
    return KVCache(new_k, new_v, pos - delta, new_ks, new_vs)


def _attention(cfg, q, k_all, v_all, positions, ks=None, vs=None,
               differentiable=False):
    """q: [B, T, H, hd]; k_all/v_all: [B, KV, S, hd] (full cache buffers).

    ``positions``: [B, T] global position of each query token.  Causal:
    query at position p attends to cache slots <= p (per slot/row).
    GQA runs as a grouped einsum (q reshaped to [B, T, KV, rep, hd]) so the
    cache is never repeated/materialized.  ``ks``/``vs`` [B, KV, S]: int8
    cache scales (see KVCache).

    ``differentiable=True`` (the QAT trainer) forces the dense einsum path:
    the Pallas flash_prefill kernel has no JVP rule, so grads through a
    T >= 64 prefill would raise NotImplementedError.
    """
    b, tq, h, hd = q.shape
    kv = k_all.shape[1]
    s = k_all.shape[2]
    rep = h // kv
    ring_r = cfg.ring_capacity if cfg.ring else 0
    # (decode T=1 does NOT route here: forward inlines flash_decode with the
    # current token's k/v as operands, since the deferred-write contract
    # means the cache no longer holds the current token at this point)
    if tq >= 64 and not differentiable:
        # long prefill: the dense path materializes [B, H, T, S] f32 scores
        # (1 GB at T=S=4096); the flash kernel streams the cache instead
        from ..ops.attention import flash_prefill

        qg = (
            q.reshape(b, tq, kv, rep, hd)
            .transpose(0, 2, 1, 3, 4)
            .reshape(b, kv, tq * rep, hd)
        )
        out = flash_prefill(qg, k_all, v_all, positions[:, 0], rep=rep,
                            k_scale=ks, v_scale=vs, window=cfg.window,
                            ring=ring_r)
        out = (
            out.reshape(b, kv, tq, rep, hd)
            .transpose(0, 2, 1, 3, 4)
            .reshape(b, tq, h * hd)
        )
        return out
    # bf16 MXU einsums on TPU; the CPU test backend lacks mixed-precision
    # grouped dots, so it computes in f32
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    qg = q.reshape(b, tq, kv, rep, hd).astype(dt)
    scores = jnp.einsum(
        "btgrd,bgsd->bgrts", qg, k_all.astype(dt),
        preferred_element_type=jnp.float32,
    ) / np.sqrt(hd).astype(np.float32)  # [B, KV, rep, T, S]
    if ks is not None:  # int8 cache: k scale factors out of the hd dot
        scores = scores * ks[:, :, None, None, :]
    span = jnp.arange(s)[None, None, :]
    if ring_r:
        # ring cache: slot r holds global position g; mask by g, and mask
        # the write-margin slots (r >= R) outright
        p_cache = positions[:, -1][:, None, None]  # newest cached token
        g = p_cache - jnp.mod(p_cache - span, ring_r)
        qpos = positions[:, :, None]
        mask = (g <= qpos) & (g >= 0) & (g > qpos - cfg.window)
        mask = mask & (span < ring_r)
    else:
        mask = span <= positions[:, :, None]  # [B, T, S] causal
        if cfg.window:  # sliding window: slots older than window are masked
            mask = mask & (span > positions[:, :, None] - cfg.window)
    scores = jnp.where(mask[:, None, None], scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    if vs is not None:  # v scale folds into the softmax weights
        probs = probs * vs[:, :, None, None, :]
    out = jnp.einsum(
        "bgrts,bgsd->btgrd", probs.astype(dt), v_all.astype(dt),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, tq, h * hd)


def forward(
    qparams: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, T] int32
    cache: KVCache,
    *,
    act_mode: str = "q8_1",
    rope_cache=None,
    tp_ctx=None,
    return_hidden: bool = False,
    attn_ts: int | None = None,
    attn_s_hi: int | None = None,
) -> tuple[jax.Array, KVCache]:
    """Run T tokens per slot (prefill when T>1, decode when T=1).

    Slots advance independently (per-slot ``cache.pos``), which is what the
    continuous-batching server relies on.  Returns (logits [B, T, vocab]
    f32, updated cache).

    ``tp_ctx`` (models.llama_tp.TPContext) makes the SAME loop serve
    Megatron tensor parallelism inside a shard_map: per-device head/ff
    widths, a weight unwrapper (strips the stacked device axis), and a
    psum applied to the row-parallel wo/w_down outputs.  Keeping one loop
    prevents the single-chip and TP paths from drifting apart.
    """
    if tp_ctx is None:
        heads, kv_heads, d_ff = cfg.n_heads, cfg.n_kv_heads, cfg.d_ff
        get_w = lambda w: w  # noqa: E731
        reduce_out = lambda y: y  # noqa: E731
    else:
        heads, kv_heads, d_ff = tp_ctx.n_heads, tp_ctx.n_kv_heads, tp_ctx.d_ff
        get_w = tp_ctx.get_w
        reduce_out = tp_ctx.reduce
    cfg_attn = cfg._replace(n_heads=heads, n_kv_heads=kv_heads, d_ff=d_ff)
    b, t = tokens.shape
    pos0 = cache.pos  # [B]
    if rope_cache is None:
        rope_cache = rope_for(cfg, qparams)

    x = qparams["embed"][tokens].astype(jnp.float32)  # [B, T, D]
    positions = pos0[:, None] + jnp.arange(t)[None, :]  # [B, T]

    if cfg.ring:
        # ring cache: token g writes at slot g % R.  A prefill chunk lands
        # as ONE static-size dus starting at pos0 % R (spilling into the
        # ring_chunk write margin past slot R when it crosses the ring
        # edge), then the spilled tail folds back onto the ring head with
        # a static-size masked select — no dynamic-size write anywhere.
        # Decode (T=1) starts <= R-1, never spills, never folds.
        assert t <= cfg.ring_chunk, (t, cfg.ring_chunk)
        ring_r = cfg.ring_capacity
        wstart = jnp.mod(pos0, ring_r)
    else:
        ring_r = 0
        wstart = pos0

    def _ring_fold(buf, li):
        """Fold layer li's spilled margin [R, R+C) back onto [0, C)."""
        c = cfg.ring_chunk
        head = buf[li, :, :, :c]
        margin = buf[li, :, :, ring_r : ring_r + c]
        spill = jnp.arange(c)[None, :] < (wstart[:, None] + t - ring_r)
        mask = spill[:, None, :, None] if buf.ndim == 5 else spill[:, None, :]
        return buf.at[li, :, :, :c].set(jnp.where(mask, margin, head))

    def write_cache(buf, li, val_t):
        """In-place per-slot cache write via dynamic_update_slice.

        Positions are contiguous per slot, so each slot is ONE dus (start
        auto-clamped at the buffer end, which keeps overflowing slots in
        bounds).  A gather/scatter formulation here measured 2.5 ms/step on
        an 8-layer 0.7B decode — dus is in-place and ~free under donation.
        """
        for bb in range(b):
            buf = jax.lax.dynamic_update_slice(
                buf, val_t[bb][None, None], (li, bb, 0, wstart[bb], 0)
            )
        if ring_r:
            buf = _ring_fold(buf, li)
        return buf

    def write_cache_all_layers(buf, vals):
        """Decode-path batched write: ONE dus per slot covers every layer.

        vals: [L, B, KV, 1, hd].  Per-layer dus writes cost ~4 us each
        (2*L*B of them = 0.5 ms/step at 16 layers); deferring to a single
        all-layer insert per slot cuts that to 2*B."""
        for bb in range(b):
            buf = jax.lax.dynamic_update_slice(
                buf, vals[:, bb][:, None], (0, bb, 0, wstart[bb], 0)
            )
        return buf

    def write_scales(buf, li, val):  # val [B, KV, T] into [L, B, KV, S]
        for bb in range(b):
            buf = jax.lax.dynamic_update_slice(
                buf, val[bb][None, None], (li, bb, 0, wstart[bb])
            )
        if ring_r:
            buf = _ring_fold(buf, li)
        return buf

    def write_scales_all_layers(buf, vals):  # vals [L, B, KV, 1]
        for bb in range(b):
            buf = jax.lax.dynamic_update_slice(
                buf, vals[:, bb][:, None], (0, bb, 0, wstart[bb])
            )
        return buf

    quant_cache = cache.quantized
    new_k, new_v = cache.k, cache.v
    new_ks, new_vs = cache.ks, cache.vs
    nq = heads * cfg.head_dim
    nkv = kv_heads * cfg.head_dim
    k_pending, v_pending = [], []  # decode: deferred all-layer batch write
    ks_pending, vs_pending = [], []
    # Decode layer-megakernel path (kernels/gemm_megalayer.py): at T=1 with
    # q4_0 PreparedWeights and batch <= 8, fusable per-layer GEMM chains run
    # as single Pallas calls instead of GEMM + elementwise dispatch seams.
    # Round-5 on-chip adjudication (lab_mega): norm_qkv wins (+2.7 us/layer)
    # and ships on; attn_tail measured a loss (-1.0 us/layer) and ships off
    # (gemm_megalayer.ENABLE_TAIL).
    from ..kernels import gemm_megalayer as _mega

    # norm_qkv also serves TENSOR-PARALLEL decode: the column-parallel wqkv
    # shard is self-contained (norm + quantize are replicated work, the
    # local GEMM needs no collective), so each device runs the megakernel
    # on its shard under shard_map.  attn_tail stays single-chip only —
    # its wo/w_down chain crosses the row-parallel psum boundary.
    can_mega = act_mode == "q8_1" and t == 1

    def _wqkv_local(ly):
        return ly["wqkv"] if tp_ctx is None else get_w(ly["wqkv"])

    use_mega = can_mega and all(
        _mega.qkv_supported({**ly, "wqkv": _wqkv_local(ly)}, cfg, b * t)
        for ly in qparams["layers"])
    use_mega_tail = can_mega and tp_ctx is None and all(
        _mega.tail_supported(ly, cfg, b * t) for ly in qparams["layers"])
    for li, lyr in enumerate(qparams["layers"]):
        if use_mega:
            qkv = _mega.norm_qkv(_wqkv_local(lyr), x.reshape(b * t, cfg.dim),
                                 lyr["attn_norm"], cfg.eps)
        else:
            h = rms_norm(x, lyr["attn_norm"], cfg.eps)
            flat = h.reshape(b * t, cfg.dim)
            qkv = _linear(get_w(lyr["wqkv"]), flat, act_mode)  # fused proj
        if "bqkv" in lyr:
            # QKV bias (Qwen2 family; llama.cpp blk.*.attn_{q,k,v}.bias).
            # TP layout stacks it [tp, 1, n_local]; single-chip is [3n]
            bq = lyr["bqkv"]
            qkv = qkv + (bq[0, 0] if getattr(bq, "ndim", 1) == 3 else bq)[None, :]
        q = qkv[:, :nq].reshape(b, t, heads, cfg.head_dim)
        k = qkv[:, nq : nq + nkv].reshape(b, t, kv_heads, cfg.head_dim)
        v = qkv[:, nq + nkv :].reshape(b, t, kv_heads, cfg.head_dim)
        q = apply_rope(q, positions, rope_cache)
        k = apply_rope(k, positions, rope_cache)

        k_t = k.transpose(0, 2, 1, 3).astype(jnp.bfloat16)  # [B, KV, T, hd]
        v_t = v.transpose(0, 2, 1, 3).astype(jnp.bfloat16)
        if quant_cache:
            kq_t, ks_t = _quant_kv(k.transpose(0, 2, 1, 3))
            vq_t, vs_t = _quant_kv(v.transpose(0, 2, 1, 3))
        if t == 1:
            # decode: fused flash-decode on the FULL stacked cache (slicing
            # cache[li] would materialize a per-layer copy for the kernel);
            # the current token's k/v ride as kernel operands so the cache
            # write defers to ONE batched all-layer insert after the loop
            from ..ops.attention import flash_decode

            if quant_cache:
                k_pending.append(kq_t)
                v_pending.append(vq_t)
                ks_pending.append(ks_t)
                vs_pending.append(vs_t)
            else:
                k_pending.append(k_t)
                v_pending.append(v_t)
            qg = q.reshape(b, kv_heads, -1, cfg.head_dim)
            attn = flash_decode(
                qg, new_k, new_v, positions[:, 0], layer=li,
                k_current=k_t, v_current=v_t,
                k_scale=new_ks, v_scale=new_vs, window=cfg.window,
                ring=ring_r, ts=attn_ts, s_hi=attn_s_hi,
            ).reshape(b, t, nq)
        else:
            if quant_cache:
                new_k = write_cache(new_k, li, kq_t)
                new_v = write_cache(new_v, li, vq_t)
                new_ks = write_scales(new_ks, li, ks_t)
                new_vs = write_scales(new_vs, li, vs_t)
            else:
                new_k = write_cache(new_k, li, k_t)
                new_v = write_cache(new_v, li, v_t)
            attn = _attention(
                cfg_attn, q, new_k[li], new_v[li], positions,
                ks=new_ks[li] if quant_cache else None,
                vs=new_vs[li] if quant_cache else None,
            )
        if use_mega_tail:
            x = _mega.attn_tail(
                attn.reshape(b * t, -1), x.reshape(b * t, cfg.dim),
                lyr["mlp_norm"], lyr["wo"], lyr["wgu"], lyr["w_down"],
                cfg.eps, d_ff,
            ).reshape(b, t, cfg.dim)
        else:
            o = _linear(get_w(lyr["wo"]), attn.reshape(b * t, -1), act_mode)
            x = x + reduce_out(o).reshape(b, t, cfg.dim)

            h = rms_norm(x, lyr["mlp_norm"], cfg.eps)
            flat = h.reshape(b * t, cfg.dim)
            gu = _linear(get_w(lyr["wgu"]), flat, act_mode)  # fused gate/up
            ff = silu_mul(gu[:, :d_ff], gu[:, d_ff:])
            dn_mode = ("bf16" if cfg.w_down_a16 and act_mode == "q8_1"
                       else act_mode)  # opt-in W4A16 down-proj (see cfg)
            dn = _linear(get_w(lyr["w_down"]), ff, dn_mode)
            x = x + reduce_out(dn).reshape(b, t, cfg.dim)

    if k_pending:
        new_k = write_cache_all_layers(new_k, jnp.stack(k_pending))
        new_v = write_cache_all_layers(new_v, jnp.stack(v_pending))
    if ks_pending:
        new_ks = write_scales_all_layers(new_ks, jnp.stack(ks_pending))
        new_vs = write_scales_all_layers(new_vs, jnp.stack(vs_pending))
    x = rms_norm(x, qparams["final_norm"], cfg.eps)
    new_cache = KVCache(new_k, new_v, pos0 + t, new_ks, new_vs)
    if return_hidden:
        # the embedding surface (llama.cpp --embedding / server /embedding):
        # final-norm hidden states, no lm_head projection
        return x.astype(jnp.float32), new_cache
    logits = _linear(get_w(qparams["lm_head"]), x.reshape(b * t, cfg.dim), act_mode)
    return logits.reshape(b, t, -1), new_cache


def forward_float(params: dict, cfg: LlamaConfig, tokens, cache: KVCache):
    """FP32 reference forward (same math, dequant-free) for accuracy tests."""
    fp = {
        "embed": jnp.asarray(params["embed"]),
        "final_norm": jnp.asarray(params["final_norm"]),
        "lm_head": _FloatLinear(jnp.asarray(params["lm_head"])),
        "layers": [
            {
                **{k: jnp.asarray(v) for k, v in lyr.items() if k.endswith("norm")},
                **({"bqkv": jnp.concatenate(
                    [jnp.asarray(lyr["bq"]), jnp.asarray(lyr["bk"]),
                     jnp.asarray(lyr["bv"])])} if "bq" in lyr else {}),
                "wqkv": _FloatLinear(
                    jnp.concatenate(
                        [jnp.asarray(lyr["wq"]), jnp.asarray(lyr["wk"]),
                         jnp.asarray(lyr["wv"])], axis=0)
                ),
                "wo": _FloatLinear(jnp.asarray(lyr["wo"])),
                "wgu": _FloatLinear(
                    jnp.concatenate(
                        [jnp.asarray(lyr["w_gate"]), jnp.asarray(lyr["w_up"])],
                        axis=0)
                ),
                "w_down": _FloatLinear(jnp.asarray(lyr["w_down"])),
            }
            for lyr in params["layers"]
        ],
    }
    return forward(fp, cfg, tokens, cache, act_mode="float")


class _FloatLinear:
    """Duck-typed PreparedWeight for the float reference path."""

    def __init__(self, w):
        self.w = w  # [N, K]
        self.n, self.k = w.shape


def _float_linear(w: _FloatLinear, x: jax.Array) -> jax.Array:
    return jnp.dot(
        x.astype(jnp.float32), w.w.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# route float mode through _linear
_quant_linear = _linear


def _linear(w, x, act_mode):  # noqa: F811
    if isinstance(w, _FloatLinear):
        return _float_linear(w, x)
    from . import lora as _lora  # lazy: lora imports llama

    if isinstance(w, _lora.LoraLinear):
        # runtime LoRA: quantized base GEMM + low-rank bf16 delta matmuls
        return _lora.apply_lora(w, _linear(w.inner, x, act_mode), x)
    return _quant_linear(w, x, act_mode)


def greedy_decode(
    qparams: dict,
    cfg: LlamaConfig,
    prompt: jax.Array,  # [B, T0]
    steps: int,
    *,
    act_mode: str = "q8_1",
):
    """Prefill the prompt then greedily decode ``steps`` tokens (jit-able)."""
    b = prompt.shape[0]
    cache = KVCache.init(cfg, b)
    rc = rope_for(cfg, qparams)
    logits, cache = forward(qparams, cfg, prompt, cache, act_mode=act_mode, rope_cache=rc)
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    def body(carry, _):
        tok, cache = carry
        logits, cache = forward(
            qparams, cfg, tok[:, None], cache, act_mode=act_mode, rope_cache=rc
        )
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    (_, cache), toks = jax.lax.scan(body, (tok, cache), None, length=steps - 1)
    return jnp.concatenate([tok[:, None], toks.T], axis=1), cache


def sample_decode(
    qparams: dict,
    cfg: LlamaConfig,
    prompt: jax.Array,  # [B, T0]
    steps: int,
    *,
    key: jax.Array,  # base PRNG key (jax.random.PRNGKey)
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    act_mode: str = "q8_1",
):
    """Prefill then decode ``steps`` sampled tokens (jit-able).

    The whole batch shares one temperature/top-k/top-p config; per-row keys
    are split off ``key`` and folded with the position each step (the same
    scheme the continuous-batching server uses per request).  temperature=0
    reduces to :func:`greedy_decode` exactly.
    """
    from . import sampling

    b, t0 = prompt.shape
    keys = jax.random.split(key, b)
    temps = jnp.full((b,), temperature, jnp.float32)
    topk = jnp.full((b,), top_k, jnp.int32)
    topp = jnp.full((b,), top_p, jnp.float32)
    cache = KVCache.init(cfg, b)
    rc = rope_for(cfg, qparams)
    logits, cache = forward(qparams, cfg, prompt, cache, act_mode=act_mode,
                            rope_cache=rc)
    tok = sampling.sample(logits[:, -1], keys, cache.pos - 1, temps, topk,
                          topp)

    def body(carry, _):
        tok, cache = carry
        logits, cache = forward(
            qparams, cfg, tok[:, None], cache, act_mode=act_mode, rope_cache=rc
        )
        nxt = sampling.sample(logits[:, -1], keys, cache.pos - 1, temps,
                              topk, topp)
        return (nxt, cache), nxt

    (_, cache), toks = jax.lax.scan(body, (tok, cache), None, length=steps - 1)
    return jnp.concatenate([tok[:, None], toks.T], axis=1), cache


# Module-level jitted forward (``cfg``/``act_mode`` static).  Entry points
# and callers share ONE jit cache through this — per-call ``jax.jit``
# wrappers each recompile the same program (~25 s per instance on the CPU
# test backend, and real cost on production restarts).
jit_forward = jax.jit(forward, static_argnames=("cfg", "act_mode",
                                                "return_hidden"))


def embed(qparams, cfg: LlamaConfig, tokens, *, lengths=None,
          pooling: str = "mean", act_mode: str = "q8_1") -> jax.Array:
    """Sequence embeddings from the final-norm hidden states (the
    llama.cpp ``--embedding`` surface).

    ``lengths`` [B]: real token counts when rows are right-padded (callers
    padding to a bucket width — e.g. the HTTP server — keep ONE compiled
    program per bucket instead of one per prompt length).  Pooling masks
    pad positions: 'mean' over real tokens, 'last' = the final REAL token
    (causal-LM convention), 'none' = [B, T, dim] per-token states.
    Returns f32, L2-normalized for mean/last (llama.cpp server semantics).
    """
    tokens = jnp.asarray(tokens, jnp.int32)
    b, t = tokens.shape
    lengths = (jnp.full((b,), t, jnp.int32) if lengths is None
               else jnp.asarray(lengths, jnp.int32))
    cache = KVCache.init(cfg, b)
    hidden, _ = jit_forward(qparams, cfg, tokens, cache,
                            act_mode=act_mode, return_hidden=True)
    if pooling == "none":
        return hidden
    if pooling == "last":
        vec = jnp.take_along_axis(
            hidden, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
    elif pooling == "mean":
        mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)
        vec = (hidden * mask[:, :, None]).sum(axis=1) / jnp.maximum(
            lengths[:, None].astype(jnp.float32), 1.0)
    else:
        raise ValueError(f"unknown pooling {pooling!r}")
    norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    return vec / jnp.where(norm > 0, norm, 1.0)


__all__ = [
    "LlamaConfig",
    "init_params",
    "quantize_params",
    "forward",
    "jit_forward",
    "embed",
    "forward_float",
    "greedy_decode",
    "sample_decode",
    "shift_context",
    "KVCache",
]
