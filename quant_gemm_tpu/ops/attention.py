"""Fused decode attention (flash-decode) Pallas kernel.

The reference has no attention matmul at all — flash attention is its
explicitly-listed future work (OPERATOR_LIST.md:58-78).  This kernel is the
TPU-native version for the serving runtime's decode step (T = 1):

* one pass over the KV cache per (slot, kv-head) at streaming rate,
* online softmax (running max / running sum, flash-attention recurrence),
* GQA: the ``rep = H / KV`` query rows of a kv-head ride one tile,
* continuous batching: per-slot sequence lengths via scalar-prefetched
  positions; fully-masked tiles are skipped before their DMA issues.

Layout contract matches the serving KV cache ``[B, KV, S, hd]`` (sequence
adjacent to head_dim — models/llama.KVCache), so the kernel reads cache
slabs ``[TS, hd]`` with no transposes; scores use a contraction-on-minor
``dot_general`` (q [rep, hd] x k [TS, hd] -> [rep, TS]).

The XLA einsum path on the same layout measured ~1.2 ms per 16-layer decode
step vs the ~0.6 ms cache-streaming floor; this kernel exists to close that
gap (see docs/PERF_NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


NEG_INF = float(np.finfo(np.float32).min)


def _ring_tile_bounds(p_new, cnt, ring, ts):
    """Ring tiles holding the modular interval of ``cnt`` slots ending at
    global position ``p_new`` (ring slot ``p_new % ring``).  Returns
    (t_lo, t_hi); the valid tile set is [t_lo, t_hi] when t_lo <= t_hi,
    else the wrapped union [0, t_hi] | [t_lo, ns-1]."""
    r_hi = jnp.mod(p_new, ring)
    r_lo = jnp.mod(p_new - cnt + 1, ring)
    return r_lo // ts, r_hi // ts


def _ring_tile_inside(st, t_lo, t_hi):
    return jnp.where(
        t_lo <= t_hi,
        jnp.logical_and(st >= t_lo, st <= t_hi),
        jnp.logical_or(st <= t_hi, st >= t_lo),
    )


def _kernel(*refs, ts: int, ns: int, scale: float, stacked: bool,
            has_current: bool, quant: bool, window: int, ring: int):
    """Grid (B, S/ts); S innermost; ALL kv heads ride one tile (the cache
    slab per step is [KV, ts, hd] — MB-sized DMAs; a per-head grid measured
    3x slower, DMA-issue-latency bound).  Scratch m/l/acc persist over S.

    With ``has_current``, the just-produced token's k/v arrive as separate
    operands and are folded into the online softmax at the final step —
    the cache does NOT need to contain the current token (lets the model
    defer all cache writes to one batched insert per step).
    """
    it = iter(refs)
    pos_ref = next(it)
    q_ref = next(it)
    k_ref, v_ref = next(it), next(it)
    ks_ref, vs_ref = (next(it), next(it)) if quant else (None, None)
    kc_ref, vc_ref = (next(it), next(it)) if has_current else (None, None)
    o_ref = next(it)
    m_ref, l_ref, acc_ref = next(it), next(it), next(it)

    b = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # cached slots valid: <= pos when the cache already holds the current
    # token, < pos when it arrives via the kc/vc operands
    seq_len = pos_ref[b] + (0 if has_current else 1)
    if ring:
        # ring cache: slot r holds global position g = p_new - age with
        # age = (p_new - r) mod ring; valid iff age < cnt (inside the
        # window AND actually written — cnt folds both bounds)
        p_new = seq_len - 1
        wc = window - (1 if has_current else 0)
        cnt = jnp.minimum(wc, seq_len)
        t_lo, t_hi = _ring_tile_bounds(p_new, jnp.maximum(cnt, 1), ring, ts)
        guard = jnp.logical_and(_ring_tile_inside(s, t_lo, t_hi), cnt > 0)
    else:
        # sliding window: the query (at pos) attends slots > pos - window
        lo = jnp.maximum(pos_ref[b] - window + 1, 0) if window else 0
        guard = jnp.logical_and(s * ts < seq_len, (s + 1) * ts > lo)

    @pl.when(guard)
    def _tile():
        q = q_ref[0].astype(jnp.float32) * scale  # [KV, rep, hd]
        k = (k_ref[0, 0] if stacked else k_ref[0]).astype(jnp.float32)  # [KV, ts, hd]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [KV, rep, ts]
        if quant:
            # int8 cache: per-token k scale factors out of the hd
            # contraction, so it applies as one [KV, 1, ts] multiply on the
            # scores instead of per-element dequant of the k slab
            ks = (ks_ref[0, 0] if stacked else ks_ref[0])  # [KV, ts] f32
            scores = scores * ks[:, None, :]
        span = s * ts + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        if ring:
            age = jnp.mod(p_new - span, ring)
            valid = age < cnt
        else:
            valid = span < seq_len
            if window:
                valid = jnp.logical_and(valid, span >= lo)
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[:, :, :1]  # [KV, rep, 1] (lane-0 column)
        m_cur = jnp.max(scores, axis=2, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # rescale factor for old state
        p = jnp.exp(scores - m_new)  # [KV, rep, ts]
        l_ref[:, :, :1] = (
            l_ref[:, :, :1] * alpha + jnp.sum(p, axis=2, keepdims=True)
        )
        m_ref[:, :, :1] = m_new
        vslab = (v_ref[0, 0] if stacked else v_ref[0]).astype(jnp.float32)
        if quant:
            # per-token v scale folds into p (the s-contraction weights)
            vs = (vs_ref[0, 0] if stacked else vs_ref[0])  # [KV, ts] f32
            p = p * vs[:, None, :]
        pv = jax.lax.dot_general(
            p, vslab, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [KV, rep, hd]
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(s == ns - 1)
    def _finish():
        m_prev = m_ref[:, :, :1]
        l_prev = l_ref[:, :, :1]
        acc = acc_ref[:]
        if has_current:
            q = q_ref[0].astype(jnp.float32) * scale  # [KV, rep, hd]
            kc = kc_ref[0].astype(jnp.float32)  # [KV, 1, hd]
            vc = vc_ref[0].astype(jnp.float32)
            cur = jnp.sum(q * kc, axis=2, keepdims=True)  # [KV, rep, 1]
            m_new = jnp.maximum(m_prev, cur)
            alpha = jnp.exp(m_prev - m_new)
            p_cur = jnp.exp(cur - m_new)
            l_prev = l_prev * alpha + p_cur
            acc = acc * alpha + p_cur * vc  # broadcast [KV, 1, hd]
        o_ref[0] = (acc / jnp.where(l_prev > 0, l_prev, 1.0)).astype(o_ref.dtype)


def decode_ts_bucket(
    max_ctx: int, quant: bool = True
) -> tuple[int | None, int | None]:
    """(tile size, static sequence bound) for a decode step whose longest
    slot is at ``max_ctx`` cached tokens.

    Two short-context wins, both keyed on the STATIC bucket boundary so the
    jit cache stays bounded (at most 2 recompiles per config as the batch's
    max context crosses 256 and 512):

    * tile size — the KV BlockSpec clamp is TILE-granular: a slot with 5
      cached tokens still DMAs a full ts-token tile.  Measured on v5e (q8
      cache, B=8, KV=16, hd=128, medians of 5 interleaved): ctx 16/128 →
      ts128 32.7/32.9 µs vs ts512 45.0/45.5; ctx 448 → ts256 43.2 best.
    * grid bound (``s_hi``) — without it the grid iterates max_seq/ts
      steps per slot even when every step past the bucket is clamped to a
      deduped DMA + skipped compute; per-grid-step bookkeeping is the
      short-ctx floor.  Every slot's position must be < s_hi (the caller
      picks the bucket from the batch max, so it is).
    """
    if max_ctx < 256:
        return 128, 256
    if max_ctx < 512:
        return (256 if quant else None), 512  # bf16 default IS 256
    return None, None  # format default: 512 (q8) / 256 (bf16); full grid


def flash_decode(
    q: jax.Array,  # [B, KV, rep, hd] grouped queries (one token per slot)
    k: jax.Array,  # [B, KV, S, hd] cache, or [L, B, KV, S, hd] with layer=
    v: jax.Array,  # same layout as k
    pos: jax.Array,  # int32 [B]: position of the current token per slot
    *,
    k_current: jax.Array | None = None,  # [B, KV, 1, hd] current-token k
    v_current: jax.Array | None = None,
    k_scale: jax.Array | None = None,  # [.., KV, S] per-token scales (int8 cache)
    v_scale: jax.Array | None = None,
    layer: int | None = None,
    ts: int | None = None,
    s_hi: int | None = None,  # static bound: every pos[b] < s_hi
    window: int = 0,  # sliding-window width (0 = full causal)
    ring: int = 0,  # ring-buffer capacity R (0 = linear cache)
    interpret: bool | None = None,
) -> jax.Array:
    """Causal decode attention; returns [B, KV, rep, hd] f32.

    ``window > 0``: the query attends only cache slots in
    ``(pos - window, pos]`` (Mistral-style sliding window).  Tiles outside
    the window are clamped in the index map AND guarded in-kernel, so both
    the DMA and the compute are proportional to the window, not the cache.

    ``ring > 0`` (requires ``window``): the cache is a RING of capacity
    ``ring`` — token at global position g lives at slot ``g % ring`` and
    the buffer's memory is O(window), not O(max_seq) (models.llama.KVCache
    with cfg.ring).  Only the first ``ring`` buffer slots are attended
    (slots past it are the chunked-prefill write margin); tiles outside
    the window's modular interval dedup their DMA to the newest tile.

    With ``k_scale``/``v_scale`` the cache is int8 with per-token-vector
    scales (models.llama.KVCache qtype='q8'): the k scale factors out of
    the hd contraction (applied on scores), the v scale folds into p —
    half the cache DMA of bf16 for one extra [KV, ts] multiply per tile.

    Query at position p attends to cache slots <= p.  ``rep`` is the GQA
    group width (H / KV); pass rep = H/KV views of q grouped per kv head.

    Pass the FULL stacked cache ``[L, B, KV, S, hd]`` with ``layer=li``
    instead of slicing ``cache[li]`` yourself: a host-side slice
    materializes a per-layer copy of the cache just to feed the kernel
    operand, while the layer index in the BlockSpec is free.

    With ``k_current``/``v_current``, the cache is treated as holding only
    slots < pos and the current token is folded in-kernel — the caller can
    defer all cache writes to one batched insert per step.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, kv, rep, hd = q.shape
    stacked = k.ndim == 5
    assert stacked == (layer is not None)
    has_current = k_current is not None
    assert has_current == (v_current is not None)
    quant = k_scale is not None
    assert quant == (v_scale is not None)
    s = k.shape[3] if stacked else k.shape[2]
    if ring:
        assert window > 0, "ring cache requires a sliding window"
        s = ring  # attend only the ring region; past it is write margin
    if ts is None:
        # swept at ctx 896, KV=16: bf16 best at 256 (512 OOMs VMEM at
        # KV=16 since all heads ride one tile); int8 slabs are half the
        # bytes, and 512 runs ~8% faster (50.5 -> 46.9 us)
        ts = 512 if quant else 256
    ts = min(ts, s)
    while s % ts:
        ts //= 2
    ns = s // ts
    if s_hi is not None and not ring:
        # static grid bound (see decode_ts_bucket): tiles past the bucket
        # can never hold valid data, so don't even iterate them — the
        # per-grid-step bookkeeping of clamped steps is the short-ctx floor
        ns = max(1, min(ns, -(-s_hi // ts)))
    scale = 1.0 / float(np.sqrt(hd))

    grid = (bsz, ns)
    # Index maps receive the scalar-prefetch ref as a trailing argument.
    # KV tile indices are CLAMPED to the last tile containing pos[b]: grid
    # steps past a slot's length re-request the same block, which the
    # Pallas pipeline dedups into no DMA at all — decode attention cost is
    # proportional to the slot's ACTUAL sequence length, not max_seq (the
    # pl.when guard already skips their compute).
    qspec = pl.BlockSpec((1, kv, rep, hd), lambda b, st, pos: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    def _clamp(st, b, pos):
        # last tile holding valid cached data (valid slots are < pos when
        # the current token rides separately, <= pos otherwise); with a
        # sliding window also clamp the LOW end so pre-window grid steps
        # re-request the window's first tile (pipeline dedups the DMA)
        if ring:
            # tiles outside the window's modular slot interval re-request
            # the newest tile (pipeline dedups: DMA stays O(window))
            seq_len = pos[b] + (0 if has_current else 1)
            p_new = seq_len - 1
            wc = window - (1 if has_current else 0)
            cnt = jnp.maximum(jnp.minimum(wc, seq_len), 1)
            t_lo, t_hi = _ring_tile_bounds(p_new, cnt, ring, ts)
            t_hi = jnp.clip(t_hi, 0, ns - 1)  # pos=0: p_new=-1 is unused
            return jnp.where(_ring_tile_inside(st, t_lo, t_hi), st, t_hi)
        last = pos[b] if not has_current else jnp.maximum(pos[b] - 1, 0)
        st = jnp.minimum(st, last // ts)
        if window:
            # first can exceed last when the window holds ONLY the current
            # token (window=1 at a tile boundary): clamp so the index stays
            # in range — the kernel's tile guard already skips the compute
            first = jnp.minimum(
                jnp.maximum(pos[b] - window + 1, 0) // ts, last // ts
            )
            st = jnp.maximum(st, first)
        # with a bounded grid (s_hi), an INACTIVE serving slot can hold a
        # stale position past the bucket: keep its (masked-garbage) tile
        # index in range rather than DMA out of bounds
        return jnp.minimum(st, ns - 1)

    if stacked:
        li = int(layer)
        kvspec = pl.BlockSpec(
            (1, 1, kv, ts, hd),
            lambda b, st, pos, li=li: (li, b, 0, _clamp(st, b, pos), 0),
            memory_space=pltpu.VMEM)
    else:
        kvspec = pl.BlockSpec(
            (1, kv, ts, hd),
            lambda b, st, pos: (b, 0, _clamp(st, b, pos), 0),
            memory_space=pltpu.VMEM)
    operands = [q, k, v]
    in_specs = [qspec, kvspec, kvspec]
    if quant:
        if stacked:
            li = int(layer)
            sspec = pl.BlockSpec(
                (1, 1, kv, ts),
                lambda b, st, pos, li=li: (li, b, 0, _clamp(st, b, pos)),
                memory_space=pltpu.VMEM)
        else:
            sspec = pl.BlockSpec(
                (1, kv, ts),
                lambda b, st, pos: (b, 0, _clamp(st, b, pos)),
                memory_space=pltpu.VMEM)
        operands += [k_scale, v_scale]
        in_specs += [sspec, sspec]
    if has_current:
        curspec = pl.BlockSpec((1, kv, 1, hd), lambda b, st, pos: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        operands += [k_current, v_current]
        in_specs += [curspec, curspec]
    out = pl.pallas_call(
        functools.partial(_kernel, ts=ts, ns=ns, scale=scale, stacked=stacked,
                          has_current=has_current, quant=quant,
                          window=window, ring=ring),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, kv, rep, hd), lambda b, st, pos: (b, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((kv, rep, 128), jnp.float32),  # running max
                pltpu.VMEM((kv, rep, 128), jnp.float32),  # running sum
                pltpu.VMEM((kv, rep, hd), jnp.float32),  # unnormalized out
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, kv, rep, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pos.astype(jnp.int32), *operands)
    return out


def _kernel_prefill(pos_ref, q_ref, k_ref, v_ref, *rest, ts: int, ns: int,
                    tq: int, rep: int, scale: float, quant: bool,
                    window: int, ring: int, t_total: int):
    """Grid (B, KV, T/tq, S/ts); S innermost.  Query rows are T-major packed
    (row = t*rep + r); each row's causal limit is pos0[b] + t, computed
    in-kernel from the scalar-prefetched start positions — no mask operand.

    One kv head per grid step (unlike flash_decode, which rides all heads on
    one tile): prefill tiles are tq*rep x hd = MB-sized already, so per-head
    blocks keep VMEM bounded (all-heads blocks OOM scoped vmem at KV=8) and
    the DMAs stay large enough to hide issue latency.
    """
    it = iter(rest)
    ks_ref, vs_ref = (next(it), next(it)) if quant else (None, None)
    o_ref, m_ref, l_ref, acc_ref = tuple(it)
    b = pl.program_id(0)
    qt = pl.program_id(2)
    s = pl.program_id(3)

    @pl.when(s == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    r_rows = tq * rep
    # per-row query position: pos0 + global row index // rep
    row0 = qt * r_rows
    max_len = pos_ref[b] + qt * tq + tq  # last row's seq_len
    if ring:
        # the cache holds the WHOLE chunk (t_total tokens) by attention
        # time; slot r holds g = p_cache - (p_cache - r) mod ring
        p_cache = pos_ref[b] + t_total - 1
        ghi = max_len - 1  # newest token any row of this q-tile may see
        glo = jnp.maximum(pos_ref[b] + qt * tq - window + 1, 0)
        t_lo, t_hi = _ring_tile_bounds(ghi, ghi - glo + 1, ring, ts)
        guard = _ring_tile_inside(s, t_lo, t_hi)
    else:
        # sliding window: the OLDEST query row sets the low bound
        lo = (jnp.maximum(pos_ref[b] + qt * tq - window + 1, 0)
              if window else 0)
        guard = jnp.logical_and(s * ts < max_len, (s + 1) * ts > lo)

    @pl.when(guard)
    def _tile():
        q = q_ref[0, 0].astype(jnp.float32) * scale  # [r_rows, hd]
        k = k_ref[0, 0].astype(jnp.float32)  # [ts, hd]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [r_rows, ts]
        if quant:
            # int8 cache: per-token k scale applies on the scores row
            scores = scores * ks_ref[0, 0, 0, 0][None, :]
        span = s * ts + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        row = row0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        qpos = pos_ref[b] + row // rep
        if ring:
            g = p_cache - jnp.mod(p_cache - span, ring)  # slot's global pos
            valid = jnp.logical_and(g <= qpos, g >= 0)
            valid = jnp.logical_and(valid, g > qpos - window)
        else:
            valid = span <= qpos
            if window:
                valid = jnp.logical_and(valid, span > qpos - window)
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, :1] = m_new
        if quant:
            p = p * vs_ref[0, 0, 0, 0][None, :]  # v scale folds into p
        pv = jax.lax.dot_general(
            p, v_ref[0, 0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [r_rows, hd]
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(s == ns - 1)
    def _finish():
        l = l_ref[:, :1]
        o_ref[0, 0] = (acc_ref[:] / jnp.where(l > 0, l, 1.0)).astype(o_ref.dtype)


def flash_prefill(
    q: jax.Array,  # [B, KV, T*rep, hd] T-major grouped query rows
    k: jax.Array,  # [B, KV, S, hd] cache (must already hold rows < pos0+T)
    v: jax.Array,
    pos0: jax.Array,  # int32 [B]: position of the FIRST query token per slot
    *,
    rep: int,
    k_scale: jax.Array | None = None,  # [B, KV, S] per-token scales (int8)
    v_scale: jax.Array | None = None,
    tq: int = 256,
    ts: int = 1024,
    window: int = 0,  # sliding-window width (0 = full causal)
    ring: int = 0,  # ring-buffer capacity R (0 = linear cache; see flash_decode)
    interpret: bool | None = None,
) -> jax.Array:
    """Causal prefill attention, O(tile) memory (no [T, S] materialization).

    ``ring > 0``: the k/v buffers are a ring of capacity ``ring`` holding
    token g at slot ``g % ring``; the cache must already hold ALL T query
    tokens' k/v (same contract as linear mode).  Requires ``window > 0``
    and ``window + T <= ring``.

    ``k_scale``/``v_scale`` enable the int8 quantized cache (see
    flash_decode): scale application folds into scores / p.

    Query row ``t*rep + r`` is token ``t`` of head-group member ``r`` and
    attends cache slots <= pos0 + t.  The einsum path materializes
    [B, H, T, S] f32 scores (1 GB at T=S=4096); this kernel streams the
    cache per (slot, query-tile) with the flash recurrence instead.

    Tile defaults from an on-chip sweep at T=S=4096 (kv=8, rep=4, hd=128):
    ts=1024 is 2.6x faster than ts=256 (1.40 vs 3.65 ms — bigger KV slabs
    amortize the per-tile recurrence); tq=256 edges tq=128.  Net 10.8x the
    dense einsum path at that shape, 2.5x at T=1024/S=2048 (0.27 ms).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    quant = k_scale is not None
    assert quant == (v_scale is not None)
    bsz, kv, rrows, hd = q.shape
    t = rrows // rep
    s = k.shape[2]
    if ring:
        assert window > 0, "ring cache requires a sliding window"
        assert window + t <= ring, (window, t, ring)
        s = ring  # attend only the ring region; past it is write margin
    ts = min(ts, s)
    while s % ts:
        ts //= 2
    ns = s // ts
    tq = min(tq, t)
    while t % tq:
        tq //= 2
    nqt = t // tq
    scale = 1.0 / float(np.sqrt(hd))

    grid = (bsz, kv, nqt, ns)
    qspec = pl.BlockSpec(
        (1, 1, tq * rep, hd), lambda b, g, qt, st, pos: (b, g, qt, 0),
        memory_space=pltpu.VMEM)

    def _clamp(b, qt, st, pos):
        if ring:  # dedup tiles outside the q-tile's modular slot interval
            ghi = pos[b] + qt * tq + (tq - 1)
            glo = jnp.maximum(pos[b] + qt * tq - window + 1, 0)
            t_lo, t_hi = _ring_tile_bounds(ghi, ghi - glo + 1, ring, ts)
            return jnp.where(_ring_tile_inside(st, t_lo, t_hi), st, t_hi)
        last = pos[b] + qt * tq + (tq - 1)
        st = jnp.minimum(st, last // ts)
        if window:  # low clamp: pre-window tiles dedup to the first tile
            first = jnp.maximum(pos[b] + qt * tq - window + 1, 0) // ts
            st = jnp.maximum(st, first)
        return st

    kvspec = pl.BlockSpec(
        (1, 1, ts, hd),
        lambda b, g, qt, st, pos: (b, g, _clamp(b, qt, st, pos), 0),
        memory_space=pltpu.VMEM)
    operands = [q, k, v]
    in_specs = [qspec, kvspec, kvspec]
    if quant:
        # Mosaic's block rule applies to the LAST TWO dims: a (1, 1, ts)
        # block on [B, KV, S] puts block-size 1 on the KV (sublane) axis —
        # illegal when KV is neither 8-divisible nor full.  Re-tile the
        # scales to [B, KV, ns, 1, ts] so the st-blocked dim is its own
        # axis and the trailing (1, ts) window is trivial (caught by the
        # deviceless Mosaic gate, tests/test_mosaic_gate.py).
        k_scale = k_scale[:, :, : ns * ts].reshape(bsz, kv, ns, 1, ts)
        v_scale = v_scale[:, :, : ns * ts].reshape(bsz, kv, ns, 1, ts)
        sspec = pl.BlockSpec(
            (1, 1, 1, 1, ts),
            lambda b, g, qt, st, pos: (b, g, _clamp(b, qt, st, pos), 0, 0),
            memory_space=pltpu.VMEM)
        operands += [k_scale, v_scale]
        in_specs += [sspec, sspec]
    out = pl.pallas_call(
        functools.partial(_kernel_prefill, ts=ts, ns=ns, tq=tq, rep=rep,
                          scale=scale, quant=quant, window=window,
                          ring=ring, t_total=t),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, tq * rep, hd), lambda b, g, qt, st, pos: (b, g, qt, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tq * rep, 128), jnp.float32),
                pltpu.VMEM((tq * rep, 128), jnp.float32),
                pltpu.VMEM((tq * rep, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, kv, rrows, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(pos0.astype(jnp.int32), *operands)
    return out


def flash_decode_ref(q, k, v, pos):
    """Numpy/jnp reference (same math as models.llama._attention at T=1)."""
    bsz, kv, rep, hd = q.shape
    s = k.shape[2]
    scores = jnp.einsum(
        "bgrd,bgsd->bgrs", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / np.sqrt(hd)
    mask = jnp.arange(s)[None, :] <= pos[:, None]  # [B, S]
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bgrs,bgsd->bgrd", probs, v.astype(jnp.float32))


__all__ = ["flash_decode", "flash_prefill", "flash_decode_ref",
           "decode_ts_bucket"]
