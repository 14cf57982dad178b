"""Batched token sampling for the serving loop.

The reference has no serving loop at all (SURVEY.md: "no serving loop, no
model runtime"); this module is part of the beyond-parity serving runtime.
Design constraints, TPU-first:

* ONE jittable program for the whole slot batch — per-slot temperature,
  top-k, and top-p are **dynamic** [B] operands, so mixed sampling configs
  in one continuous batch never trigger recompiles.
* Per-request determinism independent of batch composition: each request
  carries its own PRNG key, and the step key is ``fold_in(request_key,
  position)`` — the token a request samples at position p is the same
  whatever else shares the batch.
* ``temperature <= 0`` means greedy for that slot (exact argmax, no PRNG).

Both filters reduce to a per-row logit threshold computed in sorted space
(one descending sort per step), then a single masked categorical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def filter_logits(scaled: jax.Array, top_k: jax.Array,
                  top_p: jax.Array) -> jax.Array:
    """Mask ``scaled`` [B, V] to the per-row top-k / nucleus(top-p) set.

    ``top_k`` int32 [B] (<= 0 disables), ``top_p`` f32 [B] (>= 1 disables).
    Ties at the threshold are kept (same choice llama.cpp makes).
    """
    v = scaled.shape[-1]
    sorted_desc = jnp.flip(jnp.sort(scaled, axis=-1), axis=-1)
    # top-k threshold: the k-th largest value
    idx = jnp.clip(top_k - 1, 0, v - 1)
    thr_k = jnp.take_along_axis(sorted_desc, idx[:, None], axis=-1)[:, 0]
    thr_k = jnp.where(top_k > 0, thr_k, NEG_INF)
    # top-p threshold: smallest prefix of the sorted distribution whose
    # mass reaches p; exclusive cumsum keeps at least the first entry
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum_excl = jnp.cumsum(probs, axis=-1) - probs
    keep = cum_excl < jnp.clip(top_p, 0.0, 1.0)[:, None]
    jstar = jnp.maximum(jnp.sum(keep, axis=-1) - 1, 0)
    thr_p = jnp.take_along_axis(sorted_desc, jstar[:, None], axis=-1)[:, 0]
    thr_p = jnp.where(top_p < 1.0, thr_p, NEG_INF)
    thr = jnp.maximum(thr_k, thr_p)
    return jnp.where(scaled >= thr[:, None], scaled, NEG_INF)


def min_p_filter(scaled: jax.Array, min_p: jax.Array) -> jax.Array:
    """llama.cpp min-p: keep tokens whose probability is >= min_p times
    the max probability.  In logit space that is a plain threshold
    ``l >= l_max + log(min_p)`` — no sort needed.  min_p <= 0 disables."""
    mp = jnp.clip(jnp.asarray(min_p, jnp.float32), 0.0, 1.0)
    lmax = jnp.max(scaled, axis=-1)
    thr = jnp.where(mp > 0.0, lmax + jnp.log(jnp.maximum(mp, 1e-10)),
                    NEG_INF)
    return jnp.where(scaled >= thr[:, None], scaled, NEG_INF)


def apply_repeat_penalty(logits: jax.Array, recent: jax.Array,
                         penalty: jax.Array) -> jax.Array:
    """llama.cpp repetition penalty over a recent-token window.

    ``recent`` int32 [B, W] (entries < 0 are empty), ``penalty`` f32 [B]
    (1.0 disables).  Penalized positive logits divide by the penalty,
    negative ones multiply — exactly llama_sample_repetition_penalties.
    """
    b, v = logits.shape
    pen = jnp.asarray(penalty, jnp.float32)
    safe = jnp.where(recent >= 0, recent, v)  # park empties out of range
    mask = jnp.zeros((b, v + 1), bool).at[
        jnp.arange(b)[:, None], safe
    ].set(True)[:, :v]
    pb = pen[:, None]
    penalized = jnp.where(logits > 0, logits / pb, logits * pb)
    out = jnp.where(mask, penalized, logits)
    return jnp.where((pen != 1.0)[:, None], out, logits)


def apply_logit_bias(logits: jax.Array, bias_ids: jax.Array,
                     bias_vals: jax.Array) -> jax.Array:
    """Sparse per-row logit biases (llama.cpp --logit-bias): ``bias_ids``
    int32 [B, K] (< 0 empty) add ``bias_vals`` f32 [B, K].  A bias of
    -inf bans the token outright."""
    b, v = logits.shape
    safe = jnp.where(bias_ids >= 0, bias_ids, v)  # park empties
    padded = jnp.pad(logits, ((0, 0), (0, 1)))
    out = padded.at[jnp.arange(b)[:, None], safe].add(
        jnp.asarray(bias_vals, jnp.float32))
    return out[:, :v]


def sample(
    logits: jax.Array,  # [B, V]
    keys: jax.Array,  # [B, 2] uint32 per-request base keys
    positions: jax.Array,  # int32 [B] — folded into the key per step
    temperature: jax.Array,  # f32 [B]; <= 0 = greedy
    top_k: jax.Array | None = None,  # int32 [B]; <= 0 = off
    top_p: jax.Array | None = None,  # f32 [B]; >= 1 = off
    min_p: jax.Array | None = None,  # f32 [B]; <= 0 = off
    recent: jax.Array | None = None,  # int32 [B, W] recent tokens (< 0 empty)
    repeat_penalty: jax.Array | None = None,  # f32 [B]; 1.0 = off
    bias_ids: jax.Array | None = None,  # int32 [B, K]; < 0 = empty slot
    bias_vals: jax.Array | None = None,  # f32 [B, K]
) -> jax.Array:
    """Sample one token per row; jittable, fully dynamic per-row config."""
    b = logits.shape[0]
    t = jnp.asarray(temperature, jnp.float32)
    logits = logits.astype(jnp.float32)
    if bias_ids is not None and bias_vals is not None:
        logits = apply_logit_bias(logits, bias_ids, bias_vals)
    if recent is not None and repeat_penalty is not None:
        logits = apply_repeat_penalty(logits, recent, repeat_penalty)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(t, 1e-6)[:, None]
    tk = (jnp.zeros(b, jnp.int32) if top_k is None
          else jnp.asarray(top_k, jnp.int32))
    tp = (jnp.ones(b, jnp.float32) if top_p is None
          else jnp.asarray(top_p, jnp.float32))
    filtered = filter_logits(scaled, tk, tp)
    if min_p is not None:
        # llama.cpp applies min-p BEFORE temperature: the keep set comes
        # from the raw distribution, then the mask carries to the scaled
        # logits (scaling is monotone, so positions align)
        keep = jnp.isfinite(min_p_filter(logits, min_p))
        filtered = jnp.where(keep, filtered, NEG_INF)
    step_keys = jax.vmap(jax.random.fold_in)(keys, positions.astype(jnp.int32))
    drawn = jax.vmap(jax.random.categorical)(step_keys, filtered)
    return jnp.where(t <= 0.0, greedy, drawn.astype(jnp.int32))


__all__ = ["sample", "filter_logits", "min_p_filter", "apply_repeat_penalty",
           "apply_logit_bias"]
