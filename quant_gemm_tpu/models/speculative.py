"""Speculative decoding over the quantized Llama runtime (greedy verify).

Production serving accelerator the reference has no counterpart for (it has
no model runtime at all): a small DRAFT model proposes ``k`` tokens per
round from its own KV cache; the TARGET model scores the whole proposal in
ONE batched forward (a [B, k+1] block — prefill-shaped MXU work instead of
k sequential decode steps), and the longest agreeing prefix plus one token
from the target's own distribution (the correction on a mismatch, a bonus
when everything matched) is accepted.

Greedy acceptance makes the output the target model's own greedy decode
(tested token-for-token against ``llama.greedy_decode``) — speculation
changes wall-clock, never content.  The usual serving-stack caveat applies:
the verify forward (T=k+1 block) and the plain decode forward (T=1) are
different compute paths, so bitwise equality holds exactly when near-tied
logits argmax the same way on both — same property as vLLM-class
implementations.  Per-slot acceptance lengths differ, which the per-slot KV-cache
position vector absorbs: rejecting a suffix is just rewinding ``pos`` (the
causal mask hides slots >= pos, and the next block overwrites them).

Index bookkeeping per round (pos0 = target cache pos = index of the last
accepted token ``last`` not yet written):

    block   = [last, props[0..k-1]]          written at pos0 .. pos0+k
    lg[i]   predicts sequence index pos0+i+1, i.e. verifies props[i] for
            i < k; lg[k] is the bonus prediction
    m       = longest matching prefix; emit props[:m] + one more token
    rewind  both caches to pos0 + m + 1

``max_seq`` must allow ``prompt + steps + k + 1`` positions.

TPU notes: both models' forwards are the existing jit'd programs; rounds
are host-stepped (acceptance is data-dependent), like the batching server.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import llama


def _greedy(logits) -> jax.Array:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def speculative_greedy_decode(
    qp_target: dict,
    cfg_target: llama.LlamaConfig,
    qp_draft: dict,
    cfg_draft: llama.LlamaConfig,
    prompt,  # [B, T0] int32
    steps: int,
    *,
    k: int = 4,
    act_mode: str = "q8_1",
):
    """Generate ``steps`` tokens per slot; returns (tokens [B, steps],
    tokens_per_target_call).

    ``tokens_per_target_call`` is the speedup driver: plain decode is 1.0;
    perfect agreement reaches k+1.
    """
    assert cfg_target.vocab == cfg_draft.vocab
    prompt = jnp.asarray(prompt, jnp.int32)
    b, _ = prompt.shape

    fwd_t = jax.jit(
        lambda p, t, c: llama.forward(p, cfg_target, t, c, act_mode=act_mode)
    )
    fwd_d = jax.jit(
        lambda p, t, c: llama.forward(p, cfg_draft, t, c, act_mode=act_mode)
    )

    cache_t = llama.KVCache.init(cfg_target, b)
    cache_d = llama.KVCache.init(cfg_draft, b)
    logits_t, cache_t = fwd_t(qp_target, prompt, cache_t)
    _, cache_d = fwd_d(qp_draft, prompt, cache_d)
    target_calls = 1

    last = _greedy(logits_t[:, -1])  # first generated token (target's own)
    out = [[int(last[s])] for s in range(b)]

    while min(len(o) for o in out) < steps:
        # --- draft proposes k tokens (greedy, from its own cache) ---------
        # k+1 forwards: the extra one writes props[k-1]'s k/v into the
        # draft cache (otherwise a fully-accepted round would advance pos
        # past a never-written slot, and the zero k/v hole would poison
        # every later draft round's attention)
        proposals = []
        tok = last
        cache_d_round = cache_d
        for _ in range(k + 1):
            lg, cache_d_round = fwd_d(qp_draft, tok[:, None], cache_d_round)
            tok = _greedy(lg[:, -1])
            proposals.append(tok)
        props = jnp.stack(proposals[:k], axis=1)  # [B, k]
        props_np = np.asarray(props)

        # --- target verifies the whole block in one forward ---------------
        block = jnp.concatenate([last[:, None], props], axis=1)  # [B, k+1]
        pos0 = np.asarray(cache_t.pos)
        lg_t, cache_t = fwd_t(qp_target, block, cache_t)  # [B, k+1, V]
        target_calls += 1
        greedy_t = np.asarray(_greedy(lg_t))  # [B, k+1]

        # --- accept longest agreeing prefix + correction/bonus -------------
        accepted = np.zeros(b, np.int32)
        for s in range(b):
            m = 0
            while m < k and greedy_t[s, m] == props_np[s, m]:
                m += 1
            accepted[s] = m
            out[s].extend(props_np[s, :m])
            # m < k: target's correction for index pos0+m+1;
            # m == k: all matched, greedy_t[s, k] is a free bonus token
            out[s].append(int(greedy_t[s, m]))

        # --- rewind both caches to the accepted frontier -------------------
        # (entries past it are stale; causal pos-masking hides them and the
        # next block overwrites them)
        new_pos = jnp.asarray(pos0 + accepted + 1, jnp.int32)
        cache_t = cache_t._replace(pos=new_pos)
        cache_d = cache_d_round._replace(pos=new_pos)
        last = jnp.asarray(np.array([o[-1] for o in out], np.int32))

    toks = np.stack([np.asarray(o[:steps], np.int32) for o in out])
    rate = float(np.mean([len(o) for o in out])) / target_calls
    return jnp.asarray(toks), rate


def accept_or_residual(p_t: np.ndarray, p_d: np.ndarray, x: int,
                       u: float) -> tuple[bool, np.ndarray | None]:
    """One step of speculative rejection sampling (Leviathan et al.).

    The draft proposed ``x ~ p_d``; accept it with probability
    ``min(1, p_t[x]/p_d[x])`` (decided by the uniform draw ``u``), else
    return the residual distribution ``max(0, p_t - p_d)`` (normalized) to
    sample the replacement from.  The induced output distribution is
    EXACTLY ``p_t`` — verified analytically in tests/test_speculative.py:

        P(y) = p_d(y)·min(1, p_t(y)/p_d(y)) + P(reject)·residual(y) = p_t(y)
    """
    ratio = float(p_t[x]) / max(float(p_d[x]), 1e-30)
    if u < min(1.0, ratio):
        return True, None
    res = np.maximum(p_t - p_d, 0.0)
    z = res.sum()
    if z <= 0:  # p_t == p_d numerically: rejection prob was ~0 anyway
        return False, p_t / max(p_t.sum(), 1e-30)
    return False, res / z


def speculative_sample_decode(
    qp_target: dict,
    cfg_target: llama.LlamaConfig,
    qp_draft: dict,
    cfg_draft: llama.LlamaConfig,
    prompt,  # [B, T0] int32
    steps: int,
    *,
    k: int = 4,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    seed: int = 0,
    act_mode: str = "q8_1",
):
    """Speculative decoding with SAMPLING (temperature / top-k / top-p).

    Rejection sampling per proposal position keeps the output distribution
    exactly the target model's (see :func:`accept_or_residual`); the same
    sampling params apply to both models' distributions, per standard
    practice.  ``temperature <= 0`` delegates to the greedy variant.
    Returns (tokens [B, steps], tokens_per_target_call).
    """
    if temperature <= 0:
        return speculative_greedy_decode(
            qp_target, cfg_target, qp_draft, cfg_draft, prompt, steps,
            k=k, act_mode=act_mode,
        )
    from . import sampling

    assert cfg_target.vocab == cfg_draft.vocab
    prompt = jnp.asarray(prompt, jnp.int32)
    b, _ = prompt.shape

    fwd_t = jax.jit(
        lambda p, t, c: llama.forward(p, cfg_target, t, c, act_mode=act_mode)
    )
    fwd_d = jax.jit(
        lambda p, t, c: llama.forward(p, cfg_draft, t, c, act_mode=act_mode)
    )

    tk = jnp.full((b,), top_k, jnp.int32)
    tp = jnp.full((b,), top_p, jnp.float32)

    @jax.jit
    def probs_of(logits):  # [B, V] -> filtered sampling distribution
        scaled = logits.astype(jnp.float32) / max(temperature, 1e-6)
        return jax.nn.softmax(sampling.filter_logits(scaled, tk, tp), -1)

    rngs = [np.random.default_rng(np.random.SeedSequence([seed, s]))
            for s in range(b)]

    cache_t = llama.KVCache.init(cfg_target, b)
    cache_d = llama.KVCache.init(cfg_draft, b)
    logits_t, cache_t = fwd_t(qp_target, prompt, cache_t)
    _, cache_d = fwd_d(qp_draft, prompt, cache_d)
    target_calls = 1

    p0 = np.asarray(probs_of(logits_t[:, -1]))
    first = [int(rngs[s].choice(cfg_target.vocab, p=p0[s])) for s in range(b)]
    last = jnp.asarray(first, jnp.int32)
    out = [[first[s]] for s in range(b)]

    while min(len(o) for o in out) < steps:
        # --- draft proposes k sampled tokens (+1 forward to write the last
        # proposal's k/v; see the greedy variant) -------------------------
        props = np.zeros((b, k), np.int64)
        pd = np.zeros((b, k, cfg_target.vocab), np.float32)
        tok = last
        cache_d_round = cache_d
        for i in range(k + 1):
            lg, cache_d_round = fwd_d(qp_draft, tok[:, None], cache_d_round)
            if i == k:
                break
            pd[:, i] = np.asarray(probs_of(lg[:, -1]))
            props[:, i] = [
                int(rngs[s].choice(cfg_target.vocab, p=pd[s, i]))
                for s in range(b)
            ]
            tok = jnp.asarray(props[:, i], jnp.int32)

        # --- target scores the whole block in one forward -----------------
        block = jnp.concatenate(
            [last[:, None], jnp.asarray(props, jnp.int32)], axis=1
        )
        pos0 = np.asarray(cache_t.pos)
        lg_t, cache_t = fwd_t(qp_target, block, cache_t)  # [B, k+1, V]
        target_calls += 1
        pt = np.asarray(jax.vmap(probs_of, in_axes=1, out_axes=1)(lg_t))

        # --- rejection-sample the accepted prefix + one more token --------
        accepted = np.zeros(b, np.int32)
        for s in range(b):
            m = 0
            nxt = None
            while m < k:
                ok, res = accept_or_residual(
                    pt[s, m], pd[s, m], int(props[s, m]),
                    float(rngs[s].random()),
                )
                if not ok:
                    nxt = int(rngs[s].choice(cfg_target.vocab, p=res))
                    break
                m += 1
            if nxt is None:  # all accepted: bonus from the target's own dist
                nxt = int(rngs[s].choice(cfg_target.vocab, p=pt[s, k]))
            accepted[s] = m
            out[s].extend(int(t) for t in props[s, :m])
            out[s].append(nxt)

        new_pos = jnp.asarray(pos0 + accepted + 1, jnp.int32)
        cache_t = cache_t._replace(pos=new_pos)
        cache_d = cache_d_round._replace(pos=new_pos)
        last = jnp.asarray(np.array([o[-1] for o in out], np.int32))

    toks = np.stack([np.asarray(o[:steps], np.int32) for o in out])
    rate = float(np.mean([len(o) for o in out])) / target_calls
    return jnp.asarray(toks), rate


__all__ = ["speculative_greedy_decode", "speculative_sample_decode",
           "accept_or_residual"]
