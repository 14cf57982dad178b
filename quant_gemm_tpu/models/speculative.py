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


def _spec_decode(qp_target, cfg_target, qp_draft, cfg_draft, prompt, steps,
                 k, act_mode, first_token, propose, judge):
    """Shared draft-verify round driver (both accept rules ride on this).

    ``first_token(lg [B, V]) -> np [B]``: the first generated token.
    ``propose(lg [B, V], i, state) -> np [B]``: draft token at position i.
    ``judge(props [B, k], lg_t [B, k+1, V], state) -> (accepted [B],
    next_tok [B])``: per-slot accepted-prefix length plus the one extra
    token (correction or bonus).  ``state`` is a fresh dict per round for
    propose->judge hand-off (e.g. recorded draft distributions).

    Invariants kept HERE, once: the draft runs k+1 forwards so the last
    proposal's k/v is written before a fully-accepted round advances pos
    past it (zero-KV-hole fix), and both caches rewind to pos0+accepted+1
    (stale entries are masked by pos and overwritten by the next block).
    """
    assert cfg_target.vocab == cfg_draft.vocab
    prompt = jnp.asarray(prompt, jnp.int32)
    b, _ = prompt.shape

    # module-level shared jit: caches across calls (and with every other
    # entry point that jits llama.forward with the same cfg/shapes)
    def fwd_t(p, t, c):
        return llama.jit_forward(p, cfg_target, t, c, act_mode=act_mode)

    def fwd_d(p, t, c):
        return llama.jit_forward(p, cfg_draft, t, c, act_mode=act_mode)

    cache_t = llama.KVCache.init(cfg_target, b)
    cache_d = llama.KVCache.init(cfg_draft, b)
    logits_t, cache_t = fwd_t(qp_target, prompt, cache_t)
    _, cache_d = fwd_d(qp_draft, prompt, cache_d)
    target_calls = 1

    first = np.asarray(first_token(logits_t[:, -1]), np.int64)
    last = jnp.asarray(first, jnp.int32)
    out = [[int(first[s])] for s in range(b)]

    while min(len(o) for o in out) < steps:
        state: dict = {}
        props = np.zeros((b, k), np.int64)
        tok = last
        cache_d_round = cache_d
        for i in range(k + 1):
            lg, cache_d_round = fwd_d(qp_draft, tok[:, None], cache_d_round)
            if i == k:
                break
            props[:, i] = propose(lg[:, -1], i, state)
            tok = jnp.asarray(props[:, i], jnp.int32)

        block = jnp.concatenate(
            [last[:, None], jnp.asarray(props, jnp.int32)], axis=1
        )
        pos0 = np.asarray(cache_t.pos)
        lg_t, cache_t = fwd_t(qp_target, block, cache_t)  # [B, k+1, V]
        target_calls += 1

        accepted, nxt = judge(props, lg_t, state)
        for s in range(b):
            out[s].extend(int(t) for t in props[s, : accepted[s]])
            out[s].append(int(nxt[s]))

        new_pos = jnp.asarray(pos0 + np.asarray(accepted, np.int64) + 1,
                              jnp.int32)
        cache_t = cache_t._replace(pos=new_pos)
        cache_d = cache_d_round._replace(pos=new_pos)
        last = jnp.asarray(np.array([o[-1] for o in out], np.int32))

    toks = np.stack([np.asarray(o[:steps], np.int32) for o in out])
    rate = float(np.mean([len(o) for o in out])) / target_calls
    return jnp.asarray(toks), rate


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

    def first_token(lg):
        return np.asarray(_greedy(lg))

    def propose(lg, i, state):
        return np.asarray(_greedy(lg))

    def judge(props, lg_t, state):
        greedy_t = np.asarray(_greedy(lg_t))  # [B, k+1]
        b = props.shape[0]
        accepted = np.zeros(b, np.int32)
        nxt = np.zeros(b, np.int64)
        for s in range(b):
            m = 0
            while m < k and greedy_t[s, m] == props[s, m]:
                m += 1
            accepted[s] = m
            # m < k: the target's correction; m == k: a free bonus token
            nxt[s] = greedy_t[s, m]
        return accepted, nxt

    return _spec_decode(qp_target, cfg_target, qp_draft, cfg_draft, prompt,
                        steps, k, act_mode, first_token, propose, judge)


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

    b = jnp.asarray(prompt).shape[0]
    v = cfg_target.vocab
    tk = jnp.full((b,), top_k, jnp.int32)
    tp = jnp.full((b,), top_p, jnp.float32)

    @jax.jit
    def probs_of(logits):  # [B, V] -> filtered sampling distribution
        scaled = logits.astype(jnp.float32) / max(temperature, 1e-6)
        return jax.nn.softmax(sampling.filter_logits(scaled, tk, tp), -1)

    rngs = [np.random.default_rng(np.random.SeedSequence([seed, s_]))
            for s_ in range(b)]

    def first_token(lg):
        p0 = np.asarray(probs_of(lg))
        return np.array([rngs[s].choice(v, p=p0[s]) for s in range(b)])

    def propose(lg, i, state):
        pd = state.setdefault("pd", np.zeros((b, k, v), np.float32))
        pd[:, i] = np.asarray(probs_of(lg))
        return np.array([rngs[s].choice(v, p=pd[s, i]) for s in range(b)])

    def judge(props, lg_t, state):
        pd = state["pd"]
        pt = np.asarray(jax.vmap(probs_of, in_axes=1, out_axes=1)(lg_t))
        accepted = np.zeros(b, np.int32)
        nxt = np.zeros(b, np.int64)
        for s in range(b):
            m = 0
            chosen = None
            while m < k:
                ok, res = accept_or_residual(
                    pt[s, m], pd[s, m], int(props[s, m]),
                    float(rngs[s].random()),
                )
                if not ok:
                    chosen = int(rngs[s].choice(v, p=res))
                    break
                m += 1
            if chosen is None:  # all accepted: bonus from the target's dist
                chosen = int(rngs[s].choice(v, p=pt[s, k]))
            accepted[s] = m
            nxt[s] = chosen
        return accepted, nxt

    return _spec_decode(qp_target, cfg_target, qp_draft, cfg_draft, prompt,
                        steps, k, act_mode, first_token, propose, judge)


__all__ = ["speculative_greedy_decode", "speculative_sample_decode",
           "accept_or_residual"]
