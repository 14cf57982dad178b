"""Continuous-batching serving loop over the quantized Llama runtime.

The north-star serving pattern: a fixed pool of batch slots whose sequences
advance independently — new requests prefill into a free slot while other
slots keep decoding, so the quantized GEMMs always run at the full batched
decode shape (M = n_slots) regardless of request arrival order.

Single jit'd programs:

* prefill: one request -> (slot-cache slab, last-position logits), bucketed
  prompt lengths to bound recompilation;
* decode step: one batched forward of [n_slots, 1] tokens with per-slot
  positions (llama.KVCache.pos is a vector) + batched sampling.

Sampling is per-request (models/sampling.py): temperature / top-k / top-p
ride the decode jit as dynamic [n_slots] operands (mixed configs never
recompile), each request samples from its own seeded PRNG key folded with
the token position — so a request's output is deterministic regardless of
what else shares the batch.  Default temperature 0 = greedy.  Inactive
slots run masked garbage (their writes land at a clamped position and are
fully overwritten on the next prefill).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import attention
from ..utils import round_up
from . import llama, sampling


# -- module-level jitted programs -------------------------------------------
# Shared by every Server instance: jax.jit caches on (static cfg/act_mode,
# operand shapes, param treedef), so spinning up a second Server with the
# same model costs ZERO recompiles.  (These were per-instance closures once;
# each new Server re-traced prefill+decode — ~25 s per instance on the CPU
# test backend and a real cost in production restarts.)


@functools.partial(
    jax.jit, static_argnames=("cfg", "act_mode", "t"), donate_argnums=(3,)
)
def _prefill_step(qparams, rope, tokens, c1, length, *, cfg, act_mode, t):
    # tokens [1, t] padded; only `length` real (continues from c1.pos —
    # long prompts arrive as bucket-sized chunks, so the number of compiled
    # prefill programs is bounded by the bucket count, not the prompt-length
    # distribution)
    del t  # static: distinguishes bucket shapes in the jit cache key
    logits, c1 = llama.forward(
        qparams, cfg, tokens, c1, act_mode=act_mode, rope_cache=rope
    )
    return c1, logits[0, length - 1]


@functools.partial(
    jax.jit, static_argnames=("cfg", "act_mode", "attn_ts", "attn_s_hi"),
    donate_argnums=(3,),
)
def _decode_step(qparams, rope, tokens, cache, keys, temps, topk, topp,
                 minp, recent, rpen, bias_ids, bias_vals, *, cfg, act_mode,
                 attn_ts=None, attn_s_hi=None):
    logits, cache = llama.forward(
        qparams, cfg, tokens, cache, act_mode=act_mode, rope_cache=rope,
        attn_ts=attn_ts, attn_s_hi=attn_s_hi,
    )
    # fold position = the sampled token's own position (pos - 1 after the
    # forward advanced it) — same scheme as llama.sample_decode, so replays
    # match across entry points
    nxt = sampling.sample(
        logits[:, -1], keys, cache.pos - 1, temps, topk, topp,
        min_p=minp, recent=recent, repeat_penalty=rpen,
        bias_ids=bias_ids, bias_vals=bias_vals,
    )
    return nxt, cache


@jax.jit
def _sample_one(logits, key, position, temp, topk, topp, minp, recent, rpen,
                bias_ids, bias_vals):
    return sampling.sample(
        logits[None], key[None], jnp.asarray([position]),
        jnp.asarray([temp]), jnp.asarray([topk]),
        jnp.asarray([topp]), jnp.asarray([minp]),
        recent[None], jnp.asarray([rpen]),
        bias_ids[None], bias_vals[None],
    )[0]


@functools.partial(
    jax.jit, static_argnames=("cfg", "act_mode", "attn_ts", "attn_s_hi"),
    donate_argnums=(3,),
)
def _decode_step_logits(qparams, rope, tokens, cache, keys, temps, topk,
                        topp, minp, recent, rpen, bias_ids, bias_vals, *,
                        cfg, act_mode, attn_ts=None, attn_s_hi=None):
    """_decode_step variant that ALSO returns the last-position logits —
    compiled only when grammar-constrained requests are active (the host
    needs the full distribution to apply the grammar mask)."""
    logits, cache = llama.forward(
        qparams, cfg, tokens, cache, act_mode=act_mode, rope_cache=rope,
        attn_ts=attn_ts, attn_s_hi=attn_s_hi,
    )
    nxt = sampling.sample(
        logits[:, -1], keys, cache.pos - 1, temps, topk, topp,
        min_p=minp, recent=recent, repeat_penalty=rpen,
        bias_ids=bias_ids, bias_vals=bias_vals,
    )
    return nxt, logits[:, -1], cache


def _adjusted_logits(logits_np: np.ndarray, r: "Request",
                     recent: np.ndarray | None) -> np.ndarray:
    """Mirror the in-jit sampler's pre-sampling chain on host: logit bias,
    then the repeat penalty over the recent window (positive logits divide,
    negative multiply — llama_sample_repetition_penalties)."""
    x = logits_np.astype(np.float64, copy=True)
    for tid, bv in (r.logit_bias or {}).items():
        x[int(tid)] += float(bv)
    if r.repeat_penalty != 1.0 and recent is not None:
        seen = np.unique(recent[recent >= 0]).astype(np.int64)
        x[seen] = np.where(x[seen] > 0, x[seen] / r.repeat_penalty,
                           x[seen] * r.repeat_penalty)
    return x


def _top_logprobs(logits_np: np.ndarray, n: int) -> list:
    """[(token_id, logprob)] for the top-n of one position's logits."""
    x = logits_np.astype(np.float64)
    x = x - x.max()
    lse = np.log(np.exp(x).sum())
    top = np.argsort(-x)[:n]
    return [(int(t), float(x[t] - lse)) for t in top]


def _grammar_sample(logits_np: np.ndarray, r: "Request",
                    recent: np.ndarray | None = None) -> int:
    """Host-side constrained sampling: bias + repeat penalty (same chain
    as the in-jit sampler), grammar mask, then min-p / temperature /
    top-k / top-p over the surviving tokens (llama.cpp applies its
    grammar exactly here).  Greedy at temperature 0; seeded per-request
    numpy PRNG otherwise."""
    adj = _adjusted_logits(logits_np, r, recent)
    masked = r.grammar.filter_logits(adj)
    if not np.isfinite(masked).any():
        raise ValueError(
            f"grammar rejected every token (request {r.rid}) — the "
            "grammar cannot be continued with this vocabulary")
    if r.temperature <= 0:
        return int(np.argmax(masked))
    if 0.0 < r.min_p <= 1.0:
        # llama.cpp min-p: threshold on the RAW (pre-temperature) dist
        masked = np.where(masked >= masked.max() + np.log(r.min_p),
                          masked, -np.inf)
    x = masked / r.temperature
    if r.top_k:
        k = min(int(r.top_k), int(np.isfinite(x).sum()))
        if k > 0:
            kth = np.sort(x)[-k]
            x = np.where(x >= kth, x, -np.inf)
    x = x - x[np.isfinite(x)].max()
    p = np.exp(np.where(np.isfinite(x), x, -np.inf))
    p /= p.sum()
    if 0.0 < r.top_p < 1.0:
        order = np.argsort(-p)
        csum = np.cumsum(p[order])
        cut = np.searchsorted(csum, r.top_p) + 1
        keep = order[:cut]
        mask = np.zeros_like(p)
        mask[keep] = p[keep]
        p = mask / mask.sum()
    return int(r.np_rng().choice(len(p), p=p))


@jax.jit
def _extract_slot(cache, slot):
    """One slot's cache slabs [L, 1, KV, S, hd] (+scales) as a 1-slot
    KVCache — the prefix-reuse path continues prefill on these."""
    k1 = jax.lax.dynamic_slice_in_dim(cache.k, slot, 1, axis=1)
    v1 = jax.lax.dynamic_slice_in_dim(cache.v, slot, 1, axis=1)
    ks1 = vs1 = None
    if cache.quantized:
        ks1 = jax.lax.dynamic_slice_in_dim(cache.ks, slot, 1, axis=1)
        vs1 = jax.lax.dynamic_slice_in_dim(cache.vs, slot, 1, axis=1)
    return llama.KVCache(k1, v1, jnp.zeros((1,), jnp.int32), ks1, vs1)


@functools.partial(jax.jit, donate_argnums=(0,))
def _insert_slot(cache, slot, k1, v1, scales, length):
    # donated in-place slot insert (a functional .at[].set on the full
    # cache copied hundreds of MB per admitted request)
    new = cache._replace(
        k=jax.lax.dynamic_update_slice(
            cache.k, k1[:, None], (0, slot, 0, 0, 0)
        ),
        v=jax.lax.dynamic_update_slice(
            cache.v, v1[:, None], (0, slot, 0, 0, 0)
        ),
        pos=cache.pos.at[slot].set(length),
    )
    if cache.quantized:
        ks1, vs1 = scales
        new = new._replace(
            ks=jax.lax.dynamic_update_slice(
                cache.ks, ks1[:, None], (0, slot, 0, 0)
            ),
            vs=jax.lax.dynamic_update_slice(
                cache.vs, vs1[:, None], (0, slot, 0, 0)
            ),
        )
    return new


@functools.partial(jax.jit, static_argnames=("cfg", "keep"))
def _shift_cache(cache, rope, *, cfg, keep):
    return llama.shift_context(cache, cfg, keep, rope_cache=rope)


PENALTY_WINDOW = 64  # recent tokens a slot's repeat penalty sees
BIAS_SLOTS = 8  # sparse logit-bias entries per request (llama.cpp --logit-bias)


@dataclasses.dataclass
class Request:
    rid: int
    prompt: list
    max_new: int
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    repeat_penalty: float = 1.0
    logit_bias: Optional[dict] = None  # {token_id: bias}; +-inf bans/forces
    seed: Optional[int] = None
    grammar: Optional[object] = None  # models.grammar.GrammarSampler
    n_probs: int = 0  # top-N logprobs per generated token (llama.cpp)
    cache_prompt: bool = True  # per-request prefix-reuse opt-out
    generated: list = dataclasses.field(default_factory=list)
    probs: list = dataclasses.field(default_factory=list)  # per-token top-N
    done: bool = False

    def np_rng(self):
        if not hasattr(self, "_np_rng"):
            self._np_rng = np.random.default_rng(
                self.seed if self.seed is not None else self.rid)
        return self._np_rng


class Server:
    """Continuous-batching decoder over fixed slots (greedy by default)."""

    def __init__(
        self,
        qparams,
        cfg: llama.LlamaConfig,
        n_slots: int = 8,
        act_mode: str = "q8_1",
        prefill_a16: bool = False,
        prefill_bucket: int = 16,
        eos_id: Optional[int] = None,
        cache_qtype: str = "bf16",
        max_prefill_chunk: Optional[int] = None,
        context_shift: bool = False,
        cache_prompt: bool = True,
    ):
        self.qparams = qparams
        self.cfg = cfg
        self.n_slots = n_slots
        self.act_mode = act_mode
        # W4A16 prompt processing (bf16 activations, no per-layer Q8_1
        # quantize) while decode stays on the exact W4A8 path — measured
        # +34% prefill throughput end-to-end on the 1.2B model (r5,
        # tpu_campaign.log: 34.6k vs 25.9k tok/s) and mirrors llama.cpp's
        # own dequant+GEMM strategy above its batch threshold.
        self.prefill_mode = ("bf16" if prefill_a16 and act_mode == "q8_1"
                             else act_mode)
        self.bucket = prefill_bucket
        self.eos_id = eos_id
        self.cache_qtype = cache_qtype
        # long prompts prefill in chunks of this size (defaults to 8
        # buckets) -> bounded set of compiled prefill programs
        self.max_chunk = max_prefill_chunk or prefill_bucket * 8
        if cfg.ring:
            # ring caches bound every forward call INCLUDING its bucket
            # padding by ring_chunk (the ring's write margin): clamp the
            # chunk to a bucket multiple that rounds up within ring_chunk
            assert prefill_bucket <= cfg.ring_chunk, (
                prefill_bucket, cfg.ring_chunk)
            self.max_chunk = min(
                self.max_chunk,
                cfg.ring_chunk // prefill_bucket * prefill_bucket,
            )
            assert not context_shift, (
                "ring caches don't shift (llama.shift_context docstring); "
                "generation is bounded by max_seq = the RoPE table size"
            )
        # context_shift: instead of finishing a request whose slot hits
        # max_seq, drop its oldest tokens (llama.cpp context shift /
        # llama.shift_context) and keep generating in bounded cache memory.
        # Exact for sliding-window models when keep >= window.
        self.context_shift = context_shift
        keep = cfg.window if cfg.window else cfg.max_seq // 2
        self._shift_keep = max(keep, 1)
        self.cache = llama.KVCache.init(cfg, n_slots, cache_qtype)
        self.slots: list[Optional[Request]] = [None] * n_slots
        self.queue: list[Request] = []
        self.finished: dict[int, Request] = {}
        self._next_rid = 0
        self._rope = llama.rope_for(cfg, qparams)
        self._pending_tok = np.zeros(n_slots, np.int32)
        # host mirror of cache.pos (avoids a device read per step): drives
        # the attention tile-size bucket (ops.attention.decode_ts_bucket)
        self._hpos = np.zeros(n_slots, np.int64)
        self._temps = np.zeros(n_slots, np.float32)
        self._topk = np.zeros(n_slots, np.int32)
        self._topp = np.ones(n_slots, np.float32)
        self._minp = np.zeros(n_slots, np.float32)
        self._rpen = np.ones(n_slots, np.float32)
        self._recent = np.full((n_slots, PENALTY_WINDOW), -1, np.int32)
        self._bias_ids = np.full((n_slots, BIAS_SLOTS), -1, np.int32)
        self._bias_vals = np.zeros((n_slots, BIAS_SLOTS), np.float32)
        self._keys = jnp.zeros((n_slots, 2), jnp.uint32)
        self._n_steps = 0
        self._n_tokens = 0
        self._n_decode_tokens = 0
        self._n_prefill_tokens = 0
        # prompt-prefix cache (llama.cpp cache_prompt): per slot, the
        # token sequence its cache region currently materializes; a new
        # request admitted to a slot sharing a prefix skips re-prefilling
        # it.  Disabled for ring caches (slot wrap invalidates absolute
        # positions) and invalidated by context shift.
        self.cache_prompt = cache_prompt and not cfg.ring
        self._history: list[list[int]] = [[] for _ in range(n_slots)]
        self._n_cached_tokens = 0

    # -- request lifecycle ---------------------------------------------------

    def submit(
        self,
        prompt: list,
        max_new: int = 16,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        min_p: float = 0.0,
        repeat_penalty: float = 1.0,
        logit_bias: Optional[dict] = None,
        seed: Optional[int] = None,
        grammar=None,
        n_probs: int = 0,
        cache_prompt: bool = True,
    ) -> int:
        if not prompt:
            raise ValueError("empty prompt")
        if max_new < 1:
            raise ValueError(f"max_new must be >= 1, got {max_new}")
        if logit_bias and len(logit_bias) > BIAS_SLOTS:
            raise ValueError(f"at most {BIAS_SLOTS} logit biases per request")
        r = Request(self._next_rid, list(prompt), max_new,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    min_p=min_p, repeat_penalty=repeat_penalty,
                    logit_bias=logit_bias, seed=seed, grammar=grammar,
                    n_probs=int(n_probs), cache_prompt=bool(cache_prompt))
        self._next_rid += 1
        self.queue.append(r)
        return r.rid

    def _prefill(self, prompt, c1=None, start: int = 0):
        """Chunked prefill of one request -> (slot slabs, last logits).

        ``c1``/``start``: continue on an extracted slot cache whose first
        ``start`` tokens already materialize this prompt's prefix (the
        cache_prompt path) — only ``prompt[start:]`` is evaluated."""
        if c1 is None:
            c1 = llama.KVCache.init(self.cfg, 1, self.cache_qtype)
        else:
            c1 = c1._replace(pos=jnp.full((1,), start, jnp.int32))
        off = start
        while off < len(prompt):
            part = prompt[off : off + self.max_chunk]
            t = max(self.bucket, round_up(len(part), self.bucket))
            padded = np.zeros((1, t), np.int32)
            padded[0, : len(part)] = part
            # the padded tail writes garbage past the real tokens; pos must
            # only advance by the REAL length so the next chunk overwrites it
            c1, last = _prefill_step(
                self.qparams, self._rope, jnp.asarray(padded), c1,
                len(part), cfg=self.cfg, act_mode=self.prefill_mode, t=t,
            )
            c1 = c1._replace(pos=jnp.full((1,), off + len(part), jnp.int32))
            off += len(part)
        scales = ((c1.ks[:, 0], c1.vs[:, 0]) if c1.quantized
                  else (None, None))
        return c1.k[:, 0], c1.v[:, 0], scales, last

    @staticmethod
    def _common_prefix(a: list, b: list) -> int:
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    def _pick_slot(self, prompt: list, want_cache: bool = True):
        """Free slot with the longest materialized shared prefix (ties ->
        first free); returns (slot, reuse_len)."""
        free = [s for s in range(self.n_slots) if self.slots[s] is None]
        if not free:
            return None, 0
        if not (self.cache_prompt and want_cache):
            return free[0], 0
        best, best_n = free[0], 0
        for s in free:
            # the LAST prompt token must always be evaluated (its logits
            # seed generation), and reuse below a bucket isn't worth the
            # slot extract/insert copies
            n = min(self._common_prefix(self._history[s], prompt),
                    len(prompt) - 1)
            if n > best_n:
                best, best_n = s, n
        return best, (best_n if best_n >= self.bucket else 0)

    def _admit(self) -> None:
        while self.queue:
            r = self.queue[0]
            s, reuse = self._pick_slot(r.prompt, r.cache_prompt)
            if s is None:
                return
            self.queue.pop(0)
            if reuse:
                c1 = _extract_slot(self.cache, jnp.int32(s))
                k1, v1, scales, last_logits = self._prefill(
                    r.prompt, c1=c1, start=reuse)
                self._n_cached_tokens += reuse
            else:
                k1, v1, scales, last_logits = self._prefill(r.prompt)
            self.cache = _insert_slot(
                self.cache, jnp.int32(s), k1, v1, scales,
                jnp.int32(len(r.prompt)),
            )
            self._history[s] = list(r.prompt)
            rkey = jax.random.PRNGKey(r.seed if r.seed is not None else r.rid)
            self._keys = self._keys.at[s].set(rkey)
            self._temps[s] = r.temperature
            self._topk[s] = r.top_k
            self._topp[s] = r.top_p
            self._minp[s] = r.min_p
            self._rpen[s] = r.repeat_penalty
            self._bias_ids[s] = -1
            self._bias_vals[s] = 0.0
            for j, (tid, bv) in enumerate(sorted((r.logit_bias or {}).items())):
                self._bias_ids[s, j] = int(tid)
                self._bias_vals[s, j] = float(bv)
            self._recent[s] = -1
            tail = r.prompt[-PENALTY_WINDOW:]
            # RIGHT-align: the roll-in of generated tokens evicts from the
            # left, so left-aligning would evict prompt tokens while empty
            # (-1) slots remain free
            self._recent[s, PENALTY_WINDOW - len(tail):] = tail
            if r.n_probs:
                # report the distribution the token is SAMPLED from
                # (post bias/penalty), not the raw logits
                r.probs.append(_top_logprobs(
                    _adjusted_logits(np.asarray(last_logits), r,
                                     self._recent[s]), r.n_probs))
            if r.grammar is not None:
                try:
                    tok = _grammar_sample(np.asarray(last_logits), r,
                                          self._recent[s])
                    r.grammar.accept(tok)
                except ValueError:
                    # unsatisfiable at the first token: finish empty
                    r.done = True
                    self.finished[r.rid] = r
                    continue
            else:
                tok = int(_sample_one(
                    last_logits, rkey, len(r.prompt) - 1, r.temperature,
                    r.top_k, r.top_p, r.min_p,
                    jnp.asarray(self._recent[s]), r.repeat_penalty,
                    jnp.asarray(self._bias_ids[s]),
                    jnp.asarray(self._bias_vals[s]),
                ))
            r.generated.append(tok)
            self._n_prefill_tokens += len(r.prompt) - reuse
            self._n_tokens += 1
            # the admit-time token can already satisfy the request
            if (len(r.generated) >= r.max_new
                    or (self.eos_id is not None and tok == self.eos_id)):
                r.done = True
                self.finished[r.rid] = r
                continue
            self._pending_tok[s] = tok
            self._hpos[s] = len(r.prompt)
            self._recent[s] = np.roll(self._recent[s], -1)
            self._recent[s, -1] = tok  # admit-time token is generated too
            self.slots[s] = r

    def step(self) -> dict[int, int]:
        """Admit queued requests, run one batched decode step.

        Returns {request_id: new_token} for slots that produced a token.
        """
        self._admit()
        active = [s for s in range(self.n_slots) if self.slots[s] is not None]
        if not active:
            return {}
        if self.context_shift and int(np.max(np.asarray(self.cache.pos))) \
                >= self.cfg.max_seq - 1:
            self.cache = _shift_cache(self.cache, self._rope, cfg=self.cfg,
                                      keep=self._shift_keep)
            # shifting rewrites every slot's slab layout: the materialized
            # prefixes no longer start at position 0
            self._history = [[] for _ in range(self.n_slots)]
            self._hpos = np.asarray(self.cache.pos).astype(np.int64)
        tokens = jnp.asarray(self._pending_tok[:, None])
        gslots = [s for s in active if self.slots[s].grammar is not None]
        pslots = [s for s in active if self.slots[s].n_probs]
        step_args = (
            self.qparams, self._rope, tokens, self.cache, self._keys,
            jnp.asarray(self._temps), jnp.asarray(self._topk),
            jnp.asarray(self._topp), jnp.asarray(self._minp),
            jnp.asarray(self._recent), jnp.asarray(self._rpen),
            jnp.asarray(self._bias_ids), jnp.asarray(self._bias_vals),
        )
        # attention tile-size bucket from the batch's longest slot (window/
        # ring attention never attends past the window, so cap by it)
        max_ctx = int(max(self._hpos[s] for s in active))
        if self.cfg.window:
            max_ctx = min(max_ctx, self.cfg.window)
        attn_ts, attn_s_hi = attention.decode_ts_bucket(
            max_ctx, self.cache.quantized)
        if gslots or pslots:
            nxt, last_logits, self.cache = _decode_step_logits(
                *step_args, cfg=self.cfg, act_mode=self.act_mode,
                attn_ts=attn_ts, attn_s_hi=attn_s_hi)
        else:
            nxt, self.cache = _decode_step(
                *step_args, cfg=self.cfg, act_mode=self.act_mode,
                attn_ts=attn_ts, attn_s_hi=attn_s_hi)
        self._hpos[active] += 1
        nxt = np.asarray(nxt)
        if pslots:
            llp = np.asarray(last_logits)
            for s in pslots:
                r = self.slots[s]
                r.probs.append(_top_logprobs(
                    _adjusted_logits(llp[s], r, self._recent[s]),
                    r.n_probs))
        dead: set[int] = set()
        if gslots:
            # host-side constrained re-pick for grammar slots: mask every
            # continuation the grammar forbids, then sample; the in-jit
            # pick is discarded (it never touched the cache — the sampled
            # token only becomes NEXT step's input)
            ll = np.asarray(last_logits)
            nxt = nxt.copy()
            for s in gslots:
                r = self.slots[s]
                try:
                    tok = _grammar_sample(ll[s], r, self._recent[s])
                    r.grammar.accept(tok)
                    nxt[s] = tok
                except ValueError:
                    # unsatisfiable mid-generation (vocabulary cannot
                    # continue the grammar): finish the REQUEST with what
                    # it has — never the whole serving loop
                    r.done = True
                    self.finished[r.rid] = r
                    self.slots[s] = None
                    dead.add(s)
        self._n_steps += 1
        self._n_tokens += len(active)
        self._n_decode_tokens += len(active)
        out = {}
        for s in active:
            if s in dead:
                continue  # grammar-finished this step; slot released
            r = self.slots[s]
            tok = int(nxt[s])
            r.generated.append(tok)
            # the token FED this step was written into the slot's cache:
            # extend the materialized-prefix record (cache_prompt)
            self._history[s].append(int(self._pending_tok[s]))
            self._pending_tok[s] = tok
            self._recent[s] = np.roll(self._recent[s], -1)
            self._recent[s, -1] = tok
            out[r.rid] = tok
            if (
                len(r.generated) >= r.max_new
                or (self.eos_id is not None and tok == self.eos_id)
                or (not self.context_shift
                    and int(self.cache.pos[s]) >= self.cfg.max_seq - 1)
            ):
                r.done = True
                self.finished[r.rid] = r
                self.slots[s] = None
        return out

    def cancel(self, rid: int) -> bool:
        """Stop a request early (llama.cpp server slot release — e.g. a
        stop string matched, or the client disconnected).  The request
        moves to ``finished`` with whatever it generated so far."""
        for s in range(self.n_slots):
            r = self.slots[s]
            if r is not None and r.rid == rid:
                r.done = True
                self.finished[rid] = r
                self.slots[s] = None
                return True
        for i, r in enumerate(self.queue):
            if r.rid == rid:
                r.done = True
                self.finished[rid] = self.queue.pop(i)
                return True
        return False

    def stats(self) -> dict:
        """Serving counters: decode steps, generated/prefilled tokens, queue
        and slot occupancy — the observability surface a production loop
        scrapes between batches."""
        return {
            "decode_steps": self._n_steps,
            "generated_tokens": self._n_tokens,
            "prefill_tokens": self._n_prefill_tokens,
            "active_slots": sum(s is not None for s in self.slots),
            "queued": len(self.queue),
            "finished": len(self.finished),
            "tokens_per_step": (  # decode throughput only: admit-time
                # (prefill-sampled) tokens are excluded
                self._n_decode_tokens / self._n_steps
                if self._n_steps else 0.0
            ),
            "cached_prompt_tokens": self._n_cached_tokens,
        }

    def run_until_done(self, max_steps: int = 10_000) -> dict[int, list]:
        """Drain the queue; returns {request_id: generated tokens}."""
        for _ in range(max_steps):
            if not self.queue and all(s is None for s in self.slots):
                break
            self.step()
        return {rid: r.generated for rid, r in self.finished.items()}


__all__ = ["Server", "Request"]
