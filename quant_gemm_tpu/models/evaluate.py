"""Model-quality evaluation over a token stream (llama.cpp `perplexity`
tool analogue — the standard way quantization quality is judged end to end,
complementing the per-kernel NMSE harness).

Perplexity = exp(mean NLL of next-token predictions).  The stream is
evaluated in windows of ``ctx`` tokens advanced by ``stride``; within each
window the first ``ctx - stride`` tokens are context-only (their NLL is
discarded — they exist to give the scored tail real context), matching
llama.cpp's sliding evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import llama


def nll_of_chunk(qparams, cfg: llama.LlamaConfig, tokens: jax.Array,
                 act_mode: str = "q8_1"):
    """Per-position next-token negative log-likelihood for one [B, T] chunk.

    Returns [B, T-1] f32: entry t is -log p(tokens[t+1] | tokens[:t+1]).
    """
    cache = llama.KVCache.init(cfg, tokens.shape[0])
    logits, _ = llama.forward(qparams, cfg, tokens, cache, act_mode=act_mode)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    return -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]


def perplexity(
    qparams,
    cfg: llama.LlamaConfig,
    tokens,  # 1-D token stream (list / np.ndarray)
    *,
    ctx: int | None = None,
    stride: int | None = None,
    act_mode: str = "q8_1",
) -> dict:
    """Sliding-window perplexity of a token stream.

    ``ctx`` defaults to ``cfg.max_seq``; ``stride`` to ``ctx // 2``
    (llama.cpp evaluates the second half of each window).  Returns
    {"ppl", "nll", "tokens"}; streams shorter than 2 tokens are an error.
    """
    tokens = np.asarray(tokens, np.int32).ravel()
    assert tokens.size >= 2, "need at least 2 tokens"
    ctx = int(ctx or cfg.max_seq)
    ctx = min(ctx, cfg.max_seq)
    stride = int(stride or max(ctx // 2, 1))
    assert 0 < stride <= ctx

    fwd = jax.jit(
        lambda qp, t: nll_of_chunk(qp, cfg, t, act_mode=act_mode)
    )

    total = 0.0
    count = 0
    start = 0
    first = True
    while start + 1 < tokens.size:
        chunk = tokens[start : start + ctx]
        if chunk.size < 2:
            break
        pad = ctx - chunk.size
        padded = np.pad(chunk, (0, pad))
        nll = np.asarray(fwd(qparams, jnp.asarray(padded[None])))[0]
        # positions scored in this window: the stride tail (whole window on
        # the first pass), clipped to real (unpadded) predictions
        lo = 0 if first else (ctx - stride) - 1
        hi = chunk.size - 1
        total += float(nll[lo:hi].sum())
        count += hi - lo
        first = False
        if start + ctx >= tokens.size:
            break
        start += stride
    mean = total / max(count, 1)
    return {"ppl": float(np.exp(mean)), "nll": mean, "tokens": count}


__all__ = ["perplexity", "nll_of_chunk"]
