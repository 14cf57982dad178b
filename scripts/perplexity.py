"""Perplexity CLI — the llama.cpp ``llama-perplexity`` analogue.

Tokenizes a text file with the GGUF-embedded tokenizer and runs the
sliding-window perplexity evaluator (models/evaluate.perplexity —
llama.cpp methodology: stride ctx/2, score the second half of each
window).  Prints ONE JSON line {"ppl", "nll", "tokens", "ctx", "stride"}.

Usage: python scripts/perplexity.py -m model.gguf -f corpus.txt
       [--ctx 512] [--stride 256] [--act-mode q8_1|bf16] [--cpu]

(No KV-cache dtype knob: teacher-forced scoring runs each window as one
fresh-cache prefill, so the cache never round-trips a second step.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="UTF-8 text file")
    ap.add_argument("--ctx", type=int, default=None)
    ap.add_argument("--stride", type=int, default=None)
    ap.add_argument("--act-mode", default="q8_1", choices=["q8_1", "bf16"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from quant_gemm_tpu.formats.gguf_file import GGUFFile
    from quant_gemm_tpu.models import evaluate, gguf_loader
    from quant_gemm_tpu.models.tokenizer import tokenizer_from_gguf

    t0 = time.time()
    gf = GGUFFile(args.model)
    qparams, cfg = gguf_loader.load_llama(gf)
    tok = tokenizer_from_gguf(gf.metadata)
    text = open(args.file, encoding="utf-8").read()
    ids = tok.encode(text)
    print(f"loaded model + {len(ids)} tokens in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    res = evaluate.perplexity(qparams, cfg, ids, ctx=args.ctx,
                              stride=args.stride, act_mode=args.act_mode)
    print(json.dumps({**res, "ctx": args.ctx or cfg.max_seq,
                      "stride": args.stride or "ctx/2"}))


if __name__ == "__main__":
    main()
