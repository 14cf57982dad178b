"""Text generation from a single GGUF file (llama.cpp `main` analogue).

Loads model weights AND the GGUF-embedded SPM tokenizer, then generates
through the continuous-batching server (greedy by default; temperature /
top-k / top-p supported per request).

Usage:
    python scripts/generate.py -m model.gguf -p "Once upon a time" -n 64
    python scripts/generate.py -m model.gguf --ids 1,123,456 -n 16  # raw ids
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True, help="GGUF path")
    ap.add_argument("-p", "--prompt", default=None)
    ap.add_argument("--chat", action="store_true",
                    help="wrap the prompt as a user turn via the GGUF's "
                         "tokenizer.chat_template")
    ap.add_argument("--ids", default=None,
                    help="comma-separated token ids (skips the tokenizer)")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--min-p", type=float, default=0.0)
    ap.add_argument("--repeat-penalty", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--kv", default="bf16", choices=["bf16", "q8"])
    ap.add_argument("--lora", default=None, metavar="ADAPTER_GGUF",
                    help="apply a llama.cpp LoRA adapter at runtime")
    ap.add_argument("--grammar-file", default=None, metavar="GBNF",
                    help="constrain sampling to a GBNF grammar (llama.cpp "
                         "--grammar-file)")
    ap.add_argument("--json", action="store_true",
                    help="constrain output to JSON (llama.cpp json.gbnf)")
    ap.add_argument("--draft", default=None, metavar="DRAFT_GGUF",
                    help="speculative decoding with this draft model "
                         "(llama.cpp llama-speculative)")
    ap.add_argument("--draft-k", type=int, default=4,
                    help="proposal length per target call")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tests / no-TPU boxes)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from quant_gemm_tpu.formats.gguf_file import GGUFFile
    from quant_gemm_tpu.models import serve
    from quant_gemm_tpu.models.gguf_loader import load_llama
    from quant_gemm_tpu.models.tokenizer import tokenizer_from_gguf

    t0 = time.time()
    gf = GGUFFile(args.model)  # parsed once: weights AND tokenizer metadata
    qparams, cfg = load_llama(gf)
    if args.lora:
        from quant_gemm_tpu.models import lora as lora_mod

        qparams = lora_mod.attach_lora(
            qparams, lora_mod.load_lora(args.lora), cfg)
        print(f"applied LoRA adapter {args.lora}", file=sys.stderr)
    print(f"loaded {args.model} in {time.time()-t0:.1f}s: {cfg}",
          file=sys.stderr, flush=True)

    tok = None
    if args.ids is not None:
        prompt_ids = [int(x) for x in args.ids.split(",")]
    else:
        if args.prompt is None:
            ap.error("need -p/--prompt or --ids")
        md = gf.metadata
        tok = tokenizer_from_gguf(md)
        if args.chat:
            from quant_gemm_tpu.models.tokenizer import (
                encode_with_specials, render_chat)

            text = render_chat(md, [{"role": "user", "content": args.prompt}])
            # the template supplies bos and special tokens as literal text;
            # map them to their ids instead of re-tokenizing them
            prompt_ids = encode_with_specials(tok, text)
        else:
            prompt_ids = tok.encode(args.prompt)
        print(f"prompt -> {len(prompt_ids)} tokens: {prompt_ids}",
              file=sys.stderr, flush=True)

    if args.draft:
        # speculative decoding path (llama.cpp llama-speculative): the
        # draft proposes k tokens per target call; greedy output is
        # IDENTICAL to plain decode, sampled output distribution-exact
        import jax.numpy as jnp

        from quant_gemm_tpu.models import speculative

        if args.json or args.grammar_file:
            ap.error("--draft and grammar constraints are exclusive")
        qp_d, cfg_d = load_llama(args.draft)
        toks = jnp.asarray([list(prompt_ids)], jnp.int32)
        t0 = time.time()
        out_tok, tpc = speculative.speculative_sample_decode(
            qparams, cfg, qp_d, cfg_d, toks, args.n_predict,
            k=args.draft_k, temperature=args.temp, top_k=args.top_k,
            top_p=args.top_p, seed=args.seed or 0, act_mode="q8_1")
        dt = time.time() - t0
        out_ids = [int(t) for t in out_tok[0]]
        print(f"{len(out_ids)} tokens in {dt:.1f}s "
              f"({tpc:.2f} tokens/target-call)", file=sys.stderr, flush=True)
        if tok is not None:
            print(tok.decode(list(prompt_ids) + out_ids))
        else:
            print(",".join(str(t) for t in out_ids))
        return

    srv = serve.Server(qparams, cfg, n_slots=1, cache_qtype=args.kv,
                       eos_id=tok.eos_id if tok else None)
    gsampler = None
    if args.json or args.grammar_file:
        from quant_gemm_tpu.models.grammar import JSON_GBNF, GrammarSampler

        if tok is None:
            ap.error("--grammar needs a tokenizer (not usable with --ids)")
        gbnf = (JSON_GBNF if args.json
                else open(args.grammar_file, encoding="utf-8").read())
        gsampler = GrammarSampler(gbnf, tok)
    rid = srv.submit(prompt_ids, max_new=args.n_predict,
                     temperature=args.temp, top_k=args.top_k,
                     top_p=args.top_p, min_p=args.min_p,
                     repeat_penalty=args.repeat_penalty, seed=args.seed,
                     grammar=gsampler)
    t0 = time.time()
    out_ids = srv.run_until_done()[rid]
    dt = time.time() - t0
    print(f"{len(out_ids)} tokens in {dt:.1f}s "
          f"({len(out_ids)/max(dt,1e-9):.1f} tok/s)",
          file=sys.stderr, flush=True)
    if tok is not None:
        # decode prompt+output TOGETHER: decoding the continuation alone
        # would mis-strip its leading space
        print(tok.decode(list(prompt_ids) + list(out_ids)))
    else:
        print(",".join(str(i) for i in out_ids))


if __name__ == "__main__":
    main()
