"""HTTP serving front-end — the llama.cpp ``llama-server`` analogue.

Wraps the continuous-batching engine (models/serve.Server) behind a
threaded stdlib HTTP server with llama.cpp-native and OpenAI-compatible
endpoints:

* ``POST /completion``          llama.cpp native: {prompt, n_predict,
  temperature, top_k, top_p, min_p, repeat_penalty, stream, stop,
  grammar, n_probs, cache_prompt, seed, logit_bias...}
* ``POST /v1/completions``      OpenAI completions (prompt/max_tokens/
  logprobs/stop/response_format)
* ``POST /v1/chat/completions`` OpenAI chat; messages render through the
  GGUF-embedded chat template (tokenizer.chat_template) exactly like
  ``generate.py --chat``
* ``POST /embedding``           llama.cpp native sequence embedding
* ``POST /v1/embeddings``       OpenAI batch embeddings
* ``POST /tokenize`` / ``POST /detokenize``
* ``GET  /health``              liveness
* ``GET  /props``               model properties (n_ctx, chat template, ...)
* ``GET  /metrics``             Server.stats() counters incl. prefix-cache
  hits

``"stream": true`` returns Server-Sent Events (``data: {...}\\n\\n`` per
token, ``data: [DONE]`` at the end — the llama.cpp/OpenAI wire format).

One background thread owns the TPU step loop (continuous batching across
concurrent HTTP requests — concurrency comes from slot batching, not from
parallel model calls); handler threads submit requests and drain per-request
token queues.

Usage: python scripts/server.py -m model.gguf --port 8080 [--slots 8]
       [--kv q8] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import queue
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, ".")


class Engine:
    """Thread-safe bridge: HTTP handlers submit; one loop thread steps."""

    def __init__(self, server, tok, metadata):
        self.server = server
        self.tok = tok
        self.metadata = metadata
        self.lock = threading.Lock()
        self.wake = threading.Condition(self.lock)
        self.queues: dict[int, queue.Queue] = {}
        self._sent: dict[int, int] = {}  # rid -> tokens already relayed
        self.results: dict[int, object] = {}  # rid -> finished Request
        self._stop = False
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, prompt_ids, **kw) -> tuple[int, queue.Queue]:
        q: queue.Queue = queue.Queue()
        with self.wake:
            rid = self.server.submit(prompt_ids, **kw)
            self.queues[rid] = q
            self._sent[rid] = 0
            self.wake.notify()
        return rid, q

    def _relay(self) -> None:
        """Push every not-yet-relayed generated token (INCLUDING the
        admit-time prefill-sampled first token, which Server.step()'s
        return dict never contains) to its request queue."""
        reqs = {}
        for r in self.server.slots:
            if r is not None:
                reqs[r.rid] = r
        for rid in list(self.queues):
            r = reqs.get(rid) or self.server.finished.get(rid)
            if r is None:
                continue
            sent = self._sent[rid]
            for t in r.generated[sent:]:
                self.queues[rid].put(int(t))
            self._sent[rid] = len(r.generated)
            if rid in self.server.finished:
                # the HTTP layer owns the result now: prune so a
                # long-running server does not retain every Request; the
                # Request object itself is kept ONLY when the handler
                # needs it back (n_probs), popped after the sentinel
                req_obj = self.server.finished.pop(rid)
                if getattr(req_obj, "n_probs", 0):
                    self.results[rid] = req_obj
                self.queues.pop(rid).put(None)  # end-of-stream sentinel
                self._sent.pop(rid)

    def _loop(self):
        while True:
            with self.wake:
                while not self._stop and not (
                    self.server.queue
                    or any(s is not None for s in self.server.slots)
                ):
                    self.wake.wait()
                if self._stop:
                    return
                try:
                    self.server.step()
                    self._relay()
                except Exception:  # noqa: BLE001 - keep the loop alive
                    import traceback

                    traceback.print_exc(file=sys.stderr)
                    # unblock every waiting client AND release their
                    # slots/queue entries — leaving a failing request
                    # active would re-raise every step (an exception
                    # spin that never serves again)
                    for r in list(self.server.slots) + list(
                            self.server.queue):
                        if r is not None:
                            self.server.cancel(r.rid)
                    self.server.finished.clear()
                    for rid, q in list(self.queues.items()):
                        q.put(None)
                    self.queues.clear()
                    self._sent.clear()

    def cancel(self, rid: int) -> None:
        """Stop a request early (stop string matched / client gone) and
        flush its queue with the end-of-stream sentinel — the loop thread
        may be asleep, so the sentinel cannot wait for the next step."""
        with self.wake:
            self.server.cancel(rid)
            r = self.server.finished.pop(rid, None)
            q = self.queues.pop(rid, None)
            sent = self._sent.pop(rid, 0)
            if r is not None and getattr(r, "n_probs", 0):
                self.results[rid] = r
            if q is not None:
                if r is not None:
                    for t in r.generated[sent:]:
                        q.put(int(t))
                q.put(None)

    def shutdown(self):
        with self.wake:
            self._stop = True
            self.wake.notify()


def _decode_stream(tok, ids: list, prev_text: str) -> str:
    """Decoded text so far, withholding a trailing partial-UTF-8 glyph so
    streaming deltas never emit a replacement char that later 'un-happens'."""
    text = tok.decode(ids)
    while text.endswith("�"):
        text = text[:-1]
    return text if len(text) >= len(prev_text) else prev_text


def _find_stop(text: str, stops) -> int:
    """Index of the earliest stop-string occurrence, or -1."""
    best = -1
    for s in stops:
        i = text.find(s)
        if i >= 0 and (best < 0 or i < best):
            best = i
    return best


def _hold_len(text: str, stops) -> int:
    """Longest tail of ``text`` that is a PREFIX of some stop string —
    withheld from streaming until disambiguated (llama.cpp's
    stopping-word hold)."""
    hold = 0
    for s in stops:
        for n in range(min(len(s) - 1, len(text)), 0, -1):
            if s.startswith(text[-n:]):
                hold = max(hold, n)
                break
    return hold


def make_handler(engine: Engine):
    tok = engine.tok

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # stderr, not stdout
            sys.stderr.write("%s - %s\n" % (self.address_string(),
                                            fmt % args))

        # -- helpers -----------------------------------------------------
        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def _run(self, prompt_ids, req, *, stream_fmt=None):
            gsampler = None
            gbnf = req.get("grammar")  # llama.cpp server native field
            rf = req.get("response_format") or {}
            if gbnf is None and rf.get("type") == "json_object":
                from quant_gemm_tpu.models.grammar import JSON_GBNF

                gbnf = JSON_GBNF
            if gbnf:
                from quant_gemm_tpu.models.grammar import GrammarSampler

                gsampler = GrammarSampler(gbnf, tok)
            kw = dict(
                max_new=int(req.get("n_predict",
                                    req.get("max_tokens", 64))),
                temperature=float(req.get("temperature", 0.0)),
                top_k=int(req.get("top_k", 0)),
                top_p=float(req.get("top_p", 1.0)),
                min_p=float(req.get("min_p", 0.0)),
                repeat_penalty=float(req.get("repeat_penalty", 1.0)),
                seed=req.get("seed"),
                grammar=gsampler,
                n_probs=int(req.get("n_probs", req.get("logprobs") or 0)),
                cache_prompt=bool(req.get("cache_prompt", True)),
            )
            stops = req.get("stop") or []
            if isinstance(stops, str):
                stops = [stops]
            stops = [s for s in stops if s]  # llama.cpp ignores empty stops
            rid, q = engine.submit(prompt_ids, **kw)

            def drain_after_cancel():
                engine.cancel(rid)
                while q.get() is not None:  # consume through the sentinel
                    pass

            if stream_fmt is None:
                ids = []
                while True:
                    t = q.get()
                    if t is None:
                        break
                    ids.append(t)
                    if stops:
                        i = _find_stop(tok.decode(ids), stops)
                        if i >= 0:
                            drain_after_cancel()
                            return rid, ids, tok.decode(ids)[:i]
                return rid, ids, tok.decode(ids)
            # (engine.results entries are popped by _probs_payload for the
            # endpoints that report logprobs, and below for streams)
            # SSE streaming.  The try/finally guarantees that a client
            # disconnect (BrokenPipeError from wfile.write) cancels the
            # engine request — no tokens burn for a gone client and no
            # results entry is retained.
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            ids, emitted, text = [], "", ""
            stopped = False
            try:
                while True:
                    t = q.get()
                    if t is None:
                        break
                    ids.append(t)
                    text = _decode_stream(tok, ids, text)
                    if stops:
                        i = _find_stop(text, stops)
                        if i >= 0:
                            text = text[:i]
                            stopped = True
                        else:
                            # withhold a tail that could become a stop
                            full = text
                            text = text[: len(text)
                                        - _hold_len(text, stops)]
                    delta = text[len(emitted):]
                    if delta:
                        self.wfile.write(
                            b"data: "
                            + json.dumps(stream_fmt(delta, False)).encode()
                            + b"\n\n")
                        self.wfile.flush()
                        emitted = text
                    if stopped:
                        break
                    if stops:
                        text = full  # restore the held tail
                # flush any withheld tail (a genuinely-trailing replacement
                # char, or a held stop-prefix that never completed) so
                # deltas always concatenate to the non-streamed response
                if stopped:
                    tail = ""
                else:
                    final = tok.decode(ids)
                    if stops:
                        i = _find_stop(final, stops)
                        final = final[:i] if i >= 0 else final
                    tail = final[len(emitted):]
                self.wfile.write(
                    b"data: " + json.dumps(stream_fmt(tail, True)).encode()
                    + b"\n\ndata: [DONE]\n\n")
                self.wfile.flush()
                self.close_connection = True
            finally:
                # normal end: no-ops.  Early stop or client disconnect:
                # release the slot and drop any retained result.
                engine.cancel(rid)
                engine.results.pop(rid, None)
            return None

        # -- endpoints ---------------------------------------------------
        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            elif self.path in ("/metrics", "/stats"):
                self._json(200, engine.server.stats())
            elif self.path == "/props":
                cfg = engine.server.cfg
                self._json(200, {
                    "n_ctx": cfg.max_seq,
                    "n_embd": cfg.dim,
                    "n_vocab": cfg.vocab,
                    "total_slots": engine.server.n_slots,
                    "chat_template":
                        engine.metadata.get("tokenizer.chat_template", ""),
                    "model": engine.metadata.get("general.name", ""),
                })
            else:
                self._json(404, {"error": "unknown endpoint"})

        def do_POST(self):
            try:
                req = self._read_body()
                if self.path == "/completion":
                    self._completion(req)
                elif self.path == "/v1/completions":
                    self._oai_completion(req)
                elif self.path == "/v1/chat/completions":
                    self._oai_chat(req)
                elif self.path == "/embedding":
                    self._embedding(req)
                elif self.path == "/v1/embeddings":
                    self._oai_embeddings(req)
                elif self.path == "/tokenize":
                    self._json(200, {"tokens": tok.encode(req["content"])})
                elif self.path == "/detokenize":
                    self._json(200,
                               {"content": tok.decode(req["tokens"])})
                else:
                    self._json(404, {"error": "unknown endpoint"})
            except Exception as e:  # noqa: BLE001 - surface to the client
                self._json(400, {"error": str(e)})

        def _embed_one(self, text, pooling="mean"):
            from quant_gemm_tpu.models import llama

            import jax.numpy as jnp

            ids = tok.encode(text)
            # pad to the prefill bucket so distinct prompt lengths reuse
            # ONE compiled program per bucket (a per-length recompile here
            # would stall the decode loop for its duration); pooling masks
            # the pad positions via lengths
            bucket = engine.server.bucket
            width = max(((len(ids) + bucket - 1) // bucket) * bucket, bucket)
            padded = ids + [0] * (width - len(ids))
            # serialize on the engine lock so the forward never
            # interleaves with a decode step
            with engine.lock:
                vec = llama.embed(
                    engine.server.qparams, engine.server.cfg,
                    jnp.asarray([padded]), lengths=jnp.asarray([len(ids)]),
                    pooling=pooling, act_mode=engine.server.act_mode)
            return [float(v) for v in vec[0]], len(ids)

        def _embedding(self, req):  # llama.cpp native
            emb, _ = self._embed_one(req["content"],
                                     req.get("pooling", "mean"))
            self._json(200, {"embedding": emb})

        def _oai_embeddings(self, req):
            inputs = req["input"]
            if isinstance(inputs, str):
                inputs = [inputs]
            data, total = [], 0
            for i, text in enumerate(inputs):
                emb, n = self._embed_one(text)
                total += n
                data.append({"object": "embedding", "index": i,
                             "embedding": emb})
            self._json(200, {"object": "list", "data": data,
                             "usage": {"prompt_tokens": total}})

        def _probs_payload(self, rid, out_ids):
            """llama.cpp completion_probabilities for a finished request."""
            r = engine.results.pop(rid, None)
            if r is None or not getattr(r, "probs", None):
                return None
            out = []
            for tid, top in zip(out_ids, r.probs):
                out.append({
                    "id": tid,
                    "token": tok.decode([tid]),
                    "probs": [{"id": t, "token": tok.decode([t]),
                               "logprob": lp} for t, lp in top],
                })
            return out

        def _completion(self, req):
            ids = tok.encode(req["prompt"])
            if req.get("stream"):
                self._run(ids, req, stream_fmt=lambda d, stop: {
                    "content": d, "stop": stop})
                return
            rid, out_ids, text = self._run(ids, req)
            body = {
                "content": text,
                "tokens_predicted": len(out_ids),
                "tokens_evaluated": len(ids),
                "stop": True,
            }
            probs = self._probs_payload(rid, out_ids)
            if probs is not None:
                body["completion_probabilities"] = probs
            self._json(200, body)

        def _oai_completion(self, req):
            ids = tok.encode(req["prompt"])
            if req.get("stream"):
                self._run(ids, req, stream_fmt=lambda d, stop: {
                    "object": "text_completion.chunk",
                    "choices": [{"text": d, "index": 0,
                                 "finish_reason": "stop" if stop else None}],
                })
                return
            rid, out_ids, text = self._run(ids, req)
            choice = {"text": text, "index": 0, "finish_reason": "stop"}
            probs = self._probs_payload(rid, out_ids)
            if probs is not None:  # OpenAI logprobs shape
                choice["logprobs"] = {
                    "tokens": [p["token"] for p in probs],
                    "token_logprobs": [
                        next((e["logprob"] for e in p["probs"]
                              if e["id"] == p["id"]), None)
                        for p in probs],
                    "top_logprobs": [
                        {e["token"]: e["logprob"] for e in p["probs"]}
                        for p in probs],
                }
            self._json(200, {
                "object": "text_completion",
                "choices": [choice],
                "usage": {"prompt_tokens": len(ids),
                          "completion_tokens": len(out_ids)},
            })

        def _oai_chat(self, req):
            from quant_gemm_tpu.models.tokenizer import (
                encode_with_specials, render_chat)

            text_in = render_chat(engine.metadata, req["messages"])
            ids = encode_with_specials(tok, text_in)
            if req.get("stream"):
                self._run(ids, req, stream_fmt=lambda d, stop: {
                    "object": "chat.completion.chunk",
                    "choices": [{"delta": ({"content": d} if d else {}),
                                 "index": 0,
                                 "finish_reason": "stop" if stop else None}],
                })
                return
            rid, out_ids, text = self._run(ids, req)
            engine.results.pop(rid, None)  # chat doesn't report logprobs
            self._json(200, {
                "object": "chat.completion",
                "choices": [{"message": {"role": "assistant",
                                         "content": text},
                             "index": 0, "finish_reason": "stop"}],
                "usage": {"prompt_tokens": len(ids),
                          "completion_tokens": len(out_ids)},
            })

    return Handler


def build_engine(model_path, *, n_slots=8, cache_qtype="bf16",
                 prefill_a16=False,
                 prefill_bucket=16, lora_path=None) -> Engine:
    from quant_gemm_tpu.formats.gguf_file import GGUFFile
    from quant_gemm_tpu.models import gguf_loader, serve
    from quant_gemm_tpu.models.tokenizer import tokenizer_from_gguf

    gf = GGUFFile(model_path)
    qparams, cfg = gguf_loader.load_llama(gf)
    if lora_path:
        from quant_gemm_tpu.models import lora as lora_mod

        qparams = lora_mod.attach_lora(
            qparams, lora_mod.load_lora(lora_path), cfg)
    tok = tokenizer_from_gguf(gf.metadata)
    srv = serve.Server(qparams, cfg, n_slots=n_slots,
                       cache_qtype=cache_qtype,
                       prefill_bucket=prefill_bucket,
                       prefill_a16=prefill_a16,
                       eos_id=tok.eos_id)
    return Engine(srv, tok, gf.metadata)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--kv", default="bf16", choices=["bf16", "q8"])
    ap.add_argument("--lora", default=None, metavar="ADAPTER_GGUF",
                    help="apply a llama.cpp LoRA adapter at runtime")
    ap.add_argument("--prefill-a16", action="store_true",
                    help="W4A16 prompt processing (bf16 activations; "
                         "decode stays exact W4A8) — +34%% prefill "
                         "throughput measured on-chip (r5)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (interpret-mode kernels)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    engine = build_engine(args.model, n_slots=args.slots,
                          cache_qtype=args.kv, lora_path=args.lora,
                          prefill_a16=args.prefill_a16)
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(engine))
    print(f"listening on http://{args.host}:{args.port} "
          f"(slots={args.slots}, kv={args.kv})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
