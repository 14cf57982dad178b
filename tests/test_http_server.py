"""HTTP serving front-end (scripts/server.py — the llama-server analogue)
driven end to end over real sockets against the foreign GGUF fixture."""

import json
import pathlib
import sys
import threading
import urllib.request

import pytest

pytestmark = pytest.mark.slow  # full-model interpret-mode serving

FIXTURE = pathlib.Path(__file__).parent / "golden" / "tiny_llama_q4km.gguf"


@pytest.fixture(scope="module")
def base_url():
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "scripts"))
    import server as srv
    from http.server import ThreadingHTTPServer

    engine = srv.build_engine(FIXTURE, n_slots=2, prefill_bucket=8)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler(engine))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    engine.shutdown()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def test_health(base_url):
    with urllib.request.urlopen(base_url + "/health", timeout=60) as r:
        assert json.loads(r.read()) == {"status": "ok"}


def test_completion_native(base_url):
    out = _post(base_url + "/completion",
                {"prompt": "hello world", "n_predict": 4})
    assert out["stop"] is True
    # EVERY generated token is relayed, including the admit-time
    # prefill-sampled first one (the fixture model never emits EOS)
    assert out["tokens_predicted"] == 4
    assert isinstance(out["content"], str)
    # metrics reflect the work
    with urllib.request.urlopen(base_url + "/metrics", timeout=60) as r:
        stats = json.loads(r.read())
    assert stats["generated_tokens"] >= 1


def test_openai_completion(base_url):
    out = _post(base_url + "/v1/completions",
                {"prompt": "the quick", "max_tokens": 3})
    assert out["object"] == "text_completion"
    assert out["choices"][0]["finish_reason"] == "stop"
    assert out["usage"]["completion_tokens"] >= 1


def test_openai_chat_uses_template(base_url):
    out = _post(base_url + "/v1/chat/completions",
                {"messages": [{"role": "user", "content": "hi"}],
                 "max_tokens": 3})
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_streaming_sse(base_url):
    req = urllib.request.Request(
        base_url + "/completion",
        data=json.dumps({"prompt": "hello world", "n_predict": 4,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(line[6:])
    assert events[-1] == "[DONE]"
    payloads = [json.loads(e) for e in events[:-1]]
    assert payloads[-1]["stop"] is True
    # token deltas concatenate to the non-streamed answer for the same
    # prompt (greedy, deterministic)
    text = "".join(p["content"] for p in payloads)
    ref = _post(base_url + "/completion",
                {"prompt": "hello world", "n_predict": 4})
    assert text == ref["content"], (text, ref["content"])


def test_concurrent_requests_batch(base_url):
    """Two simultaneous requests ride the continuous-batching slots."""
    results = {}

    def go(name, prompt):
        results[name] = _post(base_url + "/completion",
                              {"prompt": prompt, "n_predict": 3})

    ts = [threading.Thread(target=go, args=(i, p))
          for i, p in enumerate(["hello world", "the quick brown"])]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert len(results) == 2
    assert all(r["stop"] for r in results.values())


def test_embedding_native(base_url):
    out = _post(base_url + "/embedding", {"content": "hello world"})
    import math
    v = out["embedding"]
    assert len(v) == 256  # cfg.dim of the fixture
    assert abs(math.fsum(x * x for x in v) - 1.0) < 1e-3  # L2-normalized


def test_openai_embeddings(base_url):
    out = _post(base_url + "/v1/embeddings",
                {"input": ["hello world", "the quick brown"]})
    assert out["object"] == "list"
    assert len(out["data"]) == 2
    assert out["data"][0]["index"] == 0
    a, b = out["data"][0]["embedding"], out["data"][1]["embedding"]
    # different texts embed differently
    assert any(abs(x - y) > 1e-4 for x, y in zip(a, b))


def test_tokenize_detokenize_props(base_url):
    out = _post(base_url + "/tokenize", {"content": "hello world"})
    assert isinstance(out["tokens"], list) and out["tokens"]
    back = _post(base_url + "/detokenize", {"tokens": out["tokens"]})
    assert back["content"] == "hello world"
    with urllib.request.urlopen(base_url + "/props", timeout=60) as r:
        props = json.loads(r.read())
    assert props["n_embd"] == 256 and props["total_slots"] == 2
    assert "<|user|>" in props["chat_template"]


def test_stop_strings(base_url):
    # learn what the model actually emits, then stop on a substring of it
    full = _post(base_url + "/completion",
                 {"prompt": "hello world", "n_predict": 6})
    content = full["content"]
    assert len(content) >= 2
    stop = content[1:3]  # a 2-char stop inside the natural output
    out = _post(base_url + "/completion",
                {"prompt": "hello world", "n_predict": 6, "stop": [stop]})
    assert out["content"] == content[: content.find(stop)]
    assert stop not in out["content"]

    # streaming: deltas + final tail concatenate to the same truncation
    req = urllib.request.Request(
        base_url + "/completion",
        data=json.dumps({"prompt": "hello world", "n_predict": 6,
                         "stop": [stop], "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=600) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                events.append(json.loads(line[6:]))
    text = "".join(e["content"] for e in events)
    assert text == out["content"], (text, out["content"])


def test_grammar_forced_over_http(base_url):
    out = _post(base_url + "/completion",
                {"prompt": "say", "n_predict": 16,
                 "grammar": 'root ::= "yes" | "no"'})
    assert out["content"] in ("yes", "no"), out["content"]


def test_logprobs(base_url):
    out = _post(base_url + "/completion",
                {"prompt": "hello world", "n_predict": 3, "n_probs": 4})
    probs = out["completion_probabilities"]
    assert len(probs) == 3
    for i, p in enumerate(probs):
        assert len(p["probs"]) == 4
        lps = [e["logprob"] for e in p["probs"]]
        assert all(lp <= 1e-6 for lp in lps)  # logprobs are <= 0
        assert lps == sorted(lps, reverse=True)  # descending
        # greedy: the chosen token IS the top-1
        assert p["id"] == p["probs"][0]["id"]

    oai = _post(base_url + "/v1/completions",
                {"prompt": "hello world", "max_tokens": 3, "logprobs": 2})
    lp = oai["choices"][0]["logprobs"]
    assert len(lp["tokens"]) == 3
    assert all(v is not None and v <= 1e-6 for v in lp["token_logprobs"])
    assert all(len(t) == 2 for t in lp["top_logprobs"])
