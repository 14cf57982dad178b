"""SPM tokenizer (GGUF-embedded vocab): encode/decode semantics."""

import numpy as np
import pytest

from quant_gemm_tpu.models.tokenizer import (
    SPMTokenizer,
    TOKEN_BYTE,
    TOKEN_CONTROL,
    TOKEN_NORMAL,
    TOKEN_UNKNOWN,
)


def _vocab():
    """Tiny SPM-style vocab: specials, byte fallback, and scored merges."""
    tokens = ["<unk>", "<s>", "</s>"]
    types = [TOKEN_UNKNOWN, TOKEN_CONTROL, TOKEN_CONTROL]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):  # byte fallback table
        tokens.append(f"<0x{b:02X}>")
        types.append(TOKEN_BYTE)
        scores.append(-1e6)
    # pieces: higher score = preferred merge (SentencePiece convention:
    # scores are log-probs, longer learned pieces usually score higher
    # than character-by-character merges)
    # NOTE: like a real SentencePiece vocab, every learned piece's merge
    # CHAIN is present (e.g. "▁the" forms via th -> ▁th -> ▁the)
    pieces = {"▁": -2.0, "a": -3.0, "b": -3.1, "c": -3.2, "ab": -1.5,
              "▁ab": -1.0, "▁abc": -0.5, "bc": -1.8, "▁the": -0.9,
              "t": -3.3, "h": -3.4, "e": -3.5, "th": -2.5, "he": -2.6,
              "▁th": -2.2}
    for p, s in pieces.items():
        tokens.append(p)
        types.append(TOKEN_NORMAL)
        scores.append(s)
    return SPMTokenizer(tokens, scores, types)


def test_greedy_merge_prefers_best_score():
    tok = _vocab()
    ids = tok.encode("abc", add_bos=False)
    # "▁abc" (score -0.5) beats any partial segmentation
    assert [tok.tokens[i] for i in ids] == ["▁abc"]
    ids2 = tok.encode("ab", add_bos=False)
    assert [tok.tokens[i] for i in ids2] == ["▁ab"]


def test_bos_and_space_prefix():
    tok = _vocab()
    ids = tok.encode("ab")
    assert ids[0] == tok.bos_id
    assert tok.tokens[ids[1]] == "▁ab"


def test_multi_word():
    tok = _vocab()
    ids = tok.encode("the ab", add_bos=False)
    assert [tok.tokens[i] for i in ids] == ["▁the", "▁ab"]


def test_byte_fallback_roundtrip():
    tok = _vocab()
    ids = tok.encode("a€b", add_bos=False)  # '€' not in vocab -> 3 bytes
    names = [tok.tokens[i] for i in ids]
    assert sum(n.startswith("<0x") for n in names) == 3
    assert tok.decode(ids) == "a€b"


def test_decode_skips_control_restores_spaces():
    tok = _vocab()
    ids = tok.encode("the ab")
    assert tok.decode(ids) == "the ab"  # <s> skipped, ▁ -> space


def test_gguf_metadata_roundtrip(tmp_path):
    """Tokenizer arrays survive the GGUF writer/reader and rebuild the
    same tokenizer (the scripts/generate.py load path)."""
    from quant_gemm_tpu.formats import gguf_file

    tok = _vocab()
    path = tmp_path / "tok.gguf"
    gguf_file.write_gguf(
        path,
        {"dummy.weight": np.zeros((8, 32), np.float32)},
        metadata={
            "tokenizer.ggml.model": "llama",
            "tokenizer.ggml.tokens": tok.tokens,
            "tokenizer.ggml.scores": [float(s) for s in tok.scores],
            "tokenizer.ggml.token_type": [int(t) for t in tok.token_types],
            "tokenizer.ggml.bos_token_id": 1,
            "tokenizer.ggml.eos_token_id": 2,
        },
    )
    md = gguf_file.GGUFFile(path).metadata
    tok2 = SPMTokenizer.from_gguf(md)
    for text in ("abc", "the ab", "a€b"):
        assert tok2.encode(text) == tok.encode(text)
        assert tok2.decode(tok2.encode(text)) == text


def test_bpe_refused():
    with pytest.raises(ValueError, match="SPM"):
        SPMTokenizer.from_gguf({"tokenizer.ggml.model": "gpt2",
                                "tokenizer.ggml.tokens": ["a"]})


@pytest.mark.slow
def test_generate_cli_end_to_end(tmp_path):
    """scripts/generate.py: tiny GGUF (weights + embedded tokenizer) ->
    prompt in, text out, via the real CLI in a subprocess."""
    import subprocess
    import sys

    from quant_gemm_tpu.models import llama
    from quant_gemm_tpu.models.gguf_loader import export_gguf

    tok = _vocab()
    cfg = llama.LlamaConfig(vocab=len(tok.tokens), dim=64, n_layers=1,
                            n_heads=2, n_kv_heads=2, d_ff=128, max_seq=64)
    params = llama.init_params(cfg, seed=0)
    path = tmp_path / "tiny.gguf"
    export_gguf(path, params, cfg, qtype="q8_0", tokenizer_metadata={
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": tok.tokens,
        "tokenizer.ggml.scores": [float(s) for s in tok.scores],
        "tokenizer.ggml.token_type": [int(t) for t in tok.token_types],
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    })
    r = subprocess.run(
        [sys.executable, "scripts/generate.py", "-m", str(path),
         "-p", "the ab", "-n", "4", "--cpu"],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert "tokens in" in r.stderr  # throughput line
    assert r.stdout.strip().startswith("the ab")  # echo + generation


# ---------------------------------------------------------------------------
# BPE (Llama-3 / GPT-2 GGUF vocabularies)
# ---------------------------------------------------------------------------


def _bpe_vocab():
    """Tiny byte-level BPE vocab verified against HF GPT2Tokenizer
    semantics: base byte alphabet + ranked merges."""
    from quant_gemm_tpu.models.tokenizer import BPETokenizer, _B2U

    base = [_B2U[b] for b in range(256)]
    merges = ["Ġ t", "h e", "Ġt he", "a b", "Ġ ab", "l l", "he ll",
              "hell o", "Ġthe Ġab"]
    built = []
    for m in merges:
        a, _, b = m.partition(" ")
        built.append(a + b)
    tokens = ["<|bos|>"] + base + built
    types = [TOKEN_CONTROL] + [TOKEN_NORMAL] * (len(tokens) - 1)
    return BPETokenizer(tokens, merges, types, bos_id=0, eos_id=0)


def test_bpe_merge_ranks():
    tok = _bpe_vocab()
    ids = tok.encode("the ab", add_bos=False)
    # "the" splits as "t h e" -> rank0 can't apply (no leading space);
    # "h e"->"he" (rank 1) then no "t he" merge exists -> ["t", "he"];
    # " ab" -> "Ġ ab" (rank 4) -> ["Ġab"]
    assert [tok.tokens[i] for i in ids] == ["t", "he", "Ġab"]
    assert tok.decode(ids) == "the ab"


def test_bpe_space_prefix_merges():
    tok = _bpe_vocab()
    ids = tok.encode(" the ab", add_bos=False)
    # " the" -> "Ġt"+"he" -> "Ġthe"; " ab" -> "Ġab"; NOT the cross-word
    # "ĠtheĠab" merge (pretokenizer splits words first)
    assert [tok.tokens[i] for i in ids] == ["Ġthe", "Ġab"]
    assert tok.decode(ids) == " the ab"


def test_bpe_utf8_roundtrip():
    tok = _bpe_vocab()
    for text in ("hello", "a€b c", "  x", "1234 ab"):
        ids = tok.encode(text, add_bos=False)
        assert tok.decode(ids) == text, text


def test_bpe_factory_and_bos():
    from quant_gemm_tpu.models.tokenizer import tokenizer_from_gguf, _B2U

    base = [_B2U[b] for b in range(256)]
    md = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.pre": "llama3",
        "tokenizer.ggml.tokens": ["<|bos|>"] + base,
        "tokenizer.ggml.merges": [],
        "tokenizer.ggml.token_type": [TOKEN_CONTROL] + [TOKEN_NORMAL] * 256,
        "tokenizer.ggml.bos_token_id": 0,
    }
    tok = tokenizer_from_gguf(md)
    ids = tok.encode("ab")
    assert ids[0] == 0 and len(ids) == 3  # bos + 'a' + 'b'
    assert tok.decode(ids) == "ab"


def test_chat_template_render():
    """tokenizer.chat_template renders through Jinja with bos/eos bound."""
    from quant_gemm_tpu.models.tokenizer import render_chat

    md = {
        "tokenizer.chat_template": (
            "{{ bos_token }}{% for m in messages %}"
            "[{{ m.role }}]{{ m.content }}[/{{ m.role }}]{% endfor %}"
            "{% if add_generation_prompt %}[assistant]{% endif %}"
        ),
        "tokenizer.ggml.tokens": ["<unk>", "<s>", "</s>"],
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }
    out = render_chat(md, [{"role": "user", "content": "hi"}])
    assert out == "<s>[user]hi[/user][assistant]"
    with pytest.raises(ValueError, match="chat_template"):
        render_chat({}, [])


def test_continuation_decode_keeps_leading_space():
    """Decoding prompt and continuation ids TOGETHER must preserve the
    word boundary (the space strip applies only to the text-initial
    add_space_prefix marker)."""
    tok = _vocab()
    prompt = tok.encode("the ab")
    cont = tok.encode("the ab", add_bos=False)  # e.g. generated ids
    assert tok.decode(list(prompt) + list(cont)) == "the ab the ab"


def test_encode_with_specials_maps_control_tokens():
    """Chat-template output re-tokenizes with special tokens mapped to
    their single ids — no byte-fallback mangling, no extra BOS."""
    from quant_gemm_tpu.models.tokenizer import encode_with_specials

    tok = _vocab()
    text = "<s>ab</s><s>the"
    ids = encode_with_specials(tok, text)
    names = [tok.tokens[i] for i in ids]
    assert names == ["<s>", "▁ab", "</s>", "<s>", "▁the"]
    assert ids.count(tok.bos_id) == 2  # exactly the template's, no extra


def test_spm_heap_merge_matches_linear_scan():
    """The O(n log n) heap merge must produce the same segmentation as a
    brute-force best-scan (same score-then-position greedy order)."""
    tok = _vocab()

    def brute(text):
        s = text.replace(" ", "▁")
        if not s.startswith("▁"):
            s = "▁" + s
        syms = list(s)
        while len(syms) > 1:
            best, best_i = None, -1
            for i in range(len(syms) - 1):
                tid = tok.vocab.get(syms[i] + syms[i + 1])
                if tid is not None and (best is None or tok.scores[tid] > best):
                    best, best_i = tok.scores[tid], i
            if best is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    rng = np.random.default_rng(0)
    alphabet = "abcthe "
    for _ in range(50):
        text = "".join(rng.choice(list(alphabet), size=rng.integers(1, 30)))
        ids = tok.encode(text, add_bos=False)
        want = []
        for sym in brute(text):
            tid = tok.vocab.get(sym)
            if tid is not None:
                want.append(tid)
            else:
                want.extend(tok.byte_tokens.get(b, tok.unk_id)
                            for b in sym.encode("utf-8"))
        assert ids == want, (text, ids, want)


def test_encode_with_specials_matches_user_defined_tokens():
    """GGUFs often type chat markers (<|im_start|>) as USER_DEFINED (4)
    rather than CONTROL; llama.cpp's tokenizer_st_partition matches
    CONTROL | USER_DEFINED | UNKNOWN — so must we."""
    from quant_gemm_tpu.models.tokenizer import (
        TOKEN_USER_DEFINED, encode_with_specials,
    )

    tok = _vocab()
    tok.tokens.append("<|im_start|>")
    tok.token_types.append(TOKEN_USER_DEFINED)
    tok.scores.append(0.0)
    ud_id = len(tok.tokens) - 1
    ids = encode_with_specials(tok, "<|im_start|>ab")
    assert ids[0] == ud_id
    assert [tok.tokens[i] for i in ids] == ["<|im_start|>", "▁ab"]
