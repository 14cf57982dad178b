"""GBNF grammar-constrained sampling (llama.cpp --grammar / JSON mode)."""

import numpy as np
import pytest

from quant_gemm_tpu.formats.gguf_file import GGUFFile
from quant_gemm_tpu.models import grammar as G
from quant_gemm_tpu.models import tokenizer as toklib

import pathlib

FIXTURE = pathlib.Path(__file__).parent / "golden" / "tiny_llama_q4km.gguf"


# -- parser -------------------------------------------------------------------


def test_parse_basics():
    rules = G.parse_gbnf('root ::= "ab" | [0-9]+ | x\nx ::= "y"?')
    assert "root" in rules and "x" in rules
    assert len(rules["root"]) == 3


def test_parse_json_gbnf():
    rules = G.parse_gbnf(G.JSON_GBNF)
    for r in ("root", "object", "array", "string", "number", "value", "ws"):
        assert r in rules, r


def test_parse_errors():
    with pytest.raises(ValueError, match="root"):
        G.parse_gbnf('a ::= "x"')
    with pytest.raises(ValueError):
        G.parse_gbnf('root = "x"')


# -- matcher ------------------------------------------------------------------

JSON_CASES = [
    ("{}", True),
    ('{"a": 1}', True),
    ('{"a": [1, 2, {"b": null}], "c": "d"}', True),
    ('{"n": -1.5e3, "t": true}', True),
    ('{"u": "\\u00e9\\n"}', True),
    ("[1]", False),  # root is object
    ('{"a": }', False),
    ("{a: 1}", False),
    ('{"a": 1,}', False),
]


@pytest.mark.parametrize("text,want", JSON_CASES)
def test_json_matcher(text, want):
    m = G.GrammarMatcher(G.parse_gbnf(G.JSON_GBNF))
    got = m.advance(text) and m.can_finish
    assert got == want, (text, got)


def test_incremental_state():
    m = G.GrammarMatcher(G.parse_gbnf(G.JSON_GBNF))
    assert m.advance('{"key"')
    assert m.allows(":") and not m.allows("}")
    assert not m.can_finish
    assert m.advance(': "v"}')
    assert m.can_finish


def test_repetition_bounds():
    rules = G.parse_gbnf("root ::= [ab]{2,3}")
    for s, want in [("a", False), ("ab", True), ("aba", True),
                    ("abab", False)]:
        m = G.GrammarMatcher(rules)
        assert (m.advance(s) and m.can_finish) == want, s


def test_negated_class_and_any():
    rules = G.parse_gbnf('root ::= [^x] .')
    m = G.GrammarMatcher(rules)
    assert m.advance("aΩ") and m.can_finish
    m2 = G.GrammarMatcher(rules)
    assert not m2.advance("xa")


# -- sampler + serving integration --------------------------------------------


@pytest.fixture(scope="module")
def served():
    from quant_gemm_tpu.models import gguf_loader, serve

    gf = GGUFFile(FIXTURE)
    qparams, cfg = gguf_loader.load_llama(gf)
    tok = toklib.tokenizer_from_gguf(gf.metadata)
    return qparams, cfg, tok


def test_filter_logits_respects_state(served):
    _, _, tok = served
    gs = G.GrammarSampler('root ::= "hi"', tok, eos_id=tok.eos_id)
    logits = np.zeros(len(tok.tokens), np.float32)
    out = gs.filter_logits(logits)
    # EOS illegal before completion; some token starting "h" legal
    assert out[tok.eos_id] == -np.inf
    legal = [i for i in range(len(out)) if np.isfinite(out[i])]
    assert legal and all(tok.decode([i]).startswith("h") or
                         "hi".startswith(tok.decode([i])) for i in legal)


@pytest.mark.slow
def test_forced_string_generation(served):
    """A single-sentence grammar FORCES the output: whatever the model
    wants, constrained decoding must emit exactly 'hello world' then stop
    (EOS is only legal at the accept state)."""
    from quant_gemm_tpu.models import serve

    qparams, cfg, tok = served
    srv = serve.Server(qparams, cfg, n_slots=2, eos_id=tok.eos_id)
    gs = G.GrammarSampler('root ::= "hello world"', tok)
    rid = srv.submit(tok.encode("the"), max_new=24, grammar=gs)
    out = srv.run_until_done()[rid]
    body = [t for t in out if t != tok.eos_id]
    assert tok.decode(body) == "hello world"
    assert out[-1] == tok.eos_id  # stopped via grammar-legal EOS


@pytest.mark.slow
def test_json_mode_generation(served):
    """JSON grammar on the random-weight model: every emitted prefix is
    grammar-legal and an independent json.loads accepts the final text
    once the matcher reports completion."""
    import json as pyjson

    from quant_gemm_tpu.models import serve

    qparams, cfg, tok = served
    srv = serve.Server(qparams, cfg, n_slots=2, eos_id=tok.eos_id)
    gs = G.GrammarSampler(G.JSON_GBNF, tok)
    rid = srv.submit(tok.encode("data:"), max_new=24, grammar=gs, seed=7)
    out = srv.run_until_done()[rid]
    body = [t for t in out if t != tok.eos_id]
    text = tok.decode(body)
    check = G.GrammarMatcher(G.parse_gbnf(G.JSON_GBNF))
    assert check.advance(text), text
    if out and out[-1] == tok.eos_id:
        assert check.can_finish
        pyjson.loads(text)  # independent validator


def test_grammar_rejects_all_raises(served):
    _, _, tok = served
    gs = G.GrammarSampler('root ::= "\\uFFFF"', tok)  # unreachable char?
    logits = np.zeros(len(tok.tokens), np.float32)

    class R:
        rid = 0
        temperature = 0.0
        grammar = gs
        logit_bias = None
        repeat_penalty = 1.0
        min_p = 0.0
        top_k = 0
        top_p = 1.0

    from quant_gemm_tpu.models.serve import _grammar_sample

    try:
        tokid = _grammar_sample(logits, R())
        # if some byte-fallback token CAN express U+FFFF, accept that
        assert np.isfinite(gs.filter_logits(logits)[tokid])
    except ValueError as e:
        assert "grammar rejected" in str(e)


def test_partial_utf8_token_legality():
    """A lead-byte-only piece is legal ONLY when a completion could match
    the grammar (llama_grammar_match_partial_char semantics)."""
    rules = G.parse_gbnf('root ::= "é"')  # U+00E9 = 0xC3 0xA9
    m = G.GrammarMatcher(rules)
    assert m.allows(b"\xc3")  # could complete to é
    assert not m.allows(b"\xe3")  # 3-byte lead: cps >= 0x3000, never é
    assert m.advance(b"\xc3")
    assert not m.can_finish  # partial pending
    assert m.advance(b"\xa9")
    assert m.can_finish
    # ascii grammar rejects any multi-byte lead
    m2 = G.GrammarMatcher(G.parse_gbnf('root ::= [a-z]+'))
    assert not m2.allows(b"\xc3")


def test_left_recursion_raises():
    with pytest.raises(ValueError, match="LEFT-RECURSIVE|budget"):
        G.GrammarMatcher(G.parse_gbnf('root ::= root "x" | "y"'))


def test_piece_bytes_spm_space_and_byte_tokens():
    """piece_bytes must preserve the SPM leading-space marker and raw
    byte-fallback bytes that tok.decode([tid]) mangles."""
    from quant_gemm_tpu.models.tokenizer import SPMTokenizer

    tok = SPMTokenizer(
        ["<unk>", "<s>", "</s>", "▁world", "<0xC3>", "<0xA9>"],
        [0.0] * 6, [2, 3, 3, 1, 6, 6], bos_id=1, eos_id=2)
    assert G.piece_bytes(tok, 3) == b" world"  # space KEPT
    assert G.piece_bytes(tok, 4) == b"\xc3"  # raw byte, not U+FFFD
    assert G.piece_bytes(tok, 1) is None  # control token
    # the desync scenario: two '▁'-pieces must not concatenate
    # into one word under the grammar
    m = G.GrammarMatcher(G.parse_gbnf('root ::= [a-z]+'))
    assert m.advance(G.piece_bytes(tok, 3)[1:])  # 'world' alone ok
    m2 = G.GrammarMatcher(G.parse_gbnf('root ::= [a-z]+'))
    assert not m2.advance(G.piece_bytes(tok, 3))  # ' world' has a space
