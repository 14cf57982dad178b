"""SentencePiece-style (SPM) tokenizer from GGUF-embedded vocab.

llama.cpp models carry their tokenizer inside the GGUF
(``tokenizer.ggml.{model,tokens,scores,token_type,bos/eos_token_id}``);
its `llm_tokenizer_spm` greedily merges adjacent symbol pairs by vocab
score with byte fallback.  This is the pure-Python equivalent, so
``scripts/generate.py`` can run prompt -> text end to end from a single
.gguf file, like the reference ecosystem's ``main`` binary.

Scope: the "llama" (SPM) tokenizer family.  GPT-2-BPE vocabularies
(``tokenizer.ggml.model == "gpt2"``) use merge ranks instead of scores and
are refused loudly rather than mis-tokenized.
"""

from __future__ import annotations

from typing import Sequence

_SPACE = "▁"  # SentencePiece space marker

# tokenizer.ggml.token_type values (llama.cpp llama_token_type)
TOKEN_NORMAL = 1
TOKEN_UNKNOWN = 2
TOKEN_CONTROL = 3
TOKEN_BYTE = 6


class SPMTokenizer:
    def __init__(
        self,
        tokens: Sequence[str],
        scores: Sequence[float],
        token_types: Sequence[int] | None = None,
        bos_id: int = 1,
        eos_id: int = 2,
        unk_id: int = 0,
        add_space_prefix: bool = True,
    ):
        self.tokens = list(tokens)
        self.scores = list(scores)
        self.token_types = (
            list(token_types) if token_types is not None
            else [TOKEN_NORMAL] * len(tokens)
        )
        self.bos_id, self.eos_id, self.unk_id = bos_id, eos_id, unk_id
        self.add_space_prefix = add_space_prefix
        self.vocab = {t: i for i, t in enumerate(self.tokens)}
        # byte-fallback table: token "<0xAB>" (type BYTE) -> byte value
        self.byte_tokens = {}
        for i, (t, tt) in enumerate(zip(self.tokens, self.token_types)):
            if tt == TOKEN_BYTE and len(t) == 6 and t[:3] == "<0x":
                self.byte_tokens[int(t[3:5], 16)] = i

    @classmethod
    def from_gguf(cls, metadata: dict) -> "SPMTokenizer":
        model = metadata.get("tokenizer.ggml.model", "llama")
        if model not in ("llama", "spm"):
            raise ValueError(
                f"tokenizer.ggml.model={model!r}: only the SPM ('llama') "
                "family is implemented; BPE vocabularies need merge ranks"
            )
        tokens = metadata["tokenizer.ggml.tokens"]
        scores = metadata.get("tokenizer.ggml.scores", [0.0] * len(tokens))
        return cls(
            tokens,
            scores,
            metadata.get("tokenizer.ggml.token_type"),
            bos_id=int(metadata.get("tokenizer.ggml.bos_token_id", 1)),
            eos_id=int(metadata.get("tokenizer.ggml.eos_token_id", 2)),
            unk_id=int(metadata.get("tokenizer.ggml.unknown_token_id", 0)),
            add_space_prefix=bool(
                metadata.get("tokenizer.ggml.add_space_prefix", True)
            ),
        )

    # -- encode ------------------------------------------------------------

    def encode(self, text: str, add_bos: bool = True) -> list[int]:
        """SPM greedy merge: start from unicode characters, repeatedly merge
        the adjacent pair whose concatenation is the highest-scored vocab
        entry, then byte-fall-back any symbol not in the vocab."""
        s = text.replace(" ", _SPACE)
        if self.add_space_prefix and not s.startswith(_SPACE):
            s = _SPACE + s
        syms = list(s)
        while len(syms) > 1:
            best, best_i = None, -1
            for i in range(len(syms) - 1):
                tid = self.vocab.get(syms[i] + syms[i + 1])
                if tid is not None:
                    sc = self.scores[tid]
                    if best is None or sc > best:
                        best, best_i = sc, i
            if best is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        out = [self.bos_id] if add_bos else []
        for sym in syms:
            tid = self.vocab.get(sym)
            if tid is not None:
                out.append(tid)
                continue
            for b in sym.encode("utf-8"):  # byte fallback
                out.append(self.byte_tokens.get(b, self.unk_id))
        return out

    # -- decode ------------------------------------------------------------

    def decode(self, ids: Sequence[int]) -> str:
        """Token ids -> text: byte tokens collect into raw bytes, normal
        pieces concatenate with the space marker restored."""
        chunks: list[bytes] = []
        for tid in ids:
            if not 0 <= tid < len(self.tokens):
                continue
            tt = self.token_types[tid]
            if tt == TOKEN_CONTROL:
                continue  # <s>, </s>, ...
            t = self.tokens[tid]
            if tt == TOKEN_BYTE and len(t) == 6 and t[:3] == "<0x":
                chunks.append(bytes([int(t[3:5], 16)]))
            else:
                chunks.append(t.replace(_SPACE, " ").encode("utf-8"))
        text = b"".join(chunks).decode("utf-8", errors="replace")
        return text[1:] if text.startswith(" ") else text


__all__ = ["SPMTokenizer", "TOKEN_NORMAL", "TOKEN_UNKNOWN", "TOKEN_CONTROL",
           "TOKEN_BYTE"]
