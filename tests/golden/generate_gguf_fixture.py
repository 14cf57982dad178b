"""Generate a llama.cpp-convention GGUF fixture this repo's code did NOT write.

VERDICT r2 item 6: every GGUF the repo reads was written by its own
``formats/gguf_file.py``; with zero egress and no llama.cpp binary in the
image, the strongest available independence is this generator — a
self-contained byte-level GGUF v3 writer + llama.cpp-reference-semantics
quantizers implemented from the public spec with plain ``struct``/numpy,
sharing NO code with ``quant_gemm_tpu`` (the same recorded-artifact pattern
as generate_golden.py).  The tokenizer tables come from a REAL independent
implementation: HuggingFace ``tokenizers`` trains a byte-level BPE on a
fixed corpus (the same library llama.cpp's convert scripts consume), and
its vocab/merges are embedded exactly as convert_hf_to_gguf.py embeds them.

The emitted model is a 2-layer Llama in the Q4_K_M mixing pattern
(llama.cpp llama_model_quantize: most tensors q4_K, ``output.weight`` and
one ``attn_v`` q6_K), with f32 norms, a ``rope_freqs.weight`` divisor
tensor (Llama-3.1 convention), chat template, and USER_DEFINED special
tokens — the full surface tests/test_gguf_interop.py drives end to end.

Formats implemented here from the spec (not from the repo):

* GGUF v3 container: magic/version/counts, kv types (u32=4, f32=6, bool=7,
  str=8, array=9, i32=5), tensor infos with REVERSED dims (ne[0]=K),
  32-byte-aligned data section.
* block_q4_K (144 B / 256 elems): f16 d, dmin; 12 B of 6-bit
  (scale, min) pairs packed per get_scale_min_k4; qs with the per-64
  low/high-nibble interleave.  Sub-block (scale, min) from a faithful
  scalar make_qkx2_quants (weighted LS refit over 20 iscale candidates,
  rmin=-1, rdelta=0.1 — quantize_row_q4_K_ref's parameters).
* block_q6_K (210 B / 256 elems): ql[128]/qh[64] packing per
  dequantize_row_q6_K's segment structure, per-16 int8 scales, f16 d.

Run: ``python tests/golden/generate_gguf_fixture.py`` (writes
``tiny_llama_q4km.gguf`` next to itself).  Deterministic: fixed corpus,
seeded weights, RAYON_NUM_THREADS=1.
"""

from __future__ import annotations

import json
import os
import pathlib
import struct

import numpy as np

os.environ.setdefault("RAYON_NUM_THREADS", "1")

HERE = pathlib.Path(__file__).parent
OUT = HERE / "tiny_llama_q4km.gguf"

# -- model shape -------------------------------------------------------------

DIM = 256
N_LAYERS = 2
N_HEADS = 4
N_KV_HEADS = 2
HEAD_DIM = DIM // N_HEADS
D_FF = 256
MAX_SEQ = 128
ROPE_BASE = 500000.0  # llama-3 family convention
EPS = 1e-5

# ggml_type ids (public ggml enum)
T_F32, T_Q4_K, T_Q6_K = 0, 12, 14

ALIGN = 32


def f16(x) -> np.float16:
    return np.float16(x)


# -- llama.cpp-semantics quantizers (independent, scalar-per-block) ----------


def make_qkx2(x: np.ndarray, nmax: int, rmin: float, rdelta: float,
              nstep: int) -> tuple[float, float]:
    """(scale, min_pos) for one 32-element sub-block, make_qkx2_quants
    semantics with use_mad=false and av_x+|x| importance weights."""
    x = x.astype(np.float32)
    w = np.sqrt(float((x * x).mean())) + np.abs(x)
    mn = min(float(x.min()), 0.0)
    mx = float(x.max())
    if mx == mn:
        return 0.0, -mn
    sum_w = float(w.sum())
    sum_x = float((w * x).sum())
    span = mx - mn
    l0 = np.clip(np.floor(nmax / span * (x - mn) + 0.5), 0, nmax)
    best_scale, best_min = span / nmax, mn
    r0 = best_scale * l0 + mn - x
    best_err = float((w * r0 * r0).sum())
    for s in range(nstep + 1):
        isc = (rmin + rdelta * s + nmax) / span
        l = np.clip(np.floor(isc * (x - mn) + 0.5), 0, nmax)
        sl = float((w * l).sum())
        sl2 = float((w * l * l).sum())
        sxl = float((w * l * x).sum())
        det = sum_w * sl2 - sl * sl
        if det <= 0:
            continue
        ts = (sum_w * sxl - sum_x * sl) / det
        tm = (sl2 * sum_x - sl * sxl) / det
        if tm > 0:
            tm = 0.0
            ts = sxl / sl2 if sl2 > 0 else ts
        r = ts * l + tm - x
        err = float((w * r * r).sum())
        if err < best_err:
            best_err, best_scale, best_min = err, ts, tm
    return best_scale, -best_min


def pack_scale_min_k4(ls: np.ndarray, lm: np.ndarray) -> bytes:
    """8 pairs of 6-bit (scale, min) -> 12 bytes (get_scale_min_k4 inverse)."""
    b = bytearray(12)
    for j in range(4):
        b[j] = (int(ls[j]) & 63) | ((int(ls[j + 4]) >> 4) << 6)
        b[j + 4] = (int(lm[j]) & 63) | ((int(lm[j + 4]) >> 4) << 6)
        b[j + 8] = (int(ls[j + 4]) & 0xF) | ((int(lm[j + 4]) & 0xF) << 4)
    return bytes(b)


def quantize_q4_k_bytes(x: np.ndarray) -> bytes:
    """[N, K] float -> block_q4_K wire bytes (K % 256 == 0)."""
    n, k = x.shape
    assert k % 256 == 0, k
    out = bytearray()
    for r in range(n):
        for sb in range(k // 256):
            xb = x[r, sb * 256:(sb + 1) * 256].astype(np.float32)
            scales = np.zeros(8, np.float32)
            mins = np.zeros(8, np.float32)
            for j in range(8):
                scales[j], mins[j] = make_qkx2(
                    xb[j * 32:(j + 1) * 32], 15, -1.0, 0.1, 20)
            max_s, max_m = float(scales.max()), float(mins.max())
            inv_s = 63.0 / max_s if max_s > 0 else 0.0
            inv_m = 63.0 / max_m if max_m > 0 else 0.0
            ls = np.clip(np.floor(inv_s * scales + 0.5), 0, 63).astype(np.uint8)
            lm = np.clip(np.floor(inv_m * mins + 0.5), 0, 63).astype(np.uint8)
            d = f16(max_s / 63.0)
            dmin = f16(max_m / 63.0)
            codes = np.zeros(256, np.uint8)
            for j in range(8):
                d_eff = float(np.float32(d)) * int(ls[j])
                if d_eff <= 0:
                    continue
                dm = float(np.float32(dmin)) * int(lm[j])
                q = np.floor((xb[j * 32:(j + 1) * 32] + dm) / d_eff + 0.5)
                codes[j * 32:(j + 1) * 32] = np.clip(q, 0, 15)
            qs = bytearray(128)
            for g in range(4):  # per-64 interleave
                for l in range(32):
                    qs[g * 32 + l] = (int(codes[g * 64 + l])
                                      | (int(codes[g * 64 + 32 + l]) << 4))
            out += np.asarray([d, dmin], "<f2").tobytes()
            out += pack_scale_min_k4(ls, lm)
            out += bytes(qs)
    return bytes(out)


def quantize_q6_k_bytes(x: np.ndarray) -> bytes:
    """[N, K] float -> block_q6_K wire bytes (simple per-16 amax encoder,
    exact dequantize_row_q6_K layout: x = d * sc[i16] * (q - 32))."""
    n, k = x.shape
    assert k % 256 == 0, k
    out = bytearray()
    for r in range(n):
        for sb in range(k // 256):
            xb = x[r, sb * 256:(sb + 1) * 256].astype(np.float32)
            sub = xb.reshape(16, 16)
            sc_f = np.abs(sub).max(axis=1) / 31.0
            max_sc = float(sc_f.max())
            d = f16(max_sc / 127.0) if max_sc > 0 else f16(0.0)
            d32 = float(np.float32(d))
            if d32 > 0:
                scales = np.clip(np.floor(sc_f / d32 + 0.5), -128, 127)
            else:
                scales = np.zeros(16)
            scales = scales.astype(np.int8)
            eff = d32 * scales.astype(np.float32)
            safe = np.where(eff != 0, eff, 1.0)
            q = np.clip(np.floor(sub / safe[:, None] + 0.5), -32, 31)
            q = np.where(eff[:, None] != 0, q, 0).astype(np.int32) + 32
            codes = q.reshape(256)
            ql = bytearray(128)
            qh = bytearray(64)
            for half in range(2):
                base = half * 128
                c = [codes[base + seg * 32: base + (seg + 1) * 32]
                     for seg in range(4)]
                for l in range(32):
                    ql[half * 64 + l] = (int(c[0][l]) & 0xF) | ((int(c[2][l]) & 0xF) << 4)
                    ql[half * 64 + 32 + l] = (int(c[1][l]) & 0xF) | ((int(c[3][l]) & 0xF) << 4)
                    qh[half * 32 + l] = ((int(c[0][l]) >> 4)
                                         | ((int(c[1][l]) >> 4) << 2)
                                         | ((int(c[2][l]) >> 4) << 4)
                                         | ((int(c[3][l]) >> 4) << 6))
            out += bytes(ql) + bytes(qh)
            out += scales.tobytes()
            out += np.asarray([d], "<f2").tobytes()
    return bytes(out)


# -- tokenizer (HF tokenizers -> GGUF tables, the convert.py flow) -----------

SPECIALS = ["<|begin_of_text|>", "<|end_of_text|>", "<|user|>",
            "<|assistant|>", "<|eot|>"]
# llama_token_type: CONTROL=3 for bos/eos, USER_DEFINED=4 for template
# markers (exercises the tokenizer_st_partition path on type-4 specials)
SPECIAL_TYPES = [3, 3, 4, 4, 4]

CORPUS = [
    "hello world, the quick brown fox jumps over the lazy dog",
    "the rain in spain stays mainly in the plain",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz, judge my vow",
    "import numpy as np  # matrix multiply kernels",
    "tokens = tokenizer.encode(text)",
    "Hallo Welt: Grüße aus München, naïve café",
    "日本語のテキストです。東京タワー。",
    "числа: один два три",
    "emoji test 🤖🚀 done",
    "numbers 123 456.789 and   spaced    words",
    "can't won't shouldn't it's",
] * 4


def train_bpe():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(
        add_prefix_space=False, use_regex=True)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=256 + len(SPECIALS) + 64,
        special_tokens=SPECIALS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)
    vocab = tok.get_vocab()
    tokens = [None] * len(vocab)
    for t, i in vocab.items():
        tokens[i] = t
    merges = json.loads(tok.to_str())["model"]["merges"]
    merges = [" ".join(m) if isinstance(m, (list, tuple)) else m
              for m in merges]
    types = [1] * len(tokens)
    for i, tt in enumerate(SPECIAL_TYPES):
        types[i] = tt
    return tok, tokens, merges, types


CHAT_TEMPLATE = (
    "{%- for m in messages -%}"
    "<|user|>\n{{ m['content'] }}<|eot|>"
    "{%- endfor -%}"
    "<|assistant|>\n"
)

# -- GGUF v3 writer (independent, struct-based) ------------------------------


def _kv_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack("<Q", len(b)) + b


def _kv(key: str, vtype: int, payload: bytes) -> bytes:
    return _kv_str(key) + struct.pack("<I", vtype) + payload


def kv_u32(key, v):
    return _kv(key, 4, struct.pack("<I", int(v)))


def kv_f32(key, v):
    return _kv(key, 6, struct.pack("<f", float(v)))


def kv_bool(key, v):
    return _kv(key, 7, struct.pack("<?", bool(v)))


def kv_string(key, v):
    return _kv(key, 8, _kv_str(v))


def kv_str_array(key, vals):
    body = struct.pack("<IQ", 8, len(vals)) + b"".join(_kv_str(v) for v in vals)
    return _kv(key, 9, body)


def kv_i32_array(key, vals):
    body = struct.pack("<IQ", 5, len(vals)) + struct.pack(
        f"<{len(vals)}i", *vals)
    return _kv(key, 9, body)


def write_gguf_v3(path, kvs: list[bytes], tensors: list[tuple]) -> None:
    """tensors: (name, shape_NK, ggml_type, data_bytes)."""
    with open(path, "wb") as f:
        f.write(b"GGUF")
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<QQ", len(tensors), len(kvs)))
        for kv in kvs:
            f.write(kv)
        offset = 0
        offsets = []
        for name, shape, ttype, data in tensors:
            f.write(_kv_str(name))
            ne = tuple(reversed(shape))  # ne[0] = innermost (K)
            f.write(struct.pack("<I", len(ne)))
            f.write(struct.pack(f"<{len(ne)}Q", *ne))
            f.write(struct.pack("<IQ", ttype, offset))
            offsets.append(offset)
            offset += (len(data) + ALIGN - 1) // ALIGN * ALIGN
        pos = f.tell()
        f.write(b"\0" * ((pos + ALIGN - 1) // ALIGN * ALIGN - pos))
        for (_, _, _, data), off in zip(tensors, offsets):
            pad = (len(data) + ALIGN - 1) // ALIGN * ALIGN - len(data)
            f.write(data)
            f.write(b"\0" * pad)


# -- model assembly -----------------------------------------------------------


def build(path=OUT) -> None:
    tok, tokens, merges, types = train_bpe()
    vocab = len(tokens)
    rng = np.random.default_rng(20260818)

    def w(n, k, scale=0.05):
        return (rng.standard_normal((n, k)) * scale).astype(np.float32)

    tensors: list[tuple] = []

    def add_q4k(name, arr):
        tensors.append((name, arr.shape, T_Q4_K, quantize_q4_k_bytes(arr)))

    def add_q6k(name, arr):
        tensors.append((name, arr.shape, T_Q6_K, quantize_q6_k_bytes(arr)))

    def add_f32(name, arr):
        tensors.append((name, arr.shape, T_F32,
                        np.ascontiguousarray(arr, "<f4").tobytes()))

    add_q4k("token_embd.weight", w(vocab, DIM, 0.02))
    for i in range(N_LAYERS):
        add_f32(f"blk.{i}.attn_norm.weight", np.ones(DIM, np.float32))
        add_q4k(f"blk.{i}.attn_q.weight", w(N_HEADS * HEAD_DIM, DIM))
        add_q4k(f"blk.{i}.attn_k.weight", w(N_KV_HEADS * HEAD_DIM, DIM))
        if i == 1:  # Q4_K_M mixes q6_K into attn_v
            add_q6k(f"blk.{i}.attn_v.weight", w(N_KV_HEADS * HEAD_DIM, DIM))
        else:
            add_q4k(f"blk.{i}.attn_v.weight", w(N_KV_HEADS * HEAD_DIM, DIM))
        add_q4k(f"blk.{i}.attn_output.weight", w(DIM, N_HEADS * HEAD_DIM))
        add_f32(f"blk.{i}.ffn_norm.weight", np.ones(DIM, np.float32))
        add_q4k(f"blk.{i}.ffn_gate.weight", w(D_FF, DIM))
        add_q4k(f"blk.{i}.ffn_up.weight", w(D_FF, DIM))
        add_q4k(f"blk.{i}.ffn_down.weight", w(DIM, D_FF))
    add_f32("output_norm.weight", np.ones(DIM, np.float32))
    add_q6k("output.weight", w(vocab, DIM, 0.02))
    # Llama-3.1-style baked rope frequency divisors (mild long-context curve)
    rope_factors = np.linspace(1.0, 4.0, HEAD_DIM // 2).astype(np.float32)
    add_f32("rope_freqs.weight", rope_factors)

    kvs = [
        kv_string("general.architecture", "llama"),
        kv_string("general.name", "tiny-llama-q4km-fixture"),
        kv_u32("general.alignment", ALIGN),
        kv_u32("llama.block_count", N_LAYERS),
        kv_u32("llama.context_length", MAX_SEQ),
        kv_u32("llama.embedding_length", DIM),
        kv_u32("llama.feed_forward_length", D_FF),
        kv_u32("llama.attention.head_count", N_HEADS),
        kv_u32("llama.attention.head_count_kv", N_KV_HEADS),
        kv_f32("llama.rope.freq_base", ROPE_BASE),
        kv_f32("llama.attention.layer_norm_rms_epsilon", EPS),
        kv_u32("llama.vocab_size", vocab),
        kv_string("tokenizer.ggml.model", "gpt2"),
        kv_string("tokenizer.ggml.pre", "gpt2"),
        kv_str_array("tokenizer.ggml.tokens", tokens),
        kv_i32_array("tokenizer.ggml.token_type", types),
        kv_str_array("tokenizer.ggml.merges", merges),
        kv_u32("tokenizer.ggml.bos_token_id", 0),
        kv_u32("tokenizer.ggml.eos_token_id", 1),
        kv_bool("tokenizer.ggml.add_bos_token", True),
        kv_string("tokenizer.chat_template", CHAT_TEMPLATE),
    ]
    write_gguf_v3(path, kvs, tensors)


if __name__ == "__main__":
    build()
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")
