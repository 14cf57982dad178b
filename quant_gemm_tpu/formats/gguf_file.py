"""GGUF container file reader/writer (v3).

The reference consumes real GGUF weights only through llama.cpp's own loader
(docs/llama-cpp-integration/test-kernel-real-data.cu); this module gives the
TPU framework a first-class boundary: read a ``.gguf`` file, get metadata and
quantized tensors as SoA planar containers ready for ``kernels.prepare``.

Implements the GGUF v3 layout (little-endian):

    magic 'GGUF' | version u32 | n_tensors u64 | n_kv u64
    kv*: key(str) type(u32) value          (str = u64 len + bytes)
    tensor-info*: name(str) n_dims(u32) dims(u64*) ggml_type(u32) offset(u64)
    padding to `general.alignment` (default 32) | tensor data blob

ggml_type ids as in the reference's QuantType enum (compat/ggml_types.h:199):
F32=0, F16=1, Q4_0=2, Q4_1=3, Q5_0=6, Q5_1=7, Q8_0=8, Q8_1=9.

A minimal writer is included so tests can round-trip real container files
without shipping binary fixtures.
"""

from __future__ import annotations

import struct
from typing import Any, BinaryIO

import numpy as np

from . import gguf as gguf_blocks
from .blocks import QK, SPECS

MAGIC = b"GGUF"
VERSION = 3
DEFAULT_ALIGNMENT = 32

GGML_TYPES = {0: "f32", 1: "f16", 2: "q4_0", 3: "q4_1", 6: "q5_0", 7: "q5_1",
              8: "q8_0", 9: "q8_1", 10: "q2_K", 11: "q3_K", 12: "q4_K",
              13: "q5_K", 14: "q6_K", 20: "iq4_nl", 23: "iq4_xs"}
GGML_IDS = {v: k for k, v in GGML_TYPES.items()}

# GGUF metadata value types
_KV_FMT = {0: "<B", 1: "<b", 2: "<H", 3: "<h", 4: "<I", 5: "<i", 6: "<f",
           7: "<?", 10: "<Q", 11: "<q", 12: "<d"}
_KV_STRING = 8
_KV_ARRAY = 9


def _read_str(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8")


def _write_str(f: BinaryIO, s: str) -> None:
    b = s.encode("utf-8")
    f.write(struct.pack("<Q", len(b)))
    f.write(b)


def _read_value(f: BinaryIO, vtype: int) -> Any:
    if vtype in _KV_FMT:
        fmt = _KV_FMT[vtype]
        return struct.unpack(fmt, f.read(struct.calcsize(fmt)))[0]
    if vtype == _KV_STRING:
        return _read_str(f)
    if vtype == _KV_ARRAY:
        (etype,) = struct.unpack("<I", f.read(4))
        (n,) = struct.unpack("<Q", f.read(8))
        return [_read_value(f, etype) for _ in range(n)]
    raise ValueError(f"unknown GGUF kv type {vtype}")


def _kv_type_of(v: Any) -> int:
    if isinstance(v, bool):
        return 7
    if isinstance(v, int):
        return 11  # i64
    if isinstance(v, float):
        return 12  # f64
    if isinstance(v, str):
        return _KV_STRING
    if isinstance(v, (list, tuple)):
        return _KV_ARRAY
    raise TypeError(type(v))


def _write_value(f: BinaryIO, v: Any) -> None:
    t = _kv_type_of(v)
    if t == _KV_STRING:
        _write_str(f, v)
    elif t == _KV_ARRAY:
        # homogeneous array (e.g. tokenizer.ggml.tokens/scores/token_type);
        # llama.cpp writes f32 scores and i32 token types.  numpy scalars
        # coerce; empty arrays write as i32[] (element type is moot)
        if len(v) == 0:
            etype = 5
        elif any(isinstance(e, str) for e in v):
            if not all(isinstance(e, str) for e in v):
                raise TypeError(f"mixed str/non-str metadata array: {v!r}")
            etype = _KV_STRING
        elif any(isinstance(e, (float, np.floating)) for e in v):
            # element type must cover EVERY entry: scores like [0, 0.5]
            # start with an int but must still be written as f32
            etype = 6  # f32 (llama.cpp convention for scores)
        else:
            etype = 5  # i32 (bools coerce, matching llama.cpp readers)
        f.write(struct.pack("<I", etype))
        f.write(struct.pack("<Q", len(v)))
        for e in v:
            if etype == _KV_STRING:
                _write_str(f, e)
            elif etype == 6:
                f.write(struct.pack("<f", float(e)))
            else:
                f.write(struct.pack("<i", int(e)))
    else:
        f.write(struct.pack(_KV_FMT[t], v))


def tensor_nbytes(qtype: str, n_elems: int) -> int:
    if qtype == "f32":
        return n_elems * 4
    if qtype == "f16":
        return n_elems * 2
    if qtype == "iq4_nl":
        from . import kquants

        assert n_elems % QK == 0
        return n_elems // QK * kquants.IQ4_NL_BLOCK_BYTES
    if qtype == "iq4_xs":
        from . import kquants

        assert n_elems % kquants.QK_K == 0
        return n_elems // kquants.QK_K * kquants.IQ4_XS_BLOCK_BYTES
    if qtype.endswith("_K"):
        from . import kquants

        per_block = {"q2_K": kquants.QK2_BLOCK_BYTES,
                     "q3_K": kquants.QK3_BLOCK_BYTES,
                     "q4_K": kquants.BLOCK_BYTES,
                     "q5_K": kquants.QK5_BLOCK_BYTES,
                     "q6_K": kquants.QK6_BLOCK_BYTES}[qtype]
        assert n_elems % kquants.QK_K == 0
        return n_elems // kquants.QK_K * per_block
    spec = SPECS[qtype]
    assert n_elems % QK == 0
    return n_elems // QK * spec.block_bytes


class GGUFFile:
    """Parsed GGUF container: ``metadata`` dict + lazy tensor access."""

    def __init__(self, path):
        self.path = path
        self.metadata: dict[str, Any] = {}
        self.tensors: dict[str, dict] = {}  # name -> {shape, qtype, offset}
        with open(path, "rb") as f:
            magic = f.read(4)
            if magic != MAGIC:
                raise ValueError(f"not a GGUF file (magic {magic!r})")
            version, = struct.unpack("<I", f.read(4))
            if version not in (2, 3):
                raise ValueError(f"unsupported GGUF version {version}")
            n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
            for _ in range(n_kv):
                key = _read_str(f)
                (vtype,) = struct.unpack("<I", f.read(4))
                self.metadata[key] = _read_value(f, vtype)
            for _ in range(n_tensors):
                name = _read_str(f)
                (nd,) = struct.unpack("<I", f.read(4))
                dims = struct.unpack(f"<{nd}Q", f.read(8 * nd))
                ggml_type, offset = struct.unpack("<IQ", f.read(12))
                if ggml_type not in GGML_TYPES:
                    raise ValueError(f"unsupported ggml type {ggml_type} for {name}")
                # GGUF dims are reversed (ne[0] = innermost = K)
                shape = tuple(reversed(dims))
                self.tensors[name] = {
                    "shape": shape,
                    "qtype": GGML_TYPES[ggml_type],
                    "offset": offset,
                }
            align = int(self.metadata.get("general.alignment", DEFAULT_ALIGNMENT))
            pos = f.tell()
            self._data_start = (pos + align - 1) // align * align

    def close(self) -> None:
        """Release the mmap (loaded containers COPY out of it during
        decode; only ``raw()`` views alias the file)."""
        mm = self.__dict__.pop("_mm", None)
        if mm is not None:
            del mm

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def raw(self, name: str) -> np.ndarray:
        """Zero-copy view of one tensor's payload bytes (mmap-backed, so
        multi-GB model files page in lazily instead of being read whole).
        The view ALIASES the file until :meth:`close`; ``load()`` decodes
        into fresh arrays, so containers outlive the mapping."""
        info = self.tensors[name]
        n_elems = int(np.prod(info["shape"]))
        nbytes = tensor_nbytes(info["qtype"], n_elems)
        if not hasattr(self, "_mm"):
            self._mm = np.memmap(self.path, np.uint8, mode="r")
        off = self._data_start + info["offset"]
        return np.asarray(self._mm[off : off + nbytes])

    def load(self, name: str):
        """Return a SoA container (quantized) or float ndarray (f32/f16)."""
        info = self.tensors[name]
        shape = info["shape"]
        qt = info["qtype"]
        buf = self.raw(name)
        if qt == "f32":
            return buf.view(np.float32).reshape(shape)
        if qt == "f16":
            return buf.view(np.float16).reshape(shape)
        k = shape[-1]
        lead = shape[:-1]
        if qt == "q4_K":
            from . import kquants

            aos = buf.reshape(lead + (k // kquants.QK_K, kquants.BLOCK_BYTES))
            return kquants.from_bytes(aos)
        if qt == "q5_K":
            from . import kquants

            aos = buf.reshape(
                lead + (k // kquants.QK_K, kquants.QK5_BLOCK_BYTES)
            )
            return kquants.from_bytes_q5_k(aos)
        if qt == "q6_K":
            from . import kquants

            aos = buf.reshape(
                lead + (k // kquants.QK_K, kquants.QK6_BLOCK_BYTES)
            )
            return kquants.from_bytes_q6_k(aos)
        if qt == "iq4_nl":
            from . import kquants

            aos = buf.reshape(lead + (k // QK, kquants.IQ4_NL_BLOCK_BYTES))
            return kquants.from_bytes_iq4_nl(aos)
        if qt == "iq4_xs":
            from . import kquants

            aos = buf.reshape(
                lead + (k // kquants.QK_K, kquants.IQ4_XS_BLOCK_BYTES)
            )
            return kquants.from_bytes_iq4_xs(aos)
        if qt in ("q2_K", "q3_K"):
            from . import kquants

            per_block = {"q2_K": kquants.QK2_BLOCK_BYTES,
                         "q3_K": kquants.QK3_BLOCK_BYTES}[qt]
            decode = {"q2_K": kquants.from_bytes_q2_k,
                      "q3_K": kquants.from_bytes_q3_k}[qt]
            aos = buf.reshape(lead + (k // kquants.QK_K, per_block))
            return decode(aos)
        spec = SPECS[qt]
        aos = buf.reshape(lead + (k // QK, spec.block_bytes))
        return gguf_blocks.from_bytes(aos, qt)


class RawTensor:
    """Pre-serialized tensor payload for :func:`write_gguf` — carries ggml
    block bytes verbatim (e.g. q2_K/q3_K/q6_K data produced elsewhere)."""

    def __init__(self, qtype: str, shape: tuple, data: bytes):
        assert qtype in GGML_IDS, qtype
        n_elems = int(np.prod(shape))
        assert len(data) == tensor_nbytes(qtype, n_elems), (qtype, shape)
        self.qtype = qtype
        self.shape = tuple(shape)
        self.data = data


def write_gguf(path, tensors: dict, metadata: dict | None = None) -> None:
    """Write containers / float arrays to a GGUF v3 file.

    ``tensors``: {name: SoA container | float32/float16 ndarray | RawTensor}.
    """
    metadata = dict(metadata or {})
    metadata.setdefault("general.alignment", DEFAULT_ALIGNMENT)
    align = int(metadata["general.alignment"])

    blobs: list[tuple[str, tuple, str, bytes]] = []
    for name, t in tensors.items():
        if isinstance(t, RawTensor):
            blobs.append((name, t.shape, t.qtype, t.data))
        elif isinstance(t, np.ndarray):
            qt = {np.dtype(np.float32): "f32", np.dtype(np.float16): "f16"}[t.dtype]
            blobs.append((name, t.shape, qt, t.tobytes()))
        elif t.__class__.__name__ == "Q4_KTensor":
            from . import kquants

            aos = kquants.to_bytes(t)
            shape = aos.shape[:-2] + (aos.shape[-2] * kquants.QK_K,)
            blobs.append((name, shape, "q4_K", aos.tobytes()))
            continue
        elif t.__class__.__name__ == "Q5_KTensor":
            from . import kquants

            aos = kquants.to_bytes_q5_k(t)
            shape = aos.shape[:-2] + (aos.shape[-2] * kquants.QK_K,)
            blobs.append((name, shape, "q5_K", aos.tobytes()))
            continue
        elif t.__class__.__name__ in ("Q2_KTensor", "Q3_KTensor",
                                      "Q6_KTensor"):
            from . import kquants

            enc = {"Q2_KTensor": ("q2_K", kquants.to_bytes_q2_k),
                   "Q3_KTensor": ("q3_K", kquants.to_bytes_q3_k),
                   "Q6_KTensor": ("q6_K", kquants.to_bytes_q6_k)}
            qt, fn = enc[t.__class__.__name__]
            aos = fn(t)
            shape = aos.shape[:-2] + (aos.shape[-2] * kquants.QK_K,)
            blobs.append((name, shape, qt, aos.tobytes()))
            continue
        else:
            qt = t.spec.name
            aos = gguf_blocks.to_bytes(t)
            shape = aos.shape[:-2] + (aos.shape[-2] * QK,)
            blobs.append((name, shape, qt, aos.tobytes()))

    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", VERSION))
        f.write(struct.pack("<QQ", len(blobs), len(metadata)))
        for k, v in metadata.items():
            _write_str(f, k)
            f.write(struct.pack("<I", _kv_type_of(v)))
            _write_value(f, v)
        offset = 0
        offsets = []
        for name, shape, qt, data in blobs:
            _write_str(f, name)
            dims = tuple(reversed(shape))
            f.write(struct.pack("<I", len(dims)))
            f.write(struct.pack(f"<{len(dims)}Q", *dims))
            f.write(struct.pack("<IQ", GGML_IDS[qt], offset))
            offsets.append(offset)
            offset += (len(data) + align - 1) // align * align
        pos = f.tell()
        f.write(b"\0" * ((pos + align - 1) // align * align - pos))
        for (_, _, _, data), off in zip(blobs, offsets):
            start = f.tell()
            f.write(data)
            pad = (len(data) + align - 1) // align * align - len(data)
            f.write(b"\0" * pad)


__all__ = ["GGUFFile", "write_gguf", "RawTensor", "GGML_TYPES",
           "tensor_nbytes"]
