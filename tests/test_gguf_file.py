"""GGUF container round-trip tests (real-weights boundary)."""

import numpy as np
import pytest

from quant_gemm_tpu.formats import gguf_file, numpy_ref
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.harness.metrics import ErrorMetrics
from quant_gemm_tpu.ref import gemm as refg


def test_roundtrip_all_formats(tmp_path):
    x = datagen.normal((8, 256), seed=1)
    tensors = {"f32.weight": np.asarray(x, np.float32),
               "f16.weight": np.asarray(x, np.float16)}
    for fmt, qfn in numpy_ref.QUANTIZE.items():
        tensors[f"{fmt}.weight"] = qfn(x)
    meta = {"general.architecture": "llama", "llama.block_count": 2,
            "test.flag": True, "test.scale": 1.5}
    p = tmp_path / "model.gguf"
    gguf_file.write_gguf(p, tensors, meta)

    g = gguf_file.GGUFFile(p)
    assert g.metadata["general.architecture"] == "llama"
    assert g.metadata["llama.block_count"] == 2
    assert g.metadata["test.flag"] is True
    assert g.metadata["test.scale"] == 1.5
    assert set(g.tensors) == set(tensors)

    np.testing.assert_array_equal(g.load("f32.weight"), tensors["f32.weight"])
    np.testing.assert_array_equal(g.load("f16.weight"), tensors["f16.weight"])
    for fmt in numpy_ref.QUANTIZE:
        t = g.load(f"{fmt}.weight")
        for f, a, b in zip(t._fields, t, tensors[f"{fmt}.weight"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"{fmt}.{f}")


def test_gguf_weights_through_gemm(tmp_path):
    """End-to-end: write q4_0 weights to GGUF, load, run the kernel ladder."""
    a = datagen.normal((2, 512), seed=2)
    w = datagen.normal((128, 512), seed=3)
    w_q = numpy_ref.quantize_q4_0(w)
    p = tmp_path / "w.gguf"
    gguf_file.write_gguf(p, {"blk.0.attn_q.weight": w_q})

    loaded = gguf_file.GGUFFile(p).load("blk.0.attn_q.weight")
    from quant_gemm_tpu.kernels import KERNELS

    import jax.numpy as jnp

    out = KERNELS["pallas_f32"](loaded, jnp.asarray(a))
    m = ErrorMetrics.compute(out, refg.gemm_wxa16(a, w_q))
    assert m.nmse < 1e-12, m


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\0" * 64)
    with pytest.raises(ValueError, match="magic"):
        gguf_file.GGUFFile(p)


def test_tensor_nbytes():
    assert gguf_file.tensor_nbytes("q4_0", 4096) == 4096 // 32 * 18
    assert gguf_file.tensor_nbytes("q8_1", 64) == 2 * 36
    assert gguf_file.tensor_nbytes("f32", 10) == 40


def test_mixed_int_float_array_written_as_f32(tmp_path):
    """A scores list whose FIRST element happens to be an int (e.g.
    [0, 0.5, ...]) must still be written as an f32 array — inferring the
    element type from v[0] alone silently truncated the float entries."""
    path = tmp_path / "meta.gguf"
    gguf_file.write_gguf(
        path, {}, metadata={"tokenizer.ggml.scores": [0, 0.5, -1.25]}
    )
    meta = gguf_file.GGUFFile(path).metadata
    assert meta["tokenizer.ggml.scores"] == [0.0, 0.5, -1.25]
