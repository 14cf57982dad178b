"""ggml/llama.cpp adapter layer tests (reference llama_adapter.h +
compat/ggml_cuda_compat.cuh contract)."""

import struct

import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu import compat
from quant_gemm_tpu.formats import gguf, gguf_file, numpy_ref
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.harness.metrics import ErrorMetrics
from quant_gemm_tpu.ops import activations
from quant_gemm_tpu.ops.rope import rope_ref
from quant_gemm_tpu.ops.softmax import softmax as softmax_fn
from quant_gemm_tpu.ref import gemm as refg


@pytest.fixture(scope="module")
def gguf_path(tmp_path_factory):
    w = datagen.normal((128, 512), seed=3)
    path = tmp_path_factory.mktemp("gguf") / "adapter.gguf"
    gguf_file.write_gguf(
        path,
        {"blk.0.attn_q.weight": numpy_ref.quantize_q4_0(w),
         "blk.0.norm.weight": np.ones(512, np.float32)},
        metadata={"general.name": "adapter-test"},
    )
    return path, w


def test_tensor_view_ne_convention(gguf_path):
    path, w = gguf_path
    gf = gguf_file.GGUFFile(path)
    view = compat.tensor_view_from_gguf(gf, "blk.0.attn_q.weight")
    assert view.k == 512 and view.rows == 128  # ne[0]=K, ne[1]=rows
    soa = view.to_soa()
    np.testing.assert_allclose(
        numpy_ref.dequantize(soa), numpy_ref.dequantize(numpy_ref.quantize_q4_0(w))
    )


def test_gemm_from_ggml_auto_and_named(gguf_path):
    path, w = gguf_path
    gf = gguf_file.GGUFFile(path)
    view = compat.tensor_view_from_gguf(gf, "blk.0.attn_q.weight")
    a = datagen.normal((2, 512), seed=4)
    a_q = numpy_ref.quantize_q8_1(a)
    from quant_gemm_tpu.formats import jax_quant

    out = compat.gemm_from_ggml(view, jax_quant.device_put(a_q), kernel="auto")
    gold = refg.gemm_wxa8(numpy_ref.quantize_q4_0(w), a_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m  # decode regime -> exact kernel
    out2 = compat.gemm_from_ggml(view, jnp.asarray(a), kernel="xla_dequant")
    m2 = ErrorMetrics.compute(out2, refg.gemm_fp32(a, w))
    assert m2.nmse < 1.5e-2, m2


def test_ggml_ops_match_library_ops():
    x = jnp.asarray(datagen.normal((4, 64), seed=5))
    np.testing.assert_allclose(
        np.asarray(compat.ggml_op_silu(x)), np.asarray(activations.silu(x))
    )
    np.testing.assert_allclose(
        np.asarray(compat.ggml_op_gelu(x)),
        np.asarray(activations.gelu_quick(x)),
    )
    np.testing.assert_allclose(
        np.asarray(compat.ggml_op_soft_max(x, scale=0.5)),
        np.asarray(softmax_fn(x * 0.5)),
    )
    np.testing.assert_allclose(
        np.asarray(compat.ggml_op_add(x, x)), np.asarray(x + x)
    )


def test_ggml_rms_norm_no_weight_and_blob_eps():
    """ggml semantics: normalize only; eps may arrive as a raw 4-byte blob."""
    x = datagen.normal((3, 128), seed=6)
    eps = 1e-5
    out = compat.ggml_op_rms_norm(x, struct.pack("<f", eps))
    ref = x / np.sqrt((x * x).mean(-1, keepdims=True) + eps)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5)


def test_ggml_rope_modes():
    x = datagen.normal((2, 1, 2, 64), seed=7)  # [B, T, H, hd]
    pos = np.array([[3], [5]], np.int32)
    out_interleaved = compat.ggml_op_rope(x, pos, {"mode": 0})
    out_neox = compat.ggml_op_rope(x, pos, {"mode": 2})
    ref_i = rope_ref(x, pos, interleaved=True)
    ref_s = rope_ref(x, pos, interleaved=False)
    np.testing.assert_allclose(np.asarray(out_interleaved), ref_i, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out_neox), ref_s, atol=2e-6)


def test_prompt_generator_renders_every_definition():
    from quant_gemm_tpu.specs import prompt_generator as pg
    import json

    n = 0
    for p in sorted((pg.HERE / "definitions").rglob("*.json")):
        text = pg.generate(json.loads(p.read_text()))
        assert "Acceptance checklist" in text and "pallas_call" in text, p
        n += 1
    assert n >= 19  # all committed definitions render
