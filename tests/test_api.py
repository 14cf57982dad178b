"""quant_gemm-compatible API tests (reference python/tests/test_gemm_q4_0.py
analogues: shapes, roundtrip, correctness, llama decode shape)."""

import numpy as np
import pytest

from quant_gemm_tpu import api
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.harness.metrics import ErrorMetrics
from quant_gemm_tpu.ref import gemm as refg


def test_shapes_and_dtypes():
    x = datagen.normal((4, 128), seed=1)
    wq = api.quantize_q4_0(x)
    assert wq.shape == (4, 4, 18) and wq.dtype == np.uint8
    aq = api.quantize_q8_1(x)
    assert aq.shape == (4, 4, 36) and aq.dtype == np.uint8


def test_roundtrip():
    x = datagen.uniform((2, 256), seed=2)
    back = api.dequantize_q4_0(api.quantize_q4_0(x), 256)
    m = ErrorMetrics.compute(back, x)
    assert m.nmse < 5.5e-3, m


def test_gemm_reference_convention():
    """Weight-first M/N convention: C[M,N] = W[M,K] @ A[N,K]^T."""
    M, N, K = 130, 3, 512  # M = out-features, N = batch
    w = datagen.normal((M, K), seed=3)
    a = datagen.normal((N, K), seed=4)
    out = np.asarray(api.gemm_q4_0_q8_1(api.quantize_q4_0(w), api.quantize_q8_1(a), M, N, K))
    assert out.shape == (M, N)
    from quant_gemm_tpu.formats import numpy_ref

    gold = refg.gemm_wxa8(
        numpy_ref.quantize_q4_0(w), numpy_ref.quantize_q8_1(a)
    ).T  # golden is activation-first
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-5, m


def test_llama_decode_shape():
    """The reference pytest suite's llama shape M=4096, N=2, K=14336 —
    shrunk K for CPU interpret speed but same convention."""
    M, N, K = 512, 2, 1024
    w = datagen.normal((M, K), seed=5)
    a = datagen.normal((N, K), seed=6)
    out = np.asarray(api.gemm_q4_0_q8_1(api.quantize_q4_0(w), api.quantize_q8_1(a), M, N, K))
    ref = np.asarray(a, np.float32) @ np.asarray(w, np.float32).T  # [N, M]
    m = ErrorMetrics.compute(out, ref.T)
    assert m.nmse < 0.015, m


def test_validation_errors():
    x = datagen.normal((2, 128), seed=7)
    with pytest.raises(ValueError, match="divisible"):
        api.quantize_q4_0(x[:, :100])
    with pytest.raises(ValueError, match="uint8"):
        api.gemm_q4_0_q8_1(x, x, 2, 2, 128)
    wq = api.quantize_q4_0(x)
    aq = api.quantize_q8_1(x)
    with pytest.raises(ValueError, match="numel"):
        api.gemm_q4_0_q8_1(wq, aq, 4, 2, 128)
    with pytest.raises(ValueError, match="unknown quant type"):
        api.quantize(x, "q6_k")


def test_torch_tensor_interop():
    """torch.Tensor in -> torch.Tensor out (the reference API is a torch
    extension; ported scripts hand us torch tensors)."""
    torch = pytest.importorskip("torch")
    from quant_gemm_tpu import api

    rng = np.random.default_rng(7)
    w = torch.from_numpy(rng.standard_normal((64, 128)).astype(np.float32))
    a = torch.from_numpy(rng.standard_normal((4, 128)).astype(np.float32))
    w_q = api.quantize_q4_0(w)
    a_q = api.quantize_q8_1(a)
    assert isinstance(w_q, torch.Tensor) and w_q.dtype == torch.uint8
    assert tuple(w_q.shape) == (64, 4, 18)
    assert isinstance(a_q, torch.Tensor) and tuple(a_q.shape) == (4, 4, 36)

    back = api.dequantize_q4_0(w_q, 128)
    assert isinstance(back, torch.Tensor)

    out = api.gemm_q4_0_q8_1(w_q, a_q, 64, 4, 128)
    assert isinstance(out, torch.Tensor)
    assert tuple(out.shape) == (64, 4)
    # numerics match the numpy-input path exactly
    out_np = api.gemm_q4_0_q8_1(w_q.numpy(), a_q.numpy(), 64, 4, 128)
    np.testing.assert_allclose(out.numpy(), np.asarray(out_np), rtol=1e-6)
