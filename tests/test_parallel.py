"""Tensor-parallel GEMM tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_gemm_tpu.formats import jax_quant, numpy_ref
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.harness.metrics import ErrorMetrics
from quant_gemm_tpu.parallel import sharding as sh
from quant_gemm_tpu.ref import gemm as refg

M, N, K = 4, 512, 2048


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (virtual CPU mesh)")
    return sh.make_mesh({"tp": 4})


@pytest.fixture(scope="module")
def data():
    a = datagen.normal((M, K), seed=1)
    w = datagen.normal((N, K), seed=2)
    return a, w, numpy_ref.quantize_q4_0(w)


def test_col_parallel(mesh, data):
    a, w, w_q = data
    sw = sh.shard_weight(w_q, mesh, mode="col")
    out = sh.gemm_col_parallel(sw, jnp.asarray(a), mesh, gather_output=True,
                               mxu_dtype=jnp.float32)
    gold = refg.gemm_wxa16(a, w_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m
    assert out.shape == (M, N)


def test_col_parallel_sharded_output(mesh, data):
    a, _, w_q = data
    sw = sh.shard_weight(w_q, mesh, mode="col")
    out = sh.gemm_col_parallel(sw, jnp.asarray(a), mesh, mxu_dtype=jnp.float32)
    assert out.shape == (M, N)
    # output is N-sharded across tp
    assert len(set(d.device for d in out.addressable_shards)) == 4


def test_row_parallel_psum(mesh, data):
    a, w, w_q = data
    sw = sh.shard_weight(w_q, mesh, mode="row")
    out = sh.gemm_row_parallel(sw, jnp.asarray(a), mesh, mxu_dtype=jnp.float32)
    gold = refg.gemm_wxa16(a, w_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m


def test_row_parallel_reduce_scatter(mesh, data):
    a, w, w_q = data
    sw = sh.shard_weight(w_q, mesh, mode="row")
    out = sh.gemm_row_parallel(sw, jnp.asarray(a), mesh, scatter_output=True,
                               mxu_dtype=jnp.float32)
    gold = refg.gemm_wxa16(a, w_q)
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-12, m
    assert out.shape == (M, N)


def test_w4a8_col_parallel(mesh, data):
    """Quantized activations through the sharded path."""
    a, w, w_q = data
    a_q = jax_quant.device_put(numpy_ref.quantize_q8_1(a))
    sw = sh.shard_weight(w_q, mesh, mode="col")
    out = sh.gemm_col_parallel(sw, a_q, mesh, gather_output=True,
                               mxu_dtype=jnp.float32)
    gold = refg.gemm_wxa8(w_q, numpy_ref.quantize_q8_1(a))
    m = ErrorMetrics.compute(out, gold)
    assert m.nmse < 1e-5, m


def test_dp_tp_mesh_quantize():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = sh.make_mesh({"dp": 2, "tp": 4})
    x = datagen.normal((8, 256), seed=9)
    a_q = sh.quantize_q8_1_sharded(jnp.asarray(x), mesh)
    ref = numpy_ref.quantize_q8_1(x)
    np.testing.assert_array_equal(np.asarray(a_q.qs), np.asarray(ref.qs))
