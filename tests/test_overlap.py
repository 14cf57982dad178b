"""Collective overlap, engineered and verified ahead of pod hardware.

SURVEY §5.8's north star requires collectives "overlapped with MXU compute
via shard_map + pipelined Pallas kernels".  These tests compile the ring
kernels (parallel/sharding.py: gemm_col_parallel_ring /
gemm_row_parallel_ring) for a REAL v5e target devicelessly (harness/aot.py)
and assert the SCHEDULED HLO — text order is execution order — issues every
``collective-permute-start`` before an independent Mosaic GEMM and its
``-done`` after it: the Q8_1 activation all-gather and the partial-sum
reduce-scatter ride entirely under the MXU.

Also pins the honest negative result: the plain Megatron serving decode
step's two psums per layer are async-converted by XLA and then RE-MERGED by
the scheduler (``resynced``), because a decode step has no independent
compute on the critical path — the ring kernels are the remedy where the
GEMM is big enough to hide under (prefill); at decode the psums are
latency-bound and the projection must charge them (scripts/bench_scaling.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from quant_gemm_tpu.formats import numpy_ref
from quant_gemm_tpu.harness import aot, datagen
from quant_gemm_tpu.parallel import sharding as sh

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="deviceless AOT gate is for CPU CI",
)

TP = 8
N, K, M = 1024, 2048, 256


if not aot.topology_available():  # pragma: no cover - libtpu absent/busy
    pytestmark = pytest.mark.skip(reason="no deviceless TPU topology")


def _retarget(topo):
    def one(x):
        spec = x.sharding.spec if hasattr(x, "sharding") else P()
        return jax.ShapeDtypeStruct(
            np.shape(x), x.dtype, sharding=NamedSharding(topo, spec))

    return one


def _ring_weight(mode: str):
    w_q = numpy_ref.quantize_q4_0(datagen.normal((N, K), seed=1))
    cmesh = sh.make_mesh({"tp": TP})
    return sh.shard_weight_ring(w_q, cmesh, mode=mode)


def test_col_ring_overlaps_on_v5e():
    topo = aot.topology_mesh({"tp": TP})
    swc = _ring_weight("col")
    sds_st = jax.tree.map(_retarget(topo), swc.stacked)
    sds_a = jax.ShapeDtypeStruct(
        (M, K), jnp.float32, sharding=NamedSharding(topo, P(None, "tp")))

    def fn(st, a):
        sw = sh.ShardedWeight("q4_0", N, K, "col_ring", "tp", st)
        return sh.gemm_col_parallel_ring(sw, a, topo, interpret=False)

    c = jax.jit(fn).lower(sds_st, sds_a).compile(aot.OVERLAP_OPTS)
    rep = aot.overlap_report(aot.compiled_hlo(c))
    # every ppermute of the rotating Q8_1 chunk must hide under compute
    assert rep["overlapped"] > 0, rep
    assert rep["blocking"] == 0, rep
    # and at least one hider must be a Mosaic kernel (the chunk GEMM)
    assert any("pallas_call" in h for h in rep["hidden_by"]), (
        rep["hidden_by"][:10])


def test_row_ring_overlaps_on_v5e():
    topo = aot.topology_mesh({"tp": TP})
    swr = _ring_weight("row")
    sds_st = jax.tree.map(_retarget(topo), swr.stacked)
    sds_a = jax.ShapeDtypeStruct(
        (M, K), jnp.float32, sharding=NamedSharding(topo, P(None, "tp")))

    def fn(st, a):
        sw = sh.ShardedWeight("q4_0", N, K, "row_ring", "tp", st)
        return sh.gemm_row_parallel_ring(sw, a, topo, interpret=False)

    c = jax.jit(fn).lower(sds_st, sds_a).compile(aot.OVERLAP_OPTS)
    rep = aot.overlap_report(aot.compiled_hlo(c))
    assert rep["overlapped"] > 0, rep
    assert rep["blocking"] == 0, rep
    assert any("pallas_call" in h for h in rep["hidden_by"]), (
        rep["hidden_by"][:10])


@pytest.mark.slow
def test_decode_psums_are_async_attempted():
    """The 2-layer tp=8 serving decode step: XLA async-converts all four
    psums (async_collective_name attribute) and the scheduler re-merges
    them — recorded so a future model-structure change that unlocks real
    decode overlap shows up as overlapped>0 here."""
    from quant_gemm_tpu.models import llama, llama_tp

    topo = aot.topology_mesh({"tp": TP})
    cmesh = sh.make_mesh({"tp": TP})
    cfg = llama.LlamaConfig(vocab=64, dim=512, n_layers=2, n_heads=8,
                            n_kv_heads=8, d_ff=1024, max_seq=32)
    qp = llama_tp.shard_params_tp(
        llama.init_params(cfg, seed=0), cfg, cmesh, "q4_0")
    cache = llama_tp.init_cache_tp(cfg, 2, cmesh)
    sds_qp = jax.tree.map(_retarget(topo), qp)
    sds_cache = jax.tree.map(_retarget(topo), cache)
    sds_toks = jax.ShapeDtypeStruct(
        (2, 1), jnp.int32, sharding=NamedSharding(topo, P(None, None)))

    def fn(qp_, toks_, cache_):
        return llama_tp.forward_tp(qp_, cfg, toks_, cache_, topo)

    c = jax.jit(fn).lower(sds_qp, sds_toks, sds_cache).compile(
        aot.OVERLAP_OPTS)
    hlo = aot.compiled_hlo(c)
    rep = aot.overlap_report(hlo)
    n_psum = 2 * cfg.n_layers
    total = rep["overlapped"] + rep["blocking"] + rep["resynced"] + rep["sync"]
    assert total >= n_psum, rep
    # all psums must at least be attempted async (none left plain sync)
    assert rep["sync"] == 0, rep
