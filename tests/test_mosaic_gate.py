"""The Mosaic compile gate: every shipped Pallas kernel must compile for a
REAL TPU target (v5e), devicelessly, on every test run.

Round 2 shipped a re-encoded production weight layout on interpret-mode
evidence alone (the chip was down); interpret mode proves numerics, not
Mosaic legality — vector int8 shifts, for example, lower fine and then fail
`failed to legalize operation 'arith.shrsi'` in the Mosaic compiler.  These
tests run the full XLA:TPU + Mosaic pipeline via the deviceless topology
in harness/aot.py, so a kernel that stops legalizing fails CI immediately
(VERDICT r2 item 4).  Shapes mirror the serving configs (decode M=4 /
prefill M=256, llama-proportioned N/K) scaled down where compile time, not
capability, is at stake.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quant_gemm_tpu.formats import jax_quant, kquants, numpy_ref
from quant_gemm_tpu.harness import aot, datagen
from quant_gemm_tpu.kernels import prepare
from quant_gemm_tpu.kernels.gemm_exact import (
    gemm_exact,
    gemm_exact_fused,
    gemm_exact_k16,
    prepare_k16,
)
from quant_gemm_tpu.kernels import gemm_pallas
from quant_gemm_tpu.ops import attention
from quant_gemm_tpu.ops.rms_norm import rms_norm_pallas
from quant_gemm_tpu.ops.softmax import softmax_pallas

N, K = 1024, 4096  # llama-proportioned, compile-time-friendly
M_DECODE, M_PREFILL = 4, 256

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="gate is for CPU CI; on-chip runs exercise kernels directly",
)


if not aot.topology_available():  # pragma: no cover - libtpu absent/busy
    pytestmark = pytest.mark.skip(reason="no deviceless TPU topology")


def _w(qtype: str, seed: int = 0):
    w = datagen.normal((N, K), seed=seed)
    return prepare(numpy_ref.QUANTIZE[qtype](w))


def _aq(m: int, seed: int = 1):
    a = datagen.normal((m, K), seed=seed)
    return jax_quant.device_put(numpy_ref.quantize_q8_1(a))


@pytest.mark.parametrize("qtype", ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0"])
def test_exact_decode_compiles(qtype):
    c = aot.aot_compile(
        lambda w, a: gemm_exact(w, a, interpret=False),
        _w(qtype), _aq(M_DECODE),
    )
    assert c.memory_analysis().generated_code_size_in_bytes > 0


@pytest.mark.parametrize("qtype", ["q4_0", "q8_0"])
def test_exact_fused_compiles(qtype):
    a = jnp.asarray(datagen.normal((M_DECODE, K), seed=2))
    aot.aot_compile(
        lambda w, x: gemm_exact_fused(w, x, interpret=False),
        _w(qtype), a,
    )


@pytest.mark.parametrize(
    "qtype,kw",
    [
        ("q4_0", {}),                               # serving prefill default
        ("q4_0", {"mxu_dtype": jnp.float32}),       # accuracy mode
        ("q4_0", {"mxu_dtype": jnp.bfloat16}),
        ("q5_1", {}),                               # qh plane path
        ("q8_0", {}),
    ],
)
def test_dequant_prefill_compiles(qtype, kw):
    a = jnp.asarray(datagen.normal((M_PREFILL, K), seed=3), jnp.bfloat16)
    aot.aot_compile(
        lambda w, x: gemm_pallas.gemm(w, x, interpret=False, **kw),
        _w(qtype), a,
    )


def test_fused_quant_prefill_compiles():
    a = jnp.asarray(datagen.normal((M_PREFILL, K), seed=4))
    aot.aot_compile(
        lambda w, x: gemm_pallas.gemm(w, x, fused_quant=True,
                                      interpret=False),
        _w("q4_0"), a,
    )


@pytest.mark.parametrize("qtype", ["q2_k", "q3_k", "q6_k"])
def test_k16_decode_compiles(qtype):
    w = datagen.normal((512, 1024), seed=5)
    t = {
        "q2_k": kquants.quantize_q2_k,
        "q3_k": kquants.quantize_q3_k,
        "q6_k": kquants.quantize_q6_k,
    }[qtype](w)
    a = datagen.normal((M_DECODE, 1024), seed=6)
    a_q = jax_quant.device_put(numpy_ref.quantize_q8_1(a))
    aot.aot_compile(
        lambda wq, aq: gemm_exact_k16(wq, aq, interpret=False),
        prepare_k16(t), a_q,
    )


# -- attention ---------------------------------------------------------------

B, KV, REP, HD, S = 2, 4, 4, 128, 1024


def _cache(dtype=jnp.bfloat16, layers=None, s=S):
    shape = (B, KV, s, HD) if layers is None else (layers, B, KV, s, HD)
    z = jnp.zeros(shape, dtype)
    return z


def test_flash_decode_compiles():
    q = jnp.zeros((B, KV, REP, HD), jnp.float32)
    pos = jnp.full((B,), 37, jnp.int32)
    aot.aot_compile(
        lambda q_, k_, v_, p_: attention.flash_decode(
            q_, k_, v_, p_, interpret=False),
        q, _cache(), _cache(), pos,
    )


def test_flash_decode_stacked_q8_current_compiles():
    """The serving shape: stacked [L,B,KV,S,hd] int8 cache + per-token
    scales + current-token fold (models.llama decode step)."""
    q = jnp.zeros((B, KV, REP, HD), jnp.float32)
    pos = jnp.full((B,), 37, jnp.int32)
    kc = jnp.zeros((B, KV, 1, HD), jnp.float32)
    ks = jnp.zeros((2, B, KV, S), jnp.float32)
    aot.aot_compile(
        lambda q_, k_, v_, p_, kc_, vc_, ks_, vs_: attention.flash_decode(
            q_, k_, v_, p_, k_current=kc_, v_current=vc_,
            k_scale=ks_, v_scale=vs_, layer=1, interpret=False),
        q, _cache(jnp.int8, layers=2), _cache(jnp.int8, layers=2), pos,
        kc, kc, ks, ks,
        static_argnames=(),
    )


def test_flash_decode_ring_window_compiles():
    q = jnp.zeros((B, KV, REP, HD), jnp.float32)
    pos = jnp.full((B,), 2000, jnp.int32)
    ring = 768
    aot.aot_compile(
        lambda q_, k_, v_, p_: attention.flash_decode(
            q_, k_, v_, p_, window=512, ring=ring, interpret=False),
        q, _cache(s=1024), _cache(s=1024), pos,
    )


def test_flash_prefill_compiles():
    t = 256
    q = jnp.zeros((B, KV, t * REP, HD), jnp.float32)
    pos0 = jnp.zeros((B,), jnp.int32)
    aot.aot_compile(
        lambda q_, k_, v_, p_: attention.flash_prefill(
            q_, k_, v_, p_, rep=REP, interpret=False),
        q, _cache(), _cache(), pos0,
    )


def test_flash_prefill_q8_window_compiles():
    t = 256
    q = jnp.zeros((B, KV, t * REP, HD), jnp.float32)
    pos0 = jnp.full((B,), 512, jnp.int32)
    ks = jnp.zeros((B, KV, S), jnp.float32)
    aot.aot_compile(
        lambda q_, k_, v_, p_, ks_, vs_: attention.flash_prefill(
            q_, k_, v_, p_, rep=REP, k_scale=ks_, v_scale=vs_,
            window=384, interpret=False),
        q, _cache(jnp.int8), _cache(jnp.int8), pos0, ks, ks,
    )


# -- element ops -------------------------------------------------------------


def test_rms_norm_softmax_compile():
    x = jnp.zeros((M_PREFILL, K), jnp.float32)
    wt = jnp.zeros((K,), jnp.float32)
    aot.aot_compile(
        lambda x_, w_: rms_norm_pallas(x_, w_, interpret=False),
        x, wt,
    )
    aot.aot_compile(
        lambda x_: softmax_pallas(x_, interpret=False), x,
    )


def test_flash_prefill_q8_ring_compiles():
    t = 256
    ring = 768
    q = jnp.zeros((B, KV, t * REP, HD), jnp.float32)
    pos0 = jnp.full((B,), 1500, jnp.int32)
    ks = jnp.zeros((B, KV, 1024), jnp.float32)
    aot.aot_compile(
        lambda q_, k_, v_, p_, ks_, vs_: attention.flash_prefill(
            q_, k_, v_, p_, rep=REP, k_scale=ks_, v_scale=vs_,
            window=256, ring=ring, interpret=False),
        q, _cache(jnp.int8, s=1024), _cache(jnp.int8, s=1024), pos0, ks, ks,
    )
