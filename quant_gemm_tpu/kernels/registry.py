"""Kernel registry and dispatch — the bake-off surface of the ladder.

The reference's methodology is a named ladder of kernel variants benchmarked
against each other (tests/benchmark_best.cu lists 8).  This registry is the
TPU equivalent: every GEMM implementation is registered under a stable name,
the benchmark harness iterates the registry, and :func:`dispatch` picks the
default serving kernel for a given (format, shape, backend).

Ladder (fastest serving path last):

====================  ======================================================
name                  strategy
====================  ======================================================
xla_dequant           dequantize + jnp.dot (naive rung; XLA-fused)
xla_compensated       reference compensation formula as two XLA matmuls
xla_int               exact per-block int32 einsum (correctness oracle)
pallas_exact          Pallas int8-MXU per-block dots + compensation epilogue
pallas_k16            per-16-scale exact kernel for the native K-quants
                      (Q2_K/Q3_K/Q6_K containers or PreparedK16)
pallas_exact_fused    pallas_exact with IN-KERNEL true-Q8_1 activation
                      quantization (f16-rounded d, stored sum s) — bit-
                      identical to quantize_q8_1 + pallas_exact, one fewer
                      activation HBM round-trip (serving DECODE default,
                      M <= DECODE_M_MAX, via dispatch(quantize_act=True))
pallas_f32            Pallas fused dequant GEMM, f32 MXU (accuracy mode)
pallas_fused_quant    Pallas GEMM with in-kernel Q8_1 activation quantization
pallas_bf16           Pallas fused dequant GEMM, explicit bf16 casts
pallas                Pallas fused dequant GEMM, f32 operands + DEFAULT
                      precision (MXU-internal bf16 rounding; serving
                      PREFILL default — same numerics as pallas_bf16,
                      fewer VPU ops)
====================  ======================================================
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from ..formats import jax_quant as _jq
from ..formats.blocks import Q8_1Tensor
from . import gemm_pallas as _gp
from . import gemm_xla as _gx
from .gemm_exact import PreparedQ6K as _PreparedQ6K
from .gemm_exact import gemm_exact as _gemm_exact
from .gemm_exact import gemm_exact_fused as _gemm_exact_fused
from .gemm_exact import gemm_exact_q6k as _gemm_exact_q6k
from .gemm_exact import prepare_q6k as _prepare_q6k


def _as_prepared(w):
    return w if isinstance(w, _gp.PreparedWeight) else _gp.prepare(w)


def _is_k16(w) -> bool:
    from ..formats import kquants as _kq

    return isinstance(w, _kq.K16_TENSORS)


def _k16_dequant_gemm(wq, act):
    """WxA16 fallback for the per-16 K-quants: dequantize on device (XLA
    fuses the expand into the matmul read) and contract in bf16/f32."""
    from jax import numpy as _jnp

    scp16 = _jnp.repeat(wq.scp_t, 16, axis=0)  # [Kp, Np]
    wt = wq.qs_t.astype(_jnp.float32) * scp16
    if wq.mp_t is not None:  # q2_K additive term
        wt = wt + _jnp.repeat(wq.mp_t, 16, axis=0)
    kdim = wq.qs_t.shape[0]
    a = act.astype(_jnp.float32)
    if a.shape[1] != kdim:
        a = _jnp.pad(a, ((0, 0), (0, kdim - a.shape[1])))
    out = jnp.dot(a, wt, preferred_element_type=_jnp.float32)
    return out[:, : wq.n]


def _xla_dequant(w_q, act, **kw):
    if isinstance(act, Q8_1Tensor):
        return _gx.gemm_wxa8_scaled_xla(w_q, act)
    return _gx.gemm_wxa16_xla(w_q, act)


def _xla_compensated(w_q, act, **kw):
    assert isinstance(act, Q8_1Tensor)
    return _gx.gemm_wxa8_compensated_xla(w_q, act, **kw)


def _xla_int(w_q, act, **kw):
    assert isinstance(act, Q8_1Tensor)
    return _gx.gemm_wxa8_int_xla(w_q, act, **kw)


def _pallas(w, act, **kw):
    return _gp.gemm(_as_prepared(w), act, **kw)


def _pallas_f32(w, act, **kw):
    return _gp.gemm(_as_prepared(w), act, mxu_dtype=jnp.float32, **kw)


def _pallas_bf16(w, act, **kw):
    return _gp.gemm(_as_prepared(w), act, mxu_dtype=jnp.bfloat16, **kw)


def _pallas_fused_quant(w, act, **kw):
    assert not isinstance(act, Q8_1Tensor), "fused variant takes float acts"
    return _gp.gemm(_as_prepared(w), act, fused_quant=True, **kw)


def _pallas_exact(w, act, **kw):
    assert isinstance(act, Q8_1Tensor)
    return _gemm_exact(_as_prepared(w), act, **kw)


def _pallas_exact_fused(w, act, **kw):
    assert not isinstance(act, Q8_1Tensor), "fused variant takes float acts"
    return _gemm_exact_fused(_as_prepared(w), act, **kw)


def _pallas_k16(w, act, **kw):
    assert isinstance(act, Q8_1Tensor)
    wq = w if isinstance(w, _PreparedQ6K) else _prepare_q6k(w)
    return _gemm_exact_q6k(wq, act, **kw)


KERNELS: Dict[str, Callable] = {
    "xla_dequant": _xla_dequant,
    "xla_compensated": _xla_compensated,
    "xla_int": _xla_int,
    "pallas_exact": _pallas_exact,
    "pallas_exact_fused": _pallas_exact_fused,
    "pallas_k16": _pallas_k16,
    "pallas_f32": _pallas_f32,
    "pallas_bf16": _pallas_bf16,
    "pallas_fused_quant": _pallas_fused_quant,
    "pallas": _pallas,
}


# Decode-regime crossover: below this many tokens the exact int8-MXU kernel
# beats the dequant kernel (it streams raw codes with no per-element dequant
# arithmetic); above it the wide-MXU dequant kernel wins.  Measured on v5e
# at 4096x{1..16}x14336: exact wins up to M=8, ties ~M=12 (docs/PERF_NOTES.md).
DECODE_M_MAX = 12

# Decode-path W_xA8 strategy for float activations: fuse the Q8_1
# quantization INTO the exact kernel (True) or quantize via jax_quant and
# run the unfused exact kernel (False).  Both are bit-identical; the round-4
# on-chip adjudication (scripts/lab_serveshapes.py, bench_serve --fused)
# found the fused kernel ~4-10 us SLOWER per GEMM at every serving shape
# (the VMEM-resident float activation competes with the weight stream and
# the in-kernel quant redoes per-block work each N-tile), while the
# standalone quantize pass costs ~2 us and its output is reused across the
# N grid — so the default is now the unfused path (VERDICT r3 item 2).
FUSED_DECODE = False


def dispatch(w, act, impl: str | None = None, quantize_act: bool = False,
             **kw):
    """Run a quantized GEMM, auto-selecting the fastest valid kernel.

    ``w``: SoA container or PreparedWeight.  ``act``: float [M, K] or
    Q8_1Tensor.  Q8_1 activations in the decode regime (M <= DECODE_M_MAX,
    q4_0/q8_0) route to the exact int8-MXU kernel — fastest AND bit-exact;
    everything else takes the dequant MXU kernel.  Falls back to the XLA
    rung when K is not Pallas-tileable.

    ``quantize_act=True`` (float ``act``) requests W_xA8 semantics: decode
    shapes fuse the Q8_1 quantization INTO the exact kernel
    (gemm_exact_fused — bit-identical to quantizing first), other shapes
    quantize via jax_quant and proceed as if a Q8_1Tensor was passed.
    """
    if impl is not None:
        return KERNELS[impl](w, act, **kw)
    if isinstance(w, _PreparedQ6K) or _is_k16(w):
        # native per-16-scale K-quants (Q2_K/Q3_K/Q6_K)
        wq = w if isinstance(w, _PreparedQ6K) else _prepare_q6k(w)
        if isinstance(act, Q8_1Tensor) or quantize_act:
            m = (act.qs if isinstance(act, Q8_1Tensor) else act).shape[0]
            if m > DECODE_M_MAX:
                # prefill regime: the per-16 exact kernel contracts 16-deep
                # MXU dots with the whole activation VMEM-resident — route
                # wide shapes to the dequant matmul like the per-32 ladder
                if isinstance(act, Q8_1Tensor):
                    act = _jq.dequantize(act)  # keep the A8 rounding
                return _k16_dequant_gemm(wq, act)
            if not isinstance(act, Q8_1Tensor):
                act = _jq.quantize_q8_1(act.astype(jnp.float32))
            return _gemm_exact_q6k(wq, act, **kw)
        # WxA16 (act_mode='bf16' accuracy mode): XLA dequant + matmul —
        # materializes the float weight, so use only where accuracy trumps
        # memory; the WxA8 exact kernel above is the serving path
        return _k16_dequant_gemm(wq, act)
    k = w.k if isinstance(w, _gp.PreparedWeight) else (
        w.qs.shape[-1] if hasattr(w, "qs") else w.packed.shape[-1] * 2
    )
    if quantize_act and not isinstance(act, Q8_1Tensor):
        x32 = act.astype(jnp.float32)
        if FUSED_DECODE and _gp.supports(k) and act.shape[0] <= DECODE_M_MAX:
            wq = _as_prepared(w)
            if wq.qh_t is None:  # q5 qh planes keep the unfused path
                return _gemm_exact_fused(wq, x32, **kw)
        act = _jq.quantize_q8_1(x32)
    if _gp.supports(k):
        wq = _as_prepared(w)
        if isinstance(act, Q8_1Tensor) and act.qs.shape[0] <= DECODE_M_MAX:
            return _gemm_exact(wq, act, **kw)
        return _gp.gemm(wq, act, **kw)
    if isinstance(w, _gp.PreparedWeight):
        raise ValueError(f"K={k} needs the XLA rung; pass the SoA container")
    if quantize_act and not isinstance(act, Q8_1Tensor):
        act = _jq.quantize_q8_1(act.astype(jnp.float32))
    return _xla_dequant(w, act, **kw)


__all__ = ["KERNELS", "dispatch"]
