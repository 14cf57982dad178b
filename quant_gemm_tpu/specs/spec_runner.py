"""Spec-driven differential test/benchmark runner.

TPU analogue of the reference's generic runner (python/test_operator.py:
187-274): load a definition JSON, generate seeded data per its ``params``,
run the named implementation, and score variance-normalized NMSE against the
definition's threshold.  ``python -m quant_gemm_tpu.specs.spec_runner``
sweeps every committed definition and prints a pass/fail table.
"""

from __future__ import annotations

import json
import pathlib
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..formats import jax_quant, numpy_ref
from ..harness import datagen
from ..harness.metrics import ErrorMetrics
from ..kernels.registry import KERNELS
from ..ref import gemm as refg

HERE = pathlib.Path(__file__).parent


@dataclass
class SpecResult:
    name: str
    metric: str
    nmse: float
    threshold: float
    passed: bool

    def row(self) -> str:
        status = "PASS" if self.passed else "FAIL"
        return f"{self.name:<28s} {self.metric:<18s} {self.nmse:10.3e} < {self.threshold:g}  {status}"


def load(path: str | pathlib.Path) -> dict:
    return json.loads(pathlib.Path(path).read_text())


def definitions() -> list[pathlib.Path]:
    return sorted((HERE / "definitions").rglob("*.json"))


def _run_gemm(d: dict, impl: str, params: dict) -> SpecResult:
    m, n, k = params["M"], params["N"], params["K"]
    a = datagen.normal((m, k), seed=42)
    w = datagen.normal((n, k), seed=43)
    wtype = d["inputs"]["W"]["dtype"]
    atype = d["inputs"]["A"]["dtype"]
    w_q = numpy_ref.QUANTIZE[wtype](w)
    if atype == "q8_1":
        act = jax_quant.device_put(numpy_ref.quantize_q8_1(a))
    else:
        act = jnp.asarray(a)
    out = KERNELS[impl](w_q, act)
    metrics = ErrorMetrics.compute(out, refg.gemm_fp32(a, w))
    thr = d["accuracy"]["threshold"]
    return SpecResult(d["name"], d["accuracy"]["metric"], metrics.nmse, thr,
                      metrics.nmse < thr)


def _run_quantize(d: dict, params: dict) -> SpecResult:
    r, k = params["R"], params["K"]
    qtype = d["outputs"]["y"]["dtype"]
    x = datagen.uniform((r, k), seed=42)
    back = numpy_ref.dequantize(numpy_ref.QUANTIZE[qtype](x))
    # cross-check the jnp quantizer agrees bit-for-bit with numpy
    back_j = np.asarray(jax_quant.dequantize(jax_quant.QUANTIZE[qtype](jnp.asarray(x))))
    assert np.array_equal(back, back_j), f"jnp/numpy divergence for {qtype}"
    metrics = ErrorMetrics.compute(back, x)
    thr = d["accuracy"]["threshold"]
    return SpecResult(d["name"], d["accuracy"]["metric"], metrics.nmse, thr,
                      metrics.nmse < thr)


def _run_elementop(d: dict, params: dict) -> SpecResult:
    from ..ops import activations
    import importlib

    rms = importlib.import_module("quant_gemm_tpu.ops.rms_norm")
    sm = importlib.import_module("quant_gemm_tpu.ops.softmax")
    rope_mod = importlib.import_module("quant_gemm_tpu.ops.rope")

    name = d["name"]
    if name == "rope":
        s, h, hd = params["S"], params["H"], params["D"]
        x = datagen.normal((s, h, hd), seed=42)
        pos = np.arange(3, 3 + s)
        ref = rope_mod.rope_ref(x, pos)
        cache = rope_mod.rope_cache(64, hd, params.get("base", 10000.0))
        out = rope_mod.apply_rope(jnp.asarray(x), jnp.asarray(pos), cache)
    else:
        r, c = params["R"], params["C"]
        x = datagen.normal((r, c), seed=42)
        if name == "rmsnorm":
            wt = datagen.uniform((c,), 0.5, 1.5, seed=1)
            ref = rms.rms_norm_ref(x, wt)
            out = rms.rms_norm_pallas(jnp.asarray(x), jnp.asarray(wt))
        elif name == "softmax":
            ref = sm.softmax_ref(x)
            out = sm.softmax_pallas(jnp.asarray(x))
        else:
            fn = getattr(activations, name)
            ref = getattr(activations, f"{name}_ref")(x)
            out = fn(jnp.asarray(x))
    metrics = ErrorMetrics.compute(np.asarray(out), ref)
    thr = d["accuracy"]["threshold"]
    return SpecResult(name, d["accuracy"]["metric"], metrics.nmse, thr,
                      metrics.nmse < thr)


def _run_attention(d: dict, params: dict) -> SpecResult:
    from ..ops.attention import flash_decode, flash_decode_ref, flash_prefill

    b, kv, rep = params["B"], params["KV"], params["REP"]
    s, hd = params["S"], params["HD"]
    k = jnp.asarray(datagen.normal((b, kv, s, hd), seed=43))
    v = jnp.asarray(datagen.normal((b, kv, s, hd), seed=44))
    if d["name"] == "flash_prefill":
        t = params["T"]
        q = jnp.asarray(datagen.normal((b, kv, t * rep, hd), seed=42))
        pos0 = jnp.asarray(np.linspace(0, s - t, b).astype(np.int32))
        out = np.asarray(flash_prefill(q, k, v, pos0, rep=rep, tq=16, ts=32))
        qn = np.asarray(q).reshape(b, kv, t, rep, hd)
        sc = np.einsum("bgtrd,bgsd->bgtrs", qn, np.asarray(k),
                       dtype=np.float32) / np.sqrt(hd)
        p0 = np.asarray(pos0)
        mask = (np.arange(s)[None, None, :]
                > (p0[:, None] + np.arange(t))[:, :, None])
        sc = np.where(mask[:, None, :, None, :], -np.inf, sc)
        sc -= sc.max(-1, keepdims=True)
        pr = np.exp(sc)
        pr /= pr.sum(-1, keepdims=True)
        ref = np.einsum("bgtrs,bgsd->bgtrd", pr,
                        np.asarray(v)).reshape(b, kv, t * rep, hd)
    else:
        q = jnp.asarray(datagen.normal((b, kv, rep, hd), seed=42))
        pos = jnp.asarray(np.linspace(0, s - 1, b).astype(np.int32))
        out = np.asarray(flash_decode(q, k, v, pos, ts=64))
        ref = np.asarray(flash_decode_ref(q, k, v, pos))
    err = float(np.abs(out - ref).max())
    thr = d["accuracy"]["threshold"]
    return SpecResult(d["name"], d["accuracy"]["metric"], err, thr, err < thr)


def _run_kquant(d: dict, params: dict) -> SpecResult:
    from ..formats import kquants

    r, k = params["R"], params["K"]
    qtype = d["outputs"]["y"]["dtype"]
    x = datagen.uniform((r, k), seed=42)
    if qtype == "q4_k":
        t = kquants.quantize_q4_k(x)
        back = kquants.dequantize_q4_k(t)
        rt = kquants.from_bytes(kquants.to_bytes(t))
    else:
        t = kquants.quantize_q5_k(x)
        back = kquants.dequantize_q5_k(t)
        rt = kquants.from_bytes_q5_k(kquants.to_bytes_q5_k(t))
    for a, b2 in zip(t, rt):  # serialized form must round-trip bit-exactly
        assert np.array_equal(np.asarray(a), np.asarray(b2)), qtype
    metrics = ErrorMetrics.compute(back, x)
    thr = d["accuracy"]["threshold"]
    return SpecResult(d["name"], d["accuracy"]["metric"], metrics.nmse, thr,
                      metrics.nmse < thr)


def run_spec(path, impl: str | None = None, params: dict | None = None) -> SpecResult:
    d = load(path)
    p = dict(d.get("params", {}))
    p.update(params or {})
    op = d["op_type"]
    if op == "gemm_quant":
        return _run_gemm(d, impl or "pallas_f32", p)
    if op == "quantize":
        return _run_quantize(d, p)
    if op == "quantize_kquant":
        return _run_kquant(d, p)
    if op == "attention":
        return _run_attention(d, p)
    return _run_elementop(d, p)


def main() -> int:
    results = [run_spec(p) for p in definitions()]
    for r in results:
        print(r.row())
    failed = [r for r in results if not r.passed]
    print(f"\n{len(results) - len(failed)}/{len(results)} specs passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
