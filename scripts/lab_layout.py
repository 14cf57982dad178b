"""Lab: decode weight-stream LAYOUTS raced at the champion shape.

Round-3 verdict: the exact x8 kernel runs AT the pure DMA-probe floor for
its 3-array access pattern (packed + d_lo + d_hi tiles per grid step), but
that probe itself reads only ~709 GB/s — the layout, not the kernel, wastes
the residual.  This lab measures whether a different *storage layout* of
the same bytes streams faster:

  base      current PreparedWeight (packed int8 + d f32), 3 DMAs/step
  base16    same with int16 f16-bit scales (2 fewer bytes/block)
  dpair     d_lo/d_hi rows reordered so each step fetches ONE (2*tkb, tn)
            scale tile: 2 DMAs/step
  stream32  ONE int8 array per weight: scale BYTE PLANES interleaved with
            the packed rows per K-super-tile, so each grid step issues a
            single contiguous DMA (f32 scale bits = 4 byte rows/block-row)
  stream16  same with f16-bit scales (2 byte rows/block-row) — the
            fewest-bytes single-stream layout
  probe/*   compute-free DMA probes of the same layouts (floor per layout)

All GEMM variants are verified BIT-IDENTICAL to gemm_exact before timing
(same f32 accumulation order).  Timing: interleaved rounds, MEDIAN-of-N
reported (the shared dev chip's best-of tail can exceed the physical
roofline — medians are the steady-state number, VERDICT r3 weak #1).

Usage: python scripts/lab_layout.py [M] [reps]
"""

from __future__ import annotations

import functools
import statistics
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from quant_gemm_tpu.formats import jax_quant, numpy_ref  # noqa: E402
from quant_gemm_tpu.formats.blocks import QK  # noqa: E402
from quant_gemm_tpu.harness import benchmark as bm  # noqa: E402
from quant_gemm_tpu.harness import datagen  # noqa: E402
from quant_gemm_tpu.kernels import gemm_pallas  # noqa: E402
from quant_gemm_tpu.kernels.gemm_exact import (  # noqa: E402
    _block_dots_diag,
    gemm_exact,
)
from quant_gemm_tpu.kernels.gemm_pallas import scale_f32  # noqa: E402
from quant_gemm_tpu.ref import gemm as refg  # noqa: E402
from quant_gemm_tpu.utils import round_up  # noqa: E402

N_FEAT, K = 4096, 14336


# ---------------------------------------------------------------------------
# combined-stream layout: packed rows + scale byte planes in ONE int8 array
# ---------------------------------------------------------------------------


def build_stream(w: gemm_pallas.PreparedWeight, tkp: int, half: bool):
    """[nkt*(tkp+srows), Np] int8: per K-step, packed tile rows followed by
    the step's d_lo/d_hi scale rows as byte planes (plane-major)."""
    packed = np.asarray(w.packed_t)  # [kdim, Np] int8
    d = np.asarray(w.d_t, np.float32)  # [2*nbh, Np]
    if half:
        d_bits = d.astype(np.float16).view(np.uint16)
        ib = 2
    else:
        d_bits = d.view(np.uint32)
        ib = 4
    kdim, np_ = packed.shape
    nkt, tkb = kdim // tkp, tkp // QK
    nbh = d.shape[0] // 2
    srows = 2 * tkb * ib
    out = np.empty((nkt * (tkp + srows), np_), np.int8)

    def byte_planes(rows):  # [tkb, Np] uint -> [tkb*ib, Np] int8 plane-major
        return np.concatenate(
            [((rows >> (8 * j)) & 0xFF).astype(np.uint8).view(np.int8)
             for j in range(ib)], axis=0)

    for kt in range(nkt):
        s = kt * (tkp + srows)
        out[s : s + tkp] = packed[kt * tkp : (kt + 1) * tkp]
        dlo = d_bits[kt * tkb : (kt + 1) * tkb]
        dhi = d_bits[nbh + kt * tkb : nbh + (kt + 1) * tkb]
        out[s + tkp : s + tkp + tkb * ib] = byte_planes(dlo)
        out[s + tkp + tkb * ib : s + tkp + srows] = byte_planes(dhi)
    return jnp.asarray(out), srows


def _decode_scale_rows(slab, tkb: int, ib: int):
    """[tkb*ib, tn] int8 byte planes -> [tkb, tn] f32 (exact bit decode)."""
    b = [slab[j * tkb : (j + 1) * tkb].astype(jnp.int32) & 0xFF
         for j in range(ib)]
    if ib == 2:  # f16 bits
        h = b[0] | (b[1] << 8)
        return scale_f32(h.astype(jnp.int16))
    bits = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _kernel_stream(comb_ref, qa_ref, da_ref, sa_ref, sq_ref, out_ref, *,
                   tkb, tkp, nkt, ib):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = comb_ref[:tkp, :]
    lo, hi = p & jnp.int8(0x0F), p & jnp.int8(-16)
    d_lo = _decode_scale_rows(comb_ref[tkp : tkp + tkb * ib, :], tkb, ib)
    d_hi = _decode_scale_rows(comb_ref[tkp + tkb * ib :, :], tkb, ib)

    def plane(qw, d, koff, fixup):
        qa = qa_ref[:, pl.ds(koff * tkp, tkp)]
        da = da_ref[pl.ds(koff * tkb, tkb), :]
        sa = sa_ref[pl.ds(koff * tkb, tkb), :]
        sq = sq_ref[pl.ds(koff * tkb, tkb), :]
        acc = jnp.zeros_like(out_ref)
        if fixup:
            d = d * 0.0625
            sa = sa * 16.0
        dots = _block_dots_diag(qa, qw, tkb, out_ref.shape[0])
        for b in range(tkb):
            raw = dots[b]
            if fixup:
                raw = raw + 128 * sq[b, :][:, None]
            sumi = raw.astype(jnp.float32)
            acc += d[b, :][None, :] * (
                da[b, :][:, None] * sumi - 8.0 * sa[b, :][:, None])
        return acc

    out_ref[:] += plane(lo, d_lo, kt, False)
    out_ref[:] += plane(hi, d_hi, kt + nkt, True)


def gemm_stream(comb, srows, w, a_q, *, tn=4096, tkp=512, ib=4,
                interpret=False):
    m, k = a_q.qs.shape
    kdim = w.packed_t.shape[0]
    tkb = tkp // QK
    nkt = kdim // tkp
    tm = round_up(m, 8)
    np_ = w.packed_t.shape[1]
    tn = min(tn, np_)

    def padm(x):
        x = jnp.asarray(x)
        pr = tm - x.shape[0]
        return jnp.pad(x, ((0, pr), (0, 0))) if pr else x

    qa = gemm_pallas.pad_activation_k(padm(a_q.qs), k, kdim, True)
    da_t = gemm_pallas.pad_scales_k(
        padm(a_q.d).astype(jnp.float32), k, kdim, True).T
    sa_t = gemm_pallas.pad_scales_k(
        padm(a_q.s).astype(jnp.float32), k, kdim, True).T
    sumq = jnp.asarray(a_q.qs, jnp.int32).reshape(m, k // QK, QK).sum(-1)
    sq_t = gemm_pallas.pad_scales_k(padm(sumq), k, kdim, True).T

    super_ = tkp + srows

    def full_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda nt, kt: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_stream, tkb=tkb, tkp=tkp, nkt=nkt, ib=ib),
        grid=(np_ // tn, nkt),
        in_specs=[
            pl.BlockSpec((super_, tn), lambda nt, kt: (kt, nt),
                         memory_space=pltpu.VMEM),
            full_spec(qa), full_spec(da_t), full_spec(sa_t), full_spec(sq_t),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tm, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(comb, qa, da_t, sa_t, sq_t)
    return out[:m, : w.n]


# ---------------------------------------------------------------------------
# dpair layout: ONE reordered scale array, (2*tkb, tn) fetch per step
# ---------------------------------------------------------------------------


def build_dpair(w, tkp: int, half: bool):
    d = np.asarray(w.d_t, np.float32)
    nbh = d.shape[0] // 2
    tkb = tkp // QK
    nkt = (w.packed_t.shape[0]) // tkp
    rows = []
    for kt in range(nkt):
        rows.append(d[kt * tkb : (kt + 1) * tkb])
        rows.append(d[nbh + kt * tkb : nbh + (kt + 1) * tkb])
    dp = np.concatenate(rows, axis=0)
    if half:
        dp = dp.astype(np.float16).view(np.int16)
    return jnp.asarray(dp)


def _kernel_dpair(packed_ref, dp_ref, qa_ref, da_ref, sa_ref, sq_ref,
                  out_ref, *, tkb, tkp, nkt):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = packed_ref[:]
    lo, hi = p & jnp.int8(0x0F), p & jnp.int8(-16)
    d_all = scale_f32(dp_ref[:])  # [2*tkb, tn]

    def plane(qw, d, koff, fixup):
        qa = qa_ref[:, pl.ds(koff * tkp, tkp)]
        da = da_ref[pl.ds(koff * tkb, tkb), :]
        sa = sa_ref[pl.ds(koff * tkb, tkb), :]
        sq = sq_ref[pl.ds(koff * tkb, tkb), :]
        acc = jnp.zeros_like(out_ref)
        if fixup:
            d = d * 0.0625
            sa = sa * 16.0
        dots = _block_dots_diag(qa, qw, tkb, out_ref.shape[0])
        for b in range(tkb):
            raw = dots[b]
            if fixup:
                raw = raw + 128 * sq[b, :][:, None]
            sumi = raw.astype(jnp.float32)
            acc += d[b, :][None, :] * (
                da[b, :][:, None] * sumi - 8.0 * sa[b, :][:, None])
        return acc

    out_ref[:] += plane(lo, d_all[:tkb], kt, False)
    out_ref[:] += plane(hi, d_all[tkb:], kt + nkt, True)


def gemm_dpair(dp, w, a_q, *, tn=4096, tkp=512, interpret=False):
    m, k = a_q.qs.shape
    kdim = w.packed_t.shape[0]
    tkb = tkp // QK
    nkt = kdim // tkp
    tm = round_up(m, 8)
    np_ = w.packed_t.shape[1]
    tn = min(tn, np_)

    def padm(x):
        x = jnp.asarray(x)
        pr = tm - x.shape[0]
        return jnp.pad(x, ((0, pr), (0, 0))) if pr else x

    qa = gemm_pallas.pad_activation_k(padm(a_q.qs), k, kdim, True)
    da_t = gemm_pallas.pad_scales_k(
        padm(a_q.d).astype(jnp.float32), k, kdim, True).T
    sa_t = gemm_pallas.pad_scales_k(
        padm(a_q.s).astype(jnp.float32), k, kdim, True).T
    sumq = jnp.asarray(a_q.qs, jnp.int32).reshape(m, k // QK, QK).sum(-1)
    sq_t = gemm_pallas.pad_scales_k(padm(sumq), k, kdim, True).T

    def full_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda nt, kt: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_dpair, tkb=tkb, tkp=tkp, nkt=nkt),
        grid=(np_ // tn, nkt),
        in_specs=[
            pl.BlockSpec((tkp, tn), lambda nt, kt: (kt, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * tkb, tn), lambda nt, kt: (kt, nt),
                         memory_space=pltpu.VMEM),
            full_spec(qa), full_spec(da_t), full_spec(sa_t), full_spec(sq_t),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tm, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(w.packed_t, dp, qa, da_t, sa_t, sq_t)
    return out[:m, : w.n]


# ---------------------------------------------------------------------------
# probes: compute-free streams of each layout
# ---------------------------------------------------------------------------


def _kernel_probe1(a_ref, out_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += a_ref[:8, :].astype(jnp.int32).astype(jnp.float32)


def probe_single(arr, rows_per_step, tn=4096):
    nr, np_ = arr.shape
    nkt = nr // rows_per_step
    return pl.pallas_call(
        _kernel_probe1,
        grid=(np_ // tn, nkt),
        in_specs=[pl.BlockSpec((rows_per_step, tn), lambda nt, kt: (kt, nt),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(arr)


def _kernel_probe3(p_ref, dlo_ref, dhi_ref, out_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += (p_ref[:8, :].astype(jnp.int32).astype(jnp.float32)
                   + scale_f32(dlo_ref[:8, :]) + scale_f32(dhi_ref[:8, :]))


def probe_3arr(w, tkp=512, tn=4096):
    kdim, np_ = w.packed_t.shape
    tkb = tkp // QK
    nkt = kdim // tkp

    def wspec(bs, off=0):
        return pl.BlockSpec(bs, lambda nt, kt, o=off: (kt + o, nt),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _kernel_probe3,
        grid=(np_ // tn, nkt),
        in_specs=[wspec((tkp, tn)), wspec((tkb, tn)),
                  wspec((tkb, tn), off=nkt)],
        out_specs=pl.BlockSpec((8, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(w.packed_t, w.d_t, w.d_t)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    print(f"shape: out-features {N_FEAT} x tokens {m} x K {K}; "
          f"median-of-{reps} interleaved", flush=True)
    rng = np.random.default_rng(0)
    w = rng.normal(0, 1, (N_FEAT, K)).astype(np.float32)
    a = rng.normal(0, 1, (m, K)).astype(np.float32)
    wq = numpy_ref.quantize_q4_0(w)
    w32 = jax.device_put(gemm_pallas.prepare(wq, scales_dtype=np.float32))
    w16 = jax.device_put(gemm_pallas.prepare(wq, scales_dtype=np.float16))
    aq = jax_quant.device_put(numpy_ref.quantize_q8_1(a))

    tkp = 512
    comb32, sr32 = build_stream(w32, tkp, half=False)
    comb16, sr16 = build_stream(w32, tkp, half=True)
    dp32 = build_dpair(w32, tkp, half=False)
    dp16 = build_dpair(w32, tkp, half=True)

    golden = np.asarray(gemm_exact(w32, aq))
    gf = refg.gemm_fp32(a, w)
    nmse = float(np.mean((golden - gf) ** 2) / np.mean(gf**2))
    print(f"exact-vs-fp32 nmse {nmse:.2e}", flush=True)

    # activation+output bytes are common to every variant
    act_bytes = m * K + (K // QK) * m * (4 + 4 + 4) + m * N_FEAT * 4
    canon16 = bm.weight_bytes("q4_0", N_FEAT, K, f32_scales=False)

    variants = [
        ("base", gemm_exact, (w32, aq), bm.prepared_bytes(w32)),
        ("base16", gemm_exact, (w16, aq), bm.prepared_bytes(w16)),
        ("dpair", functools.partial(gemm_dpair, dp32), (w32, aq),
         int(w32.packed_t.size) + dp32.size * 4),
        ("dpair16", functools.partial(gemm_dpair, dp16), (w32, aq),
         int(w32.packed_t.size) + dp16.size * 2),
        ("stream32", functools.partial(gemm_stream, comb32, sr32, ib=4),
         (w32, aq), int(comb32.size)),
        ("stream16", functools.partial(gemm_stream, comb16, sr16, ib=2),
         (w32, aq), int(comb16.size)),
    ]
    # verify all bit-identical to gemm_exact
    for name, fn, args, _ in variants[1:]:
        out = np.asarray(fn(*args))
        tag = "BIT-IDENTICAL" if np.array_equal(out, golden) else "MISMATCH"
        if tag == "MISMATCH":
            mx = np.max(np.abs(out - golden))
            tag += f" (max abs {mx:.3e})"
        print(f"  {name}: {tag}", flush=True)

    probes = [
        ("probe/3arr-f32", functools.partial(probe_3arr, tkp=tkp), (w32,),
         bm.prepared_bytes(w32)),
        ("probe/3arr-f16", functools.partial(probe_3arr, tkp=tkp), (w16,),
         bm.prepared_bytes(w16)),
        ("probe/stream32",
         functools.partial(probe_single, rows_per_step=tkp + sr32),
         (comb32,), int(comb32.size)),
        ("probe/stream16",
         functools.partial(probe_single, rows_per_step=tkp + sr16),
         (comb16,), int(comb16.size)),
    ]

    allv = variants + probes
    times: dict[str, list[float]] = {name: [] for name, *_ in allv}
    bytes_of = {name: by for name, _f, _a, by in allv}
    is_gemm = {name for name, *_ in variants}
    for rep in range(reps):
        for name, fn, args, by in allv:
            extra = act_bytes if name in is_gemm else 0
            r = bm.benchmark_kernel(fn, args, name=f"{name} #{rep}",
                                    flops=bm.gemm_flops(m, N_FEAT, K),
                                    bytes_accessed=by + extra)
            print(f"  {r.row()}", flush=True)
            if r.valid:
                times[name].append(r.time_s)

    print(f"\nmedian-of-{reps} (own-bytes GB/s | canonical-f16-bytes GB/s):",
          flush=True)
    for name, _fn, _args, by in allv:
        med = statistics.median(times[name])
        own = (by + (act_bytes if name in is_gemm else 0)) / med / 1e9
        canon = canon16 / med / 1e9
        print(f"  {name:<16s} {med*1e6:8.1f} us  {own:7.1f} GB/s "
              f"| {canon:7.1f} GB/s canonical", flush=True)


if __name__ == "__main__":
    main()
