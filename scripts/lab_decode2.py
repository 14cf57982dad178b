"""Lab: decode-kernel round-3 candidates vs gemm_exact (the x8 kernel).

The on-chip campaign measured the x8 exact kernel at ~50 us against a
~42 us DMA floor (docs/PERF_NOTES.md); the remaining gap is [TM, TN]
epilogue/fixup VPU work plus the f32 scale traffic.  Three candidates,
each **bit-identical** to gemm_exact by construction (power-of-2 scaling
is exact in IEEE f32; int dots are exact; per-block epilogue order kept):

* ``noshift`` — drop the per-hi-block ``>> 4`` fixup by storing the hi
  plane's scales pre-divided (``d_hi/16``) and compensating with
  ``16*s_a``: ``fl((d/16) * (16*t))  ==  fl(d * t)`` exactly, because
  both rescalings are exact powers of two (no over/underflow at these
  magnitudes).  Saves one i32 [TM, TN] op per hi block.
* ``u16`` — scales stored as raw IEEE-f16 BITS in int16 (18 B per 32
  weights — exactly GGUF density) and expanded in-kernel with exact bit
  math: ``f32 = bitcast((h & 0x7FFF) << 13 | (h & 0x8000) << 16) *
  2**112`` (the subnormal case falls out of the same multiply).  Halves
  scale DMA (~10% of decode traffic); decode cost is O(KB*TN) = 1/32 of
  the packed elements.  Rejected in round 1 while the kernel was
  compute-bound; the x8 kernel is now near the DMA floor.
* ``diag4`` — contract FOUR 32-blocks per MXU dot: the activation codes
  for 4 adjacent blocks are laid block-diagonally into [4*TM, 128] so a
  single K=128 ``dot_general`` returns the four per-block ``sumi``
  stacked on the M axis (rows g*TM..(g+1)*TM = block g).  4x fewer, 4x
  deeper MXU dispatches; the masking runs on [4, TM, 128] int8 = noise.

``combo`` stacks whichever of the three survive.  Usage:
``python scripts/lab_decode2.py [M] [--verify-only]``.
"""

from __future__ import annotations

import functools
import sys

import jax

if "--cpu" in sys.argv:  # axon force-selects itself; override post-import
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from quant_gemm_tpu.formats import jax_quant, numpy_ref
from quant_gemm_tpu.formats.blocks import QK
from quant_gemm_tpu.harness import benchmark as bm
from quant_gemm_tpu.harness import datagen
from quant_gemm_tpu.kernels import gemm_pallas
from quant_gemm_tpu.kernels.gemm_exact import _int_dot, gemm_exact
from quant_gemm_tpu.kernels.gemm_pallas import pad_activation_k, pad_scales_k
from quant_gemm_tpu.ref import gemm as refg
from quant_gemm_tpu.utils import round_up

F16_SCALE = float(np.float32(2.0) ** 112)  # exact


def _expand_f16_bits(h: jax.Array) -> jax.Array:
    """int16 raw IEEE-f16 bits -> exact f32 (normals, subnormals, zero).

    ``(h & 0x7FFF) << 13`` places the f16 exponent/mantissa in the f32
    fields with exponent bias still 15; multiplying by 2**112 (= 2**(127-15))
    rebiases EXACTLY, and for f16 subnormals the same multiply scales the
    f32-subnormal reading ``m * 2**-136`` to the correct ``m * 2**-24``.
    Inf/NaN (e=31) excluded by the quantizers (clamped to +-F16_MAX).
    """
    u = h.astype(jnp.int32) & 0xFFFF
    bits = ((u & 0x7FFF) << 13) | ((u & 0x8000) << 16)
    return jax.lax.bitcast_convert_type(bits, jnp.float32) * F16_SCALE


def _diag4(qa_g: jax.Array) -> jax.Array:
    """[TM, 128] int8 (4 blocks of 32) -> block-diagonal [4*TM, 128]."""
    tm = qa_g.shape[0]
    rep = jnp.broadcast_to(qa_g[None], (4, tm, 128))
    col_g = jax.lax.broadcasted_iota(jnp.int32, (4, tm, 128), 2) // QK
    row_g = jax.lax.broadcasted_iota(jnp.int32, (4, tm, 128), 0)
    return jnp.where(col_g == row_g, rep, jnp.int8(0)).reshape(4 * tm, 128)


def _kernel_v(*refs, tkb, tkp, nkt, noshift, u16, diag4):
    """q4_0 decode kernel with the three candidates toggleable.

    Ref order: packed, d_lo, d_hi, qa, da, sa, sq, out.  With ``noshift``
    d_hi arrives pre-divided by 16 and sa(hi slice) pre-multiplied by 16
    is NOT needed: the 16x rides in sumi instead, and the kernel keeps
    the plain ``- 8*s_a`` epilogue by scaling s_a in-kernel per hi block
    via the exact ``16*s_a`` (one [TM,1] op, nearly free) -- no, simpler:
    the host passes ONE sa array and the kernel multiplies the hi plane's
    da/sa slices by 16/16... Cleanest exact form used here:

        hi: f = (raw + 128*sq) [int32, == 16*sumi]
            acc += (d/16) * (da * f - 8 * (16*sa))

    where ``16*sa`` is computed in-kernel on the [tkb, TM] slice (exact,
    power of two, tiny).
    """
    it = iter(refs)
    packed_ref = next(it)
    dlo_ref, dhi_ref = next(it), next(it)
    qa_ref, da_ref, sa_ref, sq_ref = next(it), next(it), next(it), next(it)
    out_ref = refs[-1]

    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = packed_ref[:]
    lo, hi = p & jnp.int8(0x0F), p & jnp.int8(-16)

    def plane(qw, d_ref, koff, fixup):
        qa = qa_ref[:, pl.ds(koff * tkp, tkp)]
        da = da_ref[pl.ds(koff * tkb, tkb), :]
        sa = sa_ref[pl.ds(koff * tkb, tkb), :]
        sq = sq_ref[pl.ds(koff * tkb, tkb), :]
        if fixup and noshift:
            sa = sa * 16.0  # exact
        acc = jnp.zeros_like(out_ref)
        d = _expand_f16_bits(d_ref[:]) if u16 else d_ref[:]
        if fixup and noshift:
            d = d * 0.0625  # exact: d/16
        if diag4:
            sumis = []
            for g in range(tkb // 4):
                res = _int_dot(_diag4(qa[:, g * 128:(g + 1) * 128]),
                               qw[g * 128:(g + 1) * 128, :])
                sumis.extend(
                    res[j * out_ref.shape[0]:(j + 1) * out_ref.shape[0], :]
                    for j in range(4))
        else:
            sumis = [
                _int_dot(qa[:, b * QK:(b + 1) * QK],
                         qw[b * QK:(b + 1) * QK, :])
                for b in range(tkb)
            ]
        for b in range(tkb):
            raw = sumis[b]
            if fixup:
                raw = raw + 128 * sq[b, :][:, None]
                if not noshift:
                    raw = raw >> 4
            sumi = raw.astype(jnp.float32)
            acc += d[b, :][None, :] * (
                da[b, :][:, None] * sumi - 8.0 * sa[b, :][:, None]
            )
        return acc

    out_ref[:] += plane(lo, dlo_ref, kt, False)
    out_ref[:] += plane(hi, dhi_ref, kt + nkt, True)


def gemm_v(w, a_q, *, d16_t=None, tn=4096, tkp=512, noshift=False,
           u16=False, diag4=False, interpret=False):
    m, k = a_q.qs.shape
    kdim = w.packed_t.shape[0]
    tkp = min(tkp, kdim)
    while kdim % tkp:
        tkp //= 2
    tkb = tkp // QK
    nkt = kdim // tkp
    tm = round_up(m, 8)
    np_ = w.packed_t.shape[1]
    tn = min(tn, np_)
    tn -= tn % 128
    while np_ % tn:
        tn -= 128

    def padm(x):
        x = jnp.asarray(x)
        pr = tm - x.shape[0]
        return jnp.pad(x, ((0, pr), (0, 0))) if pr else x

    qa = pad_activation_k(padm(a_q.qs), k, kdim, True)
    da_t = pad_scales_k(padm(a_q.d).astype(jnp.float32), k, kdim, True).T
    sa_t = pad_scales_k(padm(a_q.s).astype(jnp.float32), k, kdim, True).T
    sumq = jnp.asarray(a_q.qs, jnp.int32).reshape(m, k // QK, QK).sum(-1)
    sq_t = pad_scales_k(padm(sumq), k, kdim, True).T

    d_arr = d16_t if u16 else w.d_t

    def wspec(bs, off=0):
        return pl.BlockSpec(bs, lambda nt, kt, o=off: (kt + o, nt),
                            memory_space=pltpu.VMEM)

    def full_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda nt, kt: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_v, tkb=tkb, tkp=tkp, nkt=nkt,
                          noshift=noshift, u16=u16, diag4=diag4),
        grid=(np_ // tn, nkt),
        in_specs=[
            wspec((tkp, tn)),
            wspec((tkb, tn)),
            wspec((tkb, tn), off=nkt),
            full_spec(qa), full_spec(da_t), full_spec(sa_t),
            full_spec(sq_t),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tm, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(w.packed_t, d_arr, d_arr, qa, da_t, sa_t, sq_t)
    return out[:m, : w.n]


VARIANTS = {
    "noshift": dict(noshift=True),
    "u16": dict(u16=True),
    "diag4": dict(diag4=True),
    "nd": dict(noshift=True, diag4=True),
    "combo": dict(noshift=True, u16=True, diag4=True),
}


def _chain_all(out, args):
    """Perturb EVERY float leaf (never-true NaN predicate).

    The harness default perturbs only the FIRST float leaf — wp.d_t here —
    which the u16 variant never reads (it uses the closed-over f16-bit
    array instead), so XLA hoisted the whole kernel out of the timing
    loop and reported ~0 us.  Chaining through a_q.d (used by every
    variant) keeps the loop-carried dependence real for all of them.
    """
    import jax

    p = jnp.isnan(bm._consume(out))
    leaves, treedef = jax.tree.flatten(args)
    for i, leaf in enumerate(leaves):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            leaves[i] = jnp.where(p, leaf + 1, leaf)
    return jax.tree.unflatten(treedef, leaves)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    verify_only = "--verify-only" in sys.argv
    m = int(args[0]) if args else 4
    n_feat, k = 4096, 14336
    interp = jax.default_backend() == "cpu"
    print(f"shape: out-features {n_feat} x tokens {m} x K {k} "
          f"(backend={jax.default_backend()})", flush=True)

    wf = datagen.normal((n_feat, k), seed=2)
    af = datagen.normal((m, k), seed=1)
    w_q = numpy_ref.quantize_q4_0(wf)
    a_q = jax_quant.device_put(numpy_ref.quantize_q8_1(af))
    wp = jax.device_put(gemm_pallas.prepare(w_q))
    # f16-bit scales, K-major, same padding as d_t (pad rows are +0.0 in
    # f16 bits = 0x0000 = exact zero after expansion)
    d16 = np.asarray(w_q.d, np.float16).view(np.int16)
    kb_pad = wp.d_t.shape[0] // 2  # per-plane padded block rows
    nb = d16.shape[1]
    half = nb // 2  # lo-plane blocks per row? no: d_t stacks lo;hi planes
    # prepare() stores d_t as [2*kb_pad, Np]: lo-plane blocks then hi-plane
    # blocks, each zero-padded to kb_pad rows.  Rebuild identically from
    # the f16 bits by replicating its layout decisions via the f32 d_t:
    # safer -- bit-pattern roundtrip through the existing f32 array.
    d32 = np.asarray(wp.d_t, np.float32)
    d16_t = jnp.asarray(np.asarray(d32, np.float16).view(np.int16))
    # exactness of the rebuild: every stored scale is an f16-upcast, so
    # f32 -> f16 is lossless here
    assert np.array_equal(
        np.asarray(d16_t, np.int16).view(np.float16).astype(np.float32), d32)

    golden = refg.gemm_fp32(af, wf)
    base = np.asarray(gemm_exact(wp, a_q, tn=4096, tkp=512,
                                 interpret=interp))

    ok = True
    for name, kw in VARIANTS.items():
        out = np.asarray(gemm_v(wp, a_q, d16_t=d16_t, interpret=interp,
                                **kw))
        eq = np.array_equal(base, out)
        print(f"{name:8s} bit-identical to gemm_exact: {eq}", flush=True)
        if not eq:
            bad = np.abs(base - out)
            print("  max abs diff:", bad.max(), "at",
                  np.unravel_index(bad.argmax(), bad.shape))
            ok = False
    if not ok or verify_only:
        sys.exit(0 if ok else 1)

    flops = bm.gemm_flops(m, n_feat, k)
    wbytes = bm.weight_bytes("q4_0", n_feat, k)
    total_bytes = wbytes + m * k + m * n_feat * 4

    cases = [("base", lambda w, aq: gemm_exact(w, aq, tn=4096, tkp=512))]
    for name, kw in VARIANTS.items():
        cases.append((name, functools.partial(
            gemm_v, d16_t=d16_t, tn=4096, tkp=512, **kw)))

    results = []
    for rep in range(5):
        for name, fn in cases:
            r = bm.benchmark_kernel(fn, (wp, a_q), name=f"{name} #{rep}",
                                    flops=flops, bytes_accessed=total_bytes,
                                    chain=_chain_all)
            results.append(r)
            print(f"{r.row()}  roofline={r.gbps / 9.0:.0f}%", flush=True)

    print("\nbest:", flush=True)
    for r in sorted(results, key=lambda t: t.time_s)[:5]:
        print(f"  {r.row()}")


if __name__ == "__main__":
    main()
