"""Decode layer megakernels: whole transformer-layer GEMM chains in ONE
Pallas call each.

Motivation (round-4 serving-floor attack, docs/PERF_NOTES.md): the 1.2B
serving decode step runs its 65 per-layer GEMM dispatches at 55-85% of
their own DMA probes.  The residual is not any single kernel's epilogue —
it is the *seams*: each ``pallas_call`` pays a pipeline prologue (first
tile DMA with no compute to hide it), an XLA dispatch gap, and a separate
activation-quantize pass.  The reference pays the same class of cost per
``cudaLaunchKernel`` and amortizes it with streams; a TPU core is
single-threaded, so the TPU-native fix is to make the weight stream
CONTINUOUS: fuse the sequential GEMMs of a layer into one kernel whose
grid walks all of their weight tiles back to back, with the elementwise
glue (RMSNorm, SiLU*mul, residual adds, Q8_1 re-quantization) computed
in-kernel between stages while the next stage's weights stream in.

Two kernels cover a llama layer at decode (M = batch <= 8, T = 1):

* :func:`norm_qkv` — attn RMSNorm + Q8_1 quantize + the fused-QKV
  projection (stage grid: N tiles of wqkv); covers every 4/5-bit
  serving format: q4_0, the min-plane formats (q4_1 + the K-quant
  effective containers Q4_K_M/Q5_K_M GGUFs load — the min term rides
  the same merged epilogue dot as gemm_exact), and the q5 family via
  the nibble-packed qh2 plane;
* :func:`attn_tail` — everything after attention: wo projection +
  residual + mlp RMSNorm + quantize + gate/up projection + SiLU*mul +
  re-quantize + down projection + residual, in one call (stage grid:
  N tiles of wo, then gate/up tile PAIRS of wgu, then K tiles of w_down).

The multi-stage grid rides the standard Pallas pipeline with *clamped*
index maps: outside its stage a weight's block index is pinned to its
last (or first) tile, and the pipeline's revisiting dedup skips the DMA
for repeated indices — so every weight tile is fetched exactly once, in
stage order, with cross-stage overlap (the next stage's first tile
streams while the previous stage's last tile computes) and ZERO manual
DMA.  All GEMM math reuses the exact x8 int8-MXU machinery from
:mod:`gemm_exact` with the SAME tile shapes and accumulation order as
the unfused dispatch path, so each stage's output is bit-identical to
quantize-then-``gemm_exact`` given the same float input; the in-kernel
RMSNorm/SiLU mirror ``ops.rms_norm``/``ops.activations.silu_mul``
formula-for-formula (ulp-level backend differences aside).

Reference parity: this plays the role of the reference's fused
dequant+GEMM+epilogue chain (kernels/gemm/gemm_fused.cuh) taken to the
layer level; there is no CUDA counterpart — it is the TPU-shaped answer
to launch-overhead amortization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.blocks import QK
from .gemm_exact import (
    _f32_dot_bt,
    _merged_epilogue,
    _quant_block_q8_1,
    _scaled_block_sums,
    _stacked_da,
)
from .gemm_pallas import PreparedWeight, _interpret_default, scale_f32

# Serving-path switches (bench_serve --mega on/off A/Bs them end-to-end).
# Round-5 on-chip adjudication (scripts/lab_mega.py, 5-rep interleaved
# medians at dim 2048 / d_ff 8192 / M=8 on v5e):
#   norm_qkv   15.2 us vs unfused chain 17.9 us  -> +2.7 us/layer: KEEP
#   attn_tail  61.8 us vs unfused chain 60.7 us  -> -1.0 us/layer: OFF
# The tail's three GEMMs already stream back to back under XLA dispatch;
# serializing them into one grid bought nothing and cost a point of
# pipelining, so only the qkv megakernel ships enabled.
ENABLED = True        # master switch (off = no megakernels anywhere)

# Mirrors gemm_exact's QGT_FUSECOMP default (r5 measured win) so the
# megakernel stays bit-identical to the unfused dispatch it replaces.
import os as _os  # noqa: E402

_FUSECOMP = _os.environ.get("QGT_FUSECOMP", "1") == "1"
ENABLE_QKV = True     # norm+quantize+wqkv in one Pallas call (measured win)
ENABLE_TAIL = False   # post-attention tail megakernel (measured loss)

_TM = 8  # decode row tile: batch <= 8 rides one MXU/VPU sublane tile


def _rms(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """In-kernel twin of ``ops.rms_norm.rms_norm`` (same op order)."""
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * w


def _silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def _quantize_rows(h: jax.Array, nb: int):
    """Q8_1-quantize [TM, nb*32] f32 rows (bit-identical to jax_quant).

    Returns (qa int8 [TM, nb*32], da/sa f32 [nb, TM], sq int32 [nb, TM])
    in the transposed per-block layout the exact epilogue slices.
    """
    blocks = [_quant_block_q8_1(h[:, b * QK:(b + 1) * QK]) for b in range(nb)]
    qa = jnp.concatenate([blk[0] for blk in blocks], axis=1)
    da = jnp.concatenate([blk[1] for blk in blocks], axis=1).T
    sa = jnp.concatenate([blk[2] for blk in blocks], axis=1).T
    sq = jnp.concatenate([blk[3] for blk in blocks], axis=1).T
    return qa, da, sa, sq


def _plane(qw, d_tile, qa, da, sa, sq, offset: int, fixup: bool,
           m_tile=None, qw2=None, mult2=0):
    """One nibble plane of the exact 4/5-bit GEMM — mirrors ``_kernel``'s
    ``plane`` (gemm_exact.py) for the stacked-8 x8 path, operation for
    operation, so outputs are bit-identical to the unfused kernel.
    ``m_tile`` is the min plane of q4_1/q5_1 / K-quant-effective weights
    (one exact ``s_a @ m`` dot per tile, same hoist as gemm_exact);
    ``qw2``/``mult2`` the q5 5th-bit plane combined at int32."""
    tkb = d_tile.shape[0]
    d = scale_f32(d_tile)
    if fixup:
        d = d * 0.0625  # exact "noshift" rescale (see gemm_exact)
    coeff = None
    if fixup:
        coeff = 128.0 * (da * sq.astype(jnp.float32))
    if offset:
        t = float(offset * (16 if fixup else 1)) * sa
        coeff = -t if coeff is None else coeff - t
    acc = jnp.zeros((qa.shape[0], qw.shape[1]), jnp.float32)

    def v_of(t):  # stack8 dense scaling — same ops as gemm_exact at M=8
        return _stacked_da(da[t * 4:(t + 1) * 4, 0:_TM], _TM)

    c_of = None
    if _FUSECOMP and coeff is not None and m_tile is None:
        # mirror gemm_exact's fused compensation default (r5): the
        # per-block terms ride the stacked dense epilogue —
        # s = d * (da*sumi + c), the golden's own parenthesization —
        # instead of a merged f32 MXU dot per tile
        cf = coeff
        coeff = None

        def c_of(t):
            return _stacked_da(cf[t * 4:(t + 1) * 4, 0:_TM], _TM)

    acc = _scaled_block_sums(qa, qw, tkb, d, da, acc, v_of, span=1,
                             rows=_TM, qw2=qw2, mult2=mult2, c_of=c_of)
    # hoisted terms returned as pieces; the caller contracts BOTH planes'
    # in one merged f32 dot (_merged_epilogue — same op order as _kernel)
    pieces = []
    if coeff is not None:
        pieces.append((coeff, d))
    if m_tile is not None:
        pieces.append((sa, scale_f32(m_tile)))
    return acc, pieces


def _gemm_step(packed_tile, dlo_tile, dhi_tile, qa_ref, da_s, sa_s, sq_s,
               koff_lo, tkp: int, tkb: int, nkt: int, offset: int = 8,
               mlo_tile=None, mhi_tile=None, qh2_tile=None):
    """lo-plane + hi-plane exact GEMM for one weight tile.

    ``qa_ref``/scale refs hold the FULL activation (scratch); ``koff_lo``
    is the lo plane's K offset in grid-step units (the hi plane sits
    ``nkt`` further, as in the unfused kernel's ``kt`` / ``kt + nkt``).
    ``offset`` is the format's code offset (8 for q4_0, 16 for q5_0, 0
    for the min-plane formats); ``mlo/mhi_tile`` the optional min planes;
    ``qh2_tile`` the nibble-packed 5th-bit plane (q5 family — mask-only
    decode, sumi = nib_dot + 16*h_dot at int32, as gemm_exact qh2 mode).
    Returns (acc_lo, acc_hi, merged) — merged is the one contracted
    hoisted-terms dot (or None) — so callers can keep the unfused path's
    ``out += lo; out += hi; out += merged`` accumulation order bit-exactly.
    """
    lo = packed_tile & jnp.int8(0x0F)
    hi = packed_tile & jnp.int8(-16)
    h_lo = h_hi = None
    if qh2_tile is not None:
        h_lo = qh2_tile & jnp.int8(0x0F)
        h_hi = qh2_tile & jnp.int8(-16)
    a_lo, p_lo = _plane(lo, dlo_tile, qa_ref[:, pl.ds(koff_lo * tkp, tkp)],
                        da_s[pl.ds(koff_lo * tkb, tkb)],
                        sa_s[pl.ds(koff_lo * tkb, tkb)],
                        sq_s[pl.ds(koff_lo * tkb, tkb)], offset, False,
                        mlo_tile, h_lo, 16 if h_lo is not None else 0)
    koff_hi = koff_lo + nkt
    a_hi, p_hi = _plane(hi, dhi_tile, qa_ref[:, pl.ds(koff_hi * tkp, tkp)],
                        da_s[pl.ds(koff_hi * tkb, tkb)],
                        sa_s[pl.ds(koff_hi * tkb, tkb)],
                        sq_s[pl.ds(koff_hi * tkb, tkb)], offset, True,
                        mhi_tile, h_hi, 16 if h_hi is not None else 0)
    return a_lo, a_hi, _merged_epilogue(p_lo + p_hi)


def _supported_w(w, k: int | None = None, n: int | None = None,
                 qtypes=("q4_0", "q4_1", "q4_k", "q5_0", "q5_1",
                         "q5_k")) -> bool:
    """4/5-bit PreparedWeight with unpadded planes (true K/N == stored).

    q4_0, the min-plane formats (q4_1 and the K-quant effective container
    a Q4_K_M GGUF actually loads), and the q5 family via the nibble-packed
    qh2 plane (the serving fast path's operand — a q5 weight prepared with
    build_qh2=False stays on the unfused dispatch)."""
    if not isinstance(w, PreparedWeight) or w.qtype not in qtypes:
        return False
    if w.packed_t is None:
        return False
    if w.qh_t is not None and getattr(w, "qh2_t", None) is None:
        return False
    kdim, np_ = w.packed_t.shape
    if 2 * kdim != w.k or np_ != w.n or kdim % 256:
        return False
    if k is not None and w.k != k:
        return False
    if n is not None and w.n != n:
        return False
    return True


def _pick_tn(np_: int, cap: int) -> int:
    tn = min(cap, np_)
    tn -= tn % 128
    while np_ % tn:
        tn -= 128
    return tn


# --------------------------------------------------------------------------
# Kernel A: attn RMSNorm + Q8_1 quantize + wqkv projection
# --------------------------------------------------------------------------


def _qkv_kernel(*refs, tkp, tkb, nb, eps, offset, has_min, has_qh):
    it = iter(refs)
    packed_ref, dlo_ref, dhi_ref = next(it), next(it), next(it)
    mlo_ref, mhi_ref = (next(it), next(it)) if has_min else (None, None)
    qh2_ref = next(it) if has_qh else None
    x_ref, nw_ref, out_ref = next(it), next(it), next(it)
    qa_s, da_s, sa_s, sq_s = next(it), next(it), next(it), next(it)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _prep():
        h = _rms(x_ref[:], nw_ref[:], eps)
        qa, da, sa, sq = _quantize_rows(h, nb)
        qa_s[:] = qa
        da_s[:] = da
        sa_s[:] = sa
        sq_s[:] = sq

    a_lo, a_hi, merged = _gemm_step(
        packed_ref[:], dlo_ref[:], dhi_ref[:], qa_s,
        da_s, sa_s, sq_s, 0, tkp, tkb, 1, offset,
        mlo_ref[:] if has_min else None,
        mhi_ref[:] if has_min else None,
        qh2_ref[:] if has_qh else None)
    out_ref[:] = a_lo
    out_ref[:] += a_hi
    if merged is not None:
        out_ref[:] += merged


def norm_qkv(w: PreparedWeight, x: jax.Array, norm_w: jax.Array, eps: float,
             interpret: bool | None = None) -> jax.Array:
    """``gemm_exact(w, q8_1(rms_norm(x, norm_w)))`` in one Pallas call.

    Decode shapes only (M <= 8, K-resident: the whole packed K in VMEM);
    the GEMM tiling matches the unfused dispatch (tn <= 1024 at these N)
    so the result is bit-identical to the separate-op path's GEMM given
    identical normed input.
    """
    if interpret is None:
        interpret = _interpret_default()
    m, k = x.shape
    assert _supported_w(w, k=k) and m <= _TM
    kdim, np_ = w.packed_t.shape
    tkb = kdim // QK
    nb = k // QK
    tn = _pick_tn(np_, 1024)
    if m < _TM:
        x = jnp.pad(x, ((0, _TM - m), (0, 0)))
    has_min = w.m_t is not None
    has_qh = w.qh_t is not None
    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((kdim, tn), lambda i: (0, i), memory_space=vm),
        pl.BlockSpec((tkb, tn), lambda i: (0, i), memory_space=vm),
        pl.BlockSpec((tkb, tn), lambda i: (1, i), memory_space=vm),
    ]
    operands = [w.packed_t, w.d_t, w.d_t]
    if has_min:
        in_specs += [
            pl.BlockSpec((tkb, tn), lambda i: (0, i), memory_space=vm),
            pl.BlockSpec((tkb, tn), lambda i: (1, i), memory_space=vm),
        ]
        operands += [w.m_t, w.m_t]
    if has_qh:
        # nibble-packed 5th-bit plane, one tile serves both planes
        in_specs.append(
            pl.BlockSpec((kdim, tn), lambda i: (0, i), memory_space=vm))
        operands.append(w.qh2_t)
    in_specs += [
        pl.BlockSpec((_TM, k), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=vm),
    ]
    operands += [x.astype(jnp.float32),
                 norm_w.astype(jnp.float32).reshape(1, k)]
    out = pl.pallas_call(
        functools.partial(_qkv_kernel, tkp=kdim, tkb=tkb, nb=nb, eps=eps,
                          offset={"q4_0": 8, "q5_0": 16}.get(w.qtype, 0),
                          has_min=has_min, has_qh=has_qh),
        grid=(np_ // tn,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_TM, tn), lambda i: (0, i),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((_TM, np_), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_TM, k), jnp.int8),
            pltpu.VMEM((nb, _TM), jnp.float32),
            pltpu.VMEM((nb, _TM), jnp.float32),
            pltpu.VMEM((nb, _TM), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*operands)
    return out[:m]


# --------------------------------------------------------------------------
# Kernel B: wo + residual + mlp RMSNorm + wgu + SiLU*mul + w_down + residual
# --------------------------------------------------------------------------


def _tail_kernel(wo_p_ref, wo_dlo_ref, wo_dhi_ref,
                 gu_p_ref, gu_dlo_ref, gu_dhi_ref,
                 wd_p_ref, wd_dlo_ref, wd_dhi_ref,
                 attn_ref, xres_ref, nw_ref, out_ref,
                 qa_a, da_a, sa_a, sq_a,      # quantized attn output
                 o_scr, xmid_scr,             # wo output, post-attn residual
                 qa_h, da_h, sa_h, sq_h,      # quantized mlp input
                 g_scr,                        # gate tile awaiting its up tile
                 qa_f, da_f, sa_f, sq_f,      # quantized ffn activation
                 *, dim, dff, eps,
                 tn_wo, tkp_wo, tkb_wo, nb_wo, s0,
                 tn_gu, tkp_gu, tkb_gu, s1,
                 tkp_wd, tkb_wd, nkt_wd, nb_ff, s2):
    i = pl.program_id(0)

    # ---- stage 0 (steps [0, s0)): wo projection over N tiles -------------
    @pl.when(i == 0)
    def _prep_attn():
        qa, da, sa, sq = _quantize_rows(attn_ref[:], nb_wo)
        qa_a[:] = qa
        da_a[:] = da
        sa_a[:] = sa
        sq_a[:] = sq

    @pl.when(i < s0)
    def _wo():
        a_lo, a_hi, merged = _gemm_step(
            wo_p_ref[:], wo_dlo_ref[:], wo_dhi_ref[:],
            qa_a, da_a, sa_a, sq_a, 0, tkp_wo, tkb_wo, 1)
        val = a_lo + a_hi
        if merged is not None:
            val = val + merged
        o_scr[:, pl.ds(i * tn_wo, tn_wo)] = val

    @pl.when(i == s0 - 1)
    def _prep_mlp():
        xm = xres_ref[:] + o_scr[:]
        xmid_scr[:] = xm
        h = _rms(xm, nw_ref[:], eps)
        qa, da, sa, sq = _quantize_rows(h, nb_wo)
        qa_h[:] = qa
        da_h[:] = da
        sa_h[:] = sa
        sq_h[:] = sq

    # ---- stage 1 (steps [s0, s1)): gate/up tile pairs of wgu -------------
    @pl.when((i >= s0) & (i < s1))
    def _wgu():
        j = i - s0
        a_lo, a_hi, merged = _gemm_step(
            gu_p_ref[:], gu_dlo_ref[:], gu_dhi_ref[:],
            qa_h, da_h, sa_h, sq_h, 0, tkp_gu, tkb_gu, 1)
        acc = a_lo + a_hi
        if merged is not None:
            acc = acc + merged

        @pl.when(j % 2 == 0)
        def _gate():
            g_scr[:] = acc

        @pl.when(j % 2 == 1)
        def _up():
            c = j // 2  # ffn chunk index (tn_gu columns)
            ff = _silu(g_scr[:]) * acc
            qa, da, sa, sq = _quantize_rows(ff, tn_gu // QK)
            qa_f[:, pl.ds(c * tn_gu, tn_gu)] = qa
            nbc = tn_gu // QK
            da_f[pl.ds(c * nbc, nbc)] = da
            sa_f[pl.ds(c * nbc, nbc)] = sa
            sq_f[pl.ds(c * nbc, nbc)] = sq

    # ---- stage 2 (steps [s1, s2)): w_down K grid + final residual --------
    @pl.when(i >= s1)
    def _wd():
        kt = i - s1

        @pl.when(kt == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        a_lo, a_hi, merged = _gemm_step(
            wd_p_ref[:], wd_dlo_ref[:], wd_dhi_ref[:],
            qa_f, da_f, sa_f, sq_f, kt, tkp_wd, tkb_wd, nkt_wd)
        out_ref[:] += a_lo
        out_ref[:] += a_hi
        if merged is not None:
            out_ref[:] += merged

        @pl.when(kt == nkt_wd - 1)
        def _residual():
            out_ref[:] += xmid_scr[:]


def attn_tail(attn_out: jax.Array, x_res: jax.Array, norm_w: jax.Array,
              wo: PreparedWeight, wgu: PreparedWeight, wd: PreparedWeight,
              eps: float, d_ff: int,
              interpret: bool | None = None) -> jax.Array:
    """The post-attention layer tail in one Pallas call.

    Computes (bit-identical GEMM stages, ulp-identical glue vs the
    unfused path)::

        o  = gemm_exact(wo, q8_1(attn_out))
        xm = x_res + o
        gu = gemm_exact(wgu, q8_1(rms_norm(xm, norm_w)))
        ff = silu(gu[:, :dff]) * gu[:, dff:]
        return xm + gemm_exact(wd, q8_1(ff))
    """
    if interpret is None:
        interpret = _interpret_default()
    m, dim = attn_out.shape
    assert m <= _TM and x_res.shape == (m, dim)
    # tail stages have no min-plane handling yet: q4_0 only
    assert _supported_w(wo, k=dim, n=dim, qtypes=("q4_0",))
    assert _supported_w(wgu, k=dim, n=2 * d_ff, qtypes=("q4_0",))
    assert _supported_w(wd, k=d_ff, n=dim, qtypes=("q4_0",))

    kdim = dim // 2
    tn_wo = _pick_tn(dim, 1024)
    s0 = dim // tn_wo
    tkb_wo = kdim // QK
    nb_wo = dim // QK

    tn_gu = _pick_tn(d_ff, 2048)  # must divide dff so pairs align
    n_pairs = d_ff // tn_gu
    s1 = s0 + 2 * n_pairs
    tkb_gu = tkb_wo
    nb_ff = d_ff // QK

    kdim_wd = d_ff // 2
    tkp_wd = min(512, kdim_wd)
    while kdim_wd % tkp_wd:
        tkp_wd //= 2
    tkb_wd = tkp_wd // QK
    nkt_wd = kdim_wd // tkp_wd
    s2 = s1 + nkt_wd

    if m < _TM:
        attn_out = jnp.pad(attn_out, ((0, _TM - m), (0, 0)))
        x_res = jnp.pad(x_res, ((0, _TM - m), (0, 0)))

    def clamp(v, lo, hi):
        return jnp.clip(v, lo, hi)

    def gperm(i):
        # wgu tile order: gate c, up c, gate c+1, ... (gate tiles sit in
        # cols [0, dff), up tiles in [dff, 2*dff) of the stored plane)
        j = clamp(i - s0, 0, 2 * n_pairs - 1)
        return (j // 2) + (j % 2) * n_pairs

    kernel = functools.partial(
        _tail_kernel, dim=dim, dff=d_ff, eps=eps,
        tn_wo=tn_wo, tkp_wo=kdim, tkb_wo=tkb_wo, nb_wo=nb_wo, s0=s0,
        tn_gu=tn_gu, tkp_gu=kdim, tkb_gu=tkb_gu, s1=s1,
        tkp_wd=tkp_wd, tkb_wd=tkb_wd, nkt_wd=nkt_wd, nb_ff=nb_ff, s2=s2,
    )
    vm = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(s2,),
        in_specs=[
            # wo planes: pinned to the last tile after stage 0
            pl.BlockSpec((kdim, tn_wo),
                         lambda i: (0, clamp(i, 0, s0 - 1)),
                         memory_space=vm),
            pl.BlockSpec((tkb_wo, tn_wo),
                         lambda i: (0, clamp(i, 0, s0 - 1)),
                         memory_space=vm),
            pl.BlockSpec((tkb_wo, tn_wo),
                         lambda i: (1, clamp(i, 0, s0 - 1)),
                         memory_space=vm),
            # wgu planes: gate/up pair order via gperm
            pl.BlockSpec((kdim, tn_gu), lambda i: (0, gperm(i)),
                         memory_space=vm),
            pl.BlockSpec((tkb_gu, tn_gu), lambda i: (0, gperm(i)),
                         memory_space=vm),
            pl.BlockSpec((tkb_gu, tn_gu), lambda i: (1, gperm(i)),
                         memory_space=vm),
            # w_down planes: K grid, pinned to tile 0 before stage 2
            pl.BlockSpec((tkp_wd, dim),
                         lambda i: (clamp(i - s1, 0, nkt_wd - 1), 0),
                         memory_space=vm),
            pl.BlockSpec((tkb_wd, dim),
                         lambda i: (clamp(i - s1, 0, nkt_wd - 1), 0),
                         memory_space=vm),
            pl.BlockSpec((tkb_wd, dim),
                         lambda i: (clamp(i - s1, 0, nkt_wd - 1) + nkt_wd, 0),
                         memory_space=vm),
            pl.BlockSpec((_TM, dim), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((_TM, dim), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((_TM, dim), lambda i: (0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((_TM, dim), jnp.float32),
        scratch_shapes=[
            vm((_TM, dim), jnp.int8),       # qa_a
            vm((nb_wo, _TM), jnp.float32),  # da_a
            vm((nb_wo, _TM), jnp.float32),  # sa_a
            vm((nb_wo, _TM), jnp.int32),    # sq_a
            vm((_TM, dim), jnp.float32),    # o_scr
            vm((_TM, dim), jnp.float32),    # xmid_scr
            vm((_TM, dim), jnp.int8),       # qa_h
            vm((nb_wo, _TM), jnp.float32),  # da_h
            vm((nb_wo, _TM), jnp.float32),  # sa_h
            vm((nb_wo, _TM), jnp.int32),    # sq_h
            vm((_TM, tn_gu), jnp.float32),  # g_scr
            vm((_TM, d_ff), jnp.int8),      # qa_f
            vm((nb_ff, _TM), jnp.float32),  # da_f
            vm((nb_ff, _TM), jnp.float32),  # sa_f
            vm((nb_ff, _TM), jnp.int32),    # sq_f
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(wo.packed_t, wo.d_t, wo.d_t,
      wgu.packed_t, wgu.d_t, wgu.d_t,
      wd.packed_t, wd.d_t, wd.d_t,
      attn_out.astype(jnp.float32), x_res.astype(jnp.float32),
      norm_w.astype(jnp.float32).reshape(1, dim))
    return out[:m]


_BYPASS_LOGGED: set = set()


def qkv_supported(lyr: dict, cfg, m: int) -> bool:
    """True when this layer's decode step can take the norm_qkv megakernel."""
    if not (ENABLED and ENABLE_QKV) or m > _TM:
        return False
    ok = cfg.dim % 512 == 0 and _supported_w(lyr.get("wqkv"), k=cfg.dim)
    if not ok:
        # loud (once per qtype/dim) so a served model silently losing the
        # megakernel speedup is visible in the server log (VERDICT r4 #5)
        w = lyr.get("wqkv")
        key = (getattr(w, "qtype", None), cfg.dim)
        if key not in _BYPASS_LOGGED:
            _BYPASS_LOGGED.add(key)
            import sys

            print(f"megalayer: norm_qkv bypassed (wqkv qtype={key[0]}, "
                  f"dim={cfg.dim}) — unfused dispatch path",
                  file=sys.stderr, flush=True)
    return ok


def tail_supported(lyr: dict, cfg, m: int) -> bool:
    """True when this layer's decode step can take the attn_tail megakernel."""
    if not (ENABLED and ENABLE_TAIL) or m > _TM:
        return False
    dim, dff = cfg.dim, cfg.d_ff
    if dim % 512 or dff % 512:
        return False
    return (
        _supported_w(lyr.get("wo"), k=dim, n=dim, qtypes=("q4_0",))
        and _supported_w(lyr.get("wgu"), k=dim, n=2 * dff, qtypes=("q4_0",))
        and _supported_w(lyr.get("w_down"), k=dff, n=dim, qtypes=("q4_0",))
    )


def layer_supported(lyr: dict, cfg, m: int) -> bool:
    """True when BOTH megakernels apply (lab/bench A/B convenience)."""
    return qkv_supported(lyr, cfg, m) and tail_supported(lyr, cfg, m)


__all__ = [
    "ENABLED", "ENABLE_QKV", "ENABLE_TAIL",
    "norm_qkv", "attn_tail",
    "qkv_supported", "tail_supported", "layer_supported",
]
