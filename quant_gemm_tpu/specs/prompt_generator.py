"""Kernel implementation-guide generator — turn a definition JSON into a
complete, self-contained Pallas/TPU implementation brief.

TPU-native analogue of the reference's prompt generator
(python/operators/kernel_prompt_generator.py:124-791), which renders a CUDA
implementation guide (formats, signatures, pybind template, pitfalls,
checklist) from a spec.json.  This version renders the TPU counterpart:
block-format layout tables, the SoA device layout, a ``pallas_call``
skeleton, Mosaic/MXU pitfalls, and the differential-test checklist — so a
new kernel variant (human- or LLM-written) starts from the same contract
the committed kernels satisfy.

CLI::

    python -m quant_gemm_tpu.specs.prompt_generator gemm/q4_0_q8_1
    python -m quant_gemm_tpu.specs.prompt_generator --all -o docs/guides/
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import textwrap

from ..formats.blocks import QK, SPECS

HERE = pathlib.Path(__file__).parent

_LAYOUTS = {
    "q4_0": "18 B = f16 d | 16 B qs (byte j: elem j low nibble, elem j+16 high)",
    "q4_1": "20 B = f16 d | f16 m | 16 B qs (nibble interleave as q4_0)",
    "q5_0": "22 B = f16 d | u32 qh (bit i -> elem i 5th bit) | 16 B qs",
    "q5_1": "24 B = f16 d | f16 m | u32 qh | 16 B qs",
    "q8_0": "34 B = f16 d | 32 B qs (sequential int8)",
    "q8_1": "36 B = f16 d | f16 s=d*sum(q) | 32 B qs (sequential int8)",
}

_SOA = {
    "q4_0": "packed u8[K/2, N] (K-major planar: byte (c,n) = elems c / c+K/2)"
            " + d f32[K/32, N]",
    "q4_1": "packed u8[K/2, N] + d f32[K/32, N] + m f32[K/32, N]",
    "q5_0": "packed u8[K/2, N] + qh u8[K/8, N] (planar 5th bits) + d",
    "q5_1": "packed u8[K/2, N] + qh u8[K/8, N] + d + m",
    "q8_0": "qs i8[K, N] + d f32[K/32, N]",
    "q8_1": "qs i8[M, K] + d f16[M, K/32] + s f16[M, K/32] (activations stay"
            " row-major; scales fold outside the kernel or ride transposed"
            " [K/32, M] for the exact kernel)",
}

_PITFALLS = """\
## TPU pitfalls (every one of these has bitten a committed kernel)

1. **Block shapes**: the last two dims of every BlockSpec block must be
   divisible by (8, 128) or equal to the array dims.  A [M, K/32] per-block
   vector does NOT tile on the lane dim — pass it transposed [K/32, M].
2. **Mosaic legalization**: int8 vector shifts don't legalize; do bit ops on
   i32 lanes (`astype(jnp.int32)` first).  u8 -> f32 casts must hop through
   i32.  `jnp.repeat` along sublanes is free; lane-dim reshapes are not.
3. **Dot precision**: f32 operands with `Precision.HIGHEST` run multi-pass
   (accurate, slow); DEFAULT rounds inputs to bf16 in one pass.  Explicit
   `.astype(jnp.bfloat16)` before the dot costs real VPU time — pass f32 and
   let the MXU round (measured 58.7 vs 79.8 us, docs/PERF_NOTES.md).
4. **Per-element VPU work is the decode bottleneck**: raw-code int8 MXU dots
   (exact kernel) beat dequant-then-matmul for M <= 12 because they skip the
   ~6 dequant ops per weight element.
5. **Rounding**: quantizers use round-half-to-EVEN (`np.rint` / `jnp.rint`),
   matching CUDA `__float2int_rn` (/root/reference include/quantize.h:250) and
   this repo's convention (docs/CONVENTIONS.md, utils.round_nearest_even).
   Do NOT use `floor(x + 0.5)`-style away-from-zero rounding — it differs on
   exact .5 ties and fails the bit-equality tests.
6. **Q8_1 sum**: s = f16(d * sum(q)) (llama.cpp-exact), NOT sum(x).
7. **fori_loop / scan only**: no data-dependent Python control flow; grids
   and block shapes are static.  K-innermost grid with an f32 VMEM-resident
   output block is the standard reduction pattern.
"""

_SKELETON = """\
## pallas_call skeleton (K-innermost reduction grid)

```python
def kernel(*refs):
    # unpack refs in in_specs order; out_ref = refs[-1]
    @pl.when(pl.program_id(<k_axis>) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
    packed = packed_ref[:].astype(jnp.int32)
    lo, hi = packed & 0xF, packed >> 4          # planar nibble unpack
    ...                                          # epilogue: see formula
    out_ref[:] += ...

out = pl.pallas_call(
    kernel,
    grid=(M // TM, N // TN, Kp // TKP),          # K innermost
    in_specs=[pl.BlockSpec((TKP, TN), lambda mt, nt, kt: (kt, nt),
                           memory_space=pltpu.VMEM), ...],
    out_specs=pl.BlockSpec((TM, TN), lambda mt, nt, kt: (mt, nt),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
    compiler_params=pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary")),
)(*operands)
```
"""


def _fmt_table(names) -> str:
    rows = ["| format | bits | B/block | B/elem | layout (AoS byte-exact) |",
            "|---|---|---|---|---|"]
    for nm in names:
        s = SPECS[nm]
        rows.append(
            f"| {nm} | {s.bits} | {s.block_bytes} | {s.bytes_per_elem:.4g} "
            f"| {_LAYOUTS[nm]} |"
        )
    return "\n".join(rows)


def _quant_formulas(d: dict) -> str:
    qs = d.get("quantization_spec", {})
    out = []
    for nm, spec in qs.items():
        out.append(f"* **{nm}**: quantize `{spec.get('quantize', '-')}`; "
                   f"dequantize `{spec.get('dequantize', '-')}`"
                   + (f"  ({spec['note']})" if "note" in spec else ""))
    return "\n".join(out) or "(float op — no quantization spec)"


def generate(defn: dict) -> str:
    """Render one definition JSON into a markdown implementation guide."""
    name = defn["name"]
    fmts = sorted(
        {v["dtype"] for v in defn.get("inputs", {}).values()
         if v.get("dtype") in SPECS}
    )
    axes = "\n".join(
        f"* `{k}`: {v.get('description', '')}"
        + (f" (const = {v['value']})" if v.get("type") == "const" else "")
        for k, v in defn.get("axes", {}).items()
    )
    shapes = "\n".join(
        f"* input `{k}`: shape {v['shape']}, dtype `{v['dtype']}` — "
        f"{v.get('description', '')}"
        for k, v in defn.get("inputs", {}).items()
    ) + "\n" + "\n".join(
        f"* output `{k}`: shape {v['shape']}, dtype `{v['dtype']}`"
        for k, v in defn.get("outputs", {}).items()
    )
    acc = defn.get("accuracy", {})
    epilogue = defn.get("epilogue")
    parts = [
        f"# Implementation guide: `{name}`",
        "",
        defn.get("description", ""),
        "",
        "## Axes",
        axes,
        "",
        "## Tensors",
        shapes,
        "",
        "## Block formats",
        _fmt_table(fmts) if fmts else "(none — float operator)",
        "",
        "### Quantization math",
        _quant_formulas(defn),
        "",
    ]
    if epilogue:
        parts += [
            "## Epilogue (the formula the kernel must evaluate per block)",
            f"```\n{epilogue}\n```",
            "Accumulate in f32 across K blocks; scales are f16-stored, "
            "f32-upcast at kernel entry.",
            "",
        ]
    if fmts:
        parts += [
            "## Device layout (SoA — the serialized AoS form exists only at "
            "the GGUF boundary)",
            "\n".join(f"* **{f}**: {_SOA[f]}" for f in fmts),
            "",
        ]
    parts += [
        _SKELETON,
        _PITFALLS,
        "## Acceptance checklist",
        textwrap.dedent(f"""\
            - [ ] interpret-mode output matches the numpy golden
                  (`ref.gemm` / `ops.*_ref`) on `params` shapes
            - [ ] {acc.get('metric', 'nmse_vs_fp32')} < {acc.get('threshold', 0.015)}
                  on data `{acc.get('data', 'normal(0, 0.5), seed 42')}`
            - [ ] constraints hold: {', '.join(defn.get('constraints', [])) or '-'}
            - [ ] odd M/N handled by padding (slice back before return)
            - [ ] registered in `kernels/registry.KERNELS` + a solution JSON
                  in `specs/solutions/`
            - [ ] raced against the incumbents in `scripts/perf_lab.py`
                  (interleaved repeats — the shared chip has ±10% variance)
            """),
        "",
        "## Solution JSON template",
        "```json",
        json.dumps(
            {
                "definition": name,
                "name": f"{name}_<variant>",
                "language": "python+pallas",
                "target": "tpu_v5e",
                "entry_point": "quant_gemm_tpu.kernels.<module>::<fn>",
                "perf": {"shape": defn.get("params", {}), "tflops": None},
            },
            indent=2,
        ),
        "```",
    ]
    return "\n".join(parts)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("spec", nargs="?", help="e.g. gemm/q4_0_q8_1")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("-o", "--out", help="file (single) or directory (--all)")
    args = ap.parse_args(argv)
    defs = HERE / "definitions"
    if args.all:
        outdir = pathlib.Path(args.out) if args.out else None
        for p in sorted(defs.rglob("*.json")):
            text = generate(json.loads(p.read_text()))
            if outdir:
                outdir.mkdir(parents=True, exist_ok=True)
                (outdir / f"{p.stem}.md").write_text(text)
                print(f"wrote {outdir / (p.stem + '.md')}")
            else:
                print(text, "\n\n---\n")
        return 0
    if not args.spec:
        ap.error("pass a spec path like gemm/q4_0_q8_1, or --all")
    p = defs / f"{args.spec}.json"
    text = generate(json.loads(p.read_text()))
    if args.out:
        pathlib.Path(args.out).write_text(text)
        print(f"wrote {args.out}")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
