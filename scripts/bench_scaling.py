"""Multi-chip scaling validation + analytic efficiency projection.

One real chip is available in this environment, so this script does what
can be done honestly without a pod slice:

1. **Correctness at tp = 1/2/4/8** on a virtual CPU mesh: column- and
   row-parallel packed-weight GEMMs must match the unsharded kernel.
2. **Collective-schedule inspection**: the compiled HLO of each sharded
   program is scanned for the expected XLA collectives (all-gather /
   reduce-scatter / all-reduce) — the north star's comm pattern, verified
   to actually be emitted.
3. **Analytic tokens/s scaling projection** for the serving decode step:
   per-chip compute shrinks 1/tp while the row-parallel psum_scatter and
   column-parallel all-gather bytes ride ICI; efficiency = t_1 / (tp *
   t_tp).  Uses the measured single-chip step time and v5e ICI bandwidth.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/bench_scaling.py
"""

from __future__ import annotations

import os
import re
import sys

# the axon TPU plugin force-selects itself; override via jax.config (the
# same dance as tests/conftest.py)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from quant_gemm_tpu.formats import jax_quant, numpy_ref  # noqa: E402
from quant_gemm_tpu.harness import datagen  # noqa: E402
from quant_gemm_tpu.harness.metrics import ErrorMetrics  # noqa: E402
from quant_gemm_tpu.kernels import gemm_pallas  # noqa: E402
from quant_gemm_tpu.parallel import sharding as sh  # noqa: E402

# v5e: 4 ICI links/chip; ~100 GB/s effective per direction on a 2D torus
ICI_GBPS = 100.0
HBM_GBPS = 900.0


def collectives_in(fn, *args) -> dict:
    hlo = jax.jit(fn).lower(*args).compile().as_text()
    return {
        "all-gather": len(re.findall(r"all-gather", hlo)),
        "reduce-scatter": len(re.findall(r"reduce-scatter", hlo)),
        "all-reduce": len(re.findall(r"all-reduce", hlo)),
        "collective-permute": len(re.findall(r"collective-permute", hlo)),
    }


def overlap_report(fn, *args) -> dict:
    """Classify each collective in the compiled HLO as OVERLAPPED (async
    start/done pair with compute scheduled between) or BLOCKING.

    On XLA:CPU collectives always compile sync-form, so this wrapper can
    only ever report sync — the REAL verdict comes from
    :func:`tpu_overlap_aot`, which compiles for a v5e target devicelessly
    and scans the scheduled HLO with harness.aot.overlap_report.
    """
    from quant_gemm_tpu.harness import aot

    hlo = jax.jit(fn).lower(*args).compile().as_text()
    rep = aot.overlap_report(hlo)
    rep.pop("hidden_by", None)
    return rep


def tpu_overlap_aot(tp: int = 8, n: int = 1024, k: int = 2048,
                    m: int = 256) -> dict:
    """Compile the ring kernels for a REAL v5e target (deviceless AOT) and
    report scheduled overlap: every ppermute of the rotating Q8_1 chunk /
    partial-sum must enclose a Mosaic GEMM (tests/test_overlap.py pins it).
    """
    from collections import Counter

    from jax.sharding import NamedSharding, PartitionSpec as P

    from quant_gemm_tpu.harness import aot

    topo = aot.topology_mesh({"tp": tp})
    cmesh = sh.make_mesh({"tp": tp})
    w_q = numpy_ref.quantize_q4_0(datagen.normal((n, k), seed=1))

    def retarget(x):
        spec = x.sharding.spec if hasattr(x, "sharding") else P()
        return jax.ShapeDtypeStruct(
            np.shape(x), x.dtype, sharding=NamedSharding(topo, spec))

    sds_a = jax.ShapeDtypeStruct(
        (m, k), jnp.float32, sharding=NamedSharding(topo, P(None, "tp")))
    out = {}
    for mode, run in (
        ("col_ring", lambda sw, a: sh.gemm_col_parallel_ring(
            sw, a, topo, interpret=False)),
        ("row_ring", lambda sw, a: sh.gemm_row_parallel_ring(
            sw, a, topo, interpret=False)),
    ):
        sw = sh.shard_weight_ring(w_q, cmesh, mode=mode.split("_")[0])
        sds_st = jax.tree.map(retarget, sw.stacked)

        def fn(st, a, _mode=mode):
            return run(sh.ShardedWeight("q4_0", n, k, _mode, "tp", st), a)

        c = jax.jit(fn).lower(sds_st, sds_a).compile(aot.OVERLAP_OPTS)
        rep = aot.overlap_report(aot.compiled_hlo(c))
        hiders = Counter(
            h.rsplit("/", 1)[-1] for h in rep.pop("hidden_by")
        ).most_common(3)
        print(f"  {mode} (tp={tp}, {m}x{n}x{k} W4A8): {rep}; "
              f"hidden under {hiders}", flush=True)
        out[mode] = rep
    return out


def check_tp(n, k, m, tp) -> None:
    mesh = sh.make_mesh({"tp": tp})
    w = datagen.normal((n, k), seed=1)
    a = datagen.normal((m, k), seed=2)
    w_q = numpy_ref.quantize_q4_0(w)
    gold = np.asarray(gemm_pallas.gemm(gemm_pallas.prepare(w_q), jnp.asarray(a)))

    swc = sh.shard_weight(w_q, mesh, mode="col")
    out_c = np.asarray(
        sh.gemm_col_parallel(swc, jnp.asarray(a), mesh, gather_output=True)
    )
    mc = ErrorMetrics.compute(out_c, gold)
    assert mc.nmse < 1e-10, (tp, "col", mc)

    swr = sh.shard_weight(w_q, mesh, mode="row")
    out_r = np.asarray(sh.gemm_row_parallel(swr, jnp.asarray(a), mesh))
    mr = ErrorMetrics.compute(out_r, gold)
    assert mr.nmse < 1e-4, (tp, "row", mr)  # f32 partial-sum order differs

    col_hlo = collectives_in(
        lambda s, x: sh.gemm_col_parallel(
            sh.ShardedWeight(swc.qtype, swc.n, swc.k, "col", swc.axis, s),
            x, mesh, gather_output=True),
        swc.stacked, jnp.asarray(a),
    )
    row_hlo = collectives_in(
        lambda s, x: sh.gemm_row_parallel(
            sh.ShardedWeight(swr.qtype, swr.n, swr.k, "row", swr.axis, s),
            x, mesh, scatter_output=True),
        swr.stacked, jnp.asarray(a),
    )
    if tp > 1:
        assert col_hlo["all-gather"] >= 1, col_hlo  # output gather
        assert row_hlo["reduce-scatter"] + row_hlo["all-reduce"] >= 1, row_hlo
        ov = overlap_report(
            lambda s, x: sh.gemm_row_parallel(
                sh.ShardedWeight(swr.qtype, swr.n, swr.k, "row", swr.axis, s),
                x, mesh, scatter_output=True),
            swr.stacked, jnp.asarray(a),
        )
        print(f"tp={tp}: col nmse={mc.nmse:.1e} {col_hlo} | "
              f"row nmse={mr.nmse:.1e} {row_hlo} | row overlap {ov}",
              flush=True)
        return
    print(f"tp={tp}: col nmse={mc.nmse:.1e} {col_hlo} | "
          f"row nmse={mr.nmse:.1e} {row_hlo}", flush=True)


def time_ring_vs_psum(tp: int = 8, n: int = 1024, k: int = 4096,
                      m: int = 256, reps: int = 5) -> dict:
    """Measured ring/psum step-time ratios on the local device mesh.

    Single-chip environments cannot time ICI, but the RELATIVE cost of the
    ring decomposition vs the XLA-collective form on the 8-virtual-device
    CPU mesh anchors the scaling projection's claim that ring overlap is
    net-positive, and catches schedule regressions (VERDICT r3 item 8).
    Both forms run the same in/out shardings so only the collective
    strategy differs; Pallas kernels run interpret-mode on CPU, which
    inflates compute for BOTH forms equally.
    """
    import statistics
    import time

    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = sh.make_mesh({"tp": tp})
    w_q = numpy_ref.quantize_q4_0(datagen.normal((n, k), seed=1))
    a = jnp.asarray(datagen.normal((m, k), seed=2))
    a_ksh = jax.device_put(a, NamedSharding(mesh, P(None, "tp")))

    sw_col = sh.shard_weight(w_q, mesh, mode="col")
    sw_row = sh.shard_weight(w_q, mesh, mode="row")
    sw_colr = sh.shard_weight_ring(w_q, mesh, mode="col")
    sw_rowr = sh.shard_weight_ring(w_q, mesh, mode="row")

    cases = {
        # col: K-sharded float act in, N-sharded out.  psum form all-gathers
        # the activation first; ring rotates it under the chunk GEMMs.
        "col_psum": jax.jit(lambda x: sh.gemm_col_parallel(
            sw_col,
            jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, None))),
            mesh)),
        "col_ring": jax.jit(lambda x: sh.gemm_col_parallel_ring(
            sw_colr, x, mesh, quantize_act=False)),
        # row: K-sharded act in, N-sharded (reduce-scattered) out
        "row_psum": jax.jit(lambda x: sh.gemm_row_parallel(
            sw_row, x, mesh, scatter_output=True)),
        "row_ring": jax.jit(lambda x: sh.gemm_row_parallel_ring(
            sw_rowr, x, mesh, quantize_act=False)),
    }
    for fn in cases.values():  # compile + warm
        jax.block_until_ready(fn(a_ksh))
    times = {c: [] for c in cases}
    for _ in range(reps):  # interleaved
        for c, fn in cases.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(a_ksh))
            times[c].append(time.perf_counter() - t0)
    med = {c: statistics.median(ts) for c, ts in times.items()}
    print(f"\nmeasured ring vs psum (tp={tp}, {m}x{n}x{k} W4A16, "
          f"{jax.devices()[0].platform} mesh, median of {reps}):",
          flush=True)
    for pair in ("col", "row"):
        r, p = med[f"{pair}_ring"], med[f"{pair}_psum"]
        print(f"  {pair}: ring {r*1e3:7.2f} ms vs psum {p*1e3:7.2f} ms "
              f"-> ratio {r/p:.2f}x", flush=True)
    return med


def project(step_us_1chip: float, layers: int, dim: int, dff: int,
            batch: int, seq: int, kvh: int, hd: int) -> None:
    """Megatron-style per-layer comm: 2 all-reduces of [B, dim] f32 per
    layer (attn out-proj + FFN down, row-parallel psum)."""
    print(f"\nprojected decode scaling (1-chip step {step_us_1chip:.0f} us, "
          f"ICI {ICI_GBPS:.0f} GB/s eff):", flush=True)
    for tp in (2, 4, 8):
        # ring all-reduce moves 2*(tp-1)/tp of the payload per chip
        payload = batch * dim * 4
        comm_us = layers * 2 * (2 * (tp - 1) / tp * payload) / ICI_GBPS / 1e3
        compute_us = step_us_1chip / tp
        t_tp = max(compute_us, 0.0) + comm_us
        eff = step_us_1chip / (tp * t_tp)
        toks = batch / t_tp * 1e6
        print(f"  tp={tp}: step {t_tp:7.0f} us (comm {comm_us:4.0f}) -> "
              f"{toks:8.0f} tokens/s, scaling efficiency {100*eff:.0f}%",
              flush=True)


def main():
    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}",
          flush=True)
    for tp in (1, 2, 4, 8):
        # K large enough that K/tp stays Pallas-tileable at tp=8
        check_tp(n=512, k=4096, m=4, tp=tp)
    print("\nTPU-target (v5e, deviceless AOT) scheduled overlap:", flush=True)
    try:
        rings = tpu_overlap_aot()
        ok = all(r["overlapped"] > 0 and r["blocking"] == 0
                 for r in rings.values())
        print(f"  ring kernels fully overlapped on v5e schedule: {ok}",
              flush=True)
    except Exception as e:  # no libtpu topology on this host
        print(f"  skipped (no deviceless topology): {e}", flush=True)
        rings = None
    try:
        time_ring_vs_psum()
    except Exception as e:  # noqa: BLE001 — e.g. single-device mesh
        print(f"  ring-vs-psum timing skipped: {e}", flush=True)
    # serving config from scripts/bench_serve.py (1.2B, measured 3556 us)
    # Decode psums are latency-bound and NOT overlappable (the v5e AOT
    # schedule re-syncs them — tests/test_overlap.py pins this), so the
    # projection charges them in full; prefill-side collectives ride under
    # the ring kernels' chunk GEMMs (overlapped>0 above) and are free.
    project(3556.0, layers=16, dim=2048, dff=8192, batch=8, seq=1024,
            kvh=16, hd=128)
    print("\nscaling validation OK", flush=True)


if __name__ == "__main__":
    main()
