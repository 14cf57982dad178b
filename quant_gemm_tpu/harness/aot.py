"""Deviceless TPU AOT compilation (the Mosaic compile gate).

jaxlib ships libtpu's compiler; a PJRT *topology description* lets us run
the full XLA:TPU + Mosaic pipeline on a CPU-only host — no chip, no tunnel.
This is the round-3 answer to shipping kernels that were only ever
interpret-verified: ``aot_compile`` runs real Mosaic legalization (it
rejects e.g. ``arith.shrsi`` on int8 vectors — the exact class of failure
the round-1 perf lab hit on hardware), real XLA:TPU scheduling, and yields
per-executable memory statistics, for any v5e topology up to a pod slice.

Reference analogue: the reference could only validate kernels by running
them (tests/benchmark_best.cu); TPU AOT gives a stronger static gate.

Usage::

    from quant_gemm_tpu.harness import aot
    compiled = aot.aot_compile(lambda w, a: gemm_exact(w, a, interpret=False),
                               wq, a_q)          # single chip
    hlo = aot.compiled_hlo(compiled)             # scheduled HLO text

Multi-chip: pass ``mesh_shape={"tp": 8}`` and per-arg ``in_shardings``; the
compiled HLO then contains the real async collective pairs XLA:TPU would
issue on a pod slice (see scripts/bench_scaling.py's overlap report).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Mapping, Sequence

import jax
import numpy as np

DEFAULT_TOPOLOGY = "v5e:2x4"


@functools.lru_cache(maxsize=4)
def topology(name: str = DEFAULT_TOPOLOGY):
    """A compile-only TPU topology (cached). Devices are NOT addressable."""
    from jax.experimental import topologies

    return topologies.get_topology_desc(name, "tpu")


def topology_available(retries: int = 12, delay: float = 5.0) -> bool:
    """True when the deviceless topology can be built.

    libtpu guards its init with /tmp/libtpu_lockfile; a CONCURRENT process
    (another test run, a bench) makes ``topology()`` raise ABORTED even
    though libtpu is present — treating that as "no topology" would
    silently disable the Mosaic compile gate.  Retry through transient
    lock contention; only a persistent or structural failure reports
    False (and the gate tests skip with that reason).
    """
    import time

    for i in range(retries):
        try:
            topology()
            return True
        except Exception as e:  # noqa: BLE001
            if "lockfile" in str(e).lower() and i < retries - 1:
                time.sleep(delay)
                continue
            return False
    return False


def topology_mesh(axes: Mapping[str, int] | None = None,
                  name: str = DEFAULT_TOPOLOGY) -> jax.sharding.Mesh:
    """A Mesh of compile-only devices, e.g. ``{"tp": 8}`` or ``{"dp": 2,
    "tp": 4}``.  Default: single-device mesh (axis ``d``)."""
    devs = topology(name).devices
    if not axes:
        return jax.sharding.Mesh(np.array(devs[:1]), ("d",))
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n > len(devs):
        raise ValueError(f"mesh {dict(axes)} needs {n} devices, "
                         f"topology {name} has {len(devs)}")
    return jax.sharding.Mesh(
        np.array(devs[:n]).reshape(shape), tuple(axes)
    )


def _replicated(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())


def shape_structs(tree: Any, sharding=None, *,
                  mesh: jax.sharding.Mesh | None = None) -> Any:
    """Map a pytree of arrays (or ShapeDtypeStructs) to ShapeDtypeStructs
    carrying a compile-only-device sharding (replicated by default)."""
    if sharding is None:
        sharding = _replicated(mesh if mesh is not None else topology_mesh())

    def one(x):
        return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding)

    return jax.tree.map(one, tree)


def aot_compile(
    fn: Callable,
    *args: Any,
    mesh: jax.sharding.Mesh | None = None,
    in_shardings: Any = None,
    out_shardings: Any = None,
    donate_argnums: Sequence[int] = (),
    static_argnames: Sequence[str] = (),
    compiler_options: Mapping[str, Any] | None = None,
    **kwargs: Any,
):
    """jit + lower + compile ``fn`` for a deviceless TPU topology.

    ``args``/``kwargs`` may be real host arrays or ShapeDtypeStructs; they
    are converted to ShapeDtypeStructs on the topology mesh (replicated
    unless ``in_shardings`` gives per-arg NamedShardings built from the
    same mesh).  Returns the jax ``Compiled`` object — inspect it with
    ``compiled_hlo`` / ``.memory_analysis()``; it cannot be executed.
    """
    if mesh is None:
        mesh = topology_mesh()
    if in_shardings is None:
        sds_args = shape_structs(list(args), mesh=mesh)
        jfn = jax.jit(fn, out_shardings=out_shardings,
                      donate_argnums=tuple(donate_argnums),
                      static_argnames=tuple(static_argnames))
    else:
        # per-arg shardings: honor them in both the structs and the jit
        sds_args = [
            shape_structs(a, sharding=s) if s is not None
            else shape_structs(a, mesh=mesh)
            for a, s in zip(args, in_shardings)
        ]
        jfn = jax.jit(fn, in_shardings=in_shardings,
                      out_shardings=out_shardings,
                      donate_argnums=tuple(donate_argnums),
                      static_argnames=tuple(static_argnames))
    sds_kwargs = shape_structs(kwargs, mesh=mesh) if kwargs else {}
    lowered = jfn.lower(*sds_args, **sds_kwargs)
    return lowered.compile(compiler_options)


def compiled_hlo(compiled) -> str:
    """Scheduled post-optimization HLO text of a Compiled object."""
    mods = compiled.runtime_executable().hlo_modules()
    return "\n".join(m.to_string() for m in mods)


# XLA:TPU options that make collective overlap visible and schedulable:
# the async-collective creator wraps all-reduce/all-gather into
# ``*-start``/``*-done`` pairs and the latency-hiding scheduler moves
# independent compute between them.  (collective-permute goes async by
# default; all-reduce needs the fusion flags — verified against this
# jaxlib: without them the tp=8 serving step's psums compile sync-form.)
OVERLAP_OPTS = {
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    "xla_tpu_enable_async_collective_fusion": "true",
    "xla_tpu_enable_async_collective_fusion_fuse_all_reduce": "true",
    "xla_tpu_enable_async_collective_fusion_fuse_all_gather": "true",
    "xla_enable_async_all_reduce": "true",
    "xla_enable_async_all_gather": "true",
}

_COLL = r"(?:all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)"
# op name immediately followed by "(" — matches the op position, not result
# names ("%fusion.3 =") or operand references ("%fusion.3,").  Result types
# can be tuples with nested parens, so the op is located by search, not by
# anchoring past the type.
_COMPUTE = r"\b(?:fusion|dot|convolution|custom-call)\("


def overlap_report(hlo: str) -> dict:
    """Classify every collective in SCHEDULED HLO text (``is_scheduled=true``
    modules print in execution order, so text order == schedule order).

    * ``overlapped``: async ``*-start``/``*-done`` pair with >=1 compute op
      (fusion / dot / custom-call — Pallas kernels appear as custom-calls)
      scheduled between start and done: ICI rides under the MXU.
    * ``blocking``: async pair with nothing scheduled between.
    * ``resynced``: a sync-form collective carrying the
      ``async_collective_name`` frontend attribute — the async creator
      wrapped it but the TPU scheduler re-merged it after finding no
      independent work (e.g. the serving decode step's critical-path psums).
    * ``sync``: never async-converted.
    """
    import re

    open_starts: dict[str, int] = {}
    out = {"overlapped": 0, "blocking": 0, "resynced": 0, "sync": 0,
           "hidden_by": []}
    for raw in hlo.splitlines():
        ln = raw.strip()
        mname = re.match(r"%?([\w.\-]+)\s*=", ln)
        mcoll = re.search(r"\b(" + _COLL + r")(-start|-done)?\(", ln)
        m = (mname, mcoll) if mname and mcoll else None
        if m is None:
            if open_starts and re.search(_COMPUTE, ln):
                op = re.search(r"op_name=\"([^\"]+)\"", ln)
                for k in open_starts:
                    open_starts[k] += 1
                if op:
                    out["hidden_by"].append(op.group(1))
            continue
        name, (_op, phase) = mname.group(1), mcoll.groups()
        if phase == "-start":
            open_starts[name] = 0
        elif phase == "-done":
            operands = re.findall(r"%?([\w.\-]+)", ln.split("(", 1)[-1])
            key = next((o for o in operands if o in open_starts), None)
            if key is None and open_starts:
                key = next(iter(open_starts))
            if key is not None:
                if open_starts.pop(key) > 0:
                    out["overlapped"] += 1
                else:
                    out["blocking"] += 1
        elif "async_collective_name" in ln:
            out["resynced"] += 1
        else:
            out["sync"] += 1
    return out


__all__ = ["topology", "topology_available", "topology_mesh",
           "shape_structs", "aot_compile", "compiled_hlo",
           "overlap_report", "OVERLAP_OPTS", "DEFAULT_TOPOLOGY"]
