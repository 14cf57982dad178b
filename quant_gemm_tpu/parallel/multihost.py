"""Multi-host bootstrap: process-spanning meshes + per-host data feeding.

The reference is strictly single-GPU (SURVEY §2.9: every test allocates on
device 0); this module is the TPU-native multi-host story SURVEY §5.8 and
BASELINE's 1-chip / 1-host / N-host matrix require:

* :func:`initialize` — ``jax.distributed.initialize`` wrapper (coordinator
  TCP bootstrap); after it, ``jax.devices()`` is the GLOBAL device list
  and collectives cross process boundaries (DCN between hosts, ICI within).
* :func:`global_mesh` — a Mesh whose OUTER axis spans processes and whose
  inner axes stay host-local, so dp gradients ride DCN while tp
  all-gathers stay on ICI (the layout jax-ml.github.io/scaling-book
  prescribes).  Uses ``mesh_utils.create_hybrid_device_mesh`` when more
  than one process is attached.
* :func:`host_array` — per-host data feeding: each process passes only its
  local shard and gets back the logical global array
  (``jax.make_array_from_process_local_data``).

Everything works unchanged on an N-process CPU fleet
(``--xla_force_host_platform_device_count``), which is how
``scripts/bench_multihost.py`` dry-runs the DCN path on this single-chip
dev box; on a real pod slice the same calls bind to the TPU runtime.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Sequence[int] | None = None,
) -> None:
    """Join the multi-process runtime (idempotent per process).

    On TPU pods ``jax.distributed.initialize()`` can infer everything from
    the environment; pass explicit values for CPU fleets and tests.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_mesh(axis_sizes: dict[str, int]) -> Mesh:
    """Mesh over ALL attached devices; the FIRST axis spans processes.

    ``global_mesh({'dp': n_hosts, 'tp': devs_per_host})`` puts dp traffic
    on DCN and tp traffic on ICI.  Axes multiplying to the per-process
    device count may follow the process-spanning axis.  Single-process
    falls back to a plain reshape (same as sharding.make_mesh).
    """
    shape = tuple(axis_sizes.values())
    n_proc = jax.process_count()
    n_total = len(jax.devices())
    assert int(np.prod(shape)) == n_total, (shape, n_total)
    if n_proc == 1:
        dev = np.asarray(jax.devices()).reshape(shape)
        return Mesh(dev, tuple(axis_sizes))
    per_proc = n_total // n_proc
    # split each mesh axis into its DCN (cross-process) and ICI (local)
    # factors: leading axes consume processes, trailing axes stay local
    dcn_shape, local_shape = [], []
    remaining_proc, remaining_local = n_proc, per_proc
    for s in shape:
        d = int(np.gcd(s, remaining_proc))
        assert s % d == 0 and (s // d) <= remaining_local
        dcn_shape.append(d)
        local_shape.append(s // d)
        remaining_proc //= d
        remaining_local //= s // d
    assert remaining_proc == 1, (
        f"axes {axis_sizes} cannot span {n_proc} processes cleanly"
    )
    # mesh_utils.create_hybrid_device_mesh groups by TPU slice_index, which
    # CPU fleets don't carry — group by process_index directly (identical
    # on one-slice-per-host pods): mesh coord c_i = (dcn_i, local_i) merged
    # per axis, so neighboring local coords share a process
    by_proc = [[] for _ in range(n_proc)]
    for d in jax.devices():
        by_proc[d.process_index].append(d)
    base = np.array(by_proc, dtype=object)  # [n_proc, per_proc]
    base = base.reshape(tuple(dcn_shape) + tuple(local_shape))
    k = len(shape)
    perm = [i for pair in zip(range(k), range(k, 2 * k)) for i in pair]
    dev = base.transpose(perm).reshape(shape)
    return Mesh(dev, tuple(axis_sizes))


def host_array(mesh: Mesh, pspec: P, local_data: np.ndarray) -> jax.Array:
    """Per-host data feeding: local shard in, logical global array out.

    Each process passes the rows IT loaded (e.g. its slice of the batch);
    the result behaves like the full array sharded as ``pspec``.
    """
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_process_local_data(sharding, local_data)


def replicated(mesh: Mesh, value) -> jax.Array:
    """Host-local value -> globally replicated array (same on every host)."""
    return host_array(mesh, P(), np.asarray(value))


__all__ = ["initialize", "global_mesh", "host_array", "replicated"]
