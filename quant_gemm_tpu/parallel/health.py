"""Multi-host/device health surface (SURVEY §5.3: the reference has no
failure detection; multi-host TPU runs need at least per-host visibility).

Minimal by design: a jitted all-reduce heartbeat across the mesh with a
host-side timeout, returning per-device liveness and ICI reachability.  A
hung or ejected chip turns into a timeout here instead of a silent stall in
the serving loop.  ``check()`` is cheap enough to call between serving
batches.
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class HealthReport:
    ok: bool
    n_devices: int
    n_processes: int
    heartbeat_ms: Optional[float]  # None on timeout/failure
    detail: str

    def row(self) -> str:
        hb = f"{self.heartbeat_ms:.1f} ms" if self.heartbeat_ms else "TIMEOUT"
        status = "OK" if self.ok else "FAIL"
        return (f"health: {status}  devices={self.n_devices} "
                f"processes={self.n_processes} heartbeat={hb}  {self.detail}")


def check(timeout_s: float = 30.0, mesh=None) -> HealthReport:
    """All-device psum heartbeat with a wall-clock timeout.

    Each device contributes 1; the reduction must equal the device count —
    a wrong sum means a partitioned/inconsistent mesh, a timeout means a
    hung device or interconnect.
    """
    devices = list(mesh.devices.flat) if mesh is not None else jax.devices()
    n = len(devices)
    n_proc = getattr(jax, "process_count", lambda: 1)()

    def _beat() -> float:
        ones = [jax.device_put(jnp.ones((), jnp.int32), d) for d in devices]
        t0 = time.perf_counter()
        total = sum(int(np.asarray(x)) for x in ones)
        # cross-device reduction through a pmapped psum when >1 device
        if n > 1:
            arr = jax.device_put_sharded(
                [jnp.ones((1,), jnp.int32)] * n, devices
            )
            total = int(
                np.asarray(
                    jax.pmap(lambda x: jax.lax.psum(x, "d"), axis_name="d",
                             devices=devices)(arr)
                )[0, 0]
            )
        dt = (time.perf_counter() - t0) * 1e3
        if total != n:
            raise RuntimeError(f"heartbeat sum {total} != device count {n}")
        return dt

    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(_beat)
        try:
            ms = fut.result(timeout=timeout_s)
            return HealthReport(True, n, n_proc, ms, "all devices reachable")
        except concurrent.futures.TimeoutError:
            return HealthReport(
                False, n, n_proc, None,
                f"heartbeat exceeded {timeout_s}s — hung device or ICI/DCN",
            )
        except Exception as e:  # noqa: BLE001
            return HealthReport(False, n, n_proc, None, f"{type(e).__name__}: {e}")


__all__ = ["check", "HealthReport"]
