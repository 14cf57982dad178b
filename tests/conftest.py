"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Sharding/parallel tests need multiple devices; the dev box has one real TPU
chip.  Per the project build plan, tests run on CPU with
``xla_force_host_platform_device_count=8`` and Pallas kernels in interpreter
mode (auto-detected via backend).  Set QGT_TEST_TPU=1 to run on the real TPU
instead (single device; sharding tests will skip).

Note: the axon TPU plugin force-selects itself via ``jax_platforms`` on
import, so an env var alone is not enough — we override the config after
importing jax, before any backend is initialized.
"""

import os

if not os.environ.get("QGT_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
