"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Sharding/parallel tests need multiple devices; the CI/dev box has one real
TPU chip at most.  Per the project build plan, tests run on CPU with
``xla_force_host_platform_device_count=8`` and Pallas kernels in interpreter
mode (auto-detected via backend).  Set QGT_TEST_TPU=1 to run on real TPU
hardware instead.
"""

import os

if not os.environ.get("QGT_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
