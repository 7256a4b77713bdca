"""Test configuration.

Tests run on a virtual 8-device CPU backend so that multi-chip sharding
paths (jax.sharding.Mesh over 8 devices) can be exercised without TPU
hardware.  All codec ops are integer arithmetic, so CPU results are
bit-identical to TPU results; the benchmark (bench.py) runs on the real
chip separately.

The env vars must be set before jax initializes a backend, hence this
happens at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
