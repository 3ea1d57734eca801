"""Test configuration: force an 8-virtual-device CPU platform.

Tests exercise correctness + sharding without real TPU hardware; the driver
compile-checks the real-TPU path separately via __graft_entry__.py.
Must run before jax initializes, hence top of conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
