"""Test configuration: force an 8-virtual-device CPU platform.

Tests exercise correctness + sharding without real TPU hardware; the driver
compile-checks the real-TPU path separately via __graft_entry__.py.

Note: this jax build ignores the JAX_PLATFORMS env var when the axon TPU
plugin is present — `jax.config.update` is the override that sticks. XLA
flags must still be set before jax initializes its CPU client.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
