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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# NOTE: the multichip dry run uses --xla_backend_optimization_level=0
# (11x faster compiles); tests deliberately do NOT — the 2^10-2^12 e2e
# tests are runtime-bound and unoptimized codegen triples the suite.
# the virtual 8-device mesh runs collectives across host threads; under
# CPU contention the default 40 s rendezvous terminate-timeout hard-kills
# the whole process (observed in CI-style parallel runs)
if "collective_call_terminate_timeout" not in flags:
    flags = (flags + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
             " --xla_cpu_collective_call_terminate_timeout_seconds=600").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"
# must land before jax reads its config at import (spartan_tpu/__init__ is
# too late here: this conftest imports jax first). Same platform+CPU
# fingerprint key as spartan_tpu/__init__ — never load AOT artifacts
# compiled for another machine's CPU features.
import hashlib


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"flags"):
                    return hashlib.sha256(line).hexdigest()[:8]
    except OSError:
        pass
    return "nofp"


_repo_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           ".spartan_cache", f"jax_cache_cpu_{_cpu_fingerprint()}")
os.makedirs(_repo_cache, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _repo_cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    A single pytest process running the whole suite segfaults inside
    XLA:CPU's compiler after ~55 tests (state/memory accumulation across
    hundreds of per-shape compiles; reproduced 3x at the same spot, while
    every module passes in isolation). Clearing the in-memory executable
    cache between modules keeps the process lean; the persistent disk
    cache makes reloads cheap."""
    yield
    jax.clear_caches()

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
# keep checkout paths out of cache keys (the GPU autotune-cache path jax
# derives from the cache dir otherwise lands in every compile_options hash)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
