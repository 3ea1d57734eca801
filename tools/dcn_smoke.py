"""Two-process jax.distributed smoke test of the multi-host mesh paths.

The multi-host branches in parallel/mesh.py (per-process shard feeding,
compiled all-gather handoff, strided gathers) had only ever run
single-process (VERDICT r4: "reviewed-but-unproven"). This launches TWO
actual processes with `jax.distributed.initialize` on the CPU backend
(2 virtual devices each -> a 4-device global mesh) and checks that
shard_table / gather_table / gather_unstride and a sharded sumcheck
round produce the same values as the single-process reference.

Usage:  python tools/dcn_smoke.py            # driver (spawns workers)
        python tools/dcn_smoke.py worker I   # internal
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = int(os.environ.get("SPARTAN_DCN_PORT", "8476"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(pid: int) -> None:
    import jax

    # the JAX_PLATFORMS env var is ignored when the axon TPU plugin is
    # registered; config.update is the override that sticks
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}", num_processes=2,
        process_id=pid)
    import numpy as np

    sys.path.insert(0, REPO)
    import jax.numpy as jnp

    from spartan_tpu.core import sumcheck as SC  # noqa: F401 (kernel deps)
    from spartan_tpu.ops import field_jax as F
    from spartan_tpu.ops.fields_host import FR_MOD
    from spartan_tpu.parallel.mesh import (
        gather_table,
        gather_unstride,
        make_mesh,
        shard_table,
    )
    from spartan_tpu.parallel.sumcheck_sharded import (
        make_quad_evals,
        to_strided,
    )

    assert jax.process_count() == 2, jax.process_count()
    D = len(jax.devices())
    assert D == 4, f"expected 4 global devices, got {D}"
    mesh = make_mesh()

    rng = np.random.default_rng(7)
    n = 64
    a_ints = [int.from_bytes(rng.bytes(31), "little") % FR_MOD
              for _ in range(n)]
    b_ints = [int.from_bytes(rng.bytes(31), "little") % FR_MOD
              for _ in range(n)]
    A = F.encode_fr(a_ints)
    B = F.encode_fr(b_ints)

    # shard_table: multi-process branch (make_array_from_callback)
    As = shard_table(mesh, to_strided(A, D))
    Bs = shard_table(mesh, to_strided(B, D))
    assert not As.is_fully_addressable

    # sharded quad evals (strided layout + exact field psum over DCN)
    e0, e2 = jax.jit(make_quad_evals(mesh))(As, Bs)
    got0, got2 = F.decode_fr(jnp.stack([e0, e2]))

    # single-process reference (pure host ints)
    half = n // 2
    ref0 = sum(a_ints[i] * b_ints[i] for i in range(half)) % FR_MOD
    ref2 = sum((2 * a_ints[i + half] - a_ints[i])
               * (2 * b_ints[i + half] - b_ints[i])
               for i in range(half)) % FR_MOD
    assert got0 == ref0 and got2 == ref2, "sharded evals != host reference"

    # gather_table: compiled all-gather -> replicated (readable everywhere)
    back = gather_table(mesh, As)  # strided [D, n/D, 16], replicated
    assert back.sharding.is_fully_replicated
    assert np.asarray(back).shape == (D, n // D, 16)
    nat = gather_unstride(mesh, As)
    assert F.decode_fr(nat) == a_ints, "gather_unstride mismatch"

    print(f"proc {pid}: DCN smoke OK", flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
        return

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "2"
    # cross-process collectives on the CPU backend need gloo; without it
    # each process sees only its local devices (process_count stays 1)
    env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=2"
    env["XLA_FLAGS"] = (
        flags + " --xla_backend_optimization_level=0").strip()
    env.setdefault("SPARTAN_TPU_CPU_MESH_CACHE", "1")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1500)
        if p.returncode != 0 or "DCN smoke OK" not in out:
            ok = False
            print(f"--- proc {i} FAILED (rc={p.returncode})")
            print(out[-4000:])
        else:
            print(f"--- proc {i} OK")
    if not ok:
        raise SystemExit(1)
    print("DCN 2-process smoke: PASS")


if __name__ == "__main__":
    main()
