"""Probe: can the fused Pallas round-step kernels run at 2^20-2^22 under
keyless-scale HBM residency?

Round 4 gated them to n <= 2^19 (SPARTAN_TPU_FUSED_ROUND_MAX_N) after
RESOURCE_EXHAUSTED at the 2^21 leaf layers; since then the drivers moved
to per-instance stepping (transients bounded by one table triple). This
replays the big-layer step shapes with a dummy resident allocation that
squeezes free HBM to what the 2^20 prove actually leaves, and reports
live/peak bytes per step so the gate can be set from measurement.

Usage: python tools/probe_fused_gate.py [resident_gb] [log2n ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["SPARTAN_TPU_FUSED_ROUND_MAX_N"] = str(1 << 22)

from spartan_tpu.utils.devsync import sync as _sync  # noqa: E402


def _mem(dev):
    s = dev.memory_stats() or {}
    return s.get("bytes_in_use", 0), s.get("peak_bytes_in_use", 0)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spartan_tpu.core import sumcheck as SC
    from spartan_tpu.ops import field_jax as F

    resident_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    sizes = [int(x) for x in sys.argv[2:]] or [20, 21]
    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} dev={dev.device_kind}", flush=True)

    # dummy residency emulating the prove-time working set — allocated ON
    # device (iota, no host transfer through the tunnel)
    n_res = int(resident_gb * (1 << 30) / 64)
    resident = jax.jit(
        lambda: jnp.broadcast_to(
            jnp.arange(16, dtype=jnp.uint32)[None, :] + 1,
            (n_res, 16)) + jnp.arange(n_res, dtype=jnp.uint32)[:, None] % 7
    )()
    _sync(resident)
    b, p = _mem(dev)
    print(f"resident={resident_gb} GB -> in_use={b/2**30:.2f} GB "
          f"peak={p/2**30:.2f} GB", flush=True)

    import functools

    def _mk_table(seed, *, n_static):
        v = (jnp.arange(n_static, dtype=jnp.uint32) * jnp.uint32(2654435761)
             + seed) >> 1  # < 2^31
        canon = jnp.zeros((n_static, 16), jnp.uint32)
        canon = canon.at[:, 0].set(v & 0xFFFF).at[:, 1].set(v >> 16)
        return F.fr.to_mont(canon)

    seed_ctr = [0]
    for log2n in sizes:
        n = 1 << log2n
        mk = jax.jit(functools.partial(_mk_table, n_static=n))

        def table(mk=mk):
            seed_ctr[0] += 1
            return mk(jnp.uint32(seed_ctr[0]))

        r = F.encode_fr([12345])[0]
        try:
            # additive step (ZK phase-1 shape): 4 tables
            T_, A, B, C = table(), table(), table(), table()
            _sync((T_, A, B, C))
            b0, _ = _mem(dev)
            out = SC.k_step_cubic_additive(T_, A, B, C, r)
            _sync(out)
            t0 = time.perf_counter()
            out2 = SC.k_step_cubic_additive(*out[:4], r)
            _sync(out2)
            dt = time.perf_counter() - t0
            b1, p1 = _mem(dev)
            print(f"  n=2^{log2n} additive step: {dt*1e3:8.1f} ms  "
                  f"in_use {b0/2**30:.2f}->{b1/2**30:.2f} GB  "
                  f"peak {p1/2**30:.2f} GB", flush=True)
            del T_, A, B, C, out, out2
        except Exception as e:  # noqa: BLE001
            print(f"  n=2^{log2n} additive step: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        try:
            # product step with shared C (layer shape, one instance)
            A, B = table(), table()
            mk_h = jax.jit(functools.partial(_mk_table, n_static=n // 2))
            Cf = mk_h(jnp.uint32(999))
            _sync((A, B, Cf))
            b0, _ = _mem(dev)
            a, bb, ev = SC.k_step_cubic_shared(A, B, Cf, r)
            _sync((a, bb, ev))
            t0 = time.perf_counter()
            K = 12
            outs = []
            for _ in range(K):
                outs.append(SC.k_step_cubic_shared(A, B, Cf, r))
            _sync(outs)
            dt = time.perf_counter() - t0
            b1, p1 = _mem(dev)
            print(f"  n=2^{log2n} sharedC step x{K}: {dt*1e3:8.1f} ms "
                  f"({dt/K*1e3:.1f} ms/instance)  "
                  f"in_use {b0/2**30:.2f}->{b1/2**30:.2f} GB  "
                  f"peak {p1/2**30:.2f} GB", flush=True)
            del A, B, Cf, a, bb, ev, outs
        except Exception as e:  # noqa: BLE001
            print(f"  n=2^{log2n} sharedC step: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
