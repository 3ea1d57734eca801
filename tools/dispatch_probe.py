"""Probe per-dispatch and transfer latencies of the attached device.

The protocol driver is host-sequential: every sumcheck round, commit, and
opening costs at least one device dispatch, and at small instance sizes
the prover is bound by these latencies, not math. This prints the numbers
that calibrate the host/device thresholds (core/hostpath.py) and the
fused-kernel design:

  - dispatch+block of a trivial kernel (add of [8,128] u32)
  - device->host transfer of 16/16K/1M element arrays
  - host->device transfer of the same
  - a pallas field mul at several sizes (per-call floor vs throughput)
"""

from __future__ import annotations

import os


import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spartan_tpu.utils.devsync import sync as _real_sync  # real barrier: block_until_ready is dispatch-accept only through the axon tunnel


def t(fn, reps=20):
    import jax

    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spartan_tpu.ops import field_jax as F

    print(f"backend={jax.default_backend()}", flush=True)

    x = jnp.zeros((8, 128), jnp.uint32)
    add = jax.jit(lambda a: a + 1)
    print(f"tiny dispatch+block: {t(lambda: _real_sync(add(x)))*1e3:.2f} ms")

    for n in (16, 1 << 14, 1 << 20):
        a = jnp.zeros((n,), jnp.uint32)
        _real_sync(a)
        print(f"D2H {n:>8}: {t(lambda: np.asarray(a))*1e3:.2f} ms")
        h = np.zeros((n,), np.uint32)
        print(f"H2D {n:>8}: {t(lambda: _real_sync(jnp.asarray(h)))*1e3:.2f} ms")

    for log2 in (10, 14, 18, 20):
        n = 1 << log2
        v = F.encode_small_uints(np.arange(1, n + 1, dtype=np.uint64))
        mul = lambda: _real_sync(F.fr.mul(v, v))
        dt = t(mul, reps=5)
        print(f"field mul 2^{log2}: {dt*1e3:.2f} ms  ({n/dt/1e6:.1f} M elem/s)")

    # chained dispatches without host sync: dispatch overhead when the
    # host runs ahead (async) vs blocking each call
    def chain(k):
        y = x
        for _ in range(k):
            y = add(y)
        _real_sync(y)
    base = t(lambda: chain(1))
    c32 = t(lambda: chain(32))
    print(f"async chain: 1={base*1e3:.2f} ms  32={c32*1e3:.2f} ms  "
          f"(per-call async {((c32-base)/31)*1e3:.3f} ms)")


if __name__ == "__main__":
    main()
