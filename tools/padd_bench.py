"""Microbench: sequential mixed point-add throughput vs Pallas tile shape.

The MSM prefix walk is a chain of complete mixed adds on [16, BT] tiles;
its per-element cost sets the MSM floor. This times a standalone kernel
that walks CN points per grid step at several (BT, CN, unroll) choices,
with REAL syncs, to find the efficient tile shape.

Usage: python tools/padd_bench.py [total_points_log2]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spartan_tpu.utils.devsync import sync as _real_sync  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from spartan_tpu.ops import field_jax as F
    from spartan_tpu.ops.pallas_field import _padd_mixed_block
    from spartan_tpu.ops.limbs import NUM_LIMBS

    _L = NUM_LIMBS
    _U32 = jnp.uint32
    FQ = F.FQ
    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    NTOT = 1 << log2  # total (lane, step) point-adds per kernel call

    import numpy as np

    p_limbs = np.asarray(FQ.p_limbs, np.uint32)[:, None]
    one_col = np.asarray(FQ.r1_limbs, np.uint32)[:, None]
    pp = int(FQ.p_prime)

    def make(BT, CN, unroll):
        def kernel(p_ref, one_ref, gx_ref, gy_ref, ox_ref, oy_ref, oz_ref,
                   accx, accy, accz):
            n_idx = pl.program_id(1)

            @pl.when(n_idx == 0)
            def _init():
                accx[:] = jnp.zeros((_L, BT), _U32)
                accy[:] = jnp.broadcast_to(one_ref[:], (_L, BT))
                accz[:] = jnp.zeros((_L, BT), _U32)

            p_col = p_ref[:]

            def step(i, carry):
                ax, ay, az = carry
                px = gx_ref[pl.ds(i, 1)][0]
                py = gy_ref[pl.ds(i, 1)][0]
                return _padd_mixed_block(ax, ay, az, px, py, p_col,
                                         jnp.uint32(pp), unroll=unroll)

            ax, ay, az = jax.lax.fori_loop(
                0, CN, step, (accx[:], accy[:], accz[:]))
            accx[:] = ax
            accy[:] = ay
            accz[:] = az
            ox_ref[:] = ax
            oy_ref[:] = ay
            oz_ref[:] = az

        N = NTOT // BT  # steps per lane
        NB = N // CN
        spec3 = pl.BlockSpec((CN, _L, BT), lambda b, n: (n, 0, b),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((_L, BT), lambda b, n: (0, b),
                             memory_space=pltpu.VMEM)

        @jax.jit
        def run(tx, ty):
            return pl.pallas_call(
                kernel,
                grid=(1, NB),
                in_specs=[
                    pl.BlockSpec((_L, 1), lambda b, n: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((_L, 1), lambda b, n: (0, 0),
                                 memory_space=pltpu.VMEM),
                    spec3, spec3,
                ],
                out_specs=(ospec, ospec, ospec),
                out_shape=tuple(
                    jax.ShapeDtypeStruct((_L, BT), _U32) for _ in range(3)),
                scratch_shapes=[pltpu.VMEM((_L, BT), _U32) for _ in range(3)],
            )(p_limbs, one_col, tx, ty)

        return run, N

    rng = np.random.default_rng(5)
    for BT, CN in ((128, 64), (128, 256), (256, 64), (256, 128), (512, 32),
                   (512, 64), (1024, 32), (2048, 16)):
        for unroll in (True, False):
            run, N = make(BT, CN, unroll)
            if N % CN or N < CN:
                continue
            tx = jnp.asarray(rng.integers(0, 1 << 16, (N, _L, BT), np.uint32))
            ty = jnp.asarray(rng.integers(0, 1 << 16, (N, _L, BT), np.uint32))
            _real_sync((tx, ty))
            try:
                t0 = time.perf_counter()
                out = run(tx, ty)
                _real_sync(out)
                first = time.perf_counter() - t0
                t0 = time.perf_counter()
                reps = 2
                for _ in range(reps):
                    out = run(tx, ty)
                    _real_sync(out)
                dt = (time.perf_counter() - t0) / reps
                print(f"BT={BT:4d} CN={CN:4d} unroll={int(unroll)}: "
                      f"{dt*1e3:8.1f} ms  {NTOT/dt/1e6:6.2f} M padd/s  "
                      f"({dt/NTOT*1e9:6.1f} ns/add)  first {first:.1f}s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"BT={BT:4d} CN={CN:4d} unroll={int(unroll)}: "
                      f"FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
