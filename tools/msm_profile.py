"""Per-stage timing of the MSM pipeline on the real chip.

Times: digit split, argsort+gather+mask, transposes, prefix kernel,
bucket gather, weighted kernel — plus both end-to-end bucket paths
(scan vs sequential) and the full msm() at several window sizes.
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t(fn, *a, reps=3, **k):
    import jax

    out = fn(*a, **k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a, **k)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spartan_tpu.core.commitments import points_from_scalars
    from spartan_tpu.ops import msm as MSM
    from spartan_tpu.ops import msm_pallas as MP
    from spartan_tpu.ops.fields_host import FR_MOD
    from spartan_tpu.ops.limbs import ints_to_limbs

    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << log2
    rng = random.Random(11)
    print(f"backend={jax.default_backend()} n=2^{log2}", flush=True)

    pts = points_from_scalars([rng.randrange(1, FR_MOD) for _ in range(n)])
    scalars = jnp.asarray(ints_to_limbs(
        [rng.randrange(FR_MOD) for _ in range(n)]))

    for c in (8, 10, 12):
        W = -(-254 // c)
        digits = MSM.window_digits(scalars, c)           # [n, W]
        dig = jnp.moveaxis(digits, -1, 0)                # [W, n]
        dt, _ = t(lambda: jax.block_until_ready(
            MSM.window_digits(scalars, c)))
        print(f"c={c} W={W}: digits {dt*1e3:.1f} ms", flush=True)

        B = W
        # pieces of the seq path
        px, py, pinf = pts

        def sort_gather():
            order = jnp.argsort(dig, axis=-1)
            sd = jnp.take_along_axis(dig, order, axis=-1)
            return sd, px[order], py[order], pinf[order]

        dt, (sd, gx, gy, ginf) = t(jax.jit(sort_gather))
        print(f"  sort+gather {dt*1e3:.1f} ms", flush=True)

        dt, _ = t(MP.bucket_windows_seq, pts, dig, c)
        print(f"  bucket_seq e2e {dt*1e3:.1f} ms", flush=True)

        dt, _ = t(MSM._bucket_windows, pts, dig, c)
        print(f"  bucket_scan e2e {dt*1e3:.1f} ms", flush=True)

    for c in (None,):
        dt, _ = t(MSM.msm, pts, scalars, c=c)
        pps = n / dt
        print(f"msm() default: {dt*1e3:.1f} ms = {pps/1e3:.1f}K pts/s", flush=True)


if __name__ == "__main__":
    main()
