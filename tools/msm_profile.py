"""Per-stage timing of the MSM pipeline on the real chip.

Times every internal stage of the sequential bucket path (digit split,
argsort, point gather, transposes, prefix kernel, bucket gather, weighted
kernel, horner) with REAL device syncs — through the axon tunnel
``block_until_ready`` returns at dispatch-accept, so each stage is timed by
fetching a sliver of its output (~33 ms RTT floor per measurement).
"""

from __future__ import annotations

import functools
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spartan_tpu.utils.devsync import sync as _real_sync  # noqa: E402


def t(fn, *a, reps=2, **k):
    out = fn(*a, **k)
    _real_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a, **k)
        _real_sync(out)
    return (time.perf_counter() - t0) / reps, out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spartan_tpu.core.commitments import points_from_scalars
    from spartan_tpu.ops import field_jax as F
    from spartan_tpu.ops import msm as MSM
    from spartan_tpu.ops import msm_pallas as MP
    from spartan_tpu.ops.fields_host import FR_MOD
    from spartan_tpu.ops.limbs import ints_to_limbs

    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfgs = sys.argv[2] if len(sys.argv) > 2 else ""
    n = 1 << log2
    rng = random.Random(11)
    print(f"backend={jax.default_backend()} n=2^{log2}", flush=True)

    pts = points_from_scalars([rng.randrange(1, FR_MOD) for _ in range(n)])
    scalars = jnp.asarray(ints_to_limbs(
        [rng.randrange(FR_MOD) for _ in range(n)]))
    _real_sync((pts, scalars))

    # raw pallas field-mul floor at this size (per-element ALU cost)
    v = F.fr.to_mont(scalars)
    dt, _ = t(jax.jit(lambda a: F.fr.mul(a, a)), v)
    print(f"field mul [{n}]: {dt*1e3:.1f} ms = {n/dt/1e6:.1f} M elem/s",
          flush=True)

    if cfgs:
        pairs = [tuple(int(x) for x in p.split(":")) for p in cfgs.split(",")]
    else:
        pairs = [MSM._choose_seq_params(n, 1)]
    for c, nseg in pairs:
        W = -(-254 // c)
        print(f"--- c={c} W={W} nseg={nseg}", flush=True)
        dt, digits = t(MSM.window_digits, scalars, c)
        print(f"  digits: {dt*1e3:.1f} ms", flush=True)
        dig0 = jnp.moveaxis(digits, -1, 0)               # [W, n]
        px, py, pinf = pts

        B0, N0 = dig0.shape
        dig = jnp.where(pinf[None, :] != 0, jnp.zeros_like(dig0), dig0)
        if nseg > 1:
            m = N0 // nseg
            dig = dig.reshape(B0, nseg, m).reshape(B0 * nseg, m)
            seg_off = ((jnp.arange(B0 * nseg, dtype=jnp.int32) % nseg) * m)[:, None]
        else:
            seg_off = None

        dt, order = t(jax.jit(lambda d: jnp.argsort(d, axis=-1)), dig)
        print(f"  argsort [{dig.shape}]: {dt*1e3:.1f} ms", flush=True)

        @jax.jit
        def gather(d, o):
            sd = jnp.take_along_axis(d, o, axis=-1)
            gi = o if seg_off is None else o + seg_off
            return sd, px[gi], py[gi]

        dt, (sd, gx, gy) = t(gather, dig, order)
        print(f"  take+point gather: {dt*1e3:.1f} ms", flush=True)

        @jax.jit
        def transpose(gx, gy, sd):
            return (jnp.transpose(gx, (1, 2, 0)), jnp.transpose(gy, (1, 2, 0)),
                    jnp.transpose(sd, (1, 0)).astype(jnp.uint32))

        dt, (tx, ty, tsd) = t(transpose, gx, gy, sd)
        print(f"  transposes: {dt*1e3:.1f} ms", flush=True)

        dt, wins = t(MP.bucket_windows_seq, pts, dig0, c, nseg=nseg)
        print(f"  bucket_seq e2e: {dt*1e3:.1f} ms", flush=True)

        dt, _ = t(functools.partial(MSM.msm, c=c), pts, scalars)
        pps = n / dt
        print(f"  msm() e2e: {dt*1e3:.1f} ms = {pps/1e3:.1f}K pts/s",
              flush=True)


if __name__ == "__main__":
    main()
