"""Stage-by-stage timing of the row-batched Hyrax commit MSM on the chip.

The warm 2^20 e2e shows derefs_commitment at 81.5 s for 2^23 elements
(~100 K pts/s) and polycommit at 42.5 s for 2^20 — both far below the
~300 K pts/s the same kernels deliver on a single big MSM. This replays
the exact commit_rows chunk shapes and times each pipeline stage with
real syncs, so the overhead (sort? gathers? transposes? prefix output
streaming?) is measured, not guessed.

Usage: python tools/commit_profile.py [L R]...   (default: the three
keyless-scale commit shapes)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spartan_tpu.utils.devsync import sync as _sync  # noqa: E402


def t(fn, *a, reps=2, **k):
    out = fn(*a, **k)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a, **k)
        _sync(out)
    return (time.perf_counter() - t0) / reps, out


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spartan_tpu.core.commitments import (
        MultiCommitGens,
        commit_rows,
    )
    from spartan_tpu.ops import field_jax as F
    from spartan_tpu.ops import msm as MSM
    from spartan_tpu.ops import msm_pallas as MP

    shapes = []
    args = [int(x) for x in sys.argv[1:]]
    for i in range(0, len(args) - 1, 2):
        shapes.append((args[i], args[i + 1]))
    if not shapes:
        # derefs (2048x2048 x2 polys), polycommit (1024x1024),
        # comb_ops (8192x8192)
        shapes = [(2048, 2048), (1024, 1024), (8192, 8192)]

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(3)

    for L, R in shapes:
        n_el = L * R
        print(f"--- commit_rows [{L} x {R}] = 2^{n_el.bit_length()-1} elements",
              flush=True)
        gens = MultiCommitGens(R, b"commit_profile")
        v = (jnp.arange(n_el, dtype=jnp.uint32) * jnp.uint32(2654435761)) >> 1
        canon = jnp.zeros((n_el, 16), jnp.uint32)
        canon = canon.at[:, 0].set(v & 0xFFFF).at[:, 1].set(v >> 16)
        Z = jax.jit(F.fr.to_mont)(canon).reshape(L, R, 16)
        blinds = F.fr.to_mont(jnp.zeros((L, 16), jnp.uint32))
        _sync((Z, blinds))

        dt, out = t(commit_rows, Z, blinds, gens, reps=1)
        print(f"  commit_rows e2e: {dt:8.3f} s = {n_el/dt/1e3:.1f}K pts/s",
              flush=True)

        # stage view of ONE chunk (as the msm() driver shapes it)
        rows_per = max(1, min(L, 1 << 21 >> 0) // (R + 1))
        rows_per = max(1, min(L, (1 << 21) // (R + 1)))
        n = R + 1
        c, nseg = MSM._choose_seq_params(n, rows_per)
        W = -(-254 // c)
        rows_per_call = min(max(1, MSM._chunk_budget() // n), W * rows_per)
        print(f"  chunk: rows_per={rows_per} n={n} c={c} nseg={nseg} "
              f"W={W} rows_per_call={rows_per_call} "
              f"calls/chunk={-(-W * rows_per // rows_per_call)}", flush=True)

        sc = jnp.concatenate([Z[:rows_per], blinds[:rows_per, None, :]],
                             axis=1)
        dt, sc_canon = t(jax.jit(F.fr.from_mont), sc)
        print(f"  from_mont: {dt*1e3:9.1f} ms", flush=True)
        dt, digits = t(MSM.window_digits, sc_canon, c)
        print(f"  digits: {dt*1e3:12.1f} ms", flush=True)
        dig = jnp.moveaxis(digits.reshape(rows_per, n, W), -1, 0).reshape(
            W * rows_per, n)[:rows_per_call]
        pts = gens.extended_points()

        dt, order = t(jax.jit(lambda d: jnp.argsort(d, axis=-1)), dig)
        print(f"  argsort [{dig.shape}]: {dt*1e3:.1f} ms", flush=True)

        px, py, pinf = pts

        @jax.jit
        def gather(d, o):
            sd = jnp.take_along_axis(d, o, axis=-1)
            return sd, px[o], py[o]

        dt, (sd, gx, gy) = t(gather, dig, order)
        print(f"  take+point gather: {dt*1e3:.1f} ms", flush=True)

        @jax.jit
        def transpose(gx, gy, sd):
            return (jnp.transpose(gx, (1, 2, 0)),
                    jnp.transpose(gy, (1, 2, 0)),
                    jnp.transpose(sd, (1, 0)).astype(jnp.uint32))

        dt, _tt = t(transpose, gx, gy, sd)
        print(f"  transposes: {dt*1e3:.1f} ms", flush=True)

        dt, wins = t(MP.bucket_windows_seq, pts, dig, c, nseg=nseg)
        walk_adds = dig.shape[0] * dig.shape[1]
        print(f"  bucket_seq e2e (1 call): {dt*1e3:.1f} ms "
              f"({walk_adds/dt/1e6:.1f}M walk-adds/s incl. overhead)",
              flush=True)
        del sc, sc_canon, digits, dig, order, sd, gx, gy, _tt, wins, Z


if __name__ == "__main__":
    main()
