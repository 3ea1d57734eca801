"""Sweep sequential-MSM kernel configs (c, nseg) on the attached chip.

The driver's _choose_seq_params optimizes an add-count model; this measures
actual wall time per config so the model can be calibrated against the
hardware (VPU ALU floor + per-dispatch overhead + gather/sort preprocessing).

Usage: python tools/msm_tune.py [log2_n] [rows]
  rows > 1 times the shared-base row-batched commit shape instead.
"""

from __future__ import annotations

import os


import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spartan_tpu.utils.devsync import sync as _real_sync  # real barrier: block_until_ready is dispatch-accept only through the axon tunnel

LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 1


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spartan_tpu.core.commitments import points_from_scalars
    from spartan_tpu.ops import msm as MSM
    from spartan_tpu.ops.limbs import ints_to_limbs
    from spartan_tpu.ops import fields_host as fh

    n = 1 << LOG2
    rng = np.random.default_rng(7)
    print(f"backend={jax.default_backend()} n=2^{LOG2} rows={ROWS}", flush=True)

    pts = points_from_scalars([int(x) for x in rng.integers(1, 1 << 62, size=n)])
    sc_ints = [int.from_bytes(rng.bytes(31), "little") % fh.FR_MOD
               for _ in range(n * ROWS)]
    sc = jnp.asarray(ints_to_limbs(sc_ints))
    if ROWS > 1:
        sc = sc.reshape(ROWS, n // ROWS if False else n, -1)  # [ROWS, n, 16]
    _real_sync(sc)

    auto_c, auto_nseg = MSM._choose_seq_params(n, ROWS)
    print(f"auto params: c={auto_c} nseg={auto_nseg}", flush=True)

    configs = []
    for c in (8, 9, 10, 11, 12, 13):
        W = -(-254 // c)
        rows_per_call = min(max(1, MSM._chunk_budget() // n), W * ROWS)
        for nseg in (1, 2, 4, 8, 16, 32):
            if rows_per_call * nseg > 4096:
                continue
            if n // nseg < 512:
                continue
            configs.append((c, nseg))

    from spartan_tpu.ops.msm_pallas import bucket_windows_seq

    def run(c, nseg):
        digits = MSM.window_digits(sc, c)
        W = digits.shape[-1]
        B = ROWS
        dig = jnp.moveaxis(digits.reshape(B, n, W), -1, 0).reshape(W * B, n)
        total_rows = W * B
        rows_per_call = min(max(1, MSM._chunk_budget() // n), total_rows)
        parts = []
        start = 0
        while start < total_rows:
            stop = min(start + rows_per_call, total_rows)
            chunk = dig[start:stop]
            if stop - start < rows_per_call:
                pad = rows_per_call - (stop - start)
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad, n), jnp.uint32)], axis=0)
            parts.append(bucket_windows_seq(pts, chunk, c, nseg=nseg))
            start = stop
        return _real_sync(parts)

    for c, nseg in configs:
        try:
            t0 = time.perf_counter()
            run(c, nseg)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 2
            for _ in range(reps):
                run(c, nseg)
            dt = (time.perf_counter() - t0) / reps
            pps = n * ROWS / dt
            print(f"c={c:2d} nseg={nseg:3d}: {dt*1e3:8.1f} ms  "
                  f"{pps/1e3:8.0f} K pts/s   (first {compile_s:.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"c={c:2d} nseg={nseg:3d}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
