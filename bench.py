"""Headline benchmark: Pippenger MSM throughput on the real chip.

Every commitment in Spartan funnels through MSM; the reference's derefs
commitment (79.6% of its 208.8 s prove) implies ~50.5K Pedersen points/s on
its single-threaded-CPU baseline (BASELINE.md). This measures our
points/sec/chip on a 2^16 fixed-base MSM and reports the ratio.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Default to the real chip; tests force cpu separately.
N_LOG2 = int(os.environ.get("SPARTAN_BENCH_LOG2", "16"))
REPS = int(os.environ.get("SPARTAN_BENCH_REPS", "3"))
REF_POINTS_PER_SEC = 8_388_608 / 166.2  # BASELINE.md implied MSM throughput


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spartan_tpu.core.commitments import points_from_scalars
    from spartan_tpu.ops import fields_host as fh
    from spartan_tpu.ops import msm as MSM
    from spartan_tpu.ops.limbs import ints_to_limbs

    n = 1 << N_LOG2
    rng = np.random.default_rng(42)

    # generator points: s_i * G batched on device (setup, untimed)
    gen_scalars = [int(x) for x in rng.integers(1, 1 << 62, size=n)]
    points = points_from_scalars(gen_scalars)
    scalars = jnp.asarray(ints_to_limbs(
        [int.from_bytes(rng.bytes(31), "little") % fh.FR_MOD for _ in range(n)]))

    def run():
        out = MSM.msm(points, scalars)
        jax.block_until_ready(out)
        return out

    run()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        run()
    dt = (time.perf_counter() - t0) / REPS

    pps = n / dt
    print(json.dumps({
        "metric": f"msm_points_per_sec_chip_2^{N_LOG2}",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / REF_POINTS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
