"""Sequential Pallas bucket kernel vs the scan formulation (interpret mode).

The real-TPU path is exercised on hardware (tools/msm_profile.py); here the
kernels run through the Pallas interpreter on CPU so the suite still covers
the control flow: prefix-with-reset walk, run-end gathers, weighted bucket
reduction, point-axis segmentation, and padding edges.
"""

import os
import random

os.environ.setdefault("SPARTAN_TPU_PALLAS_INTERPRET", "1")

import pytest

from spartan_tpu.ops import curve_host as fhC  # noqa: F401 (host golden)
from spartan_tpu.ops import fields_host as fh

random.seed(77)


@pytest.mark.parametrize("N,B,c,nseg", [
    (96, 3, 4, 1),
    (96, 3, 4, 2),
    (130, 2, 5, 4),   # N not divisible by nseg or _CN
])
def test_bucket_seq_matches_scan(N, B, c, nseg):
    import jax.numpy as jnp

    from spartan_tpu.core.commitments import points_from_scalars
    from spartan_tpu.ops import curve_jax as CJ
    from spartan_tpu.ops import msm as MSM
    from spartan_tpu.ops.msm_pallas import bucket_windows_seq

    pts = points_from_scalars(
        [random.randrange(1, fh.FR_MOD) for _ in range(N)])
    digits = jnp.asarray(
        [[random.randrange(1 << c) for _ in range(N)] for _ in range(B)],
        jnp.uint32)

    got = CJ.decode_points(bucket_windows_seq(pts, digits, c, nseg=nseg))
    want = CJ.decode_points(MSM._bucket_windows(pts, digits, c))
    assert got == want
