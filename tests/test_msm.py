"""Pippenger MSM vs exact host MSM — the framework's hottest kernel.

SURVEY.md §2 row 2: every MSM in the reference funnels through
group.rs:143-175; this validates our bucket-method replacement end to end
(digit split, sort+scan bucket accumulation, Horner window combine).
"""

import random

import jax.numpy as jnp

from spartan_tpu.ops import curve_host as CH
from spartan_tpu.ops import curve_jax as CJ
from spartan_tpu.ops import fields_host as fh
from spartan_tpu.ops import msm as MSM
from spartan_tpu.ops.limbs import ints_to_limbs

random.seed(99)


def _setup(n):
    scalars = [random.randrange(fh.FR_MOD) for _ in range(n)]
    base = [CH.scalar_mul(random.randrange(1, 1 << 60), CH.GEN) for _ in range(min(n, 32))]
    pts = [base[i % len(base)] for i in range(n)]
    aff = CJ.batch_normalize(CJ.encode_points(pts))
    return scalars, pts, aff


def test_window_digits():
    scalars = [random.randrange(fh.FR_MOD) for _ in range(4)]
    sc = jnp.asarray(ints_to_limbs(scalars))
    c = 13
    digits = MSM.window_digits(sc, c)
    for i, s in enumerate(scalars):
        recon = sum(int(d) << (c * w) for w, d in enumerate(digits[i]))
        assert recon == s


def test_msm_ladder_small():
    scalars, pts, aff = _setup(8)
    sc = jnp.asarray(ints_to_limbs(scalars))
    out = MSM.msm(aff, sc)  # n<=64 -> ladder path
    got = CJ.decode_points(tuple(a[None] for a in out))[0]
    assert got == CH.msm(scalars, pts)


def test_msm_bucket_128():
    scalars, pts, aff = _setup(128)
    sc = jnp.asarray(ints_to_limbs(scalars))
    out = MSM.msm(aff, sc)
    got = CJ.decode_points(tuple(a[None] for a in out))[0]
    assert got == CH.msm(scalars, pts)


def test_msm_with_zeros_and_infinity():
    scalars, pts, aff = _setup(128)
    scalars[0] = 0
    scalars[5] = 0
    pts2 = list(pts)
    pts2[7] = None
    aff2 = CJ.batch_normalize(CJ.encode_points(pts2))
    sc = jnp.asarray(ints_to_limbs(scalars))
    out = MSM.msm(aff2, sc)
    got = CJ.decode_points(tuple(a[None] for a in out))[0]
    assert got == CH.msm(scalars, pts2)


def test_msm_batched_rows():
    scalars, pts, aff = _setup(128)
    s2 = [s * 7 % fh.FR_MOD for s in scalars]
    sc = jnp.asarray(ints_to_limbs(scalars + s2)).reshape(2, 128, -1)
    out = MSM.msm(aff, sc)
    got = CJ.decode_points(out)
    assert got == [CH.msm(scalars, pts), CH.msm(s2, pts)]


def test_reduce_points():
    _, pts, aff = _setup(8)
    proj = CJ.from_affine(*aff)
    got = CJ.decode_points(tuple(a[None] for a in MSM.reduce_points(proj)))[0]
    exp = None
    for p in pts:
        exp = CH.add(exp, p)
    assert got == exp
