"""Device curve kernels vs exact host arithmetic + serialization.

Mirrors the reference's group.rs unit tests (ops/MSM/compress,
/root/reference/src/group.rs:300-330) against our independent host path.
"""

import random

import jax.numpy as jnp

from spartan_tpu.ops import curve_host as CH
from spartan_tpu.ops import curve_jax as CJ
from spartan_tpu.ops import fields_host as fh
from spartan_tpu.ops.limbs import ints_to_limbs

random.seed(77)
N = 8

SCALARS = [random.randrange(1, 1 << 62) for _ in range(N)]
PTS = [CH.scalar_mul(s, CH.GEN) for s in SCALARS]


def _dev(points):
    return CJ.encode_points(points)


def test_encode_decode_roundtrip():
    assert CJ.decode_points(_dev(PTS)) == PTS
    withinf = PTS[:3] + [None] + PTS[3:5]
    assert CJ.decode_points(_dev(withinf)) == withinf


def test_padd_vs_host():
    p = _dev(PTS)
    q = _dev(PTS[::-1])
    got = CJ.decode_points(CJ.padd(p, q))
    exp = [CH.add(a, b) for a, b in zip(PTS, PTS[::-1])]
    assert got == exp


def test_padd_special_cases():
    # P + (-P) = inf; P + inf = P; inf + inf = inf; P + P = 2P (complete law)
    p0 = PTS[0]
    cases = [(p0, CH.neg(p0)), (p0, None), (None, None), (p0, p0)]
    a = _dev([c[0] for c in cases])
    b = _dev([c[1] for c in cases])
    got = CJ.decode_points(CJ.padd(a, b))
    exp = [CH.add(x, y) for x, y in cases]
    assert got == exp


def test_pdbl_vs_host():
    p = _dev(PTS + [None])
    got = CJ.decode_points(CJ.pdbl(p))
    exp = [CH.double(x) for x in PTS + [None]]
    assert got == exp


def test_scalar_mul_vs_host():
    ks = [random.randrange(fh.FR_MOD) for _ in range(N)]
    sc = jnp.asarray(ints_to_limbs(ks))
    got = CJ.decode_points(CJ.scalar_mul(sc, _dev(PTS)))
    exp = [CH.scalar_mul(k, p) for k, p in zip(ks, PTS)]
    assert got == exp


def test_compress_roundtrip():
    for p in PTS + [None]:
        assert CH.decompress(CH.compress(p)) == p


def test_compress_flags():
    # infinity flag in byte 31 bit 6
    assert CH.compress(None)[31] & 0x40
    # negative-y flag matches arkworks convention
    p = PTS[0]
    neg = CH.neg(p)
    c1, c2 = CH.compress(p), CH.compress(neg)
    assert (c1[31] ^ c2[31]) & 0x80
    assert c1[:31] == c2[:31]


def test_points_equal():
    p = _dev(PTS[:4])
    q = _dev(PTS[:4])
    assert bool(CJ.points_equal(p, q).all())
    r = _dev(PTS[1:5])
    assert not bool(CJ.points_equal(p, r).any())
