"""Device field kernels vs exact host arithmetic (golden path).

Strategy per SURVEY.md §4: kernel-level tests of field ops against
host-side bigint arithmetic (the reference's scalar.rs tests are the model:
roundtrip, arithmetic identities, inversion).
"""

import random

import pytest

from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops import fields_host as fh
from spartan_tpu.ops.limbs import int_to_limbs, ints_to_limbs, limbs_to_int, limbs_to_ints

random.seed(1234)
N = 32

XS = [random.randrange(fh.FR_MOD) for _ in range(N)]
YS = [random.randrange(fh.FR_MOD) for _ in range(N)]
EDGE = [0, 1, 2, fh.FR_MOD - 1, fh.FR_MOD - 2, (fh.FR_MOD - 1) // 2] * 6
EDGE = EDGE[:N]


def test_limb_roundtrip():
    for x in XS[:8] + EDGE[:8]:
        assert limbs_to_int(int_to_limbs(x)) == x
    arr = ints_to_limbs(XS)
    assert limbs_to_ints(arr) == XS


def test_encode_decode_roundtrip():
    assert F.decode_fr(F.encode_fr(XS)) == XS
    assert F.decode_fq(F.encode_fq([x % fh.FQ_MOD for x in XS])) == [x % fh.FQ_MOD for x in XS]


@pytest.mark.parametrize("vals", [(XS, YS), (EDGE, list(reversed(EDGE)))])
def test_add_sub_mul(vals):
    xs, ys = vals
    a, b = F.encode_fr(xs), F.encode_fr(ys)
    assert F.decode_fr(F.fr.add(a, b)) == [(x + y) % fh.FR_MOD for x, y in zip(xs, ys)]
    assert F.decode_fr(F.fr.sub(a, b)) == [(x - y) % fh.FR_MOD for x, y in zip(xs, ys)]
    assert F.decode_fr(F.fr.mul(a, b)) == [x * y % fh.FR_MOD for x, y in zip(xs, ys)]
    assert F.decode_fr(F.fr.neg(a)) == [(-x) % fh.FR_MOD for x in xs]


def test_sqr_matches_mul():
    a = F.encode_fr(XS)
    assert F.decode_fr(F.fr.sqr(a)) == [x * x % fh.FR_MOD for x in XS]


def test_inv():
    xs = [x for x in XS if x != 0]
    a = F.encode_fr(xs)
    assert F.decode_fr(F.fr.inv(a)) == [pow(x, -1, fh.FR_MOD) for x in xs]


def test_batch_inverse_with_zeros():
    xs = list(XS)
    xs[3] = 0
    xs[17] = 0
    a = F.encode_fr(xs)
    got = F.decode_fr(F.fr.batch_inverse(a))
    exp = [pow(x, -1, fh.FR_MOD) if x else 0 for x in xs]
    assert got == exp


def test_reduce_sum():
    a = F.encode_fr(XS)
    got = F.decode_fr(F.fr.reduce_sum(a)[None])[0]
    assert got == sum(XS) % fh.FR_MOD


def test_reduce_sum_large_carry_regression():
    """Normalize-columns dropped a nonzero 2^256 carry for large-N sums,
    decoding to an off-by-c canonical result (caught at 2^12 on TPU).
    Max-residue inputs drive the column sums to the worst-case bound."""
    n = 4096
    # canonical value whose MONTGOMERY residue is p-1 (maximal limbs in the
    # summed domain -> maximal column sums/carries)
    worst = (fh.FR_MOD - 1) * pow(1 << 256, -1, fh.FR_MOD) % fh.FR_MOD
    xs = [worst] * n
    a = F.encode_fr(xs)
    got = F.decode_fr(F.fr.reduce_sum(a)[None])[0]
    assert got == sum(xs) % fh.FR_MOD

    # randomized: many independent trials at a carry-prone size
    rng = random.Random(99)
    xs = [rng.randrange(fh.FR_MOD) for _ in range(4096)]
    a = F.encode_fr(xs)
    got = F.decode_fr(F.fr.reduce_sum(a)[None])[0]
    assert got == sum(xs) % fh.FR_MOD


def test_fq_ops():
    xs = [x % fh.FQ_MOD for x in XS]
    ys = [y % fh.FQ_MOD for y in YS]
    a, b = F.encode_fq(xs), F.encode_fq(ys)
    assert F.decode_fq(F.fq.mul(a, b)) == [x * y % fh.FQ_MOD for x, y in zip(xs, ys)]


def test_host_batch_inv():
    xs = [x for x in XS if x != 0]
    assert fh.batch_fr_inv(xs) == [pow(x, -1, fh.FR_MOD) for x in xs]


def test_host_serialization():
    for x in XS[:4]:
        assert fh.fr_from_bytes(fh.fr_to_bytes(x)) == x
    assert fh.fr_from_bytes((fh.FR_MOD).to_bytes(32, "little")) is None
    assert fh.fr_from_le_bytes_mod_order(b"\xff" * 64) == int.from_bytes(b"\xff" * 64, "little") % fh.FR_MOD
