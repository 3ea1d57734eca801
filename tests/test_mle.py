"""DensePolynomial / EqPolynomial vs host-side exact evaluation.

Mirrors the reference's hyrax.rs polynomial tests (hyrax.rs:423-471):
eq-table correctness, evaluate-via-chis, bound folds.
"""

import random

from spartan_tpu.core.mle import DensePolynomial, EqPolynomial, IdentityPolynomial
from spartan_tpu.ops.fields_host import FR_MOD

random.seed(3)

ELL = 4
N = 1 << ELL
VALS = [random.randrange(FR_MOD) for _ in range(N)]
R = [random.randrange(FR_MOD) for _ in range(ELL)]


def _eq(r, bits):
    acc = 1
    for rj, b in zip(r, bits):
        acc = acc * ((rj * b + (1 - rj) * (1 - b)) % FR_MOD) % FR_MOD
    return acc


def _eval_mle(vals, r):
    ell = len(r)
    acc = 0
    for i, v in enumerate(vals):
        bits = [(i >> (ell - 1 - j)) & 1 for j in range(ell)]
        acc = (acc + v * _eq(r, bits)) % FR_MOD
    return acc


def test_eq_evals_match_host():
    got = EqPolynomial(R).evals()
    exp = [_eq(R, [(i >> (ELL - 1 - j)) & 1 for j in range(ELL)]) for i in range(N)]
    assert got == exp


def test_eq_evaluate():
    rx = [random.randrange(FR_MOD) for _ in range(ELL)]
    got = EqPolynomial(R).evaluate(rx)
    exp = 1
    for a, b in zip(R, rx):
        exp = exp * ((a * b + (1 - a) * (1 - b)) % FR_MOD) % FR_MOD
    assert got == exp


def test_evaluate_matches_host():
    p = DensePolynomial.from_ints(VALS)
    assert p.evaluate(R) == _eval_mle(VALS, R)


def test_bound_var_top_then_evaluate():
    p = DensePolynomial.from_ints(VALS)
    p.bound_poly_var_top(R[0])
    assert p.len == N // 2
    assert p.evaluate(R[1:]) == _eval_mle(VALS, R)


def test_bound_var_bot():
    p = DensePolynomial.from_ints(VALS)
    p.bound_poly_var_bot(R[-1])
    # binding the LAST variable (least significant index bit)
    exp = [(VALS[2 * i] + R[-1] * (VALS[2 * i + 1] - VALS[2 * i])) % FR_MOD for i in range(N // 2)]
    assert p.to_ints() == exp


def test_factored_eq_product():
    L, Rt = EqPolynomial(R).compute_factored_evals()
    import spartan_tpu.ops.field_jax as F

    Lh, Rh = F.decode_fr(L), F.decode_fr(Rt)
    full = EqPolynomial(R).evals()
    lsz = len(Lh)
    for i in range(lsz):
        for j in range(len(Rh)):
            assert full[i * len(Rh) + j] == Lh[i] * Rh[j] % FR_MOD


def test_bound_matrix():
    import spartan_tpu.ops.field_jax as F

    p = DensePolynomial.from_ints(VALS)
    L, Rt = EqPolynomial(R).compute_factored_evals()
    lsz, rsz = L.shape[0], Rt.shape[0]
    LZ = F.decode_fr(p.bound(L, lsz, rsz))
    Lh = F.decode_fr(L)
    for j in range(rsz):
        exp = sum(Lh[i] * VALS[i * rsz + j] for i in range(lsz)) % FR_MOD
        assert LZ[j] == exp


def test_merge_pads_to_pow2():
    a = DensePolynomial.from_ints(VALS[:4])
    b = DensePolynomial.from_ints(VALS[:2])
    m = DensePolynomial.merge([a, b])
    assert m.len == 8
    assert m.to_ints() == VALS[:4] + VALS[:2] + [0, 0]


def test_identity_poly():
    r = [random.randrange(FR_MOD) for _ in range(3)]
    got = IdentityPolynomial(3).evaluate(r)
    assert got == (4 * r[0] + 2 * r[1] + r[2]) % FR_MOD
