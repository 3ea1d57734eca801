"""Fused sumcheck round-step kernels vs the XLA composition (bit-exact).

Runs the Pallas kernels through the interpreter on the CPU test backend
(same coverage pattern as test_msm_seq.py) and checks folded tables AND
eval triples against core/sumcheck.py's reference composition, including
non-tile-aligned lengths (zero-padding must not perturb the sums).
"""

import os

os.environ.setdefault("SPARTAN_TPU_PALLAS_INTERPRET", "1")
os.environ.setdefault("SPARTAN_TPU_SUMCHECK_T", "8")

import numpy as np
import pytest

from spartan_tpu.core import sumcheck as SC
from spartan_tpu.core.mle import encode_scalar
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops import pallas_sumcheck as PS
from spartan_tpu.ops.fields_host import FR_MOD

import jax.numpy as jnp

rng = np.random.default_rng(11)


def rand_fr() -> int:
    return int.from_bytes(rng.bytes(31), "little") % FR_MOD


def tbl(n):
    return F.encode_fr([rand_fr() for _ in range(n)])


def eq(a, b):
    assert jnp.array_equal(a, b), "device tables differ"


@pytest.mark.parametrize("n", [32, 64])
def test_step_cubic_prod_matches_xla(n):
    A, B, C = tbl(n), tbl(n), tbl(n)
    r = encode_scalar(rand_fr() or 1)
    A1, B1, C1, ev = PS.step_cubic_prod(A, B, C, r)
    A2 = SC.k_fold_top(A, r)
    B2 = SC.k_fold_top(B, r)
    C2 = SC.k_fold_top(C, r)
    e0, e2, e3 = SC.k_cubic_prod_evals(A2, B2, C2)
    eq(A1, A2), eq(B1, B2), eq(C1, C2)
    eq(ev, jnp.stack([e0, e2, e3]))


def test_step_cubic_prod_sharedC_matches_xla():
    n = 64
    A, B = tbl(n), tbl(n)
    Cf = tbl(n // 2)  # already folded
    r = encode_scalar(rand_fr() or 1)
    A1, B1, ev = PS.step_cubic_prod_sharedC(A, B, Cf, r)
    A2, B2 = SC.k_fold_top(A, r), SC.k_fold_top(B, r)
    e0, e2, e3 = SC.k_cubic_prod_evals(A2, B2, Cf)
    eq(A1, A2), eq(B1, B2)
    eq(ev, jnp.stack([e0, e2, e3]))


def test_step_cubic_additive_matches_xla():
    n = 64
    T_, A, B, C = tbl(n), tbl(n), tbl(n), tbl(n)
    r = encode_scalar(rand_fr() or 1)
    T1, A1, B1, C1, ev = PS.step_cubic_additive(T_, A, B, C, r)
    Tx = SC.k_fold_top(T_, r)
    Ax, Bx, Cx = (SC.k_fold_top(x, r) for x in (A, B, C))
    e0, e2, e3 = SC.k_cubic_additive_evals(Tx, Ax, Bx, Cx)
    eq(T1, Tx), eq(A1, Ax), eq(B1, Bx), eq(C1, Cx)
    eq(ev, jnp.stack([e0, e2, e3]))


def test_step_quad_matches_xla():
    n = 64
    A, B = tbl(n), tbl(n)
    r = encode_scalar(rand_fr() or 1)
    A1, B1, ev = PS.step_quad(A, B, r)
    Ax, Bx = SC.k_fold_top(A, r), SC.k_fold_top(B, r)
    e0, e2 = SC.k_quad_evals(Ax, Bx)
    eq(A1, Ax), eq(B1, Bx)
    eq(ev, jnp.stack([e0, e2]))


def test_evals_only_variants_match_xla():
    n = 64
    T_, A, B, C = tbl(n), tbl(n), tbl(n), tbl(n)
    e0, e2, e3 = SC.k_cubic_prod_evals(A, B, C)
    eq(PS.evals_cubic_prod(A, B, C), jnp.stack([e0, e2, e3]))
    e0, e2, e3 = SC.k_cubic_additive_evals(T_, A, B, C)
    eq(PS.evals_cubic_additive(T_, A, B, C), jnp.stack([e0, e2, e3]))
    e0, e2 = SC.k_quad_evals(A, B)
    eq(PS.evals_quad(A, B), jnp.stack([e0, e2]))


def test_padding_is_exact():
    """n = 4*T exactly vs n needing a padded tile: same values."""
    n = 40  # q=10, T=8 -> padded to 16
    A, B, C = tbl(n), tbl(n), tbl(n)
    r = encode_scalar(rand_fr() or 1)
    A1, B1, C1, ev = PS.step_cubic_prod(A, B, C, r)
    A2 = SC.k_fold_top(A, r)
    e0, e2, e3 = SC.k_cubic_prod_evals(A2, SC.k_fold_top(B, r),
                                       SC.k_fold_top(C, r))
    eq(A1, A2)
    eq(ev, jnp.stack([e0, e2, e3]))


# ---------------------------------------------------------------------------
# limb-major (LM) pair kernels
# ---------------------------------------------------------------------------

def _nat(P):
    """LM pair -> natural table (host-checkable)."""
    return PS.lm_unprep(P)


@pytest.mark.parametrize("n", [32, 64, 48 + 16])
def test_lm_prep_unprep_roundtrip(n):
    T_ = tbl(n)
    (P,) = PS.lm_prep([T_])
    assert P.shape == (2, 16, n // 2)
    eq(PS.lm_unprep(P), T_)
    eq(PS.lm_first(P), T_[0])


@pytest.mark.parametrize("n", [32, 64])
def test_lm_step_additive_matches_xla(n):
    T_, A, B, C = tbl(n), tbl(n), tbl(n), tbl(n)
    r = encode_scalar(rand_fr() or 1)
    Pt, Pa, Pb, Pc = PS.lm_prep([T_, A, B, C])
    # round-0 evals
    ev0 = PS.lm_evals_additive(Pt, Pa, Pb, Pc)
    e0, e2, e3 = SC.k_cubic_additive_evals(T_, A, B, C)
    eq(ev0, jnp.stack([e0, e2, e3]))
    # step = fold + next evals
    Pt, Pa, Pb, Pc, ev = PS.lm_step_additive(Pt, Pa, Pb, Pc, r)
    Tn, An, Bn, Cn = (SC.k_fold_top(x, r) for x in (T_, A, B, C))
    e0, e2, e3 = SC.k_cubic_additive_evals(Tn, An, Bn, Cn)
    eq(ev, jnp.stack([e0, e2, e3]))
    eq(_nat(Pt), Tn), eq(_nat(Pa), An), eq(_nat(Pb), Bn), eq(_nat(Pc), Cn)
    eq(PS.lm_first(Pt), Tn[0])


def test_lm_step_prod_and_shared_matches_xla():
    n = 64
    A, B, C = tbl(n), tbl(n), tbl(n)
    r = encode_scalar(rand_fr() or 1)
    Pa, Pb, Pc = PS.lm_prep([A, B, C])
    ev0 = PS.lm_evals_prod(Pa, Pb, Pc)
    e0, e2, e3 = SC.k_cubic_prod_evals(A, B, C)
    eq(ev0, jnp.stack([e0, e2, e3]))
    Pa2, Pb2, Pc2, ev = PS.lm_step_prod(Pa, Pb, Pc, r)
    An, Bn, Cn = (SC.k_fold_top(x, r) for x in (A, B, C))
    e0, e2, e3 = SC.k_cubic_prod_evals(An, Bn, Cn)
    eq(ev, jnp.stack([e0, e2, e3]))
    eq(_nat(Pa2), An), eq(_nat(Pb2), Bn), eq(_nat(Pc2), Cn)

    # shared-C: fold C once, then step A, B against it
    (Pcf,) = PS.lm_fold_pairs([Pc], r)
    Pa3, Pb3, ev_s = PS.lm_step_prod_sharedC(Pa, Pb, Pcf, r)
    eq(_nat(Pa3), An), eq(_nat(Pb3), Bn)
    eq(ev_s, jnp.stack([e0, e2, e3]))


def test_lm_step_quad_matches_xla():
    n = 32
    A, B = tbl(n), tbl(n)
    r = encode_scalar(rand_fr() or 1)
    Pa, Pb = PS.lm_prep([A, B])
    ev0 = PS.lm_evals_quad(Pa, Pb)
    e0, e2 = SC.k_quad_evals(A, B)
    eq(ev0, jnp.stack([e0, e2]))
    Pa, Pb, ev = PS.lm_step_quad(Pa, Pb, r)
    An, Bn = SC.k_fold_top(A, r), SC.k_fold_top(B, r)
    e0, e2 = SC.k_quad_evals(An, Bn)
    eq(ev, jnp.stack([e0, e2]))
    eq(_nat(Pa), An), eq(_nat(Pb), Bn)


# ---------------------------------------------------------------------------
# LM driver integration: full sumchecks, bit-identical to the XLA path
# ---------------------------------------------------------------------------

def _rand_tables(n, k):
    return [SC.mle.DensePolynomial(tbl(n)) for _ in range(k)]


def _run_batched(n, monkeypatch, force_lm):
    from spartan_tpu.core import hostpath as HP
    from spartan_tpu.utils.transcript import Transcript

    if force_lm:
        monkeypatch.setenv("SPARTAN_TPU_FORCE_LM", "1")
    else:
        monkeypatch.delenv("SPARTAN_TPU_FORCE_LM", raising=False)
    monkeypatch.setattr(HP, "host_table_n", lambda: 8)

    rng2 = np.random.default_rng(5)

    def t(seed):
        r2 = np.random.default_rng(seed)
        return SC.mle.DensePolynomial(F.encode_fr(
            [int.from_bytes(r2.bytes(31), "little") % FR_MOD
             for _ in range(n)]))

    A_par, B_par = [t(1), t(2)], [t(3), t(4)]
    C_par = t(5)
    A_seq, B_seq, C_seq = [t(6)], [t(7)], [t(8)]
    coeffs = [int.from_bytes(rng2.bytes(16), "little") for _ in range(3)]
    claim = 0  # prove() does not check the claim; outputs must match anyway
    tr = Transcript(b"lm_driver_test")
    import math

    return SC.SumcheckInstanceProof.prove_cubic_batched(
        claim, int(math.log2(n)), (A_par, B_par, C_par),
        (A_seq, B_seq, C_seq), coeffs, tr)


def test_prove_cubic_batched_lm_bit_identical(monkeypatch):
    n = 64
    p1, r1, cp1, cd1 = _run_batched(n, monkeypatch, force_lm=False)
    p2, r2, cp2, cd2 = _run_batched(n, monkeypatch, force_lm=True)
    assert r1 == r2
    assert cp1 == cp2 and cd1 == cd2
    assert [c.coeffs_except_linear_term for c in p1.compressed_polys] == \
        [c.coeffs_except_linear_term for c in p2.compressed_polys]


def _run_zk(kind, n, monkeypatch, force_lm):
    from spartan_tpu.core import hostpath as HP
    from spartan_tpu.core.commitments import MultiCommitGens
    from spartan_tpu.utils.random_tape import RandomTape
    from spartan_tpu.utils.transcript import Transcript

    if force_lm:
        monkeypatch.setenv("SPARTAN_TPU_FORCE_LM", "1")
    else:
        monkeypatch.delenv("SPARTAN_TPU_FORCE_LM", raising=False)
    monkeypatch.setattr(HP, "host_table_n", lambda: 8)

    def t(seed):
        r2 = np.random.default_rng(seed)
        return SC.mle.DensePolynomial(F.encode_fr(
            [int.from_bytes(r2.bytes(31), "little") % FR_MOD
             for _ in range(n)]))

    import math

    rounds = int(math.log2(n))
    gens_1 = MultiCommitGens(1, b"lmt1")
    tape = RandomTape(b"lmtape", seed=b"\x07" * 32)
    tr = Transcript(b"lm_zk_test")
    if kind == "additive":
        gens_n = MultiCommitGens(4, b"lmt4")
        proof, r, claims, blind = \
            SC.ZKSumcheckInstanceProof.prove_cubic_with_additive_term(
                7, 9, rounds, t(1), t(2), t(3), t(4),
                gens_1, gens_n, tr, tape)
    else:
        gens_n = MultiCommitGens(3, b"lmt3")
        proof, r, claims, blind = SC.ZKSumcheckInstanceProof.prove_quad(
            7, 9, rounds, t(1), t(2), gens_1, gens_n, tr, tape)
    return ([c.compress() for c in proof.comm_polys], r, claims, blind)


@pytest.mark.parametrize("kind", ["additive", "quad"])
def test_zk_sumcheck_lm_bit_identical(kind, monkeypatch):
    n = 64
    a = _run_zk(kind, n, monkeypatch, force_lm=False)
    b = _run_zk(kind, n, monkeypatch, force_lm=True)
    assert a == b
