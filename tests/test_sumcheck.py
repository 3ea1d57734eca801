"""Sumcheck prove->verify roundtrips (sumcheck.rs:814-862 model)."""

import random

from spartan_tpu.core.mle import DensePolynomial
from spartan_tpu.core.sumcheck import SumcheckInstanceProof
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.utils.transcript import Transcript

random.seed(21)


def test_prove_cubic_roundtrip():
    n = 16
    A = [random.randrange(FR_MOD) for _ in range(n)]
    B = [random.randrange(FR_MOD) for _ in range(n)]
    C = [random.randrange(FR_MOD) for _ in range(n)]
    claim = sum(a * b % FR_MOD * c for a, b, c in zip(A, B, C)) % FR_MOD

    pa, pb, pc = (DensePolynomial.from_ints(v) for v in (A, B, C))
    pt = Transcript(b"sumcheck_test")
    proof, r, claims = SumcheckInstanceProof.prove_cubic(claim, 4, pa, pb, pc, pt)

    vt = Transcript(b"sumcheck_test")
    e, rv = proof.verify(claim, 4, 3, vt)
    assert rv == r
    assert e == claims[0] * claims[1] % FR_MOD * claims[2] % FR_MOD


def test_bad_claim_breaks_final_check():
    """Compressed round polys absorb the claim hint, so a shifted claim is
    caught by the CALLER's final-evaluation check, not per-round (the
    reference behaves identically: unipoly.rs:100-113 + the product-tree
    layer check at product_tree.rs:236)."""
    n = 8
    A = [random.randrange(FR_MOD) for _ in range(n)]
    B = [random.randrange(FR_MOD) for _ in range(n)]
    C = [random.randrange(FR_MOD) for _ in range(n)]
    claim = sum(a * b % FR_MOD * c for a, b, c in zip(A, B, C)) % FR_MOD

    pa, pb, pc = (DensePolynomial.from_ints(v) for v in (A, B, C))
    pt = Transcript(b"sumcheck_test")
    proof, _, claims = SumcheckInstanceProof.prove_cubic(claim, 3, pa, pb, pc, pt)

    vt = Transcript(b"sumcheck_test")
    e, _ = proof.verify((claim + 1) % FR_MOD, 3, 3, vt)
    final = claims[0] * claims[1] % FR_MOD * claims[2] % FR_MOD
    assert e != final  # caller's oracle check rejects
