"""Product-tree circuits + batched layered proofs (product_tree.rs:540-689)."""

import random

from spartan_tpu.core.mle import DensePolynomial
from spartan_tpu.core.product_tree import (
    DotProductCircuit,
    ProductCircuit,
    ProductCircuitEvalProof,
    ProductCircuitEvalProofBatched,
)
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.utils.transcript import Transcript

random.seed(11)


def test_product_circuit_evaluate():
    vals = [2, 3, 5, 7]
    circ = ProductCircuit(DensePolynomial.from_ints(vals))
    assert circ.evaluate() == 210


def test_dot_product_circuit():
    left = DensePolynomial.from_ints([1, 2, 3, 4])
    right = DensePolynomial.from_ints([5, 6, 7, 8])
    weight = DensePolynomial.from_ints([1, 1, 1, 1])
    circ = DotProductCircuit(left, right, weight)
    assert circ.evaluate() == 70


def test_single_circuit_proof_roundtrip():
    vals = [random.randrange(1, FR_MOD) for _ in range(8)]
    circ = ProductCircuit(DensePolynomial.from_ints(vals))
    claim = circ.evaluate()
    pt = Transcript(b"test_single")
    proof, final_claim, _rand = ProductCircuitEvalProof.prove(circ, pt)
    vt = Transcript(b"test_single")
    got_claim, _ = proof.verify(claim, 8, vt)
    assert got_claim == final_claim


def test_batched_proof_roundtrip():
    vals1 = [random.randrange(1, FR_MOD) for _ in range(8)]
    vals2 = [random.randrange(1, FR_MOD) for _ in range(8)]
    c1 = ProductCircuit(DensePolynomial.from_ints(vals1))
    c2 = ProductCircuit(DensePolynomial.from_ints(vals2))
    claim1, claim2 = c1.evaluate(), c2.evaluate()
    exp1 = 1
    for v in vals1:
        exp1 = exp1 * v % FR_MOD
    assert claim1 == exp1

    pt = Transcript(b"test_batched")
    proof, _rand = ProductCircuitEvalProofBatched.prove([c1, c2], [], pt)

    vt = Transcript(b"test_batched")
    proof.verify([claim1, claim2], [], 8, vt)


def test_batched_proof_with_dotp():
    vals1 = [random.randrange(1, FR_MOD) for _ in range(8)]
    c1 = ProductCircuit(DensePolynomial.from_ints(vals1))
    claim1 = c1.evaluate()

    # a dotp circuit of half length (as in the product layer: split halves)
    L = [random.randrange(FR_MOD) for _ in range(8)]
    R = [random.randrange(FR_MOD) for _ in range(8)]
    W = [random.randrange(FR_MOD) for _ in range(8)]
    full = DotProductCircuit(
        DensePolynomial.from_ints(L), DensePolynomial.from_ints(R),
        DensePolynomial.from_ints(W))
    dl, dr = full.split()
    el, er = dl.evaluate(), dr.evaluate()
    assert (el + er) % FR_MOD == sum(l * r * w for l, r, w in zip(L, R, W)) % FR_MOD

    pt = Transcript(b"test_with_dotp")
    proof, _ = ProductCircuitEvalProofBatched.prove([c1], [dl, dr], pt)

    vt = Transcript(b"test_with_dotp")
    claims, claims_dotp, _ = proof.verify([claim1], [el, er], 8, vt)
    assert len(claims_dotp) == 3


def test_batched_proof_big_layer_chunked_bit_identical(monkeypatch):
    """The per-instance big-layer path (engaged when a layer's tables exceed
    BIG_STEP_BYTES, as at keyless 2^20 scale where the one-dispatch fused
    step OOMed 16 GB HBM) must produce the same proof bytes as the fused
    step and the fused-tail driver."""
    from spartan_tpu.core import sumcheck as SC
    from spartan_tpu.core import sumcheck_fused as SF
    from spartan_tpu.core import hostpath as HP

    rng = random.Random(5)
    n = 256
    circuits_vals = [[rng.randrange(1, FR_MOD) for _ in range(n)]
                     for _ in range(3)]

    def prove():
        cs = [ProductCircuit(DensePolynomial.from_ints(v))
              for v in circuits_vals]
        pt = Transcript(b"test_chunked")
        proof, _ = ProductCircuitEvalProofBatched.prove(cs, [], pt)
        return proof

    base = prove()

    # force the chunked path for every device-sized layer: tiny byte budget,
    # no fused tail, no host tail
    monkeypatch.setattr(SC, "BIG_STEP_BYTES", 1)
    monkeypatch.setattr(SF, "FUSED", False)
    monkeypatch.setattr(HP, "HOST_N", 2)
    chunked = prove()

    for a, b in zip(base.proof, chunked.proof):
        assert [p.coeffs_except_linear_term for p in a.proof.compressed_polys] \
            == [p.coeffs_except_linear_term for p in b.proof.compressed_polys]
        assert a.claims_prod_left == b.claims_prod_left
        assert a.claims_prod_right == b.claims_prod_right

    vt = Transcript(b"test_chunked")
    claims = [ProductCircuit(DensePolynomial.from_ints(v)).evaluate()
              for v in circuits_vals]
    chunked.verify(claims, [], n, vt)
