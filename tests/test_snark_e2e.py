"""End-to-end SNARK (preprocessing mode) prove -> verify.

Exercises the full lookup argument: derefs commitment, hash layer, product
trees, batched layered sumchecks, and the three Hyrax opening proofs —
model: the reference snark.rs:574-616 test.
"""

import random

import pytest

from spartan_tpu.core.r1cs import R1CSShape
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.snark import Assignment, Instance, SNARK, SNARKGens
from spartan_tpu.utils.errors import SpartanError
from spartan_tpu.utils.random_tape import RandomTape
from spartan_tpu.utils.transcript import Transcript

random.seed(31337)


def _instance(num_cons=8, num_vars=8, num_inputs=1):
    vars_ = [random.randrange(FR_MOD) for _ in range(num_vars)]
    inputs = [random.randrange(FR_MOD) for _ in range(num_inputs)]
    z = vars_ + [1] + inputs
    A, B, C = [], [], []
    for i in range(num_cons):
        ca = random.randrange(len(z))
        cb = random.randrange(len(z))
        va = random.randrange(1, FR_MOD)
        vb = random.randrange(1, FR_MOD)
        A.append((i, ca, va))
        B.append((i, cb, vb))
        C.append((i, num_vars, va * z[ca] % FR_MOD * vb % FR_MOD * z[cb] % FR_MOD))
    shape = R1CSShape(num_cons, num_vars, num_inputs, A, B, C)
    return Instance.from_shape(shape), Assignment(vars_), Assignment(inputs)


def test_snark_roundtrip():
    inst, vars_, inputs = _instance()
    assert inst.is_sat(vars_, inputs)
    max_nnz = max(len(inst.inst.A.M), len(inst.inst.B.M), len(inst.inst.C.M))
    gens = SNARKGens(8, 8, 1, max_nnz)
    comm, decomm = SNARK.encode(inst, gens)

    tape = RandomTape(b"snark_proof", seed=b"\x05" * 32)
    pt = Transcript(b"snark_test")
    proof = SNARK.prove(inst, comm, decomm, vars_, inputs, gens, pt, tape)

    vt = Transcript(b"snark_test")
    proof.verify(comm, inputs, vt, gens)  # raises on failure

    # corrupt a claimed instance evaluation -> must fail
    a, b, c = proof.inst_evals
    proof.inst_evals = ((a + 1) % FR_MOD, b, c)
    with pytest.raises((SpartanError, AssertionError)):
        vt2 = Transcript(b"snark_test")
        proof.verify(comm, inputs, vt2, gens)


def test_snark_kzg_roundtrip():
    """KZG mode: derefs committed/opened via pairing-based KZG."""
    inst, vars_, inputs = _instance()
    max_nnz = max(len(inst.inst.A.M), len(inst.inst.B.M), len(inst.inst.C.M))
    gens = SNARKGens(8, 8, 1, max_nnz, pcs="kzg")
    comm, decomm = SNARK.encode(inst, gens)

    tape = RandomTape(b"snark_proof", seed=b"\x06" * 32)
    pt = Transcript(b"snark_kzg_test")
    proof = SNARK.prove(inst, comm, decomm, vars_, inputs, gens, pt, tape)

    vt = Transcript(b"snark_kzg_test")
    proof.verify(comm, inputs, vt, gens)


def test_snark_corrupted_product_layer_diagnostics():
    """A corrupted grand-product claim reports which layer and which claim
    diverged (reference ergonomics: product_tree.rs:461-505 eprintln!)."""
    inst, vars_, inputs = _instance()
    max_nnz = max(len(inst.inst.A.M), len(inst.inst.B.M), len(inst.inst.C.M))
    gens = SNARKGens(8, 8, 1, max_nnz)
    comm, decomm = SNARK.encode(inst, gens)

    tape = RandomTape(b"snark_proof", seed=b"\x07" * 32)
    pt = Transcript(b"snark_diag")
    proof = SNARK.prove(inst, comm, decomm, vars_, inputs, gens, pt, tape)

    pl = proof.r1cs_eval_proof.proof.poly_eval_network_proof.proof_prod_layer
    init, read, write, audit = pl.eval_row
    pl.eval_row = ((init + 1) % FR_MOD, read, write, audit)

    from spartan_tpu.utils.errors import ProofVerifyError

    with pytest.raises(ProofVerifyError) as exc_info:
        proof.verify(comm, inputs, Transcript(b"snark_diag"), gens)
    msg = str(exc_info.value)
    assert "multiset" in msg and "init=0x" in msg  # names the failing claim
