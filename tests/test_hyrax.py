"""Hyrax PCS: commit + evaluation proof roundtrip, plus proof serialization."""

import random

from spartan_tpu.core.mle import DensePolynomial
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.pcs.hyrax import PolyCommitmentGens, PolyEvalProof, commit_poly
from spartan_tpu.utils.random_tape import RandomTape
from spartan_tpu.utils.serialization import serialize, size_bytes
from spartan_tpu.utils.transcript import Transcript

random.seed(61)


def test_hyrax_commit_eval_roundtrip():
    ell = 4
    vals = [random.randrange(FR_MOD) for _ in range(1 << ell)]
    poly = DensePolynomial.from_ints(vals)
    gens = PolyCommitmentGens(ell, b"test-hyrax")
    tape = RandomTape(b"proof", seed=b"\x04" * 32)

    comm, blinds = commit_poly(poly, gens, tape)
    r = [random.randrange(FR_MOD) for _ in range(ell)]
    Zr = poly.evaluate(r)
    blind_Zr = tape.random_scalar(b"blind_Zr")

    pt = Transcript(b"hyrax")
    proof, C_Zr = PolyEvalProof.prove(poly, blinds, r, Zr, blind_Zr, gens, pt, tape)

    vt = Transcript(b"hyrax")
    proof.verify(gens, vt, r, C_Zr, comm)


def test_hyrax_plain_verify_unblinded():
    ell = 4
    vals = [random.randrange(FR_MOD) for _ in range(1 << ell)]
    poly = DensePolynomial.from_ints(vals)
    gens = PolyCommitmentGens(ell, b"test-hyrax")
    tape = RandomTape(b"proof", seed=b"\x08" * 32)

    comm, _ = commit_poly(poly, gens)  # zero blinds
    r = [random.randrange(FR_MOD) for _ in range(ell)]
    Zr = poly.evaluate(r)

    pt = Transcript(b"hyrax2")
    proof, _ = PolyEvalProof.prove(poly, None, r, Zr, None, gens, pt, tape)
    vt = Transcript(b"hyrax2")
    proof.verify_plain(gens, vt, r, Zr, comm)

    # serialization: deterministic, point-sized
    b1 = serialize(proof)
    b2 = serialize(proof)
    assert b1 == b2
    assert size_bytes(comm) == 4 + 4 * 32  # u32 len + L_size=4 compressed points
