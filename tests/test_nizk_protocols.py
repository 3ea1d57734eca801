"""Sigma-protocol roundtrips (nizk/mod.rs:570-713 model)."""

import random

import pytest

from spartan_tpu.core.commitments import MultiCommitGens, commit
from spartan_tpu.core.mle import compute_dotproduct
from spartan_tpu.core.nizk import (
    DotProductProof,
    DotProductProofGens,
    DotProductProofLog,
    EqualityProof,
    KnowledgeProof,
    ProductProof,
)
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.utils.errors import ProofVerifyError
from spartan_tpu.utils.random_tape import RandomTape
from spartan_tpu.utils.transcript import Transcript

random.seed(41)


@pytest.fixture(scope="module")
def gens_1():
    return MultiCommitGens(1, b"test-gens-1")


@pytest.fixture(scope="module")
def tape():
    return RandomTape(b"proof", seed=b"\x03" * 32)


def test_knowledge_proof(gens_1, tape):
    x, r = random.randrange(FR_MOD), random.randrange(FR_MOD)
    pt = Transcript(b"kp")
    proof, C = KnowledgeProof.prove(gens_1, pt, tape, x, r)
    vt = Transcript(b"kp")
    proof.verify(gens_1, vt, C)


def test_equality_proof(gens_1, tape):
    v = random.randrange(FR_MOD)
    s1, s2 = random.randrange(FR_MOD), random.randrange(FR_MOD)
    pt = Transcript(b"eq")
    proof, C1, C2 = EqualityProof.prove(gens_1, pt, tape, v, s1, v, s2)
    vt = Transcript(b"eq")
    proof.verify(gens_1, vt, C1, C2)


def test_product_proof(gens_1, tape):
    x, y = random.randrange(FR_MOD), random.randrange(FR_MOD)
    z = x * y % FR_MOD
    rX, rY, rZ = (random.randrange(FR_MOD) for _ in range(3))
    pt = Transcript(b"pp")
    proof, X, Y, Z = ProductProof.prove(gens_1, pt, tape, x, rX, y, rY, z, rZ)
    vt = Transcript(b"pp")
    proof.verify(gens_1, vt, X, Y, Z)

    # wrong product must fail
    bad = x * y % FR_MOD + 1
    pt2 = Transcript(b"pp")
    proof2, X2, Y2, Z2 = ProductProof.prove(gens_1, pt2, tape, x, rX, y, rY, bad, rZ)
    with pytest.raises(ProofVerifyError):
        vt2 = Transcript(b"pp")
        proof2.verify(gens_1, vt2, X2, Y2, Z2)


def test_dot_product_proof(gens_1, tape):
    n = 4
    gens_n = MultiCommitGens(n, b"test-gens-n")
    x = [random.randrange(FR_MOD) for _ in range(n)]
    a = [random.randrange(FR_MOD) for _ in range(n)]
    y = compute_dotproduct(x, a)
    bx, by = random.randrange(FR_MOD), random.randrange(FR_MOD)
    pt = Transcript(b"dp")
    proof, Cx, Cy = DotProductProof.prove(gens_1, gens_n, pt, tape, x, bx, a, y, by)
    vt = Transcript(b"dp")
    proof.verify(gens_1, gens_n, vt, a, Cx, Cy)


def test_dot_product_proof_log(tape):
    n = 8
    gens = DotProductProofGens(n, b"test-gens-log")
    x = [random.randrange(FR_MOD) for _ in range(n)]
    a = [random.randrange(FR_MOD) for _ in range(n)]
    y = compute_dotproduct(x, a)
    bx, by = random.randrange(FR_MOD), random.randrange(FR_MOD)
    x_m, a_m = F.encode_fr(x), F.encode_fr(a)
    pt = Transcript(b"dpl")
    proof, Cx, Cy = DotProductProofLog.prove(gens, pt, tape, x_m, bx, a_m, y, by)
    vt = Transcript(b"dpl")
    proof.verify(n, gens, vt, a_m, Cx, Cy)
