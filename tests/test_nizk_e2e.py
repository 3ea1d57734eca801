"""End-to-end NIZK prove -> verify (SURVEY.md §7 step 6, the first demo).

Mirrors the reference round-trip tests (snark.rs:531-572, r1csproof.rs:622-682):
tiny x*x = x instance plus a random synthetic R1CS, and a corrupted-proof
rejection check. Exercises transcript + MSM + both ZK sumchecks + Hyrax
opening together.
"""

import random

import pytest

from spartan_tpu.core.r1cs import R1CSShape
from spartan_tpu.ops.fields_host import FR_MOD, fr_inv
from spartan_tpu.snark import Assignment, Instance, NIZK, NIZKGens
from spartan_tpu.utils.errors import ProofVerifyError, SpartanError
from spartan_tpu.utils.random_tape import RandomTape
from spartan_tpu.utils.transcript import Transcript

random.seed(2024)


def _tiny_instance():
    # one constraint x * x = x over 4 vars, 1 input (r1csproof.rs:627-649)
    A = [(0, 0, 1)]
    B = [(0, 0, 1)]
    C = [(0, 0, 1)]
    shape = R1CSShape(4, 4, 1, A, B, C)
    inst = Instance.from_shape(shape)
    vars_ = Assignment([1, 0, 0, 0])
    inputs = Assignment([1])
    return inst, vars_, inputs


def _random_instance(num_cons=16, num_vars=16, num_inputs=2):
    """Synthetic satisfiable R1CS: random A,B entries; C fixes the product."""
    vars_ = [random.randrange(FR_MOD) for _ in range(num_vars)]
    inputs = [random.randrange(FR_MOD) for _ in range(num_inputs)]
    z = vars_ + [1] + inputs  # columns 0..num_vars+num_inputs
    A, B, C = [], [], []
    for i in range(num_cons):
        acols = random.sample(range(len(z)), 2)
        bcols = random.sample(range(len(z)), 2)
        az = bz = 0
        for c in acols:
            v = random.randrange(1, FR_MOD)
            A.append((i, c, v))
            az = (az + v * z[c]) % FR_MOD
        for c in bcols:
            v = random.randrange(1, FR_MOD)
            B.append((i, c, v))
            bz = (bz + v * z[c]) % FR_MOD
        # C row: single entry at the constant-1 column (num_vars)
        C.append((i, num_vars, az * bz % FR_MOD))
    shape = R1CSShape(num_cons, num_vars, num_inputs, A, B, C)
    return Instance.from_shape(shape), Assignment(vars_), Assignment(inputs)


def test_is_sat():
    inst, vars_, inputs = _tiny_instance()
    assert inst.is_sat(vars_, inputs)
    bad = Assignment([2, 0, 0, 0])
    assert not inst.is_sat(bad, inputs)


def test_nizk_tiny_roundtrip():
    inst, vars_, inputs = _tiny_instance()
    gens = NIZKGens(4, 4, 1)
    tape = RandomTape(b"proof", seed=b"\x07" * 32)

    pt = Transcript(b"nizk_test")
    proof = NIZK.prove(inst, vars_, inputs, gens, pt, tape)

    vt = Transcript(b"nizk_test")
    proof.verify(inst, inputs, vt, gens)  # raises on failure


def test_nizk_random_roundtrip_and_corruption():
    inst, vars_, inputs = _random_instance()
    gens = NIZKGens(16, 16, 2)
    tape = RandomTape(b"proof", seed=b"\x09" * 32)

    pt = Transcript(b"nizk_test")
    proof = NIZK.prove(inst, vars_, inputs, gens, pt, tape)

    vt = Transcript(b"nizk_test")
    proof.verify(inst, inputs, vt, gens)

    # corrupted claimed evaluation point must be rejected
    proof.r = (list(proof.r[0]), [(proof.r[1][0] + 1) % FR_MOD] + proof.r[1][1:])
    with pytest.raises((SpartanError, AssertionError)):
        vt2 = Transcript(b"nizk_test")
        proof.verify(inst, inputs, vt2, gens)

    # wrong input must be rejected
    proof.r = (proof.r[0], [(proof.r[1][0] - 1) % FR_MOD] + proof.r[1][1:])
    bad_inputs = Assignment([(inputs.assignment[0] + 1) % FR_MOD, inputs.assignment[1]])
    with pytest.raises((SpartanError, AssertionError)):
        vt3 = Transcript(b"nizk_test")
        proof.verify(inst, bad_inputs, vt3, gens)
