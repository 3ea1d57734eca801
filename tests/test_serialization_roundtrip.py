"""Canonical serialize -> deserialize -> verify round-trips.

The reference persists proofs via arkworks CanonicalSerialize/Deserialize
(snark.rs:403-404); this checks our schema-driven byte format is a true
inverse (no pickle anywhere) and that malformed bytes are rejected rather
than trusted.
"""

import random

import pytest

from spartan_tpu.core.r1cs import R1CSShape
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.snark import NIZK, SNARK, Assignment, Instance, NIZKGens, SNARKGens
from spartan_tpu.utils.random_tape import RandomTape
from spartan_tpu.utils.serialization import deserialize, serialize
from spartan_tpu.utils.transcript import Transcript

random.seed(777)


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


def test_nizk_roundtrip_bytes():
    inst, vars_, inputs = _instance()
    gens = NIZKGens(8, 8, 1)
    tape = RandomTape(b"proof", seed=b"\x11" * 32)
    proof = NIZK.prove(inst, vars_, inputs, gens, Transcript(b"ser_nizk"), tape)

    blob = serialize(proof)
    proof2 = deserialize(NIZK, blob)
    assert serialize(proof2) == blob
    proof2.verify(inst, inputs, Transcript(b"ser_nizk"), gens)

    # truncation and trailing garbage must be rejected
    with pytest.raises(ValueError):
        deserialize(NIZK, blob[:-1])
    with pytest.raises(ValueError):
        deserialize(NIZK, blob + b"\x00")


def test_noncanonical_scalar_rejected():
    """Scalar bytes >= p must be rejected, not reduced (scalar.rs:74-95):
    otherwise v and v+p decode to identical verifier behavior and proof
    bytes are malleable."""
    v = random.randrange(FR_MOD)
    canon = v.to_bytes(32, "little")
    assert deserialize("int", canon) == v
    for bad in (v + FR_MOD, FR_MOD, (1 << 256) - 1):
        with pytest.raises(ValueError):
            deserialize("int", (bad % (1 << 256)).to_bytes(32, "little"))


@pytest.mark.parametrize("pcs", ["hyrax", "kzg"])
def test_snark_roundtrip_bytes(pcs):
    inst, vars_, inputs = _instance()
    max_nnz = max(len(inst.inst.A.M), len(inst.inst.B.M), len(inst.inst.C.M))
    gens = SNARKGens(8, 8, 1, max_nnz, pcs=pcs)
    comm, decomm = SNARK.encode(inst, gens)
    tape = RandomTape(b"snark_proof", seed=b"\x12" * 32)
    proof = SNARK.prove(inst, comm, decomm, vars_, inputs, gens,
                        Transcript(b"ser_snark"), tape)

    blob = serialize(proof)
    proof2 = deserialize(SNARK, blob, pcs=pcs)
    assert serialize(proof2) == blob
    proof2.verify(comm, inputs, Transcript(b"ser_snark"), gens)

    # a flipped point byte must either fail decompression or fail verify
    bad = bytearray(blob)
    bad[5] ^= 0xFF
    try:
        p3 = deserialize(SNARK, bytes(bad), pcs=pcs)
        with pytest.raises(Exception):
            p3.verify(comm, inputs, Transcript(b"ser_snark"), gens)
    except ValueError:
        pass

    # the commitment round-trips through the same format
    from spartan_tpu.core.r1cs import R1CSCommitment

    cblob = serialize(comm)
    comm2 = deserialize(R1CSCommitment, cblob, pcs=pcs)
    assert serialize(comm2) == cblob
