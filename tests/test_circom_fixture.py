"""Ingest a circom-layout binary fixture end-to-end.

tests/fixtures/multiplier2.{r1cs,wtns} are the classic tutorial circuit
(c <== a*b) assembled byte-by-byte per the iden3 r1cs/wtns binary specs by
tools/make_circom_fixture.py — independently of spartan_tpu's own writers,
including the wire2label section (3) circom emits but write_r1cs doesn't.
No circom binary exists in this zero-egress image (documented there), so
this is the closest available stand-in for a circom-produced file; it
pins the byte-format assumptions the parsers made from the spec:
little-endian section table, 32-byte LE field elements, negative
coefficients as r-1, circom wire order [1, pubout, pubin, priv].

Reference parity: /root/reference/src/r1cs_reader.rs:27-140 (r1cs),
/root/reference/examples/keyless_benchmark.rs:38-72 (wtns).
"""

import os

from spartan_tpu.io.keyless_bench import load_circom
from spartan_tpu.io.r1cs_reader import R1CSFile, parse_wtns
from spartan_tpu.ops.fields_host import FR_MOD

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
R1CS = os.path.join(FIXDIR, "multiplier2.r1cs")
WTNS = os.path.join(FIXDIR, "multiplier2.wtns")


def test_parse_multiplier2_r1cs():
    r = R1CSFile.from_file(R1CS)
    assert r.num_constraints == 1
    assert r.num_variables == 4
    assert r.num_pub_inputs == 1      # circom nPubOut(1) + nPubIn(0)
    assert r.num_prv_inputs == 2
    assert r.num_labels == 4
    # c <== a*b compiles to (-a)*(b) - (-c) = 0
    assert r.a == [(0, 2, FR_MOD - 1)]
    assert r.b == [(0, 3, 1)]
    assert r.c == [(0, 1, FR_MOD - 1)]


def test_parse_multiplier2_wtns():
    wit = parse_wtns(WTNS)
    assert wit == [1, 33, 3, 11]  # [const 1, c, a, b]


def test_column_remap_matches_reference():
    """circom -> Spartan variable order (r1cs_reader.rs:213-242)."""
    r = R1CSFile.from_file(R1CS)
    num_vars_padded = 2  # next_pow2(max(privates=2, pubs+1=2))
    a, b, c = r.to_sparse_matrices_padded(num_vars_padded)
    # private a (circom wire 2) -> spartan col 0, b (wire 3) -> col 1,
    # const 1 -> col num_vars_padded, public c (wire 1) -> col padded+1
    assert a == [(0, 0, FR_MOD - 1)]
    assert b == [(0, 1, 1)]
    assert c == [(0, 3, FR_MOD - 1)]


def test_multiplier2_snark_e2e():
    """Full pipeline: fixture bytes -> Instance -> SNARK prove -> verify."""
    from spartan_tpu.snark import SNARK, SNARKGens
    from spartan_tpu.utils.random_tape import RandomTape
    from spartan_tpu.utils.transcript import Transcript

    inst, vars_, inputs, max_nnz = load_circom(R1CS, WTNS)
    assert inst.inst.is_sat(vars_.assignment, inputs.assignment)
    n = inst.inst.num_cons
    gens = SNARKGens(n, inst.inst.num_vars, inst.inst.num_inputs, max_nnz)
    comm, decomm = SNARK.encode(inst, gens)
    proof = SNARK.prove(inst, comm, decomm, vars_, inputs, gens,
                        Transcript(b"circom_fixture"), RandomTape(b"proof"))
    proof.verify(comm, inputs, Transcript(b"circom_fixture"), gens)
