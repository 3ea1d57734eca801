"""Circom .r1cs/.wtns ingestion roundtrip + end-to-end NIZK from files."""

import random

from spartan_tpu.io.r1cs_reader import R1CSFile, parse_wtns, write_r1cs, write_wtns
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.snark import Assignment, Instance
from spartan_tpu.utils.math import next_power_of_two

random.seed(7)


def _write_fixture(tmp_path):
    """Tiny circom-style circuit: one public input p, privates w0, w1.

    circom columns: 0=const1, 1=p (public), 2=w0, 3=w1.
    Constraints: w0 * w0 = w1 ; w1 * 1 = p  (satisfied by w0=3, w1=9, p=9).
    """
    cons = [
        ([(2, 1)], [(2, 1)], [(3, 1)]),
        ([(3, 1)], [(0, 1)], [(1, 1)]),
    ]
    r1cs_path = str(tmp_path / "tiny.r1cs")
    wtns_path = str(tmp_path / "tiny.wtns")
    write_r1cs(r1cs_path, num_variables=4, num_pub=1, num_prv=2, constraints=cons)
    write_wtns(wtns_path, [1, 9, 3, 9])  # [1, publics..., privates...]
    return r1cs_path, wtns_path


def test_r1cs_parse_roundtrip(tmp_path):
    r1cs_path, wtns_path = _write_fixture(tmp_path)
    r = R1CSFile.from_file(r1cs_path)
    s = r.stats()
    assert s.num_constraints == 2
    assert s.num_variables == 4
    assert s.num_pub_inputs == 1
    assert (s.nnz_a, s.nnz_b, s.nnz_c) == (2, 2, 2)
    assert r.num_private_vars() == 2

    wit = parse_wtns(wtns_path)
    assert wit == [1, 9, 3, 9]


def test_r1cs_to_instance_is_sat(tmp_path):
    r1cs_path, wtns_path = _write_fixture(tmp_path)
    r = R1CSFile.from_file(r1cs_path)
    num_vars_padded = next_power_of_two(max(r.num_private_vars(), r.num_pub_inputs + 1))
    A, B, C = r.to_sparse_matrices_padded(num_vars_padded)

    from spartan_tpu.core.r1cs import R1CSShape

    num_cons_padded = next_power_of_two(max(r.num_constraints, 2))
    shape = R1CSShape(num_cons_padded, num_vars_padded, r.num_pub_inputs, A, B, C)
    inst = Instance.from_shape(shape)

    wit = parse_wtns(wtns_path)
    pubs = wit[1:1 + r.num_pub_inputs]
    privs = wit[1 + r.num_pub_inputs:]
    vars_ = Assignment(privs + [0] * (num_vars_padded - len(privs)))
    inputs = Assignment(pubs)
    assert inst.is_sat(vars_, inputs)

    # flipping the witness breaks satisfiability
    bad = Assignment([privs[0] + 1] + privs[1:] + [0] * (num_vars_padded - len(privs)))
    assert not inst.is_sat(bad, inputs)
