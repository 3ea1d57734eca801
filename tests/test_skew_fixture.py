"""End-to-end SNARK over a generated keyless-skew circom circuit.

VERDICT r4 #3/#10: the synthetic bench uses a uniform 3-NNZ/row
structure; the reference's numbers come from a real circuit with heavy
column reuse. tools/make_circom_fixture.big_bytes emits a
circom-binary-format circuit with Zipf-skewed wire reuse and 2-4 terms
per A/B row; this drives it through the real .r1cs/.wtns loaders and a
full SNARK prove/verify, so address skew exercises the timestamp
machinery, product trees, and hash layers the way a real circuit does.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from spartan_tpu.io.keyless_bench import load_circom  # noqa: E402
from spartan_tpu.snark import SNARK, SNARKGens  # noqa: E402
from spartan_tpu.utils.random_tape import RandomTape  # noqa: E402
from spartan_tpu.utils.transcript import Transcript  # noqa: E402


@pytest.mark.parametrize("log2", [6])
def test_skew_circuit_snark_roundtrip(log2, tmp_path):
    import make_circom_fixture as MF

    r1cs, wtns, stats = MF.big_bytes(log2, seed=3)
    rp, wp = tmp_path / "skew.r1cs", tmp_path / "skew.wtns"
    rp.write_bytes(r1cs)
    wp.write_bytes(wtns)

    inst, vars_, inputs, max_nnz = load_circom(str(rp), str(wp))
    assert stats["constraints"] == 1 << log2
    assert inst.is_sat(vars_, inputs)

    gens = SNARKGens(inst.inst.num_cons, inst.inst.num_vars,
                     inst.inst.num_inputs, max_nnz)
    comm, decomm = SNARK.encode(inst, gens)
    tape = RandomTape(b"snark_proof", seed=b"\x21" * 32)
    proof = SNARK.prove(inst, comm, decomm, vars_, inputs, gens,
                        Transcript(b"skew_test"), tape)
    proof.verify(comm, inputs, Transcript(b"skew_test"), gens)
