"""SNARK e2e exercising the chunk/threshold logic toy tests never reach
(VERDICT r1 weak #5): commit_rows row chunking, MSM _CHUNK_BUDGET row
batching, DensePolynomial.bound L-axis chunking, and the HOST_N
host/device switchover mid-sumcheck.

Rather than a 2^10+ instance (40+ CPU-minutes), the chunk budgets are
shrunk so a 2^8 instance crosses every boundary: each budget is a
module-level constant exactly so this test can reach the same code paths
the 2^20 prover uses.
"""

import random

from spartan_tpu.io.keyless_bench import synthetic
from spartan_tpu.snark import SNARK, SNARKGens
from spartan_tpu.utils.random_tape import RandomTape
from spartan_tpu.utils.serialization import deserialize, serialize
from spartan_tpu.utils.transcript import Transcript

random.seed(77)


def test_snark_e2e_chunk_boundaries(monkeypatch):
    from spartan_tpu.core import commitments as CM
    from spartan_tpu.core import hostpath as HP
    from spartan_tpu.core import mle as MLE
    from spartan_tpu.ops import msm as MSM

    # force device paths + 2-3 chunks per mechanism at 2^7 scale (smaller
    # budgets make MORE chunks but each chunk is a device dispatch — at
    # 2^8/ROWS_BUDGET=256 the test ran >25 min on CPU; chunk-boundary
    # coverage only needs >=2 chunks)
    monkeypatch.setattr(HP, "HOST_N", 128)          # switchover mid-sumcheck
    monkeypatch.setattr(HP, "host_commit_points", lambda: 64)
    monkeypatch.setattr(CM, "ROWS_BUDGET", 4096)    # commit_rows row chunks
    monkeypatch.setattr(MSM, "_CHUNK_BUDGET", 16384)  # MSM window-row chunks
    monkeypatch.setattr(MLE, "BOUND_BUDGET", 4096)  # bound L-axis chunks

    inst, vars_, inputs, max_nnz = synthetic(7, seed=11)
    n = inst.inst.num_cons
    gens = SNARKGens(n, n, 1, max_nnz)
    comm, decomm = SNARK.encode(inst, gens)
    proof = SNARK.prove(inst, comm, decomm, vars_, inputs, gens,
                        Transcript(b"midsize"), RandomTape(b"snark_proof"))
    proof.verify(comm, inputs, Transcript(b"midsize"), gens)

    # canonical round-trip at this scale too
    blob = serialize(proof)
    proof2 = deserialize(SNARK, blob, pcs="hyrax")
    proof2.verify(comm, inputs, Transcript(b"midsize"), gens)
