"""Public proof-system API: Assignment, Instance, NIZK (and SNARK).

TPU-native counterpart of /root/reference/src/snark.rs. The NIZK carries
(rx, ry) so its verifier can evaluate A, B, C itself (snark.rs:183-287);
the SNARK instead carries claimed evaluations plus the sparse-matrix
evaluation proof against the preprocessed commitment (snark.rs:393-529).
"""

from __future__ import annotations

from dataclasses import dataclass

from spartan_tpu.core.r1cs import (
    R1CSCommitment,
    R1CSCommitmentGens,
    R1CSDecommitment,
    R1CSEvalProof,
    R1CSShape,
)
from spartan_tpu.core.r1csproof import R1CSGens, R1CSProof
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.utils.errors import (
    InvalidIndexError,
    InvalidNumberOfInputsError,
    InvalidScalarError,
    ProofVerifyError,
)
from spartan_tpu.utils.math import next_power_of_two
from spartan_tpu.utils.random_tape import RandomTape
from spartan_tpu.utils.transcript import Transcript


@dataclass
class Assignment:
    """Variable/input assignment as canonical field ints (snark.rs:20-56)."""

    assignment: list[int]

    def __post_init__(self):
        self.assignment = [v % FR_MOD for v in self.assignment]

    def pad(self, length: int) -> "Assignment":
        assert length > len(self.assignment)
        return Assignment(self.assignment + [0] * (length - len(self.assignment)))


VarsAssignment = Assignment
InputsAssignment = Assignment


class Instance:
    """R1CSShape + digest (snark.rs:59-160)."""

    def __init__(self, inst: R1CSShape):
        self.inst = inst
        self.digest = inst.get_digest()

    @staticmethod
    def new(num_cons: int, num_vars: int, num_inputs: int,
            A: list[tuple[int, int, int]], B: list[tuple[int, int, int]],
            C: list[tuple[int, int, int]]) -> "Instance":
        """Pads dims to powers of two with the circom->Spartan column remap
        (columns >= num_vars shift up by the padding, snark.rs:64-128)."""
        num_vars_padded = next_power_of_two(max(num_vars, num_inputs + 1))
        num_cons_padded = next_power_of_two(max(num_cons, 2))

        def convert(tups):
            out = []
            for row, col, val in tups:
                if row >= num_cons:
                    raise InvalidIndexError("row out of range")
                if col >= num_vars + 1 + num_inputs:
                    raise InvalidIndexError("col out of range")
                if not 0 <= val < FR_MOD:
                    # Scalar::from_bytes rejects non-canonical values
                    # (snark.rs:101: InvalidScalar) rather than reducing
                    raise InvalidScalarError(f"value out of field at ({row},{col})")
                adj = col + num_vars_padded - num_vars if col >= num_vars else col
                out.append((row, adj, val))
            return out

        shape = R1CSShape(num_cons_padded, num_vars_padded, num_inputs,
                          convert(A), convert(B), convert(C))
        return Instance(shape)

    @staticmethod
    def from_shape(shape: R1CSShape) -> "Instance":
        return Instance(shape)

    def is_sat(self, vars_: Assignment, inputs: Assignment) -> bool:
        if len(vars_.assignment) > self.inst.num_vars:
            raise InvalidNumberOfInputsError("too many variables")
        if len(inputs.assignment) != self.inst.num_inputs:
            raise InvalidNumberOfInputsError("wrong number of inputs")
        padded = vars_
        if self.inst.num_vars > len(vars_.assignment):
            padded = vars_.pad(self.inst.num_vars)
        return self.inst.is_sat(padded.assignment, inputs.assignment)


class NIZKGens:
    def __init__(self, num_cons: int, num_vars: int, num_inputs: int):
        num_vars_padded = next_power_of_two(max(num_vars, num_inputs + 1))
        self.gens_r1cs_sat = R1CSGens(b"gens_r1cs_sat", num_cons, num_vars_padded)


@dataclass
class NIZK:
    r1cs_sat_proof: R1CSProof
    r: tuple[list[int], list[int]]

    PROTOCOL = b"Spartan NIZK proof"

    @staticmethod
    def prove(inst: Instance, vars_: Assignment, input_: Assignment,
              gens: NIZKGens, transcript: Transcript,
              random_tape: RandomTape | None = None, mesh=None) -> "NIZK":
        tape = random_tape if random_tape is not None else RandomTape(b"proof")
        transcript.append_protocol_name(NIZK.PROTOCOL)
        transcript.append_message(b"R1CSShapeDigest", inst.digest)

        padded = vars_
        if inst.inst.num_vars > len(vars_.assignment):
            padded = vars_.pad(inst.inst.num_vars)

        proof, rx, ry = R1CSProof.prove(
            inst.inst, padded.assignment, input_.assignment,
            gens.gens_r1cs_sat, transcript, tape, mesh=mesh,
        )
        return NIZK(proof, (rx, ry))

    def verify(self, inst: Instance, input_: Assignment,
               transcript: Transcript, gens: NIZKGens) -> None:
        transcript.append_protocol_name(NIZK.PROTOCOL)
        transcript.append_message(b"R1CSShapeDigest", inst.digest)

        claimed_rx, claimed_ry = self.r
        inst_evals = inst.inst.evaluate(claimed_rx, claimed_ry)

        if len(input_.assignment) != inst.inst.num_inputs:
            raise ProofVerifyError("wrong number of inputs")
        rx, ry = self.r1cs_sat_proof.verify(
            inst.inst.num_vars, inst.inst.num_cons, input_.assignment,
            inst_evals, transcript, gens.gens_r1cs_sat,
        )
        if rx != claimed_rx or ry != claimed_ry:
            raise ProofVerifyError("NIZK: claimed (rx, ry) do not match transcript")


class SNARKGens:
    """Generators for SNARK mode (snark.rs:289-391).

    ``pcs`` selects the derefs commitment at runtime ('hyrax' default,
    'kzg' with an optional preloaded SRS) — replacing the reference's
    compile-time feature flag. Passing a ``SpartanConfig`` instead sets
    the PCS mode from it and, in KZG mode with no preloaded SRS, loads or
    generates one at ``config.srs_path`` (kzg.rs:104-121 semantics).
    """

    def __init__(self, num_cons: int, num_vars: int, num_inputs: int,
                 num_nz_entries: int, pcs: str | None = None, kzg_srs=None,
                 config=None):
        if config is None:
            from spartan_tpu.config import DEFAULT as config
        if pcs is None:
            pcs = config.pcs
        if pcs == "kzg" and kzg_srs is None:
            from spartan_tpu.pcs.kzg import KZGSrs
            from spartan_tpu.utils.math import log_2, pow2

            # derefs batch of 3 rows -> next-pow2 4, x2 row/col split:
            # the largest committed vector is 8 * next_pow2(max_nnz)
            nv = log_2(next_power_of_two(num_nz_entries)) + 3
            kzg_srs = KZGSrs.load_or_generate(
                config.srs_path, pow2(nv) + 1, config.srs_seed)
        num_vars_padded = next_power_of_two(max(num_vars, num_inputs + 1))
        num_cons_padded = next_power_of_two(max(num_cons, 2))
        self.gens_r1cs_sat = R1CSGens(b"gens_r1cs_sat", num_cons_padded, num_vars_padded)
        self.gens_r1cs_eval = R1CSCommitmentGens(
            b"gens_r1cs_eval", num_cons_padded, num_vars_padded, num_nz_entries,
            pcs=pcs, kzg_srs=kzg_srs)


@dataclass
class SNARK:
    """Succinct proof: sat proof + claimed evals + eval proof (snark.rs:393-529)."""

    r1cs_sat_proof: R1CSProof
    inst_evals: tuple[int, int, int]
    r1cs_eval_proof: R1CSEvalProof

    PROTOCOL = b"Spartan SNARK proof"

    @staticmethod
    def encode(inst: Instance, gens: SNARKGens,
               mesh=None) -> tuple[R1CSCommitment, R1CSDecommitment]:
        """Preprocessing: commit the R1CS matrices (snark.rs:416-425)."""
        return inst.inst.commit(gens.gens_r1cs_eval, mesh=mesh)

    @staticmethod
    def prove(inst: Instance, comm: R1CSCommitment, decomm: R1CSDecommitment,
              vars_: Assignment, input_: Assignment, gens: SNARKGens,
              transcript: Transcript,
              random_tape: RandomTape | None = None, mesh=None) -> "SNARK":
        tape = random_tape if random_tape is not None else RandomTape(b"snark_proof")
        transcript.append_protocol_name(SNARK.PROTOCOL)
        comm.append_to_transcript(b"comm", transcript)

        padded = vars_
        if inst.inst.num_vars > len(vars_.assignment):
            padded = vars_.pad(inst.inst.num_vars)

        r1cs_sat_proof, rx, ry = R1CSProof.prove(
            inst.inst, padded.assignment, input_.assignment,
            gens.gens_r1cs_sat, transcript, tape, mesh=mesh,
        )
        inst_evals = inst.inst.evaluate(rx, ry)
        # the sat proof and evaluations are done with the matrices' device
        # state; free it before the lookup argument (HBM-limiting phase)
        for m in (inst.inst.A, inst.inst.B, inst.inst.C):
            m.release_device()
        r1cs_eval_proof = R1CSEvalProof.prove(
            decomm, rx, ry, inst_evals, gens.gens_r1cs_eval, transcript, tape,
            mesh=mesh)
        return SNARK(r1cs_sat_proof, inst_evals, r1cs_eval_proof)

    def verify(self, comm: R1CSCommitment, input_: Assignment,
               transcript: Transcript, gens: SNARKGens) -> None:
        transcript.append_protocol_name(SNARK.PROTOCOL)
        comm.append_to_transcript(b"comm", transcript)

        if len(input_.assignment) != comm.num_inputs:
            raise ProofVerifyError("wrong number of inputs")
        rx, ry = self.r1cs_sat_proof.verify(
            comm.num_vars, comm.num_cons, input_.assignment,
            self.inst_evals, transcript, gens.gens_r1cs_sat,
        )
        self.r1cs_eval_proof.verify(
            comm, rx, ry, self.inst_evals, gens.gens_r1cs_eval, transcript)
