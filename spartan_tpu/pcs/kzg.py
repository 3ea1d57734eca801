"""KZG polynomial commitment scheme — O(1) proofs behind a trusted setup.

TPU-native counterpart of /root/reference/src/kzg.rs: powers-of-tau SRS
(setup/save/load), commitments and quotient openings as device MSMs, and
host-side pairing verification (spartan_tpu.ops.pairing). The quotient by
(x - z) — the reference's sequential synthetic division (kzg.rs:231-256) —
is reformulated as suffix-Horner: q_i = sum_{j>i} p_j z^{j-i-1}, computed
with two log-depth device scans (powers of z, suffix sums).

Like the reference (kzg.rs:149-154), the "multilinear" wrappers commit to
the evaluation vector directly as monomial coefficients.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.core.group import GroupElem
from spartan_tpu.ops import curve_host as CH
from spartan_tpu.ops import curve_jax as CJ
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops import msm as MSM
from spartan_tpu.ops import pairing as PR
from spartan_tpu.ops.fields_host import FR_MOD, fr_from_bytes, fr_inv
from spartan_tpu.ops.limbs import NUM_LIMBS, ints_to_limbs
from spartan_tpu.ops.scan import inclusive_scan
from spartan_tpu.utils.errors import ProofVerifyError

fr = F.fr


@jax.jit
def _k_powers(z_mont, template):
    """[1, z, z^2, ...] Montgomery, length = template.shape[0]."""
    zs = jnp.broadcast_to(z_mont, template.shape)
    unit = jnp.asarray(F.FR.r1_limbs, jnp.uint32)
    scanned = inclusive_scan(fr.mul, zs, unit)  # [z, z^2, ...]
    return jnp.concatenate([unit[None], scanned[:-1]], axis=0)


@jax.jit
def _k_quotient(p_mont, z_mont, zinv_mont):
    """Quotient of (p(x) - p(z)) / (x - z), dropping the constant check.

    q_i = sum_{j >= i+1} p_j z^{j-i-1} = z^{-(i+1)} * suffix_{i+1}(p_j z^j).
    """
    n = p_mont.shape[0]
    zpow = _k_powers(z_mont, p_mont)            # z^j
    zinvpow = _k_powers(zinv_mont, p_mont)      # z^-j
    w = fr.mul(p_mont, zpow)
    unit = jnp.zeros((NUM_LIMBS,), jnp.uint32)
    suffix = inclusive_scan(fr.add, w, unit, reverse=True)  # S_i = sum_{j>=i} w_j
    s_next = jnp.concatenate([suffix[1:], jnp.zeros((1, NUM_LIMBS), jnp.uint32)], axis=0)
    # q_i = S_{i+1} * z^{-(i+1)}
    zinv1 = fr.mul(zinvpow, jnp.broadcast_to(zinv_mont, zinvpow.shape))
    return fr.mul(s_next, zinv1)[: n - 1]


class KZGSrs:
    """Powers of tau: [tau^i]G1 (device affine), [tau]G2, G2 (kzg.rs:22-121)."""

    def __init__(self, powers_g1, tau_g2, g2, size: int):
        self.powers_g1 = powers_g1  # affine device tuple (x, y, inf), [size]
        self.tau_g2 = tau_g2        # host G2 point
        self.g2 = g2
        self.size = size

    @staticmethod
    def setup_from_seed(max_degree: int, seed: int) -> "KZGSrs":
        """Deterministic SRS (TESTING ONLY — tau is derivable from seed).

        Tau derivation differs from the reference's arkworks StdRng; any
        deterministic map works since test SRS compatibility is per-library.
        """
        tau = int.from_bytes(
            hashlib.sha256(b"spartan_tpu.kzg.tau" + seed.to_bytes(8, "little")).digest(),
            "little") % FR_MOD
        return KZGSrs.setup_from_tau(max_degree, tau)

    @staticmethod
    def setup_from_tau(max_degree: int, tau: int) -> "KZGSrs":
        from spartan_tpu.core.commitments import points_from_scalars

        n = max_degree + 1
        # tau^i scalars on host (exact), points via windowed fixed-base MSM
        powers = [1] * n
        for i in range(1, n):
            powers[i] = powers[i - 1] * tau % FR_MOD
        powers_g1 = points_from_scalars(powers)
        tau_g2 = PR.g2_mul(tau, PR.G2_GEN)
        return KZGSrs(powers_g1, tau_g2, PR.G2_GEN, n)

    def max_degree(self) -> int:
        return self.size - 1

    def save_to_file(self, path: str) -> None:
        x, y, inf = (np.asarray(jax.device_get(a)) for a in self.powers_g1)
        np.savez(path, x=x, y=y, inf=inf,
                 tau_g2=np.array(sum(self.tau_g2, ()), dtype=object).astype(str),
                 g2=np.array(sum(self.g2, ()), dtype=object).astype(str))

    @staticmethod
    def load_from_file(path: str) -> "KZGSrs":
        # plain numeric/str arrays only — never allow_pickle on files that
        # may come from outside (arbitrary-code-execution vector)
        d = np.load(path if path.endswith(".npz") else path + ".npz")
        powers = (jnp.asarray(d["x"]), jnp.asarray(d["y"]), jnp.asarray(d["inf"]))
        t = [int(s) for s in d["tau_g2"]]
        g = [int(s) for s in d["g2"]]
        return KZGSrs(powers, ((t[0], t[1]), (t[2], t[3])),
                      ((g[0], g[1]), (g[2], g[3])), int(d["x"].shape[0]))

    @staticmethod
    def load_or_generate(path: str, max_degree: int, seed: int) -> "KZGSrs":
        try:
            srs = KZGSrs.load_from_file(path)
            if srs.size > max_degree:
                return srs
        except (OSError, KeyError, ValueError):
            pass
        srs = KZGSrs.setup_from_seed(max_degree, seed)
        srs.save_to_file(path)
        return srs


def _commit_msm(srs: KZGSrs, coeffs_mont, mesh=None) -> GroupElem:
    n = coeffs_mont.shape[0]
    assert n <= srs.size, "polynomial degree exceeds SRS size"
    pts = tuple(a[:n] for a in srs.powers_g1)
    sc = fr.from_mont(coeffs_mont)
    if mesh is not None and mesh.devices.size > 1 and \
            n % mesh.devices.size == 0 and n >= 4 * mesh.devices.size:
        from spartan_tpu.parallel.mesh import shard_table
        from spartan_tpu.parallel.msm_sharded import msm_sharded

        pts_sh = tuple(shard_table(mesh, a) for a in pts)
        out = msm_sharded(mesh, pts_sh, shard_table(mesh, sc),
                          c=MSM.default_window(n // mesh.devices.size))
    else:
        out = MSM.msm(pts, sc)
    return GroupElem(CJ.decode_points(tuple(a[None] for a in out))[0])


@dataclass
class KZGCommitment:
    """One G1 point (kzg.rs:123-155)."""

    commitment: GroupElem

    @staticmethod
    def commit(coeffs_mont, srs: KZGSrs) -> "KZGCommitment":
        return KZGCommitment(_commit_msm(srs, coeffs_mont))

    def append_to_transcript(self, label: bytes, transcript) -> None:
        transcript.append_message(label, self.commitment.compress())


@dataclass
class KZGProof:
    """One G1 quotient commitment (kzg.rs:165-257)."""

    proof: GroupElem

    @staticmethod
    def prove(coeffs_mont, point: int, srs: KZGSrs,
              mesh=None) -> tuple["KZGProof", int]:
        from spartan_tpu.core.mle import k_dot

        n = coeffs_mont.shape[0]
        z = F.encode_fr([point])[0]
        zpow = _k_powers(z, coeffs_mont)
        eval_ = F.decode_fr(k_dot(coeffs_mont, zpow)[None])[0]
        if n <= 1:
            return KZGProof(GroupElem.identity()), eval_
        if point % FR_MOD == 0:
            # (p(x) - p(0)) / x is the coefficient shift; the suffix-Horner
            # form below needs z^-1 and is undefined at z = 0
            q = coeffs_mont[1:]
        else:
            zinv = F.encode_fr([fr_inv(point)])[0]
            q = _k_quotient(coeffs_mont, z, zinv)
        return KZGProof(_commit_msm(srs, q, mesh=mesh)), eval_

    def verify(self, commitment: KZGCommitment, point: int, eval_: int,
               srs: KZGSrs) -> bool:
        """e(C - y*G1, G2) == e(pi, tau*G2 - z*G2) (kzg.rs:194-217)."""
        lhs_g1 = CH.add(commitment.commitment.p, CH.neg(CH.scalar_mul(eval_, CH.GEN)))
        rhs_g2 = PR.g2_add(srs.tau_g2, PR.g2_neg(PR.g2_mul(point, PR.G2_GEN)))
        return PR.multi_pairing_eq(
            [(lhs_g1, srs.g2)], [(self.proof.p, rhs_g2)])


def _gamma_from_transcript(transcript) -> int:
    """32 challenge bytes -> canonical scalar, else 1 (kzg.rs:276-278)."""
    b = transcript.challenge_bytes(b"batch_challenge", 32)
    v = fr_from_bytes(b)
    return v if v is not None else 1


@jax.jit
def _k_rlc_accumulate(acc, poly, gamma_pow):
    return fr.add(acc, fr.mul(poly, gamma_pow))


@dataclass
class KZGBatchProof:
    """Gamma-RLC batch opening at one point (kzg.rs:259-353)."""

    proof: GroupElem

    @staticmethod
    def batch_prove(polys_mont: list, point: int, evals: list[int],
                    srs: KZGSrs, transcript) -> "KZGBatchProof":
        gamma = _gamma_from_transcript(transcript)
        max_len = max(p.shape[0] for p in polys_mont)
        combined = fr.zeros((max_len,))
        gp = 1
        for p in polys_mont:
            gpm = F.encode_fr([gp])[0]
            padded = p if p.shape[0] == max_len else jnp.concatenate(
                [p, jnp.zeros((max_len - p.shape[0], NUM_LIMBS), jnp.uint32)], axis=0)
            combined = _k_rlc_accumulate(combined, padded, gpm)
            gp = gp * gamma % FR_MOD
        combined_eval = 0
        gp = 1
        for e in evals:
            combined_eval = (combined_eval + e * gp) % FR_MOD
            gp = gp * gamma % FR_MOD
        proof, _ = KZGProof.prove(combined, point, srs)
        # re-wrap: the batch proof is the quotient commitment itself
        return KZGBatchProof(proof.proof)

    def batch_verify(self, commitments: list[KZGCommitment], point: int,
                     evals: list[int], srs: KZGSrs, transcript) -> bool:
        gamma = _gamma_from_transcript(transcript)
        comb = None
        gp = 1
        for c in commitments:
            comb = CH.add(comb, CH.scalar_mul(gp, c.commitment.p))
            gp = gp * gamma % FR_MOD
        combined_eval = 0
        gp = 1
        for e in evals:
            combined_eval = (combined_eval + e * gp) % FR_MOD
            gp = gp * gamma % FR_MOD
        return KZGProof(self.proof).verify(
            KZGCommitment(GroupElem(comb)), point, combined_eval, srs)


# ---------------------------------------------------------------------------
# Hyrax-replacement wrappers (kzg.rs:359-518) + the runtime-PCS adapter the
# lookup argument consumes (sparse_mlpoly_full.SparseMatPolyCommitmentGens)
# ---------------------------------------------------------------------------

class KZGPolyCommitmentGens:
    def __init__(self, srs: KZGSrs):
        self.srs = srs

    # -- adapter used by sparse_mlpoly_full's runtime-polymorphic derefs path --

    def commit(self, poly, mesh=None) -> "KZGPolyCommitment":
        """Commit a DensePolynomial's evaluation vector (as coefficients)."""
        return KZGPolyCommitment(_commit_msm(self.srs, poly.Z, mesh=mesh))

    def prove_eval(self, poly, _r_joint, _claim, transcript,
                   mesh=None) -> "KZGPolyEvalProof":
        """Reference KZG derefs flow (sparse_mlpoly_full.rs:503-550): draw a
        univariate challenge point and open the coefficient vector there."""
        point = transcript.challenge_scalar(b"kzg_eval_point")
        proof, eval_ = KZGProof.prove(poly.Z, point, self.srs, mesh=mesh)
        return KZGPolyEvalProof(proof.proof, eval_)

    def verify_eval(self, proof: "KZGPolyEvalProof", comm: "KZGPolyCommitment",
                    _r_joint, _claim, transcript) -> None:
        """REFERENCE-PARITY ONLY — NOT a sound link to the multilinear claim.

        Like the reference's kzg feature (sparse_mlpoly_full.rs:552-596),
        this checks a univariate opening at a fresh transcript point but
        never ties ``_claim`` (the joint multilinear derefs evaluation at
        ``_r_joint``) to the commitment. Hyrax mode (the default) performs
        the sound check; use pcs='kzg' only for cross-library parity work.
        """
        point = transcript.challenge_scalar(b"kzg_eval_point")
        ok = KZGProof(proof.proof).verify(
            KZGCommitment(comm.commitment), point, proof.eval, self.srs)
        if not ok:
            raise ProofVerifyError("KZG derefs opening failed")


@dataclass
class KZGPolyCommitment:
    commitment: GroupElem

    def append_to_transcript(self, label: bytes, transcript) -> None:
        transcript.append_message(label, self.commitment.compress())


@dataclass
class KZGPolyEvalProof:
    proof: GroupElem
    eval: int

    @staticmethod
    def prove(evals_mont, point: int, gens: KZGPolyCommitmentGens) -> "KZGPolyEvalProof":
        p, e = KZGProof.prove(evals_mont, point, gens.srs)
        return KZGPolyEvalProof(p.proof, e)

    def verify(self, comm: KZGPolyCommitment, point: int,
               gens: KZGPolyCommitmentGens) -> bool:
        return KZGProof(self.proof).verify(
            KZGCommitment(comm.commitment), point, self.eval, gens.srs)


@dataclass
class KZGBatchedCommitment:
    commitments: list[GroupElem]

    @staticmethod
    def commit(polys_mont: list, gens: KZGPolyCommitmentGens) -> "KZGBatchedCommitment":
        return KZGBatchedCommitment(
            [KZGCommitment.commit(p, gens.srs).commitment for p in polys_mont])

    def append_to_transcript(self, label: bytes, transcript) -> None:
        transcript.append_message(label, b"kzg_batch_begin")
        for c in self.commitments:
            transcript.append_message(b"kzg_batch_elem", c.compress())
        transcript.append_message(label, b"kzg_batch_end")


@dataclass
class KZGBatchedEvalProof:
    proof: GroupElem
    evals: list[int]

    @staticmethod
    def prove(polys_mont: list, point: int, gens: KZGPolyCommitmentGens,
              transcript) -> "KZGBatchedEvalProof":
        from spartan_tpu.core.mle import k_dot

        evals = []
        for p in polys_mont:
            zpow = _k_powers(F.encode_fr([point])[0], p)
            evals.append(F.decode_fr(k_dot(p, zpow)[None])[0])
        bp = KZGBatchProof.batch_prove(polys_mont, point, evals, gens.srs, transcript)
        return KZGBatchedEvalProof(bp.proof, evals)

    def verify(self, comm: KZGBatchedCommitment, point: int,
               gens: KZGPolyCommitmentGens, transcript) -> bool:
        return KZGBatchProof(self.proof).batch_verify(
            [KZGCommitment(c) for c in comm.commitments],
            point, self.evals, gens.srs, transcript)
