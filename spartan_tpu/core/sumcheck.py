"""Sumcheck protocol engines (plain, batched, and zero-knowledge).

TPU-native counterpart of /root/reference/src/sumcheck.rs. Per round, the
degree-d round polynomial's evaluations at {0, 2, 3} are one fused device
reduction over the table halves (the "eval at {0,2,3} trick",
sumcheck.rs:89-161); the table folds are the same elementwise kernel as
``DensePolynomial.bound_poly_var_top``. The host drives the transcript and
the tiny per-round algebra; the ZK variant additionally commits each round
polynomial and proves the two claims with a batched DotProductProof
(sumcheck.rs:465-811).

Batched non-ZK sumcheck (used by the product-tree layer proofs) stacks all
instances on a leading axis so a round costs two kernel launches regardless
of instance count.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from spartan_tpu.core import hostpath as HP
from spartan_tpu.core import mle
from spartan_tpu.core.commitments import MultiCommitGens, commit, commit_scalar
from spartan_tpu.core.group import GroupElem
from spartan_tpu.core.nizk import DotProductProof
from spartan_tpu.core.unipoly import CompressedUniPoly, UniPoly
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.utils.errors import ProofVerifyError
from spartan_tpu.utils.aot_cache import aot_jit

fr = F.fr


# ---------------------------------------------------------------------------
# fused round kernels
# ---------------------------------------------------------------------------

def _halves(T):
    n = T.shape[-2] // 2
    return T[..., :n, :], T[..., n:, :]


def _pallas_rounds_ok(n: int) -> bool:
    """Use the quarter-layout Pallas round kernels (ops/pallas_sumcheck)?

    TPU only — the XLA composition below stays the reference semantics
    and the CPU test path. Static at trace time (n is a shape).
    Capped at 2^19 independently of the LM gate: the quarter kernels'
    [.., 16]-minor operands relayout to 8x-padded copies and OOM above
    that; the limb-major lm_* kernels (preferred by every driver) cover
    the larger sizes."""
    if os.environ.get("SPARTAN_TPU_FUSED_ROUND", "1") != "1":
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except RuntimeError:
        return False
    from spartan_tpu.ops import pallas_sumcheck as PS

    return PS.MIN_N <= n <= min(FUSED_ROUND_MAX_N, _QUARTER_MAX_N)


# Upper gate for the fused round kernels. The quarter-layout kernels
# were capped at 2^19: their [.., 16]-minor pallas operands forced
# 8x-padded relayout copies that OOMed the 16 GB chip at the 2^21 leaf
# layers. The limb-major (LM) pair kernels below keep every operand
# compact, so the gate now covers the whole keyless-scale range.
FUSED_ROUND_MAX_N = int(os.environ.get(
    "SPARTAN_TPU_FUSED_ROUND_MAX_N", str(1 << 22)))
# quarter-layout kernels keep their proven cap (see _pallas_rounds_ok)
_QUARTER_MAX_N = int(os.environ.get(
    "SPARTAN_TPU_QUARTER_MAX_N", str(1 << 19)))
_pallas_batched_ok = _pallas_rounds_ok


def _lm_rounds_ok(n: int) -> bool:
    """Use the limb-major pair kernels (ops/pallas_sumcheck lm_*)?

    TPU only (SPARTAN_TPU_FORCE_LM=1 + interpret mode for CPU driver
    tests; SPARTAN_TPU_LM=0 falls back to the quarter kernels)."""
    if os.environ.get("SPARTAN_TPU_FUSED_ROUND", "1") != "1":
        return False
    if os.environ.get("SPARTAN_TPU_LM", "1") != "1":
        return False
    if os.environ.get("SPARTAN_TPU_FORCE_LM") != "1":
        try:
            if jax.default_backend() != "tpu":
                return False
        except RuntimeError:
            return False
    from spartan_tpu.ops import pallas_sumcheck as PS

    return PS.MIN_N <= n <= FUSED_ROUND_MAX_N


# -- limb-major pair-table kernels (one aot executable per shape) -----------

@aot_jit
def k_lm_prep(tables):
    from spartan_tpu.ops import pallas_sumcheck as PS

    return PS.lm_prep(list(tables))


@aot_jit
def k_lm_folds_unprep(pairs, r):
    """Fold every pair by r and hand back NATURAL tables (host/tail exit)."""
    from spartan_tpu.ops import pallas_sumcheck as PS

    return [PS.lm_unprep(P) for P in PS.lm_fold_pairs(list(pairs), r)]


@aot_jit
def k_lm_firsts(pairs):
    from spartan_tpu.ops import pallas_sumcheck as PS

    return jnp.stack([PS.lm_first(P) for P in pairs], axis=0)


@aot_jit
def k_lm_evals_additive(Pt, Pa, Pb, Pc):
    from spartan_tpu.ops import pallas_sumcheck as PS

    return PS.lm_evals_additive(Pt, Pa, Pb, Pc)


@aot_jit
def k_lm_step_additive(Pt, Pa, Pb, Pc, r):
    from spartan_tpu.ops import pallas_sumcheck as PS

    return PS.lm_step_additive(Pt, Pa, Pb, Pc, r)


@aot_jit
def k_lm_evals_quad(Pa, Pb):
    from spartan_tpu.ops import pallas_sumcheck as PS

    return PS.lm_evals_quad(Pa, Pb)


@aot_jit
def k_lm_step_quad(Pa, Pb, r):
    from spartan_tpu.ops import pallas_sumcheck as PS

    return PS.lm_step_quad(Pa, Pb, r)


@aot_jit(static_argnames=("nP",))
def k_lm_evals_cubic_batched(PA, PB, PC, PCp, nP: int):
    """[3I, 16] eval stack over LM instance pairs (one dispatch)."""
    from spartan_tpu.ops import pallas_sumcheck as PS

    outs = []
    for k in range(len(PA)):
        Ck = PCp if k < nP else PC[k - nP]
        outs.append(PS.lm_evals_prod(PA[k], PB[k], Ck))
    return jnp.concatenate(outs, axis=0)


@aot_jit(static_argnames=("nP",))
def k_lm_step_cubic_batched(PA, PB, PC, PCp, r, nP: int):
    """Fold all LM tables by r, then next-round evals — one dispatch."""
    from spartan_tpu.ops import pallas_sumcheck as PS

    (PCp2,) = PS.lm_fold_pairs([PCp], r)
    PA2, PB2, PC2, outs = [], [], [], []
    for k in range(len(PA)):
        if k < nP:
            a, b, ev = PS.lm_step_prod_sharedC(PA[k], PB[k], PCp2, r)
        else:
            a, b, c, ev = PS.lm_step_prod(PA[k], PB[k], PC[k - nP], r)
            PC2.append(c)
        PA2.append(a)
        PB2.append(b)
        outs.append(ev)
    return PA2, PB2, PC2, PCp2, jnp.concatenate(outs, axis=0)


@aot_jit
def k_lm_step_shared(Pa, Pb, PCf, r):
    from spartan_tpu.ops import pallas_sumcheck as PS

    return PS.lm_step_prod_sharedC(Pa, Pb, PCf, r)


@aot_jit
def k_lm_step_prod(Pa, Pb, Pc, r):
    from spartan_tpu.ops import pallas_sumcheck as PS

    return PS.lm_step_prod(Pa, Pb, Pc, r)


@aot_jit
def k_lm_fold_one(P, r):
    from spartan_tpu.ops import pallas_sumcheck as PS

    (out,) = PS.lm_fold_pairs([P], r)
    return out


def _extrapolate(lo, hi):
    """Table values at points 2 and 3: 2*hi - lo and 3*hi - 2*lo."""
    p2 = fr.sub(fr.add(hi, hi), lo)
    p3 = fr.sub(fr.add(p2, hi), lo)
    return p2, p3


@aot_jit
def k_cubic_prod_evals(A, B, C):
    """Round evals (e0,e2,e3) of sum A*B*C; tables [..., N, 16] batched."""
    if A.ndim == 2 and _pallas_batched_ok(A.shape[0]):
        from spartan_tpu.ops import pallas_sumcheck as PS

        ev = PS.evals_cubic_prod(A, B, C)
        return ev[0], ev[1], ev[2]
    aL, aH = _halves(A)
    bL, bH = _halves(B)
    cL, cH = _halves(C)
    a2, a3 = _extrapolate(aL, aH)
    b2, b3 = _extrapolate(bL, bH)
    c2, c3 = _extrapolate(cL, cH)
    e0 = fr.reduce_sum(fr.mul(fr.mul(aL, bL), cL), axis=-2)
    e2 = fr.reduce_sum(fr.mul(fr.mul(a2, b2), c2), axis=-2)
    e3 = fr.reduce_sum(fr.mul(fr.mul(a3, b3), c3), axis=-2)
    return e0, e2, e3


@aot_jit
def k_cubic_additive_evals(T, A, B, C):
    """Round evals of sum tau * (Az*Bz - Cz) (sumcheck.rs:465-530)."""
    if T.ndim == 2 and _pallas_rounds_ok(T.shape[0]):
        from spartan_tpu.ops import pallas_sumcheck as PS

        ev = PS.evals_cubic_additive(T, A, B, C)
        return ev[0], ev[1], ev[2]
    tL, tH = _halves(T)
    aL, aH = _halves(A)
    bL, bH = _halves(B)
    cL, cH = _halves(C)
    t2, t3 = _extrapolate(tL, tH)
    a2, a3 = _extrapolate(aL, aH)
    b2, b3 = _extrapolate(bL, bH)
    c2, c3 = _extrapolate(cL, cH)

    def comb(t, a, b, c):
        return fr.mul(t, fr.sub(fr.mul(a, b), c))

    e0 = fr.reduce_sum(comb(tL, aL, bL, cL), axis=-2)
    e2 = fr.reduce_sum(comb(t2, a2, b2, c2), axis=-2)
    e3 = fr.reduce_sum(comb(t3, a3, b3, c3), axis=-2)
    return e0, e2, e3


@aot_jit
def k_quad_evals(A, B):
    """Round evals (e0, e2) of sum A*B (sumcheck.rs:684-699)."""
    if A.ndim == 2 and _pallas_rounds_ok(A.shape[0]):
        from spartan_tpu.ops import pallas_sumcheck as PS

        ev = PS.evals_quad(A, B)
        return ev[0], ev[1]
    aL, aH = _halves(A)
    bL, bH = _halves(B)
    a2 = fr.sub(fr.add(aH, aH), aL)
    b2 = fr.sub(fr.add(bH, bH), bL)
    e0 = fr.reduce_sum(fr.mul(aL, bL), axis=-2)
    e2 = fr.reduce_sum(fr.mul(a2, b2), axis=-2)
    return e0, e2


@aot_jit
def k_fold_top(T, r):
    """bound_poly_var_top over the second-to-last axis, batched leading dims."""
    n = T.shape[-2] // 2
    lo, hi = T[..., :n, :], T[..., n:, :]
    return fr.add(lo, fr.mul(r, fr.sub(hi, lo)))


# -- fused one-dispatch round steps ------------------------------------------
#
# The interactive protocol forces one host<->device exchange per round (the
# round polynomial feeds the transcript, the challenge feeds the fold), but
# nothing forces MORE than one: these kernels fold every live table by the
# previous challenge AND compute the next round's evaluations in a single
# jitted call. On a tunneled chip dispatch latency dominates the math for
# every table the prover touches (the batched layered sumchecks used to
# issue ~4x#instances dispatches per round); pytree-of-arrays inputs keep
# the instances unstacked so no multi-GB copies materialize.

def _fold(T, r):
    n = T.shape[-2] // 2
    lo, hi = T[..., :n, :], T[..., n:, :]
    return fr.add(lo, fr.mul(r, fr.sub(hi, lo)))


def _cubic_eval_triple(A, B, C):
    aL, aH = _halves(A)
    bL, bH = _halves(B)
    cL, cH = _halves(C)
    a2, a3 = _extrapolate(aL, aH)
    b2, b3 = _extrapolate(bL, bH)
    c2, c3 = _extrapolate(cL, cH)
    e0 = fr.reduce_sum(fr.mul(fr.mul(aL, bL), cL), axis=-2)
    e2 = fr.reduce_sum(fr.mul(fr.mul(a2, b2), c2), axis=-2)
    e3 = fr.reduce_sum(fr.mul(fr.mul(a3, b3), c3), axis=-2)
    return e0, e2, e3


def _batched_cubic_evals(TA, TB, TC, Cp, nP):
    """Per-instance eval triples, stacked [3I, 16] in transcript order."""
    if _pallas_batched_ok(TA[0].shape[0]):
        from spartan_tpu.ops import pallas_sumcheck as PS

        return jnp.concatenate(
            [PS.evals_cubic_prod(TA[k], TB[k], Cp if k < nP else TC[k - nP])
             for k in range(len(TA))], axis=0)
    outs = []
    for k in range(len(TA)):
        Ck = Cp if k < nP else TC[k - nP]
        outs.extend(_cubic_eval_triple(TA[k], TB[k], Ck))
    return jnp.stack(outs, axis=0)


@aot_jit(static_argnames=("nP",))
def k_evals_cubic_batched(TA, TB, TC, Cp, nP: int):
    return _batched_cubic_evals(TA, TB, TC, Cp, nP)


# one fused all-tables round step is fastest, but at keyless 2^20 scale the
# top product-tree layers put ~25 tables x 2^21 elements through a single
# executable whose inputs+outputs+internal temporaries exceed 16 GB HBM
# (observed RESOURCE_EXHAUSTED on the real chip). Layers above this byte
# bound run per-instance dispatches instead: same math, one small compiled
# kernel per table SIZE (shared by every instance), transients bounded by
# one instance triple.
BIG_STEP_BYTES = int(os.environ.get("SPARTAN_TPU_BIG_STEP_BYTES", str(1 << 30)))


def _cubic_tables_bytes(I: int, nS: int, n: int) -> int:
    return (2 * I + 1 + nS) * n * 64


def _evals_cubic_perinstance(TA, TB, TC, Cp, nP):
    """[3I, 16] eval stack via one dispatch per instance (big layers)."""
    outs = []
    for k in range(len(TA)):
        Ck = Cp if k < nP else TC[k - nP]
        e0, e2, e3 = k_cubic_prod_evals(TA[k], TB[k], Ck)
        outs.append(jnp.stack([e0, e2, e3], axis=0))
    return jnp.concatenate(outs, axis=0)


@aot_jit
def k_step_cubic_shared(A, B, Cf, r):
    """Fold A,B by r; eval triple against an ALREADY-folded shared C."""
    if _pallas_batched_ok(A.shape[0]):
        from spartan_tpu.ops import pallas_sumcheck as PS

        return PS.step_cubic_prod_sharedC(A, B, Cf, r)
    A, B = _fold(A, r), _fold(B, r)
    e0, e2, e3 = _cubic_eval_triple(A, B, Cf)
    return A, B, jnp.stack([e0, e2, e3], axis=0)


@aot_jit
def k_step_cubic_one(A, B, C, r):
    """Fold one (A, B, C) instance by r and eval its next-round triple."""
    if _pallas_batched_ok(A.shape[0]):
        from spartan_tpu.ops import pallas_sumcheck as PS

        return PS.step_cubic_prod(A, B, C, r)
    A, B, C = _fold(A, r), _fold(B, r), _fold(C, r)
    e0, e2, e3 = _cubic_eval_triple(A, B, C)
    return A, B, C, jnp.stack([e0, e2, e3], axis=0)


def _step_cubic_perinstance(TA, TB, TC, Cp, r, nP):
    """Big-layer round step: fold every table AND compute next-round evals
    in ~I+2 dispatches (instead of I evals + 2I+1+nS separate folds).
    Mutates the TA/TB/TC lists in place; returns (Cp', pending_evals)."""
    Cp = k_fold_top(Cp, r)
    outs = []
    for k in range(len(TA)):
        if k < nP:
            TA[k], TB[k], ev = k_step_cubic_shared(TA[k], TB[k], Cp, r)
        else:
            TA[k], TB[k], TC[k - nP], ev = k_step_cubic_one(
                TA[k], TB[k], TC[k - nP], r)
        outs.append(ev)
    return Cp, jnp.concatenate(outs, axis=0)


@aot_jit(static_argnames=("nP",))
def k_step_cubic_batched(TA, TB, TC, Cp, r, nP: int):
    """Fold all tables by r, then next-round evals — one dispatch."""
    if _pallas_batched_ok(TA[0].shape[0]):
        from spartan_tpu.ops import pallas_sumcheck as PS

        Cp2 = _fold(Cp, r)
        TA2, TB2, TC2, outs = [], [], [], []
        for k in range(len(TA)):
            if k < nP:
                a, b, ev = PS.step_cubic_prod_sharedC(TA[k], TB[k], Cp2, r)
            else:
                a, b, c, ev = PS.step_cubic_prod(TA[k], TB[k], TC[k - nP], r)
                TC2.append(c)
            TA2.append(a)
            TB2.append(b)
            outs.append(ev)
        return TA2, TB2, TC2, Cp2, jnp.concatenate(outs, axis=0)
    TA = [_fold(t, r) for t in TA]
    TB = [_fold(t, r) for t in TB]
    TC = [_fold(t, r) for t in TC]
    Cp = _fold(Cp, r)
    return TA, TB, TC, Cp, _batched_cubic_evals(TA, TB, TC, Cp, nP)


@aot_jit
def k_folds_cubic_batched(TA, TB, TC, Cp, r):
    """Fold-only tail step (next round continues on the host path)."""
    return ([_fold(t, r) for t in TA], [_fold(t, r) for t in TB],
            [_fold(t, r) for t in TC], _fold(Cp, r))


def _additive_eval_triple(T, A, B, C):
    tL, tH = _halves(T)
    aL, aH = _halves(A)
    bL, bH = _halves(B)
    cL, cH = _halves(C)
    t2, t3 = _extrapolate(tL, tH)
    a2, a3 = _extrapolate(aL, aH)
    b2, b3 = _extrapolate(bL, bH)
    c2, c3 = _extrapolate(cL, cH)

    def comb(t, a, b, c):
        return fr.mul(t, fr.sub(fr.mul(a, b), c))

    e0 = fr.reduce_sum(comb(tL, aL, bL, cL), axis=-2)
    e2 = fr.reduce_sum(comb(t2, a2, b2, c2), axis=-2)
    e3 = fr.reduce_sum(comb(t3, a3, b3, c3), axis=-2)
    return jnp.stack([e0, e2, e3], axis=0)


@aot_jit
def k_cubic_additive_stack(T, A, B, C):
    if _pallas_rounds_ok(T.shape[0]):
        from spartan_tpu.ops import pallas_sumcheck as PS

        return PS.evals_cubic_additive(T, A, B, C)
    return _additive_eval_triple(T, A, B, C)


@aot_jit
def k_step_cubic_additive(T, A, B, C, r):
    if _pallas_rounds_ok(T.shape[0]):
        from spartan_tpu.ops import pallas_sumcheck as PS

        return PS.step_cubic_additive(T, A, B, C, r)
    T, A, B, C = _fold(T, r), _fold(A, r), _fold(B, r), _fold(C, r)
    return T, A, B, C, _additive_eval_triple(T, A, B, C)


@aot_jit
def k_folds_cubic_additive(T, A, B, C, r):
    return _fold(T, r), _fold(A, r), _fold(B, r), _fold(C, r)


def _quad_eval_pair(A, B):
    aL, aH = _halves(A)
    bL, bH = _halves(B)
    a2 = fr.sub(fr.add(aH, aH), aL)
    b2 = fr.sub(fr.add(bH, bH), bL)
    e0 = fr.reduce_sum(fr.mul(aL, bL), axis=-2)
    e2 = fr.reduce_sum(fr.mul(a2, b2), axis=-2)
    return jnp.stack([e0, e2], axis=0)


@aot_jit
def k_quad_stack(A, B):
    if _pallas_rounds_ok(A.shape[0]):
        from spartan_tpu.ops import pallas_sumcheck as PS

        return PS.evals_quad(A, B)
    return _quad_eval_pair(A, B)


@aot_jit
def k_step_quad(A, B, r):
    if _pallas_rounds_ok(A.shape[0]):
        from spartan_tpu.ops import pallas_sumcheck as PS

        return PS.step_quad(A, B, r)
    A, B = _fold(A, r), _fold(B, r)
    return A, B, _quad_eval_pair(A, B)


@aot_jit
def k_folds_quad(A, B, r):
    return _fold(A, r), _fold(B, r)


def _decode3(e0, e2, e3):
    flat = jnp.stack([e0, e2, e3], axis=0)
    vals = F.decode_fr(flat.reshape(-1, flat.shape[-1]))
    return vals  # length 3 * prod(batch)


# ---------------------------------------------------------------------------
# non-ZK sumcheck
# ---------------------------------------------------------------------------

@dataclass
class SumcheckInstanceProof:
    compressed_polys: list[CompressedUniPoly]

    def verify(self, claim: int, num_rounds: int, degree_bound: int, transcript):
        """Returns (final claim e, challenge vector r) (sumcheck.rs:35-86)."""
        e = claim % FR_MOD
        r: list[int] = []
        if len(self.compressed_polys) != num_rounds:
            raise ProofVerifyError("wrong number of rounds")
        for i, cp in enumerate(self.compressed_polys):
            poly = cp.decompress(e)
            if poly.degree() != degree_bound:
                raise ProofVerifyError(f"degree mismatch at round {i}")
            if (poly.eval_at_zero() + poly.eval_at_one()) % FR_MOD != e:
                raise ProofVerifyError(f"sum check failed at round {i}")
            poly.append_to_transcript(b"poly", transcript)
            r_i = transcript.challenge_scalar(b"challenge_nextround")
            r.append(r_i)
            e = poly.evaluate(r_i)
        return e, r

    @staticmethod
    def prove_cubic(claim: int, num_rounds: int, poly_A, poly_B, poly_C, transcript):
        """Product comb A*B*C (sumcheck.rs:89-161). Tables are
        DensePolynomial objects, consumed (folded in place)."""
        from spartan_tpu.core import sumcheck_fused as SF

        if (SF.fused_enabled() and num_rounds > 0
                and poly_A.len == (1 << num_rounds)
                and SF.fusible(poly_A.len, 3)):
            polys, r, claims_prod, _ = SF.prove_cubic_batched_fused(
                claim, num_rounds, [poly_A.Z], [poly_B.Z], [], poly_C.Z,
                1, [1], transcript)
            claims = [claims_prod[0][0], claims_prod[1][0], claims_prod[2]]
            return SumcheckInstanceProof(polys), r, claims
        e = claim % FR_MOD
        r: list[int] = []
        polys: list[CompressedUniPoly] = []
        host = None  # host-int tables once the size drops under HOST_N
        pending = None  # device evals for the current round (from fused step)
        for _ in range(num_rounds):
            if host is None and poly_A.len <= HP.host_table_n():
                host = mle.decode_tables([poly_A.Z, poly_B.Z, poly_C.Z])
            if host is not None:
                v = HP.cubic_prod_evals(*host)
            else:
                if pending is None:
                    pending = k_evals_cubic_batched(
                        [poly_A.Z], [poly_B.Z], [], poly_C.Z, 1)
                v = F.decode_fr(pending)
            poly = UniPoly.from_evals([v[0], (e - v[0]) % FR_MOD, v[1], v[2]])
            poly.append_to_transcript(b"poly", transcript)
            r_j = transcript.challenge_scalar(b"challenge_nextround")
            r.append(r_j)
            if host is not None:
                host = [HP.fold_top(t, r_j) for t in host]
            else:
                r_dev = mle.encode_scalar(r_j)
                if poly_A.len // 2 <= HP.host_table_n():
                    (TA, TB, _, Cz) = k_folds_cubic_batched(
                        [poly_A.Z], [poly_B.Z], [], poly_C.Z, r_dev)
                    pending = None
                else:
                    TA, TB, _, Cz, pending = k_step_cubic_batched(
                        [poly_A.Z], [poly_B.Z], [], poly_C.Z, r_dev, 1)
                for p, z in zip((poly_A, poly_B, poly_C), (TA[0], TB[0], Cz)):
                    p.rebind(z)
            e = poly.evaluate(r_j)
            polys.append(poly.compress())
        if host is not None:
            claims = [t[0] for t in host]
        else:
            claims = [poly_A.first(), poly_B.first(), poly_C.first()]
        return SumcheckInstanceProof(polys), r, claims

    @staticmethod
    def prove_cubic_batched(claim: int, num_rounds: int,
                            poly_vec_par, poly_vec_seq, coeffs: list[int], transcript,
                            mesh=None, own_seq: bool = False):
        """Batched product sumcheck (sumcheck.rs:165-330).

        poly_vec_par: (A_list, B_list, C_shared) — DensePolynomials; the
        "par" instances share C (the eq table). poly_vec_seq: (A_list,
        B_list, C_list) with per-instance C. All tables equal length.
        ``own_seq``: the seq tables are caller-disposable copies (the
        dotp split halves) — the LM path may free their device buffers
        after converting to pair form.
        Each round is ONE fused fold+eval dispatch; with ``mesh`` the
        tables are strided-sharded over the devices until they shrink
        below shard granularity (transcript bit-identical either way).
        """
        from spartan_tpu.core import sumcheck_fused as SF

        A_par, B_par, C_par = poly_vec_par
        A_seq, B_seq, C_seq = poly_vec_seq
        nP, nS = len(A_par), len(A_seq)
        I = nP + nS

        # per-instance arrays, NOT a [K, n] stack: at the leaf layer of a
        # 2^20-scale lookup argument the stacks alone are ~6 GB and OOM the
        # chip. Folds rebind fresh arrays so callers' tables are never
        # mutated (the dotp inputs are the live deref tables).
        TA = [p.Z for p in A_par] + [p.Z for p in A_seq]
        TB = [p.Z for p in B_par] + [p.Z for p in B_seq]
        TC = [p.Z for p in C_seq]
        Cp = C_par.Z

        e = claim % FR_MOD
        r: list[int] = []
        polys: list[CompressedUniPoly] = []
        host = None  # (HA, HB, HC_par, HC_seq) lists-of-int-lists
        pending = None  # device evals [3I, 16] for the current round

        mesh_t = None
        n0 = TA[0].shape[0]
        if mesh is not None and mesh.devices.size > 1 and \
                n0 > HP.HOST_N and n0 >= 2 * mesh.devices.size and \
                n0 % (2 * mesh.devices.size) == 0:
            mesh_t = _BatchedMeshTables(mesh, TA, TB, TC, Cp, nP)

        def tail_fusible(n: int, rounds_left: int) -> bool:
            """Whether the remaining rounds can run as one fused device
            chain: the fused driver must be on, the stacked tables must fit
            its budget, AND the table length must equal 2^rounds_left (the
            fused kernel derives its round count from the buffer size)."""
            return (SF.fused_enabled() and SF.fusible(n, 2 * I + 1 + nS)
                    and n == (1 << rounds_left))

        lm = None  # (LA, LB, LC, LCp) limb-major pairs (TPU big-table path)
        cur_n = n0
        fused_tail = None
        for j in range(num_rounds):
            if (mesh_t is None and host is None and lm is None
                    and tail_fusible(cur_n, num_rounds - j)):
                # remaining rounds + Fiat-Shamir as ONE device dispatch
                fused_tail = SF.prove_cubic_batched_fused(
                    e, num_rounds - j, TA, TB, TC, Cp, nP, coeffs, transcript)
                break
            if mesh_t is not None:
                if pending is None:
                    pending = mesh_t.evals()
                vals = F.decode_fr(pending)
                ev0, ev2, ev3 = vals[0::3], vals[1::3], vals[2::3]
            else:
                if host is None and lm is None and cur_n <= HP.host_table_n():
                    dec = mle.decode_tables(TA + TB + [Cp] + TC)
                    host = (dec[:I], dec[I:2 * I], dec[2 * I],
                            dec[2 * I + 1:])
                if host is not None:
                    HA, HB, HCp, HCs = host
                    ev0, ev2, ev3 = [0] * I, [0] * I, [0] * I
                    for k in range(nP):
                        ev0[k], ev2[k], ev3[k] = HP.cubic_prod_evals(HA[k], HB[k], HCp)
                    for k in range(nS):
                        ev0[nP + k], ev2[nP + k], ev3[nP + k] = \
                            HP.cubic_prod_evals(HA[nP + k], HB[nP + k], HCs[k])
                else:
                    if pending is None:
                        if lm is None and _lm_rounds_ok(cur_n):
                            # per-instance prep, freeing each par table's
                            # natural form as its pair lands: a single
                            # 43-table prep program held inputs+outputs
                            # (2x the whole table set) live at once and
                            # OOMed the 2^21 leaf layer. Recomputed
                            # tree-layer tables have no other owner
                            # (checkpointed layers live in the tree's
                            # _cp store; seq/dotp deref tables are the
                            # caller's and are kept).
                            from spartan_tpu.utils.devsync import sync \
                                as _devsync

                            LA, LB, LC = [], [], []
                            for k in range(I):
                                if k < nP:
                                    pa, pb = k_lm_prep((TA[k], TB[k]))
                                    A_par[k].Z = None
                                    B_par[k].Z = None
                                else:
                                    pa, pb, pc = k_lm_prep(
                                        (TA[k], TB[k], TC[k - nP]))
                                    LC.append(pc)
                                    if own_seq:
                                        A_seq[k - nP].Z = None
                                        B_seq[k - nP].Z = None
                                        C_seq[k - nP].Z = None
                                        TC[k - nP] = None
                                LA.append(pa)
                                LB.append(pb)
                                TA[k] = TB[k] = None
                                if k % 4 == 3:
                                    # drain the queue: PJRT allocates op
                                    # outputs AT ENQUEUE, so an unthrottled
                                    # prep burst holds naturals + all pairs
                                    # simultaneously (~2x the table set,
                                    # the 2^20 leaf-layer OOM)
                                    _devsync(pa)
                            (pcp,) = k_lm_prep((Cp,))
                            C_par.Z = None
                            lm = (LA, LB, LC, pcp)
                            TA = TB = TC = Cp = None
                        if lm is not None:
                            LA, LB, LC, LCp = lm
                            pending = k_lm_evals_cubic_batched(
                                LA, LB, LC, LCp, nP)
                        elif _cubic_tables_bytes(I, nS, cur_n) \
                                > BIG_STEP_BYTES:
                            pending = _evals_cubic_perinstance(
                                TA, TB, TC, Cp, nP)
                        else:
                            pending = k_evals_cubic_batched(TA, TB, TC, Cp, nP)
                    vals = F.decode_fr(pending)
                    ev0 = vals[0::3]
                    ev2 = vals[1::3]
                    ev3 = vals[2::3]
            c0 = sum(ev0[i] * coeffs[i] for i in range(I)) % FR_MOD
            c2 = sum(ev2[i] * coeffs[i] for i in range(I)) % FR_MOD
            c3 = sum(ev3[i] * coeffs[i] for i in range(I)) % FR_MOD
            poly = UniPoly.from_evals([c0, (e - c0) % FR_MOD, c2, c3])
            poly.append_to_transcript(b"poly", transcript)
            r_j = transcript.challenge_scalar(b"challenge_nextround")
            r.append(r_j)
            if mesh_t is not None:
                r_dev = mle.encode_scalar(r_j)
                if mesh_t.can_step():
                    pending = mesh_t.step(r_dev)
                else:
                    TA, TB, TC, Cp = mesh_t.fold_gather(r_dev)
                    mesh_t = None
                    pending = None
            elif host is not None:
                HA, HB, HCp, HCs = host
                host = ([HP.fold_top(t, r_j) for t in HA],
                        [HP.fold_top(t, r_j) for t in HB],
                        HP.fold_top(HCp, r_j),
                        [HP.fold_top(t, r_j) for t in HCs])
            elif lm is not None:
                r_dev = mle.encode_scalar(r_j)
                LA, LB, LC, LCp = lm
                n_next = cur_n // 2
                if n_next <= HP.host_table_n() \
                        or tail_fusible(n_next, num_rounds - j - 1) \
                        or not _lm_rounds_ok(n_next):
                    # fold + exit to natural tables: the host tail, the
                    # fused-tail driver, or the XLA path takes over
                    nat = k_lm_folds_unprep(
                        tuple(LA) + tuple(LB) + (LCp,) + tuple(LC), r_dev)
                    TA, TB = nat[:I], nat[I:2 * I]
                    Cp, TC = nat[2 * I], nat[2 * I + 1:]
                    lm = None
                    pending = None
                elif _cubic_tables_bytes(I, nS, n_next) > BIG_STEP_BYTES:
                    # per-instance steps bound the in-flight transients
                    LCp = k_lm_fold_one(LCp, r_dev)
                    LA, LB, LC = list(LA), list(LB), list(LC)
                    outs = []
                    for k in range(I):
                        if k < nP:
                            LA[k], LB[k], ev = k_lm_step_shared(
                                LA[k], LB[k], LCp, r_dev)
                        else:
                            LA[k], LB[k], LC[k - nP], ev = k_lm_step_prod(
                                LA[k], LB[k], LC[k - nP], r_dev)
                        outs.append(ev)
                    lm = (LA, LB, LC, LCp)
                    pending = jnp.concatenate(outs, axis=0)
                else:
                    LA, LB, LC, LCp, pending = k_lm_step_cubic_batched(
                        LA, LB, LC, LCp, r_dev, nP)
                    lm = (LA, LB, LC, LCp)
            else:
                r_dev = mle.encode_scalar(r_j)
                if cur_n // 2 <= HP.host_table_n():
                    TA, TB, TC, Cp = k_folds_cubic_batched(TA, TB, TC, Cp, r_dev)
                    pending = None
                elif _cubic_tables_bytes(I, nS, cur_n // 2) \
                        > BIG_STEP_BYTES:
                    # big layer: per-instance fold+eval steps (transients
                    # bounded by one instance triple). Skip the fused-in
                    # eval if the NEXT round switches to the fused-tail
                    # driver anyway (the host handoff can't happen here:
                    # the elif above already took fold-only for that case).
                    n_next = cur_n // 2
                    if tail_fusible(n_next, num_rounds - j - 1):
                        Cp = k_fold_top(Cp, r_dev)
                        TA = [k_fold_top(t, r_dev) for t in TA]
                        TB = [k_fold_top(t, r_dev) for t in TB]
                        TC = [k_fold_top(t, r_dev) for t in TC]
                        pending = None
                    else:
                        TA, TB, TC = list(TA), list(TB), list(TC)
                        Cp, pending = _step_cubic_perinstance(
                            TA, TB, TC, Cp, r_dev, nP)
                else:
                    TA, TB, TC, Cp, pending = k_step_cubic_batched(
                        TA, TB, TC, Cp, r_dev, nP)
            cur_n //= 2
            e = poly.evaluate(r_j)
            polys.append(poly.compress())

        if fused_tail is not None:
            tail_polys, tail_r, claims_prod, claims_dotp = fused_tail
            return (SumcheckInstanceProof(polys + tail_polys), r + tail_r,
                    claims_prod, claims_dotp)
        if host is not None:
            HA, HB, HCp, HCs = host
            finals_A = [t[0] for t in HA]
            finals_B = [t[0] for t in HB]
            c_par_final = HCp[0]
            finals_C = [t[0] for t in HCs]
        elif lm is not None:
            LA, LB, LC, LCp = lm
            vals = F.decode_fr(k_lm_firsts(
                tuple(LA) + tuple(LB) + (LCp,) + tuple(LC)))
            finals_A, finals_B = vals[:I], vals[I:2 * I]
            c_par_final = vals[2 * I]
            finals_C = vals[2 * I + 1:]
        else:
            finals_A = F.decode_fr(jnp.stack([t[0] for t in TA], axis=0))
            finals_B = F.decode_fr(jnp.stack([t[0] for t in TB], axis=0))
            c_par_final = F.decode_fr(Cp[0][None])[0]
            finals_C = F.decode_fr(jnp.stack([t[0] for t in TC], axis=0)) \
                if nS else []
        claims_prod = (finals_A[:nP], finals_B[:nP], c_par_final)
        claims_dotp = (finals_A[nP:], finals_B[nP:], finals_C) if nS \
            else ([], [], [])
        return SumcheckInstanceProof(polys), r, claims_prod, claims_dotp


# ---------------------------------------------------------------------------
# sharded table drivers (sequence-parallel sumcheck over a device mesh)
# ---------------------------------------------------------------------------

class _MeshTables:
    """Holds the sumcheck evaluation tables sharded over a mesh.

    Strided layout keeps top-variable folds device-local (SURVEY.md §5);
    once the table length drops to the device count the tables are gathered
    and the rounds continue single-device. Field sums are order-independent
    mod p, so the transcript matches the unsharded prover bit-for-bit.
    """

    def __init__(self, mesh, tables):
        from spartan_tpu.parallel.mesh import shard_table
        from spartan_tpu.parallel.sumcheck_sharded import (
            make_cubic_evals,
            make_cubic_step,
            make_fold,
            make_quad_evals,
            make_quad_step,
            to_strided,
        )

        self.mesh = mesh
        self.D = mesh.devices.size
        self._cubic_evals = jax.jit(make_cubic_evals(mesh))
        self._quad_evals = jax.jit(make_quad_evals(mesh))
        self._cubic_step = jax.jit(make_cubic_step(mesh))
        self._quad_step = jax.jit(make_quad_step(mesh))
        self._fold = jax.jit(make_fold(mesh))
        self.n = tables[0].Z.shape[0]
        assert self.n >= 2 * self.D and self.n % (2 * self.D) == 0
        self.sharded = [shard_table(mesh, to_strided(p.Z, self.D)) for p in tables]
        self.polys = tables  # mutated in place on gather

    def active(self) -> bool:
        return self.sharded is not None

    def can_step(self) -> bool:
        """True when the post-fold table still spans the mesh (fused step
        stays valid) and is too big for the host tail; otherwise callers
        fold+gather via ``fold`` and the small-table paths take over."""
        return (self.n // 2 >= 2 * self.D and self.n // 2 > HP.HOST_N
                and self.n // 2 >= HP.MESH_MIN_N)

    def evals_cubic(self):
        T, A, B, C = self.sharded
        return self._cubic_evals(T, A, B, C)

    def evals_quad(self):
        A, B = self.sharded
        return self._quad_evals(A, B)

    def step_cubic(self, r_dev):
        """Fold by r then next-round evals — one dispatch (fused)."""
        T, A, B, C = self.sharded
        T, A, B, C, e0, e2, e3 = self._cubic_step(T, A, B, C, r_dev)
        self.sharded = [T, A, B, C]
        self._shrink()
        return jnp.stack([e0, e2, e3])

    def step_quad(self, r_dev):
        A, B = self.sharded
        A, B, e0, e2 = self._quad_step(A, B, r_dev)
        self.sharded = [A, B]
        self._shrink()
        return jnp.stack([e0, e2])

    def _shrink(self) -> None:
        from spartan_tpu.utils.math import log_2

        self.n //= 2
        for p in self.polys:
            p.len = self.n
            p.num_vars = log_2(self.n)

    def fold(self, r_dev) -> None:
        from spartan_tpu.parallel.mesh import gather_unstride

        self.sharded = [self._fold(t, r_dev) for t in self.sharded]
        self._shrink()
        if self.n < 2 * self.D or self.n <= HP.HOST_N or self.n < HP.MESH_MIN_N:
            # gather to every process; callers continue with local kernels
            for p, t in zip(self.polys, self.sharded):
                p.Z = gather_unstride(self.mesh, t)
            self.sharded = None


class _BatchedMeshTables:
    """Strided-sharded tables for the batched layered sumcheck.

    Same layout/exactness story as ``_MeshTables`` but over pytrees of
    per-instance tables (the product-tree layer proofs, up to 2^21 leaf
    tables at keyless scale — the largest sumchecks in the prover).
    """

    def __init__(self, mesh, TA, TB, TC, Cp, nP: int):
        from spartan_tpu.parallel.mesh import shard_table
        from spartan_tpu.parallel.sumcheck_sharded import (
            make_batched_evals,
            make_batched_fold,
            make_batched_step,
            to_strided,
        )

        self.mesh = mesh
        self.D = mesh.devices.size
        self.n = TA[0].shape[0]
        assert self.n >= 2 * self.D and self.n % (2 * self.D) == 0
        self._evals = jax.jit(make_batched_evals(mesh, nP))
        self._step = jax.jit(make_batched_step(mesh, nP))
        self._fold = jax.jit(make_batched_fold(mesh))

        def prep(t):
            return shard_table(mesh, to_strided(t, self.D))

        self.TA = [prep(t) for t in TA]
        self.TB = [prep(t) for t in TB]
        self.TC = [prep(t) for t in TC]
        self.Cp = prep(Cp)

    def can_step(self) -> bool:
        return (self.n // 2 >= 2 * self.D and self.n // 2 > HP.HOST_N
                and self.n // 2 >= HP.MESH_MIN_N)

    def evals(self):
        return self._evals(self.TA, self.TB, self.TC, self.Cp)

    def step(self, r_dev):
        """Fold all tables by r then next-round evals — one dispatch."""
        self.TA, self.TB, self.TC, self.Cp, ev = self._step(
            self.TA, self.TB, self.TC, self.Cp, r_dev)
        self.n //= 2
        return ev

    def fold_gather(self, r_dev):
        """Fold once more, then return natural-order every-process tables."""
        from spartan_tpu.parallel.mesh import gather_unstride

        TA, TB, TC, Cp = self._fold(self.TA, self.TB, self.TC, self.Cp, r_dev)
        self.n //= 2

        def g(t):
            return gather_unstride(self.mesh, t)

        return ([g(t) for t in TA], [g(t) for t in TB],
                [g(t) for t in TC], g(Cp))


# ---------------------------------------------------------------------------
# ZK sumcheck
# ---------------------------------------------------------------------------

@dataclass
class ZKSumcheckInstanceProof:
    comm_polys: list[GroupElem]
    comm_evals: list[GroupElem]
    proofs: list[DotProductProof]

    def verify(self, comm_claim: GroupElem, num_rounds: int, degree_bound: int,
               gens_1: MultiCommitGens, gens_n: MultiCommitGens, transcript):
        """Returns (comm of final eval, r) (sumcheck.rs:366-457)."""
        if len(self.comm_polys) != num_rounds or len(self.proofs) != num_rounds:
            raise ProofVerifyError("wrong number of rounds")
        comm_claim_per_round = comm_claim
        r: list[int] = []
        for i in range(num_rounds):
            comm_poly = self.comm_polys[i]
            comm_poly.append_to_transcript(b"comm_poly", transcript)
            r_i = transcript.challenge_scalar(b"challenge_nextround")
            comm_claim_per_round.append_to_transcript(b"comm_claim_per_round", transcript)
            self.comm_evals[i].append_to_transcript(b"comm_eval", transcript)
            w = transcript.challenge_vector(b"combine_two_claims_to_one", 2)
            comm_target = comm_claim_per_round.mul(w[0]).add(self.comm_evals[i].mul(w[1]))

            a_sc = [1] * (degree_bound + 1)
            a_sc[0] = 2
            a_eval = [1] * (degree_bound + 1)
            for j in range(1, degree_bound + 1):
                a_eval[j] = a_eval[j - 1] * r_i % FR_MOD
            a = [(w[0] * a_sc[j] + w[1] * a_eval[j]) % FR_MOD for j in range(degree_bound + 1)]

            self.proofs[i].verify(gens_1, gens_n, transcript, a, comm_poly, comm_target)
            comm_claim_per_round = self.comm_evals[i]
            r.append(r_i)
        return self.comm_evals[-1], r

    @staticmethod
    def _round_tail(poly: UniPoly, r_j: int, claim_per_round: int,
                    comm_claim_per_round: GroupElem, blind_poly_j: int,
                    blind_eval_j: int, blind_sc: int,
                    gens_1, gens_n, transcript, random_tape):
        """Post-fold half of a ZK round: batch the two claims into one
        DotProductProof (sumcheck.rs:556-634)."""
        eval_ = poly.evaluate(r_j)
        comm_eval = commit_scalar(eval_, blind_eval_j, gens_1)
        comm_claim_per_round.append_to_transcript(b"comm_claim_per_round", transcript)
        comm_eval.append_to_transcript(b"comm_eval", transcript)
        w = transcript.challenge_vector(b"combine_two_claims_to_one", 2)
        target = (w[0] * claim_per_round + w[1] * eval_) % FR_MOD
        blind = (w[0] * blind_sc + w[1] * blind_eval_j) % FR_MOD

        deg = poly.degree()
        a_sc = [1] * (deg + 1)
        a_sc[0] = 2
        a_eval = [1] * (deg + 1)
        for k in range(1, deg + 1):
            a_eval[k] = a_eval[k - 1] * r_j % FR_MOD
        a = [(w[0] * a_sc[k] + w[1] * a_eval[k]) % FR_MOD for k in range(deg + 1)]

        proof, _, _ = DotProductProof.prove(
            gens_1, gens_n, transcript, random_tape,
            poly.as_vec(), blind_poly_j, a, target, blind,
        )
        return proof, eval_, comm_eval

    @staticmethod
    def prove_cubic_with_additive_term(claim: int, blind_claim: int, num_rounds: int,
                                       poly_tau, poly_Az, poly_Bz, poly_Cz,
                                       gens_1, gens_n, transcript, random_tape,
                                       mesh=None):
        """ZK sumcheck of sum tau*(Az*Bz - Cz) (sumcheck.rs:465-649).

        With ``mesh``, the evaluation tables are sharded over the devices
        (sequence parallelism) until they shrink below shard granularity;
        the transcript is bit-identical to the single-device prover.
        """
        blinds_poly = random_tape.random_vector(b"blinds_poly", num_rounds)
        blinds_evals = random_tape.random_vector(b"blinds_evals", num_rounds)
        claim_per_round = claim % FR_MOD
        comm_claim_per_round = commit_scalar(claim_per_round, blind_claim, gens_1)

        r: list[int] = []
        comm_polys: list[GroupElem] = []
        comm_evals: list[GroupElem] = []
        proofs: list[DotProductProof] = []

        tables = [poly_tau, poly_Az, poly_Bz, poly_Cz]
        mesh_tables = None
        if mesh is not None and mesh.devices.size > 1 and \
                poly_tau.len >= 2 * mesh.devices.size and \
                poly_tau.len % (2 * mesh.devices.size) == 0:
            mesh_tables = _MeshTables(mesh, tables)

        from spartan_tpu.utils.timer import Timer
        import time as _time

        host = None  # host-int tables for the small-size tail
        pending = None  # device evals for the current round (fused step)
        lm = None  # limb-major pair tables (TPU big-table path)
        cur_n = poly_tau.len
        for j in range(num_rounds):
            _t = _time.perf_counter()
            if mesh_tables is not None and mesh_tables.active():
                if pending is None:
                    e0, e2, e3 = mesh_tables.evals_cubic()
                    pending = jnp.stack([e0, e2, e3])
                v = F.decode_fr(pending)
            else:
                if host is None and lm is None and cur_n <= HP.host_table_n():
                    host = mle.decode_tables([p.Z for p in tables])
                if host is not None:
                    v = HP.cubic_additive_evals(*host)
                else:
                    if pending is None:
                        if lm is None and _lm_rounds_ok(cur_n):
                            lm = k_lm_prep((poly_tau.Z, poly_Az.Z,
                                            poly_Bz.Z, poly_Cz.Z))
                        if lm is not None:
                            pending = k_lm_evals_additive(*lm)
                        else:
                            pending = k_cubic_additive_stack(
                                poly_tau.Z, poly_Az.Z, poly_Bz.Z, poly_Cz.Z)
                    v = F.decode_fr(pending)
            Timer.acc("zk_cubic/evals", _time.perf_counter() - _t)
            _t = _time.perf_counter()
            poly = UniPoly.from_evals([v[0], (claim_per_round - v[0]) % FR_MOD, v[1], v[2]])
            comm_poly = commit(poly.as_vec(), blinds_poly[j], gens_n)
            comm_poly.append_to_transcript(b"comm_poly", transcript)
            comm_polys.append(comm_poly)

            r_j = transcript.challenge_scalar(b"challenge_nextround")
            Timer.acc("zk_cubic/commit_poly", _time.perf_counter() - _t)
            _t = _time.perf_counter()
            if mesh_tables is not None and mesh_tables.active():
                if mesh_tables.can_step():
                    pending = mesh_tables.step_cubic(mle.encode_scalar(r_j))
                else:
                    mesh_tables.fold(mle.encode_scalar(r_j))
                    pending = None
            elif host is not None:
                host = [HP.fold_top(t, r_j) for t in host]
            elif lm is not None:
                r_dev = mle.encode_scalar(r_j)
                if cur_n // 2 <= HP.host_table_n() or \
                        not _lm_rounds_ok(cur_n // 2):
                    folded = k_lm_folds_unprep(lm, r_dev)
                    for p, z in zip(tables, folded):
                        p.rebind(z)
                    lm = None
                    pending = None
                else:
                    *lm, pending = k_lm_step_additive(*lm, r_dev)
            else:
                r_dev = mle.encode_scalar(r_j)
                if cur_n // 2 <= HP.host_table_n():
                    folded = k_folds_cubic_additive(
                        poly_tau.Z, poly_Az.Z, poly_Bz.Z, poly_Cz.Z, r_dev)
                    pending = None
                else:
                    *folded, pending = k_step_cubic_additive(
                        poly_tau.Z, poly_Az.Z, poly_Bz.Z, poly_Cz.Z, r_dev)
                for p, z in zip(tables, folded):
                    p.rebind(z)
            cur_n //= 2
            Timer.acc("zk_cubic/fold", _time.perf_counter() - _t)

            _t = _time.perf_counter()
            blind_sc = blind_claim if j == 0 else blinds_evals[j - 1]
            proof, eval_, comm_eval = ZKSumcheckInstanceProof._round_tail(
                poly, r_j, claim_per_round, comm_claim_per_round,
                blinds_poly[j], blinds_evals[j], blind_sc,
                gens_1, gens_n, transcript, random_tape,
            )
            Timer.acc("zk_cubic/round_tail", _time.perf_counter() - _t)
            proofs.append(proof)
            claim_per_round = eval_
            comm_claim_per_round = comm_eval
            r.append(r_j)
            comm_evals.append(comm_eval)

        if host is not None:
            claims = [t[0] for t in host]
        else:
            claims = [poly_tau.first(), poly_Az.first(), poly_Bz.first(), poly_Cz.first()]
        return (
            ZKSumcheckInstanceProof(comm_polys, comm_evals, proofs),
            r, claims, blinds_evals[num_rounds - 1],
        )

    @staticmethod
    def prove_quad(claim: int, blind_claim: int, num_rounds: int,
                   poly_z, poly_ABC, gens_1, gens_n, transcript, random_tape,
                   mesh=None):
        """ZK sumcheck of sum z*ABC (sumcheck.rs:657-811).

        ``mesh`` shards the tables like prove_cubic_with_additive_term.
        """
        blinds_poly = random_tape.random_vector(b"blinds_poly", num_rounds)
        blinds_evals = random_tape.random_vector(b"blinds_evals", num_rounds)
        claim_per_round = claim % FR_MOD
        comm_claim_per_round = commit_scalar(claim_per_round, blind_claim, gens_1)

        r: list[int] = []
        comm_polys: list[GroupElem] = []
        comm_evals: list[GroupElem] = []
        proofs: list[DotProductProof] = []

        tables = [poly_z, poly_ABC]
        mesh_tables = None
        if mesh is not None and mesh.devices.size > 1 and \
                poly_z.len >= 2 * mesh.devices.size and \
                poly_z.len % (2 * mesh.devices.size) == 0:
            mesh_tables = _MeshTables(mesh, tables)

        from spartan_tpu.utils.timer import Timer
        import time as _time

        host = None
        pending = None  # device evals for the current round (fused step)
        lm = None  # limb-major pair tables (TPU big-table path)
        cur_n = poly_z.len
        for j in range(num_rounds):
            _t = _time.perf_counter()
            if mesh_tables is not None and mesh_tables.active():
                if pending is None:
                    e0, e2 = mesh_tables.evals_quad()
                    pending = jnp.stack([e0, e2])
                v = F.decode_fr(pending)
            else:
                if host is None and lm is None and cur_n <= HP.host_table_n():
                    host = mle.decode_tables([p.Z for p in tables])
                if host is not None:
                    v = HP.quad_evals(*host)
                else:
                    if pending is None:
                        if lm is None and _lm_rounds_ok(cur_n):
                            lm = k_lm_prep((poly_z.Z, poly_ABC.Z))
                        if lm is not None:
                            pending = k_lm_evals_quad(*lm)
                        else:
                            pending = k_quad_stack(poly_z.Z, poly_ABC.Z)
                    v = F.decode_fr(pending)
            Timer.acc("zk_quad/evals", _time.perf_counter() - _t)
            _t = _time.perf_counter()
            poly = UniPoly.from_evals([v[0], (claim_per_round - v[0]) % FR_MOD, v[1]])
            comm_poly = commit(poly.as_vec(), blinds_poly[j], gens_n)
            comm_poly.append_to_transcript(b"comm_poly", transcript)
            comm_polys.append(comm_poly)

            r_j = transcript.challenge_scalar(b"challenge_nextround")
            Timer.acc("zk_quad/commit_poly", _time.perf_counter() - _t)
            _t = _time.perf_counter()
            if mesh_tables is not None and mesh_tables.active():
                if mesh_tables.can_step():
                    pending = mesh_tables.step_quad(mle.encode_scalar(r_j))
                else:
                    mesh_tables.fold(mle.encode_scalar(r_j))
                    pending = None
            elif host is not None:
                host = [HP.fold_top(t, r_j) for t in host]
            elif lm is not None:
                r_dev = mle.encode_scalar(r_j)
                if cur_n // 2 <= HP.host_table_n() or \
                        not _lm_rounds_ok(cur_n // 2):
                    folded = k_lm_folds_unprep(lm, r_dev)
                    for p, z in zip(tables, folded):
                        p.rebind(z)
                    lm = None
                    pending = None
                else:
                    *lm, pending = k_lm_step_quad(*lm, r_dev)
            else:
                r_dev = mle.encode_scalar(r_j)
                if cur_n // 2 <= HP.host_table_n():
                    folded = k_folds_quad(poly_z.Z, poly_ABC.Z, r_dev)
                    pending = None
                else:
                    *folded, pending = k_step_quad(poly_z.Z, poly_ABC.Z, r_dev)
                for p, z in zip(tables, folded):
                    p.rebind(z)
            cur_n //= 2
            Timer.acc("zk_quad/fold", _time.perf_counter() - _t)

            _t = _time.perf_counter()
            blind_sc = blind_claim if j == 0 else blinds_evals[j - 1]
            proof, eval_, comm_eval = ZKSumcheckInstanceProof._round_tail(
                poly, r_j, claim_per_round, comm_claim_per_round,
                blinds_poly[j], blinds_evals[j], blind_sc,
                gens_1, gens_n, transcript, random_tape,
            )
            Timer.acc("zk_quad/round_tail", _time.perf_counter() - _t)
            proofs.append(proof)
            claim_per_round = eval_
            comm_claim_per_round = comm_eval
            r.append(r_j)
            comm_evals.append(comm_eval)

        if host is not None:
            claims = [t[0] for t in host]
        else:
            claims = [poly_z.first(), poly_ABC.first()]
        return (
            ZKSumcheckInstanceProof(comm_polys, comm_evals, proofs),
            r, claims, blinds_evals[num_rounds - 1],
        )
