"""Fully-fused sumcheck: every round + Fiat-Shamir in ONE device dispatch.

The classic driver (core/sumcheck.py) pays one device->host transfer per
round to absorb the round polynomial into the host transcript (~27 ms over
a tunneled chip; a keyless-scale prove has ~900 sequential rounds across
its sumchecks). Here the merlin sponge itself lives on device
(ops/transcript_device.py), so the challenge -> fold -> eval recurrence
never leaves the chip: the whole sumcheck tail is one compiled program
whose only transfer is the final (polys, challenges, final values) block.

Design notes (TPU-first):

* The rounds run as ONE ``lax.scan`` with fixed-size buffers. The protocol
  folds the TOP variable (pairs (i, i+m/2), reference sumcheck.rs:195-203),
  which shrinks the array and would force one trace per round; instead the
  tables are bit-reverse permuted once at entry, turning the top-fold into
  an even/odd fold whose output stays compact at the FRONT of a fixed
  buffer (bitrev_n(2j) = bitrev_{n/2}(j)). The vacated tail is zero-filled,
  so inactive positions contribute exact zeros to every masked sum and the
  whole recurrence is shape-stable across rounds.
* The sponge position differs per round, so the in-scan transcript uses
  the dynamic-position STROBE (ops/transcript_device.DynStrobe) whose
  rate-boundary permutations are lax.cond-guarded.
* All tables ride in ONE stacked [M, n, 16] carry, so a round is ~20 field
  kernels regardless of instance count (compile time on XLA:CPU is
  dominated by the number of distinct while-loop bodies; an unrolled
  variant of this kernel took 3+ minutes to compile at 6 rounds).
* The host REPLAYS the returned round polynomials through its own
  authoritative transcript and asserts the device challenges match — a
  per-proof end-to-end check of the device sponge against the host merlin
  implementation (itself pinned to the crate's golden vector).

Memory: stacking copies the tables, so the fused tail only engages once
tables are at most FUSE_MAX_N long; larger opening rounds use the classic
one-dispatch-per-round path (at 2^22 leaf layers the per-table arrays are
the HBM budget, reference BENCHMARK_RESULTS.md:63-72).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.core.unipoly import CompressedUniPoly, UniPoly
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops import transcript_device as TD
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.utils.aot_cache import aot_jit

fr = F.fr

# tri-state: True/False force the fused path on/off; None = auto (TPU only
# — on the CPU test backend the host small-table path is faster and there
# is no transfer latency to hide, so fused is coverage, not a win)
FUSED = None if os.environ.get("SPARTAN_TPU_FUSED", "auto") == "auto" \
    else os.environ.get("SPARTAN_TPU_FUSED") == "1"


def fused_enabled() -> bool:
    if FUSED is not None:
        return FUSED
    return jax.default_backend() == "tpu"
# largest table length the fused driver will stack (hard cap); the real
# limiter is the stack-copy memory budget below
FUSE_MAX_N = int(os.environ.get("SPARTAN_TPU_FUSE_MAX_N", str(1 << 21)))
# Stacked-buffer byte budget: BUF + its fold copy live simultaneously,
# ALONGSIDE the resident protocol state (at keyless 2^20 scale the product
# trees + derefs tables hold most of the 16 GB HBM: a 2 GiB budget OOMed
# the ops-trees layer at n=2^21 on the real chip). Layers over budget take
# the one-dispatch-per-round path instead.
FUSE_BUDGET_BYTES = int(os.environ.get("SPARTAN_TPU_FUSE_BUDGET", str(640 << 20)))
# small bucket so tiny protocol runs (tests) don't pad to FUSE_MAX_N
SMALL_BUCKET_N = min(FUSE_MAX_N, 1 << 12)


def fusible(n: int, n_tables: int) -> bool:
    """Whether an n-long, n_tables-wide sumcheck fits the fused driver."""
    return n <= FUSE_MAX_N and 2 * n_tables * n * 64 <= FUSE_BUDGET_BYTES

_TWO_INV = pow(2, -1, FR_MOD)
_SIX_INV = pow(6, -1, FR_MOD)


@functools.lru_cache(maxsize=None)
def _bitrev(n: int):
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _from_evals_cubic(e0, e1, e2, e3):
    """UniPoly.from_evals for degree 3, Montgomery form (unipoly.rs:34-38).
    Returns coefficients low-to-high (d, c, b, a)."""
    ta = fr.sub(fr.add(e3, fr.mul_small(e1, 3)), fr.add(fr.mul_small(e2, 3), e0))
    tb = fr.sub(fr.add(fr.mul_small(e0, 2), fr.mul_small(e2, 4)),
                fr.add(fr.mul_small(e1, 5), e3))
    consts = jnp.stack([TD.mont_const(_SIX_INV), TD.mont_const(_TWO_INV)])
    ab = fr.mul(consts, jnp.stack([ta, tb]))
    a, b = ab[0], ab[1]
    c = fr.sub(fr.sub(fr.sub(e1, e0), a), b)
    return e0, c, b, a


def _horner4(cs, r):
    acc = cs[3]
    for co in (cs[2], cs[1], cs[0]):
        acc = fr.add(fr.mul(acc, r), co)
    return acc


def _extrap(lo, hi):
    """Evaluations at t=2 and t=3 of the line through (0,lo),(1,hi)."""
    d = fr.sub(hi, lo)
    p2 = fr.add(hi, d)
    return p2, fr.add(p2, d)


@aot_jit(static_argnames=("N",))
def _k_prep(tables, *, N):
    """Bit-reverse permute, zero-pad to the bucket size, and stack — one
    dispatch (eager per-table gathers cost ~50 round trips per sumcheck
    on a tunneled chip)."""
    n = int(tables[0].shape[0])
    rev = jnp.asarray(_bitrev(n))
    BUF = jnp.stack(tables)[:, rev]
    if n < N:
        BUF = jnp.concatenate(
            [BUF, jnp.zeros((BUF.shape[0], N - n, BUF.shape[-1]), BUF.dtype)],
            axis=1)
    return BUF


def _make_round_body(coeffs, nP, nS):
    """One sumcheck round (evals + transcript + fold) as a while_loop body.

    Shared by the dynamic-round tail kernel and the static-k stage kernel.
    Carry: (j, BUF, strobe_state, pos, pos_begin, e, polys_buf, rs_buf).
    """
    I = nP + nS

    def body(carry):
        j, BUF, st, p, pb, e, polys_buf, rs_buf = carry
        tr = TD.DynTranscript(st, p, pb)
        A, B = BUF[:I], BUF[I:2 * I]
        Cp, Cs = BUF[2 * I], BUF[2 * I + 1:]
        aL, aH = A[:, 0::2], A[:, 1::2]
        bL, bH = B[:, 0::2], B[:, 1::2]
        cpL, cpH = Cp[0::2], Cp[1::2]
        csL, csH = Cs[:, 0::2], Cs[:, 1::2]
        a2, a3 = _extrap(aL, aH)
        b2, b3 = _extrap(bL, bH)
        cp2, cp3 = _extrap(cpL, cpH)
        cs2, cs3 = _extrap(csL, csH)

        def etriple(a, b, cp, cs):
            ab = fr.mul(a, b)
            par = fr.mul(ab[:nP], cp[None])
            seq = fr.mul(ab[nP:], cs) if nS else ab[nP:]
            return fr.reduce_sum(jnp.concatenate([par, seq]), axis=-2)

        e0 = etriple(aL, bL, cpL, csL)   # [I, 16]
        e2 = etriple(a2, b2, cp2, cs2)
        e3 = etriple(a3, b3, cp3, cs3)
        # random-linear-combination by the layer coefficients
        rlc = fr.reduce_sum(
            fr.mul(jnp.stack([e0, e2, e3]), coeffs[None]), axis=-2)
        c0, c2, c3 = rlc[0], rlc[1], rlc[2]
        cs4 = _from_evals_cubic(c0, fr.sub(e, c0), c2, c3)

        # absorb the round polynomial, squeeze the challenge (merlin)
        tr.append_message(b"poly", b"UniPoly_begin")
        bytes4 = TD.frs_to_bytes_dev(jnp.stack(cs4))
        for i in range(4):
            tr.append_message(b"coeff", bytes4[i])
        tr.append_message(b"poly", b"UniPoly_end")
        r = tr.challenge_scalar(b"challenge_nextround")

        Ev, Od = BUF[:, 0::2], BUF[:, 1::2]
        folded = fr.add(Ev, fr.mul(r, fr.sub(Od, Ev)))
        BUF = jnp.concatenate([folded, jnp.zeros_like(folded)], axis=1)
        e = _horner4(cs4, r)
        polys_buf = jax.lax.dynamic_update_slice(
            polys_buf, jnp.stack(cs4)[None], (j, 0, 0))
        rs_buf = jax.lax.dynamic_update_slice(rs_buf, r[None], (j, 0))
        st, p, pb = tr.carry()
        return (j + 1, BUF, st, p, pb, e, polys_buf, rs_buf)

    return body


@aot_jit(static_argnames=("nP", "nS"))
def _k_fused_cubic_batched(state, pos, pos_begin, BUF, coeffs, claim,
                           num_rounds, *, nP, nS):
    """All remaining rounds of the batched cubic product sumcheck, one
    dispatch (the small-table tail).

    BUF: [2I + 1 + nS, N, 16] stacked tables, bit-reverse permuted and
    zero-padded to the bucket size N, in the order A_par|A_seq |
    B_par|B_seq | C_par | C_seq. ``num_rounds`` is TRACED and the rounds
    run under a lax.while_loop over the fixed-size buffer (zero padding
    contributes exact zeros to every sum), so ONE executable serves every
    sumcheck of this instance layout up to N. Returns a single
    [R_MAX*4 + R_MAX + M, 16] matrix: round-poly coeffs (low-to-high),
    challenges, then the final table values (valid rows per num_rounds).
    """
    R_MAX = int(BUF.shape[1]).bit_length() - 1
    body = _make_round_body(coeffs, nP, nS)

    L = BUF.shape[-1]
    carry0 = (jnp.asarray(0, jnp.int32), BUF, state,
              jnp.asarray(pos, jnp.int32), jnp.asarray(pos_begin, jnp.int32),
              claim, jnp.zeros((R_MAX, 4, L), BUF.dtype),
              jnp.zeros((R_MAX, L), BUF.dtype))
    out = jax.lax.while_loop(lambda c: c[0] < num_rounds, body, carry0)
    _, BUF, _, _, _, _, polys_buf, rs_buf = out
    finals = BUF[:, 0, :]
    return jnp.concatenate(
        [polys_buf.reshape(R_MAX * 4, L), rs_buf, finals], axis=0)


@aot_jit(static_argnames=("nP", "nS", "k", "out_n"))
def _k_fused_stage(state, pos, pos_begin, BUF, coeffs, claim, *, nP, nS,
                   k: int, out_n: int):
    """Exactly ``k`` rounds over the full buffer, then hand the live
    (front) ``out_n`` columns of the folded buffer to the next stage.

    Running every round at the top size wastes rounds x N work (a 2^13
    table padded to a 2^17 bucket cost ~100x its ideal 2N); instead the
    driver chains stage executables whose buffers shrink 4x per call, so
    total work is the geometric ~2.7N while the per-(layout, size)
    executable count stays logarithmic. Returns
    ([k*4 + k, 16] polys+challenges, BUF[:, :out_n]).
    """
    body = _make_round_body(coeffs, nP, nS)
    L = BUF.shape[-1]
    carry0 = (jnp.asarray(0, jnp.int32), BUF, state,
              jnp.asarray(pos, jnp.int32), jnp.asarray(pos_begin, jnp.int32),
              claim, jnp.zeros((k, 4, L), BUF.dtype),
              jnp.zeros((k, L), BUF.dtype))
    out = jax.lax.while_loop(lambda c: c[0] < k, body, carry0)
    _, BUF, st, p, pb, e, polys_buf, rs_buf = out
    return (jnp.concatenate([polys_buf.reshape(k * 4, L), rs_buf], axis=0),
            BUF[:, :out_n], st, p, pb, e)


def _canonical_below(m: int, small_log: int) -> int:
    """Largest stage size log2 < m on the {small_log + 2j} grid."""
    cand = m - 1
    while (cand - small_log) % 2 != 0:
        cand -= 1
    return cand


def prove_cubic_batched_fused(claim: int, num_rounds: int,
                              TA, TB, TC, Cp, nP: int, coeffs, transcript):
    """Fused driver for SumcheckInstanceProof.prove_cubic_batched.

    TA/TB: per-instance device tables (par then seq), TC: seq-only C
    tables, Cp: shared par C table. Tables above SMALL_BUCKET_N run as a
    chain of stage executables whose buffers shrink 4x per call (total
    work the geometric ~2.7N instead of rounds x N), then one
    dynamic-round tail executable finishes every sumcheck of this layout
    at SMALL_BUCKET_N. The host replays each call's round polys through
    ``transcript`` and asserts the device challenges match.
    Returns (compressed_polys, r, claims_prod, claims_dotp).
    """
    nS = len(TC)
    I = nP + nS
    n = int(Cp.shape[0])
    assert n == (1 << num_rounds)

    # tiny sumchecks pad up to the shared tail bucket on TPU; CPU coverage
    # runs use exact sizes (per-shape compiles, persistent-cached)
    if jax.default_backend() == "tpu" and n < SMALL_BUCKET_N:
        N = SMALL_BUCKET_N
    else:
        N = n
    BUF = _k_prep(tuple(TA) + tuple(TB) + (Cp,) + tuple(TC), N=N)
    state, pos, pos_begin, _ = TD.DeviceTranscript.export_host_state(transcript)
    enc = F.encode_fr([c % FR_MOD for c in coeffs] + [claim % FR_MOD])
    coeffs_d, claim_d = enc[:I], enc[I]

    # the device transcript state (STROBE sponge + positions) and the
    # running claim are carried stage-to-stage ON DEVICE: the whole chain
    # runs with zero host syncs, and the ONE decode at the end feeds the
    # host replay that re-derives and cross-checks every challenge
    st, p, pb = jnp.asarray(state), pos, pos_begin
    stages: list[tuple[int, int]] = []  # (rounds, R_MAX) per call
    outs = []                            # device [5k(+M), 16] blocks
    small_log = SMALL_BUCKET_N.bit_length() - 1
    n_live = N
    while n_live > SMALL_BUCKET_N:
        m = n_live.bit_length() - 1
        target_log = _canonical_below(m, small_log)
        k = m - target_log  # 1 or 2
        out, BUF, st, p, pb, claim_d = _k_fused_stage(
            st, p, pb, BUF, coeffs_d, claim_d,
            nP=nP, nS=nS, k=k, out_n=1 << target_log)
        stages.append((k, k))
        outs.append(out)
        n_live = 1 << target_log

    R_MAX = n_live.bit_length() - 1
    rounds_left = num_rounds - sum(k for k, _ in stages)
    out = _k_fused_cubic_batched(
        st, p, pb, BUF, coeffs_d, claim_d,
        jnp.asarray(rounds_left, jnp.int32), nP=nP, nS=nS)
    stages.append((rounds_left, R_MAX))
    outs.append(out)

    vals = F.decode_fr(jnp.concatenate(outs, axis=0))  # the ONE transfer

    polys: list[CompressedUniPoly] = []
    r: list[int] = []
    off = 0
    for k, rmax in stages:
        for j in range(k):
            poly = UniPoly(vals[off + 4 * j:off + 4 * j + 4])
            poly.append_to_transcript(b"poly", transcript)
            r_j = transcript.challenge_scalar(b"challenge_nextround")
            if r_j != vals[off + 4 * rmax + j]:
                raise RuntimeError(
                    f"device transcript diverged from host at round {len(r)}")
            r.append(r_j)
            polys.append(poly.compress())
        off += 5 * rmax

    finals = vals[off:]
    finals_A, finals_B = finals[:I], finals[I:2 * I]
    c_par_final = finals[2 * I]
    finals_C = finals[2 * I + 1:2 * I + 1 + nS]
    claims_prod = (finals_A[:nP], finals_B[:nP], c_par_final)
    claims_dotp = (finals_A[nP:], finals_B[nP:], list(finals_C)) if nS \
        else ([], [], [])
    return polys, r, claims_prod, claims_dotp
