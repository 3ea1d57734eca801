"""Host-exact small-size fallback for the protocol layers.

The interactive protocol's tables halve every sumcheck round, so a prover
at size N touches ~log N distinct shapes per kernel; on the device path
each is a separate trace+lower+compile. For the long tail of tiny shapes
that overhead dwarfs the math (a full 2^4 SNARK spent >30 min in
compiles). Below the thresholds here, table ops switch to exact Python
bigint arithmetic — bit-identical results (all ops are exact mod p on both
paths), zero compiles, and microsecond dispatch.

The reference has no analog (arkworks is always "host"); this module is
what makes the TPU build match its behavior at small sizes while the
device path owns everything large.

Thresholds (env-tunable):
  SPARTAN_TPU_HOST_N      field-table ops below this length (default 2048)
  SPARTAN_TPU_HOST_MSM_N  curve MSM/commit sizes below this (default 128)
"""

from __future__ import annotations

import os

from spartan_tpu.ops.fields_host import FR_MOD

HOST_N = int(os.environ.get("SPARTAN_TPU_HOST_N", "2048"))


def _default_msm_threshold() -> int:
    """With the native C G1 backend (spartan_tpu/native/g1_host.c) host
    MSMs run ~60 us/point, so bullet rounds and small commits stay host up
    to 8192 (~0.5 s): at keyless 2^20 scale every bullet reduction runs at
    n = 4096..8192, and the device path there is a ladder of one-off
    sequential-bucket kernel shapes whose compile+dispatch cost measured
    ~100 s/round on the real chip (the 1285 s derefs_eval_proof of round
    2's bench). The pure-Python fallback is ~25x slower, keep 128 there."""
    try:
        from spartan_tpu import native as N

        return 8192 if N.g1_available else 128
    except Exception:
        return 128


HOST_MSM_N = int(os.environ.get("SPARTAN_TPU_HOST_MSM_N", "0")) or \
    _default_msm_threshold()

# Leave the mesh (gather to single-device) once a sumcheck table folds
# below this length, even if it is still above HOST_N. Production default
# 0 = fold on the mesh all the way down to shard granularity; the
# multichip dry run sets it huge so each sharded family compiles exactly
# ONE mesh-round module instead of a whole ladder of shrinking shapes.
MESH_MIN_N = int(os.environ.get("SPARTAN_TPU_MESH_MIN_N", "0"))


def host_table_n() -> int:
    """Size below which sumcheck/opening table work switches to the exact
    host path. Mesh ENGAGEMENT always compares against the raw HOST_N;
    this only governs the single-device tail, so a dry run with
    MESH_MIN_N huge runs (mesh round) -> (host tail) with no ladder of
    per-shape single-device compiles in between."""
    return max(HOST_N, MESH_MIN_N)


def host_commit_points() -> int:
    """Total-point cutoff below which a row-batched commit goes to the C
    host MSM (~60 us/point) instead of the device: small batches cost more
    in per-shape tracing than the math."""
    return 16384 if HOST_MSM_N >= 2048 else 512

P = FR_MOD


# ---------------------------------------------------------------------------
# field table ops on python ints (canonical domain)
# ---------------------------------------------------------------------------

def fold_top(T: list[int], r: int) -> list[int]:
    """Z'[i] = Z[i] + r * (Z[i+n] - Z[i]) (hyrax.rs:195-203)."""
    n = len(T) // 2
    return [(T[i] + r * (T[i + n] - T[i])) % P for i in range(n)]


def cubic_prod_evals(A, B, C):
    """Round evals (e0, e2, e3) of sum A*B*C (sumcheck.rs:89-161)."""
    n = len(A) // 2
    e0 = e2 = e3 = 0
    for i in range(n):
        aL, aH = A[i], A[i + n]
        bL, bH = B[i], B[i + n]
        cL, cH = C[i], C[i + n]
        e0 += aL * bL % P * cL
        a2 = 2 * aH - aL
        b2 = 2 * bH - bL
        c2 = 2 * cH - cL
        e2 += a2 * b2 % P * c2
        e3 += (a2 + aH - aL) * (b2 + bH - bL) % P * (c2 + cH - cL)
    return e0 % P, e2 % P, e3 % P


def cubic_additive_evals(T, A, B, C):
    """Round evals of sum tau * (Az*Bz - Cz) (sumcheck.rs:465-530)."""
    n = len(T) // 2
    e0 = e2 = e3 = 0
    for i in range(n):
        tL, tH = T[i], T[i + n]
        aL, aH = A[i], A[i + n]
        bL, bH = B[i], B[i + n]
        cL, cH = C[i], C[i + n]
        e0 += tL * (aL * bL - cL) % P
        t2 = 2 * tH - tL
        a2 = 2 * aH - aL
        b2 = 2 * bH - bL
        c2 = 2 * cH - cL
        e2 += t2 * (a2 * b2 - c2) % P
        e3 += (t2 + tH - tL) * ((a2 + aH - aL) * (b2 + bH - bL) - (c2 + cH - cL)) % P
    return e0 % P, e2 % P, e3 % P


def quad_evals(A, B):
    """Round evals (e0, e2) of sum A*B (sumcheck.rs:684-699)."""
    n = len(A) // 2
    e0 = e2 = 0
    for i in range(n):
        e0 += A[i] * B[i]
        e2 += (2 * A[i + n] - A[i]) * (2 * B[i + n] - B[i])
    return e0 % P, e2 % P


def dot(a, b) -> int:
    return sum(x * y % P for x, y in zip(a, b)) % P


def mul_elementwise(a, b):
    return [x * y % P for x, y in zip(a, b)]


def eq_evals(r: list[int]) -> list[int]:
    """eq table, r[0] = most significant index bit (hyrax.rs:355-369)."""
    table = [1]
    for rj in r:
        nxt = []
        for t in table:
            h = t * rj % P
            nxt.append((t - h) % P)
            nxt.append(h)
        table = nxt
    return table


def evaluate_mle(Z: list[int], r: list[int]) -> int:
    """MLE evaluation by eq-table dot product (hyrax.rs:217-222)."""
    chis = eq_evals(r)
    return dot(chis[: len(Z)], Z)
