"""Sequence-parallel sumcheck rounds over a device mesh.

The zkSNARK analog of context parallelism (SURVEY.md §5): the evaluation
tables (tau, Az, Bz, Cz — up to 2^22 elements) are sharded over devices in
a *strided* layout — element i lives on device i mod D at local slot
i // D — so the top-variable fold (pairs i, i + N/2) stays device-local for
every round until the table shrinks below the device count. Round
evaluations are local partial field sums whose canonical limbs are exact
under integer ``psum`` for < 2^16 devices, followed by one column
normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from spartan_tpu.core.sumcheck import _extrapolate
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.limbs import NUM_LIMBS
from spartan_tpu.parallel.mesh import SHARD_AXIS

fr = F.fr


def to_strided(x, num_devices: int):
    """[N, 16] natural order -> [N/D, D, 16] (axis 1 shards across devices)."""
    n = x.shape[0]
    assert n % num_devices == 0
    return x.reshape(n // num_devices, num_devices, NUM_LIMBS).swapaxes(0, 1) \
            .reshape(num_devices, n // num_devices, NUM_LIMBS)


def from_strided(x):
    """[D, N/D, 16] -> [N, 16] natural order."""
    d, m, _ = x.shape
    return x.reshape(d, m, NUM_LIMBS).swapaxes(0, 1).reshape(d * m, NUM_LIMBS)


def psum_field(x_canon):
    """Exact field psum: canonical 16-bit limbs -> integer psum -> normalize."""
    s = jax.lax.psum(x_canon, SHARD_AXIS)  # columns < D * 2^16 < 2^32
    return fr.normalize_columns(s)


def _halves(T):
    n = T.shape[0] // 2
    return T[:n], T[n:]


def _local_cubic_additive(T, A, B, C):
    """Local partials of the phase-1 round evals (tau * (Az*Bz - Cz))."""
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

    e0 = fr.reduce_sum(comb(tL, aL, bL, cL), axis=0)
    e2 = fr.reduce_sum(comb(t2, a2, b2, c2), axis=0)
    e3 = fr.reduce_sum(comb(t3, a3, b3, c3), axis=0)
    return e0, e2, e3


def _local_fold(T, r):
    lo, hi = _halves(T)
    return fr.add(lo, fr.mul(r, fr.sub(hi, lo)))


def make_cubic_evals(mesh):
    """jittable (T, A, B, C) -> (e0, e2, e3): round evals only (replicated).

    Separate from the fold because the interactive protocol derives the
    fold challenge from these evals via the host transcript.
    """

    def local(T, A, B, C):
        e0, e2, e3 = _local_cubic_additive(T[0], A[0], B[0], C[0])
        return psum_field(e0), psum_field(e2), psum_field(e3)

    sharded = P(SHARD_AXIS, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded),
        out_specs=(P(None), P(None), P(None)),
        check_rep=False,
    )


def make_quad_evals(mesh):
    """jittable (A, B) -> (e0, e2) for the phase-2 quadratic rounds."""

    def local(A, B):
        aL, aH = _halves(A[0])
        bL, bH = _halves(B[0])
        a2, _ = _extrapolate(aL, aH)
        b2, _ = _extrapolate(bL, bH)
        e0 = psum_field(fr.reduce_sum(fr.mul(aL, bL), axis=0))
        e2 = psum_field(fr.reduce_sum(fr.mul(a2, b2), axis=0))
        return e0, e2

    sharded = P(SHARD_AXIS, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded),
        out_specs=(P(None), P(None)),
        check_rep=False,
    )


def make_fold(mesh):
    """jittable (table, r) -> folded table, strided layout preserved."""

    def local(T, r):
        return _local_fold(T[0], r)[None]

    sharded = P(SHARD_AXIS, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(sharded, P(None)),
        out_specs=sharded,
        check_rep=False,
    )


def make_cubic_round(mesh):
    """Returns jittable fn(T, A, B, C, r) -> (e0, e2, e3, T', A', B', C').

    Tables are [D, N/D, 16] strided-sharded on axis 0; the fold challenge r
    is a replicated [16] Montgomery scalar. One round = fused local evals +
    3 field psums + local folds (the all-to-all at sub-device-count sizes is
    handled by the host driver regathering).
    """

    def local(T, A, B, C, r):
        T, A, B, C = T[0], A[0], B[0], C[0]
        e0, e2, e3 = _local_cubic_additive(T, A, B, C)
        e0, e2, e3 = psum_field(e0), psum_field(e2), psum_field(e3)
        Tn = _local_fold(T, r)
        An = _local_fold(A, r)
        Bn = _local_fold(B, r)
        Cn = _local_fold(C, r)
        return e0, e2, e3, Tn[None], An[None], Bn[None], Cn[None]

    sharded = P(SHARD_AXIS, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, P(None)),
        out_specs=(P(None), P(None), P(None), sharded, sharded, sharded, sharded),
        check_rep=False,
    )
