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
from jax import shard_map

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
    """Exact field psum: canonical 16-bit limbs -> integer psum -> normalize.

    Works on any [..., 16] batch. Callers that have SEVERAL partial sums
    stack them and make ONE call: every psum/all-gather is a separate
    device rendezvous, and on the 8-virtual-device CPU dryrun host a
    rendezvous intermittently stalls 120 s+ when one starved thread
    arrives late (1-core box) — the batched layered evals used to issue
    3*I of them per round. On real hardware the stacked form is also one
    ICI launch instead of 3*I.
    """
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
        return psum_field(jnp.stack([e0, e2, e3]))[None]

    sharded = P(SHARD_AXIS, None, None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded),
        out_specs=sharded,
        check_vma=False,
    )

    def evals(T, A, B, C):
        st = fn(T, A, B, C)[0]  # post-psum value; every shard identical
        return st[0], st[1], st[2]

    return evals


def make_quad_evals(mesh):
    """jittable (A, B) -> (e0, e2) for the phase-2 quadratic rounds."""

    def local(A, B):
        aL, aH = _halves(A[0])
        bL, bH = _halves(B[0])
        a2, _ = _extrapolate(aL, aH)
        b2, _ = _extrapolate(bL, bH)
        return psum_field(jnp.stack([
            fr.reduce_sum(fr.mul(aL, bL), axis=0),
            fr.reduce_sum(fr.mul(a2, b2), axis=0)]))[None]

    sharded = P(SHARD_AXIS, None, None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded),
        out_specs=sharded,
        check_vma=False,
    )

    def evals(A, B):
        st = fn(A, B)[0]
        return st[0], st[1]

    return evals


def make_fold(mesh):
    """jittable (table, r) -> folded table, strided layout preserved."""

    def local(T, r):
        return _local_fold(T[0], r)[None]

    sharded = P(SHARD_AXIS, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(sharded, P(None)),
        out_specs=sharded,
        check_vma=False,
    )


def make_cubic_step(mesh):
    """jittable (T, A, B, C, r) -> (T', A', B', C', e0, e2, e3).

    Fold-then-eval in ONE dispatch: tables fold by the previous round's
    challenge, then the NEXT round's evals come off the folded tables.
    Strided layout keeps both halves of every fold pair device-local.
    """

    def local(T, A, B, C, r):
        T, A, B, C = T[0], A[0], B[0], C[0]
        Tn = _local_fold(T, r)
        An = _local_fold(A, r)
        Bn = _local_fold(B, r)
        Cn = _local_fold(C, r)
        e0, e2, e3 = _local_cubic_additive(Tn, An, Bn, Cn)
        st = psum_field(jnp.stack([e0, e2, e3]))
        return Tn[None], An[None], Bn[None], Cn[None], st[None]

    sharded = P(SHARD_AXIS, None, None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, P(None)),
        out_specs=(sharded, sharded, sharded, sharded, sharded),
        check_vma=False,
    )

    def step(T, A, B, C, r):
        T, A, B, C, st = fn(T, A, B, C, r)
        st = st[0]
        return T, A, B, C, st[0], st[1], st[2]

    return step


def make_quad_step(mesh):
    """jittable (A, B, r) -> (A', B', e0, e2): fused phase-2 round step."""

    def local(A, B, r):
        An = _local_fold(A[0], r)
        Bn = _local_fold(B[0], r)
        aL, aH = _halves(An)
        bL, bH = _halves(Bn)
        a2, _ = _extrapolate(aL, aH)
        b2, _ = _extrapolate(bL, bH)
        st = psum_field(jnp.stack([
            fr.reduce_sum(fr.mul(aL, bL), axis=0),
            fr.reduce_sum(fr.mul(a2, b2), axis=0)]))
        return An[None], Bn[None], st[None]

    sharded = P(SHARD_AXIS, None, None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded, P(None)),
        out_specs=(sharded, sharded, sharded),
        check_vma=False,
    )

    def step(A, B, r):
        A, B, st = fn(A, B, r)
        st = st[0]
        return A, B, st[0], st[1]

    return step


def make_tree_level(mesh):
    """jittable sharded-table -> sharded-table product-tree level.

    prod[i] = Z[i] * Z[i + n/2]: in the strided layout both factors are
    device-local (same trick as the sumcheck fold), so building a product
    tree is log n local multiplies with zero communication.
    """

    def local(Z):
        z = Z[0]
        half = z.shape[0] // 2
        return fr.mul(z[:half], z[half:])[None]

    sharded = P(SHARD_AXIS, None, None)
    return shard_map(
        local, mesh=mesh, in_specs=(sharded,), out_specs=sharded,
        check_vma=False,
    )


def bound_sharded(mesh, Z, L_dev, L_size: int, R_size: int):
    """LZ[j] = sum_i L[i] * Z[i*R+j] with the L (row) axis sharded.

    The Hyrax opening hot op (hyrax.rs:311-324): each device reduces its
    row block, one exact field psum joins them — values identical to the
    single-device ``k_bound_matrix``.
    """
    M = Z.reshape(L_size, R_size, NUM_LIMBS)

    def local(m, l):
        part = fr.reduce_sum(fr.mul(l[:, None, :], m), axis=0)
        return psum_field(part)[None]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None, None), P(SHARD_AXIS, None)),
        out_specs=P(SHARD_AXIS, None, None),
        check_vma=False,
    )
    return jax.jit(lambda m, l: fn(m, l)[0])(M, L_dev)


def _local_cubic_prod(A, B, C):
    """Local partials of product-comb round evals (sum A*B*C)."""
    aL, aH = _halves(A)
    bL, bH = _halves(B)
    cL, cH = _halves(C)
    a2, a3 = _extrapolate(aL, aH)
    b2, b3 = _extrapolate(bL, bH)
    c2, c3 = _extrapolate(cL, cH)
    e0 = fr.reduce_sum(fr.mul(fr.mul(aL, bL), cL), axis=0)
    e2 = fr.reduce_sum(fr.mul(fr.mul(a2, b2), c2), axis=0)
    e3 = fr.reduce_sum(fr.mul(fr.mul(a3, b3), c3), axis=0)
    return e0, e2, e3


def _batched_evals_local(TA, TB, TC, Cp, nP):
    """Per-instance (e0,e2,e3) stacked [3I, 16] in transcript order.

    One stacked psum for the whole batch (3*I rendezvous -> 1)."""
    outs = []
    for k in range(len(TA)):
        Ck = Cp if k < nP else TC[k - nP]
        outs.extend(_local_cubic_prod(TA[k], TB[k], Ck))
    return psum_field(jnp.stack(outs, axis=0))


def make_batched_evals(mesh, nP: int):
    """jittable (TA, TB, TC, Cp) -> [3I, 16] replicated round evals.

    TA/TB are length-I lists of strided-sharded tables; the first nP
    instances share the eq table Cp, the rest use per-instance TC. The
    batched analog of ``make_cubic_evals`` for the product-tree layered
    sumchecks (product_tree.rs:251-392).
    """

    def local(TA, TB, TC, Cp):
        return _batched_evals_local(
            [t[0] for t in TA], [t[0] for t in TB],
            [t[0] for t in TC], Cp[0], nP)[None]

    sharded = P(SHARD_AXIS, None, None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded),
        out_specs=sharded,
        check_vma=False,
    )

    def evals(TA, TB, TC, Cp):
        return fn(TA, TB, TC, Cp)[0]  # post-psum; every shard identical

    return evals


def make_batched_step(mesh, nP: int):
    """jittable (TA, TB, TC, Cp, r) -> (TA', TB', TC', Cp', evals[3I,16]).

    Fold every table by r then compute the next round's evals — one
    dispatch for the whole instance batch.
    """

    def local(TA, TB, TC, Cp, r):
        TA = [_local_fold(t[0], r) for t in TA]
        TB = [_local_fold(t[0], r) for t in TB]
        TC = [_local_fold(t[0], r) for t in TC]
        Cp = _local_fold(Cp[0], r)
        ev = _batched_evals_local(TA, TB, TC, Cp, nP)
        return ([t[None] for t in TA], [t[None] for t in TB],
                [t[None] for t in TC], Cp[None], ev[None])

    sharded = P(SHARD_AXIS, None, None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, P(None)),
        out_specs=(sharded, sharded, sharded, sharded, sharded),
        check_vma=False,
    )

    def step(TA, TB, TC, Cp, r):
        TA, TB, TC, Cp, ev = fn(TA, TB, TC, Cp, r)
        return TA, TB, TC, Cp, ev[0]

    return step


def make_batched_fold(mesh):
    """jittable (TA, TB, TC, Cp, r) -> folded tables (strided preserved)."""

    def local(TA, TB, TC, Cp, r):
        return ([_local_fold(t[0], r)[None] for t in TA],
                [_local_fold(t[0], r)[None] for t in TB],
                [_local_fold(t[0], r)[None] for t in TC],
                _local_fold(Cp[0], r)[None])

    sharded = P(SHARD_AXIS, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, P(None)),
        out_specs=(sharded, sharded, sharded, sharded),
        check_vma=False,
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
        st = psum_field(jnp.stack([e0, e2, e3]))
        Tn = _local_fold(T, r)
        An = _local_fold(A, r)
        Bn = _local_fold(B, r)
        Cn = _local_fold(C, r)
        return st[None], Tn[None], An[None], Bn[None], Cn[None]

    sharded = P(SHARD_AXIS, None, None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, P(None)),
        out_specs=(sharded, sharded, sharded, sharded, sharded),
        check_vma=False,
    )

    def round_fn(T, A, B, C, r):
        st, Tn, An, Bn, Cn = fn(T, A, B, C, r)
        st = st[0]
        return st[0], st[1], st[2], Tn, An, Bn, Cn

    return round_fn
