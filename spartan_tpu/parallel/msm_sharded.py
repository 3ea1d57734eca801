"""Multi-chip Pippenger MSM: points sharded, window sums reduced over ICI.

The TPU-native replacement for the reference's Rayon MSM parallelism
(SURVEY.md §2.2): each device runs the bucket method on its point shard
(identical windows), the per-window projective partials are all-gathered
(W x 3 coords x 16 limbs — tiny), and the complete-addition reduction over
the device axis plus the Horner window combine run replicated. Group
elements cannot be ``psum``-ed (addition is the curve law, not integer +),
hence gather-then-reduce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from spartan_tpu.ops import curve_jax as C
from spartan_tpu.ops import msm as MSM
from spartan_tpu.ops.limbs import NUM_LIMBS
from spartan_tpu.parallel.mesh import SHARD_AXIS


def commit_rows_sharded(mesh, Z_mont, blinds_mont, gens_points):
    """Row-parallel Hyrax matrix commit: rows sharded over the mesh.

    Z_mont [L, R, 16] Montgomery + per-row blinds against shared generators
    (the reference's rayon par_iter over rows, hyrax.rs:253-267). Each
    device runs the full single-row MSM pipeline on its row shard — no
    collectives until the final [L] point gather — so the results are
    bit-identical to the unsharded ``commit_rows``.
    """
    from spartan_tpu.ops import field_jax as F
    from spartan_tpu.ops import msm as MSM_mod

    D = mesh.devices.size
    L, R = Z_mont.shape[0], Z_mont.shape[1]
    pad = (-L) % D
    if pad:
        Z_mont = jnp.concatenate(
            [Z_mont, jnp.zeros((pad, R, NUM_LIMBS), jnp.uint32)], axis=0)
        blinds_mont = jnp.concatenate(
            [blinds_mont, jnp.zeros((pad, NUM_LIMBS), jnp.uint32)], axis=0)

    def local(z, b, px, py, pinf):
        sc = jnp.concatenate([z, b[:, None, :]], axis=1)
        return MSM_mod.msm((px, py, pinf), F.fr.from_mont(sc))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None, None), P(SHARD_AXIS, None),
                  P(None, None), P(None, None), P(None)),
        out_specs=(P(SHARD_AXIS, None),) * 3,
        check_vma=False,
    )
    out = jax.jit(fn)(Z_mont, blinds_mont, *gens_points)
    from spartan_tpu.parallel.mesh import gather_table

    return tuple(gather_table(mesh, a)[:L] for a in out)


def msm_sharded(mesh, points, scalars, c: int | None = None):
    """MSM over a device mesh. points: affine tuple sharded on the point
    axis; scalars: [N, 16] canonical limbs, same sharding. Returns a
    replicated projective point.

    Each device runs the same chunked bucket pipeline as the single-chip
    ``MSM.msm`` (the sequential Pallas kernel on accelerators) on its
    point shard; only the tiny [W] window partials cross the ICI.
    """
    D = mesh.devices.size
    n_local = scalars.shape[0] // D
    nseg = 1
    if c is None:
        if MSM._use_seq_kernel():
            c, nseg = MSM._choose_seq_params(n_local, 1)
        else:
            c = MSM.default_window(n_local)
    elif MSM._use_seq_kernel():
        _, nseg = MSM._choose_seq_params(n_local, 1)
    W = -(-254 // c)
    rows_per_call = min(max(1, MSM._chunk_budget() // max(n_local, 1)), W)

    def local(px, py, pinf, sc):
        digits = MSM.window_digits(sc, c)          # [n_local, W]
        dig = jnp.moveaxis(digits, -1, 0)          # [W, n_local]
        parts = []
        start = 0
        while start < W:                            # bound gather memory
            stop = min(start + rows_per_call, W)
            chunk = dig[start:stop]
            if stop - start < rows_per_call:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((rows_per_call - (stop - start), n_local),
                                      jnp.uint32)], axis=0)
            parts.append(MSM.bucket_windows((px, py, pinf), chunk, c,
                                            nseg=nseg))
            start = stop
        part = tuple(jnp.concatenate([p[i] for p in parts], axis=0)[:W]
                     for i in range(3))
        # gather per-device partials: [D, W, 16] per coord
        gx = jax.lax.all_gather(part[0], SHARD_AXIS)
        gy = jax.lax.all_gather(part[1], SHARD_AXIS)
        gz = jax.lax.all_gather(part[2], SHARD_AXIS)
        wins = MSM.reduce_points((gx, gy, gz), axis=0)      # [W] totals
        wx, wy, wz = (w[::-1] for w in wins)
        acc = MSM._horner_windows((wx, wy, wz), c)
        return acc

    shard = P(SHARD_AXIS)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None), shard, P(SHARD_AXIS, None)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    px, py, pinf = points
    return fn(px, py, pinf, scalars)
