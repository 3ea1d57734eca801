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
from jax.experimental.shard_map import shard_map

from spartan_tpu.ops import curve_jax as C
from spartan_tpu.ops import msm as MSM
from spartan_tpu.ops.limbs import NUM_LIMBS
from spartan_tpu.parallel.mesh import SHARD_AXIS


def msm_sharded(mesh, points, scalars, c: int = 8):
    """MSM over a device mesh. points: affine tuple sharded on the point
    axis; scalars: [N, 16] canonical limbs, same sharding. Returns a
    replicated projective point."""
    W = -(-254 // c)

    def local(px, py, pinf, sc):
        digits = MSM.window_digits(sc, c)          # [n_local, W]
        dig = jnp.moveaxis(digits, -1, 0)          # [W, n_local]
        part = MSM._bucket_windows((px, py, pinf), dig, c)  # [W] proj partials
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
        check_rep=False,
    )
    px, py, pinf = points
    return fn(px, py, pinf, scalars)
