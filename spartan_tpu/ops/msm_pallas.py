"""Pallas sequential bucket accumulation for the Pippenger MSM (TPU).

Replaces the log-depth associative-scan bucket accumulation in ops/msm.py
with a *sequential-over-points* VMEM-resident prefix kernel:

  - lanes carry B independent (window x msm-row) digit rows;
  - the kernel walks the N digit-sorted points IN ORDER, maintaining a
    running prefix accumulator per lane in VMEM, resetting it at digit-run
    boundaries (prefix-with-reset), and streaming each prefix out;
  - bucket sums are then just gathers of the prefix at run ends;
  - a second sequential kernel does the weighted bucket reduction
    sum_b b * B_b with two running accumulators (suffix trick) and emits
    only the per-lane window total.

Work drops from ~2.5*N + 5*2^c complete adds per window-row (chunked scan
+ boundary differences + two more scans) to N + 2*2^c, and every
intermediate stays in VMEM — the scan path materializes each round of
combiner output through HBM.

Layouts (HBM): points [N, 16, B] (limb-major tiles per step), digits
[N, B] int32. Grid (B//BT, N//CN), N innermost so the accumulator scratch
carries across N-chunks of the same lane block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.limbs import NUM_LIMBS
from spartan_tpu.ops.pallas_field import _padd_block, _padd_mixed_block
from spartan_tpu.utils.aot_cache import aot_jit

_U32 = jnp.uint32
_L = NUM_LIMBS  # 16
# lanes per block x points per grid step: tools/padd_bench.py measured the
# sequential mixed-add walk at 10.4 M adds/s with (512, 32) vs 8.9 M at the
# old (128, 64); streamed blocks (2 in + 3 out coords) stay ~5.2 MB so
# Mosaic's double buffering fits VMEM.
_BT = int(_os.environ.get("SPARTAN_TPU_MSM_BT", "512"))
_CN = int(_os.environ.get("SPARTAN_TPU_MSM_CN", "32"))

# interpret=True runs the kernels through the Pallas interpreter (any
# backend) — used by the CPU test suite to cover this path.
_INTERPRET = _os.environ.get("SPARTAN_TPU_PALLAS_INTERPRET") == "1"


def _identity_tiles(T, one_col):
    """Projective identity (0, 1, 0) with 1 in MONTGOMERY form (r1 limbs).

    one_col: [16, 1] block read from the one_ref input (constants captured
    by closure are rejected by pallas_call)."""
    z = jnp.zeros((_L, T), _U32)
    one = jnp.broadcast_to(one_col, (_L, T))
    return z, one, z


def _prefix_kernel(p_ref, one_ref, sd_ref, gx_ref, gy_ref,
                   ox_ref, oy_ref, oz_ref,
                   accx, accy, accz, prev, *, pp: int):
    """One (BT-lane, CN-point) block of the prefix-with-reset walk.

    Stream points are AFFINE (x, y) — complete mixed addition (11 muls,
    no Z2 stream). Points that must not contribute (infinities, padding)
    carry digit 0 / >= 2^c, so their garbage prefixes land only in runs
    no bucket query ever reads.
    """
    n_idx = pl.program_id(1)

    one_col = one_ref[:]

    @pl.when(n_idx == 0)
    def _init():
        ix, iy, iz = _identity_tiles(_BT, one_col)
        accx[:] = ix
        accy[:] = iy
        accz[:] = iz
        prev[:] = jnp.full((1, _BT), 0xFFFFFFFF, _U32)

    p_col = p_ref[:]

    def step(i, carry):
        ax, ay, az, pv = carry
        d = sd_ref[pl.ds(i, 1), :]                      # [1, BT]
        boundary = d != pv                               # [1, BT]
        ix, iy, iz = _identity_tiles(_BT, one_col)
        ax = jnp.where(boundary, ix, ax)
        ay = jnp.where(boundary, iy, ay)
        az = jnp.where(boundary, iz, az)
        px = gx_ref[pl.ds(i, 1)][0]                      # [16, BT]
        py = gy_ref[pl.ds(i, 1)][0]
        ax, ay, az = _padd_mixed_block(ax, ay, az, px, py, p_col,
                                       jnp.uint32(pp), unroll=True)
        ox_ref[pl.ds(i, 1)] = ax[None]
        oy_ref[pl.ds(i, 1)] = ay[None]
        oz_ref[pl.ds(i, 1)] = az[None]
        return (ax, ay, az, d)

    ax, ay, az, pv = jax.lax.fori_loop(
        0, _CN, step, (accx[:], accy[:], accz[:], prev[:]))
    accx[:] = ax
    accy[:] = ay
    accz[:] = az
    prev[:] = pv


def _weighted_kernel(p_ref, one_ref, bx_ref, by_ref, bz_ref,
                     ox_ref, oy_ref, oz_ref,
                     runx, runy, runz, totx, toty, totz, *, pp: int):
    """Weighted bucket reduction: sum_b b * B_b via two running adds.

    Buckets arrive HIGHEST bucket first along axis 0. run += B_b;
    tot += run. After the last chunk, tot = sum_b b * B_b.
    """
    n_idx = pl.program_id(1)
    last = pl.num_programs(1) - 1

    one_col = one_ref[:]

    @pl.when(n_idx == 0)
    def _init():
        ix, iy, iz = _identity_tiles(_BT, one_col)
        runx[:] = ix
        runy[:] = iy
        runz[:] = iz
        totx[:] = ix
        toty[:] = iy
        totz[:] = iz

    p_col = p_ref[:]

    def step(i, carry):
        rx, ry, rz, tx, ty, tz = carry
        bx = bx_ref[pl.ds(i, 1)][0]
        by = by_ref[pl.ds(i, 1)][0]
        bz = bz_ref[pl.ds(i, 1)][0]
        rx, ry, rz = _padd_block(rx, ry, rz, bx, by, bz, p_col, jnp.uint32(pp), unroll=True)
        tx, ty, tz = _padd_block(tx, ty, tz, rx, ry, rz, p_col, jnp.uint32(pp), unroll=True)
        return (rx, ry, rz, tx, ty, tz)

    rx, ry, rz, tx, ty, tz = jax.lax.fori_loop(
        0, _CN, step, (runx[:], runy[:], runz[:], totx[:], toty[:], totz[:]))
    runx[:] = rx
    runy[:] = ry
    runz[:] = rz
    totx[:] = tx
    toty[:] = ty
    totz[:] = tz

    @pl.when(n_idx == last)
    def _emit():
        ox_ref[:] = totx[:]
        oy_ref[:] = toty[:]
        oz_ref[:] = totz[:]


@aot_jit(static_argnames=("c", "nseg"))
def bucket_windows_seq(points, digits, c: int, nseg: int = 1):
    """Drop-in for msm._bucket_windows on TPU.

    points: (x [N,16], y [N,16], inf [N]) affine, shared across the batch.
    digits: [B, N] uint32. Returns projective ([B,16], [B,16], [B,16]).

    ``nseg`` splits each digit row's point axis into that many independent
    segments, each its own kernel lane — the sequential walk is only as
    parallel as its lane count, so a single MSM (B = #windows, ~22-32
    rows) must segment to fill the 128+ lanes of a block. Segment bucket
    sums add 2 * 2^c * nseg extra adds per row (combined in a tiny tree
    at the end); the driver balances that against c.
    """
    from spartan_tpu.ops.field_jax import FQ

    px, py, pinf = points
    B0, N0 = digits.shape
    nbuckets = (1 << c) - 1

    # infinity points must not contribute: force their digit to 0, so the
    # mixed-add walk confines their (garbage-coordinate) prefixes to the
    # digit-0 run, which no bucket query reads
    digits = jnp.where(pinf[None, :] != 0, jnp.zeros_like(digits), digits)

    if nseg > 1:
        m = -(-N0 // nseg)
        if m * nseg != N0:
            pad = m * nseg - N0
            digits = jnp.concatenate(
                [digits, jnp.zeros((B0, pad), digits.dtype)], axis=1)
            px = jnp.concatenate([px, jnp.zeros((pad, _L), _U32)], axis=0)
            py = jnp.concatenate([py, jnp.zeros((pad, _L), _U32)], axis=0)
        digits = digits.reshape(B0, nseg, m).reshape(B0 * nseg, m)
        seg_off = ((jnp.arange(B0 * nseg, dtype=jnp.int32) % nseg) * m)[:, None]
    else:
        seg_off = None

    B, N = digits.shape

    order = jnp.argsort(digits, axis=-1)
    sd = jnp.take_along_axis(digits, order, axis=-1)     # [B, N]
    gidx = order if seg_off is None else order + seg_off
    gx = px[gidx]                                         # [B, N, 16]
    gy = py[gidx]
    fq = F.fq

    # pad B to _BT multiple, N to _CN multiple
    Bp = -(-B // _BT) * _BT
    Np = -(-N // _CN) * _CN
    if Bp != B:
        sd = jnp.concatenate([sd, jnp.zeros((Bp - B, N), sd.dtype)], axis=0)
        gx = jnp.concatenate([gx, jnp.zeros((Bp - B, N, _L), _U32)], axis=0)
        gy = jnp.concatenate([gy, jnp.zeros((Bp - B, N, _L), _U32)], axis=0)
    if Np != N:
        # pad digit must sort AFTER every real digit (rows stay sorted) and
        # exceed every searchsorted query; coords are don't-cares
        pad = Np - N
        sd = jnp.concatenate(
            [sd, jnp.full((Bp, pad), 1 << c, sd.dtype)], axis=1)
        gx = jnp.concatenate([gx, jnp.zeros((Bp, pad, _L), _U32)], axis=1)
        gy = jnp.concatenate([gy, jnp.zeros((Bp, pad, _L), _U32)], axis=1)

    # [N, 16, B] limb-major per point-step
    tx = jnp.transpose(gx, (1, 2, 0))
    ty = jnp.transpose(gy, (1, 2, 0))
    tsd = jnp.transpose(sd, (1, 0)).astype(_U32)          # [N, B]

    p_limbs = jnp.asarray(FQ.p_limbs, _U32)[:, None]
    pp = int(FQ.p_prime)
    one_col = jnp.asarray(FQ.r1_limbs, _U32)[:, None]

    grid = (Bp // _BT, Np // _CN)
    kernel = functools.partial(_prefix_kernel, pp=pp)
    spec3 = pl.BlockSpec((_CN, _L, _BT), lambda b, n: (n, 0, b), memory_space=pltpu.VMEM)
    prefix = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_L, 1), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_L, 1), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CN, _BT), lambda b, n: (n, b), memory_space=pltpu.VMEM),
            spec3, spec3,
        ],
        out_specs=(spec3, spec3, spec3),
        out_shape=tuple(jax.ShapeDtypeStruct((Np, _L, Bp), _U32) for _ in range(3)),
        scratch_shapes=[
            pltpu.VMEM((_L, _BT), _U32),
            pltpu.VMEM((_L, _BT), _U32),
            pltpu.VMEM((_L, _BT), _U32),
            pltpu.VMEM((1, _BT), _U32),
        ],
        interpret=_INTERPRET,
    )(p_limbs, one_col, tsd, tx, ty)
    Px, Py, Pz = prefix

    # bucket sums: prefix at each digit-run end (searchsorted right - 1)
    queries = jnp.arange(1, nbuckets + 1, dtype=sd.dtype)
    hi = jax.vmap(lambda row: jnp.searchsorted(row, queries, side="right"))(sd)  # [Bp, nb]
    lo = jax.vmap(lambda row: jnp.searchsorted(row, queries, side="left"))(sd)
    empty = (hi == lo)
    idx = jnp.maximum(hi - 1, 0)                          # [Bp, nb]

    def gather_coord(Pc):
        # Pc [Np, 16, Bp]; take per-lane idx along axis 0
        Pc_l = jnp.transpose(Pc, (2, 0, 1))               # [Bp, Np, 16]
        return jnp.take_along_axis(Pc_l, idx[:, :, None], axis=1)  # [Bp, nb, 16]

    bx = gather_coord(Px)
    by = gather_coord(Py)
    bz = gather_coord(Pz)
    one = F.fq.one(())
    bx = jnp.where(empty[..., None], jnp.zeros_like(bx), bx)
    by = jnp.where(empty[..., None], jnp.broadcast_to(one, by.shape).astype(_U32), by)
    bz = jnp.where(empty[..., None], jnp.zeros_like(bz), bz)

    # weighted reduction, highest bucket first, padded to _CN multiple with
    # LEADING identities (weight extension: sum stays correct because the
    # running accumulator is identity until the first real bucket)
    nbp = -(-nbuckets // _CN) * _CN
    pad = nbp - nbuckets
    bx = jnp.flip(bx, axis=1)
    by = jnp.flip(by, axis=1)
    bz = jnp.flip(bz, axis=1)
    if pad:
        idz = jnp.zeros((Bp, pad, _L), _U32)
        ido = jnp.broadcast_to(one, (Bp, pad, _L)).astype(_U32)
        bx = jnp.concatenate([idz, bx], axis=1)
        by = jnp.concatenate([ido, by], axis=1)
        bz = jnp.concatenate([idz, bz], axis=1)

    wx = jnp.transpose(bx, (1, 2, 0))                     # [nbp, 16, Bp]
    wy = jnp.transpose(by, (1, 2, 0))
    wz = jnp.transpose(bz, (1, 2, 0))

    wkernel = functools.partial(_weighted_kernel, pp=pp)
    out_spec = pl.BlockSpec((_L, _BT), lambda b, n: (0, b), memory_space=pltpu.VMEM)
    totals = pl.pallas_call(
        wkernel,
        grid=(Bp // _BT, nbp // _CN),
        in_specs=[
            pl.BlockSpec((_L, 1), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_L, 1), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            spec3, spec3, spec3,
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((_L, Bp), _U32) for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((_L, _BT), _U32) for _ in range(6)],
        interpret=_INTERPRET,
    )(p_limbs, one_col, wx, wy, wz)

    ox, oy, oz = (jnp.transpose(t, (1, 0))[:B] for t in totals)
    if nseg > 1:
        from spartan_tpu.ops.msm import reduce_points

        seg = tuple(t.reshape(B0, nseg, _L) for t in (ox, oy, oz))
        ox, oy, oz = reduce_points(seg, axis=1)
    return ox, oy, oz
