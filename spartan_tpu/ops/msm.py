"""Multi-scalar multiplication on TPU — the framework's hottest kernel.

Every commitment in Spartan funnels through MSM (SURVEY.md section 2, row 2:
``group.rs:143-175`` is "the single most important kernel target"; the derefs
commitment alone is 79.6% of reference prove time). This module implements a
data-parallel Pippenger bucket method with *no scatters*:

  1. split each scalar into W c-bit window digits;
  2. per (row, window): sort point indices by digit (``argsort``), gather;
  3. bucket sums via a *segmented inclusive scan* (``lax.associative_scan``
     with a segment-aware combiner over the complete-addition law) — the
     last element of each equal-digit run is that bucket's sum;
  4. weighted bucket reduction sum_b b*B_b = sum of suffix sums, computed by
     two reverse scans over the bucket axis;
  5. window results combined by a c-doublings-per-step Horner ladder
     (``lax.scan`` so the formulas are traced once, not once per window).

Windows ride a leading batch axis through one jitted kernel, so compile cost
is one trace regardless of W; the host driver chunks (windows x rows) to
bound gather memory. Shared-base row batching (Hyrax commits an L x R matrix
against one generator row, hyrax.rs:253-267) is just more rows in that batch.
Multi-chip sharding partitions the point axis and psums window partials
(see spartan_tpu.parallel.msm_sharded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spartan_tpu.ops import curve_jax as C
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops import scan as SCAN
from spartan_tpu.ops.limbs import LIMB_BITS, NUM_LIMBS
from spartan_tpu.utils.aot_cache import aot_jit

fq = F.fq

_seq_kernel_ok = None


def _use_seq_kernel() -> bool:
    """Sequential Pallas bucket kernel on real TPU; scan path elsewhere."""
    global _seq_kernel_ok
    if _seq_kernel_ok is None:
        import os

        if os.environ.get("SPARTAN_TPU_NO_SEQ_MSM") == "1":
            _seq_kernel_ok = False
        else:
            try:
                _seq_kernel_ok = jax.default_backend() != "cpu"
            except RuntimeError:
                _seq_kernel_ok = False
    return _seq_kernel_ok

# Per-call element budget (#rows x N) for gathered window points. The
# scan path holds ~8 live copies of [rows, N, 3, 16] u32 on device
# (~200 B/element); the sequential Pallas path streams the gathered
# points plus the prefix output (~400 B/element). 2^22 => ~1.6 GB of
# transients per call on the 16 GB chip; the CPU test backend keeps a
# smaller budget purely to bound test-host memory.
import os as _os

_CHUNK_BUDGET = int(_os.environ.get("SPARTAN_TPU_MSM_BUDGET", "0"))


def _chunk_budget() -> int:
    global _CHUNK_BUDGET
    if _CHUNK_BUDGET == 0:
        try:
            _CHUNK_BUDGET = (1 << 22) if jax.default_backend() == "tpu" \
                else (1 << 20)
        except RuntimeError:
            return 1 << 20
    return _CHUNK_BUDGET


@aot_jit(static_argnames=("c", "num_bits"))
def window_digits(scalars, c: int, num_bits: int = 254):
    """[..., 16] canonical limbs -> [..., W] c-bit digits (c <= 16)."""
    W = -(-num_bits // c)
    padded = jnp.concatenate(
        [scalars, jnp.zeros((*scalars.shape[:-1], 1), jnp.uint32)], axis=-1
    )
    outs = []
    for w in range(W):
        lo = c * w
        li, ofs = lo // LIMB_BITS, lo % LIMB_BITS
        word = padded[..., li] | (padded[..., li + 1] << LIMB_BITS)
        outs.append((word >> ofs) & ((1 << c) - 1))
    return jnp.stack(outs, axis=-1)


def _scan_points(pts, reverse: bool = False):
    """Inclusive prefix-sum scan of points along axis 0 (complete adds)."""
    unit = (fq.zeros(()), fq.one(()), fq.zeros(()))
    return SCAN.inclusive_scan(C.padd, pts, unit, reverse=reverse)


def reduce_points(p, axis=0):
    """Tree-reduce an axis of a batched projective point with complete adds."""
    x, y, z = p
    x = jnp.moveaxis(x, axis, 0)
    y = jnp.moveaxis(y, axis, 0)
    z = jnp.moveaxis(z, axis, 0)
    n = x.shape[0]
    while n > 1:
        half = n // 2
        odd = n - 2 * half
        a = (x[:half], y[:half], z[:half])
        b = (x[half: 2 * half], y[half: 2 * half], z[half: 2 * half])
        s = C.padd(a, b)
        if odd:
            x = jnp.concatenate([s[0], x[2 * half:]], axis=0)
            y = jnp.concatenate([s[1], y[2 * half:]], axis=0)
            z = jnp.concatenate([s[2], z[2 * half:]], axis=0)
        else:
            x, y, z = s
        n = half + odd
    return (x[0], y[0], z[0])


@functools.partial(jax.jit, static_argnames=("c",))
def _bucket_windows(points, digits, c: int):
    """Bucket-method partial sums for a batch of digit rows.

    points: (x [N,16], y [N,16], inf [N]) shared across the batch.
    digits: [B, N] uint32 (each row is one (window, msm-row) pair).
    Returns projective point batched [B].

    Bucket sums come from a *plain* prefix scan of the digit-sorted points:
    a bucket's sum is S[end_of_run] - S[end_of_previous_run] (group
    subtraction = add the negated prefix), which avoids segment flags in
    the scan combiner entirely.
    """
    px, py, pinf = points
    nbuckets = (1 << c) - 1  # buckets 1..2^c-1; digit 0 contributes nothing
    order = jnp.argsort(digits, axis=-1)
    sd = jnp.take_along_axis(digits, order, axis=-1)
    gx = px[order]  # [B, N, 16]
    gy = py[order]
    ginf = pinf[order]

    # to projective; zero-digit and infinity points become the identity
    dead = ginf | (sd == 0)
    gz = jnp.where(dead[..., None], fq.zeros(sd.shape), fq.one(sd.shape))
    gx = jnp.where(dead[..., None], fq.zeros(sd.shape), gx)
    gy = jnp.where(dead[..., None], fq.one(sd.shape), gy)

    # prefix scan along N: transpose to [N, B, 16]
    pts_t = tuple(a.swapaxes(0, 1) for a in (gx, gy, gz))
    scanned = _scan_points(pts_t)  # [N, B, 16]
    # prepend identity so index -1 maps to the empty prefix
    ident = (fq.zeros((1, sd.shape[0])), fq.one((1, sd.shape[0])), fq.zeros((1, sd.shape[0])))
    S = tuple(jnp.concatenate([i, s], axis=0) for i, s in zip(ident, scanned))

    # run boundaries per bucket via vmapped binary search
    queries = jnp.arange(1, nbuckets + 1, dtype=digits.dtype)
    hi = jax.vmap(lambda row: jnp.searchsorted(row, queries, side="right"))(sd)  # [B, nb]
    lo = jax.vmap(lambda row: jnp.searchsorted(row, queries, side="left"))(sd)

    def gather_S(idx):  # idx [B, nb] into axis 0 of S (after transpose)
        idx_t = idx.swapaxes(0, 1)  # [nb, B]
        return tuple(jnp.take_along_axis(s, idx_t[..., None], axis=0) for s in S)

    S_hi = gather_S(hi)
    S_lo = gather_S(lo)
    B_pts = C.padd(S_hi, C.pneg(S_lo))  # [nb, B, 16] bucket sums

    # weighted bucket sum: sum_b b*B_b = sum_j suffix_j; suffix then resum
    suffix = _scan_points(B_pts, reverse=True)
    total = _scan_points(suffix, reverse=True)
    return tuple(t[0] for t in total)


def bucket_windows(points, digits, c: int, nseg: int = 1):
    """Kernel-dispatching bucket accumulation: the sequential Pallas
    prefix-with-reset kernel on accelerators, the associative-scan
    formulation on the CPU test backend. Same signature/result as
    ``_bucket_windows`` (digits [B, N] -> projective [B])."""
    if _use_seq_kernel():
        from spartan_tpu.ops.msm_pallas import bucket_windows_seq

        return bucket_windows_seq(points, digits, c, nseg=nseg)
    return _bucket_windows(points, digits, c)


@aot_jit(static_argnames=("c",))
def _horner_windows(window_pts, c: int):
    """Combine window sums (axis 0, most-significant first) by Horner ladder."""
    x, y, z = window_pts
    acc0 = (x[0], y[0], z[0])

    def step(acc, win):
        acc = jax.lax.fori_loop(0, c, lambda _, a: C.pdbl(a), acc)
        acc = C.padd(acc, win)
        return acc, ()

    rest = (x[1:], y[1:], z[1:])
    acc, _ = jax.lax.scan(step, acc0, rest)
    return acc


def default_window(n: int) -> int:
    if n >= 1 << 18:
        return 12
    if n >= 1 << 11:
        return 10
    if n >= 1 << 7:
        return 8
    return 4


def _choose_seq_params(n: int, batch_rows: int) -> tuple[int, int]:
    """(c, nseg) minimizing point-add work for the sequential kernel.

    Work per window-row = n (prefix walk) + 2 * 2^c * nseg (per-segment
    weighted bucket reduction); total = W(c) * batch * that. nseg must be
    large enough that the lane dimension (rows * W * nseg per chunk) fills
    the kernel's lane-block width, but segments shouldn't shrink below
    ~256 points.
    """
    from spartan_tpu.ops.msm_pallas import _BT

    # fill exactly one lane-block: the grid serializes extra blocks, so
    # lanes beyond _BT only multiply bucket-reduction work
    lane_target = _BT
    best = None
    for c in range(7, 14):
        W = -(-254 // c)
        rows_per_call = min(max(1, _chunk_budget() // n), W * batch_rows)
        nseg = 1
        while rows_per_call * nseg < lane_target and (n // nseg) >= 512:
            nseg *= 2
        work = W * (n + 2 * (1 << c) * nseg)
        if best is None or work < best[0]:
            best = (work, c, nseg)
    return best[1], best[2]


@aot_jit
def msm_ladder(points, scalars):
    """Small-N fallback: batched double-and-add ladders + tree reduction.

    Cheaper than bucketing when N is tiny (sigma-protocol MSMs of size 2-5,
    per-round sumcheck commits, bullet tail rounds).
    """
    px, py, pinf = points
    proj = C.from_affine(px, py, pinf)
    prods = C.scalar_mul(scalars, proj)
    return reduce_points(prods, axis=scalars.ndim - 2)


def _ladder_threshold() -> int:
    """Below this size the batched double-and-add ladder wins.

    On CPU (tests, the multichip dry run) the cutoff is higher: the
    bucket path's unrolled associative scan compiles far slower per shape
    than the ladder's one compact fori_loop, and dry-run-size MSMs are
    dominated by compile time. 256 balances that against the ladder's
    254-sequential-step runtime, which at the unoptimized CPU codegen
    level dwarfs the bucket walk above a few hundred points.
    """
    try:
        return 64 if jax.default_backend() == "tpu" else 256
    except RuntimeError:
        return 64


def msm(points, scalars, c: int | None = None):
    """MSM driver. points affine device tuple; scalars [..., N, 16] canonical.

    Returns a projective point with batch shape scalars.shape[:-2]. Chunks
    the (windows x rows) batch on host so gathered point memory stays
    bounded; every chunk reuses one compiled kernel.
    """
    n = scalars.shape[-2]
    batch_shape = scalars.shape[:-2]
    if n <= _ladder_threshold():
        return msm_ladder(points, scalars)
    if c is None:
        from spartan_tpu.config import DEFAULT as _cfg

        c = _cfg.msm_window  # global config override (None = auto)
    B_rows = 1
    for s in batch_shape:
        B_rows *= s
    nseg = 1
    if c is None:
        if _use_seq_kernel():
            c, nseg = _choose_seq_params(n, B_rows)
        else:
            c = default_window(n)
    elif _use_seq_kernel():
        _, nseg = _choose_seq_params(n, B_rows)

    digits = window_digits(scalars, c)  # [..., N, W]
    W = digits.shape[-1]
    B = B_rows
    # [W*B, N]: window-major so same-window rows stay adjacent
    dig = jnp.moveaxis(digits.reshape(B, n, W), -1, 0).reshape(W * B, n)

    total_rows = W * B
    # NOT ceil-balanced: a padded tail call wastes at most one call's walk,
    # while balancing would vary the call shape per workload (each shape
    # is a fresh multi-10s kernel compile through the tunnel)
    rows_per_call = min(max(1, _chunk_budget() // n), total_rows)
    parts = []
    start = 0
    # pad row count so every device call shares one shape/compilation
    while start < total_rows:
        stop = min(start + rows_per_call, total_rows)
        chunk = dig[start:stop]
        if stop - start < rows_per_call:
            pad = rows_per_call - (stop - start)
            chunk = jnp.concatenate([chunk, jnp.zeros((pad, n), jnp.uint32)], axis=0)
        if _use_seq_kernel():
            from spartan_tpu.ops.msm_pallas import bucket_windows_seq

            parts.append(bucket_windows_seq(points, chunk, c, nseg=nseg))
        else:
            parts.append(_bucket_windows(points, chunk, c))
        start = stop
    wx = jnp.concatenate([p[0] for p in parts], axis=0)[:total_rows]
    wy = jnp.concatenate([p[1] for p in parts], axis=0)[:total_rows]
    wz = jnp.concatenate([p[2] for p in parts], axis=0)[:total_rows]
    # [W, B] with window 0 = least significant -> reverse for Horner
    wx = wx.reshape(W, B, NUM_LIMBS)[::-1]
    wy = wy.reshape(W, B, NUM_LIMBS)[::-1]
    wz = wz.reshape(W, B, NUM_LIMBS)[::-1]
    acc = _horner_windows((wx, wy, wz), c)
    return tuple(a.reshape(*batch_shape, NUM_LIMBS) for a in acc)
