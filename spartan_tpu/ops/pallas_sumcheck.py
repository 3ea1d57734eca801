"""Fused sumcheck round-step Pallas kernels (TPU).

A sumcheck round folds every table by the previous challenge and computes
the next round polynomial's evaluations at {0,2,3} — in the XLA
formulation (core/sumcheck.py) that is ~18 separate field-op kernels per
table, each a pallas_call streaming [n,16] through HBM with its own
[n,16]->[16,n] transpose (field ops cannot fuse across pallas_call
boundaries). Measured on v5e, the per-op form costs ~30 ns/element/op, so
one round at n=2^21 x 12 instances ran ~15 s — the layered sumchecks were
the largest warm prove phase at keyless scale (ops_product_trees 133 s).

These kernels do the WHOLE round in one VMEM pass per table triple:

  * inputs are viewed as quarters [4, n/4, 16]; the top-variable fold
    pairs (i, i+n/2) and the next round's halves (i, i+n/4) are then all
    tile-local: foldL[i] = f(q0[i], q2[i]), foldH[i] = f(q1[i], q3[i]);
  * folds, extrapolations (t=2,3) and the 3-way products run on
    limb-major [16, T] tiles entirely in VMEM (~12 Montgomery muls per
    4 input elements vs ~2 KB of HBM traffic per element before);
  * per-tile eval partial sums are emitted as REDUNDANT u32 columns
    (< T * 2^16, exact) to a tiny [ntiles, 3, 16] output; the wrapper
    normalizes and reduces them exactly mod p — bit-identical to
    fr.reduce_sum over the folded tables.

Reference semantics: sumcheck.rs:89-161 (eval at {0,2,3} trick) and
:195-203 (bound_poly_var_top); the dispatch sites are the k_* kernels in
core/sumcheck.py, which keep the XLA composition on non-TPU backends.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.limbs import NUM_LIMBS
from spartan_tpu.ops.pallas_field import (
    _add_block,
    _mont_mul_block,
    _sub_block,
)

_U32 = jnp.uint32
_L = NUM_LIMBS
_T = int(os.environ.get("SPARTAN_TPU_SUMCHECK_T", "256"))  # lanes per tile
# _lane_sum's exactness needs T * (2^16 - 1) < 2^31 (signed-i32 partial
# sums of u16 limb values); a power of two keeps tiles lane-aligned
# (interpret-mode tests use tiny T, real TPU should use >= 128)
assert 0 < _T <= 32768 and (_T & (_T - 1)) == 0, \
    f"SPARTAN_TPU_SUMCHECK_T={_T}: need a power of two in (0, 32768]"

_INTERPRET = os.environ.get("SPARTAN_TPU_PALLAS_INTERPRET") == "1"

# below this table length the launch overhead beats the fusion win and
# callers are on the host/small paths anyway
MIN_N = 4 * _T


def _import_np():
    import numpy as np

    return np


def _mul(a, b, p, pp):
    return _mont_mul_block(a, b, p, pp, unroll=True)


def _extrap(lo, hi, p):
    """Evals at t=2 and t=3 of the line through (0,lo),(1,hi)."""
    p2 = _sub_block(_add_block(hi, hi, p), lo, p)
    p3 = _sub_block(_add_block(p2, hi, p), lo, p)
    return p2, p3


def _fold_pair(q_lo, q_hi, r, p, pp):
    """q_lo + r * (q_hi - q_lo) on [16, T] tiles (r is [16, 1])."""
    rb = jnp.broadcast_to(r, q_lo.shape)
    return _add_block(q_lo, _mul(rb, _sub_block(q_hi, q_lo, p), p, pp), p)


def _tp(x):
    """[k, T, 16] block -> list of k limb-major [16, T] tiles."""
    return [jnp.transpose(x[i], (1, 0)) for i in range(x.shape[0])]


def _untp(t):
    """[16, T] -> [T, 16]."""
    return jnp.transpose(t, (1, 0))


def _lane_sum(x):
    """[16, T] canonical u16-limb tile -> [16] redundant u32 lane sum.

    Mosaic has no unsigned reductions; values are < 2^16 per lane and
    T <= 512, so the sum fits int32 exactly — reduce signed, cast back.
    """
    return jnp.sum(x.astype(jnp.int32), axis=1).astype(_U32)


def _partial3(e0, e2, e3):
    """Three [16, T] canonical tiles -> [1, 3, 16] redundant lane sums."""
    s = jnp.stack([_lane_sum(e0), _lane_sum(e2), _lane_sum(e3)], axis=0)
    return s[None]


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

def _k_step_prod(p_ref, r_ref, a_ref, b_ref, c_ref,
                 oa_ref, ob_ref, oc_ref, ev_ref, *, pp: int):
    """Fold A,B,C by r; eval triple of the folded product A'*B'*C'."""
    p = p_ref[:]
    r = r_ref[:]
    pp_ = jnp.uint32(pp)
    outs = []
    halves = []
    for ref, oref in ((a_ref, oa_ref), (b_ref, ob_ref), (c_ref, oc_ref)):
        q0, q1, q2, q3 = _tp(ref[:])
        lo = _fold_pair(q0, q2, r, p, pp_)
        hi = _fold_pair(q1, q3, r, p, pp_)
        oref[0] = _untp(lo)
        oref[1] = _untp(hi)
        e2, e3 = _extrap(lo, hi, p)
        halves.append((lo, e2, e3))
        outs.append(oref)
    (aL, a2, a3), (bL, b2, b3), (cL, c2, c3) = halves
    e0 = _mul(_mul(aL, bL, p, pp_), cL, p, pp_)
    e2 = _mul(_mul(a2, b2, p, pp_), c2, p, pp_)
    e3 = _mul(_mul(a3, b3, p, pp_), c3, p, pp_)
    ev_ref[...] = _partial3(e0, e2, e3)


def _k_step_prod_sharedC(p_ref, r_ref, a_ref, b_ref, cf_ref,
                         oa_ref, ob_ref, ev_ref, *, pp: int):
    """Fold A,B by r; eval against an ALREADY-folded shared C (2 halves)."""
    p = p_ref[:]
    r = r_ref[:]
    pp_ = jnp.uint32(pp)
    halves = []
    for ref, oref in ((a_ref, oa_ref), (b_ref, ob_ref)):
        q0, q1, q2, q3 = _tp(ref[:])
        lo = _fold_pair(q0, q2, r, p, pp_)
        hi = _fold_pair(q1, q3, r, p, pp_)
        oref[0] = _untp(lo)
        oref[1] = _untp(hi)
        e2, e3 = _extrap(lo, hi, p)
        halves.append((lo, e2, e3))
    cL, cH = _tp(cf_ref[:])
    c2, c3 = _extrap(cL, cH, p)
    (aL, a2, a3), (bL, b2, b3) = halves
    e0 = _mul(_mul(aL, bL, p, pp_), cL, p, pp_)
    e2 = _mul(_mul(a2, b2, p, pp_), c2, p, pp_)
    e3 = _mul(_mul(a3, b3, p, pp_), c3, p, pp_)
    ev_ref[...] = _partial3(e0, e2, e3)


def _k_step_additive(p_ref, r_ref, t_ref, a_ref, b_ref, c_ref,
                     ot_ref, oa_ref, ob_ref, oc_ref, ev_ref, *, pp: int):
    """Fold T,A,B,C by r; eval triple of T' * (A'*B' - C')."""
    p = p_ref[:]
    r = r_ref[:]
    pp_ = jnp.uint32(pp)
    halves = []
    for ref, oref in ((t_ref, ot_ref), (a_ref, oa_ref),
                      (b_ref, ob_ref), (c_ref, oc_ref)):
        q0, q1, q2, q3 = _tp(ref[:])
        lo = _fold_pair(q0, q2, r, p, pp_)
        hi = _fold_pair(q1, q3, r, p, pp_)
        oref[0] = _untp(lo)
        oref[1] = _untp(hi)
        e2, e3 = _extrap(lo, hi, p)
        halves.append((lo, e2, e3))
    (tL, t2, t3), (aL, a2, a3), (bL, b2, b3), (cL, c2, c3) = halves

    def comb(t, a, b, c):
        return _mul(t, _sub_block(_mul(a, b, p, pp_), c, p), p, pp_)

    ev_ref[...] = _partial3(comb(tL, aL, bL, cL), comb(t2, a2, b2, c2),
                            comb(t3, a3, b3, c3))


def _k_step_quad(p_ref, r_ref, a_ref, b_ref, oa_ref, ob_ref, ev_ref,
                 *, pp: int):
    """Fold A,B by r; evals (e0, e2) of A'*B' (degree-2 rounds)."""
    p = p_ref[:]
    r = r_ref[:]
    pp_ = jnp.uint32(pp)
    halves = []
    for ref, oref in ((a_ref, oa_ref), (b_ref, ob_ref)):
        q0, q1, q2, q3 = _tp(ref[:])
        lo = _fold_pair(q0, q2, r, p, pp_)
        hi = _fold_pair(q1, q3, r, p, pp_)
        oref[0] = _untp(lo)
        oref[1] = _untp(hi)
        e2 = _sub_block(_add_block(hi, hi, p), lo, p)
        halves.append((lo, e2))
    (aL, a2), (bL, b2) = halves
    e0 = _mul(aL, bL, p, pp_)
    e2 = _mul(a2, b2, p, pp_)
    s = jnp.stack([_lane_sum(e0), _lane_sum(e2)], axis=0)
    ev_ref[...] = s[None]


def _k_evals_prod(p_ref, a_ref, b_ref, c_ref, ev_ref, *, pp: int):
    """Eval triple of A*B*C from halves (no fold) — first round."""
    p = p_ref[:]
    pp_ = jnp.uint32(pp)
    halves = []
    for ref in (a_ref, b_ref, c_ref):
        lo, hi = _tp(ref[:])
        e2, e3 = _extrap(lo, hi, p)
        halves.append((lo, e2, e3))
    (aL, a2, a3), (bL, b2, b3), (cL, c2, c3) = halves
    e0 = _mul(_mul(aL, bL, p, pp_), cL, p, pp_)
    e2 = _mul(_mul(a2, b2, p, pp_), c2, p, pp_)
    e3 = _mul(_mul(a3, b3, p, pp_), c3, p, pp_)
    ev_ref[...] = _partial3(e0, e2, e3)


def _k_evals_additive(p_ref, t_ref, a_ref, b_ref, c_ref, ev_ref, *, pp: int):
    p = p_ref[:]
    pp_ = jnp.uint32(pp)
    halves = []
    for ref in (t_ref, a_ref, b_ref, c_ref):
        lo, hi = _tp(ref[:])
        e2, e3 = _extrap(lo, hi, p)
        halves.append((lo, e2, e3))
    (tL, t2, t3), (aL, a2, a3), (bL, b2, b3), (cL, c2, c3) = halves

    def comb(t, a, b, c):
        return _mul(t, _sub_block(_mul(a, b, p, pp_), c, p), p, pp_)

    ev_ref[...] = _partial3(comb(tL, aL, bL, cL), comb(t2, a2, b2, c2),
                            comb(t3, a3, b3, c3))


def _k_evals_quad(p_ref, a_ref, b_ref, ev_ref, *, pp: int):
    p = p_ref[:]
    pp_ = jnp.uint32(pp)
    halves = []
    for ref in (a_ref, b_ref):
        lo, hi = _tp(ref[:])
        e2 = _sub_block(_add_block(hi, hi, p), lo, p)
        halves.append((lo, e2))
    (aL, a2), (bL, b2) = halves
    e0 = _mul(aL, bL, p, pp_)
    e2 = _mul(a2, b2, p, pp_)
    s = jnp.stack([_lane_sum(e0), _lane_sum(e2)], axis=0)
    ev_ref[...] = s[None]


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _pconsts():
    np = _import_np()
    FQ = F.FR
    return (np.asarray(FQ.p_limbs, np.uint32)[:, None], int(FQ.p_prime))


def _pad4(x, q_pad: int):
    """[n,16] -> [4, q_pad, 16] quarter view, zero-padded per quarter."""
    n = x.shape[0]
    q = n // 4
    x4 = x.reshape(4, q, _L)
    if q_pad != q:
        x4 = jnp.concatenate(
            [x4, jnp.zeros((4, q_pad - q, _L), _U32)], axis=1)
    return x4


def _pad2(x, h_pad: int):
    n = x.shape[0]
    h = n // 2
    x2 = x.reshape(2, h, _L)
    if h_pad != h:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((2, h_pad - h, _L), _U32)], axis=1)
    return x2


def _unfold(y, half: int):
    """[2, h_pad, 16] -> [2*half, 16] natural folded table.

    Unpadded (the big power-of-two layers) this is a pure reshape — no
    copy, which matters at keyless scale: an extra materialized copy of
    every folded table per round tipped the 16 GB chip into
    RESOURCE_EXHAUSTED."""
    if y.shape[1] == half:
        return y.reshape(2 * half, _L)
    return y[:, :half].reshape(2 * half, _L)


def _reduce_partials(ev):
    """[ntiles, k, 16] redundant u32 -> [k, 16] canonical (exact mod p)."""
    canon = F.fr.normalize_columns(ev)
    return F.fr.reduce_sum(canon, axis=0)


def _spec_in4(tiles):
    return pl.BlockSpec((4, _T, _L), lambda t: (0, t, 0),
                        memory_space=pltpu.VMEM)


_SPEC_P = pl.BlockSpec((_L, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
_SPEC_Q4 = pl.BlockSpec((4, _T, _L), lambda t: (0, t, 0),
                        memory_space=pltpu.VMEM)
_SPEC_H2 = pl.BlockSpec((2, _T, _L), lambda t: (0, t, 0),
                        memory_space=pltpu.VMEM)


def _ev_spec(k):
    return pl.BlockSpec((1, k, _L), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)


def _grid_q(n):
    q = n // 4
    q_pad = -(-q // _T) * _T
    return q, q_pad, q_pad // _T


def step_cubic_prod(A, B, C, r):
    """(A,B,C [n,16], r [16]) -> (A',B',C' [n/2,16], ev [3,16])."""
    n = A.shape[0]
    q, q_pad, ntiles = _grid_q(n)
    p_limbs, pp = _pconsts()
    kern = functools.partial(_k_step_prod, pp=pp)
    out_h = tuple(jax.ShapeDtypeStruct((2, q_pad, _L), _U32) for _ in range(3))
    oa, ob, oc, ev = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[_SPEC_P, _SPEC_P, _SPEC_Q4, _SPEC_Q4, _SPEC_Q4],
        out_specs=(_SPEC_H2, _SPEC_H2, _SPEC_H2, _ev_spec(3)),
        out_shape=out_h + (jax.ShapeDtypeStruct((ntiles, 3, _L), _U32),),
        interpret=_INTERPRET,
    )(p_limbs, r[:, None], _pad4(A, q_pad), _pad4(B, q_pad), _pad4(C, q_pad))
    return (_unfold(oa, q), _unfold(ob, q), _unfold(oc, q),
            _reduce_partials(ev))


def step_cubic_prod_sharedC(A, B, Cf, r):
    """Fold A,B; eval vs already-folded C (Cf [n/2,16])."""
    n = A.shape[0]
    q, q_pad, ntiles = _grid_q(n)
    p_limbs, pp = _pconsts()
    kern = functools.partial(_k_step_prod_sharedC, pp=pp)
    out_h = tuple(jax.ShapeDtypeStruct((2, q_pad, _L), _U32) for _ in range(2))
    oa, ob, ev = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[_SPEC_P, _SPEC_P, _SPEC_Q4, _SPEC_Q4, _SPEC_H2],
        out_specs=(_SPEC_H2, _SPEC_H2, _ev_spec(3)),
        out_shape=out_h + (jax.ShapeDtypeStruct((ntiles, 3, _L), _U32),),
        interpret=_INTERPRET,
    )(p_limbs, r[:, None], _pad4(A, q_pad), _pad4(B, q_pad),
      _pad2(Cf, q_pad))
    return _unfold(oa, q), _unfold(ob, q), _reduce_partials(ev)


def step_cubic_additive(T_, A, B, C, r):
    n = A.shape[0]
    q, q_pad, ntiles = _grid_q(n)
    p_limbs, pp = _pconsts()
    kern = functools.partial(_k_step_additive, pp=pp)
    out_h = tuple(jax.ShapeDtypeStruct((2, q_pad, _L), _U32) for _ in range(4))
    ot, oa, ob, oc, ev = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[_SPEC_P, _SPEC_P, _SPEC_Q4, _SPEC_Q4, _SPEC_Q4, _SPEC_Q4],
        out_specs=(_SPEC_H2, _SPEC_H2, _SPEC_H2, _SPEC_H2, _ev_spec(3)),
        out_shape=out_h + (jax.ShapeDtypeStruct((ntiles, 3, _L), _U32),),
        interpret=_INTERPRET,
    )(p_limbs, r[:, None], _pad4(T_, q_pad), _pad4(A, q_pad),
      _pad4(B, q_pad), _pad4(C, q_pad))
    return (_unfold(ot, q), _unfold(oa, q), _unfold(ob, q), _unfold(oc, q),
            _reduce_partials(ev))


def step_quad(A, B, r):
    n = A.shape[0]
    q, q_pad, ntiles = _grid_q(n)
    p_limbs, pp = _pconsts()
    kern = functools.partial(_k_step_quad, pp=pp)
    out_h = tuple(jax.ShapeDtypeStruct((2, q_pad, _L), _U32) for _ in range(2))
    oa, ob, ev = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[_SPEC_P, _SPEC_P, _SPEC_Q4, _SPEC_Q4],
        out_specs=(_SPEC_H2, _SPEC_H2, _ev_spec(2)),
        out_shape=out_h + (jax.ShapeDtypeStruct((ntiles, 2, _L), _U32),),
        interpret=_INTERPRET,
    )(p_limbs, r[:, None], _pad4(A, q_pad), _pad4(B, q_pad))
    return _unfold(oa, q), _unfold(ob, q), _reduce_partials(ev)


def _grid_h(n):
    h = n // 2
    h_pad = -(-h // _T) * _T
    return h, h_pad, h_pad // _T


def evals_cubic_prod(A, B, C):
    n = A.shape[0]
    h, h_pad, ntiles = _grid_h(n)
    p_limbs, pp = _pconsts()
    kern = functools.partial(_k_evals_prod, pp=pp)
    ev = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[_SPEC_P, _SPEC_H2, _SPEC_H2, _SPEC_H2],
        out_specs=_ev_spec(3),
        out_shape=jax.ShapeDtypeStruct((ntiles, 3, _L), _U32),
        interpret=_INTERPRET,
    )(p_limbs, _pad2(A, h_pad), _pad2(B, h_pad), _pad2(C, h_pad))
    return _reduce_partials(ev)


def evals_cubic_additive(T_, A, B, C):
    n = A.shape[0]
    h, h_pad, ntiles = _grid_h(n)
    p_limbs, pp = _pconsts()
    kern = functools.partial(_k_evals_additive, pp=pp)
    ev = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[_SPEC_P, _SPEC_H2, _SPEC_H2, _SPEC_H2, _SPEC_H2],
        out_specs=_ev_spec(3),
        out_shape=jax.ShapeDtypeStruct((ntiles, 3, _L), _U32),
        interpret=_INTERPRET,
    )(p_limbs, _pad2(T_, h_pad), _pad2(A, h_pad), _pad2(B, h_pad),
      _pad2(C, h_pad))
    return _reduce_partials(ev)


def evals_quad(A, B):
    n = A.shape[0]
    h, h_pad, ntiles = _grid_h(n)
    p_limbs, pp = _pconsts()
    kern = functools.partial(_k_evals_quad, pp=pp)
    ev = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[_SPEC_P, _SPEC_H2, _SPEC_H2],
        out_specs=_ev_spec(2),
        out_shape=jax.ShapeDtypeStruct((ntiles, 2, _L), _U32),
        interpret=_INTERPRET,
    )(p_limbs, _pad2(A, h_pad), _pad2(B, h_pad))
    return _reduce_partials(ev)


# ---------------------------------------------------------------------------
# limb-major (LM) round kernels — the compact-layout redesign
# ---------------------------------------------------------------------------
#
# The quarter-view kernels above take [.., 16]-minor operands; XLA feeds a
# pallas custom call with default-layout copies, and a 16-wide minor dim
# pads to the 128-lane tile — an 8x HBM blowup per operand that OOMed the
# 16 GB chip at n=2^21 (and made the "fused" path SLOWER than the per-op
# XLA composition at 2^18-2^19).  The LM representation fixes the layout
# at the source, exploiting the bit-reversal identity the fused tail
# driver already uses (core/sumcheck_fused.py):
#
#   * a length-n table rides as a PAIR array P [2, 16, h] (h = n/2):
#     P[0,:,j] = T[bitrev(2j)] (the natural lo-half element of fold pair
#     j) and P[1,:,j] = T[bitrev(2j+1)] (its hi partner).  Both the round
#     evaluations (extrapolate lo/hi to t=2,3, multiply, lane-sum) and
#     the fold (lo + r*(hi-lo)) are then PURE ELEMENTWISE ops on [16, T]
#     tiles — no transposes, no quarter gathers, minor dim = positions,
#     fully compact in HBM and VMEM.
#   * the fold output f [16, h] is the bitrev-order folded table; the
#     next round's pair split (f[:, 0::2], f[:, 1::2]) is one XLA
#     strided-slice pass between kernels — the only non-elementwise step.
#
# HBM per fused round step: read n + write n/2 + split n/2 -> ~2.5 n/2
# element-visits, vs ~18 per-op passes (XLA composition) or compact-size
# x8 padded copies (quarter kernels).

_SPEC_PAIR = pl.BlockSpec((2, _L, _T), lambda t: (0, 0, t),
                          memory_space=pltpu.VMEM)
_SPEC_FLAT = pl.BlockSpec((_L, _T), lambda t: (0, t),
                          memory_space=pltpu.VMEM)
_SPEC_P1 = pl.BlockSpec((_L, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _bitrev_np(n: int):
    np = _import_np()
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def lm_prep(tables):
    """Natural [n, 16] tables -> list of LM pair arrays [2, 16, n/2]."""
    n = int(tables[0].shape[0])
    rev = _bitrev_np(n)
    e_idx = jnp.asarray(rev[0::2])
    o_idx = jnp.asarray(rev[1::2])
    return [jnp.stack([t[e_idx].T, t[o_idx].T], axis=0) for t in tables]


def lm_unprep(P):
    """LM pair [2, 16, h] -> natural [n, 16] table."""
    h = int(P.shape[2])
    n = 2 * h
    tilde = jnp.stack([P[0], P[1]], axis=2).reshape(_L, n)  # bitrev order
    rev = jnp.asarray(_bitrev_np(n))
    return tilde[:, rev].T


def lm_first(P):
    """Montgomery limbs of the natural index-0 value (bitrev(0) = 0)."""
    return P[0, :, 0]


def _pair_split(f):
    """[16, h] bitrev folded table -> next round's pair [2, 16, h/2]."""
    return jnp.stack([f[:, 0::2], f[:, 1::2]], axis=0)


def _lm_grid(h: int):
    h_pad = -(-h // _T) * _T
    return h_pad, h_pad // _T


def _pad_pair(P, h_pad: int):
    if int(P.shape[2]) != h_pad:
        P = jnp.concatenate(
            [P, jnp.zeros((2, _L, h_pad - int(P.shape[2])), _U32)], axis=2)
    return P


def _k_lm_fold(p_ref, r_ref, *refs, nt: int, pp: int):
    """Fold nt pair blocks by r: out[i] = E_i + r * (O_i - E_i)."""
    p = p_ref[:]
    r = r_ref[:]
    pp_ = jnp.uint32(pp)
    for i in range(nt):
        blk = refs[i][:]
        refs[nt + i][:] = _fold_pair(blk[0], blk[1], r, p, pp_)


def _k_lm_evals_additive(p_ref, t_ref, a_ref, b_ref, c_ref, ev_ref, *, pp: int):
    p = p_ref[:]
    pp_ = jnp.uint32(pp)
    halves = []
    for ref in (t_ref, a_ref, b_ref, c_ref):
        blk = ref[:]
        lo, hi = blk[0], blk[1]
        e2, e3 = _extrap(lo, hi, p)
        halves.append((lo, e2, e3))
    (tL, t2, t3), (aL, a2, a3), (bL, b2, b3), (cL, c2, c3) = halves

    def comb(t, a, b, c):
        return _mul(t, _sub_block(_mul(a, b, p, pp_), c, p), p, pp_)

    ev_ref[...] = _partial3(comb(tL, aL, bL, cL), comb(t2, a2, b2, c2),
                            comb(t3, a3, b3, c3))


def _k_lm_evals_prod(p_ref, a_ref, b_ref, c_ref, ev_ref, *, pp: int):
    p = p_ref[:]
    pp_ = jnp.uint32(pp)
    halves = []
    for ref in (a_ref, b_ref, c_ref):
        blk = ref[:]
        lo, hi = blk[0], blk[1]
        e2, e3 = _extrap(lo, hi, p)
        halves.append((lo, e2, e3))
    (aL, a2, a3), (bL, b2, b3), (cL, c2, c3) = halves
    e0 = _mul(_mul(aL, bL, p, pp_), cL, p, pp_)
    e2 = _mul(_mul(a2, b2, p, pp_), c2, p, pp_)
    e3 = _mul(_mul(a3, b3, p, pp_), c3, p, pp_)
    ev_ref[...] = _partial3(e0, e2, e3)


def _k_lm_evals_quad(p_ref, a_ref, b_ref, ev_ref, *, pp: int):
    p = p_ref[:]
    pp_ = jnp.uint32(pp)
    halves = []
    for ref in (a_ref, b_ref):
        blk = ref[:]
        lo, hi = blk[0], blk[1]
        e2 = _sub_block(_add_block(hi, hi, p), lo, p)
        halves.append((lo, e2))
    (aL, a2), (bL, b2) = halves
    e0 = _mul(aL, bL, p, pp_)
    e2 = _mul(a2, b2, p, pp_)
    s = jnp.stack([_lane_sum(e0), _lane_sum(e2)], axis=0)
    ev_ref[...] = s[None]


def lm_fold_pairs(pairs, r):
    """Fold every pair table by r -> list of next pairs [2, 16, h/2].

    One pallas dispatch for the folds, then the XLA pair split."""
    nt = len(pairs)
    h = int(pairs[0].shape[2])
    h_pad, ntiles = _lm_grid(h)
    p_limbs, pp = _pconsts()
    kern = functools.partial(_k_lm_fold, nt=nt, pp=pp)
    fouts = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[_SPEC_P1, _SPEC_P1] + [_SPEC_PAIR] * nt,
        out_specs=tuple(_SPEC_FLAT for _ in range(nt)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((_L, h_pad), _U32) for _ in range(nt)),
        interpret=_INTERPRET,
    )(p_limbs, r[:, None], *[_pad_pair(P, h_pad) for P in pairs])
    return [_pair_split(f[:, :h]) for f in fouts]


def _lm_evals_call(kernel, pairs, k_out: int):
    h = int(pairs[0].shape[2])
    h_pad, ntiles = _lm_grid(h)
    p_limbs, pp = _pconsts()
    kern = functools.partial(kernel, pp=pp)
    ev = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[_SPEC_P1] + [_SPEC_PAIR] * len(pairs),
        out_specs=_ev_spec(k_out),
        out_shape=jax.ShapeDtypeStruct((ntiles, k_out, _L), _U32),
        interpret=_INTERPRET,
    )(p_limbs, *[_pad_pair(P, h_pad) for P in pairs])
    return _reduce_partials(ev)


def lm_evals_additive(Pt, Pa, Pb, Pc):
    return _lm_evals_call(_k_lm_evals_additive, [Pt, Pa, Pb, Pc], 3)


def lm_evals_prod(Pa, Pb, Pc):
    return _lm_evals_call(_k_lm_evals_prod, [Pa, Pb, Pc], 3)


def lm_evals_quad(Pa, Pb):
    return _lm_evals_call(_k_lm_evals_quad, [Pa, Pb], 2)


def lm_step_additive(Pt, Pa, Pb, Pc, r):
    """Fold all 4 pairs by r, then next-round eval triple — one dispatch
    group (fold pallas + XLA splits + evals pallas)."""
    Pt, Pa, Pb, Pc = lm_fold_pairs([Pt, Pa, Pb, Pc], r)
    return Pt, Pa, Pb, Pc, lm_evals_additive(Pt, Pa, Pb, Pc)


def lm_step_prod(Pa, Pb, Pc, r):
    Pa, Pb, Pc = lm_fold_pairs([Pa, Pb, Pc], r)
    return Pa, Pb, Pc, lm_evals_prod(Pa, Pb, Pc)


def lm_step_prod_sharedC(Pa, Pb, Pcf, r):
    """Fold A, B by r; eval against the ALREADY-folded shared C pair."""
    Pa, Pb = lm_fold_pairs([Pa, Pb], r)
    return Pa, Pb, lm_evals_prod(Pa, Pb, Pcf)


def lm_step_quad(Pa, Pb, r):
    Pa, Pb = lm_fold_pairs([Pa, Pb], r)
    return Pa, Pb, lm_evals_quad(Pa, Pb)
