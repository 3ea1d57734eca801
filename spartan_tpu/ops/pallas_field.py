"""Pallas TPU kernels for BN254 field + curve arithmetic — the VMEM path.

The XLA elementwise formulation (field_jax.make_ops) roundtrips every
intermediate through HBM and lands ~8x slower than these kernels; measured
on v5e at 2^20 elements: XLA mul 243 ms -> Pallas mul 31 ms. Batched
probes put the v5e VPU at ~260 G u32-mul lane-ops/s and ~116 G
shift/mask ops/s, which makes the ~2.8k-lane-op Montgomery pipeline
ALU-bound at ~30 ns/element — the kernels below sit at that floor.

Layout: limb-major [16, T] inside kernels — batch on lanes (full 128-lane
width), 16-bit limbs on sublanes, window shifts as sublane rolls. Products
use exact u32 16x16->32 multiplies with split lo/hi accumulation (columns
< 2^22 across 16 addends); REDC runs 16 rounds over a sliding 32-row
window. The complete-addition law (RCB Alg 7/9) is fused into single
kernels — 12 Montgomery muls plus the cheap adds all in VMEM, one HBM
roundtrip per coordinate.

Dispatch: ``field_jax`` / ``curve_jax`` swap over to these kernels when the
default backend is TPU (tests force CPU and keep the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spartan_tpu.ops.limbs import LIMB_BITS, LIMB_MASK, NUM_LIMBS

_U32 = jnp.uint32
_TILE = 1024    # lanes (batch elements) per kernel invocation
_L = NUM_LIMBS  # 16
_W = 2 * _L     # 32-row working window


# ---------------------------------------------------------------------------
# in-kernel field blocks (limb-major [16, T])
# ---------------------------------------------------------------------------

def _carry_block(r, nrows=_L):
    """Redundant u32 rows (< 2^31 headroom) -> canonical 16-bit limbs."""
    T = r.shape[1]
    outs = []
    c = jnp.zeros((1, T), _U32)
    for j in range(nrows):
        t = r[j:j + 1, :] + c
        outs.append(t & LIMB_MASK)
        c = t >> LIMB_BITS
    return jnp.concatenate(outs, axis=0), c


def _cond_sub_block(x, p_col):
    """x < 2p canonical -> x mod p (branch-free compare-subtract)."""
    T = x.shape[1]
    douts = []
    borrow = jnp.zeros((1, T), _U32)
    for j in range(_L):
        t = x[j:j + 1, :] + jnp.uint32(1 << LIMB_BITS) - p_col[j:j + 1, :] - borrow
        douts.append(t & LIMB_MASK)
        borrow = jnp.uint32(1) - (t >> LIMB_BITS)
    diff = jnp.concatenate(douts, axis=0)
    return jnp.where(borrow == 0, diff, x)


def _add_block(a, b, p_col):
    s, _ = _carry_block(a + b)
    return _cond_sub_block(s, p_col)


def _sub_block(a, b, p_col):
    """(a + p) - b, all canonical < p."""
    s, _ = _carry_block(a + p_col)  # broadcast add of p, columns < 2^17
    T = a.shape[1]
    douts = []
    borrow = jnp.zeros((1, T), _U32)
    for j in range(_L):
        t = s[j:j + 1, :] + jnp.uint32(1 << LIMB_BITS) - b[j:j + 1, :] - borrow
        douts.append(t & LIMB_MASK)
        borrow = jnp.uint32(1) - (t >> LIMB_BITS)
    d = jnp.concatenate(douts, axis=0)  # a + p - b, < 2p (borrow is 0)
    return _cond_sub_block(d, p_col)


def _mont_mul_cios_block(a, b, p_col, pp, unroll: bool = True):
    """Montgomery product via CIOS (interleaved reduce) on [16, T] blocks.

    Classic Coarsely-Integrated-Operand-Scanning: the working partial sum
    never exceeds 17 rows (16-limb redundant u32 columns + a top word), vs
    the separated product/REDC pipeline's 32-row sliding window — the wide
    rolls and adds on that window are ~2/3 of the measured lane-ops, so
    this form is ~2x cheaper on the VPU. Row bounds: each of 16 iterations
    adds <= 4*(2^16-1) per column, so columns stay < 2^22 (u32-safe) with
    no intermediate carries; m = S[0]*p' mod 2^16 is exact on the
    redundant row because the mask commutes with mod 2^16.

    Inputs: canonical 16-bit limbs (any value < 2^256 works; output
    < 2^254 + p via the final carry + conditional subtract).
    """
    T = a.shape[1]
    z1 = jnp.zeros((1, T), _U32)

    def step(i, S_top, bi):
        S, top = S_top
        prod = a * bi                       # [16,T] exact 16x16->32
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        S = S + lo
        S = S + jnp.concatenate([z1, hi[:_L - 1]], axis=0)
        top = top + hi[_L - 1:_L]
        m = (S[0:1, :] * pp) & LIMB_MASK    # [1,T]
        mp = m * p_col                      # [16,T]
        mlo = mp & LIMB_MASK
        mhi = mp >> LIMB_BITS
        S = S + mlo
        S = S + jnp.concatenate([z1, mhi[:_L - 1]], axis=0)
        top = top + mhi[_L - 1:_L]
        carry = S[0:1, :] >> LIMB_BITS      # S[0] == 0 mod 2^16 now
        S = jnp.concatenate([S[1:2, :] + carry, S[2:, :], top], axis=0)
        return (S, z1)

    state = (jnp.zeros((_L, T), _U32), z1)
    if unroll:
        for i in range(_L):
            state = step(i, state, b[i:i + 1, :])
    else:
        # operand limbs consumed least-significant first via a cyclic roll
        # (dynamic_slice by the loop index has no Pallas TPU lowering)
        def body(i, carry):
            st, bw = carry
            st = step(i, st, bw[0:1, :])
            return (st, pltpu.roll(bw, _L - 1, axis=0))

        state, _ = jax.lax.fori_loop(0, _L, body, (state, b))
    S, _ = state
    # S columns < 2^22 redundant; the final shift folded the last top word
    # back into row 15, and the result < 2p < 2^255 so the carry chain
    # terminates inside 16 limbs
    x, _ = _carry_block(S)
    return _cond_sub_block(x, p_col)


def _mont_mul_block(a, b, p_col, pp, unroll: bool = False):
    """Montgomery product a*b*R^-1 mod p on [16, T] blocks (canonical).

    ``unroll`` replaces the two 16-step fori_loops with straight-line code:
    at narrow tiles (T <= 256, e.g. the sequential MSM kernel's 128-lane
    accumulator) per-iteration loop overhead dwarfs the ~32-vreg step body,
    so unrolling is worth the larger program.

    Default form: CIOS (see _mont_mul_cios_block) — measured ~2x fewer
    VPU lane-ops than the separated product/REDC sliding-window pipeline
    below, which is kept for A/B reference (SPARTAN_TPU_MONT=window).
    """
    import os as __os

    if __os.environ.get("SPARTAN_TPU_MONT", "cios") == "cios":
        return _mont_mul_cios_block(a, b, p_col, pp, unroll=unroll)
    T = a.shape[1]
    row_ge_1_W = jax.lax.broadcasted_iota(jnp.int32, (_W, T), 0) >= 1
    row_lt_top = jax.lax.broadcasted_iota(jnp.int32, (_W, T), 0) < _W - 1
    az = jnp.zeros((_L, T), _U32)
    p_w = jnp.concatenate([p_col, jnp.zeros((_L, 1), _U32)], axis=0)

    def hi_rows(prod16):
        h = prod16 >> LIMB_BITS
        full = jnp.concatenate([h, az], axis=0)
        return jnp.where(row_ge_1_W, pltpu.roll(full, 1, axis=0), 0)

    def prod_step(_, state):
        S, bw = state
        colb = bw[_L - 1:_L, :]
        prod = a * colb  # exact 16x16 -> 32
        lo = jnp.concatenate([prod & LIMB_MASK, az], axis=0)
        S = jnp.where(row_ge_1_W, pltpu.roll(S, 1, axis=0), 0)
        S = S + lo + hi_rows(prod)
        bw = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (_L, T), 0) >= 1,
            pltpu.roll(bw, 1, axis=0), 0)
        return (S, bw)

    def redc_step(_, state):
        e, carry = state
        v = e[0:1, :] + carry
        m = (v * pp) & LIMB_MASK
        mp = m * p_w
        lo = mp & LIMB_MASK
        e = e + lo + hi_rows(mp[:_L, :])
        new_carry = (v + lo[0:1, :]) >> LIMB_BITS
        e_next = jnp.where(row_lt_top, pltpu.roll(e, _W - 1, axis=0), 0)
        return (e_next, new_carry)

    state = (jnp.zeros((_W, T), _U32), b)
    if unroll:
        for _ in range(_L):
            state = prod_step(None, state)
        d = state[0]  # columns < 2^22
        state2 = (d, jnp.zeros((1, T), _U32))
        for _ in range(_L):
            state2 = redc_step(None, state2)
        e, carry = state2
    else:
        d, _ = jax.lax.fori_loop(0, _L, prod_step, state)  # columns < 2^22
        e, carry = jax.lax.fori_loop(
            0, _L, redc_step, (d, jnp.zeros((1, T), _U32)))
    r = e[:_L, :]
    r = jnp.concatenate([r[0:1, :] + carry, r[1:, :]], axis=0)
    x, _ = _carry_block(r)
    return _cond_sub_block(x, p_col)


# ---------------------------------------------------------------------------
# in-kernel complete curve formulas (a = 0, b3 = 9)
# ---------------------------------------------------------------------------

def _mul9_block(a, p_col):
    a2 = _add_block(a, a, p_col)
    a4 = _add_block(a2, a2, p_col)
    a8 = _add_block(a4, a4, p_col)
    return _add_block(a8, a, p_col)


# The curve formulas below come in two shapes:
#
#  * narrow — one Montgomery mul per product, in dependency order. The
#    CIOS pipeline is itself a 16-step dependent chain, so a chain of
#    narrow muls leaves the VPU latency-bound on narrow tiles.
#  * wide — the RCB formulas happen to be TWO rounds of mutually
#    independent products (5-6 muls each for the mixed add);
#    concatenating the operand pairs along the lane axis runs each round
#    as ONE [16, k*T] CIOS pipeline — k-fold shorter dependency chain.
#
# Measured on v5e (tools/padd_bench.py 20): narrow 10.65 M adds/s at
# (BT=512, CN=32, unroll), wide 9.2-10.5 M at every tile tried — the
# lane-axis concatenates are physical vreg shuffles that cost more than
# the latency they hide, i.e. the narrow kernel is already ALU-throughput
# bound, not latency bound. Narrow stays the default; wide is kept as the
# measured A/B reference (SPARTAN_TPU_PADD=wide).
import os as __os

_PADD_WIDE = __os.environ.get("SPARTAN_TPU_PADD", "narrow") == "wide"


def _cat(*xs):
    return jnp.concatenate(xs, axis=1)


def _splitn(r, k):
    T = r.shape[1] // k
    return [r[:, i * T:(i + 1) * T] for i in range(k)]


def _padd_block_wide(X1, Y1, Z1, X2, Y2, Z2, p_col, pp, unroll: bool = False):
    """Complete projective addition, wide-mul form (2 CIOS pipelines)."""
    mul = lambda x, y: _mont_mul_block(x, y, p_col, pp, unroll=unroll)
    add = lambda x, y: _add_block(x, y, p_col)
    sub = lambda x, y: _sub_block(x, y, p_col)

    s = add(_cat(X1, Y1, X1), _cat(Y1, Z1, Z1))      # X1+Y1 | Y1+Z1 | X1+Z1
    u = add(_cat(X2, Y2, X2), _cat(Y2, Z2, Z2))      # X2+Y2 | Y2+Z2 | X2+Z2
    m = mul(_cat(X1, Y1, Z1, s), _cat(X2, Y2, Z2, u))
    t0, t1, t2, sp1, sp2, sp3 = _splitn(m, 6)
    ssum = add(_cat(t0, t1, t0), _cat(t1, t2, t2))   # t0+t1 | t1+t2 | t0+t2
    d = sub(_cat(sp1, sp2, sp3), ssum)
    t3, t4, y3a = _splitn(d, 3)
    nines = _mul9_block(_cat(t2, y3a), p_col)
    t2b3, y3b = _splitn(nines, 2)
    t0_3 = add(add(t0, t0), t0)
    z3a = add(t1, t2b3)
    t1b = sub(t1, t2b3)
    m2 = mul(_cat(t4, t3, y3b, t1b, t0_3, z3a),
             _cat(y3b, t1b, t0_3, z3a, t3, t4))
    a_, bb, c_, d_, e_, f_ = _splitn(m2, 6)
    fin = add(_cat(c_, f_), _cat(d_, e_))
    Y3, Z3 = _splitn(fin, 2)
    X3 = sub(bb, a_)
    return X3, Y3, Z3


def _padd_mixed_block_wide(X1, Y1, Z1, x2, y2, p_col, pp,
                           unroll: bool = False):
    """Complete mixed projective+affine addition, wide-mul form."""
    mul = lambda x, y: _mont_mul_block(x, y, p_col, pp, unroll=unroll)
    add = lambda x, y: _add_block(x, y, p_col)
    sub = lambda x, y: _sub_block(x, y, p_col)

    s = add(_cat(x2, X1), _cat(y2, Y1))              # x2+y2 | X1+Y1
    sxy, sXY = _splitn(s, 2)
    m = mul(_cat(X1, Y1, sxy, y2, x2), _cat(x2, y2, sXY, Z1, Z1))
    t0, t1, sp, u, v = _splitn(m, 5)
    a1 = add(_cat(t0, u, v), _cat(t1, Y1, X1))
    t01, t4, y3 = _splitn(a1, 3)
    t3 = sub(sp, t01)
    nines = _mul9_block(_cat(Z1, y3), p_col)
    t2, y3b = _splitn(nines, 2)
    t0_3 = add(add(t0, t0), t0)
    z3 = add(t1, t2)
    t1b = sub(t1, t2)
    m2 = mul(_cat(t3, t4, t1b, y3b, z3, t0_3),
             _cat(t1b, y3b, z3, t0_3, t4, t3))
    a_, b_, c_, d_, e_, f_ = _splitn(m2, 6)
    fin = add(_cat(c_, e_), _cat(d_, f_))
    Y3, Z3 = _splitn(fin, 2)
    X3 = sub(a_, b_)
    return X3, Y3, Z3


def _pdbl_block_wide(X, Y, Z, p_col, pp):
    """Complete projective doubling, wide-mul form."""
    mul = lambda x, y: _mont_mul_block(x, y, p_col, pp)
    add = lambda x, y: _add_block(x, y, p_col)
    sub = lambda x, y: _sub_block(x, y, p_col)

    m = mul(_cat(Y, Y, Z, X), _cat(Y, Z, Z, Y))
    t0, t1, t2, xy = _splitn(m, 4)
    t0_2 = add(t0, t0)
    t0_4 = add(t0_2, t0_2)
    z3a = add(t0_4, t0_4)
    t2b3 = _mul9_block(t2, p_col)
    y3a = add(t0, t2b3)
    t2b3_3 = add(add(t2b3, t2b3), t2b3)
    t0c = sub(t0, t2b3_3)
    m2 = mul(_cat(t2b3, t1, t0c, t0c), _cat(z3a, z3a, y3a, xy))
    x3a, Z3, y3b, x3b = _splitn(m2, 4)
    Y3 = add(x3a, y3b)
    X3 = add(x3b, x3b)
    return X3, Y3, Z3


def _padd_block_narrow(X1, Y1, Z1, X2, Y2, Z2, p_col, pp, unroll: bool = False):
    """Complete projective addition (RCB 2016 Alg 7, a=0), VMEM-resident."""
    mul = lambda x, y: _mont_mul_block(x, y, p_col, pp, unroll=unroll)
    add = lambda x, y: _add_block(x, y, p_col)
    sub = lambda x, y: _sub_block(x, y, p_col)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(mul(add(X1, Y1), add(X2, Y2)), add(t0, t1))
    t4 = sub(mul(add(Y1, Z1), add(Y2, Z2)), add(t1, t2))
    y3a = sub(mul(add(X1, Z1), add(X2, Z2)), add(t0, t2))
    t2b3 = _mul9_block(t2, p_col)
    y3b = _mul9_block(y3a, p_col)
    t0_3 = add(add(t0, t0), t0)
    z3a = add(t1, t2b3)
    t1b = sub(t1, t2b3)
    a_ = mul(t4, y3b)
    bb = mul(t3, t1b)
    c_ = mul(y3b, t0_3)
    d_ = mul(t1b, z3a)
    e_ = mul(t0_3, t3)
    f_ = mul(z3a, t4)
    X3 = sub(bb, a_)
    Y3 = add(c_, d_)
    Z3 = add(f_, e_)
    return X3, Y3, Z3


def _padd_mixed_block_narrow(X1, Y1, Z1, x2, y2, p_col, pp, unroll: bool = False):
    """Complete MIXED projective+affine addition (RCB 2016 Alg 8, a=0).

    P2 = (x2, y2) affine, P2 != infinity; P1 any projective point including
    the identity (0, 1, 0). 11 Montgomery muls vs the full add's 12, and no
    Z2 stream — the MSM prefix walk adds affine base points, so this is its
    inner step.
    """
    mul = lambda x, y: _mont_mul_block(x, y, p_col, pp, unroll=unroll)
    add = lambda x, y: _add_block(x, y, p_col)
    sub = lambda x, y: _sub_block(x, y, p_col)

    t0 = mul(X1, x2)
    t1 = mul(Y1, y2)
    t3 = sub(mul(add(x2, y2), add(X1, Y1)), add(t0, t1))
    t4 = add(mul(y2, Z1), Y1)
    y3 = add(mul(x2, Z1), X1)
    t0_3 = add(add(t0, t0), t0)
    t2 = _mul9_block(Z1, p_col)
    z3 = add(t1, t2)
    t1b = sub(t1, t2)
    y3b = _mul9_block(y3, p_col)
    X3 = sub(mul(t3, t1b), mul(t4, y3b))
    Y3 = add(mul(t1b, z3), mul(y3b, t0_3))
    Z3 = add(mul(z3, t4), mul(t0_3, t3))
    return X3, Y3, Z3


def _pdbl_block_narrow(X, Y, Z, p_col, pp):
    """Complete projective doubling (RCB 2016 Alg 9, a=0), VMEM-resident."""
    mul = lambda x, y: _mont_mul_block(x, y, p_col, pp)
    add = lambda x, y: _add_block(x, y, p_col)
    sub = lambda x, y: _sub_block(x, y, p_col)

    t0 = mul(Y, Y)
    t1 = mul(Y, Z)
    t2 = mul(Z, Z)
    xy = mul(X, Y)
    t0_2 = add(t0, t0)
    t0_4 = add(t0_2, t0_2)
    z3a = add(t0_4, t0_4)  # 8*t0
    t2b3 = _mul9_block(t2, p_col)
    y3a = add(t0, t2b3)
    t2b3_3 = add(add(t2b3, t2b3), t2b3)
    t0c = sub(t0, t2b3_3)
    x3a = mul(t2b3, z3a)
    Z3 = mul(t1, z3a)
    y3b = mul(t0c, y3a)
    x3b = mul(t0c, xy)
    Y3 = add(x3a, y3b)
    X3 = add(x3b, x3b)
    return X3, Y3, Z3


def _padd_block(X1, Y1, Z1, X2, Y2, Z2, p_col, pp, unroll: bool = False):
    f = _padd_block_wide if _PADD_WIDE else _padd_block_narrow
    return f(X1, Y1, Z1, X2, Y2, Z2, p_col, pp, unroll=unroll)


def _padd_mixed_block(X1, Y1, Z1, x2, y2, p_col, pp, unroll: bool = False):
    f = _padd_mixed_block_wide if _PADD_WIDE else _padd_mixed_block_narrow
    return f(X1, Y1, Z1, x2, y2, p_col, pp, unroll=unroll)


def _pdbl_block(X, Y, Z, p_col, pp):
    f = _pdbl_block_wide if _PADD_WIDE else _pdbl_block_narrow
    return f(X, Y, Z, p_col, pp)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _flatten_pad(arrs, shape):
    flat = []
    for a in arrs:
        af = jnp.broadcast_to(a, shape).reshape(-1, NUM_LIMBS)
        n = af.shape[0]
        npad = (-n) % _TILE
        if npad:
            af = jnp.concatenate(
                [af, jnp.zeros((npad, NUM_LIMBS), _U32)], axis=0)
        flat.append(af.T)  # [16, n_padded]
    return flat, n


def _specs(num_inputs):
    ins = [pl.BlockSpec((_L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    ins += [pl.BlockSpec((_L, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(num_inputs)]
    return ins


def _out_specs(k):
    spec = pl.BlockSpec((_L, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    return spec if k == 1 else tuple(spec for _ in range(k))


def make_field_kernels(spec, interpret: bool = False):
    """Pallas-backed (mul, add, sub) over arbitrary [..., 16] shapes."""
    # numpy, NOT jnp: a device array captured by these closures becomes a
    # jit constant whose value is pulled D2H at every lowering — observed
    # ~40 s per pull through the axon tunnel
    import numpy as _np

    p_limbs = _np.asarray(spec.p_limbs, _np.uint32)
    pp = int(spec.p_prime)

    def mul_kernel(p_ref, a_ref, b_ref, o_ref):
        o_ref[:] = _mont_mul_block(a_ref[:], b_ref[:], p_ref[:], jnp.uint32(pp))

    def add_kernel(p_ref, a_ref, b_ref, o_ref):
        o_ref[:] = _add_block(a_ref[:], b_ref[:], p_ref[:])

    def sub_kernel(p_ref, a_ref, b_ref, o_ref):
        o_ref[:] = _sub_block(a_ref[:], b_ref[:], p_ref[:])

    def binary(kernel):
        def op(a, b):
            shape = jnp.broadcast_shapes(a.shape, b.shape)
            (at, bt), n = _flatten_pad([a, b], shape)
            npad = at.shape[1]
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((_L, npad), _U32),
                grid=(npad // _TILE,),
                in_specs=_specs(2),
                out_specs=_out_specs(1),
                interpret=interpret,
            )(p_limbs[:, None], at, bt)
            return out.T[:n].reshape(shape)

        # jit so the pallas_call body is traced once per shape and every
        # other call site reuses the cached pjit (see field_jax.make_ops)
        return jax.jit(op)

    return binary(mul_kernel), binary(add_kernel), binary(sub_kernel)


def make_curve_kernels(spec, interpret: bool = False):
    """Pallas-backed fused (padd, pdbl) on projective coordinate tuples."""
    import numpy as _np

    p_limbs = _np.asarray(spec.p_limbs, _np.uint32)  # numpy: see make_field_kernels
    pp = int(spec.p_prime)

    def padd_kernel(p_ref, x1, y1, z1, x2, y2, z2, ox, oy, oz):
        X3, Y3, Z3 = _padd_block(x1[:], y1[:], z1[:], x2[:], y2[:], z2[:],
                                 p_ref[:], jnp.uint32(pp))
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3

    def pdbl_kernel(p_ref, x, y, z, ox, oy, oz):
        X3, Y3, Z3 = _pdbl_block(x[:], y[:], z[:], p_ref[:], jnp.uint32(pp))
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3

    def padd(p, q):
        shape = jnp.broadcast_shapes(*(c.shape for c in p), *(c.shape for c in q))
        coords, n = _flatten_pad(list(p) + list(q), shape)
        npad = coords[0].shape[1]
        outs = pl.pallas_call(
            padd_kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((_L, npad), _U32) for _ in range(3)),
            grid=(npad // _TILE,),
            in_specs=_specs(6),
            out_specs=_out_specs(3),
            interpret=interpret,
        )(p_limbs[:, None], *coords)
        return tuple(o.T[:n].reshape(shape) for o in outs)

    def pdbl(p):
        shape = jnp.broadcast_shapes(*(c.shape for c in p))
        coords, n = _flatten_pad(list(p), shape)
        npad = coords[0].shape[1]
        outs = pl.pallas_call(
            pdbl_kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((_L, npad), _U32) for _ in range(3)),
            grid=(npad // _TILE,),
            in_specs=_specs(3),
            out_specs=_out_specs(3),
            interpret=interpret,
        )(p_limbs[:, None], *coords)
        return tuple(o.T[:n].reshape(shape) for o in outs)

    return jax.jit(padd), jax.jit(pdbl)


def make_pallas_mul(spec, interpret: bool = False):
    """Back-compat helper returning just the Montgomery mul."""
    mul, _, _ = make_field_kernels(spec, interpret)
    return mul
