"""Batched BN254 G1 arithmetic on TPU.

Points live in homogeneous projective coordinates (X:Y:Z) over Fq, each
coordinate a ``[..., 16]`` uint32 Montgomery limb array; identity is
(0:1:0). We use the Renes–Costello–Batina *complete* addition law for
a = 0 short-Weierstrass curves (12M + 2 mul-by-3b), so one branch-free
formula covers generic adds, doublings, negatives, and the identity —
exactly what a SIMD/VPU pipeline wants. A dedicated doubling (Alg. 9)
is used inside scalar ladders where the case split is static.

This file is the TPU-native replacement for the arkworks group backend
consumed at /root/reference/src/group.rs:143-175 and the operator impls
at group.rs:208-262.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.fields_host import FQ_MOD
from spartan_tpu.ops.limbs import LIMB_BITS, NUM_LIMBS

fq = F.fq

# b3 = 3*b = 9 for BN254 (y^2 = x^3 + 3)
_B3 = 9


def _mul_b3(a):
    # 9a = 8a + a: three doublings + one add (cheap vs full field mul)
    a2 = fq.add(a, a)
    a4 = fq.add(a2, a2)
    a8 = fq.add(a4, a4)
    return fq.add(a8, a)


def identity(batch_shape=()):
    return (fq.zeros(batch_shape), fq.one(batch_shape), fq.zeros(batch_shape))


def from_affine(x, y, inf_mask=None):
    """Affine limb coords (Montgomery) -> projective; inf_mask selects identity."""
    z = fq.one(x.shape[:-1])
    if inf_mask is not None:
        m = inf_mask[..., None]
        x = jnp.where(m, jnp.zeros_like(x), x)
        y = jnp.where(m, fq.one(y.shape[:-1]), y)
        z = jnp.where(m, jnp.zeros_like(z), z)
    return (x, y, z)


def _stack6(*xs):
    shape = jnp.broadcast_shapes(*(x.shape for x in xs))
    return jnp.stack([jnp.broadcast_to(x, shape) for x in xs], axis=0)


def padd(p, q):
    """Complete projective addition — dispatches to the fused Pallas kernel
    on TPU (enable_pallas) or the XLA formulation below."""
    return _padd_impl(p, q)


def pdbl(p):
    """Complete projective doubling — dispatching wrapper like ``padd``."""
    return _pdbl_impl(p)


_PALLAS_ON = False


def enable_pallas(on: bool = True) -> None:
    """Swap padd/pdbl to the fused VMEM kernels (~30x over XLA at 2^20)."""
    global _padd_impl, _pdbl_impl, _PALLAS_ON
    if on and not _PALLAS_ON:
        from spartan_tpu.ops.pallas_field import make_curve_kernels

        _padd_impl, _pdbl_impl = make_curve_kernels(F.FQ)
        _PALLAS_ON = True
    elif not on and _PALLAS_ON:
        _padd_impl, _pdbl_impl = _padd_xla, _pdbl_xla
        _PALLAS_ON = False


def _padd_xla(p, q):
    """Complete projective addition (RCB 2016, Algorithm 7, a=0).

    Restructured into two *batched* field multiplications of 6 independent
    products each (the formula's dataflow has exactly two mul layers), so
    the traced graph contains 2 mul bodies instead of 12 — compile-friendly
    for the MSM scans that inline this combiner many times.
    """
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    add, sub, mul = fq.add, fq.sub, fq.mul

    # layer-1 pre-sums, batched: [6, ...]
    s = add(
        _stack6(X1, X2, Y1, Y2, X1, X2),
        _stack6(Y1, Y2, Z1, Z2, Z1, Z2),
    )
    # layer-1 products, batched
    m = mul(
        _stack6(X1, Y1, Z1, s[0], s[2], s[4]),
        _stack6(X2, Y2, Z2, s[1], s[3], s[5]),
    )
    t0, t1, t2, m01, m12, m02 = (m[i] for i in range(6))

    # cross terms: t3 = (X1+Y1)(X2+Y2) - t0 - t1, etc., batched [3, ...]
    pair = add(jnp.stack([t0, t1, t0]), jnp.stack([t1, t2, t2]))
    cross = sub(jnp.stack([m01, m12, m02]), pair)
    t3, t4, y3a = cross[0], cross[1], cross[2]

    # b3 multiples (9*t2, 9*y3a) via one batched add-chain: 9v = 8v + v
    v = jnp.stack([t2, y3a])
    v2 = add(v, v)
    v4 = add(v2, v2)
    v8 = add(v4, v4)
    v9 = add(v8, v)
    t2b3, y3b = v9[0], v9[1]

    t0_3 = add(add(t0, t0), t0)          # 3*t0
    z3a = add(t1, t2b3)
    t1b = sub(t1, t2b3)

    # layer-2 products, batched
    m2 = mul(
        _stack6(t4, t3, y3b, t1b, t0_3, z3a),
        _stack6(y3b, t1b, t0_3, z3a, t3, t4),
    )
    a_, bb, c_, d_, e_, f_ = (m2[i] for i in range(6))
    X3 = sub(bb, a_)
    yz = add(jnp.stack([c_, f_]), jnp.stack([d_, e_]))
    return (X3, yz[0], yz[1])


def _pdbl_xla(p):
    """Complete projective doubling (RCB 2016, Algorithm 9, a=0).

    Same layer-batching as ``padd``: two batched muls of 4 products each.
    """
    X, Y, Z = p
    add, sub, mul = fq.add, fq.sub, fq.mul

    m = mul(jnp.stack([Y, Y, Z, X]), jnp.stack([Y, Z, Z, Y]))
    t0, t1, t2, xy = m[0], m[1], m[2], m[3]

    # doubling chains: 8*t0 and 9*t2, batched
    v = jnp.stack([t0, t2])
    v2 = add(v, v)
    v4 = add(v2, v2)
    v8 = add(v4, v4)
    z3a = v8[0]                      # 8*t0
    t2b3 = add(v8[1], t2)            # 9*t2
    y3a = add(t0, t2b3)
    t2b3_3 = add(add(t2b3, t2b3), t2b3)
    t0c = sub(t0, t2b3_3)

    m2 = mul(
        jnp.stack([t2b3, t1, t0c, t0c]),
        jnp.stack([z3a, z3a, y3a, xy]),
    )
    x3a, Z3, y3b, x3b = m2[0], m2[1], m2[2], m2[3]
    Y3 = add(x3a, y3b)
    X3 = add(x3b, x3b)
    return (X3, Y3, Z3)


_padd_impl = _padd_xla
_pdbl_impl = _pdbl_xla


def pneg(p):
    X, Y, Z = p
    return (X, fq.neg(Y), Z)


def pselect(mask, p, q):
    """Per-point select: mask [...] bool -> p where true else q."""
    m = mask[..., None]
    return tuple(jnp.where(m, a, b) for a, b in zip(p, q))


def is_identity(p):
    return fq.is_zero(p[2])


def points_equal(p, q):
    """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1 (or both inf)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    both_inf = fq.is_zero(Z1) & fq.is_zero(Z2)
    one_inf = fq.is_zero(Z1) ^ fq.is_zero(Z2)
    xeq = fq.eq(fq.mul(X1, Z2), fq.mul(X2, Z1))
    yeq = fq.eq(fq.mul(Y1, Z2), fq.mul(Y2, Z1))
    return both_inf | (~one_inf & xeq & yeq)


@jax.jit
def batch_normalize(p):
    """Projective -> (x_affine, y_affine, inf_mask), batch-inverting Z along axis 0."""
    X, Y, Z = p
    zinv = fq.batch_inverse(Z)  # zeros stay zero
    x = fq.mul(X, zinv)
    y = fq.mul(Y, zinv)
    inf = fq.is_zero(Z)
    y = jnp.where(inf[..., None], fq.one(y.shape[:-1]), y)  # canonical (0,1) for inf
    return x, y, inf


@functools.partial(jax.jit, static_argnames=("num_bits",))
def scalar_mul(scalars_canon, p, num_bits: int = 254):
    """Batched double-and-add: scalars [.,16] canonical limbs, points batched.

    MSB-first ladder; ~254 complete doublings + adds under lax.fori_loop.
    """
    def bit_at(i):
        limb = scalars_canon[..., i // LIMB_BITS]
        return (limb >> (i % LIMB_BITS)) & 1

    def body(j, acc):
        i = num_bits - 1 - j
        acc = pdbl(acc)
        added = padd(acc, p)
        take = bit_at(i) == 1
        return pselect(take, added, acc)

    acc0 = identity(scalars_canon.shape[:-1])
    return jax.lax.fori_loop(0, num_bits, body, acc0)


# Auto-select the kernel backend (mirrors field_jax.auto_enable_pallas).
if F._PALLAS_ON:
    enable_pallas(True)


# -- host <-> device point conversion ----------------------------------------

def encode_points(points) -> tuple:
    """List of host affine points ((x,y) or None) -> projective device arrays."""
    xs, ys, infs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            infs.append(True)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            infs.append(False)
    x = F.encode_fq(xs)
    y = F.encode_fq(ys)
    inf = jnp.asarray(infs, dtype=bool)
    z = jnp.where(inf[..., None], fq.zeros((len(points),)), fq.one((len(points),)))
    x = jnp.where(inf[..., None], fq.zeros((len(points),)), x)
    return (x, y, z)


def encode_points_affine(points) -> tuple:
    """List of host affine points -> (x, y, inf_mask) device tuple.

    The affine-with-mask form MSM/commitment kernels consume (projective
    ``encode_points`` is for ladders that start from (X:Y:Z)).
    """
    xs, ys, infs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            infs.append(True)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            infs.append(False)
    return (F.encode_fq(xs), F.encode_fq(ys), jnp.asarray(infs, dtype=bool))


def decode_points(p) -> list:
    """Projective device arrays -> list of host affine points ((x,y) or None)."""
    x, y, inf = batch_normalize(p)
    xs = F.decode_fq(x)
    ys = F.decode_fq(y)
    infs = jax.device_get(inf)
    return [None if i else (px % FQ_MOD, py % FQ_MOD) for px, py, i in zip(xs, ys, infs)]
