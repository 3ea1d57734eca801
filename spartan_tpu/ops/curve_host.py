"""Exact host-side BN254 G1 arithmetic + arkworks-compatible serialization.

Replaces arkworks ``ark_bn254::G1Projective`` for the control plane (tiny
MSMs in tests, golden values for device-kernel tests, compress/decompress of
proof points). All heavy curve math runs on device via
:mod:`spartan_tpu.ops.curve_jax` / :mod:`spartan_tpu.ops.msm`.

Serialization matches ark-serialize compressed form used throughout the
reference (/root/reference/src/group.rs:135-140, 185-190): 32 bytes =
little-endian x with 2 flag bits in the top of byte 31 — bit 6 set for the
point at infinity (x serialized as 0), bit 7 set when y > (q-1)/2
("negative" y). Decompression recomputes y = sqrt(x^3 + 3) with
q = 3 mod 4 and picks the root matching the flag.
"""

from __future__ import annotations

from spartan_tpu.ops.fields_host import CURVE_B, FQ_MOD, FR_MOD, fq_inv, fq_to_bytes

# A point is (x, y) with ints in Fq, or None for the identity.
Point = tuple[int, int] | None

GEN: Point = (1, 2)

_INF_FLAG = 1 << 6
_NEG_FLAG = 1 << 7


def is_on_curve(p: Point) -> bool:
    if p is None:
        return True
    x, y = p
    return (y * y - (x * x * x + CURVE_B)) % FQ_MOD == 0


def neg(p: Point) -> Point:
    if p is None:
        return None
    return (p[0], (-p[1]) % FQ_MOD)


def add(p: Point, q: Point) -> Point:
    """Affine addition with full special-casing (host/exact path only)."""
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) % FQ_MOD == 0:
            return None
        # doubling
        lam = (3 * x1 * x1) * fq_inv(2 * y1 % FQ_MOD) % FQ_MOD
    else:
        lam = (y2 - y1) * fq_inv((x2 - x1) % FQ_MOD) % FQ_MOD
    x3 = (lam * lam - x1 - x2) % FQ_MOD
    y3 = (lam * (x1 - x3) - y1) % FQ_MOD
    return (x3, y3)


def double(p: Point) -> Point:
    return add(p, p)


def scalar_mul(k: int, p: Point) -> Point:
    k %= FR_MOD
    acc: Point = None
    base = p
    while k:
        if k & 1:
            acc = add(acc, base)
        base = add(base, base)
        k >>= 1
    return acc


def msm(scalars: list[int], points: list[Point]) -> Point:
    """Naive exact MSM (tests / tiny verifier-side sums)."""
    acc: Point = None
    for s, p in zip(scalars, points):
        acc = add(acc, scalar_mul(s, p))
    return acc


# ---------------------------------------------------------------------------
# arkworks-compatible compressed serialization
# ---------------------------------------------------------------------------

def _y_is_negative(y: int) -> bool:
    """arkworks SWFlags convention: negative iff y > -y, i.e. y > (q-1)/2."""
    return y > FQ_MOD - y


def compress(p: Point) -> bytes:
    if p is None:
        out = bytearray(32)
        out[31] |= _INF_FLAG
        return bytes(out)
    x, y = p
    out = bytearray(fq_to_bytes(x))
    if _y_is_negative(y):
        out[31] |= _NEG_FLAG
    return bytes(out)


def fq_sqrt(a: int) -> int | None:
    """Square root in Fq (q = 3 mod 4): a^((q+1)/4); None if non-residue."""
    r = pow(a, (FQ_MOD + 1) // 4, FQ_MOD)
    return r if r * r % FQ_MOD == a % FQ_MOD else None


def decompress(data: bytes) -> Point | None:
    """Inverse of compress. Returns None point for infinity; raises on junk."""
    assert len(data) == 32
    buf = bytearray(data)
    flags = buf[31] & 0xC0
    buf[31] &= 0x3F
    x = int.from_bytes(bytes(buf), "little")
    if flags & _INF_FLAG:
        return None
    if x >= FQ_MOD:
        raise ValueError("x coordinate out of range")
    y2 = (x * x * x + CURVE_B) % FQ_MOD
    y = fq_sqrt(y2)
    if y is None:
        raise ValueError("point not on curve")
    if _y_is_negative(y) != bool(flags & _NEG_FLAG):
        y = FQ_MOD - y
    return (x, y)
