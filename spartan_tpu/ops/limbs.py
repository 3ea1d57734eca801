"""Limb-decomposed big-integer representation for TPU.

Device layout: a 254-bit BN254 field element is 16 little-endian limbs of
16 bits, stored as ``uint32`` on the last axis — shape ``[..., 16]``.

Why 16x16 and uint32: TPU has no native 64-bit integer multiply, but a
32-bit multiply of two 16-bit limbs is exact, and 16-bit hi/lo halves of
partial products accumulate in uint32 with ~10 bits of headroom. This
replaces arkworks' 4x64-bit Montgomery backend
(/root/reference/src/scalar.rs:4, SURVEY.md section 2.3) with a layout the
VPU can chew through; limb dim 16 maps onto two 8-row sublane tiles.
"""

from __future__ import annotations

import numpy as np

NUM_LIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, num_limbs: int = NUM_LIMBS) -> np.ndarray:
    """Python int -> uint32 limb vector (little-endian 16-bit limbs)."""
    assert 0 <= x < (1 << (num_limbs * LIMB_BITS))
    out = np.empty(num_limbs, dtype=np.uint32)
    for i in range(num_limbs):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    return out


def limbs_to_int(limbs) -> int:
    """uint32 limb vector -> Python int."""
    arr = np.asarray(limbs, dtype=np.uint64)
    x = 0
    for i in range(arr.shape[-1] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(arr[..., i])
    return x


def ints_to_limbs(xs, num_limbs: int = NUM_LIMBS) -> np.ndarray:
    """List of ints -> [N, num_limbs] uint32 array.

    Goes through a packed little-endian byte buffer so the per-element work
    is a single CPython ``int.to_bytes`` call; the limb split is numpy.
    """
    xs = list(xs)
    if not xs:
        return np.zeros((0, num_limbs), dtype=np.uint32)
    nbytes = num_limbs * LIMB_BITS // 8
    buf = b"".join(x.to_bytes(nbytes, "little") for x in xs)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(xs), num_limbs)
    return u16.astype(np.uint32)


def limbs_to_ints(arr) -> list[int]:
    """[N, L] uint32 array -> list of Python ints (via packed bytes)."""
    a = np.ascontiguousarray(np.asarray(arr), dtype=np.uint32)
    if a.ndim == 1:
        a = a[None]
    n, nl = a.shape
    nbytes = nl * LIMB_BITS // 8
    raw = a.astype("<u2").tobytes()
    return [int.from_bytes(raw[i * nbytes: (i + 1) * nbytes], "little") for i in range(n)]
