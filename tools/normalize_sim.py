"""Host simulation of field_jax reduce_sum/_normalize_columns on the exact
column sums from the failing 2^12 case, vs exact bigint arithmetic."""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spartan_tpu.ops.fields_host import FR_MOD
from tools.tpu_sparse_check import host_eq_evals

LIMB_BITS, LIMB_MASK, L = 16, 0xFFFF, 16
MASK32 = 0xFFFFFFFF


def to_limbs(x: int) -> list[int]:
    return [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(L)]


def from_limbs(ls) -> int:
    return sum(v << (LIMB_BITS * i) for i, v in enumerate(ls))


def carry_propagate(s):
    c = 0
    out = []
    for j in range(L):
        t = (s[j] + c) & MASK32          # u32 wrap, as on device
        out.append(t & LIMB_MASK)
        c = t >> LIMB_BITS
    return out, c


def normalize_columns(s, r1_limbs, p):
    def fold_once(limbs, extra):
        fold = [(extra * r) & MASK32 for r in r1_limbs]   # u32 products
        lo = [f & LIMB_MASK for f in fold]
        hi = [f >> LIMB_BITS for f in fold]
        acc = [(limbs[i] + lo[i]) & MASK32 for i in range(L)]
        for i in range(1, L):
            acc[i] = (acc[i] + hi[i - 1]) & MASK32
        top = hi[L - 1]
        out, carry = carry_propagate(acc)
        return out, (carry + top) & MASK32

    limbs, carry = carry_propagate(s)
    for _ in range(8):
        limbs, carry = fold_once(limbs, carry)
    if carry:
        print(f"  WARNING: nonzero final carry {carry}")
    x = from_limbs(limbs)
    nsub = 0
    while x >= p:
        x -= p
        nsub += 1
    if nsub > 2:
        print(f"  WARNING: needed {nsub} cond-subs (device does 2)")
    return x


def main():
    R = 1 << 256
    p = FR_MOD
    r1 = to_limbs(R % p)

    rng = random.Random(0)
    log2 = 12
    n = 1 << log2
    nx, ny = log2, log2 + 1
    rows = [rng.randrange(n) for _ in range(3 * n)]
    cols = [rng.randrange(2 * n) for _ in range(3 * n)]
    vals = [rng.randrange(FR_MOD) for _ in range(3 * n)]
    rx = [rng.randrange(FR_MOD) for _ in range(nx)]
    ry = [rng.randrange(FR_MOD) for _ in range(ny)]
    hx = host_eq_evals(rx, FR_MOD)
    hy = host_eq_evals(ry, FR_MOD)
    # Montgomery-domain products (device arrays hold a*R mod p)
    t_mont = [v * hx[r] % p * hy[c] % p * R % p
              for v, r, c in zip(vals, rows, cols)]

    # column sums as the device computes them: u32 per-limb sums
    cols_sum = [0] * L
    for tm in t_mont:
        ls = to_limbs(tm)
        for i in range(L):
            cols_sum[i] = (cols_sum[i] + ls[i]) & MASK32

    got = normalize_columns(cols_sum, r1, p)
    want = sum(t_mont) % p
    print(f"normalize got  = {got:#x}")
    print(f"exact     want = {want:#x}")
    print("MATCH" if got == want else f"MISMATCH diff={(want - got) % p}")


if __name__ == "__main__":
    main()
