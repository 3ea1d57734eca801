"""Bisect the off-by-one in the multi_evaluate product path on TPU.

Recomputes t_i = val_i * eq_x[row_i] * eq_y[col_i] elementwise on device,
compares each term and each reduction stage against host bigints, and
prints the exact operands of any miscomputed element.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from spartan_tpu.core.sparse_mlpoly import SparseMatPolynomial
    from spartan_tpu.ops import field_jax as F
    from spartan_tpu.ops.fields_host import FR_MOD

    from tools.tpu_sparse_check import host_eq_evals

    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    print(f"backend={jax.default_backend()} log2={log2}", flush=True)
    rng = random.Random(0)
    n = 1 << log2
    nx, ny = log2, log2 + 1
    rows = [rng.randrange(n) for _ in range(3 * n)]
    cols = [rng.randrange(2 * n) for _ in range(3 * n)]
    vals = [rng.randrange(FR_MOD) for _ in range(3 * n)]
    poly = SparseMatPolynomial.from_arrays(nx, ny, rows, cols, vals)
    rx = [rng.randrange(FR_MOD) for _ in range(nx)]
    ry = [rng.randrange(FR_MOD) for _ in range(ny)]

    from spartan_tpu.core.mle import EqPolynomial

    fr = F.fr
    eq_rx = EqPolynomial(rx).evals_device()
    eq_ry = EqPolynomial(ry).evals_device()
    d = poly._device()

    gx = eq_rx[d["rows"]]
    gy = eq_ry[d["cols"]]
    m1 = fr.mul(d["vals"], gx)
    t = fr.mul(m1, gy)

    hx = host_eq_evals(rx, FR_MOD)
    hy = host_eq_evals(ry, FR_MOD)

    m1_h = [v * hx[r] % FR_MOD for v, r in zip(vals, rows)]
    t_h = [a * hy[c] % FR_MOD for a, c in zip(m1_h, cols)]

    m1_d = F.decode_fr(m1)
    t_d = F.decode_fr(t)
    vals_d = F.decode_fr(d["vals"])
    gx_d = F.decode_fr(gx)
    gy_d = F.decode_fr(gy)

    bad = False
    for i in range(3 * n):
        if vals_d[i] != vals[i]:
            print(f"encode mismatch at {i}", flush=True)
            bad = True
            break
        if gx_d[i] != hx[rows[i]] or gy_d[i] != hy[cols[i]]:
            print(f"gather mismatch at {i}", flush=True)
            bad = True
            break
        if m1_d[i] != m1_h[i]:
            print(f"MUL1 mismatch at {i}:", flush=True)
            print(f"  a    = {vals[i]:#x}", flush=True)
            print(f"  b    = {hx[rows[i]]:#x}", flush=True)
            print(f"  got  = {m1_d[i]:#x}", flush=True)
            print(f"  want = {m1_h[i]:#x}", flush=True)
            bad = True
            break
        if t_d[i] != t_h[i]:
            print(f"MUL2 mismatch at {i}:", flush=True)
            print(f"  a    = {m1_h[i]:#x}", flush=True)
            print(f"  b    = {hy[cols[i]]:#x}", flush=True)
            print(f"  got  = {t_d[i]:#x}", flush=True)
            print(f"  want = {t_h[i]:#x}", flush=True)
            bad = True
            break
    if not bad:
        print("all elementwise products match; checking reduction", flush=True)
        s_d = F.decode_fr(fr.reduce_sum(t, axis=0)[None])[0]
        s_h = 0
        for x in t_h:
            s_h = (s_h + x) % FR_MOD
        if s_d != s_h:
            print(f"REDUCTION mismatch: got={s_d:#x} want={s_h:#x} "
                  f"diff={(s_h - s_d) % FR_MOD}", flush=True)
            # bisect: partial sums in halves
            lo, hi = 0, 3 * n
            td = t
            th = t_h
            while hi - lo > 1:
                mid = (lo + hi) // 2
                sd = F.decode_fr(fr.reduce_sum(td[lo:mid], axis=0)[None])[0]
                sh = 0
                for x in th[lo:mid]:
                    sh = (sh + x) % FR_MOD
                if sd != sh:
                    hi = mid
                else:
                    lo = mid
            print(f"first bad prefix element index={lo}", flush=True)
            print(f"  t[{lo}] dev={F.decode_fr(td[lo][None])[0]:#x} host={th[lo]:#x}",
                  flush=True)
        else:
            print("reduction matches?! (non-deterministic?)", flush=True)
    return 0


if __name__ == "__main__":
    main()
