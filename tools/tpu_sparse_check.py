"""Isolated repro of the dotp-vs-evaluate identity that failed on TPU at
2^12 (sparse_mlpoly_full.SparseMatPolyEvalProof.prove, assert el+er==eval).

Checks, against exact host bigint arithmetic:
  1. multi_evaluate (gather+mul3+reduce_sum device path)
  2. eq tables (EqPolynomial.evals_device) at len(rx_ext)
  3. derefs gather values
  4. the dotp split sums el+er

Run:  python tools/tpu_sparse_check.py --log2 12
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def host_eq_evals(r: list[int], mod: int) -> list[int]:
    """eq table with r[0] as the MOST significant index bit (hyrax.rs:355-369)."""
    table = [1]
    for rj in r:
        nxt = []
        for t in table:
            h = t * rj % mod
            nxt.append((t - h) % mod)
            nxt.append(h)
        table = nxt
    return table


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from spartan_tpu.core.mle import EqPolynomial
    from spartan_tpu.core.product_tree import DotProductCircuit
    from spartan_tpu.core.sparse_mlpoly import SparseMatPolynomial
    from spartan_tpu.core.sparse_mlpoly_full import (
        equalize,
        multi_sparse_to_dense_rep,
    )
    from spartan_tpu.ops import field_jax as F
    from spartan_tpu.ops.fields_host import FR_MOD

    print(f"backend={jax.default_backend()} log2={args.log2}", flush=True)
    rng = random.Random(args.seed)
    n = 1 << args.log2
    nx = args.log2
    ny = args.log2 + 1          # matches the synthetic R1CS shape (z = 2n)
    rows = [rng.randrange(n) for _ in range(3 * n)]
    cols = [rng.randrange(2 * n) for _ in range(3 * n)]
    vals = [rng.randrange(FR_MOD) for _ in range(3 * n)]
    polys = [SparseMatPolynomial.from_arrays(nx, ny, rows, cols, vals)]

    rx = [rng.randrange(FR_MOD) for _ in range(nx)]
    ry = [rng.randrange(FR_MOD) for _ in range(ny)]

    failures = 0

    # 1. device evaluate vs host
    ev_dev = SparseMatPolynomial.multi_evaluate(polys, rx, ry)[0]
    eq_x = host_eq_evals(rx, FR_MOD)
    eq_y = host_eq_evals(ry, FR_MOD)
    ev_host = 0
    for r, c, v in zip(rows, cols, vals):
        ev_host = (ev_host + v * eq_x[r] % FR_MOD * eq_y[c]) % FR_MOD
    if ev_dev != ev_host:
        failures += 1
        print(f"FAIL multi_evaluate: dev={ev_dev:#x} host={ev_host:#x}", flush=True)
    else:
        print("ok   multi_evaluate", flush=True)

    # 2. eq tables on device at extended length
    rx_ext, ry_ext = equalize(rx, ry)
    mem_rx = EqPolynomial(rx_ext).evals_device()
    mem_ry = EqPolynomial(ry_ext).evals_device()
    hx = host_eq_evals(rx_ext, FR_MOD)
    hy = host_eq_evals(ry_ext, FR_MOD)
    dx = F.decode_fr(mem_rx)
    dy = F.decode_fr(mem_ry)
    for name, d, h in (("eq_rx_ext", dx, hx), ("eq_ry_ext", dy, hy)):
        bad = [i for i, (a, b) in enumerate(zip(d, h)) if a != b]
        if bad:
            failures += 1
            print(f"FAIL {name}: {len(bad)}/{len(h)} wrong; first idx {bad[0]}: "
                  f"dev={d[bad[0]]:#x} host={h[bad[0]]:#x}", flush=True)
        else:
            print(f"ok   {name} ({len(h)})", flush=True)

    # 3. derefs gathers
    dense = multi_sparse_to_dense_rep(polys)
    derefs = dense.deref(mem_rx, mem_ry)
    row_addr = dense.row.ops_addr_usize[0]
    col_addr = dense.col.ops_addr_usize[0]
    drow = derefs.row_ops_val[0].to_ints()
    dcol = derefs.col_ops_val[0].to_ints()
    wrow = [hx[int(a)] for a in row_addr]
    wcol = [hy[int(a)] for a in col_addr]
    for name, d, h in (("deref_row", drow, wrow), ("deref_col", dcol, wcol)):
        bad = [i for i, (a, b) in enumerate(zip(d, h)) if a != b]
        if bad:
            failures += 1
            print(f"FAIL {name}: {len(bad)}/{len(h)} wrong; first idx {bad[0]}",
                  flush=True)
        else:
            print(f"ok   {name} ({len(h)})", flush=True)

    # 4. dotp split sums
    circuit = DotProductCircuit(
        derefs.row_ops_val[0].clone(), derefs.col_ops_val[0].clone(),
        dense.val[0].clone())
    cl, cr = circuit.split()
    el, er = cl.evaluate(), cr.evaluate()
    vpad = dense.val[0].to_ints()
    want = 0
    for a, b, c in zip(wrow, wcol, vpad):
        want = (want + a * b % FR_MOD * c) % FR_MOD
    if (el + er) % FR_MOD != want:
        failures += 1
        print(f"FAIL dotp: el+er={(el + er) % FR_MOD:#x} host={want:#x}", flush=True)
    else:
        print("ok   dotp el+er", flush=True)
    if want != ev_host:
        failures += 1
        print("FAIL identity: host dotp != host evaluate (algorithmic bug)", flush=True)

    print("ALL OK" if failures == 0 else f"{failures} FAILURES", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
