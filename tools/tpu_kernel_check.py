"""On-device kernel correctness sweep: Pallas vs host bigint, on the REAL
backend (does not force CPU like tests/conftest.py).

Run on a TPU to localize device-only miscompares:
    python tools/tpu_kernel_check.py [--n 4096] [--seed 0]

Covers: field mul/add/sub (random + near-p edge values), to/from Mont,
reduce_sum, batch_inverse, curve padd/pdbl (random, identity, doubling,
inverse pairs), scalar_mul, MSM vs host Pippenger.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spartan_tpu.ops import curve_host as CH
    from spartan_tpu.ops import curve_jax as CJ
    from spartan_tpu.ops import field_jax as F
    from spartan_tpu.ops import fields_host as fh
    from spartan_tpu.ops import msm as MSM
    from spartan_tpu.ops.limbs import ints_to_limbs

    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    rng = random.Random(args.seed)
    n = args.n
    P = fh.FQ_MOD
    failures = 0

    def check(label, got, want):
        nonlocal failures
        bad = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
        if bad:
            failures += 1
            i = bad[0]
            print(f"FAIL {label}: {len(bad)}/{len(want)} mismatch; "
                  f"first at {i}: got={got[i]:#x} want={want[i]:#x}", flush=True)
        else:
            print(f"ok   {label} ({len(want)})", flush=True)

    # --- field ops, random + adversarial values near p ---
    edge = [0, 1, 2, P - 1, P - 2, (1 << 254) % P, (P + 1) // 2]
    a_int = [rng.randrange(P) for _ in range(n - len(edge))] + edge
    b_int = edge + [rng.randrange(P) for _ in range(n - len(edge))]
    fq = F.fq
    a = F.encode_fq(a_int)
    b = F.encode_fq(b_int)

    got = F.decode_fq(fq.mul(a, b))
    check("fq.mul", got, [x * y % P for x, y in zip(a_int, b_int)])
    got = F.decode_fq(fq.add(a, b))
    check("fq.add", got, [(x + y) % P for x, y in zip(a_int, b_int)])
    got = F.decode_fq(fq.sub(a, b))
    check("fq.sub", got, [(x - y) % P for x, y in zip(a_int, b_int)])
    got = F.decode_fq(fq.batch_inverse(a))
    check("fq.batch_inverse", got,
          [pow(x, P - 2, P) if x else 0 for x in a_int])

    # reduce_sum along axis 0
    m = a.reshape(64, n // 64, -1)
    got = F.decode_fq(fq.reduce_sum(m, axis=0))
    want = []
    for j in range(n // 64):
        want.append(sum(a_int[i * (n // 64) + j] for i in range(64)) % P)
    check("fq.reduce_sum", got, want)

    # --- Fr ops (scalar field) ---
    R = fh.FR_MOD
    fr = F.fr
    ar_int = [rng.randrange(R) for _ in range(n)]
    br_int = [rng.randrange(R) for _ in range(n)]
    ar = F.encode_fr(ar_int)
    br = F.encode_fr(br_int)
    got = F.decode_fr(fr.mul(ar, br))
    check("fr.mul", got, [x * y % R for x, y in zip(ar_int, br_int)])

    # --- curve ops (base points generated on device: fixed-base batch) ---
    from spartan_tpu.core.commitments import points_from_scalars

    def rand_points(count):
        dev = points_from_scalars([rng.randrange(1, R) for _ in range(count)])
        return CJ.decode_points(CJ.from_affine(*dev))

    pts_host = rand_points(256)
    qs_host = rand_points(252)
    # adversarial pairs: identity, equal (doubling via add), inverse pair
    qs_host += [None, pts_host[253], CH.neg(pts_host[254]), CH.GEN]
    pa = CJ.encode_points_affine(pts_host)
    qa = CJ.encode_points_affine(qs_host)
    pp = CJ.from_affine(*pa)
    qp = CJ.from_affine(*qa)

    s = CJ.padd(pp, qp)
    got = CJ.decode_points(s)
    wa = [CH.add(x, y) for x, y in zip(pts_host, qs_host)]
    ok = all((g is None and w is None) or (g == w) for g, w in zip(got, wa))
    print(("ok   curve.padd (256)" if ok else "FAIL curve.padd"), flush=True)
    if not ok:
        failures += 1
        for i, (g, w) in enumerate(zip(got, wa)):
            if g != w:
                print(f"  first mismatch at {i}: got={g} want={w}", flush=True)
                break

    d = CJ.pdbl(pp)
    got = CJ.decode_points(d)
    want = [CH.double(x) for x in pts_host]
    ok = all((g is None and w is None) or (g == w) for g, w in zip(got, want))
    print(("ok   curve.pdbl (256)" if ok else "FAIL curve.pdbl"), flush=True)
    failures += 0 if ok else 1

    # --- MSM ---
    for sz, c in ((256, 8), (1024, 10)):
        sc_int = [rng.randrange(R) for _ in range(sz)]
        base_host = rand_points(sz)
        base = CJ.encode_points_affine(base_host)
        sc = jnp.asarray(ints_to_limbs(sc_int))
        acc = MSM.msm(base, sc, c=c)
        got = CJ.decode_points(tuple(x[None] for x in acc))[0]
        want = CH.msm(sc_int, base_host)
        ok = got == want
        print((f"ok   msm n={sz}" if ok else f"FAIL msm n={sz}: got={got} want={want}"),
              flush=True)
        failures += 0 if ok else 1

    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
