"""Standalone reproduction of the keyless-scale leaf-layer sumcheck OOM.

Builds the exact leaf-layer shape of the 2^20 lookup argument (I = 18
instances: nP = 12 par + nS = 6 seq, tables 2^21) under a configurable
dummy residency, and runs prove_cubic_batched on the real chip — so the
OOM can be bisected against residency instead of re-running 15-minute
proves.

Usage: python tools/probe_leaf_layer.py [resident_gb] [log2n] [nP] [nS]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spartan_tpu.utils.devsync import sync as _sync  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spartan_tpu.core import sumcheck as SC
    from spartan_tpu.core.mle import DensePolynomial
    from spartan_tpu.ops import field_jax as F
    from spartan_tpu.ops.fields_host import FR_MOD
    from spartan_tpu.utils.transcript import Transcript

    resident_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    log2n = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    nP = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    nS = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    n = 1 << log2n
    print(f"backend={jax.default_backend()} resident={resident_gb}GB "
          f"n=2^{log2n} nP={nP} nS={nS}", flush=True)

    n_res = int(resident_gb * (1 << 30) / 64)
    resident = None
    if n_res:
        resident = jax.jit(
            lambda: jnp.broadcast_to(
                jnp.arange(16, dtype=jnp.uint32)[None, :] + 1,
                (n_res, 16)) + jnp.arange(n_res, dtype=jnp.uint32)[:, None] % 7
        )()
        _sync(resident)
    print("resident allocated", flush=True)

    def _mk_table(seed, *, n_static):
        v = (jnp.arange(n_static, dtype=jnp.uint32) * jnp.uint32(2654435761)
             + seed) >> 1
        canon = jnp.zeros((n_static, 16), jnp.uint32)
        canon = canon.at[:, 0].set(v & 0xFFFF).at[:, 1].set(v >> 16)
        return F.fr.to_mont(canon)

    mk = jax.jit(functools.partial(_mk_table, n_static=n))
    ctr = [0]

    def poly():
        ctr[0] += 1
        return DensePolynomial(mk(jnp.uint32(ctr[0])))

    A_par = [poly() for _ in range(nP)]
    B_par = [poly() for _ in range(nP)]
    C_par = poly()
    A_seq = [poly() for _ in range(nS)]
    B_seq = [poly() for _ in range(nS)]
    C_seq = [poly() for _ in range(nS)]
    _sync([p.Z for p in A_par + B_par + [C_par] + A_seq + B_seq + C_seq])
    print(f"tables built: {(2*(nP+nS)+1+nS)} x 2^{log2n} "
          f"= {(2*(nP+nS)+1+nS)*n*64/2**30:.2f} GB", flush=True)

    coeffs = [(7919 * (i + 1)) % FR_MOD for i in range(nP + nS)]
    tr = Transcript(b"leaf_probe")
    t0 = time.perf_counter()
    try:
        proof, r, cp, cd = SC.SumcheckInstanceProof.prove_cubic_batched(
            0, log2n, (A_par, B_par, C_par), (A_seq, B_seq, C_seq),
            coeffs, tr, own_seq=True)
        dt = time.perf_counter() - t0
        print(f"leaf-layer sumcheck OK in {dt:.1f}s "
              f"({len(proof.compressed_polys)} rounds)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
