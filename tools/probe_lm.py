"""On-chip probe of the limb-major (LM) fused round kernels.

Checks, at keyless-scale table lengths and under a dummy resident
allocation emulating prove-time HBM pressure, that the LM round steps
(a) fit memory where the quarter-layout kernels OOMed and (b) beat the
per-op XLA composition. Also cross-checks one LM step against the XLA
fold+eval on device.

Usage: python tools/probe_lm.py [resident_gb] [log2n ...]
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
    from spartan_tpu.ops import field_jax as F

    resident_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    sizes = [int(x) for x in sys.argv[2:]] or [20, 21, 22]
    print(f"backend={jax.default_backend()} resident={resident_gb} GB",
          flush=True)

    n_res = int(resident_gb * (1 << 30) / 64)
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

    ctr = [0]
    for log2n in sizes:
        n = 1 << log2n
        mk = jax.jit(functools.partial(_mk_table, n_static=n))

        def table():
            ctr[0] += 1
            return mk(jnp.uint32(ctr[0]))

        r = F.encode_fr([12345])[0]
        try:
            T_, A, B, C = table(), table(), table(), table()
            _sync((T_, A, B, C))
            # correctness: one LM step vs XLA fold+eval at this size
            lm = SC.k_lm_prep((T_, A, B, C))
            ev_lm = SC.k_lm_evals_additive(*lm)
            e = SC.k_cubic_additive_stack.__wrapped_jit__(T_, A, B, C)
            ok = bool(jnp.array_equal(ev_lm, e))
            *lm2, pend = SC.k_lm_step_additive(*lm, r)
            folded = SC.k_folds_cubic_additive.__wrapped_jit__(
                T_, A, B, C, r)
            ev_x = SC.k_cubic_additive_stack.__wrapped_jit__(*folded)
            ok2 = bool(jnp.array_equal(pend, ev_x))
            print(f"  n=2^{log2n} LM evals match XLA: {ok}; "
                  f"step match: {ok2}", flush=True)
            if not (ok and ok2):
                raise SystemExit("LM MISMATCH")
            # timing: additive step (warm)
            t0 = time.perf_counter()
            reps = 4
            cur = lm
            for _ in range(reps):
                *cur, pend = SC.k_lm_step_additive(*lm, r)
            _sync((cur, pend))
            dt = (time.perf_counter() - t0) / reps
            print(f"  n=2^{log2n} LM additive step: {dt*1e3:8.1f} ms",
                  flush=True)
            del T_, A, B, C, lm, lm2, cur, pend, folded
        except Exception as exc:  # noqa: BLE001
            print(f"  n=2^{log2n} additive: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
        try:
            # sharedC product step (layer shape): K instances
            A, B = table(), table()
            (Pa,) = SC.k_lm_prep((A,))
            (Pb,) = SC.k_lm_prep((B,))
            Pcf = SC.k_lm_fold_one(Pa, r)  # any folded pair as shared C
            a, b, ev = SC.k_lm_step_shared(Pa, Pb, Pcf, r)
            _sync((a, b, ev))
            K = 12
            t0 = time.perf_counter()
            outs = []
            for _ in range(K):
                outs.append(SC.k_lm_step_shared(Pa, Pb, Pcf, r))
            _sync(outs)
            dt = time.perf_counter() - t0
            print(f"  n=2^{log2n} LM sharedC step x{K}: {dt*1e3:8.1f} ms "
                  f"({dt/K*1e3:.1f} ms/instance)", flush=True)
            del A, B, Pa, Pb, Pcf, a, b, ev, outs
        except Exception as exc:  # noqa: BLE001
            print(f"  n=2^{log2n} sharedC: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
