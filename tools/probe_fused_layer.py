"""Profile ONE fused batched-layer sumcheck on the real chip.

The warm 2^16 e2e showed batched_layer[n=131072,K=12] at ~37 s — the
single largest prove phase — but the fused chain has no internal
accumulators. This replays that exact layer shape standalone and times
each piece WITH real syncs: stack prep, each stage executable, the
dynamic tail, and the final decode, so the next optimization targets the
measured bottleneck instead of a guess.

Usage: python tools/probe_fused_layer.py [log2_n] [K] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spartan_tpu.utils.devsync import sync as _sync  # noqa: E402


def main() -> None:
    import numpy as np

    from spartan_tpu.core import sumcheck_fused as SF
    from spartan_tpu.ops import field_jax as F
    from spartan_tpu.ops import transcript_device as TD
    from spartan_tpu.ops.fields_host import FR_MOD
    from spartan_tpu.utils.transcript import Transcript

    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n = 1 << log2n
    nP, nS = K - 1, 1
    num_rounds = log2n

    rng = np.random.default_rng(0)

    def table():
        return F.encode_small_uints(
            rng.integers(1, 1 << 32, size=n, dtype=np.uint64))

    TA = [table() for _ in range(K)]
    TB = [table() for _ in range(K)]
    TC = [table() for _ in range(nS)]
    Cp = table()
    _sync((TA, TB, TC, Cp))
    coeffs = [int(rng.integers(1, FR_MOD)) for _ in range(K)]
    claim = 0

    import jax

    print(f"backend={jax.default_backend()} n=2^{log2n} K={K} "
          f"(nP={nP}, nS={nS}) fusible="
          f"{SF.fusible(n, 2 * K + 1 + nS)}", flush=True)

    def timed(label, fn, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _sync(out)
        dt = time.perf_counter() - t0
        print(f"  {label:28s} {dt:8.3f}s", flush=True)
        return out

    for rep in range(reps):
        print(f"--- rep {rep} ({'cold' if rep == 0 else 'warm'})", flush=True)
        tr = Transcript(b"probe")
        t_all = time.perf_counter()

        # mirror prove_cubic_batched_fused stage by stage
        N = n
        BUF = timed("k_prep (stack+bitrev)", SF._k_prep,
                    tuple(TA) + tuple(TB) + (Cp,) + tuple(TC), N=N)
        state, pos, pos_begin, _ = TD.DeviceTranscript.export_host_state(tr)
        enc = F.encode_fr([c % FR_MOD for c in coeffs] + [claim % FR_MOD])
        coeffs_d, claim_d = enc[:K], enc[K]
        import jax.numpy as jnp

        st, p, pb = jnp.asarray(state), pos, pos_begin
        small_log = SF.SMALL_BUCKET_N.bit_length() - 1
        n_live = N
        rounds_used = 0
        outs = []
        while n_live > SF.SMALL_BUCKET_N:
            m = n_live.bit_length() - 1
            target_log = SF._canonical_below(m, small_log)
            k = m - target_log
            out, BUF, st, p, pb, claim_d = timed(
                f"stage 2^{m}->2^{target_log} (k={k})",
                SF._k_fused_stage, st, p, pb, BUF, coeffs_d, claim_d,
                nP=nP, nS=nS, k=k, out_n=1 << target_log)
            outs.append(out)
            rounds_used += k
            n_live = 1 << target_log
        out = timed(f"tail 2^{n_live.bit_length()-1} dyn-rounds",
                    SF._k_fused_cubic_batched, st, p, pb, BUF, coeffs_d,
                    claim_d, jnp.asarray(num_rounds - rounds_used, jnp.int32),
                    nP=nP, nS=nS)
        outs.append(out)
        t0 = time.perf_counter()
        vals = F.decode_fr(jnp.concatenate(outs, axis=0))
        print(f"  {'decode':28s} {time.perf_counter()-t0:8.3f}s", flush=True)
        print(f"  {'TOTAL':28s} {time.perf_counter()-t_all:8.3f}s", flush=True)
        del vals


if __name__ == "__main__":
    main()
