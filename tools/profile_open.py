"""Profile the Hyrax opening path (the 2^20 keyless run's 1285 s
derefs_eval_proof) step by step on the real chip.

Usage: python tools/profile_open.py [log_n]
"""
import sys
import time

import jax

sys.path.insert(0, ".")

import numpy as np

from spartan_tpu.core import bullet as BL
from spartan_tpu.core import mle as M
from spartan_tpu.core.mle import DensePolynomial, EqPolynomial
from spartan_tpu.ops import curve_jax as CJ
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops import msm as MSM
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.pcs.hyrax import PolyCommitmentGens, PolyEvalProof
from spartan_tpu.utils.random_tape import RandomTape
from spartan_tpu.utils.transcript import Transcript

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 18

rng = np.random.default_rng(0)


def rand_fr(n):
    return [int.from_bytes(rng.bytes(31), "little") % FR_MOD for a in range(n)]


ACC = {}
COUNT = {}


def timed(name, fn):
    def wrap(*a, **k):
        t = time.perf_counter()
        out = fn(*a, **k)
        # block on any device output
        try:
            if isinstance(out, tuple):
                for o in out:
                    if hasattr(o, "block_until_ready"):
                        o.block_until_ready()
            elif hasattr(out, "block_until_ready"):
                out.block_until_ready()
        except Exception:
            pass
        dt = time.perf_counter() - t
        ACC[name] = ACC.get(name, 0.0) + dt
        COUNT[name] = COUNT.get(name, 0) + 1
        return out
    return wrap


BL._msm_with_extras = timed("bullet/_msm_with_extras", BL._msm_with_extras)
BL._msm_with_extras_host = timed("bullet/_msm_with_extras_host", BL._msm_with_extras_host)
BL._fold_points = timed("bullet/_fold_points", BL._fold_points)
BL._fold_points_host = timed("bullet/_fold_points_host", BL._fold_points_host)
_orig_dec = M.decode_scalar
M.decode_scalar = timed("mle/decode_scalar", _orig_dec)
BL.mle.decode_scalar = M.decode_scalar
_orig_dp = CJ.decode_points
CJ.decode_points = timed("cj/decode_points", _orig_dp)
BL.CJ.decode_points = CJ.decode_points
_orig_dfr = F.decode_fr
F.decode_fr = timed("F/decode_fr", _orig_dfr)
BL.F.decode_fr = F.decode_fr

print(f"backend={jax.default_backend()}  n=2^{LOG_N}")

t0 = time.perf_counter()
Z = F.encode_fr(rand_fr(1 << LOG_N))
Z.block_until_ready()
print(f"encode poly: {time.perf_counter()-t0:.2f}s")
poly = DensePolynomial(Z)
r = rand_fr(LOG_N)

t0 = time.perf_counter()
gens = PolyCommitmentGens(LOG_N, b"profile")
jax.block_until_ready(gens.gens.gens_n.G)
print(f"gens: {time.perf_counter()-t0:.2f}s")

# warm second run matters too: run twice
for it in range(2):
    ACC.clear()
    COUNT.clear()
    transcript = Transcript(b"profile")
    tape = RandomTape(b"profile", seed=b"x" * 32)
    Zr = 0  # claim value need not be honest for timing (prove doesn't check)
    eq = EqPolynomial(r)
    t0 = time.perf_counter()
    L_dev, R_dev = eq.compute_factored_evals()
    jax.block_until_ready((L_dev, R_dev))
    t_eq = time.perf_counter() - t0

    left = LOG_N // 2
    L_size, R_size = 1 << left, 1 << (LOG_N - left)
    t0 = time.perf_counter()
    LZ = poly.bound(L_dev, L_size, R_size)
    LZ.block_until_ready()
    t_bound = time.perf_counter() - t0

    t0 = time.perf_counter()
    L_host = F.decode_fr(L_dev)
    t_dec = time.perf_counter() - t0

    from spartan_tpu.core.nizk import DotProductProofLog

    transcript.append_protocol_name(PolyEvalProof.PROTOCOL)
    t0 = time.perf_counter()
    proof, _Cx, _CZr = DotProductProofLog.prove(
        gens.gens, transcript, tape, LZ, 0, R_dev, Zr, 0)
    t_dotp = time.perf_counter() - t0
    print(f"\n== iter {it}: eq={t_eq:.2f}s bound={t_bound:.2f}s decL={t_dec:.2f}s "
          f"dotplog={t_dotp:.2f}s")
    for k in sorted(ACC, key=lambda k: -ACC[k]):
        print(f"  {k:32s} {ACC[k]:8.2f}s  x{COUNT[k]}")
