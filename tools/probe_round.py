"""Probe per-dispatch vs per-mul cost of big-layer sumcheck rounds on chip."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from spartan_tpu.core import sumcheck as SC
from spartan_tpu.ops import field_jax as F

fr = F.fr
LOGN = int(sys.argv[1]) if len(sys.argv) > 1 else 21
N = 1 << LOGN
K = 12

rng = np.random.default_rng(0)


def rand_tbl(n):
    # random limbs < 2^16 are fine for timing (not canonical field elts)
    return jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))


print(f"backend={jax.default_backend()} N=2^{LOGN} K={K}")
T = rand_tbl(N)
U = rand_tbl(N)
r = rand_tbl(1)[0]

def t(label, fn, reps=3):
    fn()  # warm/compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:42s} {dt*1e3:9.1f} ms")
    return dt

t("fr.mul 2^%d" % LOGN, lambda: fr.mul(T, U))
t("k_fold_top 2^%d" % LOGN, lambda: SC.k_fold_top(T, r))
t("k_cubic_prod_evals 2^%d" % LOGN, lambda: SC.k_cubic_prod_evals(T, U, T))
# one full per-instance round: K evals + (2K+1) folds
TA = [T] * K
TB = [U] * K

def per_instance_round():
    outs = SC._evals_cubic_perinstance(TA, TB, [], T, K)
    Cp = SC.k_fold_top(T, r)
    A2 = [SC.k_fold_top(x, r) for x in TA]
    B2 = [SC.k_fold_top(x, r) for x in TB]
    return outs, Cp, A2, B2

t("per-instance round (12 ev + 25 folds)", per_instance_round, reps=2)

# dispatch latency of a trivial kernel
tiny = rand_tbl(256)
t("tiny fr.mul 256 (dispatch latency)", lambda: fr.mul(tiny, tiny), reps=10)

# decode latency
from spartan_tpu.ops.field_jax import decode_fr
s = fr.mul(T[:1], U[:1])
jax.block_until_ready(s)
t0 = time.perf_counter()
for _ in range(5):
    decode_fr(s)
print(f"{'decode_fr 1 elt (sync rt)':42s} {(time.perf_counter()-t0)/5*1e3:9.1f} ms")
