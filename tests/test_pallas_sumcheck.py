"""Fused sumcheck round-step kernels vs the XLA composition (bit-exact).

Runs the Pallas kernels through the interpreter on the CPU test backend
(same coverage pattern as test_msm_seq.py) and checks folded tables AND
eval triples against core/sumcheck.py's reference composition, including
non-tile-aligned lengths (zero-padding must not perturb the sums).
"""

import os

os.environ.setdefault("SPARTAN_TPU_PALLAS_INTERPRET", "1")
os.environ.setdefault("SPARTAN_TPU_SUMCHECK_T", "8")

import numpy as np
import pytest

from spartan_tpu.core import sumcheck as SC
from spartan_tpu.core.mle import encode_scalar
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops import pallas_sumcheck as PS
from spartan_tpu.ops.fields_host import FR_MOD

import jax.numpy as jnp

rng = np.random.default_rng(11)


def rand_fr() -> int:
    return int.from_bytes(rng.bytes(31), "little") % FR_MOD


def tbl(n):
    return F.encode_fr([rand_fr() for _ in range(n)])


def eq(a, b):
    assert jnp.array_equal(a, b), "device tables differ"


@pytest.mark.parametrize("n", [32, 64])
def test_step_cubic_prod_matches_xla(n):
    A, B, C = tbl(n), tbl(n), tbl(n)
    r = encode_scalar(rand_fr() or 1)
    A1, B1, C1, ev = PS.step_cubic_prod(A, B, C, r)
    A2 = SC.k_fold_top(A, r)
    B2 = SC.k_fold_top(B, r)
    C2 = SC.k_fold_top(C, r)
    e0, e2, e3 = SC.k_cubic_prod_evals(A2, B2, C2)
    eq(A1, A2), eq(B1, B2), eq(C1, C2)
    eq(ev, jnp.stack([e0, e2, e3]))


def test_step_cubic_prod_sharedC_matches_xla():
    n = 64
    A, B = tbl(n), tbl(n)
    Cf = tbl(n // 2)  # already folded
    r = encode_scalar(rand_fr() or 1)
    A1, B1, ev = PS.step_cubic_prod_sharedC(A, B, Cf, r)
    A2, B2 = SC.k_fold_top(A, r), SC.k_fold_top(B, r)
    e0, e2, e3 = SC.k_cubic_prod_evals(A2, B2, Cf)
    eq(A1, A2), eq(B1, B2)
    eq(ev, jnp.stack([e0, e2, e3]))


def test_step_cubic_additive_matches_xla():
    n = 64
    T_, A, B, C = tbl(n), tbl(n), tbl(n), tbl(n)
    r = encode_scalar(rand_fr() or 1)
    T1, A1, B1, C1, ev = PS.step_cubic_additive(T_, A, B, C, r)
    Tx = SC.k_fold_top(T_, r)
    Ax, Bx, Cx = (SC.k_fold_top(x, r) for x in (A, B, C))
    e0, e2, e3 = SC.k_cubic_additive_evals(Tx, Ax, Bx, Cx)
    eq(T1, Tx), eq(A1, Ax), eq(B1, Bx), eq(C1, Cx)
    eq(ev, jnp.stack([e0, e2, e3]))


def test_step_quad_matches_xla():
    n = 64
    A, B = tbl(n), tbl(n)
    r = encode_scalar(rand_fr() or 1)
    A1, B1, ev = PS.step_quad(A, B, r)
    Ax, Bx = SC.k_fold_top(A, r), SC.k_fold_top(B, r)
    e0, e2 = SC.k_quad_evals(Ax, Bx)
    eq(A1, Ax), eq(B1, Bx)
    eq(ev, jnp.stack([e0, e2]))


def test_evals_only_variants_match_xla():
    n = 64
    T_, A, B, C = tbl(n), tbl(n), tbl(n), tbl(n)
    e0, e2, e3 = SC.k_cubic_prod_evals(A, B, C)
    eq(PS.evals_cubic_prod(A, B, C), jnp.stack([e0, e2, e3]))
    e0, e2, e3 = SC.k_cubic_additive_evals(T_, A, B, C)
    eq(PS.evals_cubic_additive(T_, A, B, C), jnp.stack([e0, e2, e3]))
    e0, e2 = SC.k_quad_evals(A, B)
    eq(PS.evals_quad(A, B), jnp.stack([e0, e2]))


def test_padding_is_exact():
    """n = 4*T exactly vs n needing a padded tile: same values."""
    n = 40  # q=10, T=8 -> padded to 16
    A, B, C = tbl(n), tbl(n), tbl(n)
    r = encode_scalar(rand_fr() or 1)
    A1, B1, C1, ev = PS.step_cubic_prod(A, B, C, r)
    A2 = SC.k_fold_top(A, r)
    e0, e2, e3 = SC.k_cubic_prod_evals(A2, SC.k_fold_top(B, r),
                                       SC.k_fold_top(C, r))
    eq(A1, A2)
    eq(ev, jnp.stack([e0, e2, e3]))
