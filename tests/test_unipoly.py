"""Round-polynomial interpolation + compression (unipoly.rs:126-185 model)."""

import random

from spartan_tpu.core.unipoly import CompressedUniPoly, UniPoly
from spartan_tpu.ops.fields_host import FR_MOD

random.seed(5)


def _eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % FR_MOD
    return acc


def test_from_evals_quadratic():
    coeffs = [random.randrange(FR_MOD) for _ in range(3)]
    evals = [_eval(coeffs, x) for x in range(3)]
    p = UniPoly.from_evals(evals)
    assert p.coeffs == coeffs
    r = random.randrange(FR_MOD)
    assert p.evaluate(r) == _eval(coeffs, r)


def test_from_evals_cubic():
    coeffs = [random.randrange(FR_MOD) for _ in range(4)]
    evals = [_eval(coeffs, x) for x in range(4)]
    p = UniPoly.from_evals(evals)
    assert p.coeffs == coeffs


def test_compress_roundtrip():
    coeffs = [random.randrange(FR_MOD) for _ in range(4)]
    p = UniPoly(coeffs)
    hint = (p.eval_at_zero() + p.eval_at_one()) % FR_MOD
    q = p.compress().decompress(hint)
    assert q.coeffs == p.coeffs
