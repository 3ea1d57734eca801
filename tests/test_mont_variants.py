"""Both Montgomery-mul kernel forms must agree with host bigints.

The Pallas kernels default to the CIOS interleaved form; the sliding-window
product/REDC pipeline is kept for A/B comparison (SPARTAN_TPU_MONT=window).
Tests run both through the interpreter against the independent host-int
implementation, including boundary values.
"""

import numpy as np
import pytest

from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops import fields_host as fh


def _cases():
    rng = np.random.default_rng(77)
    vals = [int.from_bytes(rng.bytes(31), "little") % fh.FQ_MOD
            for _ in range(30)]
    edges = [0, 1, 2, fh.FQ_MOD - 1, fh.FQ_MOD - 2, (1 << 254) % fh.FQ_MOD,
             fh.FQ_MOD // 2, (1 << 16) - 1, 1 << 16]
    return vals + edges


@pytest.mark.parametrize("mont", ["cios", "window"])
def test_pallas_mont_mul_matches_host(monkeypatch, mont):
    monkeypatch.setenv("SPARTAN_TPU_MONT", mont)
    from spartan_tpu.ops.pallas_field import make_field_kernels

    mul, add, sub = make_field_kernels(F.FQ, interpret=True)
    a = _cases()
    b = list(reversed(a))
    got = F.decode_fq(mul(F.encode_fq(a), F.encode_fq(b)))
    assert got == [(x * y) % fh.FQ_MOD for x, y in zip(a, b)]
    got = F.decode_fq(add(F.encode_fq(a), F.encode_fq(b)))
    assert got == [(x + y) % fh.FQ_MOD for x, y in zip(a, b)]
    got = F.decode_fq(sub(F.encode_fq(a), F.encode_fq(b)))
    assert got == [(x - y) % fh.FQ_MOD for x, y in zip(a, b)]


@pytest.mark.parametrize("mont", ["cios", "window"])
def test_pallas_mixed_padd_matches_host(monkeypatch, mont):
    monkeypatch.setenv("SPARTAN_TPU_MONT", mont)
    import jax.numpy as jnp

    from spartan_tpu.ops import curve_host as CH
    from spartan_tpu.ops import curve_jax as CJ
    from spartan_tpu.ops.pallas_field import (_padd_mixed_block,
                                              make_field_kernels)  # noqa: F401
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from spartan_tpu.ops.limbs import NUM_LIMBS

    _L = NUM_LIMBS
    pts1 = [CH.scalar_mul(k, CH.GEN) for k in range(1, 9)]
    pts2 = [CH.scalar_mul(k, CH.GEN) for k in range(11, 19)]
    # include identity as P1 (P2 affine only, per Alg 8 completeness domain)
    pts1[3] = None
    P = CJ.encode_points(pts1)
    x2, y2, _ = CJ.encode_points_affine(pts2)

    p_limbs = np.asarray(F.FQ.p_limbs, np.uint32)[:, None]
    pp = int(F.FQ.p_prime)

    def kernel(p_ref, x1, y1, z1, a2, b2, ox, oy, oz):
        X3, Y3, Z3 = _padd_mixed_block(
            x1[:], y1[:], z1[:], a2[:], b2[:], p_ref[:], jnp.uint32(pp))
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3

    n = len(pts1)
    coords = [jnp.broadcast_to(c, (n, _L)).T for c in (*P, x2, y2)]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((_L, n), jnp.uint32)
                        for _ in range(3)),
        in_specs=[spec] * 6,
        out_specs=(spec, spec, spec),
        interpret=True,
    )(jnp.asarray(p_limbs), *coords)
    got = CJ.decode_points(tuple(o.T for o in outs))
    exp = [CH.add(p, q) for p, q in zip(pts1, pts2)]
    assert got == exp
