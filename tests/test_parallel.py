"""Multi-chip sharding correctness on the virtual 8-device CPU mesh.

SURVEY.md §4 implication (c): the same computation sharded across the mesh
must produce identical results to the single-device path.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spartan_tpu.core import sumcheck as SC
from spartan_tpu.ops import curve_host as CH
from spartan_tpu.ops import curve_jax as CJ
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops import fields_host as fh
from spartan_tpu.ops import msm as MSM
from spartan_tpu.ops.limbs import ints_to_limbs
from spartan_tpu.parallel import (
    from_strided,
    make_cubic_round,
    make_mesh,
    msm_sharded,
    shard_table,
    to_strided,
)

random.seed(55)
D = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= D
    return make_mesh(D)


def test_strided_roundtrip():
    x = F.encode_fr([random.randrange(fh.FR_MOD) for _ in range(32)])
    s = to_strided(x, D)
    assert s.shape == (D, 4, 16)
    back = from_strided(s)
    assert bool((back == x).all())


def test_sharded_cubic_round_matches_local(mesh):
    N = 32
    tabs = [[random.randrange(fh.FR_MOD) for _ in range(N)] for _ in range(4)]
    devs = [F.encode_fr(t) for t in tabs]
    r_int = random.randrange(fh.FR_MOD)
    r = F.encode_fr([r_int])[0]

    # single-device reference
    e0_ref, e2_ref, e3_ref = SC.k_cubic_additive_evals(*devs)
    folded_ref = [SC.k_fold_top(t, r) for t in devs]

    # sharded
    sharded_in = [shard_table(mesh, to_strided(t, D)) for t in devs]
    round_fn = jax.jit(make_cubic_round(mesh))
    e0, e2, e3, Tn, An, Bn, Cn = round_fn(*sharded_in, r)

    assert F.decode_fr(e0[None]) == F.decode_fr(e0_ref[None])
    assert F.decode_fr(e2[None]) == F.decode_fr(e2_ref[None])
    assert F.decode_fr(e3[None]) == F.decode_fr(e3_ref[None])
    for got, ref in zip([Tn, An, Bn, Cn], folded_ref):
        # strided fold keeps the strided layout of the half-length table
        assert F.decode_fr(from_strided(got)) == F.decode_fr(ref)


def test_sharded_msm_matches_host(mesh):
    M = 32
    scalars = [random.randrange(fh.FR_MOD) for _ in range(M)]
    pts_host = [CH.scalar_mul(random.randrange(1, 1 << 50), CH.GEN) for _ in range(M)]
    pts = CJ.encode_points_affine(pts_host)
    sc = jnp.asarray(ints_to_limbs(scalars))

    pts_sh = tuple(shard_table(mesh, a) for a in pts)
    sc_sh = shard_table(mesh, sc)
    acc = msm_sharded(mesh, pts_sh, sc_sh, c=8)
    got = CJ.decode_points(tuple(a[None] for a in acc))[0]
    assert got == CH.msm(scalars, pts_host)
