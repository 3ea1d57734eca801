"""KZG PCS: commit/open/pairing-verify + batch variants (kzg.rs:524-582)."""

import random

import pytest

from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.pcs.kzg import (
    KZGBatchedCommitment,
    KZGBatchedEvalProof,
    KZGCommitment,
    KZGPolyCommitmentGens,
    KZGProof,
    KZGSrs,
)
from spartan_tpu.utils.transcript import Transcript

random.seed(17)


@pytest.fixture(scope="module")
def srs():
    return KZGSrs.setup_from_seed(32, 12345)


def test_kzg_commit_open(srs):
    # p(x) = 1 + 2x + 3x^2; p(5) = 86
    coeffs = F.encode_fr([1, 2, 3])
    comm = KZGCommitment.commit(coeffs, srs)
    proof, eval_ = KZGProof.prove(coeffs, 5, srs)
    assert eval_ == 86
    assert proof.verify(comm, 5, 86, srs)
    assert not proof.verify(comm, 5, 100, srs)


def test_kzg_random_poly(srs):
    cs = [random.randrange(FR_MOD) for _ in range(16)]
    coeffs = F.encode_fr(cs)
    z = random.randrange(FR_MOD)
    comm = KZGCommitment.commit(coeffs, srs)
    proof, eval_ = KZGProof.prove(coeffs, z, srs)
    exp = 0
    for c in reversed(cs):
        exp = (exp * z + c) % FR_MOD
    assert eval_ == exp
    assert proof.verify(comm, z, eval_, srs)


def test_kzg_batched(srs):
    gens = KZGPolyCommitmentGens(srs)
    polys = [F.encode_fr([random.randrange(FR_MOD) for _ in range(8)]) for _ in range(3)]
    comm = KZGBatchedCommitment.commit(polys, gens)
    z = random.randrange(FR_MOD)

    pt = Transcript(b"kzg_batch")
    proof = KZGBatchedEvalProof.prove(polys, z, gens, pt)
    vt = Transcript(b"kzg_batch")
    assert proof.verify(comm, z, gens, vt)

    # tampered eval fails
    proof.evals[0] = (proof.evals[0] + 1) % FR_MOD
    vt2 = Transcript(b"kzg_batch")
    assert not proof.verify(comm, z, gens, vt2)


def test_srs_save_load(srs, tmp_path):
    path = str(tmp_path / "srs.npz")
    srs.save_to_file(path)
    loaded = KZGSrs.load_from_file(path)
    assert loaded.size == srs.size
    assert loaded.tau_g2 == srs.tau_g2
    coeffs = F.encode_fr([7, 8])
    c1 = KZGCommitment.commit(coeffs, srs)
    c2 = KZGCommitment.commit(coeffs, loaded)
    assert c1.commitment == c2.commitment
