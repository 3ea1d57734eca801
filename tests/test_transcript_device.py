"""Device-side merlin transcript + fused sumcheck equivalence tests.

The fused path is what ships on the TPU (sumcheck_fused.fused_enabled),
so these tests force it on the CPU backend and pin it bit-for-bit against
the host transcript (itself pinned to the merlin golden vector in
test_transcript.py) and the classic per-round sumcheck driver.
"""

import secrets

import numpy as np
import pytest

import jax.numpy as jnp

from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.ops.keccak import _keccak_f1600_bytes_py
from spartan_tpu.utils.strobe import Strobe128
from spartan_tpu.utils.transcript import Transcript


def test_keccak_f1600_device_matches_host():
    from spartan_tpu.ops.transcript_device import keccak_f1600_state

    rng = np.random.default_rng(7)
    for _ in range(3):
        st = rng.integers(0, 256, 200).astype(np.uint8)
        ref = bytearray(st.tobytes())
        _keccak_f1600_bytes_py(ref)
        got = np.asarray(keccak_f1600_state(jnp.asarray(st)))
        assert got.tobytes() == bytes(ref)


@pytest.mark.parametrize("dynamic", [False, True])
def test_strobe_device_matches_host(dynamic):
    from spartan_tpu.ops.transcript_device import (
        DeviceStrobe, DynStrobe, _const_u8)

    rng = np.random.default_rng(11)
    h = Strobe128(b"Merlin v1.0")
    st0 = jnp.asarray(np.frombuffer(bytes(h.state), np.uint8))
    d = DynStrobe(st0, h.pos, h.pos_begin) if dynamic \
        else DeviceStrobe(st0, h.pos, h.pos_begin, h.cur_flags)
    for _ in range(40):
        op = rng.integers(0, 3)
        data = secrets.token_bytes(int(rng.integers(1, 150)))
        if op == 0:
            h.meta_ad(data, False)
            d.meta_ad_op(data) if dynamic else d.meta_ad(_const_u8(data), False)
        elif op == 1:
            h.ad(data, False)
            d.ad_op(data) if dynamic else d.ad(_const_u8(data), False)
        else:
            n = int(rng.integers(1, 100))
            hb = h.prf(n, False)
            db = d.prf(n) if dynamic else d.prf(n, False)
            assert hb == np.asarray(db).tobytes()
    assert bytes(h.state) == np.asarray(d.state).tobytes()
    assert h.pos == int(d.pos)
    assert h.pos_begin == int(d.pos_begin)


def test_device_transcript_challenge_scalar():
    from spartan_tpu.ops.transcript_device import DeviceTranscript

    t = Transcript(b"device parity")
    st, pos, pb, cf = DeviceTranscript.export_host_state(t)
    dt = DeviceTranscript.from_state(jnp.asarray(st), pos, pb, cf)
    s = 98765432123456789 ** 3 % FR_MOD
    t.append_scalar(b"sc", s)
    dt.append_scalar(b"sc", F.encode_fr([s])[0])
    t.append_message(b"m", b"hello")
    dt.append_message(b"m", b"hello")
    assert t.challenge_scalar(b"ch") == F.decode_fr(
        dt.challenge_scalar(b"ch")[None])[0]
    assert bytes(t.strobe.state) == np.asarray(dt.state).tobytes()


@pytest.mark.parametrize("n,nP,nS", [
    (64, 3, 0), (32, 2, 2), (128, 12, 6),
    # > SMALL_BUCKET_N: exercises the staged shrinking-buffer chain
    # (one k=1 stage, one k=2 stage) ahead of the dynamic-round tail
    (8192, 1, 0), (16384, 1, 1),
])
def test_fused_sumcheck_bit_identical(n, nP, nS):
    from spartan_tpu.core import mle
    from spartan_tpu.core import sumcheck_fused as SF
    from spartan_tpu.core.sumcheck import SumcheckInstanceProof

    rng = np.random.default_rng(n + nP)

    def dpoly():
        return mle.DensePolynomial(F.encode_small_uints(
            rng.integers(1, 1 << 32, size=n, dtype=np.uint64)))

    A = [dpoly() for _ in range(nP + nS)]
    B = [dpoly() for _ in range(nP + nS)]
    Cp = dpoly()
    Cs = [dpoly() for _ in range(nS)]
    claim = int(rng.integers(1, 1 << 60))
    coeffs = [int(rng.integers(1, 1 << 60)) for _ in range(nP + nS)]
    R = int(np.log2(n))

    results = []
    states = []
    old = SF.FUSED
    try:
        for fused in (True, False):
            SF.FUSED = fused
            tr = Transcript(b"fused equiv")
            res = SumcheckInstanceProof.prove_cubic_batched(
                claim, R, (A[:nP], B[:nP], Cp), (A[nP:], B[nP:], Cs),
                coeffs, tr)
            results.append(res)
            states.append(bytes(tr.strobe.state))
    finally:
        SF.FUSED = old

    p1, p2 = results
    assert [q.coeffs_except_linear_term for q in p1[0].compressed_polys] == \
           [q.coeffs_except_linear_term for q in p2[0].compressed_polys]
    assert p1[1] == p2[1]  # challenges
    assert p1[2] == p2[2] and p1[3] == p2[3]  # claims
    assert states[0] == states[1]
