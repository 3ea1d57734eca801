"""Merlin/STROBE bit-compatibility — the backbone of proof compatibility.

The golden vector is the merlin crate's own test
(transcript "test protocol" / "some label" / "some data"), which the
reference relies on transitively (/root/reference/src/transcript.rs:6).
"""

from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.utils.random_tape import RandomTape
from spartan_tpu.utils.transcript import Transcript


def test_merlin_golden_vector():
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    cb = t.challenge_bytes(b"challenge", 32)
    assert cb.hex() == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_transcript_determinism_and_divergence():
    def run(msg):
        t = Transcript(b"proto")
        t.append_scalar(b"s", 42)
        t.append_message(b"m", msg)
        return t.challenge_scalar(b"c")

    a, b = run(b"x"), run(b"x")
    assert a == b
    assert run(b"y") != a
    assert 0 <= a < FR_MOD


def test_challenge_vector_differs_per_draw():
    t = Transcript(b"proto")
    v = t.challenge_vector(b"v", 4)
    assert len(set(v)) == 4


def test_append_point_affects_challenge():
    t1 = Transcript(b"p")
    t1.append_point(b"pt", bytes(32))
    t2 = Transcript(b"p")
    t2.append_point(b"pt", bytes(31) + b"\x40")
    assert t1.challenge_scalar(b"c") != t2.challenge_scalar(b"c")


def test_random_tape_seeded_reproducible():
    a = RandomTape(b"tape", seed=b"\x01" * 32)
    b = RandomTape(b"tape", seed=b"\x01" * 32)
    assert a.random_vector(b"v", 3) == b.random_vector(b"v", 3)
    c = RandomTape(b"tape", seed=b"\x02" * 32)
    assert a.random_scalar(b"x") != c.random_scalar(b"x")
