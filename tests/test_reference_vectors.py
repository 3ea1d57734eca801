"""Cross-library golden vectors (wire-format parity with the reference).

Constants below were derived from an INDEPENDENT pure-int BN254
implementation (not spartan_tpu code paths) following the reference's
specs: arkworks compressed-point serialization (scalar.rs:18-46,
group.rs:27-55), the Shake256 generator derivation
(commitments.rs:31-62 + group.rs:110-132), and bincode-1.x legacy struct
encoding for the shape digest (r1cs.rs:97-101). If any wire-format detail
drifts, these fail. The merlin STROBE challenge vector lives in
tests/test_transcript.py.
"""

import zlib

from spartan_tpu.core.commitments import MultiCommitGens, _gen_scalars_from_label
from spartan_tpu.core.group import GroupElem
from spartan_tpu.core.r1cs import R1CSShape
from spartan_tpu.ops import curve_host as CH
from spartan_tpu.ops.fields_host import FR_MOD, fr_from_bytes, fr_to_bytes

# -- arkworks compressed points (x LE, neg/inf flags in top bits of byte 31)

G_COMPRESSED = bytes.fromhex(
    "0100000000000000000000000000000000000000000000000000000000000000")
TWO_G_COMPRESSED = bytes.fromhex(
    "d3cf876dc108c2d3a81c8716a91678d9851518685b04859b021a132ee7440603")
NEG_G_COMPRESSED = bytes.fromhex(
    "0100000000000000000000000000000000000000000000000000000000000080")
INF_COMPRESSED = bytes.fromhex(
    "0000000000000000000000000000000000000000000000000000000000000040")

TWO_G = (1368015179489954701390400359078579693043519447331113978918064868415326638035,
         9918110051302171585080402603319702774565515993150576347155970296011118125764)
FIVE_G = (10744596414106452074759370245733544594153395043370666422502510773307029471145,
          848677436511517736191562425154572367705380862894644942948681172815252343932)


def test_compressed_point_vectors():
    assert CH.compress(CH.GEN) == G_COMPRESSED
    assert CH.compress(TWO_G) == TWO_G_COMPRESSED
    assert CH.compress(CH.neg(CH.GEN)) == NEG_G_COMPRESSED
    assert CH.compress(None) == INF_COMPRESSED
    assert CH.decompress(TWO_G_COMPRESSED) == TWO_G
    assert CH.decompress(NEG_G_COMPRESSED) == CH.neg(CH.GEN)
    assert CH.decompress(INF_COMPRESSED) is None
    assert CH.scalar_mul(2, CH.GEN) == TWO_G
    assert CH.scalar_mul(5, CH.GEN) == FIVE_G
    assert GroupElem.generator().compress() == G_COMPRESSED


def test_scalar_serialization_vectors():
    # 32-byte LE canonical form (scalar.rs:74-95)
    assert fr_to_bytes(1) == b"\x01" + b"\x00" * 31
    assert fr_to_bytes(FR_MOD - 1) == (FR_MOD - 1).to_bytes(32, "little")
    assert fr_from_bytes(fr_to_bytes(123456789)) == 123456789
    # non-canonical bytes (>= r) are rejected like Scalar::from_bytes
    assert fr_from_bytes(FR_MOD.to_bytes(32, "little")) is None
    assert fr_from_bytes(b"\xff" * 32) is None


# -- Shake256 generator derivation for label b"test-gens": scalar dlogs and
#    points from the reference's simplified hash-to-group, quirks included
#    (~81% of sha3 outputs exceed the 254-bit modulus, so the fallback chain
#    frequently bottoms out at scalar 1 = G — reproduced byte-for-byte).

TESTGENS_SCALARS = [
    1,
    7097051088552556124257959585041086008315232404432961181868178903484494468852,
    15913383347598842250756181833698136216190409992988259474751790231932830743894,
]
TESTGENS_POINTS = [
    (1, 2),
    (11928884856376391354048289349486212163947881698492490639870060183584937801518,
     15707832520327386611822236877368661498908348941241907687669549376380059319993),
    (8281214534749585655310694988066884264588893447058346944821100037904189184136,
     12772041667858081320480552479154413524043721671270093369286629354796484567729),
]


def test_generator_derivation_vectors():
    assert _gen_scalars_from_label(b"test-gens", 3) == TESTGENS_SCALARS
    gens = MultiCommitGens(2, b"test-gens")
    pts, h = gens.host_points()
    assert pts == TESTGENS_POINTS[:2]
    assert h == TESTGENS_POINTS[2]


def test_kzg_seeded_srs_compat_decision():
    """DOCUMENTED DECISION: seeded-SRS byte-compatibility with the
    reference is OUT OF SCOPE.

    The reference derives tau from a u64 seed via rand's StdRng
    (kzg.rs:58-63) — an explicitly NON-portable, version-pinned PRNG whose
    stream may change across rand releases, and which arkworks itself
    labels test-only. Matching it would tie this library's test SRS to one
    Rust dependency version with zero protocol value: a production SRS
    comes from a ceremony and is LOADED, not derived (KZGSrs.load_from_file
    — the interoperable path, covered by save/load round-trip tests).
    spartan_tpu derives its test tau by sha256 (pcs/kzg.py:75-84),
    deterministic per-library. If cross-library KZG *proof* checks are
    ever needed, export the reference's SRS to .npz and load it here.
    """
    from spartan_tpu.pcs.kzg import KZGSrs

    a = KZGSrs.setup_from_seed(4, 42)
    b = KZGSrs.setup_from_seed(4, 42)
    # deterministic per-library, independent of process
    import numpy as np

    assert np.array_equal(np.asarray(a.powers_g1[0]), np.asarray(b.powers_g1[0]))


def test_frozen_nizk_transcript_vector():
    """End-to-end wire-format drift pin: a tiny NIZK proved with a seeded
    tape must serialize to EXACTLY these frozen bytes (sha256) and leave
    the Fiat-Shamir transcript in exactly this state. Unlike the per-layer
    vectors above this covers every transcript label, challenge order,
    Σ-protocol response and serialization rule at once — any drift in any
    of them changes the hash. (Self-generated, so it pins against drift,
    not against the Rust reference; the per-layer vectors + merlin STROBE
    vector carry the cross-library burden.)"""
    import hashlib

    from spartan_tpu.io.keyless_bench import synthetic
    from spartan_tpu.snark import NIZK, NIZKGens
    from spartan_tpu.utils.random_tape import RandomTape
    from spartan_tpu.utils.serialization import serialize
    from spartan_tpu.utils.transcript import Transcript

    inst, vars_, inputs, _ = synthetic(4, seed=11)
    n = inst.inst.num_cons
    gens = NIZKGens(n, n, 1)
    pt = Transcript(b"golden_nizk")
    proof = NIZK.prove(inst, vars_, inputs, gens, pt,
                       RandomTape(b"nizk_proof", seed=bytes([42]) * 32))
    raw = serialize(proof)
    assert len(raw) == 4128
    assert hashlib.sha256(raw).hexdigest() == \
        "56a023e419d1c3c7e0b105c9c2a45dc193a4dc12c790904e122b600dfb5a7a43"
    assert pt.challenge_bytes(b"final", 16).hex() == \
        "454facfbe1d6d7bf9156b00071b08326"
    proof.verify(inst, inputs, Transcript(b"golden_nizk"), gens)


def test_shape_digest_bincode_vector():
    # 4 cons x 4 vars, 1 input, one entry per matrix: hand-built bincode
    # bytes per the bincode-1.x legacy spec (fixint LE, u64 Vec lengths)
    shape = R1CSShape(4, 4, 1, [(0, 0, 1)], [(1, 2, 3)], [(3, 4, 5)])

    def u64(v):
        return v.to_bytes(8, "little")

    expected = (
        u64(4) + u64(4) + u64(1)                       # num_cons/vars/inputs
        + u64(2) + u64(3)                              # A: num_vars_x=log2(4), num_vars_y=log2(8)
        + u64(1) + u64(0) + u64(0) + fr_to_bytes(1)    # A.M = [(0,0,1)]
        + u64(2) + u64(3)
        + u64(1) + u64(1) + u64(2) + fr_to_bytes(3)    # B.M = [(1,2,3)]
        + u64(2) + u64(3)
        + u64(1) + u64(3) + u64(4) + fr_to_bytes(5)    # C.M = [(3,4,5)]
    )
    assert shape.bincode_bytes() == expected
    # digest = zlib(bincode) at flate2's default level (r1cs.rs:97-101)
    assert shape.get_digest() == zlib.compress(expected, 6)


def test_rust_golden_proof_vector_decision():
    """DOCUMENTED DECISION: a Rust-executed golden proof vector is
    unavailable in this environment — recorded here so the scope is
    tested, not silent.

    The natural source of a reference-produced proof byte vector is the
    crate's own inline test rig (/root/reference/src/snark.rs:531-617,
    the tiny x*x=x SNARK/NIZK). Executing it requires cargo/rustc; this
    build image ships NO Rust toolchain (verified: `which cargo rustc`
    both empty), and the environment has zero network egress to fetch
    one. The cross-library burden therefore rests on:
      * the merlin STROBE golden vector (test_transcript.py) — pins the
        Fiat-Shamir stream against the actual Rust merlin crate;
      * per-layer vectors in this file (point/scalar serialization,
        Shake256 generator derivation, bincode digest) derived from an
        independent pure-int implementation;
      * the frozen NIZK transcript hash (drift pin, self-generated).
    If a Rust toolchain ever becomes available: `cargo test --release
    check_snark -- --nocapture` in /root/reference with a patch dumping
    `bincode::serialize(&proof)` yields the vector; add it beside the
    frozen hash above.
    """
    import shutil

    assert shutil.which("cargo") is None and shutil.which("rustc") is None, (
        "Rust toolchain appeared in this environment — replace this "
        "documented decision with a real Rust-executed proof vector "
        "(see docstring for the recipe)."
    )
