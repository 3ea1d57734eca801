"""Generate tests/fixtures/multiplier2.{r1cs,wtns} — circom-layout fixtures.

No circom binary exists in this build image (zero network egress), so the
classic tutorial circuit

    template Multiplier2() {
        signal input a;        // private
        signal input b;        // private
        signal output c;       // public output
        c <== a*b;
    }

is assembled byte-by-byte here EXACTLY as circom 2.x emits it — NOT via
spartan_tpu's own writers (spartan_tpu/io/r1cs_reader.py:write_r1cs), so
the parser is tested against an independent rendering of the format:

  * r1cs: magic "r1cs", version 1, THREE sections in circom's emission
    order (1 header, 2 constraints, 3 wire2label map — the repo writer
    emits only two);
  * circom wire order: 0 = const 1, then public outputs, public inputs,
    private inputs (wire2label identity for this circuit);
  * the c <== a*b constraint compiles to A=[(a, r-1)], B=[(b, 1)],
    C=[(c, r-1)]  ((-a)*(b) - (-c) = 0) — negative coefficients exercise
    the canonical-value path;
  * wtns: magic "wtns", version 2, sections 1 (header: n8, prime, count)
    and 2 (values), witness [1, c, a, b] for a=3, b=11.

Format reference: iden3 r1csfile/wtns binary specs, as consumed by
/root/reference/src/r1cs_reader.rs:27-140 and
/root/reference/examples/keyless_benchmark.rs:38-72.
"""

from __future__ import annotations

import os
import struct

R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

A_WIRE, B_WIRE, C_WIRE = 2, 3, 1  # const=0, pubout c=1, priv a=2, priv b=3


def fe(v: int) -> bytes:
    return (v % R).to_bytes(32, "little")


def section(sid: int, body: bytes) -> bytes:
    return struct.pack("<IQ", sid, len(body)) + body


def r1cs_bytes() -> bytes:
    header = (
        struct.pack("<I", 32) + R.to_bytes(32, "little")
        + struct.pack("<IIII", 4, 1, 0, 2)   # nWires, nPubOut, nPubIn, nPrvIn
        + struct.pack("<QI", 4, 1)           # nLabels, nConstraints
    )
    lc_a = struct.pack("<I", 1) + struct.pack("<I", A_WIRE) + fe(-1)
    lc_b = struct.pack("<I", 1) + struct.pack("<I", B_WIRE) + fe(1)
    lc_c = struct.pack("<I", 1) + struct.pack("<I", C_WIRE) + fe(-1)
    constraints = lc_a + lc_b + lc_c
    wire2label = b"".join(struct.pack("<Q", i) for i in range(4))
    return (b"r1cs" + struct.pack("<II", 1, 3)
            + section(1, header) + section(2, constraints)
            + section(3, wire2label))


def wtns_bytes(a: int = 3, b: int = 11) -> bytes:
    header = struct.pack("<I", 32) + R.to_bytes(32, "little") + struct.pack("<I", 4)
    values = fe(1) + fe(a * b) + fe(a) + fe(b)  # [1, c, a, b]
    return (b"wtns" + struct.pack("<II", 2, 2)
            + section(1, header) + section(2, values))


def main() -> None:
    fixdir = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    os.makedirs(fixdir, exist_ok=True)
    with open(os.path.join(fixdir, "multiplier2.r1cs"), "wb") as f:
        f.write(r1cs_bytes())
    with open(os.path.join(fixdir, "multiplier2.wtns"), "wb") as f:
        f.write(wtns_bytes())
    print("wrote tests/fixtures/multiplier2.{r1cs,wtns}")


if __name__ == "__main__":
    main()
