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




# ---------------------------------------------------------------------------
# large keyless-skew fixture (VERDICT r4 #10): a 2^LOG2-constraint circuit
# with the reference workload's shape — ~7 NNZ/constraint across A/B/C,
# Zipf-skewed column reuse (a few hot signals shared by many constraints,
# like the keyless circuit's hash-state wires), one public input.
# ---------------------------------------------------------------------------

def big_bytes(log2_cons: int, seed: int = 7):
    """Returns (r1cs_bytes, wtns_bytes, stats) for a satisfiable circuit.

    Wire order (circom): 0 = const 1, 1 = public input, then private
    wires. Constraint i: (sum A_i) * (sum B_i) = w_i where w_i is a fresh
    private wire, and A_i/B_i draw 2-4 terms each from earlier wires with
    a Zipf-like skew (earlier wires exponentially more popular).
    """
    import numpy as np

    n = 1 << log2_cons
    rng = np.random.default_rng(seed)

    n_terms_a = rng.integers(2, 5, size=n)
    n_terms_b = rng.integers(2, 5, size=n)

    # witness wires: [1, pub, d_0 .. d_{n-1}]; constraint i defines d_i
    # from wires < 2 + i. Zipf skew: popularity ~ 1/rank over available.
    pub = int(rng.integers(1, 1 << 61))
    w = np.empty(n + 2, dtype=object)
    w[0] = 1
    w[1] = pub

    rows_a, cols_a, vals_a = [], [], []
    rows_b, cols_b, vals_b = [], [], []

    def pick(avail: int, k: int):
        # Zipf-ish: x = floor(avail * u^4) biases toward low wire ids
        u = rng.random(k)
        return np.minimum((avail * u ** 4).astype(np.int64), avail - 1)

    coeff_pool = [int(rng.integers(1, 1 << 61)) for _ in range(64)]
    for i in range(n):
        avail = 2 + i
        ka, kb = int(n_terms_a[i]), int(n_terms_b[i])
        ca = pick(avail, ka)
        cb = pick(avail, kb)
        va = [coeff_pool[int(x) & 63] for x in rng.integers(0, 64, size=ka)]
        vb = [coeff_pool[int(x) & 63] for x in rng.integers(0, 64, size=kb)]
        sa = 0
        for c, v in zip(ca, va):
            sa += v * w[int(c)]
        sb = 0
        for c, v in zip(cb, vb):
            sb += v * w[int(c)]
        sa %= R
        sb %= R
        w[2 + i] = sa * sb % R
        rows_a.append(ca); vals_a.append(va)
        rows_b.append(cb); vals_b.append(vb)

    # serialize in circom emission order
    n_wires = n + 2
    nnz = int(n_terms_a.sum() + n_terms_b.sum() + n)
    header = (
        struct.pack("<I", 32) + R.to_bytes(32, "little")
        + struct.pack("<IIII", n_wires, 0, 1, n)  # nPubOut=0, nPubIn=1
        + struct.pack("<QI", n_wires, n)
    )
    out = []
    for i in range(n):
        ca, va = rows_a[i], vals_a[i]
        cb, vb = rows_b[i], vals_b[i]
        lc_a = struct.pack("<I", len(ca)) + b"".join(
            struct.pack("<I", int(c)) + fe(v) for c, v in zip(ca, va))
        lc_b = struct.pack("<I", len(cb)) + b"".join(
            struct.pack("<I", int(c)) + fe(v) for c, v in zip(cb, vb))
        lc_c = struct.pack("<I", 1) + struct.pack("<I", 2 + i) + fe(1)
        out.append(lc_a + lc_b + lc_c)
    constraints = b"".join(out)
    w2l = b"".join(struct.pack("<Q", i) for i in range(n_wires))
    r1cs = (b"r1cs" + struct.pack("<II", 1, 3)
            + section(1, header) + section(2, constraints) + section(3, w2l))

    wtns_header = struct.pack("<I", 32) + R.to_bytes(32, "little") \
        + struct.pack("<I", n_wires)
    wtns_vals = b"".join(fe(int(w[i])) for i in range(n_wires))
    wtns = (b"wtns" + struct.pack("<II", 2, 2)
            + section(1, wtns_header) + section(2, wtns_vals))
    stats = {"constraints": n, "wires": n_wires, "nnz": nnz}
    return r1cs, wtns, stats


def write_big(log2_cons: int, out_dir: str) -> None:
    r1cs, wtns, stats = big_bytes(log2_cons)
    os.makedirs(out_dir, exist_ok=True)
    rp = os.path.join(out_dir, f"skew_{log2_cons}.r1cs")
    wp = os.path.join(out_dir, f"skew_{log2_cons}.wtns")
    with open(rp, "wb") as f:
        f.write(r1cs)
    with open(wp, "wb") as f:
        f.write(wtns)
    print(f"wrote {rp} ({len(r1cs)/2**20:.1f} MB) + {wp} "
          f"({len(wtns)/2**20:.1f} MB): {stats}")


if __name__ == "__main__":
    import sys as _sys

    if len(_sys.argv) > 1 and _sys.argv[1] == "big":
        # tools/make_circom_fixture.py big LOG2 [out_dir]
        _log2 = int(_sys.argv[2]) if len(_sys.argv) > 2 else 16
        _out = _sys.argv[3] if len(_sys.argv) > 3 else "/tmp/spartan_fixtures"
        write_big(_log2, _out)
    else:
        main()
