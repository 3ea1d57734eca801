"""Keyless-circuit benchmark driver with phase-by-phase timing.

TPU-native counterpart of /root/reference/examples/keyless_benchmark.rs:
load .r1cs/.wtns -> convert (circom column remap) -> gens -> encode ->
instrumented SNARK prove -> verify -> report. Since the keyless circuit
files are not redistributable (the reference hardcodes absolute local
paths, keyless_benchmark.rs:32-33), `--synthetic LOG2` generates a random
satisfiable R1CS of that size instead.

Usage:
    python -m spartan_tpu.io.keyless_bench --r1cs main.r1cs --wtns w.wtns
    python -m spartan_tpu.io.keyless_bench --synthetic 10 [--pcs kzg]
"""

from __future__ import annotations

import argparse
import json
import random
import time

from spartan_tpu.io.r1cs_reader import R1CSFile, parse_wtns
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.snark import Assignment, Instance, SNARK, SNARKGens
from spartan_tpu.utils.math import log_2, next_power_of_two
from spartan_tpu.utils.random_tape import RandomTape
from spartan_tpu.utils.transcript import Transcript


def load_circom(r1cs_path: str, wtns_path: str):
    from spartan_tpu.core.r1cs import R1CSShape

    r = R1CSFile.from_file(r1cs_path)
    num_vars_padded = next_power_of_two(max(r.num_private_vars(), r.num_pub_inputs + 1))
    num_cons_padded = next_power_of_two(max(r.num_constraints, 2))
    A, B, C = r.to_sparse_matrices_padded(num_vars_padded)
    shape = R1CSShape(num_cons_padded, num_vars_padded, r.num_pub_inputs, A, B, C)
    inst = Instance.from_shape(shape)

    wit = parse_wtns(wtns_path)
    pubs = wit[1:1 + r.num_pub_inputs]
    privs = wit[1 + r.num_pub_inputs:]
    vars_ = Assignment(privs + [0] * (num_vars_padded - len(privs)))
    inputs = Assignment(pubs)
    max_nnz = max(len(shape.A.M), len(shape.B.M), len(shape.C.M))
    return inst, vars_, inputs, max_nnz


def synthetic(log2_cons: int, num_inputs: int = 1, nnz_per_row: int = 3, seed: int = 0):
    """Random satisfiable R1CS at 2^log2_cons constraints/variables."""
    from spartan_tpu.core.r1cs import R1CSShape

    rng = random.Random(seed)
    n = 1 << log2_cons
    vars_ = [rng.randrange(FR_MOD) for _ in range(n)]
    inputs = [rng.randrange(FR_MOD) for _ in range(num_inputs)]
    z = vars_ + [1] + inputs
    A, B, C = [], [], []
    for i in range(n):
        az = bz = 0
        for _ in range(nnz_per_row):
            ca, cb = rng.randrange(len(z)), rng.randrange(len(z))
            va, vb = rng.randrange(1, FR_MOD), rng.randrange(1, FR_MOD)
            A.append((i, ca, va))
            B.append((i, cb, vb))
            az = (az + va * z[ca]) % FR_MOD
            bz = (bz + vb * z[cb]) % FR_MOD
        C.append((i, n, az * bz % FR_MOD))
    shape = R1CSShape(n, n, num_inputs, A, B, C)
    max_nnz = max(len(A), len(B), len(C))
    return Instance.from_shape(shape), Assignment(vars_), Assignment(inputs), max_nnz


def verify_only(inst, vars_, inputs, max_nnz, load_dir: str,
                pcs: str = "hyrax", json_out: bool = False, reps: int = 3):
    """Re-time SNARK.verify against a proof + commitment saved by a prior
    ``run(..., save_dir=...)``: verifier changes can be measured in
    seconds instead of re-running the multi-minute encode+prove. The
    instance/gens are regenerated (deterministic), the proof and comm are
    loaded from their canonical bytes — so this also exercises the full
    adversarial deserialization path every time."""
    import os

    from spartan_tpu.core.r1cs import R1CSCommitment
    from spartan_tpu.utils.serialization import deserialize
    from spartan_tpu.utils.timer import Timer

    shape = inst.inst
    gens = SNARKGens(shape.num_cons, shape.num_vars, shape.num_inputs,
                     max_nnz, pcs=pcs)
    with open(os.path.join(load_dir, "proof.bin"), "rb") as f:
        proof = deserialize(SNARK, f.read(), pcs=pcs)
    with open(os.path.join(load_dir, "comm.bin"), "rb") as f:
        comm = deserialize(R1CSCommitment, f.read(), pcs=pcs)

    report: dict = {"num_cons": shape.num_cons, "pcs": pcs,
                    "mode": "verify_only", "reps": reps}
    times = []
    for i in range(reps):
        vt = Transcript(b"keyless_bench")
        Timer.collect()
        t0 = time.perf_counter()
        proof.verify(comm, inputs, vt, gens)
        times.append(time.perf_counter() - t0)
        if i == reps - 1:
            report["verify_phases"] = [
                {"depth": d, "label": lbl, "s": round(dt, 4)}
                for d, lbl, dt in Timer.records()]
        Timer.collect(False)
    report["verify_s"] = min(times)
    report["verify_s_all"] = [round(t, 4) for t in times]
    report["verified"] = True
    if json_out:
        print(json.dumps(report))
    else:
        print(f"  verify (best of {reps}): {min(times):.3f} s  all={times}")
    return report


def run(inst, vars_, inputs, max_nnz, pcs: str = "hyrax", json_out: bool = False,
        mesh_devices: int = 0, config=None, save_dir: str | None = None):
    import jax

    from spartan_tpu.config import SpartanConfig

    if config is None:
        config = SpartanConfig(pcs=pcs, mesh_devices=mesh_devices or None)
    pcs = config.pcs
    mesh_devices = config.mesh_devices or 0
    if config.profile:
        from spartan_tpu.utils.timer import Timer as _T

        _T.enable()

    mesh = None
    if mesh_devices > 1:
        from spartan_tpu.parallel import make_mesh

        mesh = make_mesh(mesh_devices)

    shape = inst.inst
    report: dict = {
        "num_cons": shape.num_cons, "num_vars": shape.num_vars,
        "num_inputs": shape.num_inputs,
        "nnz": [len(shape.A.M), len(shape.B.M), len(shape.C.M)],
        "pcs": pcs, "backend": jax.default_backend(),
        "mesh_devices": mesh_devices,
    }

    t0 = time.perf_counter()
    gens = SNARKGens(shape.num_cons, shape.num_vars, shape.num_inputs,
                     max_nnz, config=config)
    report["gens_s"] = time.perf_counter() - t0

    from spartan_tpu.utils.timer import Timer as _Timer

    t0 = time.perf_counter()
    _Timer.collect()
    comm, decomm = SNARK.encode(inst, gens, mesh=mesh)
    report["encode_s"] = time.perf_counter() - t0
    report["encode_phases"] = [
        {"depth": d, "label": lbl, "s": round(dt, 4)}
        for d, lbl, dt in _Timer.records()]
    _Timer.collect(False)

    from spartan_tpu.utils.timer import Timer

    t0 = time.perf_counter()
    tape = RandomTape(b"snark_proof")
    pt = Transcript(b"keyless_bench")
    Timer.collect()
    Timer.acc_reset()
    proof = SNARK.prove(inst, comm, decomm, vars_, inputs, gens, pt, tape,
                        mesh=mesh)
    report["prove_s"] = time.perf_counter() - t0
    report["prove_phases"] = [
        {"depth": d, "label": lbl, "s": round(dt, 4)}
        for d, lbl, dt in Timer.records()]
    report["prove_acc"] = [
        {"label": lbl, "s": round(v, 4)} for lbl, v in Timer.acc_records()]
    Timer.collect(False)

    t0 = time.perf_counter()
    vt = Transcript(b"keyless_bench")
    Timer.collect()
    proof.verify(comm, inputs, vt, gens)
    report["verify_s"] = time.perf_counter() - t0
    report["verify_phases"] = [
        {"depth": d, "label": lbl, "s": round(dt, 4)}
        for d, lbl, dt in Timer.records()]
    Timer.collect(False)
    report["verified"] = True

    from spartan_tpu.utils.serialization import size_bytes

    if save_dir is not None:
        import os

        from spartan_tpu.utils.serialization import serialize

        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "proof.bin"), "wb") as f:
            f.write(serialize(proof))
        with open(os.path.join(save_dir, "comm.bin"), "wb") as f:
            f.write(serialize(comm))

    report["proof_bytes"] = size_bytes(proof)
    # published reference sizes at keyless scale (BENCHMARK_RESULTS.md:86-92)
    report["ref_proof_bytes_keyless"] = 252_314 if pcs == "hyrax" else 120_422

    if json_out:
        print(json.dumps(report))
    else:
        print(f"  constraints 2^{log_2(shape.num_cons)}  vars 2^{log_2(shape.num_vars)}"
              f"  nnz {report['nnz']}  pcs={pcs}  backend={report['backend']}")
        for k in ("gens_s", "encode_s", "prove_s", "verify_s"):
            print(f"  {k:10s} {report[k]:9.2f}")
        print(f"  proof size {report['proof_bytes']/1024:.1f} KB "
              f"(reference at keyless 2^20 scale: "
              f"{report['ref_proof_bytes_keyless']/1024:.1f} KB)")
        print("  prove phase breakdown:")
        for ph in report["prove_phases"]:
            print(f"    {'  ' * ph['depth']}{ph['label']:40s} {ph['s']:9.2f} s")
        print("  verification: OK")
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--r1cs")
    ap.add_argument("--wtns")
    ap.add_argument("--synthetic", type=int, metavar="LOG2",
                    help="use a random satisfiable R1CS of 2^LOG2 constraints")
    ap.add_argument("--pcs", choices=("hyrax", "kzg"), default="hyrax")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="shard the prover over an N-device mesh")
    ap.add_argument("--profile", metavar="DIR",
                    help="capture a jax profiler trace of the prove phase")
    ap.add_argument("--save", metavar="DIR",
                    help="save proof.bin/comm.bin (canonical bytes) after prove")
    ap.add_argument("--verify-only", metavar="DIR",
                    help="skip encode/prove; load proof.bin/comm.bin from DIR "
                         "and time verification alone (requires the same "
                         "--synthetic/--r1cs instance arguments)")
    args = ap.parse_args()

    if args.synthetic is not None:
        data = synthetic(args.synthetic)
    elif args.r1cs and args.wtns:
        data = load_circom(args.r1cs, args.wtns)
    else:
        ap.error("provide --r1cs/--wtns or --synthetic LOG2")

    if args.verify_only:
        verify_only(*data, load_dir=args.verify_only, pcs=args.pcs,
                    json_out=args.json)
    elif args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            run(*data, pcs=args.pcs, json_out=args.json, mesh_devices=args.mesh,
                save_dir=args.save)
    else:
        run(*data, pcs=args.pcs, json_out=args.json, mesh_devices=args.mesh,
            save_dir=args.save)


if __name__ == "__main__":
    main()
