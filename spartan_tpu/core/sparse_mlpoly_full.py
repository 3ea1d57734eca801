"""The sparse-matrix evaluation proof (lookup argument) — SNARK mode.

TPU-native counterpart of /root/reference/src/sparse_mlpoly_full.rs, the
reference's largest and hottest component (80%+ of prove time,
SURVEY.md §2 row 15). Proves that committed sparse matrices A, B, C
evaluate to claimed values at (rx, ry) via offline memory checking:

- ``AddrTimestamps``: read/write timestamp counters — the reference's
  sequential per-op loop (sparse_mlpoly_full.rs:211-243) becomes a
  vectorized numpy rank-within-group computation at preprocessing time;
- ``Derefs``: gathers mem[addr] on device; its commitment is the flagship
  MSM (166 s / 79.6% of reference prove time);
- Reed-Solomon-style hash layer h(a,v,t) = t*r^2 + v*r + a - gamma as one
  fused device kernel;
- grand products of the multisets via batched product-tree proofs;
- hash-layer openings batched n-to-1 into three Hyrax opening proofs.

The derefs PCS is runtime-polymorphic (Hyrax default; KZG via
spartan_tpu.pcs.kzg) replacing the reference's compile-time feature flag.
Transcript labels and orders match the reference byte-for-byte.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.core.mle import DensePolynomial, EqPolynomial, IdentityPolynomial, batch_evaluate
from spartan_tpu.core.product_tree import (
    DotProductCircuit,
    ProductCircuit,
    ProductCircuitEvalProofBatched,
)
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.pcs.hyrax import PolyCommitment, PolyCommitmentGens, PolyEvalProof, commit_poly
from spartan_tpu.utils.errors import ProofVerifyError
from spartan_tpu.utils.math import log_2, next_power_of_two, pow2

fr = F.fr


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

@jax.jit
def k_hash_layer(addr, val, ts, r_hash, r_hash_sqr, gamma):
    """h(a,v,t) - gamma = t*r^2 + v*r + a - gamma, elementwise [N,16]."""
    h = fr.add(fr.add(fr.mul(ts, r_hash_sqr), fr.mul(val, r_hash)), addr)
    return fr.sub(h, gamma)


@jax.jit
def k_gather(mem, addr):
    """mem[addr] gather: mem [C,16], addr [N] int32 -> [N,16]."""
    return mem[addr]


# ---------------------------------------------------------------------------
# address timestamps (offline memory checking preprocessing)
# ---------------------------------------------------------------------------

class AddrTimestamps:
    """Read/write timestamps for a batch of address streams.

    Semantics match sparse_mlpoly_full.rs:211-243 exactly, including the
    audit counter carrying over BETWEEN instances. The per-op sequential
    loop is reformulated as rank-within-equal-address-runs over a stable
    sort — O(N log N) numpy at preprocessing, no loop-carried dependency.
    """

    def __init__(self, num_cells: int, num_ops: int, ops_addr: list[np.ndarray]):
        self.num_cells = num_cells
        self.num_ops = num_ops
        self.ops_addr_usize = [np.asarray(a, dtype=np.int64) for a in ops_addr]
        for a in self.ops_addr_usize:
            assert a.shape == (num_ops,)
            assert a.max(initial=0) < num_cells

        base = np.zeros(num_cells, dtype=np.int64)
        read_ts_list = []
        for addr in self.ops_addr_usize:
            order = np.argsort(addr, kind="stable")
            sa = addr[order]
            is_new = np.ones(num_ops, dtype=bool)
            if num_ops > 1:
                is_new[1:] = sa[1:] != sa[:-1]
            run_starts = np.flatnonzero(is_new)
            run_ids = np.cumsum(is_new) - 1
            rank = np.arange(num_ops) - run_starts[run_ids]
            read_sorted = base[sa] + rank
            read_ts = np.empty(num_ops, dtype=np.int64)
            read_ts[order] = read_sorted
            read_ts_list.append(read_ts)
            base += np.bincount(addr, minlength=num_cells)

        self.read_ts_usize = read_ts_list
        self.audit_ts_usize = base
        self._addr_dev = [jnp.asarray(a, dtype=jnp.int32) for a in self.ops_addr_usize]
        # device limb-form polynomials are derived data (lazily built from
        # the usize arrays, ~64B/element) — releasable between phases so a
        # 2^20-scale prove fits in 16 GB HBM
        self._poly_cache: dict = {}

    @property
    def ops_addr(self) -> list[DensePolynomial]:
        if "addr" not in self._poly_cache:
            self._poly_cache["addr"] = [
                DensePolynomial.from_usize(a) for a in self.ops_addr_usize]
        return self._poly_cache["addr"]

    @property
    def read_ts(self) -> list[DensePolynomial]:
        if "read" not in self._poly_cache:
            self._poly_cache["read"] = [
                DensePolynomial.from_usize(t) for t in self.read_ts_usize]
        return self._poly_cache["read"]

    @property
    def audit_ts(self) -> DensePolynomial:
        if "audit" not in self._poly_cache:
            self._poly_cache["audit"] = DensePolynomial.from_usize(self.audit_ts_usize)
        return self._poly_cache["audit"]

    def release_device(self) -> None:
        """Drop the cached limb-form tables (rebuilt on next access)."""
        self._poly_cache.clear()

    def fresh_addr_polys(self) -> list[DensePolynomial]:
        """Uncached limb tables (callers drop them; cache stays empty)."""
        return [DensePolynomial.from_usize(a) for a in self.ops_addr_usize]

    def fresh_read_polys(self) -> list[DensePolynomial]:
        return [DensePolynomial.from_usize(t) for t in self.read_ts_usize]

    def deref(self, mem_val_dev) -> list[DensePolynomial]:
        """Gather mem[addr] per instance (sparse_mlpoly_full.rs:245-257)."""
        return [DensePolynomial(k_gather(mem_val_dev, a)) for a in self._addr_dev]


# ---------------------------------------------------------------------------
# dense representation + commitment
# ---------------------------------------------------------------------------

class MultiSparseMatPolynomialAsDense:
    """row/col AddrTimestamps + vals + the two combined commitment polys
    (sparse_mlpoly_full.rs:264-280)."""

    def __init__(self, batch_size, row, col, val):
        self.batch_size = batch_size
        self.row = row
        self.col = col
        self.val = val
        self._comb_cache: dict = {}

    @property
    def comb_ops(self) -> DensePolynomial:
        if "ops" not in self._comb_cache:
            # UNCACHED pieces: at 2^20 scale the merge transient is ~8.6 GB
            # on its own; leaving 3.2 GB of addr/ts caches behind too would
            # not fit alongside the opening that follows
            self._comb_cache["ops"] = DensePolynomial.merge(
                self.row.fresh_addr_polys() + self.row.fresh_read_polys() +
                self.col.fresh_addr_polys() + self.col.fresh_read_polys() +
                self.val)
        return self._comb_cache["ops"]

    @property
    def comb_mem(self) -> DensePolynomial:
        if "mem" not in self._comb_cache:
            cm = self.row.audit_ts.clone()
            cm.extend(self.col.audit_ts)
            self._comb_cache["mem"] = cm
        return self._comb_cache["mem"]

    def release_device(self) -> None:
        """Drop combined + addr/ts device tables (lazily rebuilt)."""
        self._comb_cache.clear()
        self.row.release_device()
        self.col.release_device()

    def deref(self, row_mem_dev, col_mem_dev) -> "Derefs":
        return Derefs(self.row.deref(row_mem_dev), self.col.deref(col_mem_dev))


def multi_sparse_to_dense_rep(sparse_polys) -> MultiSparseMatPolynomialAsDense:
    """sparse_mlpoly_full.rs:120-174. sparse_polys: core SparseMatPolynomial."""
    assert sparse_polys
    nx = sparse_polys[0].num_vars_x
    ny = sparse_polys[0].num_vars_y
    for p in sparse_polys[1:]:
        assert p.num_vars_x == nx and p.num_vars_y == ny

    from spartan_tpu.utils.timer import Timer

    N = max(p.get_num_nz_entries() for p in sparse_polys)
    ops_row_vec, ops_col_vec, val_vec = [], [], []
    timer_vals = Timer(f"dense_rep_vals[N={N}]")
    for p in sparse_polys:
        n = len(p.vals)
        rows = np.zeros(N, dtype=np.int64)
        cols = np.zeros(N, dtype=np.int64)
        rows[:n] = p.rows
        cols[:n] = p.cols
        vals = list(p.vals) + [0] * (N - n)
        ops_row_vec.append(rows)
        ops_col_vec.append(cols)
        val_vec.append(DensePolynomial.from_ints(vals))
    timer_vals.stop()

    num_mem_cells = pow2(max(nx, ny))
    timer_ts = Timer("dense_rep_timestamps")
    row = AddrTimestamps(num_mem_cells, N, ops_row_vec)
    col = AddrTimestamps(num_mem_cells, N, ops_col_vec)
    timer_ts.stop()

    return MultiSparseMatPolynomialAsDense(len(sparse_polys), row, col, val_vec)


class SparseMatPolyCommitmentGens:
    """Hyrax gens for the ops/mem/derefs polys (sparse_mlpoly_full.rs:602-631).

    ``pcs``: 'hyrax' (default) or 'kzg' — selects the derefs commitment
    scheme, replacing the reference's compile-time feature flag.
    """

    def __init__(self, label: bytes, num_vars_x: int, num_vars_y: int,
                 num_nz_entries: int, batch_size: int, pcs: str = "hyrax",
                 kzg_srs=None):
        num_vars_ops = log_2(next_power_of_two(num_nz_entries)) + \
            log_2(next_power_of_two(batch_size * 5))
        num_vars_mem = max(num_vars_x, num_vars_y) + 1
        num_vars_derefs = log_2(next_power_of_two(num_nz_entries)) + \
            log_2(next_power_of_two(batch_size * 2))

        self.pcs = pcs
        self.gens_ops = PolyCommitmentGens(num_vars_ops, label)
        self.gens_mem = PolyCommitmentGens(num_vars_mem, label)
        if pcs == "hyrax":
            self.gens_derefs = PolyCommitmentGens(num_vars_derefs, label)
        else:
            from spartan_tpu.pcs.kzg import KZGPolyCommitmentGens, KZGSrs

            if kzg_srs is None:
                kzg_srs = KZGSrs.setup_from_seed(pow2(num_vars_derefs) + 1, 0xDEADBEEF)
            self.gens_derefs = KZGPolyCommitmentGens(kzg_srs)


@dataclass
class SparseMatPolyCommitment:
    batch_size: int
    num_ops: int
    num_mem_cells: int
    comm_comb_ops: PolyCommitment
    comm_comb_mem: PolyCommitment

    def append_to_transcript(self, _label: bytes, transcript) -> None:
        transcript.append_u64(b"batch_size", self.batch_size)
        transcript.append_u64(b"num_ops", self.num_ops)
        transcript.append_u64(b"num_mem_cells", self.num_mem_cells)
        self.comm_comb_ops.append_to_transcript(b"comm_comb_ops", transcript)
        self.comm_comb_mem.append_to_transcript(b"comm_comb_mem", transcript)


def multi_commit(sparse_polys, gens: SparseMatPolyCommitmentGens, mesh=None):
    """(commitment, dense rep) — the SNARK::encode hot path
    (sparse_mlpoly_full.rs:176-197)."""
    from spartan_tpu.utils.timer import Timer

    timer_dense = Timer("multi_sparse_to_dense_rep")
    dense = multi_sparse_to_dense_rep(sparse_polys)
    timer_dense.stop()
    timer_ops = Timer(f"commit_comb_ops[{dense.comb_ops.len}]")
    comm_comb_ops, _ = commit_poly(dense.comb_ops, gens.gens_ops, mesh=mesh)
    timer_ops.stop()
    timer_mem = Timer(f"commit_comb_mem[{dense.comb_mem.len}]")
    comm_comb_mem, _ = commit_poly(dense.comb_mem, gens.gens_mem, mesh=mesh)
    timer_mem.stop()
    dense.release_device()  # rebuilt lazily at prove time
    return (
        SparseMatPolyCommitment(
            batch_size=len(sparse_polys),
            num_mem_cells=dense.row.audit_ts.len,
            num_ops=dense.row.read_ts[0].len,
            comm_comb_ops=comm_comb_ops,
            comm_comb_mem=comm_comb_mem,
        ),
        dense,
    )


# ---------------------------------------------------------------------------
# derefs
# ---------------------------------------------------------------------------

class Derefs:
    def __init__(self, row_ops_val: list[DensePolynomial], col_ops_val: list[DensePolynomial]):
        assert len(row_ops_val) == len(col_ops_val)
        self.row_ops_val = row_ops_val
        self.col_ops_val = col_ops_val
        self._comb = None

    @property
    def comb(self) -> DensePolynomial:
        if self._comb is None:
            self._comb = DensePolynomial.merge(self.row_ops_val + self.col_ops_val)
        return self._comb

    def release_comb(self) -> None:
        self._comb = None

    def commit(self, gens, mesh=None) -> "DerefsCommitment":
        if isinstance(gens, PolyCommitmentGens):
            comm, _ = commit_poly(self.comb, gens, mesh=mesh)
            return DerefsCommitment(comm)
        comm = gens.commit(self.comb, mesh=mesh)
        return DerefsCommitment(comm)


def _derefs_comm_spec(ctx):
    if ctx.get("pcs", "hyrax") == "hyrax":
        return PolyCommitment
    from spartan_tpu.pcs.kzg import KZGPolyCommitment

    return KZGPolyCommitment


def _derefs_proof_spec(ctx):
    if ctx.get("pcs", "hyrax") == "hyrax":
        return PolyEvalProof
    from spartan_tpu.pcs.kzg import KZGPolyEvalProof

    return KZGPolyEvalProof


@dataclass
class DerefsCommitment:
    comm_ops_val: object  # PolyCommitment (Hyrax) or KZGPolyCommitment

    SCHEMA = {"comm_ops_val": _derefs_comm_spec}

    def append_to_transcript(self, label: bytes, transcript) -> None:
        transcript.append_message(b"derefs_commitment", b"begin_derefs_commitment")
        self.comm_ops_val.append_to_transcript(label, transcript)
        transcript.append_message(b"derefs_commitment", b"end_derefs_commitment")


def _n_to_one_reduction(evals: list[int], transcript, label_challenge: bytes):
    """Bind the per-instance claims to one joint claim via bot-variable folds
    (sparse_mlpoly_full.rs:382-397). Returns (challenges, joint_claim)."""
    challenges = transcript.challenge_vector(label_challenge, log_2(len(evals)))
    poly_evals = DensePolynomial.from_ints(evals)
    for c in reversed(challenges):
        poly_evals.bound_poly_var_bot(c)
    assert poly_evals.len == 1
    return challenges, poly_evals.first()


@dataclass
class DerefsEvalProof:
    """Joint opening of all deref MLEs at rand_ops
    (Hyrax: sparse_mlpoly_full.rs:362-482)."""

    proof_derefs: object  # PolyEvalProof or KZG proof object

    SCHEMA = {"proof_derefs": _derefs_proof_spec}

    PROTOCOL = b"Derefs evaluation proof"
    PROTOCOL_KZG = b"Derefs evaluation proof (KZG)"

    @staticmethod
    def _protocol_name(gens) -> bytes:
        """Hyrax and KZG modes bind distinct protocol names
        (sparse_mlpoly_full.rs:371 vs :500)."""
        return (DerefsEvalProof.PROTOCOL
                if isinstance(gens, PolyCommitmentGens)
                else DerefsEvalProof.PROTOCOL_KZG)

    @staticmethod
    def prove(derefs: Derefs, eval_row_ops_val: list[int], eval_col_ops_val: list[int],
              r: list[int], gens, transcript, random_tape,
              mesh=None) -> "DerefsEvalProof":
        transcript.append_protocol_name(DerefsEvalProof._protocol_name(gens))
        evals = list(eval_row_ops_val) + list(eval_col_ops_val)
        evals += [0] * (next_power_of_two(len(evals)) - len(evals))

        transcript.append_scalars(b"evals_ops_val", evals)
        challenges, joint_claim_eval = _n_to_one_reduction(
            evals, transcript, b"challenge_combine_n_to_one")
        r_joint = challenges + list(r)
        transcript.append_scalar(b"joint_claim_eval", joint_claim_eval)

        if isinstance(gens, PolyCommitmentGens):
            proof, _ = PolyEvalProof.prove(
                derefs.comb, None, r_joint, joint_claim_eval, None,
                gens, transcript, random_tape, mesh=mesh)
        else:
            proof = gens.prove_eval(derefs.comb, r_joint, joint_claim_eval, transcript,
                                    mesh=mesh)
        return DerefsEvalProof(proof)

    def verify(self, r: list[int], eval_row_ops_val: list[int], eval_col_ops_val: list[int],
               gens, comm: DerefsCommitment, transcript) -> None:
        transcript.append_protocol_name(DerefsEvalProof._protocol_name(gens))
        evals = list(eval_row_ops_val) + list(eval_col_ops_val)
        evals += [0] * (next_power_of_two(len(evals)) - len(evals))

        transcript.append_scalars(b"evals_ops_val", evals)
        challenges, joint_claim_eval = _n_to_one_reduction(
            evals, transcript, b"challenge_combine_n_to_one")
        r_joint = challenges + list(r)
        transcript.append_scalar(b"joint_claim_eval", joint_claim_eval)

        if isinstance(gens, PolyCommitmentGens):
            self.proof_derefs.verify_plain(
                gens, transcript, r_joint, joint_claim_eval, comm.comm_ops_val)
        else:
            gens.verify_eval(self.proof_derefs, comm.comm_ops_val, r_joint,
                             joint_claim_eval, transcript)


# ---------------------------------------------------------------------------
# hash + product layers
# ---------------------------------------------------------------------------

class ProductLayer:
    def __init__(self, init: ProductCircuit, read_vec, write_vec, audit: ProductCircuit):
        self.init = init
        self.read_vec = read_vec
        self.write_vec = write_vec
        self.audit = audit


class Layers:
    """Hash layer build + product circuits (sparse_mlpoly_full.rs:744-841)."""

    def __init__(self, eval_table_dev, addr_timestamps: AddrTimestamps,
                 poly_ops_val: list[DensePolynomial], r_mem_check: tuple[int, int],
                 mesh=None):
        r_hash, r_multiset_check = r_mem_check
        rh = F.encode_fr([r_hash])[0]
        rh2 = F.encode_fr([r_hash * r_hash % FR_MOD])[0]
        gam = F.encode_fr([r_multiset_check])[0]

        num_mem_cells = eval_table_dev.shape[0]
        num_ops = addr_timestamps.num_ops
        ident = F.encode_small_uints(np.arange(num_mem_cells, dtype=np.uint64))
        one = fr.one(())

        # big tables: pass LEAF GENERATOR closures so the product trees only
        # checkpoint their small upper layers (see ProductCircuit); the hash
        # leaves are regenerated per requested layer. The addr/read-ts
        # device tables are NOT captured (12 x num_ops limb tables =
        # 3.2 GB at keyless scale): each regeneration re-encodes them
        # from the host usize arrays (~50 ms per table) instead.
        lazy_ops = num_ops > ProductCircuit.CHECKPOINT_MAX
        lazy_mem = num_mem_cells > ProductCircuit.CHECKPOINT_MAX

        def init_leaves():
            zero_ts = fr.zeros((num_mem_cells,))
            return k_hash_layer(ident, eval_table_dev, zero_ts, rh, rh2, gam)

        def audit_leaves():
            return k_hash_layer(ident, eval_table_dev,
                                addr_timestamps.audit_ts.Z, rh, rh2, gam)

        def circuit(fn, lazy):
            if lazy:
                return ProductCircuit(leaf_fn=fn, mesh=mesh)
            return ProductCircuit(DensePolynomial(fn()))

        read_vec, write_vec = [], []
        at = addr_timestamps
        for i, derefs_p in enumerate(poly_ops_val):
            def read_leaves(i=i, d=derefs_p):
                a = F.encode_small_uints(at.ops_addr_usize[i])
                t = F.encode_small_uints(at.read_ts_usize[i])
                return k_hash_layer(a, d.Z, t, rh, rh2, gam)

            def write_leaves(i=i, d=derefs_p):
                a = F.encode_small_uints(at.ops_addr_usize[i])
                t = F.encode_small_uints(at.read_ts_usize[i])
                wts = fr.add(t, jnp.broadcast_to(one, t.shape))
                return k_hash_layer(a, d.Z, wts, rh, rh2, gam)

            read_vec.append(circuit(read_leaves, lazy_ops))
            write_vec.append(circuit(write_leaves, lazy_ops))

        self.prod_layer = ProductLayer(
            init=circuit(init_leaves, lazy_mem),
            read_vec=read_vec,
            write_vec=write_vec,
            audit=circuit(audit_leaves, lazy_mem),
        )


class PolyEvalNetwork:
    def __init__(self, dense: MultiSparseMatPolynomialAsDense, derefs: Derefs,
                 mem_rx_dev, mem_ry_dev, r_mem_check: tuple[int, int], mesh=None):
        self.row_layers = Layers(mem_rx_dev, dense.row, derefs.row_ops_val,
                                 r_mem_check, mesh=mesh)
        self.col_layers = Layers(mem_ry_dev, dense.col, derefs.col_ops_val,
                                 r_mem_check, mesh=mesh)


@dataclass
class HashLayerProof:
    """Openings of all hash-layer inputs at (rand_mem, rand_ops)
    (sparse_mlpoly_full.rs:872-1266)."""

    eval_row: tuple  # (addr_vec, read_ts_vec, audit_ts)
    eval_col: tuple
    eval_val: list[int]
    eval_derefs: tuple  # (row_ops_val, col_ops_val)
    proof_ops: PolyEvalProof
    proof_mem: PolyEvalProof
    proof_derefs: DerefsEvalProof

    _VI = ("vec", "int")
    SCHEMA = {
        "eval_row": ("tuple", _VI, _VI, "int"),
        "eval_col": ("tuple", _VI, _VI, "int"),
        "eval_derefs": ("tuple", _VI, _VI),
    }

    PROTOCOL = b"Sparse polynomial hash layer proof"

    @staticmethod
    def prove(rand: tuple[list[int], list[int]], dense: MultiSparseMatPolynomialAsDense,
              derefs: Derefs, gens: SparseMatPolyCommitmentGens, transcript, random_tape,
              mesh=None):
        from spartan_tpu.utils.timer import Timer

        transcript.append_protocol_name(HashLayerProof.PROTOCOL)
        rand_mem, rand_ops = rand

        timer_ev = Timer("hash_layer_batch_evals")
        eval_row_ops_val = batch_evaluate(derefs.row_ops_val, rand_ops)
        eval_col_ops_val = batch_evaluate(derefs.col_ops_val, rand_ops)
        timer_ev.stop()
        timer_derefs = Timer("derefs_eval_proof")
        proof_derefs = DerefsEvalProof.prove(
            derefs, eval_row_ops_val, eval_col_ops_val, rand_ops,
            gens.gens_derefs, transcript, random_tape, mesh=mesh)
        timer_derefs.stop()
        derefs.release_comb()
        eval_derefs = (eval_row_ops_val, eval_col_ops_val)

        # all ops-sized openings share one eq table each
        timer_opsev = Timer("ops_addr_ts_evals")
        ops_evals = batch_evaluate(
            dense.row.ops_addr + dense.row.read_ts +
            dense.col.ops_addr + dense.col.read_ts + dense.val, rand_ops)
        timer_opsev.stop()
        k = dense.batch_size
        eval_row_addr = ops_evals[0:k]
        eval_row_read_ts = ops_evals[k:2 * k]
        eval_col_addr = ops_evals[2 * k:3 * k]
        eval_col_read_ts = ops_evals[3 * k:4 * k]
        eval_val = ops_evals[4 * k:5 * k]
        mem_evals = batch_evaluate([dense.row.audit_ts, dense.col.audit_ts], rand_mem)
        eval_row_audit_ts, eval_col_audit_ts = mem_evals

        evals_ops = list(ops_evals)
        evals_ops += [0] * (next_power_of_two(len(evals_ops)) - len(evals_ops))
        transcript.append_scalars(b"claim_evals_ops", evals_ops)
        challenges_ops, joint_claim_eval_ops = _n_to_one_reduction(
            evals_ops, transcript, b"challenge_combine_n_to_one")
        r_joint_ops = challenges_ops + list(rand_ops)
        transcript.append_scalar(b"joint_claim_eval_ops", joint_claim_eval_ops)
        # the openings rebuild comb_ops (~8.6 GB merge transient at 2^20) —
        # drop the addr/ts caches used by the batched evals above first
        dense.row.release_device()
        dense.col.release_device()
        timer_ops = Timer("comb_ops_open")
        proof_ops, _ = PolyEvalProof.prove(
            dense.comb_ops, None, r_joint_ops, joint_claim_eval_ops, None,
            gens.gens_ops, transcript, random_tape, mesh=mesh)
        timer_ops.stop()

        evals_mem = [eval_row_audit_ts, eval_col_audit_ts]
        transcript.append_scalars(b"claim_evals_mem", evals_mem)
        challenges_mem, joint_claim_eval_mem = _n_to_one_reduction(
            evals_mem, transcript, b"challenge_combine_two_to_one")
        r_joint_mem = challenges_mem + list(rand_mem)
        transcript.append_scalar(b"joint_claim_eval_mem", joint_claim_eval_mem)
        timer_mem = Timer("comb_mem_open")
        proof_mem, _ = PolyEvalProof.prove(
            dense.comb_mem, None, r_joint_mem, joint_claim_eval_mem, None,
            gens.gens_mem, transcript, random_tape, mesh=mesh)
        timer_mem.stop()

        return HashLayerProof(
            eval_row=(eval_row_addr, eval_row_read_ts, eval_row_audit_ts),
            eval_col=(eval_col_addr, eval_col_read_ts, eval_col_audit_ts),
            eval_val=eval_val,
            eval_derefs=eval_derefs,
            proof_ops=proof_ops,
            proof_mem=proof_mem,
            proof_derefs=proof_derefs,
        )

    @staticmethod
    def _verify_helper(rand, claims, eval_ops_val, eval_ops_addr, eval_read_ts,
                       eval_audit_ts, r, r_hash, r_multiset_check):
        """Re-derive hashes from openings (sparse_mlpoly_full.rs:1048-1112)."""
        r_hash_sqr = r_hash * r_hash % FR_MOD

        def hash_func(addr, val, ts):
            return (ts * r_hash_sqr + val * r_hash + addr) % FR_MOD

        rand_mem, _rand_ops = rand
        claim_init, claim_read, claim_write, claim_audit = claims

        eval_init_addr = IdentityPolynomial(len(rand_mem)).evaluate(rand_mem)
        eval_init_val = EqPolynomial(r).evaluate(rand_mem)
        from spartan_tpu.utils.errors import fmt_claims

        h_init = (hash_func(eval_init_addr, eval_init_val, 0) - r_multiset_check) % FR_MOD
        if claim_init != h_init:
            raise ProofVerifyError(
                "hash layer: init claim mismatch: " + fmt_claims(
                    expected=h_init, got=claim_init,
                    init_addr=eval_init_addr, init_val=eval_init_val))
        h_audit = (hash_func(eval_init_addr, eval_init_val, eval_audit_ts) - r_multiset_check) % FR_MOD
        if claim_audit != h_audit:
            raise ProofVerifyError(
                "hash layer: audit claim mismatch: " + fmt_claims(
                    expected=h_audit, got=claim_audit, audit_ts=eval_audit_ts))
        for i in range(len(eval_ops_val)):
            hr = (hash_func(eval_ops_addr[i], eval_ops_val[i], eval_read_ts[i]) - r_multiset_check) % FR_MOD
            if claim_read[i] != hr:
                raise ProofVerifyError(
                    f"hash layer: read claim {i} mismatch: " + fmt_claims(
                        expected=hr, got=claim_read[i], addr=eval_ops_addr[i],
                        val=eval_ops_val[i], read_ts=eval_read_ts[i]))
            hw = (hash_func(eval_ops_addr[i], eval_ops_val[i], (eval_read_ts[i] + 1) % FR_MOD)
                  - r_multiset_check) % FR_MOD
            if claim_write[i] != hw:
                raise ProofVerifyError(
                    f"hash layer: write claim {i} mismatch: " + fmt_claims(
                        expected=hw, got=claim_write[i], addr=eval_ops_addr[i],
                        val=eval_ops_val[i], write_ts=(eval_read_ts[i] + 1) % FR_MOD))

    def verify(self, rand, claims_row, claims_col, claims_dotp,
               comm: SparseMatPolyCommitment, comm_derefs: DerefsCommitment,
               gens: SparseMatPolyCommitmentGens, rx, ry,
               r_hash: int, r_multiset_check: int, transcript) -> None:
        transcript.append_protocol_name(HashLayerProof.PROTOCOL)
        rand_mem, rand_ops = rand
        eval_row_ops_val, eval_col_ops_val = self.eval_derefs

        self.proof_derefs.verify(rand_ops, eval_row_ops_val, eval_col_ops_val,
                                 gens.gens_derefs, comm_derefs, transcript)

        eval_row_addr, eval_row_read_ts, eval_row_audit_ts = self.eval_row
        eval_col_addr, eval_col_read_ts, eval_col_audit_ts = self.eval_col

        HashLayerProof._verify_helper(
            (rand_mem, rand_ops), claims_row, eval_row_ops_val,
            eval_row_addr, eval_row_read_ts, eval_row_audit_ts,
            rx, r_hash, r_multiset_check)
        HashLayerProof._verify_helper(
            (rand_mem, rand_ops), claims_col, eval_col_ops_val,
            eval_col_addr, eval_col_read_ts, eval_col_audit_ts,
            ry, r_hash, r_multiset_check)

        # dotp claims must match the deref/val openings
        num_instances = len(eval_row_ops_val)
        assert len(claims_dotp) == 3 * num_instances
        for i in range(num_instances):
            if claims_dotp[3 * i] != eval_row_ops_val[i]:
                raise ProofVerifyError(f"hash layer: dotp left claim {i} mismatch")
            if claims_dotp[3 * i + 1] != eval_col_ops_val[i]:
                raise ProofVerifyError(f"hash layer: dotp right claim {i} mismatch")
            if claims_dotp[3 * i + 2] != self.eval_val[i]:
                raise ProofVerifyError(f"hash layer: dotp weight claim {i} mismatch")

        evals_ops = (list(eval_row_addr) + list(eval_row_read_ts) +
                     list(eval_col_addr) + list(eval_col_read_ts) + list(self.eval_val))
        evals_ops += [0] * (next_power_of_two(len(evals_ops)) - len(evals_ops))
        transcript.append_scalars(b"claim_evals_ops", evals_ops)
        challenges_ops, joint_claim_eval_ops = _n_to_one_reduction(
            evals_ops, transcript, b"challenge_combine_n_to_one")
        r_joint_ops = challenges_ops + list(rand_ops)
        transcript.append_scalar(b"joint_claim_eval_ops", joint_claim_eval_ops)
        self.proof_ops.verify_plain(gens.gens_ops, transcript, r_joint_ops,
                                    joint_claim_eval_ops, comm.comm_comb_ops)

        evals_mem = [eval_row_audit_ts, eval_col_audit_ts]
        transcript.append_scalars(b"claim_evals_mem", evals_mem)
        challenges_mem, joint_claim_eval_mem = _n_to_one_reduction(
            evals_mem, transcript, b"challenge_combine_two_to_one")
        r_joint_mem = challenges_mem + list(rand_mem)
        transcript.append_scalar(b"joint_claim_eval_mem", joint_claim_eval_mem)
        self.proof_mem.verify_plain(gens.gens_mem, transcript, r_joint_mem,
                                    joint_claim_eval_mem, comm.comm_comb_mem)


@dataclass
class ProductLayerProof:
    """Grand-product claims + batched layered sumchecks
    (sparse_mlpoly_full.rs:1292-1521)."""

    eval_row: tuple  # (init, read_vec, write_vec, audit)
    eval_col: tuple
    eval_val: tuple  # (dotp_left_vec, dotp_right_vec)
    proof_mem: ProductCircuitEvalProofBatched
    proof_ops: ProductCircuitEvalProofBatched

    _VI = ("vec", "int")
    SCHEMA = {
        "eval_row": ("tuple", "int", _VI, _VI, "int"),
        "eval_col": ("tuple", "int", _VI, _VI, "int"),
        "eval_val": ("tuple", _VI, _VI),
    }

    PROTOCOL = b"Sparse polynomial product layer proof"

    @staticmethod
    def prove(row_prod_layer: ProductLayer, col_prod_layer: ProductLayer,
              dense: MultiSparseMatPolynomialAsDense, derefs: Derefs,
              eval: list[int], transcript, mesh=None):
        transcript.append_protocol_name(ProductLayerProof.PROTOCOL)

        from spartan_tpu.core.product_tree import batch_circuit_evals, batch_dotp_evals

        kr = len(row_prod_layer.read_vec)
        vals = batch_circuit_evals(
            [row_prod_layer.init, row_prod_layer.audit] +
            list(row_prod_layer.read_vec) + list(row_prod_layer.write_vec))
        row_eval_init, row_eval_audit = vals[0], vals[1]
        row_eval_read = vals[2: 2 + kr]
        row_eval_write = vals[2 + kr:]

        ws = rs = 1
        for v in row_eval_write:
            ws = ws * v % FR_MOD
        for v in row_eval_read:
            rs = rs * v % FR_MOD
        assert row_eval_init * ws % FR_MOD == rs * row_eval_audit % FR_MOD

        transcript.append_scalar(b"claim_row_eval_init", row_eval_init)
        transcript.append_scalars(b"claim_row_eval_read", row_eval_read)
        transcript.append_scalars(b"claim_row_eval_write", row_eval_write)
        transcript.append_scalar(b"claim_row_eval_audit", row_eval_audit)

        kc = len(col_prod_layer.read_vec)
        vals = batch_circuit_evals(
            [col_prod_layer.init, col_prod_layer.audit] +
            list(col_prod_layer.read_vec) + list(col_prod_layer.write_vec))
        col_eval_init, col_eval_audit = vals[0], vals[1]
        col_eval_read = vals[2: 2 + kc]
        col_eval_write = vals[2 + kc:]

        ws = rs = 1
        for v in col_eval_write:
            ws = ws * v % FR_MOD
        for v in col_eval_read:
            rs = rs * v % FR_MOD
        assert col_eval_init * ws % FR_MOD == rs * col_eval_audit % FR_MOD

        transcript.append_scalar(b"claim_col_eval_init", col_eval_init)
        transcript.append_scalars(b"claim_col_eval_read", col_eval_read)
        transcript.append_scalars(b"claim_col_eval_write", col_eval_write)
        transcript.append_scalar(b"claim_col_eval_audit", col_eval_audit)

        # dotp circuits, interleaved (left_i, right_i) after a half split
        assert len(eval) == len(derefs.row_ops_val)
        dotp_circuits: list[DotProductCircuit] = []
        for i in range(len(derefs.row_ops_val)):
            circuit = DotProductCircuit(
                derefs.row_ops_val[i].clone(),
                derefs.col_ops_val[i].clone(),
                dense.val[i].clone(),
            )
            cl, cr = circuit.split()
            dotp_circuits.extend([cl, cr])
        dotp_vals = batch_dotp_evals(dotp_circuits)  # one round trip
        eval_dotp_left_vec, eval_dotp_right_vec = [], []
        for i in range(len(derefs.row_ops_val)):
            el, er = dotp_vals[2 * i], dotp_vals[2 * i + 1]
            transcript.append_scalar(b"claim_eval_dotp_left", el)
            transcript.append_scalar(b"claim_eval_dotp_right", er)
            assert (el + er) % FR_MOD == eval[i] % FR_MOD
            eval_dotp_left_vec.append(el)
            eval_dotp_right_vec.append(er)

        from spartan_tpu.utils.timer import Timer

        ops_circuits = (list(row_prod_layer.read_vec) + list(row_prod_layer.write_vec) +
                        list(col_prod_layer.read_vec) + list(col_prod_layer.write_vec))
        timer_ops_trees = Timer("ops_product_trees")
        # the dotp circuits are clone+split COPIES built above — hand
        # their buffers to the sumcheck so the LM path can free them
        proof_ops, rand_ops = ProductCircuitEvalProofBatched.prove(
            ops_circuits, dotp_circuits, transcript, mesh=mesh,
            own_dotp=True)
        timer_ops_trees.stop()

        mem_circuits = [row_prod_layer.init, row_prod_layer.audit,
                        col_prod_layer.init, col_prod_layer.audit]
        timer_mem_trees = Timer("mem_product_trees")
        proof_mem, rand_mem = ProductCircuitEvalProofBatched.prove(
            mem_circuits, [], transcript, mesh=mesh)
        timer_mem_trees.stop()

        return (
            ProductLayerProof(
                eval_row=(row_eval_init, row_eval_read, row_eval_write, row_eval_audit),
                eval_col=(col_eval_init, col_eval_read, col_eval_write, col_eval_audit),
                eval_val=(eval_dotp_left_vec, eval_dotp_right_vec),
                proof_mem=proof_mem,
                proof_ops=proof_ops,
            ),
            rand_mem,
            rand_ops,
        )

    def verify(self, num_ops: int, num_mem_cells: int, evals: list[int], transcript):
        """Returns (claims_mem, rand_mem, claims_ops, claims_dotp, rand_ops)."""
        transcript.append_protocol_name(ProductLayerProof.PROTOCOL)

        num_instances = len(evals)
        row_eval_init, row_eval_read, row_eval_write, row_eval_audit = self.eval_row
        col_eval_init, col_eval_read, col_eval_write, col_eval_audit = self.eval_col
        eval_dotp_left_vec, eval_dotp_right_vec = self.eval_val

        assert len(row_eval_read) == num_instances
        assert len(row_eval_write) == num_instances

        ws = rs = 1
        for v in row_eval_write:
            ws = ws * v % FR_MOD
        for v in row_eval_read:
            rs = rs * v % FR_MOD
        if row_eval_init * ws % FR_MOD != rs * row_eval_audit % FR_MOD:
            from spartan_tpu.utils.errors import fmt_claims

            raise ProofVerifyError(
                "product layer: row multiset check failed (init*W != R*audit): "
                + fmt_claims(init=row_eval_init, audit=row_eval_audit,
                             read=row_eval_read, write=row_eval_write))

        transcript.append_scalar(b"claim_row_eval_init", row_eval_init)
        transcript.append_scalars(b"claim_row_eval_read", row_eval_read)
        transcript.append_scalars(b"claim_row_eval_write", row_eval_write)
        transcript.append_scalar(b"claim_row_eval_audit", row_eval_audit)

        ws = rs = 1
        for v in col_eval_write:
            ws = ws * v % FR_MOD
        for v in col_eval_read:
            rs = rs * v % FR_MOD
        if col_eval_init * ws % FR_MOD != rs * col_eval_audit % FR_MOD:
            from spartan_tpu.utils.errors import fmt_claims

            raise ProofVerifyError(
                "product layer: col multiset check failed (init*W != R*audit): "
                + fmt_claims(init=col_eval_init, audit=col_eval_audit,
                             read=col_eval_read, write=col_eval_write))

        transcript.append_scalar(b"claim_col_eval_init", col_eval_init)
        transcript.append_scalars(b"claim_col_eval_read", col_eval_read)
        transcript.append_scalars(b"claim_col_eval_write", col_eval_write)
        transcript.append_scalar(b"claim_col_eval_audit", col_eval_audit)

        claims_dotp_circuit: list[int] = []
        for i in range(num_instances):
            if (eval_dotp_left_vec[i] + eval_dotp_right_vec[i]) % FR_MOD != evals[i] % FR_MOD:
                from spartan_tpu.utils.errors import fmt_claims

                raise ProofVerifyError(
                    f"product layer: dotp split check {i} failed "
                    "(left + right != claimed eval): " + fmt_claims(
                        left=eval_dotp_left_vec[i], right=eval_dotp_right_vec[i],
                        claimed=evals[i] % FR_MOD))
            transcript.append_scalar(b"claim_eval_dotp_left", eval_dotp_left_vec[i])
            transcript.append_scalar(b"claim_eval_dotp_right", eval_dotp_right_vec[i])
            claims_dotp_circuit.extend([eval_dotp_left_vec[i], eval_dotp_right_vec[i]])

        claims_prod_circuit = (list(row_eval_read) + list(row_eval_write) +
                               list(col_eval_read) + list(col_eval_write))

        claims_ops, claims_dotp, rand_ops = self.proof_ops.verify(
            claims_prod_circuit, claims_dotp_circuit, num_ops, transcript)

        claims_prod_mem = [row_eval_init, row_eval_audit, col_eval_init, col_eval_audit]
        claims_mem, _, rand_mem = self.proof_mem.verify(
            claims_prod_mem, [], num_mem_cells, transcript)

        return claims_mem, rand_mem, claims_ops, claims_dotp, rand_ops


@dataclass
class PolyEvalNetworkProof:
    proof_prod_layer: ProductLayerProof
    proof_hash_layer: HashLayerProof

    PROTOCOL = b"Sparse polynomial evaluation proof"

    @staticmethod
    def prove(network: PolyEvalNetwork, dense: MultiSparseMatPolynomialAsDense,
              derefs: Derefs, evals: list[int], gens: SparseMatPolyCommitmentGens,
              transcript, random_tape, mesh=None) -> "PolyEvalNetworkProof":
        from spartan_tpu.utils.timer import Timer

        transcript.append_protocol_name(PolyEvalNetworkProof.PROTOCOL)
        timer_prod = Timer("product_layer_proof")
        proof_prod_layer, rand_mem, rand_ops = ProductLayerProof.prove(
            network.row_layers.prod_layer, network.col_layers.prod_layer,
            dense, derefs, evals, transcript, mesh=mesh)
        timer_prod.stop()
        timer_hash = Timer("hash_layer_proof")
        proof_hash_layer = HashLayerProof.prove(
            (rand_mem, rand_ops), dense, derefs, gens, transcript, random_tape,
            mesh=mesh)
        timer_hash.stop()
        return PolyEvalNetworkProof(proof_prod_layer, proof_hash_layer)

    def verify(self, comm: SparseMatPolyCommitment, comm_derefs: DerefsCommitment,
               evals: list[int], gens: SparseMatPolyCommitmentGens,
               rx: list[int], ry: list[int], r_mem_check: tuple[int, int],
               nz: int, transcript) -> None:
        transcript.append_protocol_name(PolyEvalNetworkProof.PROTOCOL)
        num_instances = len(evals)
        r_hash, r_multiset_check = r_mem_check
        num_ops = next_power_of_two(nz)
        num_mem_cells = comm.num_mem_cells

        from spartan_tpu.utils.timer import Timer

        with Timer("v_product_layer"):
            claims_mem, rand_mem, claims_ops, claims_dotp, rand_ops = \
                self.proof_prod_layer.verify(
                    num_ops, num_mem_cells, evals, transcript)
        assert len(claims_mem) == 4
        assert len(claims_ops) == 4 * num_instances

        claims_row = (claims_mem[0], claims_ops[:num_instances],
                      claims_ops[num_instances:2 * num_instances], claims_mem[1])
        claims_col = (claims_mem[2], claims_ops[2 * num_instances:3 * num_instances],
                      claims_ops[3 * num_instances:4 * num_instances], claims_mem[3])

        with Timer("v_hash_layer"):
            self.proof_hash_layer.verify(
                (rand_mem, rand_ops), claims_row, claims_col, claims_dotp,
                comm, comm_derefs, gens, rx, ry, r_hash, r_multiset_check,
                transcript)


def equalize(rx: list[int], ry: list[int]) -> tuple[list[int], list[int]]:
    """Zero-prefix the shorter point (sparse_mlpoly_full.rs:1681-1697)."""
    if len(rx) < len(ry):
        return [0] * (len(ry) - len(rx)) + list(rx), list(ry)
    if len(rx) > len(ry):
        return list(rx), [0] * (len(rx) - len(ry)) + list(ry)
    return list(rx), list(ry)


@dataclass
class SparseMatPolyEvalProof:
    comm_derefs: DerefsCommitment
    poly_eval_network_proof: PolyEvalNetworkProof

    PROTOCOL = b"Sparse polynomial evaluation proof"

    @staticmethod
    def prove(dense: MultiSparseMatPolynomialAsDense, rx: list[int], ry: list[int],
              evals: list[int], gens: SparseMatPolyCommitmentGens,
              transcript, random_tape, mesh=None) -> "SparseMatPolyEvalProof":
        transcript.append_protocol_name(SparseMatPolyEvalProof.PROTOCOL)
        assert len(evals) == dense.batch_size

        from spartan_tpu.utils.timer import Timer

        timer_eq = Timer("eq_poly_evals")
        rx_ext, ry_ext = equalize(rx, ry)
        mem_rx = EqPolynomial(rx_ext).evals_device()
        mem_ry = EqPolynomial(ry_ext).evals_device()
        timer_eq.stop()

        timer_deref = Timer("derefs_compute")
        derefs = dense.deref(mem_rx, mem_ry)
        timer_deref.stop()

        # ** the flagship MSM: 79.6% of reference prove time **
        timer_commit = Timer("derefs_commitment")
        comm_derefs = derefs.commit(gens.gens_derefs, mesh=mesh)
        comm_derefs.append_to_transcript(b"comm_poly_row_col_ops_val", transcript)
        timer_commit.stop()
        derefs.release_comb()  # rebuilt for the hash-layer opening

        r_mem_check = transcript.challenge_vector(b"challenge_r_hash", 2)
        timer_net = Timer("network_construction")
        net = PolyEvalNetwork(dense, derefs, mem_rx, mem_ry,
                              (r_mem_check[0], r_mem_check[1]), mesh=mesh)
        timer_net.stop()
        timer_proof = Timer("network_proof")
        network_proof = PolyEvalNetworkProof.prove(
            net, dense, derefs, evals, gens, transcript, random_tape, mesh=mesh)
        timer_proof.stop()
        dense.release_device()
        return SparseMatPolyEvalProof(comm_derefs, network_proof)

    def verify(self, comm: SparseMatPolyCommitment, rx: list[int], ry: list[int],
               evals: list[int], gens: SparseMatPolyCommitmentGens, transcript) -> None:
        transcript.append_protocol_name(SparseMatPolyEvalProof.PROTOCOL)
        rx_ext, ry_ext = equalize(rx, ry)
        nz, num_mem_cells = comm.num_ops, comm.num_mem_cells
        assert pow2(len(rx_ext)) == num_mem_cells

        self.comm_derefs.append_to_transcript(b"comm_poly_row_col_ops_val", transcript)
        r_mem_check = transcript.challenge_vector(b"challenge_r_hash", 2)
        self.poly_eval_network_proof.verify(
            comm, self.comm_derefs, evals, gens, rx_ext, ry_ext,
            (r_mem_check[0], r_mem_check[1]), nz, transcript)
