"""Sparse multilinear polynomials for the R1CS A/B/C matrices.

TPU-native counterpart of /root/reference/src/sparse_mlpoly.rs. Entries are
stored as numpy index arrays + one exact value list (array-native — no
per-entry Python objects; the keyless circuit has 7.1M entries), with ONE
Montgomery device copy of the values and int32 permutations for each access
order. Both access orders are precomputed on host at construction (sorted
by row and by column, with segment boundaries). Every device operation is:

    gather -> field multiply -> inclusive field-add scan -> static
    boundary difference

which is exact (every partial sum is reduced mod p), has no scatter and no
per-segment multiplicity limit — the TPU-native replacement for the
reference's sequential scatter-accumulate loops (sparse_mlpoly.rs:77-87,
145-160).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.core.mle import DensePolynomial, EqPolynomial
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.ops.limbs import NUM_LIMBS
from spartan_tpu.ops.scan import inclusive_scan

fr = F.fr


@jax.jit
def _k_segment_sums_perm(vals, weights, widx, perm, starts, ends):
    """Per-segment sums of val_i * weights[widx_i], in `perm` order.

    vals [N,16] Montgomery (natural order); perm [N] gathers them into
    segment-sorted order; starts/ends [S] index the prefix array. One
    gather + one field mul + one log-depth field-add scan + boundary diffs.
    """
    prods = fr.mul(vals[perm], weights[widx[perm]])
    unit = jnp.zeros((NUM_LIMBS,), jnp.uint32)
    S = inclusive_scan(fr.add, prods, unit)
    zero = jnp.zeros((1, NUM_LIMBS), jnp.uint32)
    P = jnp.concatenate([zero, S], axis=0)
    return fr.sub(P[ends], P[starts])


@jax.jit
def _k_gather_mul3(vals, eq_x, eq_y, rows, cols):
    """sum_i val_i * eq_x[row_i] * eq_y[col_i] (one field reduction)."""
    t = fr.mul(fr.mul(vals, eq_x[rows]), eq_y[cols])
    return fr.reduce_sum(t, axis=0)


class SparseMatEntry:
    """Compatibility view of one entry (sparse_mlpoly.rs:10-32)."""

    __slots__ = ("row", "col", "val")

    def __init__(self, row: int, col: int, val: int):
        self.row = row
        self.col = col
        self.val = val % FR_MOD


class _EntriesView:
    """Lazy sequence facade over the array storage (len / index / iterate)."""

    def __init__(self, poly: "SparseMatPolynomial"):
        self._p = poly

    def __len__(self):
        return len(self._p.vals)

    def __getitem__(self, i):
        return SparseMatEntry(int(self._p.rows[i]), int(self._p.cols[i]), self._p.vals[i])

    def __iter__(self):
        for r, c, v in zip(self._p.rows.tolist(), self._p.cols.tolist(), self._p.vals):
            yield SparseMatEntry(r, c, v)


class SparseMatPolynomial:
    """MLE of a sparse matrix (sparse_mlpoly.rs:36-181), device-accelerated."""

    def __init__(self, num_vars_x: int, num_vars_y: int, entries=None, *,
                 rows=None, cols=None, vals=None):
        self.num_vars_x = num_vars_x
        self.num_vars_y = num_vars_y
        if entries is not None:
            rows = np.asarray([e.row for e in entries], dtype=np.int64)
            cols = np.asarray([e.col for e in entries], dtype=np.int64)
            vals = [e.val for e in entries]
        self.rows = np.asarray(rows, dtype=np.int64)
        self.cols = np.asarray(cols, dtype=np.int64)
        self.vals = [v % FR_MOD for v in vals]
        self.M = _EntriesView(self)

        n = len(self.vals)
        self._order_r = np.argsort(self.rows, kind="stable")
        self._order_c = np.argsort(self.cols, kind="stable")
        self._rows_sorted = self.rows[self._order_r]
        self._cols_sorted = self.cols[self._order_c]

        # lazy device state (one Montgomery copy of values + permutations)
        self._dev = None
        self._bnd_cache: dict = {}

    @staticmethod
    def from_arrays(num_vars_x: int, num_vars_y: int, rows, cols, vals) -> "SparseMatPolynomial":
        return SparseMatPolynomial(num_vars_x, num_vars_y,
                                   rows=rows, cols=cols, vals=vals)

    def _device(self):
        if self._dev is None:
            n = len(self.vals)
            vals_mont = F.encode_fr(self.vals) if n else fr.zeros((0,))
            self._dev = {
                "vals": vals_mont,
                "rows": jnp.asarray(self.rows, dtype=jnp.int32),
                "cols": jnp.asarray(self.cols, dtype=jnp.int32),
                "perm_r": jnp.asarray(self._order_r, dtype=jnp.int32),
                "perm_c": jnp.asarray(self._order_c, dtype=jnp.int32),
            }
        return self._dev

    def release_device(self) -> None:
        """Drop the cached device copies (values + permutations); rebuilt
        lazily on next use. The SNARK prover releases the A/B/C device
        state (~650 MB at keyless scale) before the lookup argument, whose
        working set is the 16 GB chip's limiting factor."""
        self._dev = None

    def num_entries(self) -> int:
        return len(self.vals)

    def get_num_nz_entries(self) -> int:
        """Padded nnz (sparse_mlpoly_full.rs:74), floored at 2: the lookup
        argument builds product trees over the ops tables, and a 1-entry
        tree has zero layers (the reference's ProductCircuit::new underflows
        `0..num_layers - 1` there, product_tree.rs:49 — it cannot prove a
        1-nnz matrix at all; padding one zero term keeps tiny circuits
        provable without changing any real workload's sizes)."""
        from spartan_tpu.utils.math import next_power_of_two

        return max(2, next_power_of_two(len(self.vals)))

    def _boundaries(self, axis: str, num_segments: int):
        key = (axis, num_segments)
        if key not in self._bnd_cache:
            keys = self._rows_sorted if axis == "row" else self._cols_sorted
            starts = np.searchsorted(keys, np.arange(num_segments), side="left")
            ends = np.searchsorted(keys, np.arange(num_segments), side="right")
            self._bnd_cache[key] = (jnp.asarray(starts, jnp.int32),
                                    jnp.asarray(ends, jnp.int32))
        return self._bnd_cache[key]

    def multiply_vec_device(self, num_rows: int, z_mont) -> jnp.ndarray:
        """M @ z over the field; z_mont [num_cols,16]; out [num_rows,16]."""
        if not self.vals:
            return fr.zeros((num_rows,))
        d = self._device()
        starts, ends = self._boundaries("row", num_rows)
        return _k_segment_sums_perm(d["vals"], z_mont, d["cols"], d["perm_r"], starts, ends)

    def multiply_vec(self, num_rows: int, num_cols: int, z: list[int]) -> DensePolynomial:
        z_mont = F.encode_fr(z)
        assert len(z) == num_cols
        return DensePolynomial(self.multiply_vec_device(num_rows, z_mont))

    def compute_eval_table_sparse_device(self, evals_mont, num_cols: int) -> jnp.ndarray:
        """M^T @ evals: out[col] = sum_rows evals[row] * val (scatter-free)."""
        if not self.vals:
            return fr.zeros((num_cols,))
        d = self._device()
        starts, ends = self._boundaries("col", num_cols)
        return _k_segment_sums_perm(d["vals"], evals_mont, d["rows"], d["perm_c"], starts, ends)

    def compute_eval_table_sparse(self, evals: list[int], num_rows: int, num_cols: int) -> list[int]:
        return F.decode_fr(self.compute_eval_table_sparse_device(F.encode_fr(evals), num_cols))

    def evaluate_with_tables_device(self, eq_rx_mont, eq_ry_mont) -> int:
        if not self.vals:
            return 0
        d = self._device()
        out = _k_gather_mul3(d["vals"], eq_rx_mont, eq_ry_mont, d["rows"], d["cols"])
        return F.decode_fr(out[None])[0]

    def evaluate(self, rx: list[int], ry: list[int]) -> int:
        eq_rx = EqPolynomial(rx).evals_device()
        eq_ry = EqPolynomial(ry).evals_device()
        return self.evaluate_with_tables_device(eq_rx, eq_ry)

    @staticmethod
    def multi_evaluate(polys, rx: list[int], ry: list[int]) -> list[int]:
        eq_rx = EqPolynomial(rx).evals_device()
        eq_ry = EqPolynomial(ry).evals_device()
        return [p.evaluate_with_tables_device(eq_rx, eq_ry) for p in polys]
