"""Sparse multilinear polynomials for the R1CS A/B/C matrices.

TPU-native counterpart of /root/reference/src/sparse_mlpoly.rs. The entry
lists are static per shape, so both access orders are precomputed on host
at construction (entries sorted by row and by column, with the segment
boundaries of each). Every device operation is then:

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


@functools.partial(jax.jit, static_argnames=())
def _k_segment_sums(prods, starts, ends):
    """Per-segment field sums from sorted products.

    prods [N,16] Montgomery (sorted by segment); starts/ends [S] indices
    into the prefix array (start/end of each segment's run). Returns [S,16].
    """
    unit = jnp.asarray(F.FR.r1_limbs, jnp.uint32) * 0  # additive unit = 0
    S = inclusive_scan(fr.add, prods, unit)
    zero = jnp.zeros((1, NUM_LIMBS), jnp.uint32)
    P = jnp.concatenate([zero, S], axis=0)  # P[i] = sum of first i
    return fr.sub(P[ends], P[starts])


@jax.jit
def _k_gather_mul3(vals, eq_x, eq_y, rows, cols):
    """sum_i val_i * eq_x[row_i] * eq_y[col_i] (one field reduction)."""
    t = fr.mul(fr.mul(vals, eq_x[rows]), eq_y[cols])
    return fr.reduce_sum(t, axis=0)


@jax.jit
def _k_weighted_products(vals, weights, idx):
    """val_i * weights[idx_i], elementwise gathered products."""
    return fr.mul(vals, weights[idx])


class SparseMatEntry:
    __slots__ = ("row", "col", "val")

    def __init__(self, row: int, col: int, val: int):
        self.row = row
        self.col = col
        self.val = val % FR_MOD


class SparseMatPolynomial:
    """MLE of a sparse matrix (sparse_mlpoly.rs:36-181), device-accelerated.

    Host state: numpy index arrays in two sort orders + a device copy of the
    values (Montgomery). All entries are immutable after construction.
    """

    def __init__(self, num_vars_x: int, num_vars_y: int, entries: list[SparseMatEntry]):
        self.num_vars_x = num_vars_x
        self.num_vars_y = num_vars_y
        self.M = entries
        n = len(entries)
        rows = np.asarray([e.row for e in entries], dtype=np.int64)
        cols = np.asarray([e.col for e in entries], dtype=np.int64)
        vals = [e.val for e in entries]
        self._rows = rows
        self._cols = cols
        self._vals = vals

        # row-sorted order (stable) for SpMV
        order_r = np.argsort(rows, kind="stable")
        self._r_rows = jnp.asarray(rows[order_r], dtype=jnp.int32)
        self._r_cols = jnp.asarray(cols[order_r], dtype=jnp.int32)
        self._r_vals = F.encode_fr([vals[i] for i in order_r]) if n else F.fr.zeros((0,))
        self._rows_sorted_np = rows[order_r]

        # col-sorted order for eval-table transposes (A^T * eq)
        order_c = np.argsort(cols, kind="stable")
        self._c_rows = jnp.asarray(rows[order_c], dtype=jnp.int32)
        self._c_cols = jnp.asarray(cols[order_c], dtype=jnp.int32)
        self._c_vals = F.encode_fr([vals[i] for i in order_c]) if n else F.fr.zeros((0,))
        self._cols_sorted_np = cols[order_c]

        # unsorted device copies (for evaluate)
        self._d_rows = jnp.asarray(rows, dtype=jnp.int32)
        self._d_cols = jnp.asarray(cols, dtype=jnp.int32)
        self._d_vals = F.encode_fr(vals) if n else F.fr.zeros((0,))

    def num_entries(self) -> int:
        return len(self.M)

    def get_num_nz_entries(self) -> int:
        from spartan_tpu.utils.math import next_power_of_two

        return next_power_of_two(len(self.M))

    def _boundaries(self, sorted_keys: np.ndarray, num_segments: int):
        starts = np.searchsorted(sorted_keys, np.arange(num_segments), side="left")
        ends = np.searchsorted(sorted_keys, np.arange(num_segments), side="right")
        return jnp.asarray(starts, jnp.int32), jnp.asarray(ends, jnp.int32)

    def multiply_vec_device(self, num_rows: int, z_mont) -> jnp.ndarray:
        """M @ z over the field; z_mont [num_cols,16]; out [num_rows,16]."""
        if not self.M:
            return fr.zeros((num_rows,))
        prods = _k_weighted_products(self._r_vals, z_mont, self._r_cols)
        starts, ends = self._boundaries(self._rows_sorted_np, num_rows)
        return _k_segment_sums(prods, starts, ends)

    def multiply_vec(self, num_rows: int, num_cols: int, z: list[int]) -> DensePolynomial:
        z_mont = F.encode_fr(z)
        assert len(z) == num_cols
        return DensePolynomial(self.multiply_vec_device(num_rows, z_mont))

    def compute_eval_table_sparse_device(self, evals_mont, num_cols: int) -> jnp.ndarray:
        """M^T @ evals: out[col] = sum_rows evals[row] * val (scatter-free)."""
        if not self.M:
            return fr.zeros((num_cols,))
        prods = _k_weighted_products(self._c_vals, evals_mont, self._c_rows)
        starts, ends = self._boundaries(self._cols_sorted_np, num_cols)
        return _k_segment_sums(prods, starts, ends)

    def compute_eval_table_sparse(self, evals: list[int], num_rows: int, num_cols: int) -> list[int]:
        return F.decode_fr(self.compute_eval_table_sparse_device(F.encode_fr(evals), num_cols))

    def evaluate_with_tables_device(self, eq_rx_mont, eq_ry_mont) -> int:
        if not self.M:
            return 0
        out = _k_gather_mul3(self._d_vals, eq_rx_mont, eq_ry_mont, self._d_rows, self._d_cols)
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
