"""Dense multilinear polynomials + eq polynomial on device.

TPU-native counterpart of /root/reference/src/hyrax.rs:156-384. Evaluation
tables are device limb arrays [N, 16] (Montgomery); folds, eq-table builds,
matrix-bound products and dot products are jitted device kernels. Scalars
crossing the host boundary (transcript values, claimed evaluations) are
Python ints.

Design notes (SURVEY.md section 5, "long-context analog"): folds are local
elementwise ops; under sharding the table axis is partitioned and folds stay
local until tables shrink below shard granularity (handled in
spartan_tpu.parallel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import os as _os

from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.limbs import NUM_LIMBS
from spartan_tpu.utils.math import log_2, next_power_of_two, pow2

fr = F.fr

# [L, R, 16] product transient budget for DensePolynomial.bound (elements);
# module-level so tests can shrink it to exercise the chunk boundaries
BOUND_BUDGET = 1 << 24

# mirrors hostpath.HOST_N without importing it at module load (cycle-free)
_HOST_N = int(_os.environ.get("SPARTAN_TPU_HOST_N", "2048"))


# ---------------------------------------------------------------------------
# jitted kernels
# ---------------------------------------------------------------------------

@jax.jit
def k_bound_var_top(Z, r):
    """Z'[i] = Z[i] + r * (Z[i+n] - Z[i]) over halves (hyrax.rs:195-203)."""
    n = Z.shape[0] // 2
    lo, hi = Z[:n], Z[n:]
    return fr.add(lo, fr.mul(r, fr.sub(hi, lo)))


@jax.jit
def k_bound_var_bot(Z, r):
    """Z'[i] = Z[2i] + r * (Z[2i+1] - Z[2i]) (hyrax.rs:206-214)."""
    ev = Z[0::2]
    od = Z[1::2]
    return fr.add(ev, fr.mul(r, fr.sub(od, ev)))


@functools.partial(jax.jit, static_argnames=("ell",))
def k_eq_evals(r, ell: int):
    """eq(r, x) table over x in {0,1}^ell; r [ell,16]; out [2^ell,16].

    Index convention matches the reference (hyrax.rs:355-369): bit for r[0]
    is the MOST significant bit of the table index.
    """
    table = fr.one((1,))
    for j in range(ell):
        rj = r[j]
        hi = fr.mul(table, rj)          # bit_j = 1
        lo = fr.sub(table, hi)          # bit_j = 0  (table * (1 - r_j))
        table = jnp.stack([lo, hi], axis=1).reshape(-1, NUM_LIMBS)
    return table


@jax.jit
def k_dot(a, b):
    """<a, b> over the field, [N,16] x [N,16] -> [16]."""
    return fr.reduce_sum(fr.mul(a, b), axis=0)


@jax.jit
def k_dot_batched(A, chis):
    """[K,N,16] x [N,16] -> [K,16]: K MLE evaluations sharing one eq table."""
    return fr.reduce_sum(fr.mul(A, chis[None]), axis=1)


@functools.partial(jax.jit, static_argnames=("L_size", "R_size"))
def k_bound_matrix(Z, L, L_size: int, R_size: int):
    """LZ[j] = sum_i L[i] * Z[i*R+j]  (hyrax.rs:311-324), out [R,16]."""
    M = Z.reshape(L_size, R_size, NUM_LIMBS)
    return fr.reduce_sum(fr.mul(L[:, None, :], M), axis=0)


# ---------------------------------------------------------------------------
# host-facing objects
# ---------------------------------------------------------------------------

def encode_scalar(x: int):
    """One host int -> [16] Montgomery device limbs."""
    return F.encode_fr([x])[0]


def decode_scalar(arr) -> int:
    return F.decode_fr(arr[None] if arr.ndim == 1 else arr)[0]


def decode_tables(arrs) -> list[list[int]]:
    """Decode K equal-length [n, 16] tables with ONE device->host sync.

    The host-tail switchover in every sumcheck used to decode each table
    separately — K tunnel round trips (~33 ms each) where one suffices.
    """
    import jax.numpy as jnp

    if not arrs:
        return []
    n = arrs[0].shape[0]
    vals = F.decode_fr(jnp.concatenate(list(arrs), axis=0))
    return [vals[i * n:(i + 1) * n] for i in range(len(arrs))]


class DensePolynomial:
    """MLE by its evaluation table, device-resident (hyrax.rs:156-324)."""

    def __init__(self, Z):
        """Z: device limb array [N, 16] (Montgomery)."""
        self.Z = Z
        self.len = Z.shape[0]
        self.num_vars = log_2(self.len) if self.len > 0 else 0

    @staticmethod
    def from_ints(vals: list[int]) -> "DensePolynomial":
        return DensePolynomial(F.encode_fr(vals))

    def to_ints(self) -> list[int]:
        return F.decode_fr(self.Z)

    def clone(self) -> "DensePolynomial":
        return DensePolynomial(self.Z)

    def split(self, idx: int):
        assert idx < self.len
        return DensePolynomial(self.Z[:idx]), DensePolynomial(self.Z[idx: 2 * idx])

    def rebind(self, Z) -> None:
        """Adopt an externally-folded table (fused sumcheck round steps)."""
        self.Z = Z
        self.len = Z.shape[0]
        self.num_vars = log_2(self.len) if self.len > 0 else 0

    def bound_poly_var_top(self, r: int | jnp.ndarray) -> None:
        r_dev = r if isinstance(r, jnp.ndarray) else encode_scalar(r)
        self.Z = k_bound_var_top(self.Z, r_dev)
        self.len //= 2
        self.num_vars -= 1

    def bound_poly_var_bot(self, r: int | jnp.ndarray) -> None:
        r_dev = r if isinstance(r, jnp.ndarray) else encode_scalar(r)
        self.Z = k_bound_var_bot(self.Z, r_dev)
        self.len //= 2
        self.num_vars -= 1

    def evaluate(self, r: list[int]) -> int:
        assert len(r) == self.num_vars
        if self.len <= _HOST_N:
            from spartan_tpu.core import hostpath as HP

            return HP.evaluate_mle(self.to_ints(), r)
        chis = EqPolynomial(r).evals_device()
        return decode_scalar(k_dot(self.Z, chis))

    def evaluate_device(self, r_dev):
        """r_dev [ell,16] Montgomery -> [16] Montgomery (stays on device)."""
        chis = k_eq_evals(r_dev, self.num_vars)
        return k_dot(self.Z, chis)

    def bound(self, L_dev, L_size: int, R_size: int, mesh=None):
        """L*Z matrix product, returns [R,16] device array.

        Chunked over the L axis when the [L, R, 16] product transient
        would be GB-scale (the 8192x8192 comb_ops opening at 2^20); with
        ``mesh`` the rows are sharded over the devices (bit-identical)."""
        if mesh is not None and mesh.devices.size > 1 and \
                L_size % mesh.devices.size == 0 and \
                L_size >= mesh.devices.size:
            from spartan_tpu.parallel.sumcheck_sharded import bound_sharded

            return bound_sharded(mesh, self.Z, L_dev, L_size, R_size)
        if L_size * R_size <= BOUND_BUDGET:
            return k_bound_matrix(self.Z, L_dev, L_size, R_size)
        rows_per = max(1, BOUND_BUDGET // R_size)
        acc = None
        for start in range(0, L_size, rows_per):
            stop = min(start + rows_per, L_size)
            part = k_bound_matrix(
                self.Z[start * R_size: stop * R_size],
                L_dev[start:stop], stop - start, R_size)
            acc = part if acc is None else fr.add(acc, part)
        return acc

    def extend(self, other: "DensePolynomial") -> None:
        assert other.len == self.len
        self.Z = jnp.concatenate([self.Z, other.Z], axis=0)
        self.len *= 2
        self.num_vars += 1

    def item(self, i: int) -> int:
        return decode_scalar(self.Z[i])

    def first(self) -> int:
        """Z[0] as host int — the post-sumcheck claim readout."""
        return self.item(0)

    @staticmethod
    def merge(polys) -> "DensePolynomial":
        """Concatenate tables, zero-pad to a power of two (hyrax.rs:237-247)."""
        Zs = [p.Z for p in polys]
        total = sum(z.shape[0] for z in Zs)
        target = next_power_of_two(total)
        if target > total:
            Zs.append(jnp.zeros((target - total, NUM_LIMBS), jnp.uint32))
        return DensePolynomial(jnp.concatenate(Zs, axis=0))

    @staticmethod
    def from_usize(vals) -> "DensePolynomial":
        """Small non-negative ints (numpy array or list) -> MLE, fast path."""
        return DensePolynomial(F.encode_small_uints(vals))


def batch_evaluate(polys: list["DensePolynomial"], r: list[int]) -> list[int]:
    """Evaluate several equal-length MLEs at one point, sharing the eq table.

    Stacks only small tables; large ones are reduced per-poly so the
    [K, N, 16] stack + product transient (8+ GB at 2^20 scale) never
    materializes.
    """
    if not polys:
        return []
    chis = EqPolynomial(r).evals_device()
    n = polys[0].len
    if len(polys) * n <= (1 << 22):
        A = jnp.stack([p.Z for p in polys], axis=0)
        return F.decode_fr(k_dot_batched(A, chis))
    outs = [k_dot(p.Z, chis) for p in polys]
    return F.decode_fr(jnp.stack(outs, axis=0))


class EqPolynomial:
    """eq(r, .) utilities (hyrax.rs:337-383). r is host ints."""

    def __init__(self, r: list[int]):
        self.r = list(r)

    def evaluate(self, rx: list[int]) -> int:
        from spartan_tpu.ops.fields_host import FR_MOD

        assert len(rx) == len(self.r)
        acc = 1
        for a, b in zip(self.r, rx):
            acc = acc * (a * b + (1 - a) * (1 - b)) % FR_MOD
        return acc % FR_MOD

    def evals_device(self):
        if not self.r:
            return fr.one((1,))
        if (1 << len(self.r)) <= _HOST_N:
            from spartan_tpu.core import hostpath as HP

            return F.encode_fr(HP.eq_evals(self.r))
        r_dev = F.encode_fr(self.r)
        return k_eq_evals(r_dev, len(self.r))

    def evals(self) -> list[int]:
        return F.decode_fr(self.evals_device())

    @staticmethod
    def compute_factored_lens(ell: int) -> tuple[int, int]:
        return ell // 2, ell - ell // 2

    def compute_factored_evals(self):
        """(L table, R table) as device arrays (hyrax.rs:375-383)."""
        ell = len(self.r)
        left, _ = EqPolynomial.compute_factored_lens(ell)
        L = EqPolynomial(self.r[:left]).evals_device()
        R = EqPolynomial(self.r[left:]).evals_device()
        return L, R


class IdentityPolynomial:
    """MLE of the index function (hyrax.rs:387-403)."""

    def __init__(self, size_point: int):
        self.size_point = size_point

    def evaluate(self, r: list[int]) -> int:
        from spartan_tpu.ops.fields_host import FR_MOD

        n = len(r)
        assert n == self.size_point
        return sum(pow2(n - i - 1) * r[i] for i in range(n)) % FR_MOD


def compute_dotproduct(a: list[int], b: list[int]) -> int:
    from spartan_tpu.ops.fields_host import FR_MOD

    assert len(a) == len(b)
    return sum(x * y for x, y in zip(a, b)) % FR_MOD
