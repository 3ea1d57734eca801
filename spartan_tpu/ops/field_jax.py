"""Vectorized BN254 field arithmetic on TPU (JAX).

Replaces the arkworks field backend (L0 in SURVEY.md's layer map) with
batched Montgomery arithmetic over 16x16-bit uint32 limbs. Every function
is shape-polymorphic over leading axes: inputs ``[..., 16]`` uint32.

Algorithm notes
---------------
* ``mul``: the 512-bit schoolbook product is ONE batched matvec: operands
  are split to 8-bit chunks, a Toeplitz band of `a` is formed by a single
  static gather, and `einsum(T, b8)` yields all 63 product columns with
  int32-exact accumulation (32 products of 16-bit values < 2^21). A 16-step
  Montgomery REDC follows as a ``fori_loop`` whose body shifts the column
  vector left each round (static shapes, no scatters), then one carry
  propagation pass and one conditional subtract. Keeping loops rolled makes
  the whole ``mul`` ~50 HLO ops, so the curve formulas that inline it a
  dozen times stay cheap to compile; the loop bodies are wide VPU ops so
  runtime amortizes the loop overhead.
* ``inv``: Fermat (fixed 254-bit exponent) via ``lax.fori_loop``; batched
  inputs amortize it. ``batch_inverse`` uses Montgomery's trick with two
  ``associative_scan`` passes (log-depth) and one Fermat inversion.
* ``reduce_sum``: limb-wise integer sums in uint32 are exact for <= 2^14
  terms; larger reductions are chunked, folding the redundant columns back
  below the modulus between chunks.

Montgomery domain: R = 2^256. An element x is stored as x*R mod p.
Additions/subtractions are domain-agnostic; ``mul`` computes a*b*R^-1.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.ops import fields_host as fh
from spartan_tpu.ops.limbs import LIMB_BITS, LIMB_MASK, NUM_LIMBS, int_to_limbs, ints_to_limbs, limbs_to_ints

_U32 = jnp.uint32
_NCHUNK = 2 * NUM_LIMBS          # 32 8-bit chunks
_NCOL8 = 2 * _NCHUNK             # 64 8-bit product columns (padded)


class FieldSpec:
    """Per-field constants in limb form (host numpy, baked into traces)."""

    def __init__(self, modulus: int, name: str):
        self.name = name
        self.modulus = modulus
        self.p_limbs = int_to_limbs(modulus)
        # p' = -p^{-1} mod 2^16 (Montgomery REDC factor for 16-bit limbs)
        self.p_prime = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        r1 = (1 << 256) % modulus
        self.r1 = r1                      # R mod p  == Montgomery form of 1
        self.r2 = (r1 * r1) % modulus     # R^2 mod p (to-Montgomery factor)
        self.r1_limbs = int_to_limbs(self.r1)
        self.r2_limbs = int_to_limbs(self.r2)
        e = modulus - 2
        self.inv_exp_bits = np.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=np.uint32)

    def __repr__(self):
        return f"FieldSpec({self.name})"


FR = FieldSpec(fh.FR_MOD, "Fr")
FQ = FieldSpec(fh.FQ_MOD, "Fq")


# ---------------------------------------------------------------------------
# carry / compare helpers (all operate on [..., L] uint32)
# ---------------------------------------------------------------------------

def _carry_step(carry, col):
    # module-level scan body: a per-call closure would defeat jax's
    # traced-jaxpr cache and force a retrace at every call site
    t = col + carry
    return t >> LIMB_BITS, t & LIMB_MASK


def _carry_propagate(d):
    """Columns (< 2^32 each) -> canonical 16-bit limbs, plus overflow carry.

    Rolled ripple via ``lax.scan`` over the limb axis: the chain is traced
    ONCE regardless of limb count, keeping every downstream trace (curve
    formulas inline dozens of adds) small enough to compile fast. Each step
    is a wide VPU op over the batch, so runtime is unaffected.
    """
    cols = jnp.moveaxis(d, -1, 0)  # [K, ...]
    carry, outs = jax.lax.scan(_carry_step, jnp.zeros(cols.shape[1:], _U32), cols)
    return jnp.moveaxis(outs, 0, -1), carry


def _borrow_step(borrow, ab):
    x, y = ab
    t = x + jnp.uint32(1 << LIMB_BITS) - y - borrow
    return jnp.uint32(1) - (t >> LIMB_BITS), t & LIMB_MASK


def _sub_limbs(a, b):
    """a - b over 16-bit limb vectors; returns (diff, borrow), borrow in {0,1}."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    av = jnp.moveaxis(jnp.broadcast_to(a, shape), -1, 0)
    bv = jnp.moveaxis(jnp.broadcast_to(b, shape), -1, 0)
    borrow, outs = jax.lax.scan(_borrow_step, jnp.zeros(shape[:-1], _U32), (av, bv))
    return jnp.moveaxis(outs, 0, -1), borrow


def _cond_sub_p(r, spec: FieldSpec):
    """If r >= p subtract p (r must be < 2p). Branch-free select."""
    p = jnp.asarray(spec.p_limbs, _U32)
    diff, borrow = _sub_limbs(r, p)
    take = (borrow == 0)[..., None]
    return jnp.where(take, diff, r)


def _prodcol_step(state, bj):
    # module-level scan body (see _carry_step); a8 rides in the carry
    S, a8 = state
    zcol = jnp.zeros((*S.shape[:-1], 1), _U32)
    ztail = jnp.zeros((*S.shape[:-1], _NCOL8 - 1 - _NCHUNK), _U32)
    row = a8 * bj[..., None]  # [..., 32], entries < 2^16
    shifted = jnp.concatenate([zcol, S[..., :-1]], axis=-1)
    return (shifted + jnp.concatenate([row, ztail], axis=-1), a8), None


def _to_chunks8(a):
    """[..., 16] 16-bit limbs -> [..., 32] 8-bit chunks (little-endian)."""
    lo = a & 0xFF
    hi = (a >> 8) & 0xFF
    return jnp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1], _NCHUNK)


def _product_columns(a, b):
    """All 32 16-bit product columns of a*b, straight-line.

    One batched outer product of the 8-bit chunk vectors (entries < 2^16),
    then anti-diagonal column sums assembled from per-row shifts. Column
    values stay < 32 * 2^16 = 2^21 (uint32-exact). Returns [..., 32] uint32
    columns in base 2^16, each < 2^30.
    """
    a8 = _to_chunks8(a)
    b8 = _to_chunks8(b)
    shape = jnp.broadcast_shapes(a8.shape, b8.shape)
    a8 = jnp.broadcast_to(a8, shape)
    b8 = jnp.broadcast_to(b8, shape)
    # c8[k] = sum_{i+j=k} a8[i] * b8[j]. Rolled as a scan over j (high to
    # low): S <- shift_right(S) + a8 * b8[j]. One traced body instead of 32
    # unrolled pads, and the partial-product row is formed inside the step so
    # no [.., 32, 32] outer product is ever materialized (transient memory is
    # O(columns) per element, which matters when this inlines into batched
    # point scans).
    bcols = jnp.moveaxis(b8, -1, 0)[::-1]  # [j from high to low, ...]
    acc0 = jnp.zeros((*shape[:-1], _NCOL8 - 1), _U32)  # 63 columns
    (c8, _), _ = jax.lax.scan(_prodcol_step, (acc0, a8), bcols)  # [..., 63]
    c8 = jnp.concatenate([c8, jnp.zeros((*shape[:-1], 1), _U32)], axis=-1)
    ev = c8[..., 0::2]
    od = c8[..., 1::2]
    return ev + (od << 8)  # [..., 32], < 2^21 + 2^29 < 2^30


# ---------------------------------------------------------------------------
# core ops
# ---------------------------------------------------------------------------

def make_ops(spec: FieldSpec):
    """Build the op suite for one field. Returned functions are trace-pure."""

    p_np = spec.p_limbs
    pp = jnp.uint32(spec.p_prime)

    def add(a, b):
        s, _ = _carry_propagate(a + b)  # columns < 2^17; sum < 2p < 2^255
        return _cond_sub_p(s, spec)

    def sub(a, b):
        s, _ = _carry_propagate(a + jnp.asarray(p_np, _U32))
        d, _ = _sub_limbs(s, b)
        return _cond_sub_p(d, spec)

    def neg(a):
        p = jnp.asarray(p_np, _U32)
        d, _ = _sub_limbs(jnp.broadcast_to(p, a.shape), a)
        zero = is_zero(a)[..., None]
        return jnp.where(zero, jnp.zeros_like(a), d)

    def is_zero(a):
        return jnp.all(a == 0, axis=-1)

    def eq(a, b):
        return jnp.all(a == b, axis=-1)

    def mul(a, b):
        """Montgomery product a*b*R^-1 mod p (canonical 16-bit limbs out).

        Product-scanning REDC rolled into a ``fori_loop`` over a sliding
        32-column window (index 0 = current position k; the window shifts
        left each round, so shapes stay static and the body is traced once).
        """
        d = _product_columns(a, b)  # [..., 32], < 2^30
        batch = d.shape[:-1]
        p = jnp.asarray(p_np, _U32)
        ztail = jnp.zeros((*batch, NUM_LIMBS), _U32)
        zcol = jnp.zeros((*batch, 1), _U32)

        def body(_, state):
            e, carry = state
            v = e[..., 0] + carry
            m = (v * pp) & LIMB_MASK
            mp = m[..., None] * p          # [..., 16], products < 2^32
            lo = mp & LIMB_MASK
            hi = mp >> LIMB_BITS
            # lo lands on window positions 0..15, hi on 1..16
            f = e + jnp.concatenate([lo, ztail], axis=-1) \
                  + jnp.concatenate([zcol, hi, ztail[..., 1:]], axis=-1)
            new_carry = (v + lo[..., 0]) >> LIMB_BITS
            e_next = jnp.concatenate([f[..., 1:], zcol], axis=-1)
            return (e_next, new_carry)

        e, carry = jax.lax.fori_loop(
            0, NUM_LIMBS, body, (d, jnp.zeros(batch, _U32))
        )
        r = e[..., :NUM_LIMBS]
        r = r.at[..., 0].add(carry)
        r, _ = _carry_propagate(r)  # value < 2p < 2^255 -> no overflow carry
        return _cond_sub_p(r, spec)

    def sqr(a):
        return mul(a, a)

    def mul_small(a, k: int):
        """Multiply by a small non-negative Python int via shift-and-add."""
        assert 0 <= k
        acc = zeros(a.shape[:-1])
        base = a
        while k:
            if k & 1:
                acc = add(acc, base)
            k >>= 1
            if k:
                base = add(base, base)
        return acc

    def zeros(batch_shape=()):
        return jnp.zeros((*batch_shape, NUM_LIMBS), _U32)

    def ones_mont(batch_shape=()):
        one = jnp.asarray(spec.r1_limbs, _U32)
        return jnp.broadcast_to(one, (*batch_shape, NUM_LIMBS))

    def to_mont(a):
        # through ops.mul so enable_pallas() rebinding applies (the XLA
        # mul's [.., 32]-column intermediates OOM on multi-GB arrays)
        return ops.mul(a, jnp.asarray(spec.r2_limbs, _U32))

    def from_mont(a):
        one = jnp.zeros((NUM_LIMBS,), _U32).at[0].set(1)
        return ops.mul(a, one)

    def inv(a):
        """Fermat inverse of Montgomery-form input (0 -> 0). Batched."""
        bits = jnp.asarray(spec.inv_exp_bits)  # LSB-first
        nbits = int(spec.inv_exp_bits.shape[0])

        def body(i, acc):
            bit = bits[nbits - 1 - i]
            acc = ops.sqr(acc)
            return jnp.where(bit == 1, ops.mul(acc, a), acc)

        acc0 = ones_mont(a.shape[:-1])
        out = jax.lax.fori_loop(0, nbits, body, acc0)
        return jnp.where(is_zero(a)[..., None], jnp.zeros_like(a), out)

    def batch_inverse(a):
        """Inverse along axis 0 via Montgomery's trick (zeros -> zeros)."""
        from spartan_tpu.ops.scan import inclusive_scan

        zero_mask = is_zero(a)
        safe = jnp.where(zero_mask[..., None], ones_mont(a.shape[:-1]), a)
        unit = jnp.asarray(spec.r1_limbs, _U32)
        pre = inclusive_scan(ops.mul, safe, unit)
        suf = inclusive_scan(ops.mul, safe, unit, reverse=True)
        total_inv = inv(pre[-1])
        n = a.shape[0]
        left = jnp.concatenate([ones_mont((1, *a.shape[1:-1])), pre[: n - 1]], axis=0)
        right = jnp.concatenate([suf[1:], ones_mont((1, *a.shape[1:-1]))], axis=0)
        out = ops.mul(ops.mul(left, right), total_inv)
        return jnp.where(zero_mask[..., None], jnp.zeros_like(a), out)

    def _normalize_columns(s):
        """Columns < 2^32 (16 of them) -> canonical residue < p.

        Folding the 2^256-overflow c back as c * (2^256 mod p) shrinks c by
        ~x0.055 per fold (r1/2^256), but its fixed point is ~1.06 — no fixed
        number of folds makes the carry *provably* zero on its own.
        Termination argument: once c <= 1, a c=1 fold leaves limbs
        < r1 < 2^252.6, and the NEXT fold then has value
        < 2 * 2^252.6 < 2^256, i.e. guaranteed carry 0. The column sums
        bound the initial value by 2^14 * p (CHUNK in reduce_sum), so
        c0 < 2^12 and c decays 2^12 -> 225 -> 14 -> 1.8 -> <=1; with the
        closing folds, 8 folds guarantee carry 0. The 16-limb result is
        any value < 2^256 < 5.3p, so FIVE cond-subs are required (validated
        by tools/normalize_sim.py stress: max observed 5). The previous
        code dropped a carry c, losing c * 2^256 in the Montgomery domain =
        exactly c in canonical value — the 2^12-scale off-by-one bug.
        """
        r1 = jnp.asarray(spec.r1_limbs, _U32)

        def fold_once(limbs, extra):
            fold = extra[..., None] * r1  # products < 2^12 * 2^16 < 2^32
            lo = fold & LIMB_MASK
            hi = fold >> LIMB_BITS
            acc = limbs + lo
            acc = acc.at[..., 1:].add(hi[..., :-1])
            top = hi[..., -1]
            out, carry = _carry_propagate(acc)
            return out, carry + top

        limbs, carry = _carry_propagate(s)
        for _ in range(8):
            limbs, carry = fold_once(limbs, carry)
        out = limbs
        for _ in range(5):
            out = _cond_sub_p(out, spec)
        return out

    def reduce_sum(a, axis=0):
        """Field sum along one axis (Montgomery-domain linear)."""
        a = jnp.moveaxis(a, axis, 0)
        n = a.shape[0]
        CHUNK = 1 << 14
        while n > 1:
            if n > CHUNK:
                pad = (-n) % CHUNK
                if pad:
                    a = jnp.concatenate([a, jnp.zeros((pad, *a.shape[1:]), _U32)], axis=0)
                a = a.reshape(-1, CHUNK, *a.shape[1:])
                s = jnp.sum(a, axis=1, dtype=_U32)  # columns < 2^30
            else:
                s = jnp.sum(a, axis=0, keepdims=True, dtype=_U32)
            a = _normalize_columns(s)
            n = a.shape[0]
        return a[0]

    class Ops:
        pass

    # Every primitive op is wrapped in jax.jit: a jitted function's jaxpr is
    # traced ONCE per input shape and the cached pjit is reused at every call
    # site inside outer jits. Without this, each of the hundreds of mul/add
    # call sites in a fused protocol kernel re-traced the whole limb pipeline
    # (fresh scan-body closures defeat jax's tracing caches), and lowering a
    # single batched sumcheck step was observed at ~97 s on the chip; jitted,
    # the same lowering is sub-second. XLA inlines the inner calls, so the
    # compiled code is unchanged.
    ops = Ops()
    ops.spec = spec
    ops.normalize_columns = _normalize_columns
    ops.add = jax.jit(add)
    ops.sub = jax.jit(sub)
    ops.neg = jax.jit(neg)
    ops.mul = jax.jit(mul)
    ops.sqr = jax.jit(sqr)
    ops.mul_small = mul_small
    # inv/batch_inverse resolve ops.mul at trace time (so enable_pallas
    # rebinding applies) — left unjitted so a cached trace can never pin a
    # stale backend; their inner ops are jitted, keeping tracing cheap.
    ops.inv = inv
    ops.batch_inverse = batch_inverse
    ops.reduce_sum = jax.jit(reduce_sum, static_argnames=("axis",))
    ops.is_zero = is_zero
    ops.eq = eq
    ops.zeros = zeros
    ops.one = ones_mont
    ops.to_mont = to_mont
    ops.from_mont = from_mont
    return ops


fr = make_ops(FR)
fq = make_ops(FQ)

# keep the XLA implementations addressable for dispatch switching
for _ops in (fr, fq):
    _ops.xla_mul = _ops.mul
    _ops.xla_add = _ops.add
    _ops.xla_sub = _ops.sub

_PALLAS_ON = False


def enable_pallas(on: bool = True) -> None:
    """Swap mul/add/sub to the fused Pallas TPU kernels (or back to XLA).

    The Pallas path is ~8x faster at 2^20 elements on v5e (see
    ops/pallas_field.py); the XLA path remains the portable fallback and is
    what CPU tests exercise. sqr/inv/batch_inverse/reduce_sum compose the
    swapped primitives automatically only where they call through the ops
    object, so they are rebound here too.
    """
    global _PALLAS_ON
    if on and not _PALLAS_ON:
        from spartan_tpu.ops.pallas_field import make_field_kernels

        for ops_obj, spec in ((fr, FR), (fq, FQ)):
            pmul, padd, psub = make_field_kernels(spec)
            ops_obj.mul = pmul
            ops_obj.add = padd
            ops_obj.sub = psub
            ops_obj.sqr = lambda a, m=pmul: m(a, a)
        _PALLAS_ON = True
    elif not on and _PALLAS_ON:
        for ops_obj in (fr, fq):
            ops_obj.mul = ops_obj.xla_mul
            ops_obj.add = ops_obj.xla_add
            ops_obj.sub = ops_obj.xla_sub
            ops_obj.sqr = lambda a, m=ops_obj.xla_mul: m(a, a)
        _PALLAS_ON = False


def auto_enable_pallas() -> None:
    """Enable the Pallas kernels when running on a real TPU backend."""
    if os.environ.get("SPARTAN_TPU_NO_PALLAS") == "1":
        return
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return
    if backend != "cpu":
        enable_pallas(True)
        # curve_jax enables its own kernels at its module bottom (importing
        # it from here would be circular when curve_jax is imported first)


# Auto-select the kernel backend at import: TPU gets the Pallas fast path.
# (Deliberately AFTER test conftests force the CPU platform; harmless there.)
auto_enable_pallas()


# ---------------------------------------------------------------------------
# host <-> device conversion (Montgomery domain on device)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=1)
def _to_mont_jit(a, field_name):
    ops = fr if field_name == "Fr" else fq
    return ops.to_mont(a)


@functools.partial(jax.jit, static_argnums=1)
def _from_mont_jit(a, field_name):
    ops = fr if field_name == "Fr" else fq
    return ops.from_mont(a)


# Below this many elements, Montgomery conversion runs on host (python
# bigints, ~0.4 us/element) instead of a per-shape jitted device kernel.
# Host-by-default up to 2^22: the device path pays trace+compile per shape
# and its small jit dispatches were observed to intermittently stall for
# minutes on the tunneled backend, while host conversion of even the
# largest protocol tables (keyless vals, 2^22) is ~2 s.
_HOST_CONVERT_N = int(os.environ.get("SPARTAN_TPU_HOST_CONVERT_N",
                                     str(1 << 22)))
_R256 = 1 << 256


def _native_fr_mont():
    if os.environ.get("SPARTAN_TPU_NO_NATIVE_CONVERT") == "1":
        return None
    try:
        from spartan_tpu import native as N

        return N if N.g1_available else None
    except Exception:
        return None


def encode_fr(values, spec: FieldSpec = FR) -> jnp.ndarray:
    """Python ints (canonical) -> device limbs in Montgomery form.

    Every call is one host->device transfer — a full tunnel round trip
    (~33 ms) on the remote dev chip — so callers on the prove path should
    batch values into as few encodes as possible (see Timer.acc
    "sync/encode_fr" accounting in the bench report).
    """
    import time as _time

    from spartan_tpu.utils.timer import Timer as _Timer

    _t = _time.perf_counter()
    try:
        return _encode_fr_inner(values, spec)
    finally:
        _Timer.acc("sync/encode_fr", _time.perf_counter() - _t)
        _Timer.count("sync/encode_fr")


def _encode_fr_inner(values, spec: FieldSpec = FR) -> jnp.ndarray:
    vals = [v % spec.modulus for v in values]
    if len(vals) <= _HOST_CONVERT_N:
        N = _native_fr_mont() if spec is FR else None
        if N is not None and vals:
            buf = b"".join(v.to_bytes(32, "little") for v in vals)
            mont_raw = N.fr_batch_mont(buf, len(vals), True)
            u16 = np.frombuffer(mont_raw, dtype="<u2").reshape(len(vals), NUM_LIMBS)
            return jnp.asarray(u16.astype(np.uint32))
        mont = [v * _R256 % spec.modulus for v in vals]
        return jnp.asarray(ints_to_limbs(mont), dtype=_U32)
    canon = jnp.asarray(ints_to_limbs(vals), dtype=_U32)
    return _to_mont_jit(canon, spec.name)


def decode_fr(arr, spec: FieldSpec = FR) -> list[int]:
    """Device limbs in Montgomery form -> Python ints (canonical).

    One device->host sync per call (~33 ms tunnel round trip on the
    remote dev chip) — batch before decoding on the prove path.
    """
    import time as _time

    from spartan_tpu.utils.timer import Timer as _Timer

    _t = _time.perf_counter()
    try:
        return _decode_fr_inner(arr, spec)
    finally:
        _Timer.acc("sync/decode_fr", _time.perf_counter() - _t)
        _Timer.count("sync/decode_fr")


def _decode_fr_inner(arr, spec: FieldSpec = FR) -> list[int]:
    arr = jnp.asarray(arr)
    count = arr.size // NUM_LIMBS
    if count <= _HOST_CONVERT_N:
        host = np.asarray(jax.device_get(arr))
        if host.ndim == 1:
            host = host[None]
        N = _native_fr_mont() if spec is FR else None
        if N is not None and count:
            raw = np.ascontiguousarray(
                host.reshape(count, NUM_LIMBS).astype("<u2")).tobytes()
            canon_raw = N.fr_batch_mont(raw, count, False)
            return [int.from_bytes(canon_raw[32 * i:32 * i + 32], "little")
                    for i in range(count)]
        rinv = pow(_R256, -1, spec.modulus)
        return [x * rinv % spec.modulus for x in limbs_to_ints(host)]
    canon = _from_mont_jit(jnp.asarray(arr), spec.name)
    host = np.asarray(jax.device_get(canon))
    if host.ndim == 1:
        host = host[None]
    return limbs_to_ints(host)


def encode_small_uints(values, spec: FieldSpec = FR) -> jnp.ndarray:
    """numpy array of uints < 2^64 -> Montgomery device limbs (fast path).

    Skips the per-element Python bigint path of ``encode_fr``; used for the
    index/timestamp tables of the lookup argument (up to 2^22 elements).
    """
    v = np.asarray(values, dtype=np.uint64)
    canon = np.zeros((*v.shape, NUM_LIMBS), dtype=np.uint32)
    for i in range(4):
        canon[..., i] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    return _to_mont_jit(jnp.asarray(canon), spec.name)


def encode_fq(values) -> jnp.ndarray:
    return encode_fr(values, FQ)


def decode_fq(arr) -> list[int]:
    return decode_fr(arr, FQ)
