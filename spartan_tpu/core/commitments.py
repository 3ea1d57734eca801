"""Pedersen vector commitments over device MSM.

TPU-native counterpart of /root/reference/src/commitments.rs:
- ``MultiCommitGens``: generators derived deterministically by a Shake256
  XOF over a label (commitments.rs:31-62), where each 64-byte read is mapped
  to a point exactly like the reference's simplified hash-to-group
  (group.rs:110-132: sha3 -> Fr bytes -> scalar*G, with its fallback quirks
  reproduced for byte-compatibility; see ``secure`` flag for the
  rejection-sampled alternative).
- ``commit`` / ``commit_rows``: (n+1)-point MSMs on device; the row-batched
  form is the Hyrax matrix commit hot loop (hyrax.rs:253-267).

Generators are kept as device affine arrays (for MSM) with lazily-computed
host copies for the rare exact path.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.core.group import GroupElem
from spartan_tpu.ops import curve_host as CH
from spartan_tpu.ops import curve_jax as CJ
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops import msm as MSM
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.ops.limbs import NUM_LIMBS, ints_to_limbs


def _gen_scalars_from_label(label: bytes, count: int) -> list[int]:
    """Shake256(label || compressed_G) -> `count` generator dlog scalars.

    Reproduces MultiCommitGens::new + GroupElement::from_uniform_bytes,
    including the reference's non-canonical-bytes fallback chain.
    """
    shake = hashlib.shake_256()
    shake.update(label)
    shake.update(CH.compress(CH.GEN))
    stream = shake.digest(64 * count)
    out = []
    for i in range(count):
        uniform = stream[64 * i: 64 * i + 64]
        h = hashlib.sha3_256(uniform).digest()
        v = int.from_bytes(h, "little")
        if v < FR_MOD:
            out.append(v)
            continue
        h2 = hashlib.sha3_256(b"fallback" + uniform).digest()
        v2 = int.from_bytes(h2, "little")
        out.append(v2 if v2 < FR_MOD else 1)
    return out


# element budget per commit_rows device call; module-level so tests can
# shrink it to exercise the row-chunk boundaries. Bounds only the
# from_mont/digit-split transient (rows x R x 64 B); the MSM driver
# chunks its gathered points separately, so this can sit well above the
# old 2^21 — which forced L=2048/R=2048 commits into 1023-row chunks
# whose 2-row tail was PADDED to 1023 rows of pure garbage walk (~7 s
# per derefs poly on the chip).
ROWS_BUDGET = 1 << 23

_FIXED_BASE_C = 8
_fixed_base_table = None  # device affine tuple [32 * 256] lazily built


def _fixed_base_windows():
    """Precomputed k * 2^(8w) * G for w in 0..31, k in 0..255.

    Built once on host (~8k exact adds) and cached on device; turns
    generator derivation into 32 gathers + a 31-deep tree reduction per
    batch instead of a 254-round double-and-add ladder.
    """
    global _fixed_base_table
    if _fixed_base_table is None:
        pts = []
        base = CH.GEN
        for _w in range(32):
            acc = None
            for _k in range(256):
                pts.append(acc)
                acc = CH.add(acc, base)
            base = CH.scalar_mul(1 << _FIXED_BASE_C, base)
        _fixed_base_table = CJ.encode_points_affine(pts)  # [32*256]
    return _fixed_base_table


@jax.jit
def _k_fixed_base_msm(table, digits):
    """digits [N, 32] uint32 -> projective s_i*G via table gathers."""
    tx, ty, tinf = table
    idx = digits + (jnp.arange(32, dtype=jnp.uint32) << _FIXED_BASE_C)[None, :]
    gx = tx[idx]      # [N, 32, 16]
    gy = ty[idx]
    ginf = tinf[idx]
    proj = CJ.from_affine(gx, gy, ginf)
    from spartan_tpu.ops.msm import reduce_points

    return reduce_points(proj, axis=1)


def points_from_scalars(scalars: list[int]):
    """Batch-compute s_i * G on device via windowed fixed-base lookup.

    Small batches go through the native-C host backend instead: deriving a
    few hundred generators is microseconds of host work, and the device
    fixed-base kernels are multi-second XLA compiles on the CPU test/dryrun
    backend.
    """
    from spartan_tpu.ops.msm import window_digits

    if len(scalars) <= 4096:
        pts = [CH.scalar_mul(s % FR_MOD, CH.GEN) for s in scalars]
        return CJ.encode_points_affine(pts)

    table = _fixed_base_windows()
    CHUNK = 1 << 15  # bounds the [N, 32, 16] gather transient
    n = len(scalars)
    parts = []
    for start in range(0, n, CHUNK):
        sub = scalars[start:start + CHUNK]
        pad = CHUNK - len(sub) if n > CHUNK and len(sub) < CHUNK else 0
        sc = jnp.asarray(ints_to_limbs([s % FR_MOD for s in sub] + [0] * pad))
        digits = window_digits(sc, _FIXED_BASE_C, num_bits=256)  # [., 32]
        parts.append(_k_fixed_base_msm(table, digits))
    proj = tuple(jnp.concatenate([p[i] for p in parts], axis=0)[:n] for i in range(3))
    x, y, inf = CJ.batch_normalize(proj)
    return (x, y, inf)


class MultiCommitGens:
    """n Pedersen generators + blinding generator h, device-resident.

    Derivation is deterministic in (label, n), so the affine tables are
    cached on disk (keyed by a hash of both) — repeated runs skip the
    fixed-base derivation entirely.
    """

    def __init__(self, n: int, label: bytes | None = None, _from=None,
                 secure: bool = False):
        """``secure=True`` derives generators by x-coordinate rejection
        sampling (curve_host.from_uniform_bytes_secure) so no dlog is known
        and the commitments are binding; the default reproduces the
        reference's simplified scalar*G hash-to-group byte-for-byte
        (group.rs:110-132) — INSECURE as a commitment (anyone can recompute
        the generator dlogs from the label) but required for cross-library
        transcript parity."""
        self.n = n
        if _from is not None:
            self.G, self.h = _from
            return
        assert label is not None
        pts = self._derive_cached(label, n, secure)
        self.G = tuple(a[:n] for a in pts)
        self.h = tuple(a[n] for a in pts)

    @staticmethod
    def _derive_secure(label: bytes, count: int):
        shake = hashlib.shake_256()
        shake.update(label)
        shake.update(CH.compress(CH.GEN))
        stream = shake.digest(64 * count)
        return [CH.from_uniform_bytes_secure(stream[64 * i: 64 * i + 64])
                for i in range(count)]

    @staticmethod
    def _derive_cached(label: bytes, n: int, secure: bool = False):
        import os

        import numpy as np

        cache_dir = os.environ.get("SPARTAN_TPU_GENS_CACHE")
        if not cache_dir:
            from spartan_tpu.utils.cachedir import subdir

            cache_dir = subdir("gens")
        mode = b"secure|" if secure else b""
        key = hashlib.sha256(mode + label + b"|" + str(n).encode()).hexdigest()[:24]
        path = os.path.join(cache_dir, f"gens_{key}.npz")
        try:
            d = np.load(path)
            return (jnp.asarray(d["x"]), jnp.asarray(d["y"]), jnp.asarray(d["inf"]))
        except (OSError, KeyError, ValueError):
            pass
        if secure:
            pts = CJ.encode_points_affine(MultiCommitGens._derive_secure(label, n + 1))
        else:
            scalars = _gen_scalars_from_label(label, n + 1)
            pts = points_from_scalars(scalars)
        try:
            os.makedirs(cache_dir, exist_ok=True)
            tmp = f"{path}.{os.getpid()}.npz"
            with open(tmp, "wb") as fh:
                np.savez(fh, x=np.asarray(pts[0]), y=np.asarray(pts[1]),
                         inf=np.asarray(pts[2]))
            os.replace(tmp, path)
        except OSError:
            pass
        return pts

    # -- structural ops (commitments.rs:64-114) --------------------------------

    def split_at(self, mid: int):
        left = MultiCommitGens(mid, _from=(tuple(a[:mid] for a in self.G), self.h))
        right = MultiCommitGens(self.n - mid, _from=(tuple(a[mid:] for a in self.G), self.h))
        return left, right

    def scale(self, s: int) -> "MultiCommitGens":
        from spartan_tpu.core.hostpath import HOST_MSM_N

        if self.n <= HOST_MSM_N:
            Gs, _h = self.host_points()
            scaled = [CH.scalar_mul(s, p) for p in Gs]
            pts = CJ.encode_points_affine(scaled)
            out = MultiCommitGens(self.n, _from=(pts, self.h))
            out._host_pts = (scaled, _h)
            return out
        sc = jnp.asarray(ints_to_limbs([s % FR_MOD] * self.n))
        proj = CJ.scalar_mul(sc, CJ.from_affine(*self.G))
        pts = CJ.batch_normalize(proj)
        return MultiCommitGens(self.n, _from=(pts, self.h))

    @staticmethod
    def from_points(G_affine, h_affine) -> "MultiCommitGens":
        n = G_affine[0].shape[0]
        return MultiCommitGens(n, _from=(G_affine, h_affine))

    def extended_points(self):
        """(G_0..G_{n-1}, h) as one affine device tuple for (n+1)-MSMs."""
        return tuple(
            jnp.concatenate([g, h[None]], axis=0) for g, h in zip(self.G, self.h)
        )

    def host_points(self) -> tuple[list, CH.Point]:
        cached = getattr(self, "_host_pts", None)
        if cached is None:
            Gs = CJ.decode_points(CJ.from_affine(*self.G))
            h = CJ.decode_points(tuple(a[None] for a in CJ.from_affine(*self.h)))[0]
            cached = (Gs, h)
            self._host_pts = cached
        return cached


def commit(values: list[int], blind: int, gens: MultiCommitGens) -> GroupElem:
    """<values, G> + blind*h as a host GroupElem (commitments.rs:118-154)."""
    assert len(values) == gens.n
    from spartan_tpu.core.hostpath import HOST_MSM_N

    if gens.n <= HOST_MSM_N:
        Gs, h = gens.host_points()
        return GroupElem(CH.msm([v % FR_MOD for v in values] + [blind % FR_MOD],
                                Gs + [h]))
    sc = jnp.asarray(ints_to_limbs([v % FR_MOD for v in values] + [blind % FR_MOD]))
    pt = MSM.msm(gens.extended_points(), sc)
    return GroupElem(CJ.decode_points(tuple(a[None] for a in pt))[0])


def commit_scalar(value: int, blind: int, gens: MultiCommitGens) -> GroupElem:
    assert gens.n == 1
    return commit([value], blind, gens)


def commit_device(values_mont, blind_mont, gens: MultiCommitGens):
    """Device-side commit: values [n,16] Montgomery; returns projective point."""
    vals = F.fr.from_mont(jnp.concatenate([values_mont, blind_mont[None]], axis=0))
    return MSM.msm(gens.extended_points(), vals)


def commit_rows(Z_mont, blinds_mont, gens: MultiCommitGens, mesh=None):
    """Hyrax row commits: Z [L, R] x shared gens (+ per-row blind*h).

    Z_mont: [L, R, 16] Montgomery; blinds_mont: [L, 16] Montgomery.
    Returns projective points batched [L]. This is the reference's
    ``commit_inner`` rayon hot loop (hyrax.rs:253-267) as one batched MSM,
    chunked over rows so the from_mont + digit-split transients stay
    bounded (the full 4096x4097 matrix OOMed 16 GB HBM at 2^18 scale).
    With ``mesh``, rows are sharded over the devices (bit-identical).
    """
    L, R = Z_mont.shape[0], Z_mont.shape[1]
    assert R == gens.n
    if mesh is not None and mesh.devices.size > 1 and L >= mesh.devices.size:
        from spartan_tpu.parallel.msm_sharded import commit_rows_sharded

        return commit_rows_sharded(mesh, Z_mont, blinds_mont,
                                   gens.extended_points())
    rows_max = max(1, min(L, ROWS_BUDGET // (R + 1)))
    # balance the chunks: ceil-split L so the tail chunk is (nearly) full
    # — the driver pads short chunks to the call shape and a mostly-pad
    # chunk walks its full point count as garbage
    n_chunks = -(-L // rows_max)
    rows_per = -(-L // n_chunks)
    pts = gens.extended_points()
    parts = []
    start = 0
    while start < L:
        stop = min(start + rows_per, L)
        zc = Z_mont[start:stop]
        bc = blinds_mont[start:stop]
        if stop - start < rows_per:  # pad to reuse one compilation
            pad = rows_per - (stop - start)
            zc = jnp.concatenate(
                [zc, jnp.zeros((pad, R, NUM_LIMBS), jnp.uint32)], axis=0)
            bc = jnp.concatenate(
                [bc, jnp.zeros((pad, NUM_LIMBS), jnp.uint32)], axis=0)
        sc = jnp.concatenate([zc, bc[:, None, :]], axis=1)
        sc_canon = F.fr.from_mont(sc)
        parts.append(MSM.msm(pts, sc_canon))
        start = stop
    if len(parts) == 1:
        return tuple(a[:L] for a in parts[0])
    return tuple(
        jnp.concatenate([p[i] for p in parts], axis=0)[:L] for i in range(3))
