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


def points_from_scalars(scalars: list[int]):
    """Batch-compute s_i * G on device, returned as affine device arrays."""
    sc = jnp.asarray(ints_to_limbs([s % FR_MOD for s in scalars]))
    gx, gy, _ = CJ.encode_points([CH.GEN] * len(scalars))
    proj = CJ.scalar_mul(sc, (gx, gy, F.fq.one((len(scalars),))))
    x, y, inf = CJ.batch_normalize(proj)
    return (x, y, inf)


class MultiCommitGens:
    """n Pedersen generators + blinding generator h, device-resident."""

    def __init__(self, n: int, label: bytes | None = None, _from=None):
        self.n = n
        if _from is not None:
            self.G, self.h = _from
            return
        assert label is not None
        scalars = _gen_scalars_from_label(label, n + 1)
        pts = points_from_scalars(scalars)
        self.G = tuple(a[:n] for a in pts)
        self.h = tuple(a[n] for a in pts)

    # -- structural ops (commitments.rs:64-114) --------------------------------

    def split_at(self, mid: int):
        left = MultiCommitGens(mid, _from=(tuple(a[:mid] for a in self.G), self.h))
        right = MultiCommitGens(self.n - mid, _from=(tuple(a[mid:] for a in self.G), self.h))
        return left, right

    def scale(self, s: int) -> "MultiCommitGens":
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
        Gs = CJ.decode_points(CJ.from_affine(*self.G))
        h = CJ.decode_points(tuple(a[None] for a in CJ.from_affine(*self.h)))[0]
        return Gs, h


def commit(values: list[int], blind: int, gens: MultiCommitGens) -> GroupElem:
    """<values, G> + blind*h as a host GroupElem (commitments.rs:118-154)."""
    assert len(values) == gens.n
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


def commit_rows(Z_mont, blinds_mont, gens: MultiCommitGens):
    """Hyrax row commits: Z [L, R] x shared gens (+ per-row blind*h).

    Z_mont: [L, R, 16] Montgomery; blinds_mont: [L, 16] Montgomery.
    Returns projective points batched [L]. This is the reference's
    ``commit_inner`` rayon hot loop (hyrax.rs:253-267) as one batched MSM.
    """
    L, R = Z_mont.shape[0], Z_mont.shape[1]
    assert R == gens.n
    sc = jnp.concatenate([Z_mont, blinds_mont[:, None, :]], axis=1)
    sc_canon = F.fr.from_mont(sc)
    return MSM.msm(gens.extended_points(), sc_canon)
