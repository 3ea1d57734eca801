"""Device-side merlin transcript: Keccak-f[1600] + STROBE-128 in JAX.

The host transcript (utils/transcript.py) costs one device->host transfer
per sumcheck round to fetch the round-poly evaluations it must absorb; over
a tunneled chip that transfer is ~27 ms, and a keyless-scale prove has ~900
sequential rounds. This module lets an ENTIRE sumcheck run as one compiled
program: the sponge state lives on device, challenges are squeezed and
mod-reduced in-kernel, and the host replays the byte trail afterwards to
advance its own authoritative transcript (asserting the challenges match,
so any divergence from merlin semantics is caught immediately).

Byte positions within the sponge are Python ints, not traced values: every
merlin operation has a static length, so the position trail is a function
of protocol structure (which is already part of the jit shape key), never
of field values. XORs and squeezes therefore compile to static slices.

Bit-compatibility contract is the same as utils/strobe.py: STROBE v1.0.2,
128-bit level, rate 166, merlin framing (/root/reference/src/transcript.rs).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.keccak import _ROT, _ROUND_CONSTANTS
from spartan_tpu.ops.limbs import NUM_LIMBS, int_to_limbs

_U32 = jnp.uint32
_STROBE_R = 166

FLAG_I = 1
FLAG_A = 1 << 1
FLAG_C = 1 << 2
FLAG_T = 1 << 3
FLAG_M = 1 << 4
FLAG_K = 1 << 5

# round constants split into (lo, hi) uint32 halves
_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _ROUND_CONSTANTS], dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _ROUND_CONSTANTS], dtype=np.uint32)

# rho+pi wiring, precomputed: lane b[_PI_DST[i]] = rol(a[i], _PI_ROT[i])
_PI_DST = np.zeros(25, dtype=np.int32)
_PI_ROT = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _PI_DST[_x + 5 * _y] = _y + 5 * ((2 * _x + 3 * _y) % 5)
        _PI_ROT[_x + 5 * _y] = _ROT[_x][_y]
# inverse permutation: b[i] = rol(a[_PI_SRC[i]], _PI_SROT[i])
_PI_SRC = np.zeros(25, dtype=np.int32)
for _i in range(25):
    _PI_SRC[_PI_DST[_i]] = _i
_PI_SROT = _PI_ROT[_PI_SRC]


def _rol64(lo, hi, n: int):
    """Rotate-left the 64-bit lanes (hi:lo) by a STATIC amount n."""
    n %= 64
    if n == 0:
        return lo, hi
    if n == 32:
        return hi, lo
    if n < 32:
        return (lo << n) | (hi >> (32 - n)), (hi << n) | (lo >> (32 - n))
    n -= 32
    return (hi << n) | (lo >> (32 - n)), (lo << n) | (hi >> (32 - n))


_PI_SWAP = (_PI_SROT % 64) >= 32
_PI_NL = np.asarray((_PI_SROT % 64) % 32, dtype=np.uint32)


def _round(i, lanes):
    lo, hi = lanes
    # theta
    g = lo.reshape(5, 5)  # g[y, x] = lane x + 5y
    h = hi.reshape(5, 5)
    c_lo = g[0] ^ g[1] ^ g[2] ^ g[3] ^ g[4]  # [x]
    c_hi = h[0] ^ h[1] ^ h[2] ^ h[3] ^ h[4]
    r_lo, r_hi = _rol64(jnp.roll(c_lo, -1), jnp.roll(c_hi, -1), 1)
    d_lo = jnp.roll(c_lo, 1) ^ r_lo
    d_hi = jnp.roll(c_hi, 1) ^ r_hi
    lo = (g ^ d_lo[None, :]).reshape(25)
    hi = (h ^ d_hi[None, :]).reshape(25)
    # rho + pi, vectorized: per-lane 64-bit rotl by static amounts — a
    # rotl by n >= 32 is a (hi,lo) swap plus a rotl by n-32, so gather the
    # pre-swapped halves and shift the whole [25] vector at once
    lo_g, hi_g = lo[_PI_SRC], hi[_PI_SRC]
    a = jnp.where(_PI_SWAP, hi_g, lo_g)
    b = jnp.where(_PI_SWAP, lo_g, hi_g)
    sh = jnp.asarray(_PI_NL)
    nz = _PI_NL > 0
    b_lo = (a << sh) | jnp.where(nz, b >> (jnp.uint32(32) - sh), jnp.uint32(0))
    b_hi = (b << sh) | jnp.where(nz, a >> (jnp.uint32(32) - sh), jnp.uint32(0))
    # chi
    g = b_lo.reshape(5, 5)
    h = b_hi.reshape(5, 5)
    lo = (g ^ (~jnp.roll(g, -1, axis=1) & jnp.roll(g, -2, axis=1))).reshape(25)
    hi = (h ^ (~jnp.roll(h, -1, axis=1) & jnp.roll(h, -2, axis=1))).reshape(25)
    # iota
    lo = lo.at[0].set(lo[0] ^ jnp.asarray(_RC_LO)[i])
    hi = hi.at[0].set(hi[0] ^ jnp.asarray(_RC_HI)[i])
    return lo, hi


def keccak_f1600_lanes(lo, hi):
    """Keccak-f[1600] on 25 lanes given as (lo, hi) uint32[25] pairs."""
    return jax.lax.fori_loop(0, 24, _round, (lo, hi))


def _bytes_to_lanes(state):
    s = state.reshape(25, 8).astype(_U32)
    lo = s[:, 0] | (s[:, 1] << 8) | (s[:, 2] << 16) | (s[:, 3] << 24)
    hi = s[:, 4] | (s[:, 5] << 8) | (s[:, 6] << 16) | (s[:, 7] << 24)
    return lo, hi


def _lanes_to_bytes(lo, hi):
    cols = [lo, lo >> 8, lo >> 16, lo >> 24, hi, hi >> 8, hi >> 16, hi >> 24]
    return (jnp.stack(cols, axis=1) & jnp.uint32(0xFF)).astype(jnp.uint8).reshape(200)


def keccak_f1600_state(state):
    """Keccak-f[1600] on a uint8[200] state (little-endian lanes)."""
    lo, hi = keccak_f1600_lanes(*_bytes_to_lanes(state))
    return _lanes_to_bytes(lo, hi)


# ---------------------------------------------------------------------------
# STROBE-128 with a device-resident sponge (mirrors utils/strobe.py)
# ---------------------------------------------------------------------------

def _const_u8(data: bytes):
    return jnp.asarray(np.frombuffer(data, dtype=np.uint8))


class DeviceStrobe:
    """STROBE-128 whose 200-byte state is a traced jnp array.

    pos / pos_begin / cur_flags are Python ints (static): merlin ops have
    fixed lengths, so positions never depend on traced values.
    """

    __slots__ = ("state", "pos", "pos_begin", "cur_flags")

    def __init__(self, state, pos: int, pos_begin: int, cur_flags: int):
        self.state = state
        self.pos = pos
        self.pos_begin = pos_begin
        self.cur_flags = cur_flags

    def _run_f(self) -> None:
        st = self.state
        st = st.at[self.pos].set(st[self.pos] ^ jnp.uint8(self.pos_begin))
        st = st.at[self.pos + 1].set(st[self.pos + 1] ^ jnp.uint8(0x04))
        st = st.at[_STROBE_R + 1].set(st[_STROBE_R + 1] ^ jnp.uint8(0x80))
        self.state = keccak_f1600_state(st)
        self.pos = 0
        self.pos_begin = 0

    def _absorb(self, data) -> None:
        """data: uint8[k] (traced or constant), k static."""
        k = int(data.shape[0])
        i = 0
        while i < k:
            take = min(_STROBE_R - self.pos, k - i)
            p = self.pos
            self.state = self.state.at[p:p + take].set(
                self.state[p:p + take] ^ jax.lax.dynamic_slice(data, (i,), (take,)))
            self.pos += take
            i += take
            if self.pos == _STROBE_R:
                self._run_f()

    def _squeeze(self, n: int):
        outs = []
        i = 0
        while i < n:
            take = min(_STROBE_R - self.pos, n - i)
            p = self.pos
            outs.append(self.state[p:p + take])
            self.state = self.state.at[p:p + take].set(jnp.zeros(take, jnp.uint8))
            self.pos += take
            i += take
            if self.pos == _STROBE_R:
                self._run_f()
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def _begin_op_bytes(self, flags: int) -> bytes:
        """Bookkeeping of _begin_op; returns the 2 framing bytes so the
        caller can coalesce them with the data into one absorb (valid for
        non-C ops, where no F is forced between framing and data)."""
        assert flags & FLAG_K == 0, "KEY flag not supported"
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        return bytes([old_begin, flags])

    def _begin_op(self, flags: int, more: bool) -> None:
        if more:
            assert self.cur_flags == flags, "cannot change flags mid-operation"
            return
        self._absorb(_const_u8(self._begin_op_bytes(flags)))
        if flags & (FLAG_C | FLAG_K) and self.pos != 0:
            self._run_f()

    def _absorb_multi(self, parts) -> None:
        """Absorb a concatenation of host-bytes / traced-uint8 parts as one
        buffer (fewer, larger sponge updates -> much smaller HLO)."""
        bufs, pend = [], b""
        for p in parts:
            if isinstance(p, (bytes, bytearray)):
                pend += bytes(p)
            else:
                if pend:
                    bufs.append(_const_u8(pend))
                    pend = b""
                bufs.append(p)
        if pend:
            bufs.append(_const_u8(pend))
        self._absorb(bufs[0] if len(bufs) == 1 else jnp.concatenate(bufs))

    def meta_ad(self, data, more: bool) -> None:
        if more:
            self._begin_op(FLAG_M | FLAG_A, more)
            self._absorb(data)
        else:
            self._absorb_multi([self._begin_op_bytes(FLAG_M | FLAG_A), data])

    def ad(self, data, more: bool) -> None:
        if more:
            self._begin_op(FLAG_A, more)
            self._absorb(data)
        else:
            self._absorb_multi([self._begin_op_bytes(FLAG_A), data])

    def prf(self, n: int, more: bool):
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, more)
        return self._squeeze(n)


# ---------------------------------------------------------------------------
# dynamic-position STROBE: sponge position as a TRACED value, for use inside
# lax.scan bodies where the byte offset differs per iteration
# ---------------------------------------------------------------------------

class DynStrobe:
    """STROBE-128 whose state AND byte position are traced values.

    The static-position DeviceStrobe above requires one trace per distinct
    sponge offset; inside a ``lax.scan`` over sumcheck rounds the offset
    varies per round, so here ``pos``/``pos_begin`` are int32 scalars and
    absorbs/squeezes use dynamic slices with a ``lax.cond``-guarded
    permutation at the rate boundary. Each op absorbs at most one rate
    crossing (callers keep chunks <= 166 bytes).

    Only the squeezed challenges need to leave the kernel: the host replays
    its own transcript afterwards, so the final sponge state is discarded.
    """

    __slots__ = ("state", "pos", "pos_begin")

    def __init__(self, state, pos, pos_begin):
        self.state = state
        self.pos = jnp.asarray(pos, jnp.int32)
        self.pos_begin = jnp.asarray(pos_begin, jnp.int32)

    def _pad_and_f(self, state, pos, pos_begin):
        """F with the STROBE padding XORed at (traced) pos."""
        st = state
        st = st.at[pos].set(st[pos] ^ pos_begin.astype(jnp.uint8))
        st = st.at[pos + 1].set(st[pos + 1] ^ jnp.uint8(0x04))
        st = st.at[_STROBE_R + 1].set(st[_STROBE_R + 1] ^ jnp.uint8(0x80))
        return keccak_f1600_state(st)

    def _run_f_if(self, flag) -> None:
        """Run padded F when ``flag`` (traced bool) is set."""
        self.state = jax.lax.cond(
            flag, lambda s: self._pad_and_f(s, self.pos, self.pos_begin),
            lambda s: s, self.state)
        self.pos = jnp.where(flag, 0, self.pos)
        self.pos_begin = jnp.where(flag, 0, self.pos_begin)

    def _absorb(self, data) -> None:
        """XOR k (static, <= 166) bytes at the traced position, running F
        at the rate boundary."""
        k = int(data.shape[0])
        assert k <= _STROBE_R
        # scatter the chunk into a rate+k window starting at pos
        upd = jnp.zeros(_STROBE_R + k, jnp.uint8)
        upd = jax.lax.dynamic_update_slice(upd, data, (self.pos,))
        st = self.state.at[:_STROBE_R].set(
            self.state[:_STROBE_R] ^ upd[:_STROBE_R])
        new_pos = self.pos + k
        wrap = new_pos >= _STROBE_R
        # at a crossing the whole rate block is full, so the pad lands at
        # the static index 166 (merlin absorbs byte-wise; F fires at pos=R)
        def crossed(s):
            s = s.at[_STROBE_R].set(s[_STROBE_R] ^ self.pos_begin.astype(jnp.uint8))
            s = s.at[_STROBE_R + 1].set(s[_STROBE_R + 1] ^ jnp.uint8(0x04 ^ 0x80))
            s = keccak_f1600_state(s)
            # leftover bytes (beyond the boundary) land at the block start
            return s.at[:k].set(s[:k] ^ upd[_STROBE_R:])

        self.state = jax.lax.cond(wrap, crossed, lambda s: s, st)
        self.pos = jnp.where(wrap, new_pos - _STROBE_R, new_pos)
        self.pos_begin = jnp.where(wrap, 0, self.pos_begin)

    def _squeeze(self, n: int):
        assert n <= _STROBE_R
        pos = self.pos
        mid = _STROBE_R - pos  # traced; bytes available before the boundary
        # zero the read-out region up to the boundary, then F if we cross
        iota = jnp.arange(200)
        wrap = n >= mid
        zmaskA = (iota >= pos) & (iota < jnp.where(wrap, _STROBE_R, pos + n))
        st_z = jnp.where(zmaskA, jnp.uint8(0), self.state)

        def crossed(s):
            s = s.at[_STROBE_R].set(s[_STROBE_R] ^ self.pos_begin.astype(jnp.uint8))
            s = s.at[_STROBE_R + 1].set(s[_STROBE_R + 1] ^ jnp.uint8(0x04 ^ 0x80))
            s = keccak_f1600_state(s)
            # zero the bytes squeezed after the boundary
            tail = (iota < (n - mid))
            return jnp.where(tail, jnp.uint8(0), s)

        st2 = jax.lax.cond(wrap, crossed, lambda s: s, st_z)
        # output: bytes pos..boundary from the ORIGINAL state, remainder
        # from the post-F state (concatenated view, gathered statically)
        ext = jnp.concatenate([self.state, st2])
        i = jnp.arange(n)
        idx = jnp.where(pos + i < _STROBE_R, pos + i, pos + i - _STROBE_R + 200)
        out = ext[idx]
        self.state = st2
        self.pos = jnp.where(wrap, n - mid, pos + n)
        self.pos_begin = jnp.where(wrap, 0, self.pos_begin)
        return out

    def _begin_op_framing(self, flags: int):
        """Traced framing bytes [old_begin, flags]; updates bookkeeping."""
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        framing = jnp.stack([old_begin.astype(jnp.uint8),
                             jnp.uint8(flags)])
        return framing

    def _absorb_op(self, flags: int, parts) -> None:
        """begin_op + coalesced absorb (non-C ops)."""
        bufs = [self._begin_op_framing(flags)]
        for p in parts:
            bufs.append(_const_u8(bytes(p)) if isinstance(p, (bytes, bytearray)) else p)
        self._absorb(jnp.concatenate(bufs))

    def meta_ad_op(self, *parts) -> None:
        self._absorb_op(FLAG_M | FLAG_A, parts)

    def ad_op(self, *parts) -> None:
        self._absorb_op(FLAG_A, parts)

    def prf(self, n: int):
        self._absorb(self._begin_op_framing(FLAG_I | FLAG_A | FLAG_C))
        self._run_f_if(self.pos != 0)
        return self._squeeze(n)


class DynTranscript:
    """merlin transcript over DynStrobe (traced positions, scan-safe)."""

    __slots__ = ("strobe",)

    def __init__(self, state, pos, pos_begin):
        self.strobe = DynStrobe(state, pos, pos_begin)

    def carry(self):
        s = self.strobe
        return s.state, s.pos, s.pos_begin

    def append_message(self, label: bytes, message) -> None:
        nbytes = len(message) if isinstance(message, (bytes, bytearray)) \
            else int(message.shape[0])
        self.strobe.meta_ad_op(label, nbytes.to_bytes(4, "little"))
        self.strobe.ad_op(message)

    def append_scalar(self, label: bytes, x_mont) -> None:
        self.append_message(label, fr_to_bytes_dev(x_mont))

    def challenge_bytes(self, label: bytes, n: int):
        self.strobe.meta_ad_op(label, n.to_bytes(4, "little"))
        return self.strobe.prf(n)

    def challenge_scalar(self, label: bytes):
        return bytes64_to_fr_mont(self.challenge_bytes(label, 64))


# ---------------------------------------------------------------------------
# field-element byte codecs (device, Montgomery limb form [16] uint32)
# ---------------------------------------------------------------------------

def mont_const(v: int, spec: F.FieldSpec = F.FR):
    """v as a Montgomery-form limb constant (no device transfer)."""
    return jnp.asarray(int_to_limbs(v * spec.r1 % spec.modulus), _U32)


def raw_const(v: int):
    return jnp.asarray(int_to_limbs(v), _U32)


_R3 = raw_const(F.FR.r2 * F.FR.r1 % F.FR.modulus)   # R^3 mod p
_R2 = raw_const(F.FR.r2)


def fr_to_bytes_dev(x_mont):
    """Canonical 32-byte LE serialization of a Montgomery-form element."""
    canon = F.fr.from_mont(x_mont)  # [16] 16-bit limbs, canonical
    b = jnp.stack([canon & 0xFF, (canon >> 8) & 0xFF], axis=-1)
    return b.reshape(2 * NUM_LIMBS).astype(jnp.uint8)


def frs_to_bytes_dev(xs_mont):
    """[..., 16] Montgomery elements -> [..., 32] canonical LE bytes
    (one batched from-Montgomery conversion for the whole stack)."""
    canon = F.fr.from_mont(xs_mont)
    b = jnp.stack([canon & 0xFF, (canon >> 8) & 0xFF], axis=-1)
    return b.reshape(*canon.shape[:-1], 2 * NUM_LIMBS).astype(jnp.uint8)


def bytes64_to_fr_mont(b64):
    """64 LE bytes -> field element mod p, Montgomery form
    (merlin challenge_scalar semantics: from_le_bytes_mod_order)."""
    v = b64.astype(_U32)
    limbs = v[0::2] | (v[1::2] << 8)          # [32] 16-bit limbs
    lo, hi = limbs[:NUM_LIMBS], limbs[NUM_LIMBS:]
    # x = lo + hi*2^256; toMont(x) = mont_mul(lo, R^2) + mont_mul(hi, R^3)
    return F.fr.add(F.fr.mul(lo, _R2), F.fr.mul(hi, _R3))


# ---------------------------------------------------------------------------
# merlin transcript over the device strobe (mirrors utils/transcript.py)
# ---------------------------------------------------------------------------

class DeviceTranscript:
    """merlin::Transcript with a device-resident sponge.

    Construct from a live host Transcript with :meth:`from_host` (inside a
    jit, from its exported state), run any number of ops in-kernel, then
    have the host replay the same ops on its own transcript and assert the
    challenges agree.
    """

    __slots__ = ("strobe",)

    def __init__(self, strobe: DeviceStrobe):
        self.strobe = strobe

    @staticmethod
    def export_host_state(transcript):
        """(bytes200, pos, pos_begin, cur_flags) of a host Transcript."""
        s = transcript.strobe
        return (np.frombuffer(bytes(s.state), dtype=np.uint8),
                s.pos, s.pos_begin, s.cur_flags)

    @staticmethod
    def from_state(state, pos: int, pos_begin: int, cur_flags: int):
        return DeviceTranscript(DeviceStrobe(state, pos, pos_begin, cur_flags))

    @property
    def state(self):
        return self.strobe.state

    def append_message(self, label: bytes, message) -> None:
        """message: host bytes or traced uint8[k]."""
        nbytes = len(message) if isinstance(message, (bytes, bytearray)) \
            else int(message.shape[0])
        s = self.strobe
        # meta_ad(label) + meta_ad(len, more=True): one M|A op, all constant
        s._absorb_multi([s._begin_op_bytes(FLAG_M | FLAG_A), label,
                         nbytes.to_bytes(4, "little")])
        s._absorb_multi([s._begin_op_bytes(FLAG_A), message])

    def append_scalar(self, label: bytes, x_mont) -> None:
        self.append_message(label, fr_to_bytes_dev(x_mont))

    def challenge_bytes(self, label: bytes, n: int):
        s = self.strobe
        s._absorb_multi([s._begin_op_bytes(FLAG_M | FLAG_A), label,
                         n.to_bytes(4, "little")])
        return s.prf(n, False)

    def challenge_scalar(self, label: bytes):
        """Challenge as a Montgomery-form field element."""
        return bytes64_to_fr_mont(self.challenge_bytes(label, 64))
