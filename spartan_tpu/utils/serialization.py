"""Canonical proof serialization (arkworks CanonicalSerialize analog).

Walks proof objects structurally: field scalars as 32-byte LE, group
elements as 32-byte compressed points (flags in the top bits, matching
curve_host.compress), sequences length-prefixed with u32. Deterministic and
schema-driven by the dataclass field order, so sizes are directly
comparable with the reference's published proof sizes (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import struct


def serialize(obj) -> bytes:
    out = bytearray()
    _walk(obj, out)
    return bytes(out)


def save_proof(obj, path: str) -> None:
    """Persist a proof object (pickle; the canonical-bytes form above is for
    sizing/transcript binding — structured deserialization is per-class)."""
    import pickle

    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_proof(path: str):
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def size_bytes(obj) -> int:
    return len(serialize(obj))


def _walk(obj, out: bytearray) -> None:
    from spartan_tpu.core.group import GroupElem

    if isinstance(obj, GroupElem):
        out += obj.compress()
    elif isinstance(obj, bool):
        out += b"\x01" if obj else b"\x00"
    elif isinstance(obj, int):
        out += (obj % (1 << 256)).to_bytes(32, "little")
    elif isinstance(obj, bytes):
        out += struct.pack("<I", len(obj)) + obj
    elif isinstance(obj, (list, tuple)):
        out += struct.pack("<I", len(obj))
        for item in obj:
            _walk(item, out)
    elif dataclasses.is_dataclass(obj):
        for f in dataclasses.fields(obj):
            _walk(getattr(obj, f.name), out)
    elif hasattr(obj, "serialize_fields"):
        for item in obj.serialize_fields():
            _walk(item, out)
    else:
        raise TypeError(f"cannot serialize {type(obj).__name__}")
