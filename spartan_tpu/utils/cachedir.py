"""Persistent cache root for all build/runtime artifacts.

/tmp is wiped between build rounds on this machine; the compiled-executable
caches living there made every fresh round recompile the world (~15 min of
XLA compiles per e2e run, see bench_e2e_16.json's cold-cache numbers). All
caches — the XLA persistent compile cache, AOT serialized executables,
Pedersen generator tables, the native .so, the KZG SRS — now default to a
directory inside the repo checkout so they survive across rounds. Override
with SPARTAN_TPU_CACHE_ROOT. No jax imports here: spartan_tpu/__init__.py
must read this before jax is configured.
"""

from __future__ import annotations

import os


def cache_root() -> str:
    root = os.environ.get("SPARTAN_TPU_CACHE_ROOT")
    if not root:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        root = os.path.join(os.path.dirname(pkg), ".spartan_cache")
    os.makedirs(root, exist_ok=True)
    return root


def subdir(name: str) -> str:
    d = os.path.join(cache_root(), name)
    os.makedirs(d, exist_ok=True)
    return d
