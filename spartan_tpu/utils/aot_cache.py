"""AOT executable disk cache: skip jax tracing AND XLA compilation.

XLA's persistent compilation cache only skips the backend compile; jax
still re-TRACES every jitted kernel once per process, and the protocol's
hot kernels trace slowly (the Pallas sequential-bucket MSM costs ~15 s to
trace + 3 s to lower at one shape — paid again in every fresh process,
e.g. every benchmark run). This module serializes the *compiled
executable* (jax.experimental.serialize_executable) keyed by function,
argument shapes/dtypes, static arguments, the whole package's source
hash, and the jax/backend versions; later processes deserialize and call
directly — measured ~0.2 s load + sub-ms dispatch where trace+compile was
~30 s.

Scope: enabled on the TPU backend only (the CPU test backend keeps plain
jit so tests exercise the standard path), opt-out via SPARTAN_TPU_AOT=0.
Cache files are self-written pickles under the repo-local cache root
(utils/cachedir.py) keyed by content hashes — a local build artifact, not
an interchange format.
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import os
import pickle
import threading

import jax

_ENABLED = os.environ.get("SPARTAN_TPU_AOT", "1") == "1"
_MEM: dict = {}
_LOCK = threading.Lock()
_pkg_hash = None
_cache_dir = None


def _package_hash() -> str:
    """Hash of every .py in the package — any edit invalidates the cache."""
    global _pkg_hash
    if _pkg_hash is None:
        import spartan_tpu

        root = os.path.dirname(spartan_tpu.__file__)
        h = hashlib.sha256()
        for dirpath, _dirs, files in sorted(os.walk(root)):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    h.update(p.encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
        h.update(jax.__version__.encode())
        _pkg_hash = h.hexdigest()[:16]
    return _pkg_hash


def _dir() -> str:
    global _cache_dir
    if _cache_dir is None:
        dev = jax.devices()[0]
        tag = f"{dev.platform}_{getattr(dev, 'device_kind', 'x')}".replace(
            " ", "_").replace("/", "_")
        from spartan_tpu.utils.cachedir import subdir

        _cache_dir = subdir(f"aot_{tag}")
    return _cache_dir


def _active() -> bool:
    return _ENABLED and jax.default_backend() == "tpu"


def _shape_sig(tree) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parts = [f"{getattr(x, 'dtype', type(x).__name__)}{getattr(x, 'shape', ())}"
             for x in leaves]
    return f"{treedef}|{';'.join(map(str, parts))}"


def aot_jit(fn=None, *, static_argnames=()):
    """jax.jit whose (trace + compile) is persisted as a loadable
    executable. Static args are bound by keyword via functools.partial so
    the serialized in_tree covers only the dynamic arguments."""
    if fn is None:
        return functools.partial(aot_jit, static_argnames=static_argnames)

    sig = inspect.signature(fn)
    static_set = set(static_argnames)
    jfn_plain = jax.jit(fn, static_argnames=tuple(static_argnames)) \
        if static_argnames else jax.jit(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not _active():
            return jfn_plain(*args, **kwargs)
        bound = sig.bind(*args, **kwargs)
        bound.apply_defaults()
        statics = {k: v for k, v in bound.arguments.items() if k in static_set}
        dyn = [v for k, v in bound.arguments.items() if k not in static_set]
        key_src = "|".join([
            fn.__module__, fn.__qualname__, _package_hash(),
            repr(sorted(statics.items())), _shape_sig(dyn)])
        key = hashlib.sha256(key_src.encode()).hexdigest()[:24]
        with _LOCK:
            loaded = _MEM.get(key)
        if loaded is None:
            loaded = _load_or_build(key, fn, statics, dyn)
            with _LOCK:
                _MEM[key] = loaded
        return loaded(*dyn)

    wrapper.__wrapped_jit__ = jfn_plain
    return wrapper


def _load_or_build(key, fn, statics, dyn):
    from jax.experimental import serialize_executable as se

    path = os.path.join(_dir(), key + ".exec")
    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.loads(fh.read())
            return se.deserialize_and_load(payload, in_tree, out_tree)
        except Exception:
            os.unlink(path)
    pfn = jax.jit(functools.partial(fn, **statics)) if statics else jax.jit(fn)
    try:
        compiled = pfn.lower(*dyn).compile()
        payload, in_tree, out_tree = se.serialize(compiled)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(pickle.dumps((payload, in_tree, out_tree)))
        os.replace(tmp, path)
        return se.deserialize_and_load(payload, in_tree, out_tree)
    except Exception:
        # serialization unsupported for this computation — fall back to the
        # jitted partial (traced once per process)
        return pfn
