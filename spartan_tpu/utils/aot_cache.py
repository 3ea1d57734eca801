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
_cache_dir = None


_dep_hash: dict = {}


def _deps_hash(module: str) -> str:
    """Hash of the kernel's dependency closure, not the whole package.

    An aot_jit kernel's traced computation is determined by its defining
    module plus the algebra layer it closes over — everything under
    spartan_tpu/ops/ (field/curve/limb kernels, the device transcript) —
    plus the jax version. Keying on just that closure means edits to
    drivers, io, tests, or docs do NOT invalidate compiled executables
    (the whole-package hash forced a full recompile of every kernel after
    ANY .py edit, which at keyless scale costs ~45 min of XLA compiles).
    New kernel modules outside core/ops that grow extra dependencies must
    keep them inside ops/ or add them here.
    """
    cached = _dep_hash.get(module)
    if cached is not None:
        return cached
    import importlib
    import spartan_tpu

    root = os.path.dirname(spartan_tpu.__file__)
    files = []
    mod = importlib.import_module(module)
    mod_file = getattr(mod, "__file__", None)
    if mod_file:
        files.append(mod_file)
    ops_dir = os.path.join(root, "ops")
    files.extend(os.path.join(ops_dir, f)
                 for f in sorted(os.listdir(ops_dir)) if f.endswith(".py"))
    h = hashlib.sha256()
    for p in files:
        h.update(p.encode())
        with open(p, "rb") as fh:
            h.update(fh.read())
    h.update(jax.__version__.encode())
    out = h.hexdigest()[:16]
    _dep_hash[module] = out
    return out


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
            fn.__module__, fn.__qualname__, _deps_hash(fn.__module__),
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
