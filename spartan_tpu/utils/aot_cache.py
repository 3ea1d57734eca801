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

# env switches that do NOT change any traced computation — everything else
# under SPARTAN_TPU_* is assumed trace-affecting (FUSED_ROUND, SUMCHECK_T,
# PADD, MSM_BT, ...) and keyed into the cache, so flipping a kill switch
# can never keep loading an executable compiled under the old setting
_ENV_INERT = {
    "SPARTAN_TPU_AOT", "SPARTAN_TPU_PROFILE", "SPARTAN_TPU_PLATFORM",
    "SPARTAN_TPU_CPU_MESH_CACHE",
}


def _env_sig() -> str:
    items = sorted((k, v) for k, v in os.environ.items()
                   if k.startswith("SPARTAN_TPU_") and k not in _ENV_INERT)
    return repr(items)


def _deps_hash(module: str) -> str:
    """Hash of the kernel's dependency closure, not the whole package.

    An aot_jit kernel's traced computation is determined by its defining
    module plus the algebra layers it closes over — everything under
    spartan_tpu/ops/ AND spartan_tpu/core/ (field/curve/limb kernels, the
    device transcript, protocol helpers like unipoly that fused kernels
    trace through) — plus the jax version. Keying on that closure means
    edits to drivers, io, tests, or docs do NOT invalidate compiled
    executables (the whole-package hash forced a full recompile of every
    kernel after ANY .py edit, ~45 min of XLA compiles at keyless scale).
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
    for sub in ("ops", "core"):
        d = os.path.join(root, sub)
        files.extend(os.path.join(d, f)
                     for f in sorted(os.listdir(d)) if f.endswith(".py"))
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


def aot_jit(fn=None, *, static_argnames=(), donate_argnames=()):
    """jax.jit whose (trace + compile) is persisted as a loadable
    executable. Static args are bound by keyword via functools.partial so
    the serialized in_tree covers only the dynamic arguments.

    ``donate_argnames``: arguments whose buffers the caller hands over
    (dead after the call) — lets XLA reuse their HBM for outputs, which
    is what keeps the fused sumcheck round steps in-budget at keyless
    scale (one table in flight instead of input+copy+output)."""
    if fn is None:
        return functools.partial(aot_jit, static_argnames=static_argnames,
                                 donate_argnames=donate_argnames)

    sig = inspect.signature(fn)
    static_set = set(static_argnames)
    jit_kw = {}
    if static_argnames:
        jit_kw["static_argnames"] = tuple(static_argnames)
    if donate_argnames:
        jit_kw["donate_argnames"] = tuple(donate_argnames)
    jfn_plain = jax.jit(fn, **jit_kw)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not _active():
            return jfn_plain(*args, **kwargs)
        # inside an enclosing trace (shard_map/jit on a real mesh) a loaded
        # executable cannot be applied to tracers — inline via plain jit
        if any(isinstance(x, jax.core.Tracer)
               for x in jax.tree_util.tree_leaves((args, kwargs))):
            return jfn_plain(*args, **kwargs)
        bound = sig.bind(*args, **kwargs)
        bound.apply_defaults()
        statics = {k: v for k, v in bound.arguments.items() if k in static_set}
        dyn = [v for k, v in bound.arguments.items() if k not in static_set]
        key_src = "|".join([
            fn.__module__, fn.__qualname__, _deps_hash(fn.__module__),
            _env_sig(), repr(sorted(statics.items())), _shape_sig(dyn)])
        key = hashlib.sha256(key_src.encode()).hexdigest()[:24]
        with _LOCK:
            loaded = _MEM.get(key)
        if loaded is None:
            loaded = _load_or_build(key, fn, statics, dyn, donate_argnames)
            with _LOCK:
                _MEM[key] = loaded
        return loaded(*dyn)

    wrapper.__wrapped_jit__ = jfn_plain
    return wrapper


def _load_or_build(key, fn, statics, dyn, donate_argnames=()):
    import time

    from jax.experimental import serialize_executable as se

    from spartan_tpu.utils.timer import Timer

    path = os.path.join(_dir(), key + ".exec")
    if os.path.exists(path):
        try:
            t0 = time.perf_counter()
            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.loads(fh.read())
            out = se.deserialize_and_load(payload, in_tree, out_tree)
            Timer.acc("aot/load", time.perf_counter() - t0)
            Timer.count("aot/load")
            return out
        except Exception:
            os.unlink(path)
    jkw = {"donate_argnames": tuple(donate_argnames)} if donate_argnames else {}
    pfn = jax.jit(functools.partial(fn, **statics), **jkw) if statics \
        else jax.jit(fn, **jkw)
    try:
        t0 = time.perf_counter()
        compiled = pfn.lower(*dyn).compile()
        Timer.acc("aot/compile", time.perf_counter() - t0)
        Timer.count("aot/compile")
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
