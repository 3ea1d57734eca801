"""Device-mesh construction helpers for pod-scale proving.

The prover's distributed layer (SURVEY.md §2.2): one logical axis ("shard")
partitions every length-N table — MSM points, sumcheck evaluation tables,
product-tree layers. Collectives ride ICI within a slice; the host-side
transcript is replicated and advanced identically on every host.

Multi-host (DCN) model: the protocol driver is host-sequential and
deterministic, so every process holds identical host state (transcript,
challenges, full tables before sharding) and issues identical global
operations — the standard JAX multi-controller discipline. ``shard_table``
feeds each process only its addressable rows; ``gather_table`` is the one
place a device table crosses back to every host (an all-gather that rides
ICI within a host and DCN between hosts). Single-process runs take the
zero-copy fast paths. The multi-host branches are exercised by a real
2-process ``jax.distributed`` run over gloo CPU collectives
(tools/dcn_smoke.py: per-process shard feeding, replicated all-gather
handoff, strided gathers, and a cross-process field-psum sumcheck round,
all checked against the single-process reference); multi-host TPU
hardware itself has not been available.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"

_cache_guard_installed = False


def _install_cpu_mesh_cache_guard() -> None:
    """Optionally skip persistent-cache writes for multi-device CPU
    executables (SPARTAN_TPU_CPU_MESH_CACHE=0).

    An earlier jaxlib SIGSEGVed inside ``executable.serialize()`` on very
    large multi-device CPU executables (below any Python try/except), so
    these writes used to be skipped unconditionally. On the current jaxlib
    the K=12 batched mesh SNARK step (the largest module the prover
    builds, ~30 MB serialized) round-trips fine — re-verified before the
    skip was lifted — and caching it is what makes the driver's multichip
    dryrun pass its timeout (that one module costs ~220 s of XLA:CPU
    compile on this 1-core box). The env switch restores the old skip if
    a future jaxlib regresses.
    """
    global _cache_guard_installed
    if _cache_guard_installed:
        return
    _cache_guard_installed = True
    import os

    if os.environ.get("SPARTAN_TPU_CPU_MESH_CACHE", "1") != "0":
        return  # writes allowed — nothing to install
    from jax._src import compilation_cache as _cc

    _orig_put = _cc.put_executable_and_time

    def _safe_put(cache_key, module_name, executable, backend, compile_time):
        try:
            multi = len(executable.local_devices()) > 1
            is_cpu = backend.platform == "cpu"
        except Exception:
            multi, is_cpu = False, False
        if multi and is_cpu:
            return None
        return _orig_put(cache_key, module_name, executable, backend,
                         compile_time)

    _cc.put_executable_and_time = _safe_put


def init_distributed(**kwargs) -> None:
    """Bring up the multi-controller runtime for a pod slice spanning hosts.

    Call once per process before ``make_mesh()``. On Cloud TPU,
    ``jax.distributed.initialize()`` auto-detects the coordinator and
    process topology from the TPU metadata; elsewhere pass
    ``coordinator_address=..., num_processes=..., process_id=...``.
    After this, ``jax.devices()`` is global across the slice, so the mesh
    and every shard_map collective span hosts automatically (DCN between
    hosts, ICI within). No-op when already initialized.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized (or explicitly single-process)


def make_mesh(num_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = num_devices if num_devices is not None else len(devs)
    if n > 1 and devs[0].platform == "cpu":
        _install_cpu_mesh_cache_guard()
    return Mesh(np.array(devs[:n]), (SHARD_AXIS,))


def shard_table(mesh: Mesh, x, _force_callback: bool = False):
    """Shard a [N, ...] table across the mesh's first axis.

    Multi-host: the host-sequential driver gives every process the full
    table, so each process contributes exactly its addressable shards
    (``_force_callback`` exercises that branch in single-process tests).
    """
    spec = P(SHARD_AXIS, *([None] * (x.ndim - 1)))
    sh = NamedSharding(mesh, spec)
    if _force_callback or jax.process_count() > 1:
        xh = np.asarray(x)
        return jax.make_array_from_callback(xh.shape, sh, lambda idx: xh[idx])
    return jax.device_put(x, sh)


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def gather_table(mesh: Mesh, x):
    """Mesh-sharded table -> fully-addressable array on every process.

    The single handoff point from mesh kernels back to the host driver /
    single-device tails. Multi-host this is a compiled all-gather to a
    replicated layout; single-process the array is already addressable
    and passes through untouched.
    """
    if jax.process_count() > 1:
        out_sh = NamedSharding(mesh, P(*([None] * x.ndim)))
        return jax.jit(lambda a: a, out_shardings=out_sh)(x)
    return x


def gather_unstride(mesh: Mesh, x):
    """[D, m, 16] strided-sharded table -> natural-order [D*m, 16] array.

    On the virtual-device CPU backend this goes THROUGH THE HOST: pulling
    addressable shards is a plain device->host copy per shard, whereas the
    jnp reshape/swapaxes form reshards across the mesh axis — XLA lowers
    that to an all-gather whose 8-thread rendezvous intermittently stalls
    120 s+ on a starved 1-core CPU host (the dryrun flake). Values are
    identical either way. Real accelerator meshes (and multi-process runs,
    where shards aren't host-addressable) keep the compiled collective.
    """
    if jax.process_count() > 1 or jax.default_backend() != "cpu":
        from spartan_tpu.parallel.sumcheck_sharded import from_strided

        return from_strided(gather_table(mesh, x))
    xh = np.asarray(x)
    d, m = xh.shape[0], xh.shape[1]
    nat = np.ascontiguousarray(xh.transpose(1, 0, 2)).reshape(d * m, xh.shape[-1])
    return jnp.asarray(nat)
