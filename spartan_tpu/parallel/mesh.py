"""Device-mesh construction helpers for pod-scale proving.

The prover's distributed layer (SURVEY.md §2.2): one logical axis ("shard")
partitions every length-N table — MSM points, sumcheck evaluation tables,
product-tree layers. Collectives ride ICI within a slice; the host-side
transcript is replicated and advanced identically on every host.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def make_mesh(num_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = num_devices if num_devices is not None else len(devs)
    return Mesh(np.array(devs[:n]), (SHARD_AXIS,))


def shard_table(mesh: Mesh, x):
    """Shard a [N, ...] table across the mesh's first axis."""
    spec = P(SHARD_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
