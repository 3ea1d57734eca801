"""Real device synchronization for timing.

Through the axon TPU tunnel, ``jax.block_until_ready`` returns once the
remote runtime has ACCEPTED the work, not when it has finished — measured:
a 2^16 MSM "completes" in 3.6 ms under block_until_ready but takes ~6 s to
actually produce its result. Every timing path must therefore force a
device->host fetch of (a sliver of) the result; fetching any element of an
array waits for the kernel that produces it.

Cost: one tunnel round trip (~33 ms) + a tiny transfer — negligible at the
second-scale timings this library cares about, but do NOT use inside hot
loops that would otherwise stay async.
"""

from __future__ import annotations

import numpy as np


def sync(tree) -> None:
    """Block until every array in the pytree has actually been computed."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ndim"):
            idx = (0,) * leaf.ndim
            np.asarray(jax.device_get(leaf[idx] if leaf.ndim else leaf))
