"""Compile-lean inclusive scans for expensive combiners.

``jax.lax.associative_scan`` retraces its combiner ~2*log2(N) times, which
is prohibitive when the combiner is a complete curve addition (thousands of
ops). This chunked scan reaches any N with O(log_16 N) combiner traces:

  * intra-chunk pass: ``lax.scan`` over CHUNK sequential steps with the
    remaining N/CHUNK elements as batch (ONE combiner trace);
  * recurse on the per-chunk totals;
  * one fix-up combine applying each chunk's exclusive prefix.

Work is ~2.5N combines and sequential depth CHUNK * log_CHUNK(N) (64 steps
at N=4096) — each step a wide batched VPU op, so TPU throughput is intact.
The operator must be associative; a unit element is required (used for
padding and the first chunk's prefix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CHUNK = 16


def _take(tree, idx):
    return jax.tree_util.tree_map(lambda a: a[idx], tree)


def _pad_to(tree, n, unit_broadcast):
    def pad_one(a, u):
        if a.shape[0] == n:
            return a
        reps = n - a.shape[0]
        filler = jnp.broadcast_to(u, (reps, *a.shape[1:]))
        return jnp.concatenate([a, filler], axis=0)

    return jax.tree_util.tree_map(pad_one, tree, unit_broadcast)


def inclusive_scan(combine, xs, unit, reverse: bool = False):
    """Inclusive scan of a pytree along axis 0.

    combine(a, b): associative op on pytrees (leading axes broadcastable).
    unit: pytree of identity elements (no leading axis).
    """
    if reverse:
        flipped = jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=0), xs)
        out = inclusive_scan(combine, flipped, unit)
        return jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=0), out)

    leaves = jax.tree_util.tree_leaves(xs)
    n = leaves[0].shape[0]
    if n == 1:
        return xs

    unit_b = jax.tree_util.tree_map(lambda u, a: jnp.broadcast_to(u, a.shape), unit, _take(xs, 0))

    if n <= CHUNK:
        def step(carry, x):
            nxt = combine(carry, x)
            return nxt, nxt

        _, out = jax.lax.scan(step, jax.tree_util.tree_map(lambda u: u, unit_b), xs)
        return out

    npad = (-n) % CHUNK
    total = n + npad
    xs_p = _pad_to(xs, total, jax.tree_util.tree_map(lambda u: u[None], unit_b))
    nchunks = total // CHUNK
    # [nchunks, CHUNK, ...] -> scan over the CHUNK axis with nchunks batch
    xs_c = jax.tree_util.tree_map(
        lambda a: a.reshape(nchunks, CHUNK, *a.shape[1:]).swapaxes(0, 1), xs_p
    )

    def step(carry, x):
        nxt = combine(carry, x)
        return nxt, nxt

    carry0 = jax.tree_util.tree_map(lambda u: jnp.broadcast_to(u, (nchunks, *u.shape)), unit_b)
    _, intra = jax.lax.scan(step, carry0, xs_c)  # [CHUNK, nchunks, ...]
    totals = _take(intra, CHUNK - 1)             # [nchunks, ...]

    rec = inclusive_scan(combine, totals, unit)  # inclusive chunk prefixes
    # exclusive prefixes: shift right by one, unit first
    prefix = jax.tree_util.tree_map(
        lambda r, u: jnp.concatenate([jnp.broadcast_to(u, (1, *u.shape)), r[:-1]], axis=0),
        rec, unit_b,
    )
    # prefix is [nchunks, ...], intra is [CHUNK, nchunks, ...]; broadcast the
    # prefix across the CHUNK axis explicitly (combiners may use jnp.stack,
    # which requires exact shape agreement).
    prefix_b = jax.tree_util.tree_map(
        lambda p, i: jnp.broadcast_to(p[None], i.shape), prefix, intra
    )
    fixed = combine(prefix_b, intra)
    out = jax.tree_util.tree_map(
        lambda a: a.swapaxes(0, 1).reshape(total, *a.shape[2:]), fixed
    )
    return _take(out, slice(0, n))
