"""Batch-size-invariant RNG plumbing.

A sampling run keyed per *item* draws the same noise for a clip whether it
runs at B=1 or inside a B=8 batch — so batched CLI inference
(`--bs`, reference inference.py:323-342) reproduces single-clip outputs
bit-for-bit, and bench numbers stay comparable across batch sizes. The
reference (torch `randn` over the whole batch) does not have this property;
it falls out naturally from JAX's functional keys.

Every helper accepts either one legacy uint32[2] key (ndim 1 — the plain
`jax.random.PRNGKey` path, unchanged behavior) or a (B, 2) stack of
per-item keys and vmaps the draw.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def is_batched(rng) -> bool:
    return rng.ndim == 2


def split(rng, n: int = 2):
    """Like jax.random.split, but per item for (B,2) key stacks.

    Returns (n, ...) so `a, b = split(rng)` unpacks either way."""
    if is_batched(rng):
        return jnp.swapaxes(jax.vmap(lambda k: jax.random.split(k, n))(rng),
                            0, 1)
    return jax.random.split(rng, n)


def normal(rng, shape, dtype=jnp.float32):
    """Standard normal of `shape`; with a (B,2) key stack, shape[0] must be
    B and each item's slice is drawn from its own key."""
    if is_batched(rng):
        assert shape[0] == rng.shape[0], (
            f"batched rng has {rng.shape[0]} keys for leading dim "
            f"{shape[0]}")
        return jax.vmap(
            lambda k: jax.random.normal(k, tuple(shape[1:]), dtype))(rng)
    return jax.random.normal(rng, shape, dtype)


def per_item_keys(rng, indices):
    """Host-side: one key per global item index (stable under batching and
    host sharding). indices: iterable of ints -> (len, 2) uint32."""
    return jnp.stack([jax.random.fold_in(rng, int(i)) for i in indices])
