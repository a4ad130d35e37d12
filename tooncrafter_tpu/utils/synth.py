"""Synthetic parameter trees for benchmarks and compile checks.

One jitted fan-in-scaled fill: orders of magnitude faster than running the
real initializers through a remote-dispatch backend, and keeps activations
bounded through deep stacks (a flat fill overflows bf16 after ~50 layers).
Benchmark-valid — runtime does not depend on parameter values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def synth_params(shapes, dtype=jnp.bfloat16, scale: float = 0.5):
    """shapes: pytree of ShapeDtypeStruct -> pytree of filled arrays."""

    def fill(s):
        fan_in = 1
        if len(s.shape) >= 2:
            for dim in s.shape[:-1]:
                fan_in *= dim
        # constant weights sum coherently over constant activations, so the
        # stable scaling is 1/fan_in (not the random-init 1/sqrt(fan_in))
        val = scale / max(float(fan_in), 1.0)
        return jnp.full(s.shape, val, dtype)

    return jax.jit(lambda: jax.tree_util.tree_map(fill, shapes))()
