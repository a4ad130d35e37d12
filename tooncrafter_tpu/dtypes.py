"""Dtype policy for mixed-precision TPU execution.

The reference runs fp32 modules under CUDA AMP autocast
(`/root/reference/scripts/evaluation/inference.py:323`) with GroupNorm forced
to fp32 (`/root/reference/lvdm/basics.py:76-87`). On TPU we make the policy
explicit instead: parameters are stored in `param_dtype`, matmuls/convs run in
`compute_dtype` (bf16 on TPU), and normalization / softmax / schedule math run
in fp32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_norm(self, x):
        return jnp.asarray(x, self.norm_dtype)


def default_policy(inference: bool = True) -> Policy:
    """bf16 compute / fp32 params+norms; pass-through for tests via fp32()."""
    return Policy()


def fp32_policy() -> Policy:
    return Policy(compute_dtype=jnp.float32)
