"""Perceiver-style image-context resampler.

Rebuild of /root/reference/lvdm/modules/encoders/resampler.py:48-145:
16 learned queries PER FRAME (video_length x num_queries latents), 4 layers
of (PerceiverAttention + gateless FF), projecting 257 CLIP vision tokens
(1280-d) to 16 tokens/frame of 1024-d UNet context.

PerceiverAttention detail: K/V come from concat(image_tokens, latents); the
double sqrt scaling (q*s)(k*s)^T with s = d^-1/4 equals standard 1/sqrt(d).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tooncrafter_tpu.ops.attention import attention
from tooncrafter_tpu.ops.norms import LayerNorm


class PerceiverAttention(nn.Module):
    heads: int = 12
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        inner = self.heads * self.dim_head
        dim = latents.shape[-1]
        x = LayerNorm(name="norm1")(x)
        latents = LayerNorm(name="norm2")(latents)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                      name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        out = attention(q, k, v, heads=self.heads)
        return nn.Dense(dim, use_bias=False, dtype=self.dtype,
                        name="to_out")(out)


class ResamplerFF(nn.Module):
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = LayerNorm(name="norm")(x)
        h = nn.Dense(dim * self.mult, use_bias=False, dtype=self.dtype,
                     name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(dim, use_bias=False, dtype=self.dtype, name="fc2")(h)


class Resampler(nn.Module):
    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 1024
    ff_mult: int = 4
    video_length: int = 16

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, 257, embedding_dim) -> (B, video_length*num_queries, out)."""
        n_latents = self.num_queries * (self.video_length or 1)
        latents = self.param(
            "latents", nn.initializers.normal(self.dim ** -0.5),
            (1, n_latents, self.dim), jnp.float32)
        latents = jnp.broadcast_to(
            latents, (x.shape[0],) + latents.shape[1:]).astype(self.dtype)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            latents = PerceiverAttention(
                self.heads, self.dim_head, self.dtype,
                name=f"layer_{i}_attn")(x, latents) + latents
            latents = ResamplerFF(self.ff_mult, self.dtype,
                                  name=f"layer_{i}_ff")(latents) + latents
        out = nn.Dense(self.output_dim, dtype=self.dtype,
                       name="proj_out")(latents)
        return LayerNorm(name="norm_out")(out)
