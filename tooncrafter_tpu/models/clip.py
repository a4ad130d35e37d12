"""OpenCLIP ViT-H/14 text and vision towers in Flax.

Native rebuild of the frozen conditioning encoders the reference loads from
`open_clip` (`/root/reference/lvdm/modules/encoders/condition.py`):

  * text tower (FrozenOpenCLIPEmbedder, :174-234): token+positional
    embedding, 24 transformer blocks (width 1024, 16 heads) with a causal
    mask, **penultimate** layer output (stop 1 block early) followed by
    ln_final; returns all 77 tokens.
  * vision tower (FrozenOpenCLIPImageEmbedderV2, :295-372): 14x14 patch
    embed of a 224x224 image, class token + positional embedding, ln_pre,
    all 32 blocks (width 1280, 16 heads); returns all 257 tokens with NO
    pooling / ln_post / projection.
  * preprocess: bicubic resize (align_corners+antialias) to 224, [-1,1] ->
    [0,1], CLIP mean/std normalize (:322-330) — ops/resize.py supplies the
    kornia-parity resize.

Attention keeps torch-MHA parameter layout (fused in_proj + out_proj) so the
checkpoint converter is a direct copy.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tooncrafter_tpu.ops.attention import dot_product_attention
from tooncrafter_tpu.ops.norms import LayerNorm
from tooncrafter_tpu.ops.resize import resize_bicubic

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible layout (fused qkv)."""

    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, s, c = x.shape
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = c // self.heads
        reshape = lambda t: t.reshape(b, s, self.heads, d)
        out = dot_product_attention(reshape(q), reshape(k), reshape(v),
                                    mask=mask)
        out = out.reshape(b, s, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        x = x + MultiheadAttention(self.heads, self.dtype, name="attn")(
            LayerNorm(name="ln_1")(x), mask)
        h = LayerNorm(name="ln_2")(x)
        h = nn.Dense(4 * x.shape[-1], dtype=self.dtype, name="mlp_c_fc")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="mlp_c_proj")(h)
        return x + h


class CLIPTextTower(nn.Module):
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    penultimate: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, 77) int32 -> (B, 77, width)."""
        x = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                     name="token_embedding")(tokens)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width), jnp.float32)
        x = x + pos.astype(x.dtype)
        mask = jnp.tril(jnp.ones((tokens.shape[1], tokens.shape[1]),
                                 bool))[None, None]
        # 'penultimate' stops one block early (condition.py:224-233); the
        # skipped block's weights are simply not instantiated — the
        # checkpoint converter drops them.
        n_run = self.layers - (1 if self.penultimate else 0)
        for i in range(n_run):
            x = ResidualAttentionBlock(self.heads, self.dtype,
                                       name=f"resblock_{i}")(x, mask)
        return LayerNorm(name="ln_final")(x)


class CLIPVisionTower(nn.Module):
    width: int = 1280
    heads: int = 16
    layers: int = 32
    patch_size: int = 14
    image_size: int = 224
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: (B, 224, 224, 3) CLIP-normalized -> (B, 257, width)."""
        b = images.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=self.patch_size, padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv1")(images)
        x = x.reshape(b, -1, self.width)  # (B, 256, width)
        cls = self.param("class_embedding", nn.initializers.normal(0.01),
                         (self.width,), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.width))
        x = jnp.concatenate([cls, x], axis=1)
        n_tok = x.shape[1]
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (n_tok, self.width), jnp.float32)
        x = x + pos.astype(x.dtype)
        x = LayerNorm(name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.heads, self.dtype,
                                       name=f"resblock_{i}")(x)
        return x  # all tokens, no pooling


def clip_preprocess(images, size: int = 224):
    """(B, H, W, 3) in [-1, 1] -> (B, size, size, 3) CLIP-normalized.

    Matches kornia bicubic resize (align_corners=True, antialias=True) +
    CLIP mean/std (condition.py:322-330)."""
    x = resize_bicubic(images, size, size, align_corners=True, antialias=True)
    x = (x + 1.0) / 2.0
    return (x - CLIP_MEAN) / CLIP_STD
