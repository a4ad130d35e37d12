"""Stable-Diffusion-lineage KL autoencoder (f=8, 4-channel latent) in Flax.

Reference behavior being rebuilt (not ported):
  * Encoder/Decoder topology — /root/reference/lvdm/modules/networks/
    ae_modules.py:366-591 (ch=128, ch_mult=[1,2,4,4], 2 res blocks/level,
    attn-free levels, single-head mid attention, GroupNorm(32, eps=1e-6) +
    swish).
  * Encoder hidden-state taps for the dual-reference decoder —
    ae_modules.py:441-458: the per-level feature AFTER that level's res
    blocks (before downsample), plus the conv_in feature appended last.
  * AutoencoderKL with quant/post-quant 1x1 convs and a diagonal-Gaussian
    posterior — lvdm/models/autoencoder.py:100-116, lvdm/distributions.py.

TPU notes: channels-last (N,H,W,C) throughout; all convs are 3x3 NHWC which
XLA maps directly onto the MXU; the asymmetric stride-2 downsample pad is
expressed as explicit (0,1) edge padding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tooncrafter_tpu.ops.norms import GroupNorm, GroupNormAct
from tooncrafter_tpu.ops.spatial_conv import SpatialConv3x3, UpsampleConv2x
from tooncrafter_tpu.ops.attention import attention


def swish(x):
    return x * jax.nn.sigmoid(x)


class ResnetBlock(nn.Module):
    out_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, stats=None, return_stats: bool = False,
                 deterministic: bool = True):
        """stats: optional per-sample (N, C) sums of x from the producer's
        epilogue — norm1 then costs no pass over x. return_stats=True also
        returns (N, C) sums of the output (conv2's epilogue)."""
        out_ch = self.out_channels or x.shape[-1]
        in_ch = x.shape[-1]
        norm1 = GroupNormAct(name="norm1")
        conv1 = SpatialConv3x3(out_ch, dtype=self.dtype, name="conv1")
        norm2 = GroupNormAct(name="norm2")
        conv2 = SpatialConv3x3(out_ch, dtype=self.dtype, name="conv2")
        skip = x if in_ch == out_ch else \
            nn.Dense(out_ch, dtype=self.dtype, name="nin_shortcut")(x)
        if deterministic or self.dropout == 0.0:
            # GN+swish folds into each conv's prologue; conv1's stats
            # epilogue feeds norm2 and the skip-add rides conv2's
            # epilogue (ops/spatial_conv.py)
            h, s1, s2 = conv1(
                x, prologue=norm1(x, return_affine=True, stats=stats),
                return_stats=True)
            return conv2(h, prologue=norm2(h, return_affine=True,
                                           stats=(s1, s2)),
                         residual=skip, return_stats=return_stats)
        h = conv1(norm1(x))
        h = norm2(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = skip + conv2(h)
        if return_stats:
            s1 = jnp.sum(out, axis=(1, 2), dtype=jnp.float32)
            s2 = jnp.sum(jnp.square(out.astype(jnp.float32)), axis=(1, 2))
            return out, s1, s2
        return out


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over (h*w) tokens."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = GroupNorm(name="norm")(x)
        q = nn.Dense(c, dtype=self.dtype, name="q")(h)
        k = nn.Dense(c, dtype=self.dtype, name="k")(h)
        v = nn.Dense(c, dtype=self.dtype, name="v")(h)
        toks = lambda t: t.reshape(b, hh * ww, c)
        out = attention(toks(q), toks(k), toks(v), heads=1)
        out = out.reshape(b, hh, ww, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch pads (left=0, right=1, top=0, bottom=1) then VALID stride-2
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_stats: bool = False):
        # nearest-2x + SAME conv folded into one input-dilated conv
        # (ops/resize.upsample2x_conv3x3); params stay nn.Conv-shaped
        return UpsampleConv2x(x.shape[-1], dtype=self.dtype,
                              name="conv")(x, return_stats=return_stats)


class DownLevel(nn.Module):
    out_channels: int
    num_res_blocks: int
    downsample: bool
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i in range(self.num_res_blocks):
            x = ResnetBlock(self.out_channels, self.dropout, self.dtype,
                            name=f"block_{i}")(x, deterministic=deterministic)
        tap = x  # hidden-state tap: after blocks, before downsample
        if self.downsample:
            x = Downsample(self.dtype, name="downsample")(x)
        return x, tap


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, return_hidden_states: bool = False,
                 deterministic: bool = True):
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="conv_in")(x)
        conv_in_feat = h
        taps = []
        for i, mult in enumerate(self.ch_mult):
            h, tap = DownLevel(
                self.ch * mult, self.num_res_blocks,
                downsample=(i != len(self.ch_mult) - 1),
                dropout=self.dropout, dtype=self.dtype, name=f"down_{i}",
            )(h, deterministic=deterministic)
            taps.append(tap)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_2")(h, deterministic=deterministic)
        h = GroupNormAct(name="norm_out")(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)
        if return_hidden_states:
            # order matches the reference: per-level taps then conv_in feat
            return h, taps + [conv_in_feat]
        return h


class UpLevel(nn.Module):
    out_channels: int
    num_res_blocks: int  # note: decoder runs num_res_blocks + 1 blocks
    upsample: bool
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i in range(self.num_res_blocks + 1):
            x = ResnetBlock(self.out_channels, self.dropout, self.dtype,
                            name=f"block_{i}")(x, deterministic=deterministic)
        if self.upsample:
            x = Upsample(self.dtype, name="upsample")(x)
        return x


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    dropout: float = 0.0
    tanh_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True):
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_2")(h, deterministic=deterministic)
        for i_level in reversed(range(len(self.ch_mult))):
            h = UpLevel(
                self.ch * self.ch_mult[i_level], self.num_res_blocks,
                upsample=(i_level != 0), dropout=self.dropout,
                dtype=self.dtype, name=f"up_{i_level}",
            )(h, deterministic=deterministic)
        h = GroupNormAct(name="norm_out")(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h


# ---------------------------------------------------------------------------
# diagonal Gaussian posterior (lvdm/distributions.py:24-65)
# ---------------------------------------------------------------------------

class DiagonalGaussian:
    def __init__(self, moments):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng):
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, self.mean.dtype)

    def mode(self):
        return self.mean

    def kl(self):
        var = jnp.exp(self.logvar)
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + var - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)))


class AutoencoderKL(nn.Module):
    """Encoder + quant convs + (plain) decoder.

    The dual-reference variant swaps the decoder (models/vae_dualref.py) and
    feeds it the encoder taps; this module still owns encode() for both.
    """

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    out_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.ch, self.ch_mult, self.num_res_blocks,
                               self.z_channels, dtype=self.dtype)
        self.decoder = Decoder(self.ch, self.out_ch, self.ch_mult,
                               self.num_res_blocks, dtype=self.dtype)
        self.quant_conv = nn.Dense(2 * self.embed_dim, dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.z_channels, dtype=self.dtype)

    def encode(self, x, *, return_hidden_states: bool = False):
        if return_hidden_states:
            h, taps = self.encoder(x, return_hidden_states=True)
            return self.quant_conv(h), taps
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        moments = self.encode(x)
        post = DiagonalGaussian(moments)
        z = post.sample(rng) if rng is not None else post.mode()
        return self.decode(z), moments
