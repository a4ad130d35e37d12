"""Dual-reference 3D VAE decoder — ToonCrafter's core novelty, TPU-native.

Rebuilds the behavior of /root/reference/lvdm/models/autoencoder_dualref.py
(`VideoDecoder`, shipped with `time_mode="conv-only"`):

  * VideoResBlock — 2D ResnetBlock per frame + a temporal (3,1,1)-conv
    residual stack, merged per-block with a learned sigmoid alpha
    (autoencoder_dualref.py:846-911).
  * AE3DConv — 2D conv followed by a temporal 3D mixing conv
    (autoencoder_dualref.py:914-935); used for conv_out.
  * mid spatial attention — single-head self-attention per frame
    (autoencoder_dualref.py:145-207; the shipped conv-only mode does NOT use
    the temporal VideoBlocks).
  * Fusion cross-attention at levels {2,3} — every decoded frame attends to
    the encoder features of the first/last input frame; to_out is zero-init
    (autoencoder_dualref.py:256-341). The reference duplicates K/V per frame
    (:286-292); here all frames share one K/V so frames fold into the query
    token axis — one large MXU-friendly attention per clip instead of T
    small ones, numerically identical.
  * Combiner at levels {0,1} + final — zero-init 1x1 conv of the reference
    features added into frames 0 and -1 only (autoencoder_dualref.py:343-368).
  * The dual-ref checkpoint expects `post_quant_conv` to be SKIPPED on this
    path (autoencoder.py:112-116) — the caller passes raw scaled latents.

Layout: video tensors are (B, T, H, W, C); spatial modules run on the folded
(B*T, H, W, C) view.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tooncrafter_tpu.ops.norms import GroupNorm, GroupNormAct, LayerNorm
from tooncrafter_tpu.ops.temporal_conv import TemporalConv3
from tooncrafter_tpu.ops.attention import attention
from tooncrafter_tpu.models.vae import AttnBlock, ResnetBlock, Upsample

zeros_init = nn.initializers.zeros


def _fold(x):
    """(B,T,H,W,C) -> (B*T,H,W,C)"""
    b, t = x.shape[:2]
    return x.reshape((b * t,) + x.shape[2:]), b, t


class TemporalResStack(nn.Module):
    """Temporal residual stack: GN+SiLU+Conv3d(3,1,1) x2, zero-init output.

    Equivalent of the SVD ResBlock with dims=3, skip_t_emb=True
    (autoencoder_dualref.py:534-696 instantiated at :857-869). Runs on
    (B,T,H,W,C); GroupNorm statistics span T,H,W jointly (torch 5D
    semantics); eps=1e-5 (lvdm/basics.py `normalization`).
    """

    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, merge_scale=None, stats=None,
                 return_stats: bool = False, deterministic: bool = True):
        """merge_scale: optional traced scalar a — returns x + a*stack(x)
        instead of x + stack(x), with the scale riding the closing conv's
        epilogue (the VideoResBlock alpha merge
        `a*(x + stack(x)) + (1-a)*x`, autoencoder_dualref.py:892-911,
        algebraically folded — one pass instead of three).

        stats: optional per-frame (B, T, C) sums of x from the producer's
        epilogue — in_norm then costs no pass over x. return_stats=True
        also returns per-frame sums of the OUTPUT (merged) tensor."""
        c = x.shape[-1]
        in_norm = GroupNormAct(eps=1e-5, name="in_norm")
        in_conv = TemporalConv3(c, dtype=self.dtype, name="in_conv")
        out_norm = GroupNormAct(eps=1e-5, name="out_norm")
        out_conv = TemporalConv3(c, dtype=self.dtype,
                                 kernel_init=zeros_init, name="out_conv")
        # GN+SiLU folds into each conv's in-VMEM prologue; the dropout
        # (training) path keeps the unfused order
        if deterministic or self.dropout == 0.0:
            st = None if stats is None \
                else (stats[0].sum(1), stats[1].sum(1))  # norm spans T,H,W
            h, s1, s2 = in_conv(
                x, prologue=in_norm(x, return_affine=True, stats=st),
                return_stats=True)
            # in_conv's stats epilogue feeds out_norm; the closing
            # residual (and the alpha merge) ride out_conv's epilogue
            aff = out_norm(h, return_affine=True,
                           stats=(s1.sum(1), s2.sum(1)))
            return out_conv(h, prologue=aff, residual=x,
                            out_scale=merge_scale,
                            return_stats=return_stats)
        h = in_conv(x, prologue=in_norm(x, return_affine=True))
        h = out_norm(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = out_conv(h)
        if merge_scale is not None:
            h = h * merge_scale.astype(h.dtype)
        out = x + h
        if return_stats:
            s1 = jnp.sum(out, axis=(2, 3), dtype=jnp.float32)
            s2 = jnp.sum(jnp.square(out.astype(jnp.float32)), axis=(2, 3))
            return out, s1, s2
        return out


class VideoResBlock(nn.Module):
    """Spatial ResnetBlock + temporal stack, learned-alpha merged.

    With `temporal=False` (the reference's `time_mode='attn-only'`,
    autoencoder_dualref.py:1168-1176 `_make_resblock`) only the spatial
    ResnetBlock runs — no time stack, no mix_factor parameter."""

    out_channels: Optional[int] = None
    dropout: float = 0.0
    alpha: float = 0.0
    temporal: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, stats=None, return_stats: bool = False,
                 deterministic: bool = True):
        """stats in/out: per-frame (B, T, C) sums chained through every
        conv epilogue — a block whose input stats ride in takes NO
        standalone reduce pass over the level tensor."""
        # x: (B, T, H, W, C)
        b, t = x.shape[:2]
        flat, _, _ = _fold(x)
        st_flat = None if stats is None else \
            (stats[0].reshape(b * t, -1), stats[1].reshape(b * t, -1))
        flat, s1, s2 = ResnetBlock(
            self.out_channels, self.dropout, self.dtype, name="spatial")(
            flat, stats=st_flat, return_stats=True,
            deterministic=deterministic)
        rb_stats = (s1.reshape(b, t, -1), s2.reshape(b, t, -1))
        x = flat.reshape((b, t) + flat.shape[1:])
        if not self.temporal:
            return (x,) + rb_stats if return_stats else x
        # a*(x + stack(x)) + (1-a)*x == x + a*stack(x): the merge rides
        # the time stack's closing conv epilogue instead of a third pass
        # over the level tensor (autoencoder_dualref.py:892-911)
        mix = self.param("mix_factor", nn.initializers.constant(self.alpha),
                         (1,), jnp.float32)
        a = jax.nn.sigmoid(mix)[0]
        return TemporalResStack(self.dropout, self.dtype, name="time_stack")(
            x, merge_scale=a, stats=rb_stats, return_stats=return_stats,
            deterministic=deterministic)


class AE3DConv(nn.Module):
    """2D conv per frame + temporal (3,1,1) mixing conv.

    `temporal=False` is the reference's Conv2DWrapper used under
    `time_mode='attn-only'` (autoencoder_dualref.py:1117-1119,1162-1166)."""

    out_channels: int
    temporal: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t = x.shape[:2]
        flat, _, _ = _fold(x)
        flat = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                       name="conv")(flat)
        y = flat.reshape((b, t) + flat.shape[1:])
        if not self.temporal:
            return y
        return TemporalConv3(self.out_channels, dtype=self.dtype,
                             name="time_mix_conv")(y)


class FusionCrossAttention(nn.Module):
    """Per-frame queries attend to first+last-frame encoder features.

    Numerics match MemoryEfficientCrossAttentionWrapperFusion
    (autoencoder_dualref.py:256-341): GroupNorm -> biasless q/k/v projections
    -> 8 heads x 64 dims -> zero-init out projection, residual add.
    """

    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # x: (B,T,H,W,C); context: (B,2,H,W,C)
        b, t, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        # per-frame GroupNorm: the reference normalizes the folded
        # (B*T, C, H, W) view (autoencoder_dualref.py:277-278), so statistics
        # must not span T.
        h = GroupNorm(name="norm")(x.reshape(b * t, hh, ww, c))
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(
            h.reshape(b, t * hh * ww, c))
        ctx = context.reshape(b, 2 * context.shape[2] * context.shape[3], c)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        # all frames share K/V -> frames ride the query token axis
        out = attention(q, k, v, heads=self.heads)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init,
                       name="to_out")(out)
        return x + out.reshape(b, t, hh, ww, c)


class Combiner(nn.Module):
    """Zero-init 1x1 conv injection into the first and last frames only."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, stats=None):
        # x: (B,T,H,W,C); context: (B,2,H,W,C)
        ctx = nn.Dense(x.shape[-1], dtype=self.dtype, kernel_init=zeros_init,
                       name="conv")(context)
        first = x[:, :1] + ctx[:, :1]
        last = x[:, -1:] + ctx[:, 1:2]
        out = jnp.concatenate([first, x[:, 1:-1], last], axis=1)
        if stats is None:
            return out
        # chain the per-frame (B, T, C) sums: only frames 0 and -1
        # change, and their fresh sums fuse into the adds above — the
        # untouched 14 frames keep the producer's sums
        s1, s2 = stats
        f1 = jnp.sum(first, axis=(2, 3), dtype=jnp.float32)
        f2 = jnp.sum(jnp.square(first.astype(jnp.float32)), axis=(2, 3))
        l1 = jnp.sum(last, axis=(2, 3), dtype=jnp.float32)
        l2 = jnp.sum(jnp.square(last.astype(jnp.float32)), axis=(2, 3))
        s1 = jnp.concatenate([f1, s1[:, 1:-1], l1], axis=1)
        s2 = jnp.concatenate([f2, s2[:, 1:-1], l2], axis=1)
        return out, s1, s2


class SpatialAttn(nn.Module):
    """Per-frame single-head self-attention (mid block)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t = x.shape[:2]
        flat, _, _ = _fold(x)
        flat = AttnBlock(self.dtype, name="attn")(flat)
        return flat.reshape((b, t) + flat.shape[1:])


class SVDFeedForward(nn.Module):
    """GEGLU feed-forward with explicit output dim (attention_svd.py
    FeedForward with glu=True: net.0 = GEGLU proj, net.2 = Linear)."""

    dim_out: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        dim = x.shape[-1]
        h = nn.Dense(dim * self.mult * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="out")(h)


class SVDTemporalBlock(nn.Module):
    """VideoTransformerBlock (autoencoder_dualref.py:703-833) at its only
    instantiation in the reference (:944-952, :1013-1021): single head,
    d_head = C, ff_in=True, inner_dim=dim (so every residual is active),
    self-attention for both attn1 and attn2 (context is never passed).

    Input (B*T, S, C) folded frame-major like the reference, attention runs
    over T per spatial token."""

    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps: int, *, deterministic: bool = True):
        bt, s, c = x.shape
        b = bt // timesteps
        # (b t) s c -> (b s) t c (autoencoder_dualref.py:794)
        x = (x.reshape(b, timesteps, s, c).transpose(0, 2, 1, 3)
             .reshape(b * s, timesteps, c))

        h = LayerNorm(name="norm_in")(x)
        x = SVDFeedForward(c, dropout=self.dropout, dtype=self.dtype,
                           name="ff_in")(h, deterministic=deterministic) + x

        def attn(name, h):
            q = nn.Dense(c, use_bias=False, dtype=self.dtype,
                         name=f"{name}_to_q")(h)
            k = nn.Dense(c, use_bias=False, dtype=self.dtype,
                         name=f"{name}_to_k")(h)
            v = nn.Dense(c, use_bias=False, dtype=self.dtype,
                         name=f"{name}_to_v")(h)
            out = attention(q, k, v, heads=1)
            return nn.Dense(c, dtype=self.dtype, name=f"{name}_to_out")(out)

        x = attn("attn1", LayerNorm(name="norm1")(x)) + x
        x = attn("attn2", LayerNorm(name="norm2")(x)) + x
        x = SVDFeedForward(c, dropout=self.dropout, dtype=self.dtype,
                           name="ff")(LayerNorm(name="norm3")(x),
                                      deterministic=deterministic) + x

        return (x.reshape(b, s, timesteps, c).transpose(0, 2, 1, 3)
                .reshape(bt, s, c))


class TimeAttnBlock(nn.Module):
    """VideoBlock / MemoryEfficientVideoBlock (autoencoder_dualref.py:
    938-1075, numerically identical pair): per-frame spatial attention,
    alpha-merged with a temporal transformer over frame tokens that first
    adds a learned frame-position embedding; used for the decoder mid
    attention under time_mode 'all' / 'attn-only'."""

    alpha: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        from tooncrafter_tpu.ops.schedule import timestep_embedding

        b, t, hh, ww, c = x.shape
        flat = x.reshape(b * t, hh, ww, c)
        h = GroupNorm(name="norm")(flat)
        toks = lambda a: a.reshape(b * t, hh * ww, c)
        q = nn.Dense(c, dtype=self.dtype, name="q")(h)
        k = nn.Dense(c, dtype=self.dtype, name="k")(h)
        v = nn.Dense(c, dtype=self.dtype, name="v")(h)
        att = attention(toks(q), toks(k), toks(v), heads=1)  # (b*t, s, c)

        # frame-position embedding through the video_time_embed MLP
        # (:978-985); frame index layout matches repeat('t -> b t')
        frames = jnp.tile(jnp.arange(t, dtype=jnp.float32), b)
        temb = timestep_embedding(frames, c).astype(self.dtype)
        emb = nn.Dense(4 * c, dtype=self.dtype,
                       name="video_time_embed_0")(temb)
        emb = nn.Dense(c, dtype=self.dtype,
                       name="video_time_embed_2")(jax.nn.silu(emb))
        x_mix = att + emb[:, None, :]
        x_mix = SVDTemporalBlock(dtype=self.dtype, name="time_mix_block")(
            x_mix, t, deterministic=deterministic)

        mix = self.param("mix_factor", nn.initializers.constant(self.alpha),
                         (1,), jnp.float32)
        a = jax.nn.sigmoid(mix).astype(att.dtype)
        merged = a * att + (1.0 - a) * x_mix
        out = nn.Dense(c, dtype=self.dtype, name="proj_out")(merged)
        return x + out.reshape(b, t, hh, ww, c)


class DualRefVideoDecoder(nn.Module):
    """conv-only VideoDecoder with dual-reference injection.

    forward wiring mirrors autoencoder_dualref.Decoder.forward (:489-527):
    mid -> levels 3..0 [blocks -> inject -> upsample] -> norm -> final
    inject -> AE3DConv out.
    """

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_level: Sequence[int] = (2, 3)
    dropout: float = 0.0
    time_mode: str = "conv-only"  # 'all' | 'conv-only' | 'attn-only'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, ref_context=None, *, deterministic: bool = True):
        """z: (B,T,h,w,z_ch); ref_context: list of 5 (B,2,H_l,W_l,C_l)
        ordered [level0..level3, conv_in] like the encoder taps."""
        assert self.time_mode in ("all", "conv-only", "attn-only"), \
            self.time_mode  # autoencoder_dualref.py:1122 available_time_modes
        # time_mode selects which sub-blocks get temporal machinery
        # (autoencoder_dualref.py:1147-1176 _make_attn/_make_conv/
        # _make_resblock)
        time_attn = self.time_mode in ("all", "attn-only")
        time_res = self.time_mode != "attn-only"
        b, t = z.shape[:2]
        block_in = self.ch * self.ch_mult[-1]
        flat, _, _ = _fold(z)
        flat = nn.Conv(block_in, (3, 3), dtype=self.dtype, name="conv_in")(flat)
        h = flat.reshape((b, t) + flat.shape[1:])

        # Per-frame (B, T, C) output sums chain block-to-block through the
        # conv epilogues (st): within a level no VideoResBlock takes a
        # standalone GroupNorm stats pass over the 335-671 MB level
        # tensors; the Combiner adjusts the two touched frames' sums
        # in-place and the upsample conv re-seeds the chain. Attention
        # injects (residual adds) reset it (st = None) — those sit at the
        # small levels. Round-2 decode trace: ~100 ms/call of HBM-bound
        # stat + elementwise passes, VERDICT r2 next #2.
        st = None
        h, *st = VideoResBlock(dropout=self.dropout, temporal=time_res,
                               dtype=self.dtype, name="mid_block_1")(
            h, return_stats=True, deterministic=deterministic)
        if time_attn:
            h = TimeAttnBlock(dtype=self.dtype, name="mid_attn_1")(
                h, deterministic=deterministic)
        else:
            h = SpatialAttn(self.dtype, name="mid_attn_1")(h)
        h, *st = VideoResBlock(dropout=self.dropout, temporal=time_res,
                               dtype=self.dtype, name="mid_block_2")(
            h, return_stats=True, deterministic=deterministic)

        for i_level in reversed(range(len(self.ch_mult))):
            out_ch = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h, *st = VideoResBlock(
                    out_ch, dropout=self.dropout, temporal=time_res,
                    dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h, stats=st or None, return_stats=True,
                  deterministic=deterministic)
            if ref_context is not None:
                if i_level in self.attn_level:
                    h = FusionCrossAttention(
                        dtype=self.dtype, name=f"inject_{i_level}",
                    )(h, ref_context[i_level])
                    st = None
                else:
                    h, *st = Combiner(self.dtype, name=f"inject_{i_level}")(
                        h, ref_context[i_level], stats=tuple(st))
            if i_level != 0:
                flat, _, _ = _fold(h)
                flat, fs1, fs2 = Upsample(
                    self.dtype, name=f"up_{i_level}_upsample")(
                    flat, return_stats=True)
                h = flat.reshape((b, t) + flat.shape[1:])
                c_up = h.shape[-1]
                st = (fs1.reshape(b, t, c_up), fs2.reshape(b, t, c_up))

        # per-frame norm_out: the reference's Decoder.forward normalizes the
        # folded (B*T, C, H, W) view (autoencoder_dualref.py:518-519). With
        # the chained sums the norm is a pure elementwise apply.
        flat, _, _ = _fold(h)
        c_out = flat.shape[-1]
        st_flat = None if not st else \
            (st[0].reshape(b * t, c_out), st[1].reshape(b * t, c_out))
        a_c, b_c = GroupNormAct(name="norm_out")(
            flat, return_affine=True, stats=st_flat)
        z = flat.astype(jnp.float32) * a_c[:, None, None, :] \
            + b_c[:, None, None, :]
        flat = (z * jax.nn.sigmoid(z)).astype(flat.dtype)
        h = flat.reshape((b, t) + flat.shape[1:])
        if ref_context is not None:
            h = Combiner(self.dtype, name="inject_out")(h, ref_context[-1])
        h = AE3DConv(self.out_ch, temporal=self.time_mode != "attn-only",
                     dtype=self.dtype, name="conv_out")(h)
        return h
