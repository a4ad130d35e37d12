"""Spatio-temporal UNet denoiser (the DDIM hot path), TPU-native Flax.

Behavioral spec from /root/reference/lvdm/modules/networks/openaimodel3d.py
(UNetModel:281-603) and lvdm/modules/attention.py:

  * per-level pattern [ResBlock(+TemporalConv) -> SpatialTransformer ->
    TemporalTransformer], channels 320/640/1280/1280, attention at
    downsample ratios {1,2,4}, plus an `addition_attention` temporal
    transformer after the input conv (8 heads x 64 dims regardless of width).
  * hybrid conditioning: 8-channel input (noisy latent ++ cond-frame
    latents); cross-attn context = 77 text tokens ++ 16 per-frame image
    tokens, split at 77 + T*16 (openaimodel3d.py:553-562) and routed
    per-frame.
  * fps conditioning through a zero-init MLP added to the time embedding
    (openaimodel3d.py:569-577).
  * CrossAttention with a parallel image branch (to_k_ip/to_v_ip) whose
    output is added with a fixed scale (attention.py:89-144).
  * GEGLU feed-forward (attention.py:415-442).

TPU layout: video tensors are (B,T,H,W,C); spatial modules run on the
folded (B*T,H,W,C) view; temporal attention re-folds pixels into batch.
The classifier-free-guidance double/triple call is batched by the sampler,
not here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tooncrafter_tpu.ops.attention import (attention,
                                           temporal_attention_inplace)
from tooncrafter_tpu.ops import norms
from tooncrafter_tpu.ops.norms import GroupNormAct, LayerNorm
from tooncrafter_tpu.ops.schedule import timestep_embedding
from tooncrafter_tpu.ops.spatial_conv import (SpatialConv3x3,
                                              UpsampleConv2x)
from tooncrafter_tpu.ops.temporal_conv import TemporalConv3

zeros_init = nn.initializers.zeros


def silu(x):
    return jax.nn.silu(x)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

class TemporalConvBlock(nn.Module):
    """4x (GroupNorm+SiLU+Conv3d(3,1,1)) residual stack, zero-init last conv
    (openaimodel3d.py:239-279). Input (B,T,H,W,C)."""

    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, stats=None, deterministic: bool = True,
                 return_stats: bool = False):
        c = x.shape[-1]
        h = x
        out_stats = None
        fused = deterministic or self.dropout == 0.0
        st = stats if fused else None
        for i, zero in ((1, False), (2, False), (3, False), (4, True)):
            norm = GroupNormAct(eps=1e-5, name=f"norm{i}")
            conv = TemporalConv3(c, dtype=self.dtype,
                                 kernel_init=zeros_init if zero else
                                 nn.initializers.lecun_normal(),
                                 name=f"conv{i}")
            if fused:
                # GN+SiLU folds into the conv prologue (in-VMEM); each
                # conv's stats epilogue feeds the next norm, and the
                # closing residual rides conv4's epilogue — the chain
                # h never takes a standalone elementwise/reduce pass.
                aff = norm(h, return_affine=True, stats=st)
                if i == 4:
                    if return_stats:
                        # per-frame (B, T, C) sums of the block OUTPUT
                        # (post-residual) — seeds the next consumer's
                        # norm across the block boundary
                        h, s1, s2 = conv(h, prologue=aff, residual=x,
                                         return_stats=True)
                        out_stats = (s1, s2)
                    else:
                        h = conv(h, prologue=aff, residual=x)
                else:
                    h, s1, s2 = conv(h, prologue=aff, return_stats=True)
                    # per-frame (B,T,C) sums -> (B,C): the next norm
                    # spans (T,H,W)
                    st = (s1.sum(1), s2.sum(1))
            else:
                h = norm(h)
                if i > 1:
                    h = nn.Dropout(self.dropout,
                                   deterministic=deterministic)(h)
                h = conv(h)
        out = h if fused else x + h
        return (out, out_stats) if return_stats else out


class UNetResBlock(nn.Module):
    """GN+SiLU+conv x2 with time-embedding add and optional temporal conv
    (openaimodel3d.py:109-236). Spatial part runs on (B*T,H,W,C)."""

    out_channels: Optional[int] = None
    dropout: float = 0.1
    use_temporal_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, num_frames: int = 16,
                 deterministic: bool = True, stats=None,
                 return_stats: bool = False):
        # x: (B*T, H, W, C); emb: (B*T, emb_ch)
        # num_frames/deterministic/return_stats are positional-static for
        # nn.remat. stats: optional chained (s1, s2) per-channel sums of
        # x ((B*T, C), from the upstream block's epilogue) consumed by
        # in_norm; return_stats=True returns (h, (s1, s2)) with sums of
        # the block output for the downstream norm.
        out_ch = self.out_channels or x.shape[-1]
        in_norm = GroupNormAct(eps=1e-5, name="in_norm")
        in_conv = SpatialConv3x3(out_ch, dtype=self.dtype, name="in_conv")
        out_norm = GroupNormAct(eps=1e-5, name="out_norm")
        out_conv = SpatialConv3x3(out_ch, kernel_init=zeros_init,
                                  dtype=self.dtype, name="out_conv")
        e = nn.Dense(out_ch, dtype=self.dtype, name="emb_proj")(silu(emb))
        skip = x if x.shape[-1] == out_ch else \
            nn.Dense(out_ch, dtype=self.dtype, name="skip")(x)
        fused = deterministic or self.dropout == 0.0
        tstats = None
        out_stats = None
        if fused:
            # inference hot path: each GN+SiLU folds into its conv's
            # prologue (one HBM round-trip each); the temb add is folded
            # analytically into out_norm's affine (never materialized);
            # the skip-add rides the second conv's epilogue, whose stats
            # epilogue seeds the temporal block's first norm.
            h, s1, s2 = in_conv(x, prologue=in_norm(x, return_affine=True,
                                                    stats=stats),
                                return_stats=True)
            aff = out_norm(h, shift=e, return_affine=True, stats=(s1, s2))
            if self.use_temporal_conv:
                h, so1, so2 = out_conv(h, prologue=aff, residual=skip,
                                       return_stats=True)
                b = h.shape[0] // num_frames
                # (b*t, C) spatial sums -> (b, C) spatio-temporal sums,
                # matching the temporal block's 5-D GroupNorm
                tstats = (so1.reshape(b, num_frames, -1).sum(1),
                          so2.reshape(b, num_frames, -1).sum(1))
            elif return_stats:
                h, so1, so2 = out_conv(h, prologue=aff, residual=skip,
                                       return_stats=True)
                out_stats = (so1, so2)
            else:
                h = out_conv(h, prologue=aff, residual=skip)
        else:
            # training path keeps dropout between SiLU and conv, exactly
            # like the reference (openaimodel3d.py:210-236)
            h = in_conv(in_norm(x))
            h = h + e[:, None, None, :].astype(h.dtype)
            h = out_norm(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = skip + out_conv(h)
        if self.use_temporal_conv:
            bt = h.shape[0]
            b = bt // num_frames
            h5 = h.reshape((b, num_frames) + h.shape[1:])
            want_st = return_stats and fused
            out5 = TemporalConvBlock(dropout=0.1, dtype=self.dtype,
                                     name="temporal_conv")(
                h5, stats=tstats, deterministic=deterministic,
                return_stats=want_st)
            if want_st:
                h5, tc_stats = out5
                if tc_stats is not None:
                    # per-frame (B, T, C) -> (B*T, C): the downstream
                    # spatial norm spans (H, W) per frame-sample
                    s1f, s2f = tc_stats
                    out_stats = (s1f.reshape(bt, -1), s2f.reshape(bt, -1))
            else:
                h5 = out5
            h = h5.reshape(h.shape)
        return (h, out_stats) if return_stats else h


import os as _os

# Which projection sites get flattened to explicit 2-D GEMMs:
#   "none" (default) — plain Dense everywhere
#   "4d"  — only rank-4 (temporal-stack) operands
#   "all" — every site
# A/B on v5e (CFG fwd, tools/profile_unet.py): none 282.7 ms,
# 4d 292.7, all 300.7 — flattening removes the pixel-minor dot
# layouts (zero {1,3,2,0} left in the compiled HLO) but the reshape
# boundaries it adds cost more than the slow dots they fix. Parked.
_DENSE2D_POLICY = _os.environ.get("TC_DENSE2D", "none")


def _dense2d(mod, x):
    """Apply a Dense over the last axis, flattening leading axes to an
    explicit 2-D GEMM when the site policy calls for it.

    Motivation: dots over rank-3/4 operands can inherit pixel-minor
    layouts around the attention custom calls (profiled at 9-17 TF/s for
    the temporal-stack projections, vs 176 TF/s for the identical GEMM on
    flattened operands). Flattening pins the fast 2-D path — but the A/B
    above shows the forced reshape materializations cost more, so the
    default leaves every site un-flattened.
    """
    flatten = (_DENSE2D_POLICY == "all"
               or (_DENSE2D_POLICY == "4d" and x.ndim >= 4))
    if not flatten or x.ndim <= 2:
        return mod(x)
    lead = x.shape[:-1]
    y = mod(x.reshape((-1, x.shape[-1])))
    return y.reshape(lead + y.shape[-1:])


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _dense2d(nn.Dense(self.dim_out * 2, dtype=self.dtype,
                              name="proj"), x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * jax.nn.gelu(gate, approximate=False)


class _DenseParams(nn.Module):
    """Creates nn.Dense-compatible params (kernel + bias) and returns
    them raw, so fused kernels can consume the weights while the param
    tree stays byte-identical to the unfused nn.Dense path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class _DenseParamsNB(nn.Module):
    """Param-tree twin of nn.Dense(use_bias=False) — kernel only."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (in_features, self.features), jnp.float32)


class _GEGLUParams(nn.Module):
    """Param-tree twin of GEGLU (geglu/proj/{kernel,bias})."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return _DenseParams(self.features * 2, name="proj")(in_features)


class _LNParams(nn.Module):
    """Param-tree twin of ops.norms.LayerNorm (weight/bias, f32)."""

    @nn.compact
    def __call__(self, c: int):
        w = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return w, b


class _TAttnParams(nn.Module):
    """Param-tree twin of the temporal self-attention CrossAttention
    (to_q/to_k/to_v no-bias kernels + to_out dense), for the fused
    attn1+attn2 pair kernel that consumes both stages' weights raw."""

    inner: int
    out_dim: int

    @nn.compact
    def __call__(self, c: int):
        wq = _DenseParamsNB(self.inner, name="to_q")(c)
        wk = _DenseParamsNB(self.inner, name="to_k")(c)
        wv = _DenseParamsNB(self.inner, name="to_v")(c)
        wo, bo = _DenseParams(self.out_dim, name="to_out")(self.inner)
        return wq, wk, wv, wo, bo


class FeedForward(nn.Module):
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, ln=None, residual: bool = False,
                 deterministic: bool = True):
        """`ln`: optional (weight, bias) of the preceding LayerNorm
        (norm3, eps=1e-5) — folded into the fused kernel's prologue so
        the normalized activation never round-trips HBM. residual=True
        returns ff(ln(x)) + x, with the add folded into the kernel
        epilogue on the fused path."""
        from tooncrafter_tpu.ops import fused_ff

        dim = x.shape[-1]
        inner = dim * self.mult
        assert not residual or ln is not None
        # Fused Pallas path: [LN] + GEGLU proj + gate + out-GEMM in
        # VMEM, no HBM round-trip for the 2*inner-wide intermediate
        # (the single largest traffic source in the UNet — see
        # ops/fused_ff.py). Only when dropout is inactive (the kernel
        # has no mask input).
        if ((deterministic or self.dropout == 0.0)
                and fused_ff.use_kernel(x.size // dim, dim, inner)):
            w1, b1 = _GEGLUParams(inner, name="geglu")(dim)
            w2, b2 = _DenseParams(dim, name="out")(inner)
            lnw, lnb = (None, None) if ln is None else ln
            return fused_ff.fused_geglu_ff(
                x, w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
                ln_w=lnw, ln_b=lnb, residual=residual)
        x_in = x
        if ln is not None:
            x = norms.layer_norm(x, ln[0], ln[1])
        h = GEGLU(inner, self.dtype, name="geglu")(x)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        y = _dense2d(nn.Dense(dim, dtype=self.dtype, name="out"), h)
        return y + x_in if residual else y


class CrossAttention(nn.Module):
    """Multi-head attention with optional image-conditioning branch.

    When `context` is provided and `image_branch` is on, the first
    `text_len` tokens go through to_k/to_v and the rest through
    to_k_ip/to_v_ip; the two attention outputs are summed with `ip_scale`
    (attention.py:89-144).
    """

    heads: int
    dim_head: int
    image_branch: bool = False
    ip_scale: float = 1.0
    ip_scale_learnable: bool = False  # attention.py:77-78,139-141
    text_len: int = 77
    dropout: float = 0.0
    relative_position: bool = False  # temporal rel-pos bias (attention.py:20-39)
    temporal_length: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, *, ln=None,
                 deterministic: bool = True):
        inner = self.heads * self.dim_head
        self_attn = context is None
        ctx = x if self_attn else context
        out_dim = x.shape[-1]

        if ln is not None:
            # temporal fused sub-block: the preceding LayerNorm's params
            # are passed in and the WHOLE  ln -> qkv -> T-attention ->
            # to_out -> +residual  chain runs in one Pallas kernel
            # (ops/temporal_attention.fused_temporal_attn) — the three
            # QKV dots' retiling copies, the standalone norm pass and the
            # residual add all disappear. Returns x + attn(ln(x)).
            assert self_attn and x.ndim == 4 and mask is None \
                and not self.relative_position \
                and (deterministic or self.dropout == 0.0)
            from tooncrafter_tpu.ops import norms
            from tooncrafter_tpu.ops import temporal_attention as ta
            b, p, t, c = x.shape
            wq = _DenseParamsNB(inner, name="to_q")(c)
            wk = _DenseParamsNB(inner, name="to_k")(c)
            wv = _DenseParamsNB(inner, name="to_v")(c)
            wo, bo = _DenseParams(out_dim, name="to_out")(inner)
            scale = self.dim_head ** -0.5
            if ta.use_fused_kernel(t, p, self.dim_head, c, inner):
                return ta.fused_temporal_attn(
                    x, ln, wq, wk, wv, wo, bo, heads=self.heads,
                    scale=scale)
            # unfused fallback — the exact module chain the kernel fuses
            z = norms.layer_norm(x, ln[0], ln[1])
            dt = self.dtype
            out = ta.temporal_attention_ptc(
                jnp.dot(z, wq.astype(dt)), jnp.dot(z, wk.astype(dt)),
                jnp.dot(z, wv.astype(dt)), heads=self.heads, scale=scale)
            return x + (jnp.dot(out, wo.astype(dt)) + bo.astype(dt))

        if self_attn and x.ndim == 3 and mask is None:
            # spatial self-attention (SpatialTransformer attn1): packed
            # q/k/v projection + the multi-head single-pass kernel,
            # which consumes the token-major (B, S, H*D) layout directly
            # — no head-fold transposes, no barrier copies (A/B'd in
            # tools/bench_attn1.py: ds1 6.66->6.19, ds2 2.58->2.35,
            # ds4 2.41->1.85 ms per LN+proj+attn+out complex).
            from tooncrafter_tpu.ops import flash_attention as fa
            c_in = x.shape[-1]
            wq = _DenseParamsNB(inner, name="to_q")(c_in)
            wk = _DenseParamsNB(inner, name="to_k")(c_in)
            wv = _DenseParamsNB(inner, name="to_v")(c_in)
            xd = x.astype(self.dtype)
            if fa.use_packed_kernel(x.shape[1], inner, self.heads):
                wqkv = jnp.concatenate([wq, wk, wv],
                                       axis=1).astype(self.dtype)
                out = fa.flash_attention_packed(jnp.dot(xd, wqkv),
                                                self.heads)
            else:
                out = attention(jnp.dot(xd, wq.astype(self.dtype)),
                                jnp.dot(xd, wk.astype(self.dtype)),
                                jnp.dot(xd, wv.astype(self.dtype)),
                                heads=self.heads)
            out = _dense2d(nn.Dense(out_dim, dtype=self.dtype,
                                    name="to_out"), out)
            return nn.Dropout(self.dropout,
                              deterministic=deterministic)(out)

        q = _dense2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                              name="to_q"), x)

        if x.ndim == 4:
            # temporal fast path: (B, P, T, C) layout — per-pixel attention
            # over T through the Pallas kernel (ops/temporal_attention.py).
            # TemporalTransformer picks this layout only when the kernel's
            # coverage conditions hold (no mask, no rel-pos, TPU backend).
            assert self_attn
            from tooncrafter_tpu.ops import temporal_attention as ta
            assert ta.use_kernel(x.shape[2], x.shape[1], self.dim_head,
                                 inner=inner), (
                "4-D (B,P,T,C) input requires temporal-kernel coverage "
                f"(P={x.shape[1]}, T={x.shape[2]}, d={self.dim_head}); "
                "use the 5-D layout otherwise")
            k = _dense2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                  name="to_k"), x)
            v = _dense2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                  name="to_v"), x)
            out = ta.temporal_attention_ptc(
                q, k, v, heads=self.heads, scale=self.dim_head ** -0.5)
            out = _dense2d(nn.Dense(out_dim, dtype=self.dtype,
                                    name="to_out"), out)
            return nn.Dropout(self.dropout,
                              deterministic=deterministic)(out)

        if x.ndim == 5:
            # temporal in-place path: (B,T,H,W,C), attention over T
            assert self_attn
            k = _dense2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                  name="to_k"), x)
            v = _dense2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                  name="to_v"), x)
            rel_k = rel_v = None
            if self.relative_position:
                # learned relative-position tables, xavier init
                # (attention.py:20-39); gathered per (query, key) offset
                L = self.temporal_length
                init = nn.initializers.xavier_uniform()
                tab_k = self.param("relative_position_k",
                                   init, (2 * L + 1, self.dim_head),
                                   jnp.float32)
                tab_v = self.param("relative_position_v",
                                   init, (2 * L + 1, self.dim_head),
                                   jnp.float32)
                t = x.shape[1]
                qi = jnp.arange(t)[:, None]
                ki = jnp.arange(t)[None, :]
                idx = jnp.clip(ki - qi, -L, L) + L
                rel_k = tab_k[idx].astype(x.dtype)     # (t, s, d)
                rel_v = tab_v[idx].astype(x.dtype)
            out = temporal_attention_inplace(q, k, v, heads=self.heads,
                                             mask=mask, rel_k=rel_k,
                                             rel_v=rel_v)
            out = _dense2d(nn.Dense(out_dim, dtype=self.dtype,
                                    name="to_out"), out)
            return nn.Dropout(self.dropout,
                              deterministic=deterministic)(out)

        if self.image_branch and not self_attn:
            ctx_text = ctx[:, :self.text_len]
            ctx_img = ctx[:, self.text_len:]
            k = _dense2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                  name="to_k"), ctx_text)
            v = _dense2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                  name="to_v"), ctx_text)
            out = attention(q, k, v, heads=self.heads, mask=mask)
            k_ip = _dense2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                     name="to_k_ip"), ctx_img)
            v_ip = _dense2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                     name="to_v_ip"), ctx_img)
            out_ip = attention(q, k_ip, v_ip, heads=self.heads)
            scale_ip = self.ip_scale
            if self.ip_scale_learnable:
                alpha = self.param("alpha", nn.initializers.zeros, (),
                                   jnp.float32)
                scale_ip = scale_ip * (jnp.tanh(alpha) + 1.0)
            out = out + scale_ip * out_ip
        else:
            if not self_attn:
                ctx = ctx[:, :self.text_len]
            k = _dense2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                  name="to_k"), ctx)
            v = _dense2d(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                  name="to_v"), ctx)
            out = attention(q, k, v, heads=self.heads, mask=mask)
        out = _dense2d(nn.Dense(out_dim, dtype=self.dtype, name="to_out"),
                       out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    image_branch: bool = False
    ip_scale_learnable: bool = False
    cross: bool = True
    dropout: float = 0.0
    relative_position: bool = False
    temporal_length: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, *,
                 deterministic: bool = True):
        # temporal fast layout: hand the LayerNorm params INTO the
        # attention so the whole norm+attn+out+residual sub-block fuses
        # (ops/temporal_attention.fused_temporal_attn); the attention
        # call then returns x + attn(ln(x)) itself.
        fuse_t = (x.ndim == 4 and mask is None
                  and not self.relative_position
                  and (deterministic or self.dropout == 0.0))
        if fuse_t and not (self.cross and context is not None):
            # both sub-blocks are plain T-self-attention — run them as
            # ONE Pallas kernel when covered (the pair kernel halves the
            # HBM round-trips: the round-3 in-loop trace shows attn2.N
            # consuming attn1.N back-to-back at every temporal site)
            from tooncrafter_tpu.ops import temporal_attention as ta
            _, p_, t_, c_ = x.shape
            inner_ = self.heads * self.dim_head
            if ta.use_pair_kernel(t_, p_, self.dim_head, c_, inner_):
                ln1 = _LNParams(name="norm1")(c_)
                ln2 = _LNParams(name="norm2")(c_)
                a1 = _TAttnParams(inner_, c_, name="attn1")(c_)
                a2 = _TAttnParams(inner_, c_, name="attn2")(c_)
                x = ta.fused_temporal_attn_pair(
                    x, (ln1, *a1), (ln2, *a2), heads=self.heads,
                    scale=self.dim_head ** -0.5)
                ln3 = _LNParams(name="norm3")(x.shape[-1])
                return FeedForward(dropout=self.dropout, dtype=self.dtype,
                                   name="ff")(
                    x, ln=ln3, residual=True,
                    deterministic=deterministic)
        if fuse_t:
            ln1 = _LNParams(name="norm1")(x.shape[-1])
            x = CrossAttention(self.heads, self.dim_head,
                               dropout=self.dropout,
                               temporal_length=self.temporal_length,
                               dtype=self.dtype, name="attn1")(
                x, None, None, ln=ln1, deterministic=deterministic)
        else:
            x = CrossAttention(self.heads, self.dim_head,
                               dropout=self.dropout,
                               relative_position=self.relative_position,
                               temporal_length=self.temporal_length,
                               dtype=self.dtype, name="attn1")(
                LayerNorm(name="norm1")(x), None, mask,
                deterministic=deterministic) + x
        # attn2: cross-attn when context given; self-attn otherwise
        # (temporal blocks run with context=None -> self)
        if fuse_t and not (self.cross and context is not None):
            ln2 = _LNParams(name="norm2")(x.shape[-1])
            x = CrossAttention(self.heads, self.dim_head,
                               ip_scale_learnable=self.ip_scale_learnable,
                               temporal_length=self.temporal_length,
                               dropout=self.dropout, dtype=self.dtype,
                               name="attn2")(
                x, None, None, ln=ln2, deterministic=deterministic)
        else:
            x = CrossAttention(self.heads, self.dim_head,
                               image_branch=self.image_branch,
                               ip_scale_learnable=self.ip_scale_learnable,
                               relative_position=self.relative_position,
                               temporal_length=self.temporal_length,
                               dropout=self.dropout, dtype=self.dtype,
                               name="attn2")(
                LayerNorm(name="norm2")(x),
                context if self.cross else None, mask,
                deterministic=deterministic) + x
        ln3 = _LNParams(name="norm3")(x.shape[-1])
        x = FeedForward(dropout=self.dropout, dtype=self.dtype, name="ff")(
            x, ln=ln3, residual=True, deterministic=deterministic)
        return x


class SpatialTransformer(nn.Module):
    """Attention over (h*w) tokens per frame (attention.py:249-310),
    use_linear projections."""

    heads: int
    dim_head: int
    depth: int = 1
    image_branch: bool = True
    ip_scale_learnable: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True,
                 stats=None, return_stats: bool = False):
        # stats: optional chained (s1, s2) per-channel sums of x
        # ((B*T, C), from the upstream ResBlock's conv epilogue) — the
        # GN then never reads x for statistics, so XLA stops
        # materializing an f32 copy of the activation before the
        # proj_in layout transpose (profiled ~0.55 ms per 320-ch site).
        # return_stats=True also returns sums of the OUTPUT (residual
        # included) for the downstream temporal transformer's norm.
        bt, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        h = GroupNormAct(eps=1e-6, act=False, name="norm")(x, stats=stats)
        # barrier: keep the proj_in layout change a standalone bf16
        # transpose of the normalized activation — without it, layout
        # assignment materializes the apply's f32 upcast row-major and
        # transposes the f32 tensor (2x the bytes; profiled 0.65 vs
        # ~0.26 ms per ds1 site). Same trick as the temporal fast path.
        h = jax.lax.optimization_barrier(h)
        h = h.reshape(bt, hh * ww, c)
        h = _dense2d(nn.Dense(inner, dtype=self.dtype, name="proj_in"), h)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.heads, self.dim_head, image_branch=self.image_branch,
                ip_scale_learnable=self.ip_scale_learnable,
                dropout=self.dropout, dtype=self.dtype, name=f"block_{d}",
            )(h, context, deterministic=deterministic)
        h = _dense2d(nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init,
                              name="proj_out"), h)
        # (an exit barrier mirroring the entry one was A/B'd: 194.0 vs
        # 192.0 ms/step in-loop — the proj_out->residual boundary fuses
        # better when XLA owns the layout; don't add one)
        out = x + h.reshape(bt, hh, ww, c)
        if not return_stats:
            return out
        # inline f32 casts (see ops/norms.gn_affine) so the sums fuse
        # into the residual-add pass instead of upcasting out in HBM
        s1 = jnp.sum(out, axis=(1, 2), dtype=jnp.float32)
        s2 = jnp.sum(jnp.square(out.astype(jnp.float32)), axis=(1, 2))
        return out, (s1, s2)


class TemporalTransformer(nn.Module):
    """Self-attention over the T axis per pixel (attention.py:313-412),
    use_linear projections, self-attention only (shipped config)."""

    heads: int
    dim_head: int
    depth: int = 1
    causal: bool = False
    relative_position: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, stats=None,
                 return_stats: bool = False):
        # stats: optional chained (s1, s2) per-channel sums of x over
        # (T, H, W) — shape (B, C) — from the upstream spatial
        # transformer's output sums; the 5-D GroupNorm then costs no
        # stats read of x. return_stats=True also returns per-frame
        # (B, T, C) sums of the output for the next block's norm.
        # x: (B, T, H, W, C). Two layouts for the block stack:
        #  * fast path (TPU, no mask/rel-pos): (B, P, T, C) — one transpose
        #    in/out; per-pixel T-attention runs in the Pallas kernel and
        #    every projection keeps a clean tokens-major layout.
        #  * fallback: keep (B,T,H,W,C) in place; attention over T via
        #    einsum so no (B*H*W, T, C) transpose materializes.
        from tooncrafter_tpu.ops import temporal_attention as ta

        b, t, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        # blocks run at width `inner` (after proj_in), so the fused
        # sub-block kernel sees c == inner
        fused_ok = (ta.use_fused_kernel(t, hh * ww, self.dim_head,
                                        inner, inner)
                    and self.dropout == 0.0)
        fast = (not self.causal and not self.relative_position
                and (ta.use_kernel(t, hh * ww, self.dim_head, inner=inner)
                     or fused_ok))
        h = GroupNormAct(eps=1e-6, act=False, name="norm")(x, stats=stats)
        if fast:
            # barriers keep the layout transpose a standalone bandwidth
            # copy instead of a forced-layout fusion into the norm apply
            # or proj_in matmul (see ops/flash_attention._flash_fwd_impl)
            h = jax.lax.optimization_barrier(h)
            h = h.reshape(b, t, hh * ww, c).transpose(0, 2, 1, 3)
            h = jax.lax.optimization_barrier(h)
        h = _dense2d(nn.Dense(inner, dtype=self.dtype, name="proj_in"), h)
        mask = jnp.tril(jnp.ones((t, t), bool)) if self.causal else None
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.heads, self.dim_head, cross=False,
                relative_position=self.relative_position, temporal_length=t,
                dropout=self.dropout, dtype=self.dtype, name=f"block_{d}",
            )(h, None, mask, deterministic=deterministic)
        h = _dense2d(nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init,
                              name="proj_out"), h)
        if fast:
            h = jax.lax.optimization_barrier(h)
            h = h.transpose(0, 2, 1, 3).reshape(b, t, hh, ww, c)
        out = x + h
        if not return_stats:
            return out
        s1 = jnp.sum(out, axis=(2, 3), dtype=jnp.float32)   # (B, T, C)
        s2 = jnp.sum(jnp.square(out.astype(jnp.float32)), axis=(2, 3))
        return out, (s1, s2)


class Downsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1,
                       dtype=self.dtype, name="op")(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # nearest-2x + SAME conv folded into one input-dilated conv
        # (ops/resize.upsample2x_conv3x3); params stay nn.Conv-shaped
        return UpsampleConv2x(x.shape[-1], dtype=self.dtype,
                              name="conv")(x)


# ---------------------------------------------------------------------------
# the UNet
# ---------------------------------------------------------------------------

class UNetModel(nn.Module):
    in_channels: int = 8
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    temporal_length: int = 16
    image_cross_attention: bool = True
    image_cross_attention_scale_learnable: bool = False
    addition_attention: bool = True
    fs_condition: bool = True
    default_fs: int = 24
    dropout: float = 0.1
    text_len: int = 77
    img_tokens_per_frame: int = 16
    use_checkpoint: bool = False  # per-block nn.remat (training memory)
    # what the per-block remat saves: None = save nothing (recompute the
    # whole block in the bwd pass — max memory saving), 'dots' = save MXU
    # outputs (jax.checkpoint_policies.checkpoint_dots — recompute only
    # the cheap VPU work), 'dots_no_batch' = its no-batch-dims variant
    remat_policy: Optional[str] = None
    use_relative_position: bool = False
    use_causal_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context, fs=None, *,
                 cfg_groups: int = 1, deterministic: bool = True):
        """x: (B,T,H,W,C_in); timesteps,fs: (B,);
        context: (B, text_len + T*img_tokens, context_dim).

        cfg_groups=n declares that the leading batch dim is n CFG guidance
        branches stacked over B/n clips with IDENTICAL x/timesteps/fs
        (only `context` differs — exactly how sampling/ddim.py batches
        the branches). The context-free stem — input conv, init temporal
        attention, and every block before the first cross-attending
        SpatialTransformer — then runs once on B/n rows and is tiled
        back to B, which is numerically identical (all stem ops are
        batch-row independent) and saves the duplicated stem compute."""
        b, t, hh, ww, _ = x.shape
        mc = self.model_channels
        ted = mc * 4
        g = cfg_groups
        if g > 1:
            assert b % g == 0, (b, g)
        bs = b // g if g > 1 else b  # stem clip count
        shared = [g > 1]  # mutated once the first context consumer runs

        def widen_pair(h, st):
            """Tile the stem result (and its chained stats) back to the
            full CFG batch."""
            if shared[0]:
                h = jnp.tile(h, (g,) + (1,) * (h.ndim - 1))
                if st is not None:
                    st = (jnp.tile(st[0], (g, 1)), jnp.tile(st[1], (g, 1)))
                shared[0] = False
            return h, st

        # ---- time + fps embedding, broadcast per frame ----
        t_emb = timestep_embedding(timesteps, mc).astype(self.dtype)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_0")(t_emb)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_2")(silu(emb))
        if self.fs_condition:
            if fs is None:
                fs = jnp.full((b,), self.default_fs, jnp.float32)
            fs_emb = timestep_embedding(fs, mc).astype(self.dtype)
            fs_emb = nn.Dense(ted, dtype=self.dtype,
                              name="fps_embedding_0")(fs_emb)
            fs_emb = nn.Dense(ted, dtype=self.dtype, kernel_init=zeros_init,
                              bias_init=zeros_init,
                              name="fps_embedding_2")(silu(fs_emb))
            emb = emb + fs_emb
        emb = jnp.repeat(emb, t, axis=0)  # (B*T, ted)

        # ---- context routing: text broadcast per frame, img per frame ----
        expected = self.text_len + t * self.img_tokens_per_frame
        if context.shape[1] == expected:
            ctx_text = context[:, :self.text_len]
            ctx_img = context[:, self.text_len:]
            ctx_text = jnp.repeat(ctx_text, t, axis=0)
            ctx_img = ctx_img.reshape(b * t, self.img_tokens_per_frame,
                                      context.shape[-1])
            ctx = jnp.concatenate([ctx_text, ctx_img], axis=1)
        else:
            ctx = jnp.repeat(context, t, axis=0)
        ctx = ctx.astype(self.dtype)

        h = x.reshape(b * t, hh, ww, x.shape[-1]).astype(self.dtype)
        if g > 1:
            # branch 0's clips are the first bs rows; every branch's
            # x/emb rows are identical by the cfg_groups contract
            h = h[:bs * t]

        # Chained per-channel stats (s1, s2) ride alongside h across
        # block boundaries: each block's closing op emits sums of its
        # output, and the next block's norm folds them into its affine —
        # no norm in the hot path ever reads its input for statistics.
        # Gated like the in-block fusion (ResBlock `fused`).
        chain = deterministic or self.dropout == 0.0

        def rematted(cls, static_argnums):
            if not self.use_checkpoint:
                return cls
            policies = {
                None: None,
                "dots": jax.checkpoint_policies.checkpoint_dots,
                "dots_no_batch":
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            }
            if self.remat_policy not in policies:
                # fail with the field name, not a KeyError mid-trace
                raise ValueError(
                    f"remat_policy={self.remat_policy!r}; expected one "
                    f"of {sorted(policies, key=str)}")
            return nn.remat(cls, static_argnums=static_argnums,
                            policy=policies[self.remat_policy])

        def res(idx_name, ch, h, st=None):
            cls = rematted(UNetResBlock, (3, 4, 6))
            e = emb[:bs * t] if shared[0] else emb
            out = cls(ch, self.dropout, use_temporal_conv=True,
                      dtype=self.dtype, name=idx_name)(
                h, e, t, deterministic, st if chain else None, chain)
            return out if chain else (out, None)

        def spatial(idx_name, ch, h, st=None):
            heads = ch // self.num_head_channels
            cls = rematted(SpatialTransformer, (3, 5))
            h, st = widen_pair(h, st)
            out = cls(
                heads, self.num_head_channels, self.transformer_depth,
                image_branch=self.image_cross_attention,
                ip_scale_learnable=self.image_cross_attention_scale_learnable,
                dtype=self.dtype, name=idx_name)(
                h, ctx, deterministic, st if chain else None, chain)
            return out if chain else (out, None)

        def temporal(idx_name, ch, h, st=None, heads=None):
            heads = heads or ch // self.num_head_channels
            nb = bs if shared[0] else b
            h5 = h.reshape((nb, t) + h.shape[1:])
            st5 = None
            if chain and st is not None:
                # (nb*t, C) frame sums -> (nb, C): the temporal norm
                # spans (T, H, W)
                st5 = (st[0].reshape(nb, t, -1).sum(1),
                       st[1].reshape(nb, t, -1).sum(1))
            cls = rematted(TemporalTransformer, (2, 4))
            out = cls(
                heads, self.num_head_channels, self.transformer_depth,
                causal=self.use_causal_attention,
                relative_position=self.use_relative_position,
                dtype=self.dtype, name=idx_name)(
                h5, deterministic, st5, chain)
            if chain:
                h5, so = out
                so = (None if so is None else
                      (so[0].reshape(nb * t, -1), so[1].reshape(nb * t, -1)))
            else:
                h5, so = out, None
            return h5.reshape(h.shape), so

        def push(h, st):
            """Skip-stack entry: (h, stats), stem-tiled to full batch."""
            if shared[0]:
                h = jnp.tile(h, (g, 1, 1, 1))
                st = (None if st is None else
                      (jnp.tile(st[0], (g, 1)), jnp.tile(st[1], (g, 1))))
            hs.append((h, st))

        # ---- input blocks ----
        hs = []
        h = nn.Conv(mc, (3, 3), dtype=self.dtype, name="input_conv")(h)
        st = None
        if self.addition_attention:
            h, st = temporal("init_attn", mc, h, st, heads=8)
        push(h, st)
        ch = mc
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = mult * mc
                h, st = res(f"in_{level}_{i}_res", ch, h, st)
                if ds in self.attention_resolutions:
                    h, st = spatial(f"in_{level}_{i}_spatial", ch, h, st)
                    h, st = temporal(f"in_{level}_{i}_temporal", ch, h, st)
                push(h, st)
            if level != len(self.channel_mult) - 1:
                h = Downsample(self.dtype, name=f"down_{level}")(h)
                st = None
                ds *= 2
                push(h, st)

        # ---- middle ----
        h, st = widen_pair(h, st)  # no-op unless no spatial attention
        h, st = res("mid_res_0", ch, h, st)
        h, st = spatial("mid_spatial", ch, h, st)
        h, st = temporal("mid_temporal", ch, h, st)
        h, st = res("mid_res_1", ch, h, st)

        # ---- output blocks ----
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip, skip_st = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                # stats of a channel concat = concat of per-channel sums
                st = ((jnp.concatenate([st[0], skip_st[0]], axis=-1),
                       jnp.concatenate([st[1], skip_st[1]], axis=-1))
                      if (st is not None and skip_st is not None) else None)
                ch = mult * mc
                h, st = res(f"out_{level}_{i}_res", ch, h, st)
                if ds in self.attention_resolutions:
                    h, st = spatial(f"out_{level}_{i}_spatial", ch, h, st)
                    h, st = temporal(f"out_{level}_{i}_temporal", ch, h, st)
                if level and i == self.num_res_blocks:
                    h = Upsample(self.dtype, name=f"up_{level}")(h)
                    st = None
                    ds //= 2

        h = GroupNormAct(eps=1e-5, name="out_norm")(h, stats=st)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    kernel_init=zeros_init, name="out_conv")(h)
        return h.reshape(b, t, hh, ww, self.out_channels).astype(jnp.float32)
