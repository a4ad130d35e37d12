"""Normalization ops with explicit fp32 statistics.

The reference forces GroupNorm to fp32 under AMP (`lvdm/basics.py:76-87`,
GroupNorm32) and uses eps=1e-5 in the UNet (`torch.nn.GroupNorm` default) but
eps=1e-6 in the VAE/transformer norms (`ae_modules.py:17-19`,
`attention.py:265`). Here statistics are always computed in fp32 and the
result is cast back to the input dtype, which is the bf16-safe TPU equivalent.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def gn_affine(x, scale, bias, num_groups: int = 32, eps: float = 1e-6,
              shift=None):
    """Folded per-sample GroupNorm affine: fp32 (A, B), each (N, C), with

        group_norm(x + shift) == x * A + B          (shift broadcast (N, C))

    The optional `shift` (a per-sample per-channel bias, e.g. the UNet's
    time-embedding add, openaimodel3d.py:225-228) is folded analytically
    from the per-channel sums — the shifted activation is never
    materialized: s1' = s1 + P*e, s2' = s2 + 2*e*s1 + P*e^2 for spatial
    count P, then B absorbs the shift as B + e*A.
    """
    n = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    spatial_axes = tuple(range(1, x.ndim - 1))
    spatial = 1
    for a in spatial_axes:
        spatial *= x.shape[a]
    count = spatial * (c // num_groups)
    # two-stage statistics keeping the channel axis minor throughout:
    # (1) per-channel spatial sums — a layout-friendly reduce over the
    #     major dims (reducing the grouped 4D reshape directly measured
    #     ~10x below HBM bandwidth on TPU);
    # (2) fold channels into groups on the tiny (N, C) tensor.
    # fp32 casts stay INLINE in each consumer: binding one shared upcast
    # tempts XLA into materializing a full fp32 copy of the activation in
    # HBM (profiled: +105 MB per 320-ch site), whereas per-consumer casts
    # fuse into the reduce / normalize fusions. Numerics are identical.
    s1 = jnp.sum(x, axis=spatial_axes, dtype=jnp.float32)       # (N, C)
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=spatial_axes)
    return gn_affine_from_stats(s1, s2, spatial, scale, bias,
                                num_groups, eps, shift=shift)


def gn_affine_from_stats(s1, s2, spatial: int, scale, bias,
                         num_groups: int = 32, eps: float = 1e-6,
                         shift=None):
    """gn_affine from precomputed per-channel sums.

    s1/s2: (N, C) fp32 sums of x and x^2 over `spatial` positions —
    typically emitted by a producing conv kernel's stats epilogue
    (ops/spatial_conv.py, ops/temporal_conv.py), so the norm costs no
    extra pass over the activation.
    """
    n, c = s1.shape
    assert c % num_groups == 0, (c, num_groups)
    count = spatial * (c // num_groups)
    if shift is not None:
        e = shift.astype(jnp.float32)                           # (N, C)
        s2 = s2 + 2.0 * e * s1 + spatial * jnp.square(e)
        s1 = s1 + spatial * e
    s1g = jnp.sum(s1.reshape(n, num_groups, -1), axis=-1)    # (N, G)
    s2g = jnp.sum(s2.reshape(n, num_groups, -1), axis=-1)
    mean_g = s1g / count
    var_g = jnp.maximum(s2g / count - jnp.square(mean_g), 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels and fold the affine
    mean_c = jnp.repeat(mean_g, c // num_groups, axis=1)    # (N, C)
    inv_c = jnp.repeat(inv_g, c // num_groups, axis=1)
    a_c = inv_c * scale.astype(jnp.float32)[None]
    b_c = bias.astype(jnp.float32)[None] - mean_c * a_c
    if shift is not None:
        b_c = b_c + e * a_c
    return a_c, b_c


def group_norm(x, scale, bias, num_groups: int = 32, eps: float = 1e-6):
    """GroupNorm over channels-last input of any rank.

    x: (N, *spatial, C). Statistics are taken jointly over all spatial dims
    and the channels within a group — matching torch semantics for both 4D
    (N,C,H,W) and 5D (N,C,T,H,W) inputs (the temporal conv blocks normalize
    across T as well).
    """
    a_c, b_c = gn_affine(x, scale, bias, num_groups, eps)
    bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    out = x.astype(jnp.float32) * a_c.reshape(bshape) + b_c.reshape(bshape)
    return out.astype(x.dtype)


class GroupNorm(nn.Module):
    """Affine GroupNorm with fp32 statistics; params stored fp32.

    Param names `weight`/`bias` intentionally match torch's GroupNorm so the
    checkpoint converter is mechanical.
    """

    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, weight, bias, self.num_groups, self.eps)


class GroupNormAct(nn.Module):
    """GroupNorm optionally fused with SiLU through the Pallas kernel
    (ops/fused_norms.py); numerically identical to GroupNorm followed by
    swish, with one HBM pass on TPU. Param names match torch."""

    num_groups: int = 32
    eps: float = 1e-6
    act: bool = True

    @nn.compact
    def __call__(self, x, *, shift=None, return_affine: bool = False,
                 stats=None):
        from tooncrafter_tpu.ops.fused_norms import group_norm_silu

        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if return_affine:
            # folded (A, B) for a downstream fused norm->act->conv kernel
            # (ops/spatial_conv.py); `shift` folds a pre-norm per-channel
            # add (the ResBlock temb) without materializing it. The
            # consumer applies the activation, so this only makes sense
            # for act=True norms. `stats` (s1, s2) — per-channel sums
            # from the producer's epilogue — makes the affine free of
            # any read of x; x is then only used for its shapes.
            assert self.act
            spatial = 1
            for d in x.shape[1:-1]:
                spatial *= d
            if stats is not None:
                s1, s2 = stats
                return gn_affine_from_stats(
                    s1, s2, spatial, weight, bias, self.num_groups,
                    self.eps, shift=shift)
            return gn_affine(x, weight, bias, self.num_groups, self.eps,
                             shift=shift)
        assert shift is None
        if stats is not None:
            # apply-from-chained-stats: the producer's epilogue already
            # summed x and x^2, so this pass never reads x for
            # statistics — with one consumer left, XLA fuses the f32
            # upcast + affine (+act) + downcast into a single pass (or
            # into the consumer's layout copy) instead of materializing
            # a full f32 activation copy (profiled: the standalone
            # spatial-transformer GN cost a 105 MB f32 convert + a
            # 105 MB f32 transpose per 320-ch site in the denoise loop).
            s1, s2 = stats
            spatial = 1
            for d in x.shape[1:-1]:
                spatial *= d
            a_c, b_c = gn_affine_from_stats(
                s1, s2, spatial, weight, bias, self.num_groups, self.eps)
            bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
            out = (x.astype(jnp.float32) * a_c.reshape(bshape)
                   + b_c.reshape(bshape))
            if self.act:
                out = out * jax.nn.sigmoid(out)
            return out.astype(x.dtype)
        return group_norm_silu(x, weight, bias, self.num_groups, self.eps,
                               self.act)


def layer_norm(x, weight, bias, eps: float = 1e-5):
    """Functional LayerNorm over the last axis with fp32 statistics."""
    # inline fp32 casts (see group_norm): avoid a materialized upcast
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    out = ((x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps))
    out = out * weight + bias
    return out.astype(x.dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the last axis with fp32 statistics (torch param names)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return layer_norm(x, weight, bias, self.eps)
