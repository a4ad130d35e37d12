"""Temporal (3,1,1) convolution as three shifted matmuls.

Rebuilds the reference's temporal-mixing convs: the UNet
TemporalConvBlock's 4x nn.Conv3d((3,1,1)) stack
(/root/reference/lvdm/modules/networks/openaimodel3d.py:239-279), the
dual-ref decoder's VideoResBlock time_stack
(lvdm/models/autoencoder_dualref.py:846-911) and AE3DConv time_mix_conv
(autoencoder_dualref.py:914-935) — every one a kernel-size-(3,1,1) conv
over (B, T, H, W, C). XLA's conv lowering for that shape walks the T
window with a stride of H*W*C elements (~10 MB at the decoder's level-2
resolution) and lands at ~26 TFLOP/s / 35 GB/s on v5e. Expressed as

    y[t] = x[t-1] @ W[0] + x[t] @ W[1] + x[t+1] @ W[2] + b

XLA instead emits three dense (B*T*H*W, Cin) x (Cin, Cout) matmuls with
fused adds — the shapes the MXU was built for.

Parameters are named/shaped exactly like `nn.Conv(features, (3, 1, 1))`
(kernel (3, 1, 1, Cin, Cout) + bias) so checkpoint conversion and every
existing test tree stay unchanged.

The shifted-matmul form still reads x three times; at the decoder's
full-resolution levels that alone saturates HBM (measured 691 GB/s on a
671 MB activation). The Pallas kernel below holds a (T, Ptile, C) block in
VMEM and computes the whole T window from one read — x and y cross HBM
exactly once.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

_INTERPRET = False


from tooncrafter_tpu.ops import _dispatch


def _on_tpu() -> bool:
    return _dispatch.on_tpu()


def _vmem_estimate(t: int, blk: int, cin: int, cout: int) -> int:
    slab = t * blk * cin * 2          # one (T, blk, C) bf16 slab
    out = t * blk * cout * 2
    # double-buffered in/out pipelines + normalized copy + weights + acc
    return 2 * slab + slab + 2 * out + 3 * cin * cout * 2 + blk * cout * 4


def _pick_ptile(p: int, c: int, t: int,
                budget: int = 13 * 1024 * 1024) -> int:
    for blk in (2048, 1024, 512, 320, 256, 160, 128, 64):
        if p % blk == 0 and _vmem_estimate(t, blk, c, c) <= budget:
            return blk
    return 0


def _use_kernel(t: int, p: int, cin: int, cout: int) -> bool:
    return (t <= 32 and cin == cout and cin % 128 in (0, 64)
            and _pick_ptile(p, cin, t) >= 64 and (_on_tpu() or _INTERPRET))


def _pallas_tconv(x, w, b, a_aff, b_aff, res, scale, silu: bool,
                  stats: bool):
    """x: (B, T, P, C); w: (3, C, Cout); b: (1, Cout); a_aff/b_aff:
    (B, C) fp32 per-sample GN affine applied (with optional SiLU) to x in
    VMEM before the temporal window — the normalized activation never
    touches HBM. res: (B, T, P, Cout) residual added in the epilogue, or
    None. scale: (1, 1) fp32 multiplying (conv + bias) BEFORE the
    residual add — the dual-ref alpha merge `x + sigmoid(mix)*stack(x)`
    (autoencoder_dualref.py:892-911 rewritten as a residual epilogue) —
    or None. stats=True emits P-tile-partial per-channel fp32 sums of the
    cast output, shape (B, n_p, 1, Cout) — reduce over axis 1 outside.

    (Not jit-wrapped: tiling reads monkeypatchable module globals;
    see ops/spatial_conv.py.)"""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, t, p, c = x.shape
    cout = w.shape[-1]
    pt = _pick_ptile(p, c, t)
    n_p = p // pt
    residual = res is not None
    scaled = scale is not None
    if not residual:  # dummy block keeps the kernel arity fixed
        res = jnp.zeros((1, 1, 1, cout), x.dtype)
    if not scaled:
        scale = jnp.ones((1, 1), jnp.float32)

    def kernel(x_ref, w_ref, b_ref, a_ref, baff_ref, res_ref, scale_ref,
               o_ref, *stat_refs):
        bi = pl.program_id(0)
        wk = [w_ref[i] for i in range(3)]
        bias = b_ref[0].astype(jnp.float32)
        # full (B, C) affine blocks, row-indexed dynamically (a (1, C)
        # block would violate Mosaic's (8, 128) tiling rule)
        a_c = a_ref[bi][None]                      # (1, C) fp32
        b_c = baff_ref[bi][None]
        zs = []
        for ti in range(t):
            z = x_ref[0, ti].astype(jnp.float32) * a_c + b_c
            if silu:
                z = z * jax.nn.sigmoid(z)
            zs.append(z.astype(x_ref.dtype))
        for ti in range(t):
            acc = jax.lax.dot_general(
                zs[ti], wk[1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if ti > 0:
                acc = acc + jax.lax.dot_general(
                    zs[ti - 1], wk[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if ti < t - 1:
                acc = acc + jax.lax.dot_general(
                    zs[ti + 1], wk[2], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc = acc + bias
            if scaled:
                acc = acc * scale_ref[0, 0]
            if residual:
                acc = acc + res_ref[0, ti].astype(jnp.float32)
            ob = acc.astype(o_ref.dtype)
            o_ref[0, ti] = ob
            if stats:
                # per-frame sums: row ti of the (T, C) stat block
                of = ob.astype(jnp.float32)
                stat_refs[0][0, 0, ti] = jnp.sum(of, axis=0)
                stat_refs[1][0, 0, ti] = jnp.sum(of * of, axis=0)

    out_shape = [jax.ShapeDtypeStruct((bsz, t, p, cout), x.dtype)]
    out_specs = [pl.BlockSpec((1, t, pt, cout),
                              lambda bi, pi: (bi, 0, pi, 0))]
    if stats:
        for _ in range(2):
            out_shape.append(
                jax.ShapeDtypeStruct((bsz, n_p, t, cout), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1, t, cout),
                                          lambda bi, pi: (bi, pi, 0, 0)))

    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_p),
        in_specs=[
            pl.BlockSpec((1, t, pt, c), lambda bi, pi: (bi, 0, pi, 0)),
            pl.BlockSpec((3, c, cout), lambda bi, pi: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda bi, pi: (0, 0)),
            pl.BlockSpec((bsz, c), lambda bi, pi: (0, 0)),
            pl.BlockSpec((bsz, c), lambda bi, pi: (0, 0)),
            (pl.BlockSpec((1, t, pt, cout), lambda bi, pi: (bi, 0, pi, 0))
             if residual else
             pl.BlockSpec((1, 1, 1, cout), lambda bi, pi: (0, 0, 0, 0))),
            pl.BlockSpec((1, 1), lambda bi, pi: (0, 0)),
        ],
        out_specs=out_specs if stats else out_specs[0],
        out_shape=out_shape if stats else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x, w, b, a_aff, b_aff, res, scale)
    if stats:
        y, s1, s2 = out
        # reduce the P-tile partials -> per-frame (B, T, C)
        return y, jnp.sum(s1, axis=1), jnp.sum(s2, axis=1)
    return out


def _xla_tconv(x, w, b, a_aff, b_aff, res, scale, silu: bool, stats: bool):
    """Shifted-matmul reference form. x: (B, T, *spatial, C)."""
    t = x.shape[1]
    if a_aff is not None or silu:
        z = x.astype(jnp.float32)
        if a_aff is not None:
            bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
            z = z * a_aff.reshape(bshape) + b_aff.reshape(bshape)
        if silu:
            z = z * jax.nn.sigmoid(z)
        x = z.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1)) + ((0, 0),) * (x.ndim - 2))
    y = jnp.tensordot(xp[:, 1:1 + t], w[1], axes=[[-1], [0]])
    y = y + jnp.tensordot(xp[:, 0:t], w[0], axes=[[-1], [0]])
    y = y + jnp.tensordot(xp[:, 2:2 + t], w[2], axes=[[-1], [0]])
    y = y + b
    if scale is not None:
        y = y * scale.reshape(()).astype(y.dtype)
    if res is not None:
        y = y + res.astype(y.dtype)
    if stats:
        # inline XLA sums on purpose — see ops/spatial_conv._xla_impl.
        # Per-frame (B, T, C): spatial axes only.
        axes = tuple(range(2, y.ndim - 1))
        s1 = jnp.sum(y, axis=axes, dtype=jnp.float32)
        s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=axes)
        return y, s1, s2
    return y


def _impl(x, w, b, a_aff, b_aff, res, scale, silu: bool, stats: bool):
    bsz, t, cin, cout = x.shape[0], x.shape[1], x.shape[-1], w.shape[-1]
    p = 1
    for d in x.shape[2:-1]:
        p *= d
    if _use_kernel(t, p, cin, cout):
        if a_aff is None:
            a_aff = jnp.ones((bsz, cin), jnp.float32)
            b_aff = jnp.zeros((bsz, cin), jnp.float32)
        res_r = None if res is None else res.reshape(bsz, t, p, cout)
        scale_r = None if scale is None \
            else scale.astype(jnp.float32).reshape(1, 1)
        out = _pallas_tconv(x.reshape(bsz, t, p, cin), w, b[None],
                            a_aff, b_aff, res_r, scale_r, silu, stats)
        oshape = x.shape[:-1] + (cout,)
        if stats:
            y, s1, s2 = out
            return y.reshape(oshape), s1, s2
        return out.reshape(oshape)
    return _xla_tconv(x, w, b, a_aff, b_aff, res, scale, silu, stats)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _tconv(x, w, b, a_aff, b_aff, res, scale, silu, stats):
    return _impl(x, w, b, a_aff, b_aff, res, scale, silu, stats)


def _tconv_fwd(x, w, b, a_aff, b_aff, res, scale, silu, stats):
    return _tconv(x, w, b, a_aff, b_aff, res, scale, silu, stats), \
        (x, w, b, a_aff, b_aff, res, scale)


def _tconv_bwd(silu, stats, saved, g):
    # recompute through the differentiable shifted-matmul form; the
    # Pallas forward stays a leaf (like ops/spatial_conv.py)
    x, w, b, a_aff, b_aff, res, scale = saved
    diff = (x, w, b) + ((a_aff, b_aff) if a_aff is not None else ()) \
        + ((res,) if res is not None else ()) \
        + ((scale,) if scale is not None else ())

    def f(x_, w_, b_, *rest):
        rest = list(rest)
        aff = (rest.pop(0), rest.pop(0)) if a_aff is not None \
            else (None, None)
        r = rest.pop(0) if res is not None else None
        s = rest.pop(0) if scale is not None else None
        return _xla_tconv(x_, w_, b_, aff[0], aff[1], r, s, silu, stats)

    _, vjp = jax.vjp(f, *diff)
    grads = list(vjp(g))
    gx, gw, gb = grads[:3]
    rest = grads[3:]
    ga, gbaff = (rest.pop(0), rest.pop(0)) if a_aff is not None \
        else (None, None)
    gres = rest.pop(0) if res is not None else None
    gscale = rest.pop(0) if scale is not None else None
    return gx, gw, gb, ga, gbaff, gres, gscale


_tconv.defvjp(_tconv_fwd, _tconv_bwd)


def temporal_conv3(x, w, b, affine=None, silu=False, residual=None,
                   out_scale=None, return_stats=False):
    """y[t] = out_scale * (z[t-1]@w[0] + z[t]@w[1] + z[t+1]@w[2] + b)
    (+ residual) over axis 1, where z = silu(x*A + B) if a folded GN
    `affine` (A, B from ops/norms.gn_affine) is given, else z = x.
    `out_scale` (a traced scalar, e.g. a sigmoid'd merge factor) rides
    the epilogue — the dual-ref alpha merge x + sigmoid(mix)*stack(x)
    costs no extra pass. return_stats=True also returns PER-FRAME
    per-channel fp32 sums (s1, s2) of the output, shape (B, T, C), over
    the spatial axes — reduce over axis 1 for a (T,H,W)-spanning norm,
    reshape to (B*T, C) for a per-frame norm; feed either via
    ops/norms.gn_affine_from_stats."""
    a_aff, b_aff = affine if affine is not None else (None, None)
    return _tconv(x, w, b, a_aff, b_aff, residual, out_scale, silu,
                  return_stats)


class TemporalConv3(nn.Module):
    """Drop-in for nn.Conv(features, (3,1,1), SAME) on (B,T,H,W,C)."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, prologue=None, residual=None, out_scale=None,
                 return_stats: bool = False):
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 1, 1, cin, self.features), jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,),
                          jnp.float32)
        w = kernel[:, 0, 0].astype(self.dtype)       # (3, Cin, Cout)
        return temporal_conv3(x, w, bias.astype(self.dtype),
                              affine=prologue, silu=prologue is not None,
                              residual=residual, out_scale=out_scale,
                              return_stats=return_stats)
