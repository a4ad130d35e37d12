"""Fused [GroupNorm-affine -> SiLU -> 3x3 conv (-> +residual)] Pallas kernel.

Every spatial conv in the UNet ResBlock sits behind a GroupNorm+SiLU
prologue (`lvdm/modules/networks/openaimodel3d.py:210-236`: GN+SiLU+conv
twice per block). XLA must materialize the normalized activation in HBM
between the norm fusion and the convolution, and its TPU conv lowering
runs the 3x3 at ~45% MFU — together the two were ~50% of the measured
UNet step (elementwise 32% + reduce 20%, round-1 trace).

This kernel takes the *folded* GN affine (A, B per sample+channel, from
`ops/norms.gn_affine` — one cheap XLA stats pass, the only other read of
x) and computes

    y = conv3x3(silu(x * A + B)) + bias (+ residual)

in one HBM round-trip: the (H, W, C) sample slab is normalized in VMEM
and the conv is 9 shifted (H*W, Cin) @ (Cin, Cout) MXU dots over that
resident slab — the halo never touches HBM. The optional residual input
folds the ResBlock skip-add (`openaimodel3d.py:234-236`) into the conv
epilogue.

The ResBlock time-embedding add (`:225-228`) is folded analytically into
the *next* norm's (A, B) by `gn_affine(shift=...)`, so it never costs a
pass either. Differentiable via custom_vjp (backward recomputes through
the XLA reference formula, like ops/fused_norms.py).

Dispatch: TPU only, per-sample slab must fit VMEM (the UNet's 40x64 /
20x32 / 10x16 levels do; the full-res VAE levels fall back to XLA). Cout
is grid-tiled when the weight/accumulator would not fit.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_INTERPRET = False
_VMEM_BUDGET = 11 * 1024 * 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def _vmem_bytes(hw: int, c: int, cout_t: int, pad_hw: int, wimg: int,
                hb: int) -> int:
    ebytes = 2  # bf16 slabs
    x_blk = 2 * hw * c * ebytes           # double-buffered input block
    zp = pad_hw * c * ebytes              # padded normalized slab
    acc = hb * wimg * cout_t * 4          # fp32 row-band accumulator
    out = 2 * hw * cout_t * ebytes        # double-buffered output block
    w = 9 * c * cout_t * ebytes
    return x_blk + zp + acc + out + w


def _band_rows(w: int) -> int:
    # rows per in-kernel band: keep the MXU M dim >= 256
    return max(1, -(-256 // w))


def _pick_cout_tile(h: int, w: int, cin: int, cout: int) -> int:
    # Mosaic needs the lane (last) block dim to be a multiple of 128 or
    # the full array dim
    hw, pad_hw, hb = h * w, (h + 2) * (w + 2), _band_rows(w)
    for ct in (cout, 512, 384, 256, 128):
        if ct <= cout and cout % ct == 0 \
                and (ct == cout or ct % 128 == 0) \
                and _vmem_bytes(hw, cin, ct, pad_hw, w, hb) <= _VMEM_BUDGET:
            return ct
    return 0


def _use_kernel(h: int, w: int, cin: int, cout: int) -> bool:
    if not (_on_tpu() or _INTERPRET):
        return False
    if h < 8 or w < 8 or cin % 64 or cout % 64:
        return False
    return _pick_cout_tile(h, w, cin, cout) > 0


@functools.partial(jax.jit, static_argnames=("silu",))
def _pallas_fused_conv(x, a, b, kernel, bias, res, silu: bool):
    """x: (N,H,W,C); a/b: (N,C) fp32; kernel: (3,3,C,Cout) in compute
    dtype; bias: (Cout,); res: (N,H,W,Cout) or None."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    cout = kernel.shape[-1]
    ct = _pick_cout_tile(h, w, c, cout)
    n_ct = cout // ct
    hb = _band_rows(w)
    residual = res is not None
    if not residual:  # dummy block so the kernel arity is fixed
        res = jnp.zeros((1, 1, 1, ct), x.dtype)

    def kern(x_ref, a_ref, b_ref, w_ref, bias_ref, res_ref, o_ref):
        i = pl.program_id(0)
        xs = x_ref[0]                                # (H, W, C)
        z = xs.astype(jnp.float32) * a_ref[i][None] + b_ref[i][None]
        if silu:
            z = z * jax.nn.sigmoid(z)
        zp = jnp.pad(z.astype(xs.dtype), ((1, 1), (1, 1), (0, 0)))
        bias_v = bias_ref[0].astype(jnp.float32)
        # row bands keep the fp32 accumulator small so full-Cout tiles
        # fit VMEM at the 40x64x320 level
        for h0 in range(0, h, hb):
            rows = min(hb, h - h0)
            acc = jax.lax.dot_general(
                zp[h0 + 1:h0 + 1 + rows, 1:1 + w].reshape(rows * w, c),
                w_ref[1, 1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    if dy == 1 and dx == 1:
                        continue
                    acc = acc + jax.lax.dot_general(
                        zp[h0 + dy:h0 + dy + rows,
                           dx:dx + w].reshape(rows * w, c),
                        w_ref[dy, dx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            acc = acc + bias_v
            if residual:
                acc = acc + res_ref[0, h0:h0 + rows].reshape(
                    rows * w, ct).astype(jnp.float32)
            o_ref[0, h0:h0 + rows] = acc.reshape(rows, w, ct).astype(
                o_ref.dtype)

    return pl.pallas_call(
        kern,
        # cout-minor grid order so consecutive steps reuse the resident
        # x block (same index -> no re-fetch)
        grid=(n, n_ct),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0)),
            # full (N, C) affine blocks, row-indexed dynamically in the
            # kernel (a (1, C) block would violate the (8, 128) tiling)
            pl.BlockSpec((n, c), lambda i, j: (0, 0)),
            pl.BlockSpec((n, c), lambda i, j: (0, 0)),
            pl.BlockSpec((3, 3, c, ct), lambda i, j: (0, 0, 0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            (pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j))
             if residual else
             pl.BlockSpec((1, 1, 1, ct), lambda i, j: (0, 0, 0, 0))),
        ],
        out_specs=pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x, a, b, kernel, bias.reshape(1, -1), res)


def _xla_impl(x, a, b, kernel, bias, res, silu: bool):
    bshape = (x.shape[0], 1, 1, x.shape[-1])
    z = x.astype(jnp.float32) * a.reshape(bshape) + b.reshape(bshape)
    if silu:
        z = z * jax.nn.sigmoid(z)
    z = z.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        z, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias.astype(y.dtype)
    if res is not None:
        y = y + res.astype(y.dtype)
    return y


def _impl(x, a, b, kernel, bias, res, silu: bool):
    n, h, w, cin = x.shape
    if _use_kernel(h, w, cin, kernel.shape[-1]):
        return _pallas_fused_conv(x, a, b, kernel, bias, res, silu)
    return _xla_impl(x, a, b, kernel, bias, res, silu)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused(x, a, b, kernel, bias, res, silu):
    return _impl(x, a, b, kernel, bias, res, silu)


def _fused_fwd(x, a, b, kernel, bias, res, silu):
    return _fused(x, a, b, kernel, bias, res, silu), \
        (x, a, b, kernel, bias, res)


def _fused_bwd(silu, saved, g):
    x, a, b, kernel, bias, res = saved
    diff = (x, a, b, kernel, bias) + ((res,) if res is not None else ())

    def f(*args):
        if res is not None:
            return _xla_impl(*args, silu=silu)
        return _xla_impl(*args, None, silu=silu)

    _, vjp = jax.vjp(f, *diff)
    grads = vjp(g)
    if res is None:
        grads = grads + (None,)
    return grads


_fused.defvjp(_fused_fwd, _fused_bwd)


def gn_silu_conv3x3(x, affine, kernel, bias, residual=None, silu=True):
    """conv3x3(silu(x*A + B)) + bias (+ residual) on (N, H, W, C).

    `affine` is the (A, B) pair from `ops/norms.gn_affine`. Numerically
    identical (fp32 tolerance) to group_norm -> silu -> nn.Conv -> add.
    """
    a, b = affine
    return _fused(x, a, b, kernel, bias, residual, silu)


class SpatialConv3x3(nn.Module):
    """3x3 SAME conv with an optional fused GN/SiLU prologue and residual
    epilogue. Params are named/shaped exactly like ``nn.Conv(features,
    (3, 3))`` (kernel (3,3,Cin,Cout) + bias) so the torch checkpoint
    mapping and existing param trees stay unchanged."""

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, prologue=None, residual=None):
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        k = kernel.astype(self.dtype)
        bi = bias.astype(self.dtype)
        if prologue is None:
            ones = jnp.ones((x.shape[0], cin), jnp.float32)
            zeros = jnp.zeros((x.shape[0], cin), jnp.float32)
            return gn_silu_conv3x3(x, (ones, zeros), k, bi,
                                   residual=residual, silu=False)
        return gn_silu_conv3x3(x, prologue, k, bi, residual=residual)
