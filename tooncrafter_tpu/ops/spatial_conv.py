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
import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_INTERPRET = False
_VMEM_BUDGET = 12 * 1024 * 1024


from tooncrafter_tpu.ops import _dispatch


def _on_tpu() -> bool:
    return _dispatch.on_tpu()


def _vmem_bytes(hw: int, ck: int, cout_t: int, pad_hw: int, wimg: int,
                hb: int, k_tiled: bool, w_dbl: bool) -> int:
    ebytes = 2  # bf16 slabs
    x_blk = 2 * hw * ck * ebytes          # double-buffered input block
    zp = pad_hw * ck * ebytes             # padded normalized slab
    out = 2 * hw * cout_t * ebytes        # double-buffered output block
    # weight blocks double-buffer only when their index varies over the
    # grid (cout- or cin-tiled)
    w = (2 if w_dbl else 1) * 9 * ck * cout_t * ebytes
    band = hb * wimg * 9 * ck * ebytes    # im2col band temp
    if k_tiled:
        acc = hw * cout_t * 4             # fp32 scratch across cin tiles
    else:
        acc = hb * wimg * cout_t * 4      # fp32 row-band accumulator
    return x_blk + zp + acc + out + w + band


def _band_rows(w: int) -> int:
    # rows per in-kernel band: keep the MXU M dim >= 256
    return max(1, -(-256 // w))


def _pick_tiles(h: int, w: int, cin: int, cout: int):
    """(ck, ct) input/output channel tiles, or (0, 0).

    Mosaic needs the lane (last) block dim of every operand to be a
    multiple of 128 or the full array dim; ck tiles the conv's K dim
    (accumulating across grid steps in fp32 scratch) so wide skip-concat
    inputs (640/1920/2560 ch) still fit VMEM.
    """
    hw, pad_hw, hb = h * w, (h + 2) * (w + 2), _band_rows(w)
    for ck in (cin, 1024, 512, 256, 128):
        if ck > cin or cin % ck or (ck != cin and ck % 128):
            continue
        for ct in (cout, 512, 384, 256, 128):
            if ct <= cout and cout % ct == 0 \
                    and (ct == cout or ct % 128 == 0) \
                    and _vmem_bytes(
                        hw, ck, ct, pad_hw, w, hb, ck != cin,
                        ck != cin or ct != cout) <= _VMEM_BUDGET:
                return ck, ct
    return 0, 0


def _use_kernel(h: int, w: int, cin: int, cout: int) -> bool:
    import os

    # The Pallas kernel is OFF by default: measured on v5e it runs the
    # UNet's conv shapes at 55-70 TF/s vs XLA's 59-86 (the normalize/
    # pad/im2col copies are VPU-bound), and the full UNet forward is
    # 285.7 ms through the XLA formula vs 292.9 ms through the kernel.
    # All the algebraic wins (folded GN affine, temb-shift fold,
    # residual epilogue, stats chaining) live in the XLA path too.
    # TC_SPATIAL_CONV_PALLAS=1 re-enables it for kernel work (read at
    # import — set it before the process starts, like the flags below).
    if not (_INTERPRET or _SPATIAL_CONV_PALLAS):
        return False
    if not (_on_tpu() or _INTERPRET):
        return False
    if h < 8 or w < 8 or cin % 64 or cout % 64:
        return False
    return _pick_tiles(h, w, cin, cout)[0] > 0


def _pallas_fused_conv(x, a, b, kernel, bias, res, silu: bool,
                       stats: bool):
    """x: (N,H,W,C); a/b: (N,C) fp32; kernel: (3,3,C,Cout) in compute
    dtype; bias: (Cout,); res: (N,H,W,Cout) or None. With stats=True also
    emits per-channel fp32 sums s1/s2 of the (cast) output — the next
    GroupNorm's statistics for free.

    NOT jit-wrapped on purpose: the tiling reads module globals
    (_VMEM_BUDGET, _INTERPRET) that tests monkeypatch — a jit cache
    keyed only on shapes would pin stale executables. Callers are
    always inside the model's jit anyway."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    cout = kernel.shape[-1]
    ck, ct = _pick_tiles(h, w, c, cout)
    n_ct = cout // ct
    n_ck = c // ck
    hb = _band_rows(w)
    residual = res is not None
    if not residual:  # dummy block so the kernel arity is fixed
        res = jnp.zeros((1, 1, 1, ct), x.dtype)

    def partial_conv(zp, w_ref, h0, rows):
        # im2col over the band: ONE (rows*w, 9*ck) x (9*ck, ct) MXU dot.
        # 9 separate K=ck dots leave the MXU pipeline half-empty at the
        # UNet's 320-ch level (measured 26% MFU); folding the taps into
        # the contraction dim (K=9*ck=2880) feeds it properly.
        band = jnp.concatenate(
            [zp[h0 + dy:h0 + dy + rows, dx:dx + w].reshape(rows * w, ck)
             for dy in range(3) for dx in range(3)], axis=1)
        return jax.lax.dot_general(
            band, w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def normalize(x_ref, a_ref, b_ref):
        i = pl.program_id(0)
        z = x_ref[0].astype(jnp.float32) * a_ref[i][None] + b_ref[i][None]
        if silu:
            z = z * jax.nn.sigmoid(z)
        return jnp.pad(z.astype(x_ref.dtype), ((1, 1), (1, 1), (0, 0)))

    def epilogue(ob, o_ref, stat_refs, h0, rows, s1_acc, s2_acc):
        o_ref[0, h0:h0 + rows] = ob
        if stats:
            # stats of the CAST output so the chained norm sees exactly
            # what a standalone norm would read
            of = ob.astype(jnp.float32).reshape(rows * w, ct)
            s1_acc = s1_acc + jnp.sum(of, axis=0)
            s2_acc = s2_acc + jnp.sum(of * of, axis=0)
        return s1_acc, s2_acc

    def kern_flat(x_ref, a_ref, b_ref, w_ref, bias_ref, res_ref, o_ref,
                  *stat_refs):
        # single cin tile: row bands keep the fp32 accumulator small so
        # full-Cout tiles fit VMEM at the 40x64x320 level
        zp = normalize(x_ref, a_ref, b_ref)
        bias_v = bias_ref[0].astype(jnp.float32)
        s1_acc = jnp.zeros((ct,), jnp.float32)
        s2_acc = jnp.zeros((ct,), jnp.float32)
        for h0 in range(0, h, hb):
            rows = min(hb, h - h0)
            acc = partial_conv(zp, w_ref, h0, rows) + bias_v
            if residual:
                acc = acc + res_ref[0, h0:h0 + rows].reshape(
                    rows * w, ct).astype(jnp.float32)
            ob = acc.reshape(rows, w, ct).astype(o_ref.dtype)
            s1_acc, s2_acc = epilogue(ob, o_ref, stat_refs, h0, rows,
                                      s1_acc, s2_acc)
        if stats:
            stat_refs[0][0, 0] = s1_acc
            stat_refs[1][0, 0] = s2_acc

    def kern_ktiled(x_ref, a_ref, b_ref, w_ref, bias_ref, res_ref, o_ref,
                    *refs):
        # wide-cin path (skip-concat inputs): grid walks cin tiles
        # innermost, partial products accumulate in fp32 scratch; the
        # epilogue (bias/residual/cast/stats) runs on the last tile
        acc_ref = refs[-1]
        stat_refs = refs[:-1]
        k = pl.program_id(2)
        zp = normalize(x_ref, a_ref, b_ref)
        for h0 in range(0, h, hb):
            rows = min(hb, h - h0)
            part = partial_conv(zp, w_ref, h0, rows)
            sl = slice(h0 * w, h0 * w + rows * w)

            @pl.when(k == 0)
            def _init(part=part, sl=sl):
                acc_ref[sl] = part

            @pl.when(k > 0)
            def _accum(part=part, sl=sl):
                acc_ref[sl] = acc_ref[sl] + part

        @pl.when(k == n_ck - 1)
        def _finish():
            bias_v = bias_ref[0].astype(jnp.float32)
            s1_acc = jnp.zeros((ct,), jnp.float32)
            s2_acc = jnp.zeros((ct,), jnp.float32)
            for h0 in range(0, h, hb):
                rows = min(hb, h - h0)
                acc = acc_ref[h0 * w:h0 * w + rows * w] + bias_v
                if residual:
                    acc = acc + res_ref[0, h0:h0 + rows].reshape(
                        rows * w, ct).astype(jnp.float32)
                ob = acc.reshape(rows, w, ct).astype(o_ref.dtype)
                s1_acc, s2_acc = epilogue(ob, o_ref, stat_refs, h0, rows,
                                          s1_acc, s2_acc)
            if stats:
                stat_refs[0][0, 0] = s1_acc
                stat_refs[1][0, 0] = s2_acc

    k_tiled = n_ck > 1
    if k_tiled:
        grid = (n, n_ct, n_ck)
        ix = lambda i, j, k: (i, 0, 0, k)       # x: cin-tile minor
        iab = lambda i, j, k: (0, k)
        iw = lambda i, j, k: (k, 0, j)
        ibias = lambda i, j, k: (0, j)
        ires = lambda i, j, k: (i, 0, 0, j)
        ires0 = lambda i, j, k: (0, 0, 0, 0)
        iout = lambda i, j, k: (i, 0, 0, j)
        istat = lambda i, j, k: (i, 0, j)
        sem = ("parallel", "arbitrary", "arbitrary")
    else:
        grid = (n, n_ct)
        ix = lambda i, j: (i, 0, 0, 0)
        iab = lambda i, j: (0, 0)
        iw = lambda i, j: (0, 0, j)
        ibias = lambda i, j: (0, j)
        ires = lambda i, j: (i, 0, 0, j)
        ires0 = lambda i, j: (0, 0, 0, 0)
        iout = lambda i, j: (i, 0, 0, j)
        istat = lambda i, j: (i, 0, j)
        sem = ("parallel", "arbitrary")

    # weights in im2col layout: (n_ck, 9*ck, cout), rows tap-major then
    # cin within the tile — matching the band concat order in the kernel
    w9 = kernel.reshape(3, 3, n_ck, ck, cout).transpose(2, 0, 1, 3, 4) \
        .reshape(n_ck, 9 * ck, cout)

    out_shape = [jax.ShapeDtypeStruct((n, h, w, cout), x.dtype)]
    out_specs = [pl.BlockSpec((1, h, w, ct), iout)]
    if stats:
        for _ in range(2):
            out_shape.append(jax.ShapeDtypeStruct((n, 1, cout),
                                                  jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1, ct), istat))

    out = pl.pallas_call(
        kern_ktiled if k_tiled else kern_flat,
        # cout-minor grid order so consecutive steps reuse the resident
        # x block (same index -> no re-fetch)
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, ck), ix),
            # full-N affine blocks, row-indexed dynamically in the
            # kernel (a (1, C) block would violate the (8, 128) tiling)
            pl.BlockSpec((n, ck), iab),
            pl.BlockSpec((n, ck), iab),
            pl.BlockSpec((1, 9 * ck, ct), iw),
            pl.BlockSpec((1, ct), ibias),
            (pl.BlockSpec((1, h, w, ct), ires) if residual
             else pl.BlockSpec((1, 1, 1, ct), ires0)),
        ],
        out_specs=out_specs if stats else out_specs[0],
        out_shape=out_shape if stats else out_shape[0],
        scratch_shapes=([pltpu.VMEM((h * w, ct), jnp.float32)]
                        if k_tiled else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=sem,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x, a, b, w9, bias.reshape(1, -1), res)
    if stats:
        y, s1, s2 = out
        return y, s1.reshape(n, cout), s2.reshape(n, cout)
    return out


# A/B knobs for the conv prologue/epilogue lowering, read ONCE at import
# (flipping the env after a model has traced in-process has no effect —
# recorded mistake from round 2; tools set the module globals directly
# between traces instead). Numerics note on the prologue dtype: the
# reference (`lvdm/basics.py:76-87` GroupNorm32 under autocast) applies
# the GN affine in fp32, casts the result to half precision, and runs
# SiLU + conv in half — so "ref" matches torch bit-for-bit at the cast
# points; "f32" (round-1/2 default) keeps SiLU in fp32 too and is a
# strict precision superset. "bf16" folds (A, B) to bf16 and runs the
# whole prologue in compute dtype.
# default "ref": A/B-measured ≥ "f32" at every UNet conv shape
# (tools/bench_prologue.py, .audit_r03.jsonl — +17% at the 10x16x1280
# site) and bit-matches torch's autocast cast points.
_PROLOGUE_DTYPE = os.environ.get("TC_PROLOGUE_DTYPE", "ref")
_PROLOGUE_BARRIER = bool(os.environ.get("TC_PROLOGUE_BARRIER"))
_STATS_BARRIER = bool(os.environ.get("TC_STATS_BARRIER"))
# A/B: square in bf16 (f32 accumulate) inside the stats epilogue — halves
# the epilogue's convert work at a ~bf16-noise-floor cost to the variance
# estimate. OFF: fp32-stat GroupNorm is a repo convention.
_STATS_SQ_BF16 = bool(os.environ.get("TC_STATS_SQ_BF16"))
_SPATIAL_CONV_PALLAS = bool(os.environ.get("TC_SPATIAL_CONV_PALLAS"))


def _apply_prologue(x, a, b, silu: bool):
    """GN-affine (+SiLU) prologue at the configured precision."""
    bshape = (x.shape[0], 1, 1, x.shape[-1])
    if _PROLOGUE_DTYPE == "bf16" and x.dtype != jnp.float32:
        z = x * a.astype(x.dtype).reshape(bshape) \
            + b.astype(x.dtype).reshape(bshape)
        if silu:
            z = z * jax.nn.sigmoid(z)
        return z
    z = x.astype(jnp.float32) * a.reshape(bshape) + b.reshape(bshape)
    if _PROLOGUE_DTYPE == "ref":
        z = z.astype(x.dtype)
    if silu:
        z = z * jax.nn.sigmoid(z)
    return z.astype(x.dtype)


def _xla_impl(x, a, b, kernel, bias, res, silu: bool, stats: bool):
    z = _apply_prologue(x, a, b, silu)
    if _PROLOGUE_BARRIER:
        # keep the GN-affine+SiLU prologue OUT of the conv fusion so
        # the conv sees a clean materialized bf16 input (emitter A/B)
        (z,) = jax.lax.optimization_barrier((z,))
    y = jax.lax.conv_general_dilated(
        z, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias.astype(y.dtype)
    if res is not None:
        y = y + res.astype(y.dtype)
    if stats:
        # inline XLA sums on purpose: they fuse into the conv epilogue
        # (consuming y as it streams), which A/B-measured faster than a
        # separate Pallas stats pass (286 vs 292 ms full forward).
        # _STATS_BARRIER forces the sums into a separate kernel
        # instead (round-2 trace showed the epilogue demoting the conv
        # emitter to ~41% MFU in context; standalone A/B was a wash —
        # tools/bench_stats_barrier.py).
        ys = y
        if _STATS_BARRIER:
            (ys,) = jax.lax.optimization_barrier((y,))
        s1 = jnp.sum(ys, axis=(1, 2), dtype=jnp.float32)
        if _STATS_SQ_BF16:
            s2 = jnp.sum(jnp.square(ys), axis=(1, 2), dtype=jnp.float32)
        else:
            s2 = jnp.sum(jnp.square(ys.astype(jnp.float32)), axis=(1, 2))
        return y, s1, s2
    return y


def _impl(x, a, b, kernel, bias, res, silu: bool, stats: bool):
    from tooncrafter_tpu.ops import winograd

    n, h, w, cin = x.shape
    # the winograd kernels implement the 'ref' and 'f32' prologue cast
    # points only; under the experimental 'bf16' mode (A/B knob) decline
    # them so every conv site measures the same bf16-folded numerics
    if (_on_tpu() or winograd._INTERPRET) and _PROLOGUE_DTYPE != "bf16":
        # F(2x4) allowlist outranks F(2x2) (strictly fewer MXU flops;
        # only entered where it measured faster than both XLA and F(2x2)).
        # No channel-padded dispatch: the pad-to-384 workaround for the
        # unaligned ds1 shapes measured a LOSS at every shape (r5
        # winograd_pad_ab — pad/slice HBM passes + lower-rate 384-ch dots
        # beat the 2.25x multiply saving); tools/bench_winograd_pad.py
        # keeps the harness if a future Mosaic lifts the lane-merge limit
        if winograd.table_entry24(h, w, cin, kernel.shape[-1]):
            return winograd.winograd24_gn_silu_conv3x3(
                x, a, b, kernel, bias, res, silu, stats)
        if winograd.table_entry(h, w, cin, kernel.shape[-1]):
            return winograd.winograd_gn_silu_conv3x3(
                x, a, b, kernel, bias, res, silu, stats)
    if _use_kernel(h, w, cin, kernel.shape[-1]):
        return _pallas_fused_conv(x, a, b, kernel, bias, res, silu, stats)
    return _xla_impl(x, a, b, kernel, bias, res, silu, stats)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(x, a, b, kernel, bias, res, silu, stats):
    return _impl(x, a, b, kernel, bias, res, silu, stats)


def _fused_fwd(x, a, b, kernel, bias, res, silu, stats):
    return _fused(x, a, b, kernel, bias, res, silu, stats), \
        (x, a, b, kernel, bias, res)


def _fused_bwd(silu, stats, saved, g):
    x, a, b, kernel, bias, res = saved
    diff = (x, a, b, kernel, bias) + ((res,) if res is not None else ())

    def f(*args):
        if res is not None:
            return _xla_impl(*args, silu=silu, stats=stats)
        return _xla_impl(*args, None, silu=silu, stats=stats)

    _, vjp = jax.vjp(f, *diff)
    grads = vjp(g)
    if res is None:
        grads = grads + (None,)
    return grads


_fused.defvjp(_fused_fwd, _fused_bwd)


def gn_silu_conv3x3(x, affine, kernel, bias, residual=None, silu=True,
                    return_stats=False):
    """conv3x3(silu(x*A + B)) + bias (+ residual) on (N, H, W, C).

    `affine` is the (A, B) pair from `ops/norms.gn_affine`. Numerically
    identical (fp32 tolerance) to group_norm -> silu -> nn.Conv -> add.
    With return_stats=True also returns per-channel fp32 sums (s1, s2)
    of the output over (H, W) — feed them to the next norm via
    `ops/norms.gn_affine_from_stats` to skip its statistics pass.
    """
    a, b = affine
    return _fused(x, a, b, kernel, bias, residual, silu, return_stats)


class UpsampleConv2x(nn.Module):
    """conv3x3_SAME(nearest_2x(x)) via the folded input-dilated conv
    (ops/resize.upsample2x_conv3x3). Params are named/shaped exactly
    like ``nn.Conv(features, (3, 3))`` so checkpoint conversion and
    existing param trees stay unchanged."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_stats: bool = False):
        from tooncrafter_tpu.ops.resize import upsample2x_conv3x3

        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return upsample2x_conv3x3(x, kernel.astype(self.dtype),
                                  bias.astype(self.dtype),
                                  return_stats=return_stats)


class SpatialConv3x3(nn.Module):
    """3x3 SAME conv with an optional fused GN/SiLU prologue and residual
    epilogue. Params are named/shaped exactly like ``nn.Conv(features,
    (3, 3))`` (kernel (3,3,Cin,Cout) + bias) so the torch checkpoint
    mapping and existing param trees stay unchanged."""

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, prologue=None, residual=None,
                 return_stats: bool = False):
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
                                   residual=residual, silu=False,
                                   return_stats=return_stats)
        return gn_silu_conv3x3(x, prologue, k, bi, residual=residual,
                               return_stats=return_stats)
