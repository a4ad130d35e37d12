"""Winograd F(2x2,3x3) fused [GN-affine -> SiLU -> conv3x3] TPU kernel.

Rebuilds the same contract as ops/spatial_conv.gn_silu_conv3x3 (the
GN+SiLU+conv pairs of `lvdm/modules/networks/openaimodel3d.py:210-236`)
with 2.25x fewer MXU multiplies: each 2x2 output tile is computed from a
4x4 input tile via 16 elementwise-transformed components and 16 batched
(tiles, Cin) @ (Cin, Cout) dots instead of 36 multiplies per tap
(F(2x2,3x3): y = A^T [ (G g G^T) .* (B^T d B) ] A, with the 0.5 factors
folded into the pre-transformed weights so the input/inverse transforms
are pure +/- VPU work that overlaps the dots).

Why this exists: the in-loop UNet convs already run at 139-194 TF/s
(71-98% MFU — .audit_r04.jsonl generic_fusion_attribution_r4), so there
is no efficiency headroom left in direct convolution; fewer FLOPs is the
only remaining lever. Measured standalone (tools/bench_winograd.py):
-8% at 20x32x640->640 and -21% at 10x16x1280->1280 vs XLA's conv
emitter; LOSES at the 40x64 level (transform overhead exceeds the
multiply saving at large spatial / small channel shapes) — so dispatch
is a measured per-shape allowlist, not a heuristic.

Layout rules (hard-won Mosaic constraints, bench_winograd sweeps):
  * H-transform reads paired-row reshapes of contiguous slices (no
    stride-2 sublane gathers); W-transform merges the (2, C) minor pair
    into lanes, so the even/odd column components are lane slices —
    legal only when C % 128 == 0 (a lane split at e.g. 320 crashes the
    Mosaic compiler), hence the allowlist keys on aligned channels.
  * The inverse transform reassembles output column pairs adjacently in
    lanes when Cout is unaligned ("paired" layout, free row-major
    reshape outside the kernel); the product allowlist only contains
    aligned Couts so the in-kernel interleave is used.

Numerics: transforms accumulate in fp32 (dots use
preferred_element_type=f32); components are cast to bf16 (or kept f32,
per-shape `f32t` flag) before the MXU. Measured max|wino - direct-bf16|
is ~6e-3 relative — the same order as bf16 conv rounding itself; parity
vs the interpret-mode direct formula is gated in
tests/test_winograd.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = False
# Read once at import (repo convention — flipping the env after a trace
# has no effect; tools patch module globals between traces instead).
_WINOGRAD = os.environ.get("TC_WINOGRAD", "1") != "0"

# G for F(2x2, 3x3): (4, 3)
_G = np.array([[1.0, 0.0, 0.0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0.0, 0.0, 1.0]])

# Measured allowlist: (h, w, cin, cout) -> (nb, ct, f32t, ck). nb =
# samples per grid step (raises the MXU M dim at small spatial levels),
# ct = Cout tile (0 = full), f32t = keep the transformed components in
# f32 for the dots, ck = Cin tile (0 = full; tiles accumulate in fp32
# scratch so the wide skip-concat inputs fit VMEM). Entries only where
# the scan-loop A/B beat XLA (.audit_r04.jsonl winograd_ab): the 40x64
# level loses and stays XLA; cin=960 is Mosaic-illegal (the input
# transform's lane merge needs cin % 128 == 0).
_TABLE = {
    (20, 32, 640, 640): (2, 0, False, 0),
    (20, 32, 1280, 640): (2, 0, False, 0),
    (20, 32, 1920, 640): (2, 0, False, 640),
    (10, 16, 1280, 1280): (8, 640, True, 0),
    (10, 16, 1920, 1280): (8, 640, True, 640),
    (10, 16, 2560, 1280): (8, 640, True, 640),
    # 576x1024-model geometry (72x128 latents): 18x32 wins big
    # (-35% standalone), 36x64 narrowly (-6% f32t); the 36x64 wide-cin
    # variants are NOT entered (the margin is too thin to extrapolate)
    (36, 64, 640, 640): (1, 0, True, 0),
    (18, 32, 1280, 1280): (2, 640, False, 0),
    (18, 32, 1920, 1280): (2, 640, False, 640),
    (18, 32, 2560, 1280): (2, 640, False, 640),
}


def table_entry(h: int, w: int, cin: int, cout: int):
    # gate on _WINOGRAD alone (not _INTERPRET): TC_WINOGRAD=0 must win
    # even in interpret mode; tests monkeypatch _WINOGRAD/_TABLE directly
    return _TABLE.get((h, w, cin, cout)) if _WINOGRAD else None


# (16, 9) tap-combination matrix: M[(i,j), (a,b)] = G[i,a] * G[j,b]
_M16 = np.einsum("ia,jb->ijab", _G, _G).reshape(16, 9)


def transform_kernel(kernel):
    """(3,3,Cin,Cout) -> (16, Cin, Cout): W'_{ij} = sum_ab G[i,a]G[j,b]
    g_ab. Structured as ONE (16,9) @ (9, Cin*Cout) matmul over a free
    major-dim reshape — no transposes to materialize. This matters
    in-loop: the einsum form cost ~1.1 ms/step in transpose fusions
    inside the DDIM scan (XLA LICM declined to hoist it); this form is
    cheap even unhoisted."""
    c, co = kernel.shape[2], kernel.shape[3]
    g = kernel.astype(jnp.float32).reshape(9, c * co)
    return (jnp.asarray(_M16) @ g).reshape(16, c, co)


def _make_prologue(xdt, silu: bool):
    """Shared prologue-dtype policy for both Winograd kernels (advisor
    r4): under spatial_conv's 'ref' mode the fp32 affine result is
    ROUNDED to compute dtype before SiLU (torch autocast's cast point).
    The SiLU arithmetic itself stays fp32 — bf16 mul/sigmoid ops fail
    Mosaic verification ('vector.broadcast', repro r5) — so vs the XLA
    'ref' path the residual divergence is the per-element bf16 rounding
    of sigmoid AND of the product (both below the kernels' ~6e-3
    envelope, but NOT bit-parity; the cast-point test runs at 0.06
    tolerance for this reason). The experimental 'bf16' mode is not
    implemented here — spatial_conv._impl declines Winograd under it."""
    from tooncrafter_tpu.ops import spatial_conv as _sc
    pref = _sc._PROLOGUE_DTYPE == "ref" and xdt != jnp.float32

    def prologue(z):
        if pref:
            z = z.astype(xdt).astype(jnp.float32)
        if silu:
            z = z * jax.nn.sigmoid(z)
        return z
    return prologue


def winograd_gn_silu_conv3x3(x, a, b, kernel, bias, res, silu: bool,
                             stats: bool):
    """Same contract as spatial_conv._xla_impl: x (N,H,W,C) bf16, a/b
    (N,C) f32 folded GN affine, kernel (3,3,C,Cout), bias (Cout,), res
    (N,H,W,Cout) or None; with stats=True also returns per-channel fp32
    sums s1/s2 of the cast output. Caller must have checked
    table_entry(h, w, cin, cout) is not None."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    cout = kernel.shape[-1]
    nb, ct, f32t, ck = _TABLE[(h, w, c, cout)]
    while n % nb:
        nb //= 2
    ct = ct or cout
    ck = ck or c
    n_ct = cout // ct
    n_ck = c // ck
    th, tw = h // 2, w // 2
    nt = nb * th * tw
    tdt = jnp.float32 if f32t else x.dtype
    residual = res is not None
    if not residual:  # dummy block keeps the kernel arity fixed
        res = jnp.zeros((1, 1, 1, ct), x.dtype)
    wt = transform_kernel(kernel).astype(x.dtype)
    prologue = _make_prologue(x.dtype, silu)

    def transform_in(zp):
        """(h+2, w+2, ck) padded slab -> 16 x (th*tw, ck) components."""
        A = zp[0:h].reshape(th, 2, w + 2, ck)
        B = zp[2:h + 2].reshape(th, 2, w + 2, ck)
        d0, d1 = A[:, 0], A[:, 1]
        d2, d3 = B[:, 0], B[:, 1]
        t = [d0 - d2, d1 + d2, d2 - d1, d1 - d3]  # (th, w+2, ck) x4
        u = []
        for ti in t:
            E = ti[:, 0:w].reshape(th, tw, 2 * ck)
            F = ti[:, 2:w + 2].reshape(th, tw, 2 * ck)
            e0, e1 = E[..., :ck], E[..., ck:]
            f0, f1 = F[..., :ck], F[..., ck:]
            u += [e0 - f0, e1 + f0, f0 - e1, e1 - f1]
        return [ui.reshape(th * tw, ck) for ui in u]

    def tile_dots(x_ref, a_ref, b_ref, w_ref, i):
        """Normalize + transform the (nb, h, w, ck) block and run the
        16 MXU dots; returns y0..y3 pre-bias partials (nt, ct) f32."""
        us_all = []
        for s in range(nb):
            z = prologue(x_ref[s].astype(jnp.float32)
                         * a_ref[i * nb + s][None]
                         + b_ref[i * nb + s][None])
            zp = jnp.pad(z.astype(tdt), ((1, 1), (1, 1), (0, 0)))
            us_all.append(transform_in(zp))
        us = [jnp.concatenate(parts, 0) for parts in zip(*us_all)] \
            if nb > 1 else us_all[0]
        m = [jax.lax.dot_general(
                us[j], w_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
             for j in range(16)]                       # (nt, ct) f32
        v = [m[0 + j] + m[4 + j] + m[8 + j] for j in range(4)] + \
            [m[4 + j] - m[8 + j] - m[12 + j] for j in range(4)]
        return (v[0] + v[1] + v[2],    # out row 2r,   col 2s
                v[1] - v[2] - v[3],    # out row 2r,   col 2s+1
                v[4] + v[5] + v[6],    # out row 2r+1, col 2s
                v[5] - v[6] - v[7])    # out row 2r+1, col 2s+1

    def finish(ys, bias_ref, res_ref, o_ref, stat_refs):
        """bias + residual + interleave + cast + stats epilogue."""
        bias_v = bias_ref[0].astype(jnp.float32)
        dt = o_ref.dtype
        y0, y1, y2, y3 = (yi + bias_v for yi in ys)
        if residual:
            # res quadrants via the same layout-legal views as the input
            # transform: paired-row major split + (2, ct) minor pair
            # merged into lanes (lane slice legal since ct % 128 == 0)
            r = res_ref[...].reshape(nb * th, 2, w, ct)
            rt = r[:, 0].reshape(nb * th, tw, 2 * ct)
            rb = r[:, 1].reshape(nb * th, tw, 2 * ct)
            q = [rt[..., :ct], rt[..., ct:], rb[..., :ct], rb[..., ct:]]
            q = [qi.reshape(nt, ct).astype(jnp.float32) for qi in q]
            y0, y1, y2, y3 = y0 + q[0], y1 + q[1], y2 + q[2], y3 + q[3]
        top = jnp.concatenate([y0.astype(dt), y1.astype(dt)], axis=-1) \
            .reshape(nb, th, 1, w, ct)
        bot = jnp.concatenate([y2.astype(dt), y3.astype(dt)], axis=-1) \
            .reshape(nb, th, 1, w, ct)
        ob = jnp.concatenate([top, bot], axis=2).reshape(nb, h, w, ct)
        o_ref[...] = ob
        if stats:
            # stats of the CAST output so the chained norm sees exactly
            # what a standalone norm would read (spatial_conv contract)
            of = ob.astype(jnp.float32).reshape(nb, h * w, ct)
            stat_refs[0][:, 0] = jnp.sum(of, axis=1)
            stat_refs[1][:, 0] = jnp.sum(of * of, axis=1)

    def kern_flat(x_ref, a_ref, b_ref, w_ref, bias_ref, res_ref, o_ref,
                  *stat_refs):
        ys = tile_dots(x_ref, a_ref, b_ref, w_ref, pl.program_id(0))
        finish(ys, bias_ref, res_ref, o_ref, stat_refs)

    def kern_ktiled(x_ref, a_ref, b_ref, w_ref, bias_ref, res_ref,
                    o_ref, *refs):
        # wide-cin path (skip-concat inputs): the grid walks cin tiles
        # innermost; the four pre-bias quadrant partials accumulate in
        # fp32 scratch and the epilogue runs on the last tile
        acc_ref = refs[-1]
        stat_refs = refs[:-1]
        k = pl.program_id(2)
        ys = tile_dots(x_ref, a_ref, b_ref, w_ref, pl.program_id(0))
        for qi, yq in enumerate(ys):
            @pl.when(k == 0)
            def _init(qi=qi, yq=yq):
                acc_ref[qi] = yq

            @pl.when(k > 0)
            def _accum(qi=qi, yq=yq):
                acc_ref[qi] = acc_ref[qi] + yq

        @pl.when(k == n_ck - 1)
        def _finish():
            finish(tuple(acc_ref[qi] for qi in range(4)),
                   bias_ref, res_ref, o_ref, stat_refs)

    k_tiled = n_ck > 1
    if k_tiled:
        grid = (n // nb, n_ct, n_ck)
        ix = lambda i, j, k: (i, 0, 0, k)
        iab = lambda i, j, k: (0, k)
        iw = lambda i, j, k: (0, k, j)
        ibias = lambda i, j, k: (0, j)
        ires = lambda i, j, k: (i, 0, 0, j)
        ires0 = lambda i, j, k: (0, 0, 0, 0)
        iout = lambda i, j, k: (i, 0, 0, j)
        istat = lambda i, j, k: (i, 0, j)
        sem = ("parallel", "arbitrary", "arbitrary")
    elif n_ct > 1:
        grid = (n // nb, n_ct)
        ix = lambda i, j: (i, 0, 0, 0)
        iab = lambda i, j: (0, 0)
        iw = lambda i, j: (0, 0, j)
        ibias = lambda i, j: (0, j)
        ires = lambda i, j: (i, 0, 0, j)
        ires0 = lambda i, j: (0, 0, 0, 0)
        iout = lambda i, j: (i, 0, 0, j)
        istat = lambda i, j: (i, 0, j)
        sem = ("parallel", "arbitrary")
    else:
        grid = (n // nb,)
        ix = lambda i: (i, 0, 0, 0)
        iab = lambda i: (0, 0)
        iw = lambda i: (0, 0, 0)
        ibias = lambda i: (0, 0)
        ires = lambda i: (i, 0, 0, 0)
        ires0 = lambda i: (0, 0, 0, 0)
        iout = lambda i: (i, 0, 0, 0)
        istat = lambda i: (i, 0, 0)
        sem = ("parallel",)

    out_shape = [jax.ShapeDtypeStruct((n, h, w, cout), x.dtype)]
    out_specs = [pl.BlockSpec((nb, h, w, ct), iout)]
    if stats:
        for _ in range(2):
            out_shape.append(
                jax.ShapeDtypeStruct((n, 1, cout), jnp.float32))
            out_specs.append(pl.BlockSpec((nb, 1, ct), istat))

    out = pl.pallas_call(
        kern_ktiled if k_tiled else kern_flat,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, h, w, ck), ix),
            pl.BlockSpec((n, ck), iab),
            pl.BlockSpec((n, ck), iab),
            pl.BlockSpec((16, ck, ct), iw),
            pl.BlockSpec((1, ct), ibias),
            (pl.BlockSpec((nb, h, w, ct), ires) if residual
             else pl.BlockSpec((1, 1, 1, ct), ires0)),
        ],
        out_specs=out_specs if stats else out_specs[0],
        out_shape=out_shape if stats else out_shape[0],
        scratch_shapes=([pltpu.VMEM((4, nt, ct), jnp.float32)]
                        if k_tiled else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=sem,
            vmem_limit_bytes=108 * 1024 * 1024),  # 100M OOMed by 113K after the r5 prologue round-trip temp; v5e VMEM is 128M
        interpret=_INTERPRET,
    )(x, a, b, wt, bias.reshape(1, -1), res)
    if stats:
        y, s1, s2 = out
        return y, s1.reshape(n, cout), s2.reshape(n, cout)
    return out


# ---------------------------------------------------------------------------
# NOTE (r5): a channel-PADDED dispatch for the unaligned ds1 shapes
# (pad cin/cout 320->384 outside the kernel, run the aligned kernel,
# slice back — exact by zero affine rows / zero weight columns) was
# built in r4 and measured in r5: it LOSES to XLA's fused conv at every
# ds1 shape (512: 3.03 vs 2.51 ms, 3.93 vs 3.52; 1024: 7.33 vs 5.96 or
# VMEM-locked) and at the dual-ref decoder's aligned 512-ch shapes
# (2.60 vs 2.43 ms) — .audit_r05.jsonl winograd_pad_ab. The production
# wrapper was removed; tools/bench_winograd_pad.py keeps the measurement
# harness should a future Mosaic lift the cin%128 lane-merge limit.
# ---------------------------------------------------------------------------
# F(2x4, 3x3): mixed-tile Winograd — F(2,3) along H, F(4,3) along W.
#
# Each 2x4 output tile needs a 4x6 input tile = 24 transformed components
# and 24 (tiles, Cin)@(Cin, Cout) dots vs 72 direct multiplies: 3x fewer
# MXU flops per output (F(2x2) gives 2.25x). The W-side transforms carry
# small-integer coefficients (4, 5, 2 — Lavin's F(4,3) matrices) instead
# of pure +/-, so components amplify inputs by up to ~10x; the input
# transform therefore runs in fp32 (z is fp32 out of the normalize
# anyway) and casts each component once, and the allowlist records the
# measured max|delta| per shape before adoption (same bar as F(2x2):
# the bf16-conv-rounding order).
# ---------------------------------------------------------------------------

# F(4,3) weight transform (6, 3)
_G4 = np.array([[1 / 4, 0, 0],
                [-1 / 6, -1 / 6, -1 / 6],
                [-1 / 6, 1 / 6, -1 / 6],
                [1 / 24, 1 / 12, 1 / 6],
                [1 / 24, -1 / 12, 1 / 6],
                [0, 0, 1.0]])

# (24, 9) tap-combination matrix: rows ordered (i, j) = i * 6 + j with
# i the F(2,3) H component (via _G) and j the F(4,3) W component.
_M24 = np.einsum("ia,jb->ijab", _G, _G4).reshape(24, 9)

# Measured allowlist, same value tuple as _TABLE: (nb, ct, f32t, ck).
# Populated only where the TPU A/B beat BOTH XLA and the F(2x2) entry
# (tools/bench_winograd24.py); consulted before _TABLE by spatial_conv.
# Numerics bar (r5 adjudication, .audit_r05.jsonl
# f24_numerics_adjudication): vs fp32 truth at 36x64x640, f24's max
# error is 0.123 (0.99% of output scale) vs the bf16 XLA conv's own
# 0.077 (0.62%) — the scary 0.22 f24-vs-bf16 maxdelta was two
# same-order errors on opposite sides, so adoption follows the perf A/B.
_TABLE24 = {
    # winograd24_ab r4: f24_nb1_f32t 3.98 ms vs xla 4.419 / f22 4.24
    (36, 64, 640, 640): (1, 0, True, 0),
}

_WINOGRAD24 = os.environ.get("TC_WINOGRAD24", "1") != "0"


def table_entry24(h: int, w: int, cin: int, cout: int):
    if not (_WINOGRAD24 and _WINOGRAD):
        return None
    if h % 2 or w % 4:
        return None
    return _TABLE24.get((h, w, cin, cout))


def transform_kernel24(kernel):
    """(3,3,Cin,Cout) -> (24, Cin, Cout) via one (24,9) @ (9, Cin*Cout)
    matmul (see transform_kernel for why this form)."""
    c, co = kernel.shape[2], kernel.shape[3]
    g = kernel.astype(jnp.float32).reshape(9, c * co)
    return (jnp.asarray(_M24) @ g).reshape(24, c, co)


def winograd24_gn_silu_conv3x3(x, a, b, kernel, bias, res, silu: bool,
                               stats: bool):
    """F(2x4) twin of winograd_gn_silu_conv3x3 (same contract; caller
    must have checked table_entry24)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    cout = kernel.shape[-1]
    nb, ct, f32t, ck = _TABLE24[(h, w, c, cout)]
    while n % nb:
        nb //= 2
    ct = ct or cout
    ck = ck or c
    n_ct = cout // ct
    n_ck = c // ck
    th, tw4 = h // 2, w // 4
    nt = nb * th * tw4
    tdt = jnp.float32 if f32t else x.dtype
    residual = res is not None
    if not residual:
        res = jnp.zeros((1, 1, 1, ct), x.dtype)
    wt = transform_kernel24(kernel).astype(x.dtype)
    # shared prologue policy (_make_prologue); the F(4,3) input
    # transform runs in fp32 after the cast point either way
    prologue = _make_prologue(x.dtype, silu)

    def transform_in(zp):
        """(h+2, w+4, ck) fp32 padded slab -> 24 x (th*tw4, ck) tdt
        components, ordered i*6+j (i = H comp, j = W comp)."""
        A = zp[0:h].reshape(th, 2, w + 4, ck)
        B = zp[2:h + 2].reshape(th, 2, w + 4, ck)
        d0, d1 = A[:, 0], A[:, 1]
        d2, d3 = B[:, 0], B[:, 1]
        t = [d0 - d2, d1 + d2, d2 - d1, d1 - d3]   # F(2,3) rows
        u = []
        for ti in t:
            E = ti[:, 0:w].reshape(th, tw4, 4 * ck)
            F = ti[:, 4:w + 4].reshape(th, tw4, 4 * ck)
            e0, e1 = E[..., :ck], E[..., ck:2 * ck]
            e2, e3 = E[..., 2 * ck:3 * ck], E[..., 3 * ck:]
            f0, f1 = F[..., :ck], F[..., ck:2 * ck]
            # B^T rows of F(4,3) applied to taps [e0..e3, f0, f1]
            u += [4.0 * e0 - 5.0 * e2 + f0,
                  -4.0 * (e1 + e2) + e3 + f0,
                  4.0 * e1 - 4.0 * e2 - e3 + f0,
                  -2.0 * e1 - e2 + 2.0 * e3 + f0,
                  2.0 * e1 - e2 - 2.0 * e3 + f0,
                  4.0 * e1 - 5.0 * e3 + f1]
        return [ui.reshape(th * tw4, ck).astype(tdt) for ui in u]

    def tile_dots(x_ref, a_ref, b_ref, w_ref, i):
        us_all = []
        for s in range(nb):
            z = prologue(x_ref[s].astype(jnp.float32)
                         * a_ref[i * nb + s][None]
                         + b_ref[i * nb + s][None])
            zp = jnp.pad(z, ((1, 1), (1, 3), (0, 0)))
            us_all.append(transform_in(zp))
        us = [jnp.concatenate(parts, 0) for parts in zip(*us_all)] \
            if nb > 1 else us_all[0]
        m = [jax.lax.dot_general(
                us[j], w_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
             for j in range(24)]                   # (nt, ct) f32
        ys = []
        for vt in ([m[j] + m[6 + j] + m[12 + j] for j in range(6)],
                   [m[6 + j] - m[12 + j] - m[18 + j] for j in range(6)]):
            sm, df = vt[1] + vt[2], vt[1] - vt[2]
            sp, dq = vt[3] + vt[4], vt[3] - vt[4]
            ys += [vt[0] + sm + sp,
                   df + 2.0 * dq,
                   sm + 4.0 * sp,
                   df + 8.0 * dq + vt[5]]
        return tuple(ys)        # yt0..3, yb0..3

    def finish(ys, bias_ref, res_ref, o_ref, stat_refs):
        bias_v = bias_ref[0].astype(jnp.float32)
        dt = o_ref.dtype
        ys = [yi + bias_v for yi in ys]
        if residual:
            r = res_ref[...].reshape(nb * th, 2, w, ct)
            for row in range(2):
                rr = r[:, row].reshape(nb * th, tw4, 4 * ct)
                for j in range(4):
                    q = rr[..., j * ct:(j + 1) * ct] \
                        .reshape(nt, ct).astype(jnp.float32)
                    ys[row * 4 + j] = ys[row * 4 + j] + q
        top = jnp.concatenate([ys[j].astype(dt) for j in range(4)],
                              axis=-1).reshape(nb, th, 1, w, ct)
        bot = jnp.concatenate([ys[4 + j].astype(dt) for j in range(4)],
                              axis=-1).reshape(nb, th, 1, w, ct)
        ob = jnp.concatenate([top, bot], axis=2).reshape(nb, h, w, ct)
        o_ref[...] = ob
        if stats:
            of = ob.astype(jnp.float32).reshape(nb, h * w, ct)
            stat_refs[0][:, 0] = jnp.sum(of, axis=1)
            stat_refs[1][:, 0] = jnp.sum(of * of, axis=1)

    def kern_flat(x_ref, a_ref, b_ref, w_ref, bias_ref, res_ref, o_ref,
                  *stat_refs):
        ys = tile_dots(x_ref, a_ref, b_ref, w_ref, pl.program_id(0))
        finish(ys, bias_ref, res_ref, o_ref, stat_refs)

    def kern_ktiled(x_ref, a_ref, b_ref, w_ref, bias_ref, res_ref,
                    o_ref, *refs):
        acc_ref = refs[-1]
        stat_refs = refs[:-1]
        k = pl.program_id(2)
        ys = tile_dots(x_ref, a_ref, b_ref, w_ref, pl.program_id(0))
        for qi, yq in enumerate(ys):
            @pl.when(k == 0)
            def _init(qi=qi, yq=yq):
                acc_ref[qi] = yq

            @pl.when(k > 0)
            def _accum(qi=qi, yq=yq):
                acc_ref[qi] = acc_ref[qi] + yq

        @pl.when(k == n_ck - 1)
        def _finish():
            finish(tuple(acc_ref[qi] for qi in range(8)),
                   bias_ref, res_ref, o_ref, stat_refs)

    k_tiled = n_ck > 1
    if k_tiled:
        grid = (n // nb, n_ct, n_ck)
        ix = lambda i, j, k: (i, 0, 0, k)
        iab = lambda i, j, k: (0, k)
        iw = lambda i, j, k: (0, k, j)
        ibias = lambda i, j, k: (0, j)
        ires = lambda i, j, k: (i, 0, 0, j)
        ires0 = lambda i, j, k: (0, 0, 0, 0)
        iout = lambda i, j, k: (i, 0, 0, j)
        istat = lambda i, j, k: (i, 0, j)
        sem = ("parallel", "arbitrary", "arbitrary")
    elif n_ct > 1:
        grid = (n // nb, n_ct)
        ix = lambda i, j: (i, 0, 0, 0)
        iab = lambda i, j: (0, 0)
        iw = lambda i, j: (0, 0, j)
        ibias = lambda i, j: (0, j)
        ires = lambda i, j: (i, 0, 0, j)
        ires0 = lambda i, j: (0, 0, 0, 0)
        iout = lambda i, j: (i, 0, 0, j)
        istat = lambda i, j: (i, 0, j)
        sem = ("parallel", "arbitrary")
    else:
        grid = (n // nb,)
        ix = lambda i: (i, 0, 0, 0)
        iab = lambda i: (0, 0)
        iw = lambda i: (0, 0, 0)
        ibias = lambda i: (0, 0)
        ires = lambda i: (i, 0, 0, 0)
        ires0 = lambda i: (0, 0, 0, 0)
        iout = lambda i: (i, 0, 0, 0)
        istat = lambda i: (i, 0, 0)
        sem = ("parallel",)

    out_shape = [jax.ShapeDtypeStruct((n, h, w, cout), x.dtype)]
    out_specs = [pl.BlockSpec((nb, h, w, ct), iout)]
    if stats:
        for _ in range(2):
            out_shape.append(
                jax.ShapeDtypeStruct((n, 1, cout), jnp.float32))
            out_specs.append(pl.BlockSpec((nb, 1, ct), istat))

    out = pl.pallas_call(
        kern_ktiled if k_tiled else kern_flat,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, h, w, ck), ix),
            pl.BlockSpec((n, ck), iab),
            pl.BlockSpec((n, ck), iab),
            pl.BlockSpec((24, ck, ct), iw),
            pl.BlockSpec((1, ct), ibias),
            (pl.BlockSpec((nb, h, w, ct), ires) if residual
             else pl.BlockSpec((1, 1, 1, ct), ires0)),
        ],
        out_specs=out_specs if stats else out_specs[0],
        out_shape=out_shape if stats else out_shape[0],
        scratch_shapes=([pltpu.VMEM((8, nt, ct), jnp.float32)]
                        if k_tiled else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=sem,
            vmem_limit_bytes=108 * 1024 * 1024),  # 100M OOMed by 113K after the r5 prologue round-trip temp; v5e VMEM is 128M
        interpret=_INTERPRET,
    )(x, a, b, wt, bias.reshape(1, -1), res)
    if stats:
        y, s1, s2 = out
        return y, s1.reshape(n, cout), s2.reshape(n, cout)
    return out
