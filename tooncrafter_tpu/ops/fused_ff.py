"""Fused GEGLU feed-forward: proj -> gate -> out-GEMM in one kernel.

Rebuilds the transformer FeedForward of the reference UNet
(/root/reference/lvdm/modules/attention.py:51-74: GEGLU proj to 2*4*C,
erf-gelu gate, Linear back to C) as a single Pallas kernel.

Why: on v5e the XLA lowering materializes the 8*C-wide GEGLU
projection in HBM — at the UNet's ds1 level that is a bf16
[2,2560,16,2560] tensor, 419 MB written once and read back by BOTH the
ff-out dot and (via kOutput fusion duplication) the downstream
transformer proj_out fusion. tools/roofline.py attributes ~30 ms/step
of the 99 ms/step above-roofline waste to this complex. The kernel
streams token tiles through VMEM: the wide intermediate never touches
HBM, weights stay resident across the grid, and x / y cross HBM exactly
once — traffic per ds1 FF site drops from ~1 GB to ~107 MB.

The inner dim is processed in chunks of <=1280 columns with a float32
accumulator for the out-GEMM, so the per-tile VMEM footprint stays
bounded at C=640. w1's columns are pre-interleaved per chunk
([h0|g0|h1|g1|...], `_hg_reorder`) so each chunk is ONE N=2*dk proj
dot followed by two register-aligned f32 slices instead of two N=dk
dots — measured -5/-7/-6% at ds1/ds2/ds4 (tools/bench_ff8.py `hgm`,
.audit_r04.jsonl; manual software pipelining and shorter erf polys
were neutral-to-negative in the same sweep). At C=1280 (ds4) the weights alone (39 MB) exceed VMEM, so a
second, streamed variant runs a 2-D grid (token tiles x inner chunks):
weight chunks are streamed from HBM per grid step while the output
tile accumulates in VMEM — weights cross HBM once per token tile, and
the 10240-wide intermediate (105 MB per ds4 site, written + re-read
twice by the XLA lowering via kOutput fusion duplication) never
materializes. Token tiles are chosen as large as VMEM allows so the
weight streaming amortizes.

Optionally the kernel folds the preceding LayerNorm (norm3 of the
transformer block, reference attention.py:236-247) as a prologue: row
statistics of the token tile are computed in-register (f32, matching
ops/norms.LayerNorm exactly), saving the standalone normalize
read+write pass over the activation at every FF site.

Rounding: the proj dots accumulate f32, the bias add and gate run in
f32, and only the gated product is rounded to the compute dtype before
the out-GEMM — a strict precision superset of both the unfused flax
path (bf16 Dense outputs) and torch-autocast's half-precision gelu.
The earlier bf16 round-trip before the gate (mimicking unfused Dense
outputs bit-for-bit) cost two extra VPU passes per element for no
accuracy benefit — A/B'd as `fastround` in tools/bench_ff5.py
(.audit_r03.jsonl: ds1 3.24→3.02 ms with the dk split below).

Backward recomputes through the differentiable XLA form (house pattern,
see ops/temporal_conv.py) so the Pallas forward stays a leaf.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from tooncrafter_tpu.ops import _dispatch

_INTERPRET = False
# Max inner-dim columns per in-kernel GEMM pair. 640 (vs the VMEM-fit
# 1280) splits the resident kernel into chunks so chunk j+1's proj dots
# are issueable while chunk j's gate runs on the VPU — measured best at
# both resident widths (tools/bench_ff5.py: ds1 dk640 3.16 vs dk1280
# 3.24 ms, ds2 dk640 2.34 vs 2.50 with fastround).
_CHUNK = 640


def _on_tpu() -> bool:
    return _dispatch.on_tpu()


def _vmem_estimate(tn: int, c: int, d: int, dk: int) -> int:
    weights = c * 2 * d * 2 + d * c * 2            # w1 + w2, bf16
    io = 2 * (tn * c * 2) * 2                      # x + y, double-buffered
    chunk = 2 * tn * dk * 4 + tn * dk * 2          # h, g f32 + m bf16
    acc = tn * c * 4
    return weights + io + chunk + acc


def _pick_tile(n: int, c: int, d: int,
               budget: int = 26 * 1024 * 1024) -> int:
    dk = min(d, _CHUNK)
    if d % dk:
        return 0
    # per-width preference from the round-3 tile sweep on the real UNet
    # shapes (tools/bench_ff4.py, .audit_r03.jsonl): C=320 runs best at
    # tn=256 (3.015 vs 3.227 ms at tn=512), C=640 at tn=512
    order = {320: (256, 512, 128), 640: (512, 256, 128)}.get(
        c, (512, 256, 128))
    for tn in order:
        if n % tn == 0 and _vmem_estimate(tn, c, d, dk) <= budget:
            return tn
    return 0


def _vmem_estimate_streamed(tn: int, c: int, d: int, dk: int) -> int:
    # weight chunks double-buffered across grid steps; x/out tiles and
    # the f32 accumulator are revisited (constant index along the chunk
    # axis), h/g/m live in registers/scratch per chunk
    wchunks = (2 * c * dk * 2 + dk * c * 2) * 2    # w1h + w1g + w2, db
    io = tn * c * 2 * 2                            # x + y tiles
    chunk = 2 * tn * dk * 4 + tn * dk * 2          # h, g f32 + m bf16
    acc = tn * c * 4
    return wchunks + io + chunk + acc


def _pick_tile_streamed(n: int, c: int, d: int,
                        budget: int = 72 * 1024 * 1024):
    """(tn, dk) for the streamed variant. Token tiles as LARGE as fit:
    weight traffic is (n/tn) * |w|, so big tiles amortize streaming."""
    # round-3 sweep note (tools/bench_ff4.py): (2560, 2560) measured
    # best standalone at the ds4 shape (2.440 vs 2.48-2.56 ms) but OOMs
    # scoped VMEM in the real loop context (111.7M > 103.1M limit) —
    # the conservative estimate below is what keeps in-context compiles
    # safe; don't special-case past it.
    for tn in (2560, 2048, 1280, 1024, 512):
        if n % tn:
            continue
        for dk in (1280, 640, 512, 256, 128):
            if d % dk:
                continue
            if _vmem_estimate_streamed(tn, c, d, dk) <= budget:
                return tn, dk
    return 0, 0


def _mode(n: int, c: int, d: int, cout: int):
    if not (c % 128 in (0, 64) and cout % 128 in (0, 64) and d % 128 == 0):
        return None
    if _pick_tile(n, max(c, cout), d) > 0:
        return "resident"
    if _pick_tile_streamed(n, max(c, cout), d)[0] > 0:
        return "streamed"
    return None


def use_kernel(n: int, c: int, d: int, cout: int | None = None) -> bool:
    """n tokens, c model width, d inner (pre-gate) width, cout output
    width (defaults to c)."""
    cout = c if cout is None else cout
    return (_mode(n, c, d, cout) is not None
            and (_on_tpu() or _INTERPRET))


_ERF_COEF = (1.1278945436e+00, -3.7322828233e-01, 1.0771515983e-01,
             -2.2684729338e-02, 3.3184852980e-03, -3.1456988240e-04,
             1.7158381492e-05, -4.0550414519e-07)


def _erf_f32(x):
    """Odd-polynomial erf on the clamped range [-3, 3]:
    erf(u) ~ u * P(u^2), deg-15, |err| <= 8.1e-5 (Lawson-weighted LS
    toward minimax; 1-erf(3) = 2.2e-5, so the clamp adds at most 2.2e-5
    in the saturated tail). ~50x below the bf16 round of the gated
    product, and unlike A&S 7.1.26 it needs no exp / reciprocal / sign —
    a pure fma chain on the VPU. Two fmas shorter than the round-2
    deg-19 fit (same accuracy class at bf16 output; tools/bench_ff5.py
    measured the shorter poly worth ~0.15 ms at the ds1 site).
    Mosaic has no native erf lowering. x: f32."""
    u = jnp.clip(x, -3.0, 3.0)
    s = u * u
    p = _ERF_COEF[-1]
    for c_ in _ERF_COEF[-2::-1]:
        p = p * s + c_
    return u * p


def _gelu_exact_f32(x):
    return 0.5 * x * (1.0 + _erf_f32(x * 0.7071067811865476))


def _hg_reorder(w1, b1, d: int, dk: int):
    """(C, 2D) [h | g] halves -> chunk-interleaved [h0|g0|h1|g1|...]
    so the kernels read one contiguous (C, 2*dk) column block per
    chunk. Loop-invariant in the sampling scan (LICM hoists it); the
    kernels slice h/g back out of the f32 proj output at aligned
    offsets."""
    c = w1.shape[0]
    n_chunks = d // dk
    wh = w1[:, :d].reshape(c, n_chunks, 1, dk)
    wg = w1[:, d:].reshape(c, n_chunks, 1, dk)
    w = jnp.concatenate([wh, wg], 2).reshape(c, 2 * d)
    bh = b1[:, :d].reshape(1, n_chunks, 1, dk)
    bg = b1[:, d:].reshape(1, n_chunks, 1, dk)
    b = jnp.concatenate([bh, bg], 2).reshape(1, 2 * d)
    return w, b


def _ln_tile(xt, lnw_ref, lnb_ref, eps):
    """In-register LayerNorm over the minor axis of a token tile;
    f32 math identical to ops/norms.LayerNorm."""
    xf = xt.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * lnw_ref[0].astype(jnp.float32) \
        + lnb_ref[0].astype(jnp.float32)
    return out.astype(xt.dtype)


def _pallas_ff(x2, w1, b1, w2, b2, lnw, lnb, eps, residual=False):
    """x2: (N, C); w1: (C, 2D) = [h | gate] halves; b1: (1, 2D);
    w2: (D, Cout); b2: (1, Cout); lnw/lnb: (1, C) f32 LayerNorm affine
    (pass None to skip the LN prologue). Returns (N, Cout).
    residual=True (requires the LN prologue and Cout==C) adds the raw
    input tile to the output — the transformer block's `ff(ln(x)) + x`
    in one kernel, saving the standalone add pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x2.shape
    d, cout = w2.shape
    tn = _pick_tile(n, max(c, cout), d)
    dk = min(d, _CHUNK)
    n_chunks = d // dk
    cdt = x2.dtype
    has_ln = lnw is not None
    assert not residual or (has_ln and cout == c)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest):
        o_ref = rest[-1]
        xt = xr = x_ref[...]
        if has_ln:
            xt = _ln_tile(xt, rest[0], rest[1], eps)
        acc = jnp.zeros((tn, cout), jnp.float32)
        for j in range(n_chunks):
            lo, hi = j * dk, (j + 1) * dk
            # one N=2*dk dot per chunk (w1 chunk-interleaved by
            # _hg_reorder); h/g come back as aligned f32 slices
            hg = jax.lax.dot_general(
                xt, w1_ref[:, 2 * lo:2 * hi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # f32 bias + gate; only the product rounds to compute dtype
            h = hg[:, :dk] + b1_ref[0, 2 * lo:2 * lo + dk].astype(
                jnp.float32)
            g = hg[:, dk:] + b1_ref[0, 2 * lo + dk:2 * hi].astype(
                jnp.float32)
            m = (h * _gelu_exact_f32(g)).astype(cdt)
            acc = acc + jax.lax.dot_general(
                m, w2_ref[lo:hi, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        y = acc.astype(cdt) + b2_ref[0]
        o_ref[...] = y + xr if residual else y

    w1r, b1r = _hg_reorder(w1, b1, d, dk)
    in_specs = [
        pl.BlockSpec((tn, c), lambda i: (i, 0)),
        pl.BlockSpec((c, 2 * d), lambda i: (0, 0)),
        pl.BlockSpec((1, 2 * d), lambda i: (0, 0)),
        pl.BlockSpec((d, cout), lambda i: (0, 0)),
        pl.BlockSpec((1, cout), lambda i: (0, 0)),
    ]
    args = [x2, w1r, b1r, w2, b2]
    if has_ln:
        in_specs += [pl.BlockSpec((1, c), lambda i: (0, 0)),
                     pl.BlockSpec((1, c), lambda i: (0, 0))]
        args += [lnw, lnb]
    return pl.pallas_call(
        kernel,
        grid=(n // tn,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tn, cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, cout), cdt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(*args)


def _pallas_ff_streamed(x2, w1, b1, w2, b2, lnw, lnb, eps,
                        residual=False):
    """Streamed-weights variant for widths whose weights exceed VMEM
    (ds4, C=1280, |w| = 39 MB): 2-D grid over (token tiles, inner
    chunks). w1 is chunk-interleaved (`_hg_reorder`) so each grid step
    streams ONE contiguous [h_j | g_j] column block; the output tile
    accumulates in a VMEM scratch across the chunk axis and is written
    once."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x2.shape
    d, cout = w2.shape
    tn, dk = _pick_tile_streamed(n, max(c, cout), d)
    n_chunks = d // dk
    cdt = x2.dtype
    has_ln = lnw is not None
    assert not residual or (has_ln and cout == c)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest):
        o_ref, acc_ref = rest[-2], rest[-1]
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xt = x_ref[...]
        if has_ln:
            xt = _ln_tile(xt, rest[0], rest[1], eps)
        hg = jax.lax.dot_general(
            xt, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = hg[:, :dk] + b1_ref[0, :dk].astype(jnp.float32)
        g = hg[:, dk:] + b1_ref[0, dk:].astype(jnp.float32)
        m = (h * _gelu_exact_f32(g)).astype(cdt)
        acc_ref[:] += jax.lax.dot_general(
            m, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == n_chunks - 1)
        def _():
            y = acc_ref[:].astype(cdt) + b2_ref[0]
            o_ref[...] = y + x_ref[...] if residual else y

    w1r, b1r = _hg_reorder(w1, b1, d, dk)
    in_specs = [
        pl.BlockSpec((tn, c), lambda i, j: (i, 0)),
        pl.BlockSpec((c, 2 * dk), lambda i, j: (0, j)),   # [h_j | g_j]
        pl.BlockSpec((1, 2 * dk), lambda i, j: (0, j)),
        pl.BlockSpec((dk, cout), lambda i, j: (j, 0)),
        pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
    ]
    args = [x2, w1r, b1r, w2, b2]
    if has_ln:
        in_specs += [pl.BlockSpec((1, c), lambda i, j: (0, 0)),
                     pl.BlockSpec((1, c), lambda i, j: (0, 0))]
        args += [lnw, lnb]
    return pl.pallas_call(
        kernel,
        grid=(n // tn, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tn, cout), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, cout), cdt),
        scratch_shapes=[pltpu.VMEM((tn, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(*args)


def _xla_ff(x, w1, b1, w2, b2):
    """Differentiable reference form, same dtype semantics as the
    kernel (f32-accumulated dots + f32 bias/gate, product rounded to
    the compute dtype)."""
    a = jnp.dot(x, w1, preferred_element_type=jnp.float32) \
        + b1[0].astype(jnp.float32)
    h, g = jnp.split(a, 2, axis=-1)
    m = (h * jax.nn.gelu(g, approximate=False)).astype(x.dtype)
    return jnp.dot(m, w2) + b2[0]


def _xla_ln(x, lnw, lnb, eps):
    """Differentiable LayerNorm matching ops/norms.LayerNorm."""
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    out = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    out = out * lnw[0].astype(jnp.float32) + lnb[0].astype(jnp.float32)
    return out.astype(x.dtype)


def _dispatch_ff(x, w1, b1, w2, b2, lnw, lnb, eps, residual=False):
    c = x.shape[-1]
    n = x.size // c
    d = w2.shape[0]
    mode = _mode(n, c, d, w2.shape[1]) if (_on_tpu() or _INTERPRET) \
        else None
    if mode is not None:
        fn = _pallas_ff if mode == "resident" else _pallas_ff_streamed
        y2 = fn(x.reshape(n, c), w1, b1, w2, b2, lnw, lnb, eps,
                residual=residual)
        return y2.reshape(x.shape[:-1] + (w2.shape[1],))
    z = _xla_ln(x, lnw, lnb, eps) if lnw is not None else x
    y = _xla_ff(z, w1, b1, w2, b2)
    return y + x if residual else y


@jax.custom_vjp
def _ff(x, w1, b1, w2, b2):
    return _dispatch_ff(x, w1, b1, w2, b2, None, None, 0.0)


def _ff_fwd(x, w1, b1, w2, b2):
    return _ff(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _ff_bwd(saved, gy):
    x, w1, b1, w2, b2 = saved
    _, vjp = jax.vjp(_xla_ff, x, w1, b1, w2, b2)
    return vjp(gy)


_ff.defvjp(_ff_fwd, _ff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _ff_ln(x, w1, b1, w2, b2, lnw, lnb, eps, residual):
    return _dispatch_ff(x, w1, b1, w2, b2, lnw, lnb, eps,
                        residual=residual)


def _ff_ln_fwd(x, w1, b1, w2, b2, lnw, lnb, eps, residual):
    return (_ff_ln(x, w1, b1, w2, b2, lnw, lnb, eps, residual),
            (x, w1, b1, w2, b2, lnw, lnb))


def _ff_ln_bwd(eps, residual, saved, gy):
    x, w1, b1, w2, b2, lnw, lnb = saved

    def ref(x_, w1_, b1_, w2_, b2_, lnw_, lnb_):
        y = _xla_ff(_xla_ln(x_, lnw_, lnb_, eps), w1_, b1_, w2_, b2_)
        return y + x_ if residual else y

    _, vjp = jax.vjp(ref, x, w1, b1, w2, b2, lnw, lnb)
    return vjp(gy)


_ff_ln.defvjp(_ff_ln_fwd, _ff_ln_bwd)


def fused_geglu_ff(x, w1, b1, w2, b2, ln_w=None, ln_b=None,
                   ln_eps: float = 1e-5, residual: bool = False):
    """y = (h * gelu(g)) @ w2 + b2 with [h | g] = LN?(x) @ w1 + b1.

    x: (..., C); w1: (C, 2D); b1: (2D,); w2: (D, C'); b2: (C',).
    When ln_w/ln_b (C,) are given, a LayerNorm prologue (eps=ln_eps,
    semantics of ops/norms.LayerNorm) is folded into the kernel.
    residual=True (LN prologue + C'==C only) additionally adds x to the
    output — the transformer block's `ff(ln(x)) + x` without the
    standalone add pass. Dispatches to a Pallas kernel on TPU when the
    shape fits (`use_kernel`) — resident weights for C<=640, streamed
    weight chunks at C=1280; falls back to the XLA form otherwise.
    """
    if ln_w is None:
        assert not residual
        return _ff(x, w1, b1[None], w2, b2[None])
    return _ff_ln(x, w1, b1[None], w2, b2[None], ln_w[None], ln_b[None],
                  ln_eps, residual)
