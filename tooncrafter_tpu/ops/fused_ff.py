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

The inner dim is processed in chunks of <=1280 columns (h-half and
gate-half sliced from the same resident w1) with a float32 accumulator
for the out-GEMM, so the per-tile VMEM footprint stays bounded at
C=640. C=1280 (ds4) stays on XLA — its weights alone (39 MB) exceed
VMEM and its token count is small.

Rounding mimics the unfused flax path (bf16 Dense outputs, f32 gelu):
h and g are rounded to the compute dtype before gating, the gate runs
in f32, and the product is rounded back before the out-GEMM.

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
_CHUNK = 1280  # max inner-dim columns handled per in-kernel GEMM pair


def _on_tpu() -> bool:
    return _dispatch.on_tpu()


def _vmem_estimate(tn: int, c: int, d: int, dk: int) -> int:
    weights = c * 2 * d * 2 + d * c * 2            # w1 + w2, bf16
    io = 2 * (tn * c * 2) * 2                      # x + y, double-buffered
    chunk = 2 * tn * dk * 4 + tn * dk * 2          # h, g f32 + m bf16
    acc = tn * c * 4
    return weights + io + chunk + acc


def _pick_tile(n: int, c: int, d: int,
               budget: int = 13 * 1024 * 1024) -> int:
    dk = min(d, _CHUNK)
    if d % dk:
        return 0
    for tn in (512, 256, 128):
        if n % tn == 0 and _vmem_estimate(tn, c, d, dk) <= budget:
            return tn
    return 0


def use_kernel(n: int, c: int, d: int, cout: int | None = None) -> bool:
    """n tokens, c model width, d inner (pre-gate) width, cout output
    width (defaults to c)."""
    cout = c if cout is None else cout
    return (c % 128 in (0, 64) and cout % 128 in (0, 64) and d % 128 == 0
            and _pick_tile(n, max(c, cout), d) > 0
            and (_on_tpu() or _INTERPRET))


def _erf_f32(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |err| <= 1.5e-7 in f32
    (Mosaic has no erf/erfc lowering; this is exact to well below bf16
    resolution). x: f32."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact_f32(x):
    return 0.5 * x * (1.0 + _erf_f32(x * 0.7071067811865476))


def _pallas_ff(x2, w1, b1, w2, b2):
    """x2: (N, C); w1: (C, 2D) = [h | gate] halves; b1: (1, 2D);
    w2: (D, Cout); b2: (1, Cout). Returns (N, Cout)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x2.shape
    d, cout = w2.shape
    tn = _pick_tile(n, max(c, cout), d)
    dk = min(d, _CHUNK)
    n_chunks = d // dk
    cdt = x2.dtype

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        xt = x_ref[...]
        acc = jnp.zeros((tn, cout), jnp.float32)
        for j in range(n_chunks):
            lo, hi = j * dk, (j + 1) * dk
            h = jax.lax.dot_general(
                xt, w1_ref[:, lo:hi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            g = jax.lax.dot_general(
                xt, w1_ref[:, d + lo:d + hi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # round like the unfused bf16 Dense outputs, gate in f32
            h = (h.astype(cdt) + b1_ref[0, lo:hi]).astype(jnp.float32)
            g = (g.astype(cdt) + b1_ref[0, d + lo:d + hi]) \
                .astype(jnp.float32)
            m = (h * _gelu_exact_f32(g)).astype(cdt)
            acc = acc + jax.lax.dot_general(
                m, w2_ref[lo:hi, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[...] = acc.astype(cdt) + b2_ref[0]

    return pl.pallas_call(
        kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, c), lambda i: (i, 0)),
            pl.BlockSpec((c, 2 * d), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * d), lambda i: (0, 0)),
            pl.BlockSpec((d, cout), lambda i: (0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tn, cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, cout), cdt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x2, w1, b1, w2, b2)


def _xla_ff(x, w1, b1, w2, b2):
    """Differentiable reference form, same dtype semantics as the
    unfused flax path (bf16 dots, f32 gelu)."""
    a = jnp.dot(x, w1) + b1[0]
    h, g = jnp.split(a, 2, axis=-1)
    m = (h.astype(jnp.float32)
         * jax.nn.gelu(g.astype(jnp.float32), approximate=False)
         ).astype(x.dtype)
    return jnp.dot(m, w2) + b2[0]


def _impl(x, w1, b1, w2, b2):
    c = x.shape[-1]
    n = x.size // c
    d = w2.shape[0]
    if use_kernel(n, c, d):
        y2 = _pallas_ff(x.reshape(n, c), w1, b1, w2, b2)
        return y2.reshape(x.shape[:-1] + (w2.shape[1],))
    return _xla_ff(x, w1, b1, w2, b2)


@jax.custom_vjp
def _ff(x, w1, b1, w2, b2):
    return _impl(x, w1, b1, w2, b2)


def _ff_fwd(x, w1, b1, w2, b2):
    return _ff(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _ff_bwd(saved, gy):
    x, w1, b1, w2, b2 = saved
    _, vjp = jax.vjp(_xla_ff, x, w1, b1, w2, b2)
    return vjp(gy)


_ff.defvjp(_ff_fwd, _ff_bwd)


def fused_geglu_ff(x, w1, b1, w2, b2):
    """y = (h * gelu(g)) @ w2 + b2 with [h | g] = x @ w1 + b1.

    x: (..., C); w1: (C, 2D); b1: (2D,); w2: (D, C'); b2: (C',).
    Dispatches to the Pallas kernel on TPU when the shape fits
    (`use_kernel`); falls back to the XLA form otherwise.
    """
    return _ff(x, w1, b1[None], w2, b2[None])
