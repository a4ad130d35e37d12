"""Per-channel (s1, s2) sums over all non-batch, non-channel axes.

The GroupNorm statistics pass (s1 = sum(x), s2 = sum(x^2) per (N, C),
feeding `ops/norms.gn_affine_from_stats`) lowers through XLA as a
convert+square+reduce fusion that runs ~50x below HBM bandwidth on v5e
(measured 3.7 ms for a 52 MB slab that should take ~70 us —
tools/trace_fusions.py). This kernel reads x once, accumulates both sums
in VMEM, and emits spatial-tile partials that a tiny XLA sum folds to
(N, C) — the whole pass runs at memory speed.

PARKED, not wired into the model: A/B on the full UNet forward measured
the XLA inline sums EQUAL OR FASTER in context (285.7 ms vs 286.1 with
this kernel under gn_affine, 292.1 with it under the conv stats
epilogues) — the profiler attributes conv+reduce fusion time to the
reduce op, but XLA actually streams the stats out of the producing
fusion for free, and forcing a separate Pallas pass re-reads the
activation. The same held at decoder scale (full-res 16x320x512
slabs: 354.7 ms decode with inline sums vs 373.8 through this kernel) —
3 for 3, so treat trace-attributed "slow reduce" time as an artifact
and only trust end-to-end A/B. Kept for standalone-stats uses where no
producer exists.

Used by the fp32 GroupNorm rebuild of the reference's normalization
(`/root/reference/lvdm/basics.py:76-87`); the math is shared with every
GN in the model. Differentiable (custom_vjp recomputes through the jnp
formula).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INTERPRET = False

from tooncrafter_tpu.ops import _dispatch


def _on_tpu() -> bool:
    return _dispatch.on_tpu()


def _pick_stile(s: int, c: int, budget: int = 4 * 1024 * 1024) -> int:
    for st in (4096, 2048, 1024, 512, 320, 256, 160, 128, 64, 32, 16, 8):
        if s % st == 0 and 2 * st * c * 2 <= budget:
            return st
    return 0


def _use_kernel(s: int, c: int) -> bool:
    return (c % 128 in (0, 64) and s >= 256
            and _pick_stile(s, c) >= 8 and (_on_tpu() or _INTERPRET))


def _pallas_sums(x):
    """x: (N, S, C) -> s1, s2 (N, C) fp32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, s, c = x.shape
    st = _pick_stile(s, c)
    n_s = s // st

    def kernel(x_ref, s1_ref, s2_ref):
        xb = x_ref[0].astype(jnp.float32)            # (st, C)
        s1_ref[0, 0, 0] = jnp.sum(xb, axis=0)
        s2_ref[0, 0, 0] = jnp.sum(xb * xb, axis=0)

    s1, s2 = pl.pallas_call(
        kernel,
        grid=(n, n_s),
        in_specs=[pl.BlockSpec((1, st, c), lambda i, j: (i, j, 0))],
        out_specs=[
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n_s, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, n_s, 1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x)
    return jnp.sum(s1[:, :, 0], axis=1), jnp.sum(s2[:, :, 0], axis=1)


def _jnp_sums(x):
    axes = tuple(range(1, x.ndim - 1))
    s1 = jnp.sum(x, axis=axes, dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axes)
    return s1, s2


def _impl(x):
    n, c = x.shape[0], x.shape[-1]
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    if _use_kernel(s, c):
        s1, s2 = _pallas_sums(x.reshape(n, s, c))
        return s1, s2
    return _jnp_sums(x)


@jax.custom_vjp
def channel_sums(x):
    """(N, *spatial, C) -> per-channel fp32 sums (s1, s2), each (N, C)."""
    return _impl(x)


def _fwd(x):
    return channel_sums(x), x


def _bwd(x, g):
    g1, g2 = g
    bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    gx = (g1.reshape(bshape)
          + 2.0 * x.astype(jnp.float32) * g2.reshape(bshape))
    return (gx.astype(x.dtype),)


channel_sums.defvjp(_fwd, _bwd)
