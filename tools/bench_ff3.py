"""A/B the resident fused-FF kernel against a combined-dot variant.

Shipped kernel (ops/fused_ff.py:_pallas_ff) issues two dots per inner
chunk — xt @ w1[:, lo:hi] (h) and xt @ w1[:, d+lo:d+hi] (gate). Both
have K = C (320/640), N = dk; two half-width matmuls may pipeline worse
on the MXU than one full-width one. The variant pre-pairs the w1
columns per chunk ([h_chunk | gate_chunk] contiguous) so the kernel
runs ONE xt @ (C, 2*dk) dot and slices h/g from the f32 result in
registers. The column pairing is a pure weight transform; inside the
DDIM scan XLA hoists it (loop-invariant), so it costs nothing per step.

Usage: python tools/bench_ff3.py
"""
import functools
import time

import jax
import jax.numpy as jnp

from tooncrafter_tpu.ops import fused_ff
from tooncrafter_tpu.ops.fused_ff import _gelu_exact_f32

REPS = 20


def timeit(f, *a):
    float(jnp.mean(f(*a).astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(f(*a).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS


def scan_of(fn):
    @jax.jit
    def f(x, *w):
        def step(c, _):
            return fn(c, *w).astype(c.dtype), jnp.float32(0)
        c, _ = jax.lax.scan(step, x, None, length=REPS)
        return c
    return f


def _pallas_ff_combined(x2, w1, b1, w2, b2, tn, dk):
    """w1 pre-paired per chunk: (C, n_chunks*2*dk) with
    [h_j | g_j] contiguous; b1 likewise (1, n_chunks*2*dk)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x2.shape
    d, cout = w2.shape
    n_chunks = d // dk
    cdt = x2.dtype

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        xt = x_ref[...]
        acc = jnp.zeros((tn, cout), jnp.float32)
        for j in range(n_chunks):
            lo = j * 2 * dk
            hg = jax.lax.dot_general(
                xt, w1_ref[:, lo:lo + 2 * dk], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h = (hg[:, :dk].astype(cdt)
                 + b1_ref[0, lo:lo + dk]).astype(jnp.float32)
            g = (hg[:, dk:].astype(cdt)
                 + b1_ref[0, lo + dk:lo + 2 * dk]).astype(jnp.float32)
            m = (h * _gelu_exact_f32(g)).astype(cdt)
            acc = acc + jax.lax.dot_general(
                m, w2_ref[j * dk:(j + 1) * dk, :],
                (((1,), (0,)), ((), ())),
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
    )(x2, w1, b1, w2, b2)


def pair_cols(w1, b1, d, dk):
    """(C,2D)->(C, n_chunks*2*dk) with per-chunk [h|g] contiguous."""
    parts, bparts = [], []
    for j in range(d // dk):
        parts += [w1[:, j * dk:(j + 1) * dk],
                  w1[:, d + j * dk:d + (j + 1) * dk]]
        bparts += [b1[j * dk:(j + 1) * dk],
                   b1[d + j * dk:d + (j + 1) * dk]]
    return jnp.concatenate(parts, 1), jnp.concatenate(bparts, 0)


def run_site(name, n, c):
    d = 4 * c
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (n, c), jnp.bfloat16)
    sc = c ** -0.5 * 0.5
    w1 = jax.random.normal(ks[1], (c, 2 * d), jnp.bfloat16) * sc
    b1 = jax.random.normal(ks[2], (2 * d,), jnp.bfloat16) * 0.01
    w2 = jax.random.normal(ks[3], (d, c), jnp.bfloat16) * sc
    b2 = jax.random.normal(ks[4], (c,), jnp.bfloat16) * 0.01
    tflop = 24 * n * c * c / 1e12

    t0 = timeit(scan_of(lambda x_, *w: fused_ff.fused_geglu_ff(x_, *w)),
                x, w1, b1, w2, b2)
    print(f"[{name}] shipped          : {t0*1e3:7.3f} ms "
          f"({tflop/t0:5.0f} TF/s)", flush=True)

    for tn in (512, 1024, 2048):
        if n % tn:
            continue
        for dk in (1280, 640):
            if d % dk:
                continue
            w1p, b1p = pair_cols(w1, b1, d, dk)
            fn = functools.partial(_pallas_ff_combined, tn=tn, dk=dk)
            try:
                jax.clear_caches()
                t = timeit(scan_of(
                    lambda x_, *w: fn(x_, w[0], w[1][None], w[2],
                                      w[3][None])),
                    x, w1p, b1p, w2, b2)
                print(f"[{name}] combined tn={tn:4d} dk={dk:4d}: "
                      f"{t*1e3:7.3f} ms ({tflop/t:5.0f} TF/s)",
                      flush=True)
            except Exception as e:
                print(f"[{name}] combined tn={tn} dk={dk}: FAIL "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)





def _pallas_ff_nogate(x2, w1, b1, w2, b2, tn, dk):
    """Diagnostic: same dots, gate replaced by identity (m = h bf16).
    Measures the MXU-only share to expose VPU-bound behavior."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x2.shape
    d, cout = w2.shape
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
            m = (h + g).astype(cdt)  # keep both dots live, no gate math
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
    )(x2, w1, b1, w2, b2)


def _pallas_ff_bf16gate(x2, w1, b1, w2, b2, tn, dk):
    """Diagnostic: gate math in bf16 (poly erf on bf16 values)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x2.shape
    d, cout = w2.shape
    n_chunks = d // dk
    cdt = x2.dtype

    def gelu_bf16(x):
        s = jnp.sign(x)
        ax = jnp.abs(x)
        t = 1.0 / (1.0 + 0.3275911 * ax)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
        erf = s * (1.0 - poly * jnp.exp(-ax * ax))
        return 0.5 * x * (1.0 + erf)

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
            hb = h.astype(cdt) + b1_ref[0, lo:hi]
            gb = g.astype(cdt) + b1_ref[0, d + lo:d + hi]
            m = hb * gelu_bf16(gb * jnp.bfloat16(0.7071067811865476)
                               * jnp.bfloat16(1.4142135623730951))
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
    )(x2, w1, b1, w2, b2)


_PC = (1.1282844095e+00, -3.7536556840e-01, 1.1113086365e-01,
       -2.5126977281e-02, 4.2413245154e-03, -5.1180644133e-04,
       4.1109379643e-05, -1.9457420262e-06, 4.0719611260e-08)


def _erf_poly_f32(x):
    """Odd poly erf on clamped [-3,3]; |err|<=1.9e-5 (vs bf16 eps 7.8e-3).
    No exp / reciprocal / sign — pure fma chain on the VPU."""
    u = jnp.clip(x, -3.0, 3.0)
    s = u * u
    p = _PC[8]
    for c_ in _PC[7::-1]:
        p = p * s + c_
    return u * p


def _pallas_ff_polygate(x2, w1, b1, w2, b2, tn, dk):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x2.shape
    d, cout = w2.shape
    n_chunks = d // dk
    cdt = x2.dtype

    def gelu(x):
        return 0.5 * x * (1.0 + _erf_poly_f32(x * 0.7071067811865476))

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
            h = (h.astype(cdt) + b1_ref[0, lo:hi]).astype(jnp.float32)
            g = (g.astype(cdt) + b1_ref[0, d + lo:d + hi]) \
                .astype(jnp.float32)
            m = (h * gelu(g)).astype(cdt)
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
    )(x2, w1, b1, w2, b2)


def run_diag(name, n, c):
    d = 4 * c
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (n, c), jnp.bfloat16)
    sc = c ** -0.5 * 0.5
    w1 = jax.random.normal(ks[1], (c, 2 * d), jnp.bfloat16) * sc
    b1 = jax.random.normal(ks[2], (2 * d,), jnp.bfloat16) * 0.01
    w2 = jax.random.normal(ks[3], (d, c), jnp.bfloat16) * sc
    b2 = jax.random.normal(ks[4], (c,), jnp.bfloat16) * 0.01
    tflop = 24 * n * c * c / 1e12
    for label, impl in (("nogate", _pallas_ff_nogate),
                        ("polygate", _pallas_ff_polygate)):
        fn = functools.partial(impl, tn=512, dk=min(d, 1280))
        jax.clear_caches()
        t = timeit(scan_of(
            lambda x_, *w: fn(x_, w[0], w[1][None], w[2], w[3][None])),
            x, w1, b1, w2, b2)
        print(f"[{name}] {label:8s}        : {t*1e3:7.3f} ms "
              f"({tflop/t:5.0f} TF/s)", flush=True)


if __name__ == "__main__":
    import sys
    if "--diag" in sys.argv:
        run_diag("ds1 C=320 N=81920", 81920, 320)
        run_diag("ds2 C=640 N=20480", 20480, 640)
    else:
        run_site("ds1 C=320 N=81920", 81920, 320)
        run_site("ds2 C=640 N=20480", 20480, 640)
