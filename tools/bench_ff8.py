"""Round-4 fused-FF variants: pipelining, h/g dot merge, shorter gates.

bench_ff7 attribution (r3): gate GEMM 0.5 ms (real FLOPs), erf chain
~0.3 ms, and the XLA dots floor is itself ~70 TF/s standalone — so
standalone numbers are RELATIVE only. Candidates here:

  p13 / p11   shorter odd-poly erf fits on [-3,3]:
              deg-13 |err| 3.6e-4 (safely under the bf16 product round
              ~2e-3), deg-11 |err| 1.5e-3 (borderline) — one/two fmas
              shorter than the shipped deg-15.
  estrin      deg-15 with Estrin evaluation: same fma count, half the
              dependency depth (tests whether the VPU is latency-bound)
  pipe        manual software pipeline: chunk j's MXU dots issue before
              chunk j-1's gate/out, so the erf VPU chain hides under
              the next chunk's GEMMs
  hgm         w1 columns pre-reordered [h0|g0|h1|g1|...] so each chunk
              is ONE N=2*dk dot + two aligned slices instead of two
              N=dk dots
  pipe_hgm_p13  combination

Usage: python tools/bench_ff8.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 20
OUT = "/root/repo/.audit_r04.jsonl"

C15 = (1.1278945436e+00, -3.7322828233e-01, 1.0771515983e-01,
       -2.2684729338e-02, 3.3184852980e-03, -3.1456988240e-04,
       1.7158381492e-05, -4.0550414519e-07)
C13 = (1.126465071, -0.366946308, 0.0998442259, -0.0183782106,
       0.0021170387, -0.0001359406, 3.6826e-06)
C11 = (1.1215464575, -0.3505217706, 0.0844830275, -0.0122979617,
       0.0009569337, -3.032e-05)


def _erf(x, coef, estrin=False):
    u = jnp.clip(x, -3.0, 3.0)
    s = u * u
    if estrin:
        c = coef
        s2 = s * s
        s4 = s2 * s2
        p = ((c[0] + c[1] * s) + (c[2] + c[3] * s) * s2) \
            + (((c[4] + c[5] * s) + (c[6] + c[7] * s) * s2) * s4)
        return u * p
    p = coef[-1]
    for c_ in coef[-2::-1]:
        p = p * s + c_
    return u * p


def _gelu(x, coef, estrin=False):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476, coef, estrin))


def _ln_tile(xt, lnw_ref, lnb_ref, eps):
    xf = xt.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * lnw_ref[0].astype(jnp.float32)
            + lnb_ref[0].astype(jnp.float32)).astype(xt.dtype)


def make_fn(n, c, d, cout, tn, dk, variant):
    n_chunks = d // dk
    coef = C13 if "p13" in variant else (C11 if "p11" in variant else C15)
    estrin = "estrin" in variant
    pipe = "pipe" in variant
    hgm = "hgm" in variant

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lnw, lnb, o_ref):
        cdt = x_ref.dtype
        xt = xr = x_ref[...]
        xt = _ln_tile(xt, lnw, lnb, 1e-5)
        acc = jnp.zeros((tn, cout), jnp.float32)

        def dots(j):
            lo, hi = j * dk, (j + 1) * dk
            if hgm:
                hg = jax.lax.dot_general(
                    xt, w1_ref[:, 2 * lo:2 * hi],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                h, g = hg[:, :dk], hg[:, dk:]
                h = h + b1_ref[0, 2 * lo:2 * lo + dk].astype(jnp.float32)
                g = g + b1_ref[0, 2 * lo + dk:2 * hi].astype(jnp.float32)
            else:
                h = jax.lax.dot_general(
                    xt, w1_ref[:, lo:hi], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                g = jax.lax.dot_general(
                    xt, w1_ref[:, d + lo:d + hi], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                h = h + b1_ref[0, lo:hi].astype(jnp.float32)
                g = g + b1_ref[0, d + lo:d + hi].astype(jnp.float32)
            return h, g

        def tail(h, g, j):
            m = (h * _gelu(g, coef, estrin)).astype(cdt)
            return jax.lax.dot_general(
                m, w2_ref[j * dk:(j + 1) * dk, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if pipe:
            prev = dots(0)
            for j in range(1, n_chunks):
                cur = dots(j)
                acc = acc + tail(*prev, j - 1)
                prev = cur
            acc = acc + tail(*prev, n_chunks - 1)
        else:
            for j in range(n_chunks):
                h, g = dots(j)
                acc = acc + tail(h, g, j)
        o_ref[...] = acc.astype(cdt) + b2_ref[0] + xr

    def call(x2, w1, b1, w2, b2, lnw, lnb):
        return pl.pallas_call(
            kernel,
            grid=(n // tn,),
            in_specs=[
                pl.BlockSpec((tn, c), lambda i: (i, 0)),
                pl.BlockSpec((c, 2 * d), lambda i: (0, 0)),
                pl.BlockSpec((1, 2 * d), lambda i: (0, 0)),
                pl.BlockSpec((d, cout), lambda i: (0, 0)),
                pl.BlockSpec((1, cout), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tn, cout), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, cout), x2.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x2, w1, b1, w2, b2, lnw, lnb)

    return call


def make_streamed(n, c, d, cout, tn, dk, variant):
    n_chunks = d // dk
    coef = C13 if "p13" in variant else (C11 if "p11" in variant else C15)
    estrin = "estrin" in variant
    hgm = "hgm" in variant

    def kernel(x_ref, w1h_ref, w1g_ref, b1h_ref, b1g_ref, w2_ref, b2_ref,
               lnw, lnb, o_ref, acc_ref):
        cdt = x_ref.dtype
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xt = _ln_tile(x_ref[...], lnw, lnb, 1e-5)
        if hgm:
            hg = jax.lax.dot_general(
                xt, w1h_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h = hg[:, :dk] + b1h_ref[0, :dk].astype(jnp.float32)
            g = hg[:, dk:] + b1h_ref[0, dk:].astype(jnp.float32)
        else:
            h = jax.lax.dot_general(
                xt, w1h_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) \
                + b1h_ref[0].astype(jnp.float32)
            g = jax.lax.dot_general(
                xt, w1g_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) \
                + b1g_ref[0].astype(jnp.float32)
        m = (h * _gelu(g, coef, estrin)).astype(cdt)
        acc_ref[:] += jax.lax.dot_general(
            m, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == n_chunks - 1)
        def _():
            o_ref[...] = acc_ref[:].astype(cdt) + b2_ref[0] + x_ref[...]

    nck = n_chunks
    if hgm:
        w1_specs = [pl.BlockSpec((c, 2 * dk), lambda i, j: (0, j)),
                    pl.BlockSpec((c, 2 * dk), lambda i, j: (0, j))]
        b1_specs = [pl.BlockSpec((1, 2 * dk), lambda i, j: (0, j)),
                    pl.BlockSpec((1, 2 * dk), lambda i, j: (0, j))]
    else:
        w1_specs = [pl.BlockSpec((c, dk), lambda i, j: (0, j)),
                    pl.BlockSpec((c, dk), lambda i, j, n_=nck: (0, n_ + j))]
        b1_specs = [pl.BlockSpec((1, dk), lambda i, j: (0, j)),
                    pl.BlockSpec((1, dk), lambda i, j, n_=nck: (0, n_ + j))]

    def call(x2, w1, b1, w2, b2, lnw, lnb):
        return pl.pallas_call(
            kernel,
            grid=(n // tn, n_chunks),
            in_specs=[pl.BlockSpec((tn, c), lambda i, j: (i, 0))]
            + w1_specs + b1_specs + [
                pl.BlockSpec((dk, cout), lambda i, j: (j, 0)),
                pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
                pl.BlockSpec((1, c), lambda i, j: (0, 0)),
                pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tn, cout), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, cout), x2.dtype),
            scratch_shapes=[pltpu.VMEM((tn, cout), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x2, w1, w1, b1, b1, w2, b2, lnw, lnb)

    return call


def hg_reorder(w1, b1, d, dk):
    """(c, 2d) [h|g] -> chunk-interleaved [h0|g0|h1|g1|...]."""
    c = w1.shape[0]
    n_chunks = d // dk
    wh = w1[:, :d].reshape(c, n_chunks, dk)
    wg = w1[:, d:].reshape(c, n_chunks, dk)
    w = jnp.concatenate([wh[:, :, None, :], wg[:, :, None, :]], 2)
    bh = b1[:, :d].reshape(1, n_chunks, dk)
    bg = b1[:, d:].reshape(1, n_chunks, dk)
    b = jnp.concatenate([bh[:, :, None, :], bg[:, :, None, :]], 2)
    return w.reshape(c, 2 * d), b.reshape(1, 2 * d)


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
        def step(cv, _):
            return fn(cv, *w).astype(cv.dtype), jnp.float32(0)
        cv, _ = jax.lax.scan(step, x, None, length=REPS)
        return cv
    return f


def run_site(name, n, c, d, tn, dk, streamed, variants):
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    sc = (c ** -0.5) * 0.02
    x = jax.random.normal(ks[0], (n, c), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (c, 2 * d), jnp.bfloat16) * sc
    b1 = jax.random.normal(ks[2], (1, 2 * d), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (d, c), jnp.bfloat16) * sc
    b2 = jnp.zeros((1, c), jnp.bfloat16)
    lnw = jnp.ones((1, c), jnp.float32)
    lnb = jnp.zeros((1, c), jnp.float32)
    gf = (2 * n * c * 2 * d + 2 * n * d * c) / 1e9

    base_out = None
    results = {}
    mk = make_streamed if streamed else make_fn
    for variant in variants:
        wa, ba = (hg_reorder(w1, b1, d, dk) if "hgm" in variant
                  else (w1, b1))
        try:
            fn = mk(n, c, d, c, tn, dk, variant)
            f = scan_of(fn)
            ms = timeit(f, x, wa, ba, w2, b2, lnw, lnb) * 1e3
            y = fn(x, wa, ba, w2, b2, lnw, lnb)
        except Exception as exc:
            print(f"[{name}] {variant}: FAIL "
                  f"{type(exc).__name__}: {exc}"[:300], flush=True)
            continue
        if variant == "base":
            base_out = y.astype(jnp.float32)
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(
                y.astype(jnp.float32) - base_out))) \
                if base_out is not None else float("nan")
        results[variant] = round(ms, 3)
        print(f"[{name}] {variant:14s}: {ms:7.3f} ms ({gf/ms:6.1f} TF/s) "
              f"maxdelta={err:.2e}", flush=True)
        jax.clear_caches()
    rec = {"name": "ff_variant_r4", "site": name, "gf": round(gf, 1),
           "tn": tn, "dk": dk, "streamed": streamed, "ms": results}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    vs = ["base", "p13", "p11", "estrin", "pipe", "hgm", "pipe_hgm_p13"]
    run_site("ds1", 81920, 320, 1280, 256, 640, False, vs)
    run_site("ds2", 20480, 640, 2560, 512, 640, False, vs)
    vs_s = ["base", "p13", "hgm", "hgm_p13"]
    run_site("ds4", 5120, 1280, 5120, 2560, 640, True, vs_s)
