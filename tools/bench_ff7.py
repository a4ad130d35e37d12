"""Ablation of the fused-FF kernel: where do the ~1.6 ms/site go?

The production kernel (ops/fused_ff.py) runs ~70 TF/s while its dots
alone should run ~160 TF/s. This tool compiles stripped kernel variants
at the two resident UNet shapes to attribute the gap:

  base       full kernel (LN + h/g dots + f32 gate + out-GEMM)
  noln       skip the LayerNorm prologue
  nogate     keep all three dots, replace gelu gate with m=(h*g) rounded
             (isolates the erf polynomial VPU chain)
  honly      m = h only (drops the g dot AND the gate; 2/3 of MXU work)
  dotsxla    XLA floor: the same three dots as one scan body, no gate,
             f32 accum — what the MXU can do on these shapes

Usage: python tools/bench_ff7.py [--out /root/repo/.audit_r03.jsonl]
"""
import argparse
import functools
import json
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

REPS = 20


def timeit(f, *a):
    float(jnp.mean(f(*a).astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(f(*a).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS * 1e3


def scan_of(fn):
    @jax.jit
    def f(x, *w):
        def step(c, _):
            return fn(c, *w).astype(c.dtype), jnp.float32(0)
        c, _ = jax.lax.scan(step, x, None, length=REPS)
        return c
    return f


def make_variant(variant, tn, dk):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tooncrafter_tpu.ops import fused_ff

    def run(x2, w1, b1, w2, b2, lnw, lnb, eps=1e-5):
        n, c = x2.shape
        d, cout = w2.shape
        n_chunks = d // dk
        cdt = x2.dtype

        def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lnw_ref,
                   lnb_ref, o_ref):
            xt = x_ref[...]
            if variant != "noln":
                xt = fused_ff._ln_tile(xt, lnw_ref, lnb_ref, eps)
            acc = jnp.zeros((tn, cout), jnp.float32)
            for j in range(n_chunks):
                lo, hi = j * dk, (j + 1) * dk
                h = jax.lax.dot_general(
                    xt, w1_ref[:, lo:hi], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if variant == "honly":
                    m = h.astype(cdt)
                else:
                    g = jax.lax.dot_general(
                        xt, w1_ref[:, d + lo:d + hi],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    h = h + b1_ref[0, lo:hi].astype(jnp.float32)
                    g = g + b1_ref[0, d + lo:d + hi].astype(jnp.float32)
                    if variant == "nogate":
                        m = (h * g).astype(cdt)
                    else:
                        m = (h * fused_ff._gelu_exact_f32(g)).astype(cdt)
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
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tn, cout), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, cout), cdt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x2, w1, b1, w2, b2, lnw, lnb)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.audit_r03.jsonl")
    args = ap.parse_args()
    from tooncrafter_tpu.ops import fused_ff

    key = jax.random.PRNGKey(0)
    rows = []
    for n, c in [(81920, 320), (20480, 640)]:
        d = 4 * c
        ks = jax.random.split(key, 3)
        x = jax.random.normal(ks[0], (n, c), jnp.bfloat16)
        w1 = jax.random.normal(ks[1], (c, 2 * d), jnp.bfloat16) * c ** -0.5
        b1 = jnp.zeros((1, 2 * d), jnp.bfloat16)
        w2 = jax.random.normal(ks[2], (d, c), jnp.bfloat16) * d ** -0.5
        b2 = jnp.zeros((1, c), jnp.bfloat16)
        lnw = jnp.ones((1, c), jnp.float32)
        lnb = jnp.zeros((1, c), jnp.float32)
        gf = (2 * n * c * 2 * d + 2 * n * d * c) / 1e9
        tn = fused_ff._pick_tile(n, c, d)
        dk = min(d, fused_ff._CHUNK)
        res = {}
        for variant in ("base", "noln", "nogate", "honly"):
            f = scan_of(functools.partial(make_variant(variant, tn, dk)))
            ms = timeit(f, x, w1, b1, w2, b2, lnw, lnb)
            res[variant] = round(ms, 3)
            print(f"n={n} c={c} {variant}: {ms:.3f} ms "
                  f"({gf/ms:.0f} TF/s-equiv)", flush=True)

        def dotsxla(x2, w1_, b1_, w2_, b2_, lnw_, lnb_):
            h = jnp.dot(x2, w1_[:, :d],
                        preferred_element_type=jnp.float32)
            g = jnp.dot(x2, w1_[:, d:],
                        preferred_element_type=jnp.float32)
            m = (h * g).astype(x2.dtype)
            return jnp.dot(m, w2_,
                           preferred_element_type=jnp.float32) \
                .astype(x2.dtype) + b2_[0]

        ms = timeit(scan_of(dotsxla), x, w1, b1, w2, b2, lnw, lnb)
        res["dotsxla"] = round(ms, 3)
        print(f"n={n} c={c} dotsxla: {ms:.3f} ms ({gf/ms:.0f} TF/s)",
              flush=True)
        rows.append({"name": "ff_ablation", "n": n, "c": c,
                     "gf": round(gf, 1), "tn": tn, "dk": dk, "ms": res})
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
