"""FF-kernel variant A/B at the real UNet shapes.

The round-3 trace pins the fused GEGLU FF at ~43 ms/step while the tile
sweep shows its time is nearly tile-size-invariant (~3.0 ms at every tn)
— the signature of a kernel whose per-element VPU work (casts + bias +
erf poly + gate mul) serializes with its MXU dots instead of hiding
under them. Variants measured here:

  base       current production kernel body (bf16-round bias, f32 gate)
  dkN        same body but the inner dim split into chunks of N columns,
             so chunk j+1's dots are issueable while chunk j gates on the
             VPU (tests whether Mosaic's scheduler overlaps MXU/VPU)
  fastround  f32 bias add, no bf16 round-trip before the gate (2 fewer
             VPU passes per element; precision superset of base)
  bf16gate   bias + gate arithmetic entirely in bf16 (packed VPU ops;
             matches torch-autocast's half-precision gelu more closely
             than base does)
  poly9      deg-9 odd erf polynomial (|err|<=6e-5 on [-3,3] — far below
             the bf16 round of the gate product) instead of deg-19

Usage: python tools/bench_ff5.py [--out /root/repo/.audit_r03.jsonl]
"""
import argparse
import json
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20

_ERF19 = (1.1283599252e+00, -3.7593882924e-01, 1.1232775752e-01,
          -2.6235394188e-02, 4.7904560104e-03, -6.7044281677e-04,
          6.8676210799e-05, -4.7832972359e-06, 2.0007393939e-07,
          -3.7614280374e-09)


def _fit_poly9():
    """LS fit of erf(u)/u against u^2 on Chebyshev nodes of [0, 9]."""
    from math import erf
    k = np.arange(1, 257)
    s = 4.5 + 4.5 * np.cos((2 * k - 1) / 512 * np.pi)   # u^2 in (0, 9)
    u = np.sqrt(s)
    y = np.array([erf(v) for v in u]) / u
    A = np.stack([s ** i for i in range(5)], axis=1)
    c, *_ = np.linalg.lstsq(A, y, rcond=None)
    uu = np.linspace(0, 3, 20001)[1:]
    err = np.abs(np.polyval(c[::-1], uu * uu) * uu
                 - np.array([erf(v) for v in uu]))
    return tuple(float(v) for v in c), float(err.max())


def erf_poly(x, coef):
    u = jnp.clip(x, -3.0, 3.0)
    s = u * u
    p = coef[-1]
    for c_ in coef[-2::-1]:
        p = p * s + c_
    return u * p


def gelu_via(x, coef):
    return 0.5 * x * (1.0 + erf_poly(x * 0.7071067811865476, coef))


def make_ff(tn, dk, variant, coef):
    """Standalone resident-weights fused FF with the variant's body."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def build(x2, w1, b1, w2, b2, lnw, lnb):
        n, c = x2.shape
        d, cout = w2.shape
        n_chunks = d // dk
        cdt = x2.dtype

        def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lnw_ref,
                   lnb_ref, o_ref):
            xt = x_ref[...]
            xf = xt.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            msq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            var = jnp.maximum(msq - jnp.square(mean), 0.0)
            z = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
            z = z * lnw_ref[0].astype(jnp.float32) \
                + lnb_ref[0].astype(jnp.float32)
            xt = z.astype(cdt)
            acc = jnp.zeros((tn, cout), jnp.float32)
            for j in range(n_chunks):
                lo, hi = j * dk, (j + 1) * dk
                h = jax.lax.dot_general(
                    xt, w1_ref[:, lo:hi], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                g = jax.lax.dot_general(
                    xt, w1_ref[:, d + lo:d + hi], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if variant == "fastround":
                    h = h + b1_ref[0, lo:hi].astype(jnp.float32)
                    g = g + b1_ref[0, d + lo:d + hi].astype(jnp.float32)
                    m = (h * gelu_via(g, coef)).astype(cdt)
                elif variant == "bf16gate":
                    hb = h.astype(cdt) + b1_ref[0, lo:hi]
                    gb = g.astype(cdt) + b1_ref[0, d + lo:d + hi]
                    m = hb * gelu_via(gb, tuple(
                        jnp.bfloat16(c_) for c_ in coef))
                else:  # base / dkN / poly9
                    h = (h.astype(cdt) + b1_ref[0, lo:hi]) \
                        .astype(jnp.float32)
                    g = (g.astype(cdt) + b1_ref[0, d + lo:d + hi]) \
                        .astype(jnp.float32)
                    m = (h * gelu_via(g, coef)).astype(cdt)
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

    return build


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.audit_r03.jsonl")
    args = ap.parse_args()

    coef9, err9 = _fit_poly9()
    print(f"poly9 max |err| = {err9:.2e}", flush=True)

    key = jax.random.PRNGKey(0)
    shapes = [(81920, 320, 256), (20480, 640, 512)]
    rows = []
    for n, c, tn in shapes:
        d = 4 * c
        ks = jax.random.split(key, 3)
        x = jax.random.normal(ks[0], (n, c), jnp.bfloat16)
        w1 = jax.random.normal(ks[1], (c, 2 * d), jnp.bfloat16) * c ** -0.5
        b1 = jax.random.normal(ks[2], (1, 2 * d), jnp.bfloat16) * 0.02
        w2 = jax.random.normal(ks[1], (d, c), jnp.bfloat16) * d ** -0.5
        b2 = jnp.zeros((1, c), jnp.bfloat16)
        lnw = jnp.ones((1, c), jnp.float32)
        lnb = jnp.zeros((1, c), jnp.float32)
        gf = (2 * n * c * 2 * d + 2 * n * d * c) / 1e9
        a = (x, w1, b1, w2, b2, lnw, lnb)

        cases = [("base", d, "base", _ERF19),
                 ("dk640", 640, "base", _ERF19),
                 ("dk320", 320, "base", _ERF19),
                 ("fastround", d, "fastround", _ERF19),
                 ("fastround_dk640", 640, "fastround", _ERF19),
                 ("bf16gate", d, "bf16gate", _ERF19),
                 ("poly9", d, "base", coef9),
                 ("poly9_fastround_dk640", 640, "fastround", coef9)]
        res, outs = {}, {}
        for name, dk, variant, coef in cases:
            if d % dk:
                continue
            try:
                f = scan_of(make_ff(tn, dk, variant, coef))
                ms = timeit(f, *a)
                res[name] = round(ms, 3)
                outs[name] = np.asarray(
                    make_ff(tn, dk, variant, coef)(*a)[:4, :8],
                    np.float32)
                print(f"n={n} c={c} {name}: {ms:.3f} ms "
                      f"({gf/ms:.0f} TF/s)", flush=True)
            except Exception as e:
                print(f"n={n} c={c} {name}: FAIL {str(e)[:140]}",
                      flush=True)
        if "base" in outs:
            for name, o in outs.items():
                dmax = float(np.abs(o - outs["base"]).max())
                print(f"  {name}: max|delta| vs base (sample) = "
                      f"{dmax:.2e}", flush=True)
        rows.append({"name": "ff_variant_ab", "n": n, "c": c,
                     "gf": round(gf, 1), "ms": res})
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
