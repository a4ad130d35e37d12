"""Joint (tn, dk) sweep of the production fused-FF kernel.

Earlier sweeps varied tn at fixed dk (=_CHUNK) and dk at fixed tn; the
hypothesis here is that the kernel sits in a bad corner: small tn
starves the MXU (M=256 dots), big tn with big dk thrashes VMEM with
f32 h/g intermediates. A large-tn/small-dk corner keeps the dots fat
while bounding the live f32 set.

Usage: python tools/bench_ff6.py [--out /root/repo/.audit_r03.jsonl]
"""
import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.audit_r03.jsonl")
    args = ap.parse_args()
    from tooncrafter_tpu.ops import fused_ff

    key = jax.random.PRNGKey(0)
    shapes = [(81920, 320), (20480, 640)]
    rows = []
    for n, c in shapes:
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
        res = {}
        base_pick = fused_ff._pick_tile
        base_chunk = fused_ff._CHUNK
        for tn in (256, 512, 1024, 2048, 4096):
            for dk in (320, 640, 1280):
                if n % tn or d % dk or dk > d:
                    continue
                # live f32 h+g per chunk
                live = 2 * tn * dk * 4
                if live > 24 * 1024 * 1024:
                    continue
                fused_ff._pick_tile = (lambda n_, c_, d_, budget=0,
                                       _t=tn: _t)
                fused_ff._CHUNK = dk
                try:
                    f = scan_of(lambda xx, *w: fused_ff._pallas_ff(
                        xx, *w, lnw, lnb, 1e-5))
                    ms = timeit(f, x, w1, b1, w2, b2)
                    res[f"tn{tn}_dk{dk}"] = round(ms, 3)
                    print(f"n={n} c={c} tn={tn} dk={dk}: {ms:.3f} ms "
                          f"({gf/ms:.0f} TF/s)", flush=True)
                except Exception as e:
                    print(f"n={n} c={c} tn={tn} dk={dk}: FAIL "
                          f"{str(e)[:100]}", flush=True)
                finally:
                    fused_ff._pick_tile = base_pick
                    fused_ff._CHUNK = base_chunk
        rows.append({"name": "ff_joint_sweep", "n": n, "c": c,
                     "gf": round(gf, 1), "ms": res})
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
