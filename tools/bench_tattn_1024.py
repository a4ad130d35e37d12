"""Pixel-tile sweep for the fused temporal-attn PAIR kernel at the
576x1024 model's geometries (P=9216/2304/576 — none covered by the
round-3 sweeps, which ran at the 512-model P=2560/640/160).

Usage: python tools/bench_tattn_1024.py [--out /root/repo/.audit_r04.jsonl]
"""
import argparse
import json
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import tooncrafter_tpu.ops.temporal_attention as ta

REPS = 20


def timeit(f, *a):
    r = f(*a)
    float(jnp.mean(r.astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*a)
        float(jnp.mean(r.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.audit_r04.jsonl")
    args = ap.parse_args()

    rows = []
    for (b, p, t, c, heads, pts) in [
            (2, 9216, 16, 320, 5, (512, 384, 256, 192, 128)),
            (2, 2304, 16, 640, 10, (256, 192, 128, 96, 64)),
            (2, 576, 16, 1280, 20, (96, 64, 48, 32)),
    ]:
        inner = c
        d = c // heads
        scale = d ** -0.5
        ks = jax.random.split(jax.random.PRNGKey(0), 11)
        x = jax.random.normal(ks[0], (b, p, t, c), jnp.bfloat16)
        mkw = lambda i, m, n_: (jax.random.normal(ks[i], (m, n_)) * 0.05) \
            .astype(jnp.float32)
        bf = jnp.bfloat16
        p1 = (mkw(1, 1, c)[0], mkw(2, 1, c)[0],
              mkw(3, c, 3 * inner).astype(bf),
              mkw(4, inner, c).astype(bf), mkw(5, 1, c)[0].astype(bf))
        p2 = (mkw(6, 1, c)[0], mkw(7, 1, c)[0],
              mkw(8, c, 3 * inner).astype(bf),
              mkw(9, inner, c).astype(bf), mkw(10, 1, c)[0].astype(bf))
        # (lnw, lnb, wqkv, wout, bout) per stage
        gf = 2 * (2 * (b * p * t * c * 3 * inner + b * p * t * inner * c)
                  + 2 * b * p * heads * t * t * d * 2) / 1e9

        orig = ta._pick_ptile_pair
        res = {}
        for pt in pts:
            if p % pt:
                continue
            ta._pick_ptile_pair = lambda *a_, **k_: pt

            def f(xx):
                return ta._fused_tpair_call(xx, p1, p2, heads, scale, 1e-5)

            @jax.jit
            def loop(xx):
                def step(cc, _):
                    return f(cc), jnp.float32(0)
                cc, _ = jax.lax.scan(step, xx, None, length=REPS)
                return cc

            try:
                ms = timeit(loop, x)
                res[f"pt{pt}"] = round(ms, 3)
                print(f"P={p} C={c}: pt={pt} {ms:.3f} ms "
                      f"({gf/ms:.0f} TF/s)", flush=True)
            except Exception as e:
                print(f"P={p} C={c}: pt={pt} FAIL {str(e)[:200]}",
                      flush=True)
            finally:
                ta._pick_ptile_pair = orig
        default_pt = orig(p, t, c, inner)
        res["default_pt"] = default_pt
        print(f"P={p} C={c}: default table -> pt={default_pt}", flush=True)
        rows.append({"name": "tattn_1024_sweep", "shape": f"{b}x{p}x{t}x{c}",
                     "gf": round(gf, 1), "ms": res})
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
