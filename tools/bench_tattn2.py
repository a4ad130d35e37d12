"""A/B the block-diagonal pixel packing in the fused temporal-attn kernel.

Per-pixel (T=16 x 16 x d=64) dots are 1/64-utilization MXU shapes and the
16-wide softmax runs at 1/8 lane occupancy; packing G=8 pixels into one
128-row block with a cross-pixel mask turns QK/PV into proper 128-wide
matmuls. Times both kernel variants at the four UNet temporal shapes and
checks max|delta| (expected 0: masked lanes are exact zeros).

Usage: python tools/bench_tattn2.py [--out /root/repo/.audit_r03.jsonl]
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

REPS = 30


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
    from tooncrafter_tpu.ops import temporal_attention as ta

    key = jax.random.PRNGKey(0)
    # (B, P, T, C): ds1 / ds2 / ds4 / mid temporal sites of the 320x512
    # UNet under CFG batching (nb=2)
    shapes = [(2, 2560, 16, 320, 5), (2, 640, 16, 640, 10),
              (2, 160, 16, 1280, 20), (2, 40, 16, 1280, 20)]
    rows = []
    for b, p, t, c, heads in shapes:
        inner = c
        d = inner // heads
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (b, p, t, c), jnp.bfloat16)
        lnw = jnp.ones((c,), jnp.float32)
        lnb = jnp.zeros((c,), jnp.float32)
        wqkv = (jax.random.normal(ks[1], (c, 3 * inner), jnp.bfloat16)
                * c ** -0.5)
        wout = (jax.random.normal(ks[2], (inner, c), jnp.bfloat16)
                * inner ** -0.5)
        bout = jnp.zeros((1, c), jnp.bfloat16)
        scale = d ** -0.5
        gf = (8 * p * t * c * c * b) / 1e9  # qkv+out GEMMs only

        def run(xx, *w):
            return ta._fused_tattn_call(
                xx, lnw, lnb, wqkv, wout, bout,
                heads=heads, scale=scale, eps=1e-5)

        res = {}
        outs = {}
        for packed in (False, True):
            ta._PACK = packed
            name = "packed" if packed else "base"
            outs[name] = np.asarray(
                run(x).astype(jnp.float32), dtype=np.float32)
            ms = timeit(scan_of(run), x)
            res[name] = round(ms, 3)
            print(f"P={p} C={c} {name}: {ms:.3f} ms "
                  f"({gf/ms:.0f} TF/s gemm-equiv)", flush=True)
        ta._PACK = True
        delta = float(np.max(np.abs(outs["packed"] - outs["base"])))
        res["maxdelta"] = delta
        print(f"P={p} C={c} maxdelta={delta}", flush=True)
        rows.append({"name": "tattn_pack_ab", "p": p, "c": c,
                     "gf": round(gf, 1), "ms": res})
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
