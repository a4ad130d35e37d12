"""Sweep the fused-FF token-tile and the fused temporal-attn pixel-tile
at the real UNet CFG-forward shapes.

The round-3 in-loop trace puts the FF kernels at 43 ms/step (65% MFU)
and the fused temporal-attention kernels at 18 ms/step (~64% of their
dot floor). Both kernels pick their tile from a first-fit VMEM budget;
this sweep forces each candidate tile and times the real kernel, chained
in a scan like the DDIM loop.

Usage: python tools/bench_ff4.py [--out /root/repo/.audit_r03.jsonl]
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


def sweep_ff(out):
    from tooncrafter_tpu.ops import fused_ff

    key = jax.random.PRNGKey(0)
    # (tokens, C) at the UNet CFG-forward levels; inner = 4*C
    shapes = [(81920, 320), (20480, 640), (5120, 1280)]
    for n, c in shapes:
        d = 4 * c
        ks = jax.random.split(key, 5)
        x = jax.random.normal(ks[0], (n, c), jnp.bfloat16)
        w1 = jax.random.normal(ks[1], (c, 2 * d), jnp.bfloat16) * c ** -0.5
        b1 = jnp.zeros((1, 2 * d), jnp.bfloat16)
        w2 = jax.random.normal(ks[2], (d, c), jnp.bfloat16) * d ** -0.5
        b2 = jnp.zeros((1, c), jnp.bfloat16)
        lnw = jnp.ones((1, c), jnp.float32)
        lnb = jnp.zeros((1, c), jnp.float32)
        gf = (2 * n * c * 2 * d + 2 * n * d * c) / 1e9
        mode = fused_ff._mode(n, c, d, c)
        base_pick = fused_ff._pick_tile
        base_pick_s = fused_ff._pick_tile_streamed
        results = {}
        if mode == "resident" or c <= 640:
            for tn in (256, 512, 1024, 2048):
                if n % tn:
                    continue
                fused_ff._pick_tile = (
                    lambda n_, c_, d_, budget=0, _t=tn: _t)
                try:
                    f = scan_of(lambda xx, *w: fused_ff._pallas_ff(
                        xx, *w, lnw, lnb, 1e-5))
                    ms = timeit(f, x, w1, b1, w2, b2)
                    results[f"resident_tn{tn}"] = ms
                    print(f"ff n={n} c={c} resident tn={tn}: {ms:.3f} ms "
                          f"({gf/ms:.0f} TF/s)", flush=True)
                except Exception as e:
                    print(f"ff n={n} c={c} tn={tn}: FAIL {e}", flush=True)
                finally:
                    fused_ff._pick_tile = base_pick
        for tn, dk in ((2560, 1280), (5120, 1280), (1280, 2560),
                       (2560, 2560), (5120, 640)):
            if n % tn or d % dk:
                continue
            fused_ff._pick_tile_streamed = (
                lambda n_, c_, d_, budget=0, _t=(tn, dk): _t)
            try:
                f = scan_of(lambda xx, *w: fused_ff._pallas_ff_streamed(
                    xx, *w, lnw, lnb, 1e-5))
                ms = timeit(f, x, w1, b1, w2, b2)
                results[f"streamed_tn{tn}_dk{dk}"] = ms
                print(f"ff n={n} c={c} streamed tn={tn} dk={dk}: "
                      f"{ms:.3f} ms ({gf/ms:.0f} TF/s)", flush=True)
            except Exception as e:
                print(f"ff n={n} c={c} streamed tn={tn} dk={dk}: FAIL {e}",
                      flush=True)
            finally:
                fused_ff._pick_tile_streamed = base_pick_s
        out.write(json.dumps({"name": "ff_tile_sweep", "n": n, "c": c,
                              "gf": round(gf, 1),
                              "ms": {k: round(v, 3)
                                     for k, v in results.items()}}) + "\n")
        out.flush()


def sweep_tattn(out):
    from tooncrafter_tpu.ops import temporal_attention as ta

    key = jax.random.PRNGKey(1)
    # (B, P, T, C, heads) at the UNet temporal sites (CFG nb=2)
    shapes = [(2, 2560, 16, 320, 5), (2, 640, 16, 640, 10),
              (2, 160, 16, 1280, 20)]
    for b, p, t, c, heads in shapes:
        inner = c
        d = inner // heads
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (b, p, t, c), jnp.bfloat16)
        wqkv = jax.random.normal(ks[1], (c, 3 * inner),
                                 jnp.bfloat16) * c ** -0.5
        wout = jax.random.normal(ks[2], (inner, c),
                                 jnp.bfloat16) * inner ** -0.5
        bout = jnp.zeros((c,), jnp.bfloat16)
        lnw = jnp.ones((c,), jnp.float32)
        lnb = jnp.zeros((c,), jnp.float32)
        tok = b * p * t
        gf = (2 * tok * c * 3 * inner + 2 * tok * inner * c
              + 4 * tok * t * d * heads) / 1e9
        base = ta._pick_ptile_fused
        results = {}
        for pt in (64, 80, 128, 160, 256, 512):
            if p % pt:
                continue
            if ta._fused_vmem(pt, t, c, inner) > 96 * 1024 * 1024:
                continue
            ta._pick_ptile_fused = lambda *a, _p=pt, **kw: _p
            try:
                f = scan_of(lambda xx: ta._fused_tattn_call(
                    xx, lnw, lnb, wqkv, wout, bout,
                    heads=heads, scale=d ** -0.5, eps=1e-5))
                ms = timeit(f, x)
                results[f"pt{pt}"] = ms
                print(f"tattn p={p} c={c} pt={pt}: {ms:.3f} ms "
                      f"({gf/ms:.0f} TF/s)", flush=True)
            except Exception as e:
                print(f"tattn p={p} c={c} pt={pt}: FAIL "
                      f"{str(e)[:120]}", flush=True)
            finally:
                ta._pick_ptile_fused = base
        out.write(json.dumps({"name": "tattn_tile_sweep", "p": p, "c": c,
                              "gf": round(gf, 1),
                              "ms": {k: round(v, 3)
                                     for k, v in results.items()}}) + "\n")
        out.flush()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.audit_r03.jsonl")
    ap.add_argument("--only", default=None, choices=(None, "ff", "tattn"))
    args = ap.parse_args()
    with open(args.out, "a") as f:
        if args.only in (None, "tattn"):
            sweep_tattn(f)
        if args.only in (None, "ff"):
            sweep_ff(f)
