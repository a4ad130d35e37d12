"""A/B: conv-prologue precision/fusion variants at UNet conv shapes.

Round-2 trace finding (PARITY.md): the spatial 3x3 convs whose input is
the fused f32 GN-affine+SiLU prologue compile to a demoted emitter at
~81 TF/s, while epilogue-free convs of the same shape hit ~159 TF/s.
This sweeps the candidate fixes IN CONTEXT — a scan'd chain of
[gn_affine_from_stats -> prologue -> conv3x3 -> inline stats] exactly
like the ResBlock path — so the emitter sees the same fusion neighbors
as the real model:

  variants: prologue dtype f32 (round-2 default) / ref (f32 affine,
  bf16 SiLU, matching torch autocast) / bf16 (all compute-dtype),
  each with and without an optimization_barrier between prologue and
  conv; plus a no-prologue ceiling.

One process: sets spatial_conv module globals before each trace (the
env vars are read once at import, so in-process flips of the env would
be ignored — this is the supported way to A/B).
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tooncrafter_tpu.ops.spatial_conv as sc
from tooncrafter_tpu.ops.norms import gn_affine_from_stats

REPS = 20
SHAPES = [(40, 64, 320, 320), (40, 64, 640, 640),
          (20, 32, 640, 640), (10, 16, 1280, 1280)]


def timeit(f, *a):
    float(jnp.mean(f(*a)[0].astype(jnp.float32)))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(jnp.mean(f(*a)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.audit_r03.jsonl")
    args = ap.parse_args()

    results = []
    for (h, w, cin, cout) in SHAPES:
        n = 32
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, h, w, cin), jnp.bfloat16)
        k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout))
             * 0.02).astype(jnp.bfloat16)
        bias = jnp.zeros((cout,), jnp.bfloat16)
        scale = jnp.ones((cin,), jnp.float32)
        gbias = jnp.zeros((cin,), jnp.float32)
        s1_0 = jnp.sum(x, axis=(1, 2), dtype=jnp.float32)
        s2_0 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2))

        def fix(y):
            if y.shape[-1] == cin:
                return y
            return jnp.concatenate([y] * (cin // y.shape[-1]), -1)

        def make(prologue):
            @jax.jit
            def f(x, s1, s2, k):
                def step(carry, _):
                    c, s1, s2 = carry
                    if prologue:
                        a, b = gn_affine_from_stats(
                            s1, s2, h * w, scale, gbias, 32, 1e-5)
                    else:
                        a = jnp.ones((n, cin), jnp.float32)
                        b = jnp.zeros((n, cin), jnp.float32)
                    out = sc._xla_impl(c, a, b, k, bias, None,
                                       silu=prologue, stats=True)
                    y, s1n, s2n = out
                    return (fix(y), fix(s1n[:, None])[:, 0],
                            fix(s2n[:, None])[:, 0]), jnp.float32(0)
                carry, _ = jax.lax.scan(step, (x, s1, s2), None,
                                        length=REPS)
                return carry
            return f

        tf = n * h * w * 9 * cin * cout * 2 / 1e12
        for pdt, barrier, label in [
            ("f32", False, "f32"),
            ("ref", False, "ref"),
            ("bf16", False, "bf16"),
            ("f32", True, "f32+bar"),
            ("ref", True, "ref+bar"),
            ("bf16", True, "bf16+bar"),
        ]:
            sc._PROLOGUE_DTYPE = pdt
            sc._PROLOGUE_BARRIER = barrier
            t = timeit(make(True), x, s1_0, s2_0, k)
            rec = {"name": "prologue_ab", "shape": f"{h}x{w}x{cin}->{cout}",
                   "variant": label, "ms": round(t * 1e3, 3),
                   "tflops_per_s": round(tf / t, 1)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
        # ceiling: no prologue at all (plain conv + stats epilogue)
        sc._PROLOGUE_DTYPE = "f32"
        sc._PROLOGUE_BARRIER = False
        t = timeit(make(False), x, s1_0, s2_0, k)
        rec = {"name": "prologue_ab", "shape": f"{h}x{w}x{cin}->{cout}",
               "variant": "none(ceiling)", "ms": round(t * 1e3, 3),
               "tflops_per_s": round(tf / t, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    with open(args.out, "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
