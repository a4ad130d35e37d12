"""A/B attn1 paths at the 576x1024 model's spatial geometries.

At 72x128 latents the ds1 self-attention is (B=32, S=9216, C=320,
heads=5) — Sk exceeds the packed/mh single-pass envelope (sk<=4096,
swept at 512-model shapes), so production falls back to the two-pass
per-(bh) kernel plus fold/unfold transposes. This bench measures whether
the single-KV-pass multi-head kernel wins at Sk=9216 (the [bq, 9216] f32
score tile still fits VMEM at bq<=256) and sweeps the q-block, plus the
ds2-1024 site (S=2304, C=640) the current table covers with blk=256.

Usage: python tools/bench_attn1_1024.py [--out /root/repo/.audit_r04.jsonl]
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

import tooncrafter_tpu.ops.flash_attention as fa

REPS = 10


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


def mk(body):
    @jax.jit
    def f(q, k, v):
        def step(c, _):
            return body(c, k, v), jnp.float32(0)
        c, _ = jax.lax.scan(step, q, None, length=REPS)
        return c
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.audit_r05.jsonl")
    args = ap.parse_args()

    rows = []
    for (b, s, c, heads, blks) in [
            (32, 9216, 320, 5, (192, 256)),
            (32, 2304, 640, 10, (192, 256, 384)),
    ]:
        d = c // heads
        scale = d ** -0.5
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, s, c), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, c), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, c), jnp.bfloat16)
        tf = 2 * 2 * b * heads * s * s * d / 1e12

        def prod(qq, kk, vv):
            # production 4-D path: fold/unfold + dispatched kernel
            out = fa.flash_attention(
                qq.reshape(b, s, heads, d), kk.reshape(b, s, heads, d),
                vv.reshape(b, s, heads, d), scale)
            return out.reshape(b, s, c)

        res = {}
        try:
            ms = timeit(mk(prod), q, k, v)
            res["prod_2pass"] = round(ms, 3)
            print(f"S={s} C={c}: prod {ms:.2f} ms ({tf/ms*1e3:.0f} TF/s)",
                  flush=True)
        except Exception as e:
            print(f"S={s} C={c}: prod FAIL {str(e)[:200]}", flush=True)

        for blk in blks:
            if s % blk:
                continue
            for tag, impl in (("mh", fa._flash_mh),
                              ("mhones", fa._flash_mh_ones)):
                def mh(qq, kk, vv, blk=blk, impl=impl):
                    return impl(qq, kk, vv, heads, scale, blk)

                try:
                    ms = timeit(mk(mh), q, k, v)
                    res[f"{tag}_bq{blk}"] = round(ms, 3)
                    print(f"S={s} C={c}: {tag} bq={blk} {ms:.2f} ms "
                          f"({tf/ms*1e3:.0f} TF/s)", flush=True)
                except Exception as e:
                    print(f"S={s} C={c}: {tag} bq={blk} FAIL "
                          f"{str(e)[:200]}", flush=True)
        # numerics spot-check of mh + onescol vs prod
        try:
            want = prod(q, k, v).astype(jnp.float32)
            got = fa._flash_mh(q, k, v, heads, scale,
                               blks[1]).astype(jnp.float32)
            res["maxdelta"] = float(jnp.max(jnp.abs(got - want)))
            got1 = fa._flash_mh_ones(q, k, v, heads, scale,
                                     blks[1]).astype(jnp.float32)
            res["maxdelta_ones"] = float(jnp.max(jnp.abs(got1 - want)))
            print(f"  max|mh-prod| = {res['maxdelta']:.2e}  "
                  f"ones {res['maxdelta_ones']:.2e}", flush=True)
        except Exception as e:
            print(f"  numerics FAIL {str(e)[:200]}", flush=True)
        rows.append({"name": "attn1_1024_ab", "shape": f"{b}x{s}x{c}h{heads}",
                     "tf": round(tf, 3), "ms": res})
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
