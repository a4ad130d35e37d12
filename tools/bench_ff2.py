"""Sweep token-tile sizes for the fused GEGLU FF kernel (resident
variant) at the UNet shapes. The round-2 kernel ships tn in
(512,256,128) under a 13 MB budget; v5e has ~128 MB VMEM, so larger
tiles may amortize better (bigger M per weight visit, fewer grid steps).

Usage: python tools/bench_ff2.py
"""
import time

import jax
import jax.numpy as jnp

from tooncrafter_tpu.ops import fused_ff

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


def run_site(name, n, c, with_ln=True):
    d = 4 * c
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (n, c), jnp.bfloat16)
    sc = c ** -0.5 * 0.5
    w1 = jax.random.normal(ks[1], (c, 2 * d), jnp.bfloat16) * sc
    b1 = jax.random.normal(ks[2], (2 * d,), jnp.bfloat16) * 0.01
    w2 = jax.random.normal(ks[3], (d, c), jnp.bfloat16) * sc
    b2 = jax.random.normal(ks[4], (c,), jnp.bfloat16) * 0.01
    lnw = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    args = (x, w1, b1, w2, b2) + ((lnw, lnb) if with_ln else ())
    tflop = 24 * n * c * c / 1e12

    fn = (lambda x_, w1_, b1_, w2_, b2_, lnw_, lnb_:
          fused_ff.fused_geglu_ff(x_, w1_, b1_, w2_, b2_,
                                  ln_w=lnw_, ln_b=lnb_)) if with_ln else \
         (lambda x_, w1_, b1_, w2_, b2_:
          fused_ff.fused_geglu_ff(x_, w1_, b1_, w2_, b2_))

    orig_pick = fused_ff._pick_tile
    orig_budget = None
    t0 = timeit(scan_of(fn), *args)
    print(f"[{name}] shipped ({orig_pick(n, c, d)}): {t0*1e3:7.3f} ms "
          f"({tflop/t0:5.0f} TF/s)", flush=True)
    for tn in (4096, 2048, 1024, 512, 256):
        if n % tn:
            continue
        jax.clear_caches()
        fused_ff._pick_tile = (
            lambda n_, c_, d_, budget=0, _tn=tn:
            _tn if n_ % _tn == 0 else orig_pick(n_, c_, d_))
        try:
            t = timeit(scan_of(fn), *args)
            print(f"[{name}] tn={tn:5d}          : {t*1e3:7.3f} ms "
                  f"({tflop/t:5.0f} TF/s)", flush=True)
        except Exception as e:
            print(f"[{name}] tn={tn}: FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
        finally:
            fused_ff._pick_tile = orig_pick


if __name__ == "__main__":
    # ds1 spatial: N = 2*16*2560 tokens at C=320
    run_site("ds1 C=320 N=81920", 81920, 320)
    # ds2: N = 2*16*640 at C=640
    run_site("ds2 C=640 N=20480", 20480, 640)
    # init_attn temporal FF site (N tokens at C=320, T-major): same N
    # ds4 streamed handled by _pick_tile_streamed — not swept here
