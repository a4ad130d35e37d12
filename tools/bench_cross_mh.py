"""A/B cross-attention (q 2560 tokens x small KV) through the XLA
einsum path vs the token-major multi-head kernel, at the UNet attn2
shapes (text branch sk=77, image branch sk=256).

Usage: python tools/bench_cross_mh.py
"""
import time

import jax
import jax.numpy as jnp

import tooncrafter_tpu.ops.flash_attention as fa
from tooncrafter_tpu.ops.attention import dot_product_attention

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
    def f(q, k, v):
        def step(c, _):
            o = fn(c, k, v)
            return (c + o.astype(c.dtype) * 1e-3), jnp.float32(0)
        c, _ = jax.lax.scan(step, q, None, length=REPS)
        return c
    return f


def run(name, b, sq, sk, c, heads):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, sq, c), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, sk, c), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, sk, c), jnp.bfloat16)
    d = c // heads

    def xla(q_, k_, v_):
        return dot_product_attention(
            q_.reshape(b, sq, heads, d), k_.reshape(b, sk, heads, d),
            v_.reshape(b, sk, heads, d)).reshape(b, sq, c)

    blk = fa._mh_blk(sq, sk, c, heads)
    print(f"[{name}] mh blk={blk}")
    y1 = xla(q, k, v)
    if blk:
        y2 = fa._flash_mh(q, k, v, heads, d ** -0.5, blk)
        err = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                    - y2.astype(jnp.float32))))
        print(f"[{name}] max|xla-mh|={err:.2e}")
    t = timeit(scan_of(xla), q, k, v)
    print(f"[{name}] XLA : {t*1e3:7.3f} ms", flush=True)
    if blk:
        jax.clear_caches()
        t = timeit(scan_of(
            lambda q_, k_, v_: fa._flash_mh(q_, k_, v_, heads,
                                            d ** -0.5, blk)), q, k, v)
        print(f"[{name}] mh  : {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    run("ds1 text sk=77", 32, 2560, 77, 320, 5)
    run("ds1 img  sk=256", 32, 2560, 256, 320, 5)
    run("ds2 text sk=77", 32, 640, 77, 640, 10)
    run("ds2 img  sk=256", 32, 640, 256, 640, 10)
    run("ds4 text sk=77", 32, 160, 77, 1280, 20)
    run("ds4 img  sk=256", 32, 160, 256, 1280, 20)
