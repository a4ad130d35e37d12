"""A/B the temporal attn complex (LN -> q/k/v proj -> ptc kernel ->
to_out) with separate vs packed projections, at the UNet temporal sites.

Usage: python tools/bench_tattn_packed.py
"""
import time

import jax
import jax.numpy as jnp

from tooncrafter_tpu.ops import temporal_attention as ta

REPS = 20


def ln(x, w, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    msq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    out = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
    return (out * w + bias).astype(x.dtype)


def variant_a(x, lnw, lnb, wq, wk, wv, wo, heads):
    h = ln(x, lnw, lnb)
    q = jnp.dot(h, wq)
    k = jnp.dot(h, wk)
    v = jnp.dot(h, wv)
    out = ta.temporal_attention_ptc(q, k, v, heads=heads,
                                    scale=(q.shape[-1] // heads) ** -0.5)
    return jnp.dot(out, wo) + x


def variant_b(x, lnw, lnb, wqkv, wo, heads):
    h = ln(x, lnw, lnb)
    qkv = jnp.dot(h, wqkv)
    c = x.shape[-1]
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    out = ta.temporal_attention_ptc(q, k, v, heads=heads,
                                    scale=(c // heads) ** -0.5)
    return jnp.dot(out, wo) + x


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


def run_site(name, b, p, t, c, heads):
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, p, t, c), jnp.bfloat16)
    lnw = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    sc = (c ** -0.5) * 0.02
    wq = jax.random.normal(ks[1], (c, c), jnp.bfloat16) * sc
    wk = jax.random.normal(ks[2], (c, c), jnp.bfloat16) * sc
    wv = jax.random.normal(ks[3], (c, c), jnp.bfloat16) * sc
    wo = jax.random.normal(ks[4], (c, c), jnp.bfloat16) * sc
    wqkv = jnp.concatenate([wq, wk, wv], axis=-1)

    ya = variant_a(x, lnw, lnb, wq, wk, wv, wo, heads)
    yb = variant_b(x, lnw, lnb, wqkv, wo, heads)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yb.astype(jnp.float32))))
    print(f"[{name}] max|a-b|={err:.2e}")

    taa = timeit(scan_of(lambda x_, *w: variant_a(x_, *w, heads)),
                 x, lnw, lnb, wq, wk, wv, wo)
    print(f"[{name}] A (3 dots + ptc): {taa*1e3:7.3f} ms", flush=True)
    jax.clear_caches()
    tbb = timeit(scan_of(lambda x_, *w: variant_b(x_, *w, heads)),
                 x, lnw, lnb, wqkv, wo)
    print(f"[{name}] B (packed + ptc): {tbb*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    run_site("ds1 tmp", 2, 2560, 16, 320, 5)
    run_site("ds2 tmp", 2, 640, 16, 640, 10)
    run_site("ds4 tmp", 2, 160, 16, 1280, 20)
