"""A/B: packed-QKV attn1 with materialized q/k/v slices (production)
vs binding the packed (B,S,3C) array directly into the kernel twice
(q-blocked view + full KV-resident view) with in-kernel lane slicing —
eliminates the 3x(B,S,C) slice copies XLA emits before the kernel.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_attn1_packed.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import tooncrafter_tpu.ops.flash_attention as fa

REPS = 20
LOG2E = 1.4426950408889634


@functools.partial(jax.jit, static_argnames=("heads", "scale", "blk_q"))
def flash_mh_packed(qkv, heads: int, scale: float, blk_q: int):
    """qkv: (B, S, 3*C) packed token-major. One HBM array, two views."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    n_q = s // blk_q
    s2 = scale * LOG2E

    def kernel(q_ref, kv_ref, o_ref):
        qb = q_ref[0]            # (blk_q, 3C) — q lanes [0:C)
        kvb = kv_ref[0]          # (S, 3C) — k lanes [C:2C), v [2C:3C)
        outs = []
        for h in range(heads):
            lo = h * d
            qh = qb[:, lo:lo + d]
            kh = kvb[:, c + lo:c + lo + d]
            vh = kvb[:, 2 * c + lo:2 * c + lo + d]
            sc = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * s2
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp2(sc - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append((acc / l).astype(o_ref.dtype))
        o_ref[0] = jnp.concatenate(outs, axis=-1)

    return pl.pallas_call(
        kernel,
        grid=(b, n_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, c3), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, s, c3), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, c), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv, qkv)


def ln(x, w, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    msq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    out = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
    return (out * w + bias).astype(x.dtype)


def variant_a(x, lnw, lnb, wqkv, wo, heads):
    """Production: packed dot -> 3 slices -> kernel(q, k, v)."""
    h = ln(x, lnw, lnb)
    out = fa.flash_attention_packed(jnp.dot(h, wqkv), heads)
    return jnp.dot(out, wo) + x


def variant_b(x, lnw, lnb, wqkv, wo, heads, blk_q):
    """Candidate: packed dot -> kernel(qkv) with in-kernel slicing."""
    h = ln(x, lnw, lnb)
    c = x.shape[-1]
    out = flash_mh_packed(jnp.dot(h, wqkv), heads,
                          (c // heads) ** -0.5, blk_q)
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


def run_site(name, b, s, c, heads):
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, s, c), jnp.bfloat16)
    lnw = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    sc = (c ** -0.5) * 0.02
    wqkv = jax.random.normal(ks[1], (c, 3 * c), jnp.bfloat16) * sc
    wo = jax.random.normal(ks[2], (c, c), jnp.bfloat16) * sc

    args = (x, lnw, lnb, wqkv, wo)
    ya = variant_a(*args, heads)
    blk = fa._mh_blk(s, s, c, heads)
    yb = variant_b(*args, heads, blk)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yb.astype(jnp.float32))))
    print(f"[{name}] blk={blk} max|a-b|={err:.2e}")
    ta = timeit(scan_of(lambda x_, *w: variant_a(x_, *w, heads)), *args)
    print(f"[{name}] A (slice + kernel): {ta*1e3:7.3f} ms", flush=True)
    for bq in (blk, 2 * blk if s % (2 * blk) == 0 else blk):
        tb = timeit(scan_of(
            lambda x_, *w: variant_b(x_, *w, heads, bq)), *args)
        print(f"[{name}] B (direct) bq={bq:4d}: {tb*1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    run_site("ds1", 32, 2560, 320, 5)
    run_site("ds2", 32, 640, 640, 10)
    run_site("ds4", 32, 160, 1280, 20)
