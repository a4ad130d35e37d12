"""A/B the full attn1 complex (LN -> q/k/v proj -> attention -> to_out)
at the UNet spatial self-attn shapes.

Variant A (production today): three Dense dots, optimization_barrier,
(B,S,H,D) -> (BH,S,D) fold transpose, per-(bh) flash kernel, unfold,
to_out dot.

Variant B (candidate): one packed [C,3C] dot, free reshape to
(B,S,H,D)-as-(B,S,C), a multi-head single-pass kernel that slices heads
statically from lane subranges (no fold/unfold copies, no barrier), then
to_out directly on the token-major output.

Usage: python tools/bench_attn1.py
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
def flash_mh(q, k, v, heads: int, scale: float, blk_q: int):
    """q,k,v: (B, S, H*D) token-major. Single KV pass, heads unrolled
    inside the kernel over static lane subranges."""
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // heads
    n_q = sq // blk_q
    s2 = scale * LOG2E

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[0]            # (blk_q, H*D)
        kb = k_ref[0]            # (sk, H*D)
        vb = v_ref[0]
        outs = []
        for h in range(heads):
            lo = h * d
            qh = qb[:, lo:lo + d]
            kh = kb[:, lo:lo + d]
            vh = vb[:, lo:lo + d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * s2
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
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
            pl.BlockSpec((1, blk_q, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, sk, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, sk, c), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, c), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)


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
    b, s, c = q.shape
    d = c // heads
    out = fa.flash_attention(q.reshape(b, s, heads, d),
                             k.reshape(b, s, heads, d),
                             v.reshape(b, s, heads, d))
    return jnp.dot(out.reshape(b, s, c), wo) + x


def variant_b(x, lnw, lnb, wqkv, wo, heads, blk_q):
    h = ln(x, lnw, lnb)
    qkv = jnp.dot(h, wqkv)
    c = x.shape[-1]
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    d = c // heads
    out = flash_mh(q, k, v, heads, d ** -0.5, blk_q)
    return jnp.dot(out, wo) + x


def timeit(f, *a):
    float(jnp.mean(f(*a).astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(f(*a).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS


def scan_of(fn, nargs):
    @jax.jit
    def f(x, *w):
        def step(c, _):
            return fn(c, *w).astype(c.dtype), jnp.float32(0)
        c, _ = jax.lax.scan(step, x, None, length=REPS)
        return c
    return f


def run_site(name, b, s, c, heads):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, s, c), jnp.bfloat16)
    lnw = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    sc = (c ** -0.5) * 0.02
    wq = jax.random.normal(ks[1], (c, c), jnp.bfloat16) * sc
    wk = jax.random.normal(ks[2], (c, c), jnp.bfloat16) * sc
    wv = jax.random.normal(ks[3], (c, c), jnp.bfloat16) * sc
    wo = jax.random.normal(ks[4], (c, c), jnp.bfloat16) * sc
    wqkv = jnp.concatenate([wq, wk, wv], axis=-1)

    ya = variant_a(x, lnw, lnb, wq, wk, wv, wo, heads)
    d = c // heads
    blk_q = min(1280, s)
    yb = variant_b(x, lnw, lnb, wqkv, wo, heads, blk_q)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yb.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(ya.astype(jnp.float32))))
    print(f"[{name}] max|a-b|={err:.2e} (max|a|={ref:.2e})")

    ta = timeit(scan_of(
        lambda x_, *w: variant_a(x_, *w, heads), 6),
        x, lnw, lnb, wq, wk, wv, wo)
    print(f"[{name}] A (prod fold+flash) : {ta*1e3:7.3f} ms", flush=True)
    for bq in (1280, 640, 512, 320, 256, 160, 128):
        if s % bq or bq > s:
            continue
        jax.clear_caches()
        tb = timeit(scan_of(
            lambda x_, *w: variant_b(x_, *w, heads, bq), 4),
            x, lnw, lnb, wqkv, wo)
        print(f"[{name}] B (packed+mh) bq={bq:4d}: {tb*1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    run_site("ds1", 32, 2560, 320, 5)
    run_site("ds2", 32, 640, 640, 10)
    run_site("ds4", 32, 160, 1280, 20)
