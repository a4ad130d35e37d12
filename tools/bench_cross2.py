"""A/B the full attn2 complex (LN -> q + text/image K/V projections ->
dual attention -> tanh-alpha combine -> to_out) at the UNet spatial
cross-attn shapes: batch = B*T = 32, Sq = H*W, Lt = 77 text tokens,
Li = 16 per-frame image tokens.

Variant A (production today): q/k/v + k_ip/v_ip Dense dots, two
`attention()` calls (XLA dpa / flash dispatch), combine, to_out.

Variant B (candidate): same projections, ONE fused dual-KV-resident
Pallas kernel (ops/cross_attention.py) sweeping Q once.

Usage: PYTHONPATH=/root/.axon_site python tools/bench_cross2.py
"""
import time

import jax
import jax.numpy as jnp

from tooncrafter_tpu.ops import cross_attention as CA
from tooncrafter_tpu.ops.attention import attention

REPS = 20


def ln(x, w, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    msq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    out = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
    return (out * w + bias).astype(x.dtype)


def proj(x, lnw, lnb, wq, wk, wv, wki, wvi, ctx_t, ctx_i):
    h = ln(x, lnw, lnb)
    q = jnp.dot(h, wq)
    kt = jnp.dot(ctx_t, wk)
    vt = jnp.dot(ctx_t, wv)
    ki = jnp.dot(ctx_i, wki)
    vi = jnp.dot(ctx_i, wvi)
    return q, kt, vt, ki, vi


def variant_a(x, lnw, lnb, wq, wk, wv, wki, wvi, wo, ctx_t, ctx_i,
              alpha, heads):
    q, kt, vt, ki, vi = proj(x, lnw, lnb, wq, wk, wv, wki, wvi,
                             ctx_t, ctx_i)
    out = attention(q, kt, vt, heads=heads)
    out_ip = attention(q, ki, vi, heads=heads)
    s_ip = jnp.tanh(alpha) + 1.0
    out = out + s_ip * out_ip
    return jnp.dot(out, wo) + x


def variant_b(x, lnw, lnb, wq, wk, wv, wki, wvi, wo, ctx_t, ctx_i,
              alpha, heads):
    q, kt, vt, ki, vi = proj(x, lnw, lnb, wq, wk, wv, wki, wvi,
                             ctx_t, ctx_i)
    s_ip = jnp.tanh(alpha) + 1.0
    out = CA.dual_cross_attention(q, kt, vt, ki, vi, s_ip, heads)
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


def run_site(name, b, s, c, heads, lt=77, li=16):
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    x = jax.random.normal(ks[0], (b, s, c), jnp.bfloat16)
    ctx_t = jax.random.normal(ks[1], (b, lt, 1024), jnp.bfloat16)
    ctx_i = jax.random.normal(ks[2], (b, li, 1024), jnp.bfloat16)
    lnw = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    sc = (c ** -0.5) * 0.02
    wq = jax.random.normal(ks[3], (c, c), jnp.bfloat16) * sc
    wk = jax.random.normal(ks[4], (1024, c), jnp.bfloat16) * 0.01
    wv = jax.random.normal(ks[5], (1024, c), jnp.bfloat16) * 0.01
    wki = jax.random.normal(ks[6], (1024, c), jnp.bfloat16) * 0.01
    wvi = jax.random.normal(ks[7], (1024, c), jnp.bfloat16) * 0.01
    wo = jax.random.normal(ks[8], (c, c), jnp.bfloat16) * sc
    alpha = jnp.float32(0.2)

    args = (x, lnw, lnb, wq, wk, wv, wki, wvi, wo, ctx_t, ctx_i, alpha)
    ya = variant_a(*args, heads)
    yb = variant_b(*args, heads)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yb.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(ya.astype(jnp.float32))))
    print(f"[{name}] max|a-b|={err:.2e} (max|a|={ref:.2e})")

    ta = timeit(scan_of(lambda x_, *w: variant_a(x_, *w, heads)), *args)
    print(f"[{name}] A (two XLA attns): {ta*1e3:7.3f} ms", flush=True)
    tb = timeit(scan_of(lambda x_, *w: variant_b(x_, *w, heads)), *args)
    print(f"[{name}] B (fused dual)   : {tb*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    run_site("ds1", 32, 2560, 320, 5)
    run_site("ds2", 32, 640, 640, 10)
    run_site("ds4", 32, 160, 1280, 20)


def variant_c(x, lnw, lnb, wq, wk, wv, wki, wvi, wo, ctx_t, ctx_i,
              alpha, heads):
    """Block-diagonal dual attention, pure XLA, token-major throughout.

    K/V for text (Lt) and image (Li) are embedded block-diagonally over
    heads: K_bd (B, H*(Lt+Li), H*D) so scores for ALL heads and BOTH
    sources come from one (B, Sq, H*D) @ (B, H*D, H*L) matmul. Each
    (head, source) pair is its own softmax segment; segment sums come
    from one dot with a 0/1 indicator, and the image segments' V rows
    are pre-scaled by s_ip so the combine is free.
    """
    q, kt, vt, ki, vi = proj(x, lnw, lnb, wq, wk, wv, wki, wvi,
                             ctx_t, ctx_i)
    b, sq, c = q.shape
    d = c // heads
    lt, li = kt.shape[1], ki.shape[1]
    L = lt + li
    s_ip = (jnp.tanh(alpha) + 1.0).astype(vt.dtype)

    eye = jnp.eye(heads, dtype=q.dtype)  # (h, g)

    def bd(t):  # (b, l, h*d) -> (b, h, l, h*d) block-diag -> (b, h*l, h*d)
        l = t.shape[1]
        th = t.reshape(b, l, heads, d)
        tbd = jnp.einsum("blhd,hg->bhlgd", th, eye)
        return tbd.reshape(b, heads * l, heads * d)

    k_bd = jnp.concatenate([bd(kt), bd(ki)], axis=1)   # (b, h*L, c)
    v_bd = jnp.concatenate([bd(vt), bd(vi) * s_ip], axis=1)

    scale = d ** -0.5
    s = jnp.einsum("bqc,blc->bql", q, k_bd,
                   preferred_element_type=jnp.float32) * scale
    # off-segment lanes are exactly 0 * scale = 0; per-row global max is
    # a valid stabilizer for every segment
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)                                  # (b, q, h*L)
    # segment sums: indicator (h*L, 2h) one-hot
    seg_t = jnp.repeat(jnp.arange(heads), lt)           # (h*lt,)
    seg_i = jnp.repeat(jnp.arange(heads), li) + heads
    seg = jnp.concatenate([seg_t, seg_i])
    ind = jax.nn.one_hot(seg, 2 * heads, dtype=jnp.float32)
    lsum = p @ ind                                      # (b, q, 2h)
    rin = (1.0 / lsum) @ ind.T                          # (b, q, h*L)
    out = jnp.einsum("bql,blc->bqc", (p * rin).astype(v_bd.dtype), v_bd,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.dot(out, wo) + x


def run_site_c(name, b, s, c, heads, lt=77, li=16):
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    x = jax.random.normal(ks[0], (b, s, c), jnp.bfloat16)
    ctx_t = jax.random.normal(ks[1], (b, lt, 1024), jnp.bfloat16)
    ctx_i = jax.random.normal(ks[2], (b, li, 1024), jnp.bfloat16)
    lnw = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    sc = (c ** -0.5) * 0.02
    wq = jax.random.normal(ks[3], (c, c), jnp.bfloat16) * sc
    wk = jax.random.normal(ks[4], (1024, c), jnp.bfloat16) * 0.01
    wv = jax.random.normal(ks[5], (1024, c), jnp.bfloat16) * 0.01
    wki = jax.random.normal(ks[6], (1024, c), jnp.bfloat16) * 0.01
    wvi = jax.random.normal(ks[7], (1024, c), jnp.bfloat16) * 0.01
    wo = jax.random.normal(ks[8], (c, c), jnp.bfloat16) * sc
    alpha = jnp.float32(0.2)
    args = (x, lnw, lnb, wq, wk, wv, wki, wvi, wo, ctx_t, ctx_i, alpha)
    ya = variant_a(*args, heads)
    yc = variant_c(*args, heads)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yc.astype(jnp.float32))))
    print(f"[{name}] max|a-c|={err:.2e}")
    ta = timeit(scan_of(lambda x_, *w: variant_a(x_, *w, heads)), *args)
    print(f"[{name}] A (two XLA attns): {ta*1e3:7.3f} ms", flush=True)
    tc = timeit(scan_of(lambda x_, *w: variant_c(x_, *w, heads)), *args)
    print(f"[{name}] C (block-diag)   : {tc*1e3:7.3f} ms", flush=True)
