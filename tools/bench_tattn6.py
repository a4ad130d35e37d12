"""`onescolv` variant of the fused temporal-attn pair kernel (round 4).

After bench_flash5's win, the same idea at the t-attn sites: per head,
PV runs dot(e, [v_h | ones]) with UNNORMALIZED probs e — the MXU's
otherwise-idle output lanes emit rowsum(e), the (blk, blk) lane-sum
reduction and the (blk, blk)-sized divide disappear, and the output
(blk, d) is normalized instead (blk x fewer divisions). The per-head
[v_h | ones] concat adds one (blk, d) copy on top of the existing
extract. l sums the same bf16-rounded e the PV dot consumes.

Usage: python tools/bench_tattn6.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 20
OUT = "/root/repo/.audit_r04.jsonl"


def _stage(xb, lnw_ref, lnb_ref, wqkv_ref, wout_ref, bout_ref,
           *, pt, t, c, inner, heads, scale, eps, cdt, variant):
    d = inner // heads
    xf = xb.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    z = (xf - mean) * jax.lax.rsqrt(var + eps)
    z = z * lnw_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    z2 = z.astype(cdt).reshape(pt * t, c)
    grp = 128 // t
    nb_, blk = pt // grp, grp * t
    qkv = jax.lax.dot_general(
        z2, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) \
        .reshape(nb_, blk, 3 * inner)
    ri = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    bd_mask = jnp.where((ri // t) == (ci // t), 0.0,
                        -1e30).astype(jnp.float32)[None]
    ones = jnp.ones((nb_, blk, 128 - d), cdt)
    outs = []
    for h in range(heads):
        qb = qkv[:, :, h * d:(h + 1) * d]
        kb = qkv[:, :, inner + h * d:inner + (h + 1) * d]
        vb = qkv[:, :, 2 * inner + h * d:2 * inner + (h + 1) * d]
        logits = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        logits = logits + bd_mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        if variant == "onescolv":
            vaug = jnp.concatenate([vb, ones], axis=-1)
            o = jax.lax.dot_general(
                e.astype(cdt), vaug, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # [e@v | rowsum]
            outs.append((o[:, :, :d] / o[:, :, d:d + 1]).astype(cdt))
        else:
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
            outs.append(jax.lax.dot_general(
                probs, vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(cdt))
    o = jnp.concatenate(outs, axis=-1).reshape(pt * t, inner)
    y = jax.lax.dot_general(
        o, wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) + bout_ref[0]
    return xb + y.reshape(pt, t, c)


def pair_call(x, p1, p2, heads, scale, eps, pt, variant):
    b, p, t, c = x.shape
    cdt = x.dtype

    def kernel(x_ref, ln1w, ln1b, wqkv1, wout1, bout1,
               ln2w, ln2b, wqkv2, wout2, bout2, o_ref):
        kw = dict(pt=pt, t=t, c=c, inner=c, heads=heads, scale=scale,
                  eps=eps, cdt=cdt, variant=variant)
        y = _stage(x_ref[0], ln1w, ln1b, wqkv1, wout1, bout1, **kw)
        o_ref[0] = _stage(y, ln2w, ln2b, wqkv2, wout2, bout2, **kw)

    spec = pl.BlockSpec((1, pt, t, c), lambda bi, pi: (bi, pi, 0, 0))
    vec = pl.BlockSpec((1, c), lambda bi, pi: (0, 0))
    wspec = [vec, vec,
             pl.BlockSpec((c, 3 * c), lambda bi, pi: (0, 0)),
             pl.BlockSpec((c, c), lambda bi, pi: (0, 0)),
             vec]
    return pl.pallas_call(
        kernel,
        grid=(b, p // pt),
        in_specs=[spec] + wspec + wspec,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, p, t, c), cdt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, *p1, *p2)


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
    def f(x, p1, p2):
        def step(cv, _):
            return fn(cv, p1, p2).astype(cv.dtype), jnp.float32(0)
        cv, _ = jax.lax.scan(step, x, None, length=REPS)
        return cv
    return f


def run_site(name, b, p, t, c, heads, pt):
    d = c // heads
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (b, p, t, c), jnp.bfloat16)
    sc = (c ** -0.5) * 0.02

    def stage_params(k):
        kk = jax.random.split(k, 3)
        return (jnp.ones((1, c), jnp.float32),
                jnp.zeros((1, c), jnp.float32),
                jax.random.normal(kk[0], (c, 3 * c), jnp.bfloat16) * sc,
                jax.random.normal(kk[1], (c, c), jnp.bfloat16) * sc,
                jnp.zeros((1, c), jnp.bfloat16))

    p1, p2 = stage_params(ks[1]), stage_params(ks[2])
    scale = d ** -0.5
    tok = b * p * t
    gf = 2 * (2 * tok * c * 3 * c + 2 * tok * c * c) / 1e9

    base_out = None
    results = {}
    for variant in ("base", "onescolv"):
        try:
            fn = scan_of(functools.partial(
                pair_call, heads=heads, scale=scale, eps=1e-5,
                pt=pt, variant=variant))
            ms = timeit(fn, x, p1, p2) * 1e3
            y = pair_call(x, p1, p2, heads, scale, 1e-5, pt, variant)
        except Exception as exc:
            print(f"[{name}] {variant}: FAIL "
                  f"{type(exc).__name__}: {exc}"[:300], flush=True)
            continue
        if variant == "base":
            base_out = y.astype(jnp.float32)
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(
                y.astype(jnp.float32) - base_out))) \
                if base_out is not None else float("nan")
        results[variant] = round(ms, 3)
        print(f"[{name}] {variant:10s}: {ms:7.3f} ms ({gf/ms:6.1f} TF/s) "
              f"maxdelta={err:.2e}", flush=True)
        jax.clear_caches()
    rec = {"name": "tattn_onescolv_r4", "site": name, "gf": round(gf, 1),
           "pt": pt, "ms": results}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    run_site("ds1", 2, 2560, 16, 320, 5, pt=160)
    run_site("ds2", 2, 640, 16, 640, 10, pt=64)
    run_site("ds4", 2, 160, 16, 1280, 20, pt=32)
