"""Variant sweep of the fused temporal attn PAIR kernel (round 4).

In-loop truth (trace /tmp/denoise_r4): the ds1 pair kernels run 1.94 ms
= 83 TF/s (42% MFU) vs ds2's 132 TF/s. Per grid step the MXU work is
~17 us but the step takes ~61 us — this sweep isolates the non-MXU
costs (softmax exp/div over the 8x-padded block-diagonal scores, the
max-subtraction, per-head lane slices) by toggling each.

Variants:
  base     current production kernel semantics
  recipmul probs = e * (1/sum)  (reciprocal+mul instead of lane divide)
  nodiv    unnormalized PV, out rows scaled by 1/sum afterwards (8x less
           division work; numerically identical in exact arithmetic,
           f32-rounding-level difference in practice)
  bf16sm   probs rounded to bf16 before divide (e stays f32)
  nomax    skip the max subtraction (DIAGNOSTIC — unsafe, measures cost)
  noexp    probs = masked logits (DIAGNOSTIC — wrong math, measures exp)
  grp4     pixel packing group of 4 (blk=64) instead of 8 (blk=128)

Usage: python tools/bench_tattn3.py
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
    grp = (4 if variant == "grp4" else 128 // t)
    packed = grp > 1 and pt % grp == 0
    nb_, blk = (pt // grp, grp * t) if packed else (pt, t)
    qkv = jax.lax.dot_general(
        z2, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) \
        .reshape(nb_, blk, 3 * inner)
    if packed:
        ri = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
        bd_mask = jnp.where((ri // t) == (ci // t), 0.0,
                            -1e30).astype(jnp.float32)[None]
    outs = []
    for h in range(heads):
        qb = qkv[:, :, h * d:(h + 1) * d]
        kb = qkv[:, :, inner + h * d:inner + (h + 1) * d]
        vb = qkv[:, :, 2 * inner + h * d:2 * inner + (h + 1) * d]
        logits = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if packed:
            logits = logits + bd_mask
        if variant == "noexp":
            e = logits
            s = jnp.sum(e, axis=-1, keepdims=True)
            probs = (e / s).astype(cdt)
        elif variant == "nomax":
            e = jnp.exp(logits)
            s = jnp.sum(e, axis=-1, keepdims=True)
            probs = (e / s).astype(cdt)
        else:
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            s = jnp.sum(e, axis=-1, keepdims=True)
            if variant == "recipmul":
                probs = (e * (1.0 / s)).astype(cdt)
            elif variant == "bf16sm":
                probs = (e / s).astype(jnp.bfloat16).astype(cdt)
            elif variant == "nodiv":
                probs = e.astype(cdt)
            else:
                probs = (e / s).astype(cdt)
        o = jax.lax.dot_general(
            probs, vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if variant == "nodiv":
            o = o * (1.0 / s)
        outs.append(o.astype(cdt))
    o = jnp.concatenate(outs, axis=-1).reshape(pt * t, inner)
    y = jax.lax.dot_general(
        o, wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) + bout_ref[0]
    return xb + y.reshape(pt, t, c)


def pair_call(x, p1, p2, heads, scale, eps, pt, variant):
    b, p, t, c = x.shape
    inner = p1[2].shape[1] // 3
    cdt = x.dtype

    def kernel(x_ref, ln1w, ln1b, wqkv1, wout1, bout1,
               ln2w, ln2b, wqkv2, wout2, bout2, o_ref):
        kw = dict(pt=pt, t=t, c=c, inner=inner, heads=heads, scale=scale,
                  eps=eps, cdt=cdt, variant=variant)
        y = _stage(x_ref[0], ln1w, ln1b, wqkv1, wout1, bout1, **kw)
        o_ref[0] = _stage(y, ln2w, ln2b, wqkv2, wout2, bout2, **kw)

    spec = pl.BlockSpec((1, pt, t, c), lambda bi, pi: (bi, pi, 0, 0))
    vec = pl.BlockSpec((1, c), lambda bi, pi: (0, 0))
    wspec = [vec, vec,
             pl.BlockSpec((c, 3 * inner), lambda bi, pi: (0, 0)),
             pl.BlockSpec((inner, c), lambda bi, pi: (0, 0)),
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
        interpret=False,
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


def run_site(name, b, p, t, c, heads, pts, variants):
    inner = c
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (b, p, t, c), jnp.bfloat16)
    sc = (c ** -0.5) * 0.02

    def stage_params(k):
        kk = jax.random.split(k, 3)
        return (jnp.ones((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32),
                jax.random.normal(kk[0], (c, 3 * inner), jnp.bfloat16) * sc,
                jax.random.normal(kk[1], (inner, c), jnp.bfloat16) * sc,
                jnp.zeros((1, c), jnp.bfloat16))

    p1, p2 = stage_params(ks[1]), stage_params(ks[2])
    scale = (inner // heads) ** -0.5
    # FLOPs per pair call (packed blk=128 accounting, grid-realized)
    tok = b * p * t
    gemm = 2 * (2 * tok * c * 3 * inner + 2 * tok * inner * c)
    blk = 128
    attn = 2 * heads * 2 * 2 * (tok // t) * blk * 64 * 2  # rough
    gf = (gemm + attn) / 1e9

    base_out = None
    results = {}
    for variant in variants:
        for pt in pts:
            if p % pt:
                continue
            try:
                fn = scan_of(functools.partial(
                    pair_call, heads=heads, scale=scale, eps=1e-5,
                    pt=pt, variant=variant))
                ms = timeit(fn, x, p1, p2) * 1e3
            except Exception as exc:  # OOM etc
                print(f"[{name}] {variant} pt{pt}: FAIL "
                      f"{type(exc).__name__}: {exc}"[:200], flush=True)
                continue
            y = pair_call(x, p1, p2, heads, scale, 1e-5, pt, variant)
            if variant == "base" and base_out is None:
                base_out = y.astype(jnp.float32)
                err = 0.0
            else:
                err = float(jnp.max(jnp.abs(
                    y.astype(jnp.float32) - base_out))) \
                    if base_out is not None else float("nan")
            results[f"{variant}_pt{pt}"] = round(ms, 3)
            print(f"[{name}] {variant:9s} pt{pt:4d}: {ms:7.3f} ms "
                  f"({gf/ms:6.1f} TF/s) maxdelta={err:.2e}", flush=True)
            jax.clear_caches()
    rec = {"name": "tattn_pair_sweep_r4", "site": name, "gf": round(gf, 1),
           "ms": results}
    with open("/root/repo/.audit_r04.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    vs = ["base", "recipmul", "nodiv", "bf16sm", "nomax", "noexp", "grp4"]
    run_site("ds1", 2, 2560, 16, 320, 5, pts=(160,), variants=vs)
    run_site("ds2", 2, 640, 16, 640, 10, pts=(64,), variants=vs)
