"""Structural variants of the fused temporal-attn PAIR kernel (round 4).

bench_tattn3 showed the VPU softmax toggles (recipmul/nodiv/bf16sm/
nomax/noexp/grp4) are all neutral-to-negative: the ~44 us/step of
non-MXU time is NOT softmax arithmetic. Remaining suspects, isolated
here:

  diagnostics (wrong math, measure cost):
    noattn    skip QK/softmax/PV entirely (out = q slice) — GEMM floor
    nosm      probs = masked logits rounded to bf16 — keeps every dot
              and slice, drops max/exp/sum/div
    noslice   every head reads lane slice [0:d] — measures the cost of
              the h*64 unaligned lane offsets

  candidates (exact math, maxdelta-checked vs base):
    grp16     pixel packing 16 (blk=256): half the batched-dot count,
              2x padded-attn FLOPs
    grp32     packing 32 (blk=512)
    perheadout  no concat: out-GEMM accumulated per head from the
              (tok, d) slice (K=64 dots, f32 acc)
    padded128 head stride padded 64->128 in wqkv/wout (zero lanes):
              every slice 128-aligned, QK/PV contract over 128

Usage: python tools/bench_tattn4.py
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
           *, pt, t, c, inner, heads, scale, eps, cdt, variant,
           inner_pad):
    d = inner // heads
    dp = inner_pad // heads          # head stride in the padded layout
    xf = xb.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    z = (xf - mean) * jax.lax.rsqrt(var + eps)
    z = z * lnw_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    z2 = z.astype(cdt).reshape(pt * t, c)
    grp = {"grp16": 16, "grp32": 32}.get(variant, 128 // t)
    packed = grp > 1 and pt % grp == 0
    nb_, blk = (pt // grp, grp * t) if packed else (pt, t)
    qkv = jax.lax.dot_general(
        z2, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) \
        .reshape(nb_, blk, 3 * inner_pad)
    if variant == "noattn":
        o = qkv[:, :, :inner_pad].reshape(pt * t, inner_pad)
        y = jax.lax.dot_general(
            o, wout_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt) + bout_ref[0]
        return xb + y.reshape(pt, t, c)
    if packed:
        ri = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
        bd_mask = jnp.where((ri // t) == (ci // t), 0.0,
                            -1e30).astype(jnp.float32)[None]
    outs = []
    acc = None
    for h in range(heads):
        base = 0 if variant == "noslice" else h * dp
        w = d if variant != "padded128" else dp
        qb = qkv[:, :, base:base + w]
        kb = qkv[:, :, inner_pad + base:inner_pad + base + w]
        vb = qkv[:, :, 2 * inner_pad + base:2 * inner_pad + base + w]
        logits = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if packed:
            logits = logits + bd_mask
        if variant == "nosm":
            probs = logits.astype(cdt)
        else:
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
        o = jax.lax.dot_general(
            probs, vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if variant == "perheadout":
            part = jax.lax.dot_general(
                o.astype(cdt).reshape(pt * t, d),
                wout_ref[h * d:(h + 1) * d, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        else:
            outs.append(o.astype(cdt))
    if variant == "perheadout":
        y = acc.astype(cdt) + bout_ref[0]
    else:
        o = jnp.concatenate(outs, axis=-1).reshape(pt * t, inner_pad)
        y = jax.lax.dot_general(
            o, wout_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt) + bout_ref[0]
    return xb + y.reshape(pt, t, c)


def pair_call(x, p1, p2, heads, scale, eps, pt, variant, inner_pad):
    b, p, t, c = x.shape
    cdt = x.dtype

    def kernel(x_ref, ln1w, ln1b, wqkv1, wout1, bout1,
               ln2w, ln2b, wqkv2, wout2, bout2, o_ref):
        kw = dict(pt=pt, t=t, c=c, inner=c, heads=heads, scale=scale,
                  eps=eps, cdt=cdt, variant=variant, inner_pad=inner_pad)
        y = _stage(x_ref[0], ln1w, ln1b, wqkv1, wout1, bout1, **kw)
        o_ref[0] = _stage(y, ln2w, ln2b, wqkv2, wout2, bout2, **kw)

    spec = pl.BlockSpec((1, pt, t, c), lambda bi, pi: (bi, pi, 0, 0))
    vec = pl.BlockSpec((1, c), lambda bi, pi: (0, 0))
    wspec = [vec, vec,
             pl.BlockSpec((c, 3 * inner_pad), lambda bi, pi: (0, 0)),
             pl.BlockSpec((inner_pad, c), lambda bi, pi: (0, 0)),
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


def pad_params(params, c, heads, d, dp):
    """Re-lay wqkv (c, 3*heads*d) -> (c, 3*heads*dp) and
    wout (heads*d, c) -> (heads*dp, c) with zero lanes per head."""
    lnw, lnb, wqkv, wout, bout = params
    inner, inner_p = heads * d, heads * dp
    w3 = wqkv.reshape(c, 3, heads, d)
    w3p = jnp.zeros((c, 3, heads, dp), wqkv.dtype).at[..., :d].set(w3)
    wop = jnp.zeros((heads, dp, c), wout.dtype).at[:, :d, :].set(
        wout.reshape(heads, d, c))
    return (lnw, lnb, w3p.reshape(c, 3 * inner_p),
            wop.reshape(inner_p, c), bout)


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


def run_site(name, b, p, t, c, heads, pt, variants):
    inner = c
    d = inner // heads
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (b, p, t, c), jnp.bfloat16)
    sc = (c ** -0.5) * 0.02

    def stage_params(k):
        kk = jax.random.split(k, 3)
        return (jnp.ones((1, c), jnp.float32),
                jnp.zeros((1, c), jnp.float32),
                jax.random.normal(kk[0], (c, 3 * inner), jnp.bfloat16) * sc,
                jax.random.normal(kk[1], (inner, c), jnp.bfloat16) * sc,
                jnp.zeros((1, c), jnp.bfloat16))

    p1, p2 = stage_params(ks[1]), stage_params(ks[2])
    scale = d ** -0.5
    tok = b * p * t
    gemm = 2 * (2 * tok * c * 3 * inner + 2 * tok * inner * c)
    gf = gemm / 1e9

    base_out = None
    results = {}
    for variant in variants:
        ip = inner if variant != "padded128" else heads * 128
        q1, q2 = (p1, p2) if ip == inner else (
            pad_params(p1, c, heads, d, 128), pad_params(p2, c, heads, d, 128))
        try:
            fn = scan_of(functools.partial(
                pair_call, heads=heads, scale=scale, eps=1e-5,
                pt=pt, variant=variant, inner_pad=ip))
            ms = timeit(fn, x, q1, q2) * 1e3
            y = pair_call(x, q1, q2, heads, scale, 1e-5, pt, variant, ip)
        except Exception as exc:
            print(f"[{name}] {variant}: FAIL "
                  f"{type(exc).__name__}: {exc}"[:300], flush=True)
            continue
        if variant == "base" and base_out is None:
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
    rec = {"name": "tattn_pair_struct_r4", "site": name, "gf": round(gf, 1),
           "pt": pt, "ms": results}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    vs = ["base", "noattn", "nosm", "noslice", "grp16", "grp32",
          "perheadout", "padded128"]
    run_site("ds1", 2, 2560, 16, 320, 5, pt=160, variants=vs)
    run_site("ds2", 2, 640, 16, 640, 10, pt=64, variants=vs)
    run_site("ds4", 2, 160, 16, 1280, 20, pt=32, variants=vs)
