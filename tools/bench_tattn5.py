"""Aligned-layout variants of the fused temporal-attn PAIR kernel (round 4b).

bench_tattn4 localized the pair kernel's structural overhead: `noslice`
(all heads read lane offset 0) recovers 1.02/0.48/0.37 ms at ds1/ds2/ds4,
while `padded128` (aligned via 128-lane head stride) loses because it
doubles the QKV/out GEMM contractions. These variants get the alignment
without the GEMM doubling — all EXACT math (maxdelta-checked vs base):

  pairmask   weight columns regrouped into per-head-PAIR slots
             [qq|kk|vv] of 128 lanes each (register-aligned views, no
             extracts); per pair, TWO 128-contraction dots against
             lane-masked kk/vv recover the per-head logits/outputs
             (the mask zeros are exact). Odd head counts pad one
             phantom head of zero weight columns. wout rows stay in
             natural head order (+ zero rows for the phantom).
  slotalign  same slot regrouping, but per-head 64-wide extracts at
             half-register offsets (tests whether [64:128]-style
             extracts are cheap like [0:64] or cost like misaligned).
  mxusum     base layout; softmax row-sum computed on the MXU as
             e @ ones(blk,128) (kills the 128-lane VPU reduction AND
             the reciprocal broadcast — the sum arrives replicated
             across lanes); requires blk == 128.
  pairmask_mxusum  both.

Usage: python tools/bench_tattn5.py
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


def _softmax(logits, cdt, mxu):
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    if mxu and logits.shape[-1] == 128:
        ones = jnp.ones((128, 128), jnp.float32)
        s = jax.lax.dot_general(
            e, ones, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (e * jax.lax.reciprocal(s)).astype(cdt)
    return (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)


def _stage(xb, lnw_ref, lnb_ref, wqkv_ref, wout_ref, bout_ref,
           *, pt, t, c, inner, heads, scale, eps, cdt, variant):
    d = inner // heads
    nslots = (heads + 1) // 2
    xf = xb.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    z = (xf - mean) * jax.lax.rsqrt(var + eps)
    z = z * lnw_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    z2 = z.astype(cdt).reshape(pt * t, c)
    grp = 128 // t
    nb_, blk = pt // grp, grp * t
    qw = 3 * inner if variant in ("base", "mxusum") else nslots * 384
    mxu = variant in ("mxusum", "pairmask_mxusum")
    qkv = jax.lax.dot_general(
        z2, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) \
        .reshape(nb_, blk, qw)
    ri = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    bd_mask = jnp.where((ri // t) == (ci // t), 0.0,
                        -1e30).astype(jnp.float32)[None]
    outs = []
    if variant == "pairmask" or variant == "pairmask_mxusum":
        li = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
        m0 = (li < 64).astype(cdt)
        m1 = (li >= 64).astype(cdt)
        for p in range(nslots):
            s = p * 384
            qq = qkv[:, :, s:s + 128]
            kk = qkv[:, :, s + 128:s + 256]
            vv = qkv[:, :, s + 256:s + 384]
            acc = None
            for m in (m0, m1):
                logits = jax.lax.dot_general(
                    qq, kk * m, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale
                logits = logits + bd_mask
                probs = _softmax(logits, cdt, mxu)
                o = jax.lax.dot_general(
                    probs, vv * m, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                acc = o if acc is None else acc + o
            outs.append(acc.astype(cdt))
        width = nslots * 128
    elif variant == "slotalign":
        for h in range(heads):
            s, off = (h // 2) * 384, (h % 2) * 64
            qb = qkv[:, :, s + off:s + off + d]
            kb = qkv[:, :, s + 128 + off:s + 128 + off + d]
            vb = qkv[:, :, s + 256 + off:s + 256 + off + d]
            logits = jax.lax.dot_general(
                qb, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            logits = logits + bd_mask
            probs = _softmax(logits, cdt, mxu)
            outs.append(jax.lax.dot_general(
                probs, vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(cdt))
        width = heads * d
    else:  # base / mxusum
        for h in range(heads):
            qb = qkv[:, :, h * d:(h + 1) * d]
            kb = qkv[:, :, inner + h * d:inner + (h + 1) * d]
            vb = qkv[:, :, 2 * inner + h * d:2 * inner + (h + 1) * d]
            logits = jax.lax.dot_general(
                qb, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            logits = logits + bd_mask
            probs = _softmax(logits, cdt, mxu)
            outs.append(jax.lax.dot_general(
                probs, vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(cdt))
        width = inner
    o = jnp.concatenate(outs, axis=-1).reshape(pt * t, width)
    y = jax.lax.dot_general(
        o, wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) + bout_ref[0]
    return xb + y.reshape(pt, t, c)


def regroup(params, c, heads, d, variant):
    """wqkv (c, 3*inner) -> slot layout; wout (inner, c) -> matching rows."""
    if variant in ("base", "mxusum"):
        return params
    lnw, lnb, wqkv, wout, bout = params
    inner = heads * d
    nslots = (heads + 1) // 2
    hp = 2 * nslots                      # heads incl. phantom
    wq = wqkv[:, :inner].reshape(c, heads, d)
    wk = wqkv[:, inner:2 * inner].reshape(c, heads, d)
    wv = wqkv[:, 2 * inner:].reshape(c, heads, d)
    if hp != heads:
        pad = jnp.zeros((c, 1, d), wqkv.dtype)
        wq, wk, wv = (jnp.concatenate([w, pad], 1) for w in (wq, wk, wv))
    # slot p columns: [q_{2p} q_{2p+1} | k pair | v pair]
    slots = []
    for p in range(nslots):
        for w in (wq, wk, wv):
            slots.append(w[:, 2 * p:2 * p + 2].reshape(c, 2 * d))
    w_slot = jnp.concatenate(slots, axis=1)          # (c, nslots*384)
    if variant == "pairmask" or variant == "pairmask_mxusum":
        wo = wout
        if hp != heads:
            wo = jnp.concatenate(
                [wout, jnp.zeros((d, c), wout.dtype)], 0)
        return (lnw, lnb, w_slot, wo, bout)
    return (lnw, lnb, w_slot, wout, bout)            # slotalign


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

    def wspec(st):
        return [vec, vec,
                pl.BlockSpec(st[2].shape, lambda bi, pi: (0, 0)),
                pl.BlockSpec(st[3].shape, lambda bi, pi: (0, 0)),
                vec]

    return pl.pallas_call(
        kernel,
        grid=(b, p // pt),
        in_specs=[spec] + wspec(p1) + wspec(p2),
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
    gf = 2 * (2 * tok * c * 3 * inner + 2 * tok * inner * c) / 1e9

    base_out = None
    results = {}
    for variant in variants:
        q1 = regroup(p1, c, heads, d, variant)
        q2 = regroup(p2, c, heads, d, variant)
        try:
            fn = scan_of(functools.partial(
                pair_call, heads=heads, scale=scale, eps=1e-5,
                pt=pt, variant=variant))
            ms = timeit(fn, x, q1, q2) * 1e3
            y = pair_call(x, q1, q2, heads, scale, 1e-5, pt, variant)
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
        print(f"[{name}] {variant:16s}: {ms:7.3f} ms ({gf/ms:6.1f} TF/s) "
              f"maxdelta={err:.2e}", flush=True)
        jax.clear_caches()
    rec = {"name": "tattn_pair_align_r4", "site": name, "gf": round(gf, 1),
           "pt": pt, "ms": results}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    vs = ["base", "pairmask", "slotalign", "mxusum", "pairmask_mxusum"]
    run_site("ds1", 2, 2560, 16, 320, 5, pt=160, variants=vs)
    run_site("ds2", 2, 640, 16, 640, 10, pt=64, variants=vs)
    run_site("ds4", 2, 160, 16, 1280, 20, pt=32, variants=vs)
