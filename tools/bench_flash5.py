"""Flash-forward `onescol` variant: softmax row-sums on the MXU's idle
output lanes (round 4).

At d=64 the PV dot's N=64 output uses half the MXU's 128 output lanes.
Padding V to (sk, 128) with ONES in columns 64:128 makes the same dot
emit [p@v | rowsum(p) broadcast 64 wide] — the per-half f32 lane-sum
reduction over (blk_q, blk_k) disappears, and the running state unifies
into one (blk_q, 128) accumulator [acc | l] updated elementwise (no
lane extracts anywhere; the final normalize is an elementwise divide of
the two halves). Numerics: l now sums the SAME bf16-rounded p the PV
dot consumes (f32 accumulate) — if anything more self-consistent than
the f32-summed l; |delta| is bf16-noise.

Sites: the dual-ref decode fusion attention (bh=8, 163840x20480 —
33% of a decode pass at 71 TF/s) and a UNet-attn1-like shape.

Usage: python tools/bench_flash5.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = "/root/repo/.audit_r04.jsonl"
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def flash_fwd(q, k, v, scale, blk_q, blk_k, halves, variant):
    bh, sq, d = q.shape
    sk = k.shape[1]
    step_k = blk_k * halves
    n_q = sq // blk_q
    n_k = sk // step_k
    s2 = scale * _LOG2E
    ones = variant == "onescol"
    dv = 2 * d if ones else d
    if ones:
        v = jnp.concatenate(
            [v, jnp.ones((bh, sk, d), v.dtype)], axis=-1)

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref,
               *rest):
        kv_i = pl.program_id(2)

        @pl.when(kv_i == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
            if not ones:
                rest[0][:] = jnp.zeros_like(rest[0])

        qb = q_ref[0]
        ss = []
        for h in range(halves):
            kb = k_ref[0, h * blk_k:(h + 1) * blk_k]
            ss.append(jax.lax.dot_general(
                qb, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * s2)

        m_prev = m_ref[:]
        m_cur = jnp.max(ss[0], axis=-1, keepdims=True)
        for s in ss[1:]:
            m_cur = jnp.maximum(m_cur, jnp.max(s, axis=-1, keepdims=True))
        m_new = jnp.maximum(m_prev[:, :1], m_cur)
        correction = jnp.exp2(m_prev[:, :1] - m_new)
        if ones:
            pv = None
            for h, s in enumerate(ss):
                p = jnp.exp2(s - m_new)
                vb = v_ref[0, h * blk_k:(h + 1) * blk_k]
                t = jax.lax.dot_general(
                    p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pv = t if pv is None else pv + t
            acc_ref[:] = acc_ref[:] * correction + pv
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

            @pl.when(kv_i == n_k - 1)
            def _finish():
                a = acc_ref[:]
                o_ref[0] = (a[:, :d] / a[:, d:]).astype(o_ref.dtype)
                lse_ref[0] = (m_ref[:, :1]
                              + jnp.log2(a[:, d:d + 1])) * _LN2
        else:
            l_ref = rest[0]
            l_new = correction * l_ref[:, :1]
            pv = None
            for h, s in enumerate(ss):
                p = jnp.exp2(s - m_new)
                l_new = l_new + jnp.sum(p, axis=-1, keepdims=True)
                vb = v_ref[0, h * blk_k:(h + 1) * blk_k]
                t = jax.lax.dot_general(
                    p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pv = t if pv is None else pv + t
            acc_ref[:] = acc_ref[:] * correction + pv
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

            @pl.when(kv_i == n_k - 1)
            def _finish():
                o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)
                lse_ref[0] = (m_ref[:, :1]
                              + jnp.log2(l_ref[:, :1])) * _LN2

    scratch = [pltpu.VMEM((blk_q, 2 * d if ones else d), jnp.float32),
               pltpu.VMEM((blk_q, 128), jnp.float32)]
    if not ones:
        scratch.append(pltpu.VMEM((blk_q, 128), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, step_k, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, step_k, dv), lambda b_, i, j: (b_, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda b_, i, j: (b_, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)


def timeit(f, *a, reps):
    jax.block_until_ready(f(*a))
    float(jnp.mean(f(*a)[0].astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*a)
        float(jnp.mean(o[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def run_site(name, bh, sq, sk, d, blk_q, blk_k, reps, configs):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (bh, sq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (bh, sk, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (bh, sk, d), jnp.bfloat16)
    scale = d ** -0.5
    tf = 4 * bh * sq * sk * d / 1e12

    base_out = None
    results = {}
    for label, variant, halves in configs:
        fn = jax.jit(functools.partial(
            flash_fwd, scale=scale, blk_q=blk_q, blk_k=blk_k,
            halves=halves, variant=variant))
        try:
            ms = timeit(fn, q, k, v, reps=reps) * 1e3
            y = fn(q, k, v)[0]
        except Exception as exc:
            print(f"[{name}] {label}: FAIL "
                  f"{type(exc).__name__}: {exc}"[:300], flush=True)
            continue
        if base_out is None:
            base_out = y.astype(jnp.float32)
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - base_out)))
        results[label] = round(ms, 2)
        print(f"[{name}] {label:12s}: {ms:8.2f} ms ({tf*1e3/ms:6.1f} TF/s)"
              f" maxdelta={err:.2e}", flush=True)
        jax.clear_caches()
    rec = {"name": "flash_onescol_r4", "site": name, "tf": round(tf, 2),
           "blk": [blk_q, blk_k], "ms": results}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    cfgs = [("base_h4", "base", 4), ("onescol_h4", "onescol", 4),
            ("onescol_h2", "onescol", 2)]
    # dual-ref decode inject_2 fusion attention
    run_site("inject2", 8, 163840, 20480, 64, 512, 1024, 3, cfgs)
    # UNet attn1-like (batch*heads=160, S=2560)
    cfgs2 = [("base_h2", "base", 2), ("onescol_h2", "onescol", 2),
             ("onescol_h1", "onescol", 1)]
    run_site("attn1ish", 160, 2560, 2560, 64, 512, 1280, 10, cfgs2)
