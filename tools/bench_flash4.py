"""A/B: split each flash K-step into two half-blocks inside ONE grid
step so Mosaic can overlap the softmax VPU work of half 1 with the
QK/PV MXU dots of half 2.

The streamed flash kernel walks K blocks as the grid's 'arbitrary'
dimension — one block per grid step, so the per-block chain
QK (MXU) -> softmax (VPU) -> PV (MXU) serializes across the whole
sweep and pins the fusion-attention sites at ~65-70 TF/s vs the ~98
TF/s d=64 ceiling (block-size sweeps measured a wash — the VPU/MXU
ratio is per-logit and block-size-invariant). Processing two halves
per step with a JOINT running-max update gives the scheduler
independent MXU work to run under the exp2 passes; the math is the
standard flash update at block size 2*bk (identical modulo f32
reassociation, which flash already does).

Usage: python tools/bench_flash4.py [--out /root/repo/.audit_r03.jsonl]
"""
import argparse
import functools
import json
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453
REPS = 10


@functools.partial(jax.jit, static_argnames=("scale", "blk_q", "blk_k",
                                             "halves"))
def flash_halved(q, k, v, scale: float, blk_q: int, blk_k: int,
                 halves: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, sq, d = q.shape
    sk = k.shape[1]
    step_k = blk_k * halves
    n_q = sq // blk_q
    n_k = sk // step_k
    s2 = scale * _LOG2E

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref):
        kv_i = pl.program_id(2)

        @pl.when(kv_i == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[:] = jnp.zeros_like(l_ref)

        qb = q_ref[0]
        ss = []
        for h in range(halves):
            kb = k_ref[0, h * blk_k:(h + 1) * blk_k]
            ss.append(jax.lax.dot_general(
                qb, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * s2)
        m_prev = m_ref[:]
        m_cur = jnp.max(ss[0], axis=-1, keepdims=True)
        for s_ in ss[1:]:
            m_cur = jnp.maximum(m_cur, jnp.max(s_, axis=-1, keepdims=True))
        m_new = jnp.maximum(m_prev[:, :1], m_cur)
        correction = jnp.exp2(m_prev[:, :1] - m_new)
        l_new = correction * l_ref[:, :1]
        pv = None
        for h, s_ in enumerate(ss):
            p = jnp.exp2(s_ - m_new)
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
            lse_ref[0] = (m_ref[:, :1] + jnp.log2(l_ref[:, :1])) * _LN2

    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, step_k, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, step_k, d), lambda b_, i, j: (b_, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda b_, i, j: (b_, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_q, d), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v)
    return out, lse


def timeit(f, *a):
    o = f(*a)
    float(jnp.mean(o[0].astype(jnp.float32)))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        o = f(*a)
        float(jnp.mean(o[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.audit_r03.jsonl")
    args = ap.parse_args()
    from tooncrafter_tpu.ops import flash_attention as fa

    shapes = [  # (bh, sq, sk, d) = the dual-ref inject fusion sites
        (8, 163840, 20480, 64),   # inject_2 (80x128), 6.87 TF
        (8, 40960, 5120, 64),     # inject_3 (40x64)
    ]
    rows = []
    for bh, sq, sk, d in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (bh, sq, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (bh, sk, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (bh, sk, d), jnp.bfloat16)
        scale = d ** -0.5
        tf = 2 * bh * sq * sk * d * 2 / 1e12
        res = {}

        base = timeit(lambda q, k, v: fa._flash_bh_with_lse(q, k, v, scale), q, k, v)
        res["base"] = round(base, 2)
        print(f"bh={bh} sq={sq} sk={sk}: base {base:.2f} ms "
              f"({tf/base*1e3:.0f} TF/s)", flush=True)
        ob = fa._flash_bh_with_lse(q, k, v, scale)
        for halves, bq, bk in [(2, 512, 1024), (2, 1024, 1024),
                               (2, 512, 2048), (4, 512, 1024),
                               (2, 1024, 2048)]:
            if sk % (bk * halves) or sq % bq:
                continue
            try:
                f = lambda q, k, v: flash_halved(q, k, v, scale, bq, bk,
                                                 halves)
                ms = timeit(f, q, k, v)
                o = f(q, k, v)
                dmax = float(jnp.max(jnp.abs(
                    o[0].astype(jnp.float32) - ob[0].astype(jnp.float32))))
                res[f"h{halves}_bq{bq}_bk{bk}"] = round(ms, 2)
                print(f"  h{halves} bq={bq} bk={bk}: {ms:.2f} ms "
                      f"({tf/ms*1e3:.0f} TF/s)  max|d|={dmax:.1e}",
                      flush=True)
            except Exception as e:
                print(f"  h{halves} bq={bq} bk={bk}: FAIL {str(e)[:120]}",
                      flush=True)
        rows.append({"name": "flash_halved_ab", "bh": bh, "sq": sq,
                     "sk": sk, "tf": round(tf, 2), "ms": res})
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
