"""A/B a single-KV-pass flash-attention variant against the production
kernel at the UNet attn1 shapes.

Variant ideas under test (all exact softmax, no approximation):
  - blk_k == Sk: one pass over KV per q block -> no online-softmax
    rescale (no running max/l correction multiplies on the s tile)
  - exp2 with log2(e) folded into the QK scale (TPU's exp lowers to
    exp2 * mul; folding removes one VPU multiply per logit)
  - divide by the row-sum AFTER the PV matmul ([bq, d] divide instead
    of [bq, sk])

Usage: python tools/bench_flash3.py
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


@functools.partial(jax.jit, static_argnames=("scale", "blk_q"))
def flash_single_pass(q, k, v, scale: float, blk_q: int):
    """(BH, Sq, D) x (BH, Sk, D); full KV resident per q block."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    n_q = sq // blk_q
    s2 = scale * LOG2E

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
        qb = q_ref[0]
        kb = k_ref[0]
        vb = v_ref[0]
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * s2
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = (acc / l).astype(o_ref.dtype)
        lse_ref[0] = (m + jnp.log2(l)) * 0.6931471805599453

    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, n_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda b, i: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)
    return out, lse


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
    def f(q, k, v):
        def step(c, _):
            o = fn(c, k, v)
            return o.astype(c.dtype), jnp.float32(0)
        c, _ = jax.lax.scan(step, q, None, length=REPS)
        return c
    return f


def run_site(name, bh, sq, sk, d):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (bh, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, sk, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, sk, d), jnp.bfloat16)
    tf = bh * 4 * sq * sk * d / 1e12
    scale = d ** -0.5

    # numeric check vs production kernel
    o_ref, lse_ref = fa._flash_bh_with_lse(q, k, v, scale)
    o_new, lse_new = flash_single_pass(q, k, v, scale, min(sq, 1280))
    err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32)
                                - o_new.astype(jnp.float32))))
    lerr = float(jnp.max(jnp.abs(lse_ref - lse_new)))
    print(f"[{name}] max|o-o'|={err:.2e} max|lse-lse'|={lerr:.2e}")

    t = timeit(scan_of(lambda q_, k_, v_: fa._flash_bh(q_, k_, v_, scale)),
               q, k, v)
    print(f"[{name}] production            : {t*1e3:7.3f} ms ({tf/t:5.0f} TF/s)")
    for bq in (2560, 1280, 640, 512, 320, 256):
        if sq % bq:
            continue
        jax.clear_caches()
        try:
            t = timeit(scan_of(lambda q_, k_, v_, b=bq: flash_single_pass(
                q_, k_, v_, scale, b)[0]), q, k, v)
            print(f"[{name}] single-pass bq={bq:4d}  : {t*1e3:7.3f} ms "
                  f"({tf/t:5.0f} TF/s)", flush=True)
        except Exception as e:
            print(f"[{name}] single-pass bq={bq}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    run_site("ds1 attn1", 160, 2560, 2560, 64)
    run_site("ds2 attn1", 320, 640, 640, 64)
    run_site("fusion-site", 8, 10240, 20480, 64)
