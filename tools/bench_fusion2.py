"""Block sweep for the REAL dual-ref fusion attention shape.

The level-2 fusion site folds all 16 frames into the query axis:
(bh=8, Sq=163840, Sk=20480, d=64) — tools/bench_flash2.py swept the
per-frame Sq=10240 proxy instead, so the in-context block choice
(1024, 2048 via _pick_fwd_blocks) was never validated at the true shape.
One decode spends ~98.6 ms in this single kernel (30.5% of decode).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import jax, jax.numpy as jnp
import tooncrafter_tpu.ops.flash_attention as fa

REPS = 5


def timeit(f, *a):
    float(jnp.mean(f(*a).astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(f(*a).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS


orig = fa._pick_fwd_blocks


def run(bh, sq, sk, d, bq, bk):
    jax.clear_caches()
    q = jax.random.normal(jax.random.PRNGKey(0), (bh, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, sk, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, sk, d), jnp.bfloat16)
    tf = bh * 4 * sq * sk * d / 1e12
    fa._pick_fwd_blocks = lambda s_, k_: (bq, bk)
    try:
        @jax.jit
        def f(q, k, v):
            def step(c, _):
                o, _lse = fa._flash_bh_with_lse(c, k, v, d ** -0.5)
                return o.astype(c.dtype), jnp.float32(0)
            c, _ = jax.lax.scan(step, q, None, length=REPS)
            return c

        t = timeit(f, q, k, v)
        print(f"bh={bh} {sq}x{sk} d={d} bq={bq} bk={bk}: {t*1e3:.2f} ms "
              f"({tf/t:.0f} TF/s)", flush=True)
    except Exception as e:  # noqa: BLE001 — sweep survives bad configs
        print(f"bh={bh} {sq}x{sk} d={d} bq={bq} bk={bk}: FAILED {e}",
              flush=True)
    finally:
        fa._pick_fwd_blocks = orig


SHAPE = (8, 163840, 20480, 64)
for bq, bk in [(1024, 2048), (1024, 4096), (512, 4096), (512, 2048),
               (1280, 2048), (256, 20480), (512, 10240), (2048, 2048)]:
    run(*SHAPE, bq, bk)
# level-3 site for reference
for bq, bk in [(1024, 2048), (512, 5120), (1024, 1024)]:
    run(8, 40960, 5120, 64, bq, bk)
