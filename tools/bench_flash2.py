"""Refine flash block choices: op chained REPS times inside one jit."""
import time
import jax, jax.numpy as jnp
import tooncrafter_tpu.ops.flash_attention as fa

REPS = 20

def timeit(f, *a):
    float(jnp.mean(f(*a).astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(f(*a).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS

orig = fa._pick_block

def run(bh, sq, sk, d, bq, bk):
    jax.clear_caches()
    q = jax.random.normal(jax.random.PRNGKey(0), (bh, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, sk, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, sk, d), jnp.bfloat16)
    tf = bh * 4 * sq * sk * d / 1e12
    state = {"n": 0}
    def pick(n, _state=state):
        _state["n"] += 1
        return bq if _state["n"] % 2 == 1 else bk
    fa._pick_block = pick
    try:
        @jax.jit
        def f(q, k, v):
            def step(c, _):
                o, _lse = fa._flash_bh_with_lse(c, k, v, d ** -0.5)
                return o.astype(c.dtype), jnp.float32(0)
            c, _ = jax.lax.scan(step, q, None, length=REPS)
            return c
        t = timeit(f, q, k, v)
        print(f"bh={bh} {sq}x{sk} d={d} bq={bq} bk={bk}: {t*1e3:.3f} ms "
              f"({tf/t:.0f} TF/s)", flush=True)
    finally:
        fa._pick_block = orig

for bq, bk in [(1280, 1280), (256, 2560), (320, 2560), (512, 512)]:
    run(160, 2560, 2560, 64, bq, bk)
for bq, bk in [(640, 640), (256, 640)]:
    run(320, 640, 640, 64, bq, bk)
for bq, bk in [(1024, 1024), (512, 2048), (1280, 1280)]:
    run(8, 10240, 20480, 64, bq, bk)
