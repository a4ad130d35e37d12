"""Flash fwd kernel block-size sweep at the UNet's ds1 attention shape.

_pick_block is monkeypatched per config and jax.clear_caches() runs
between configs so each (blk_q, blk_k) really recompiles.
"""
import time
import jax, jax.numpy as jnp

import tooncrafter_tpu.ops.flash_attention as fa

REPS = 20

def timeit(f, *a):
    float(jnp.mean(f(*a)[0].astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(f(*a)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS

bh, s, d = 160, 2560, 64   # B*T=32 x heads=5, ds1 spatial self-attn
q = jax.random.normal(jax.random.PRNGKey(0), (bh, s, d), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (bh, s, d), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (bh, s, d), jnp.bfloat16)
tf = bh * 2 * 2 * s * s * d / 1e12

orig = fa._pick_block
for bq, bk in [(1280, 1280), (1280, 512), (512, 512), (2560, 512),
               (640, 640), (256, 2560), (512, 2560)]:
    jax.clear_caches()
    state = {"n": 0}
    def pick(n, _bq=bq, _bk=bk, _state=state):
        _state["n"] += 1
        return _bq if _state["n"] % 2 == 1 else _bk
    fa._pick_block = pick
    try:
        @jax.jit
        def f(q, k, v):
            return fa._flash_bh_with_lse(q, k, v, d ** -0.5)
        t = timeit(f, q, k, v)
        print(f"blk_q={bq} blk_k={bk}: {t*1e3:.2f} ms ({tf/t:.0f} TF/s)",
              flush=True)
    finally:
        fa._pick_block = orig
