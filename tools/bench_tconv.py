"""A/B the temporal-conv Pallas kernel vs its shifted-matmul XLA form."""
import time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import tooncrafter_tpu.ops.temporal_conv as tc
from tooncrafter_tpu.ops.norms import gn_affine

REPS = 20

def timeit(f, *a):
    float(jnp.mean(f(*a).astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(f(*a).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS

import sys
for (t, hh, ww, c) in [(16, 40, 64, 320), (16, 20, 32, 640)]:
    print(f'compiling {hh}x{ww}x{c}...', file=sys.stderr, flush=True)
    b = 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, hh, ww, c),
                          jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, c, c)) * 0.02
         ).astype(jnp.bfloat16)
    bias = jnp.zeros((c,), jnp.bfloat16)
    scale = jnp.ones((c,))
    gb = jnp.zeros((c,))

    def body(xx, use_pallas):
        aff = gn_affine(xx, scale, gb, 32, 1e-5)
        if use_pallas:
            return tc.temporal_conv3(xx, w, bias, affine=aff, silu=True)
        return tc._xla_tconv(xx, w, bias, aff[0], aff[1], None, True, False)

    def make(use_pallas):
        @jax.jit
        def f(x):
            def step(cr, _):
                return body(cr, use_pallas), jnp.float32(0)
            cr, _ = jax.lax.scan(step, x, None, length=REPS)
            return cr
        return f

    disp = tc._use_kernel(t, hh * ww, c, c)
    tp = timeit(make(True), x)
    tx = timeit(make(False), x)
    tf = b * t * hh * ww * 3 * c * c * 2 / 1e12
    print(f"T{t} {hh}x{ww}x{c} (dispatch={disp}): pallas {tp*1e3:.2f} ms "
          f"({tf/tp:.0f} TF/s)  xla {tx*1e3:.2f} ms ({tf/tx:.0f} TF/s)  "
          f"({tx/tp:.2f}x)", flush=True)
