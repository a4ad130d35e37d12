"""Micro-bench: Pallas fused GN+SiLU+conv3x3 vs XLA (norm+conv) at UNet
shapes, repeated inside one jit."""
import time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import tooncrafter_tpu.ops.spatial_conv as sc
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

for (h, w, cin, cout) in [(40, 64, 320, 320), (40, 64, 640, 320),
                          (20, 32, 640, 640), (10, 16, 1280, 1280)]:
    n = 32
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, cin), jnp.bfloat16)
    k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout)) * 0.02).astype(jnp.bfloat16)
    bias = jnp.zeros((cout,), jnp.bfloat16)
    scale = jnp.ones((cin,))
    gbias = jnp.zeros((cin,))

    def fix(y):
        if y.shape[-1] == cin:
            return y
        if y.shape[-1] > cin:
            return y[..., :cin]
        return jnp.concatenate([y] * (cin // y.shape[-1]), -1)

    def body_pallas(c, k):
        aff = gn_affine(c, scale, gbias, 32, 1e-5)
        return fix(sc.gn_silu_conv3x3(c, aff, k, bias))

    def body_xla(c, k):
        aff = gn_affine(c, scale, gbias, 32, 1e-5)
        return fix(sc._xla_impl(c, aff[0], aff[1], k, bias, None, True, False))

    def make(body):
        @jax.jit
        def f(x, k):
            def step(c, _):
                return body(c, k), jnp.float32(0)
            c, _ = jax.lax.scan(step, x, None, length=REPS)
            return c
        return f

    tp = timeit(make(body_pallas), x, k)
    tx = timeit(make(body_xla), x, k)
    tf = n * h * w * 9 * cin * cout * 2 / 1e12
    print(f"{h}x{w} {cin}->{cout}: pallas {tp*1e3:.2f} ms ({tf/tp:.0f} TF/s)"
          f"  xla {tx*1e3:.2f} ms ({tf/tx:.0f} TF/s)  ({tx/tp:.2f}x)",
          flush=True)
