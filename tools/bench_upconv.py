"""Micro-bench: nearest2x+conv3x3 vs folded input-dilated conv on TPU.
Repeats the op inside one jit (lax.scan) to swamp remote-dispatch cost."""
import time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from tooncrafter_tpu.ops.resize import upsample_nearest_2x

REPS = 20

def make(body):
    @jax.jit
    def f(x, k):
        def step(c, _):
            y = body(c, k)
            # feed a low-res view back so shapes close the loop
            return y[:, ::2, ::2, :], jnp.float32(0)
        c, _ = jax.lax.scan(step, x, None, length=REPS)
        return c
    return f

def timeit(f, *a):
    float(jnp.mean(f(*a).astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(f(*a).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS

def ref_body(x, k):
    return jax.lax.conv_general_dilated(
        upsample_nearest_2x(x), k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

def folded_body(x, k):
    k4 = (jnp.pad(k, ((0,1),(0,1),(0,0),(0,0)))
          + jnp.pad(k, ((1,0),(0,1),(0,0),(0,0)))
          + jnp.pad(k, ((0,1),(1,0),(0,0),(0,0)))
          + jnp.pad(k, ((1,0),(1,0),(0,0),(0,0))))
    return jax.lax.conv_general_dilated(
        x, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

for (h, w, c) in [(20, 32, 640), (10, 16, 1280), (160, 256, 256), (80, 128, 512)]:
    n = 32 if h <= 32 else 16
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c), jnp.bfloat16)
    k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c)) * 0.02).astype(jnp.bfloat16)
    r = timeit(make(ref_body), x, k)
    f = timeit(make(folded_body), x, k)
    tf = n * (2*h) * (2*w) * 9 * c * c * 2 / 1e12
    print(f"n={n} {h}x{w}x{c}: ref {r*1e3:.2f} ms ({tf/r:.0f} TF/s)  "
          f"folded {f*1e3:.2f} ms  ({r/f:.2f}x)", flush=True)
