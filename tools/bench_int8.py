"""Is int8 MXU 2x on this chip? Dot shapes from the UNet transformers."""
import time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
REPS = 30

def timeit(f, *a):
    float(jnp.sum(f(*a).astype(jnp.float32)[:8, :8]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(f(*a).astype(jnp.float32)[:8, :8]))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS

for (m, k, n) in [(81920, 320, 2560), (81920, 320, 320),
                  (20480, 640, 640), (2976, 1024, 320)]:
    xb = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    wb = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
    xi = (xb * 10).astype(jnp.int8)
    wi = (wb * 10).astype(jnp.int8)

    @jax.jit
    def f_bf16(x, w):
        def step(c, _):
            y = jax.lax.dot(c, w)
            return y[:, :k] if n >= k else jnp.tile(y, (1, k // n + 1))[:, :k], None
        c, _ = jax.lax.scan(step, x, None, length=REPS)
        return c

    @jax.jit
    def f_int8(x, w):
        def step(c, _):
            y = jax.lax.dot(c, w, preferred_element_type=jnp.int32)
            y8 = y.astype(jnp.int8)
            return (y8[:, :k] if n >= k
                    else jnp.tile(y8, (1, k // n + 1))[:, :k]), None
        c, _ = jax.lax.scan(step, x, None, length=REPS)
        return c

    tb = timeit(f_bf16, xb, wb)
    ti = timeit(f_int8, xi, wi)
    tf = m * k * n * 2 / 1e12
    print(f"({m},{k})x({k},{n}): bf16 {tb*1e3:.2f} ms ({tf/tb:.0f} TF/s)  "
          f"int8 {ti*1e3:.2f} ms ({tf/ti:.0f} TOP/s)  ({tb/ti:.2f}x)",
          flush=True)
