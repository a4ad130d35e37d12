"""A/B: GN-stats sums fused into the conv (round-1 status quo) vs forced
into a separate kernel via optimization_barrier.

Round-2 trace finding (/tmp/unet_profile): the stats-epilogue convs
compile as `convert_reduce_fusion` kOutput fusions at ~21% MFU while plain
convs hit ~67% — the epilogue wrecks the conv emitter. If the barrier
variant wins, spatial_conv/_xla_impl switches to it.

Timing: the op chains through a lax.scan INSIDE one jit (the axon relay
costs ~25 ms per host sync, so per-call timing is useless here).
"""

import time

import jax
import jax.numpy as jnp

ITERS = 20
SHAPES = [
    ((32, 40, 64, 320), 320),
    ((32, 40, 64, 320), 640),
    ((32, 20, 32, 640), 640),
    ((32, 10, 16, 1280), 1280),
]


def run(fused: bool, shape, cout):
    n, h, w, cin = shape
    x0 = jnp.ones(shape, jnp.bfloat16) * 0.1
    a = jnp.ones((n, cin), jnp.float32)
    b = jnp.zeros((n, cin), jnp.float32)
    kernel = jnp.ones((3, 3, cin, cout), jnp.bfloat16) * 0.001
    bias = jnp.zeros((cout,), jnp.bfloat16)

    def body(x, _):
        bshape = (n, 1, 1, cin)
        z = x.astype(jnp.float32) * a.reshape(bshape) + b.reshape(bshape)
        z = z * jax.nn.sigmoid(z)
        z = z.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            z, kernel, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + bias
        if not fused:
            (y,) = jax.lax.optimization_barrier((y,))
        s1 = jnp.sum(y, axis=(1, 2), dtype=jnp.float32)
        s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(1, 2))
        # feed stats + output back so nothing is dead; keep shape with a
        # 1x1 reduction of y back to cin channels via slicing
        nxt = (y[..., :cin] + 1e-6 * (s1[:, None, None, :cin]
                                      + s2[:, None, None, :cin])
               ).astype(jnp.bfloat16)
        return nxt, ()

    @jax.jit
    def loop(x):
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.mean(out.astype(jnp.float32))

    float(loop(x0))  # compile
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(loop(x0))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / ITERS


for shape, cout in SHAPES:
    tf_ = run(True, shape, cout)
    tb = run(False, shape, cout)
    n, h, w, cin = shape
    gflop = 2 * n * h * w * 9 * cin * cout / 1e9
    print(f"{shape}->{cout}: fused {tf_*1e3:.2f} ms ({gflop/tf_/1e3:.0f} "
          f"TF/s)  barrier {tb*1e3:.2f} ms ({gflop/tb/1e3:.0f} TF/s)  "
          f"speedup {tf_/tb:.2f}x", flush=True)
