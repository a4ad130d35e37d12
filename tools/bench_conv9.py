"""A/B a '3-shift' Pallas conv against XLA's conv emitter at UNet shapes.

The parked im2col-band kernel (ops/spatial_conv.py) loses to XLA because
each row band pays 9 misaligned slice+concat relayouts (VPU) before its
one big dot. This variant pays the sublane misalignment exactly 3 times:
the normalized padded slab is sliced into three W-shifted values
(dx = 0/1/2, each relayouted once), and the 9 taps become dots on FREE
row-offset (dy) views of those three aligned slabs — all MXU work is
(H*W, Cin) @ (Cin, Cout) with no per-band copies.

Measured against: XLA conv with the production 'ref' prologue (the
in-loop lowering), with and without the chained-stats epilogue.

Usage: python tools/bench_conv9.py [--out /root/repo/.audit_r03.jsonl]
"""
import argparse
import json
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

REPS = 20


def conv9(x, a, b, kernel, bias, res=None, silu=True, stats=False):
    """x: (N,H,W,C) bf16; a/b: (N,C) f32 folded GN affine; kernel
    (3,3,C,Cout); bias (Cout,). One grid step per sample."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    cout = kernel.shape[-1]
    residual = res is not None
    if not residual:
        res = jnp.zeros((1, 1, 1, cout), x.dtype)

    def kern(x_ref, a_ref, b_ref, w_ref, bias_ref, res_ref, o_ref,
             *stat_refs):
        i = pl.program_id(0)
        z = x_ref[0].astype(jnp.float32) * a_ref[i][None] + b_ref[i][None]
        if silu:
            z = z * jax.nn.sigmoid(z)
        zp = jnp.pad(z.astype(x_ref.dtype), ((1, 1), (1, 1), (0, 0)))
        # three W-shifted aligned slabs; each relayout happens once
        zs = [zp[:, dx:dx + w, :] for dx in range(3)]
        acc = jnp.zeros((h * w, cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                zd = zs[dx][dy:dy + h].reshape(h * w, c)
                acc = acc + jax.lax.dot_general(
                    zd, w_ref[3 * dy + dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc = acc + bias_ref[0].astype(jnp.float32)
        if residual:
            acc = acc + res_ref[0].reshape(h * w, cout) \
                .astype(jnp.float32)
        ob = acc.astype(o_ref.dtype)
        o_ref[0] = ob.reshape(h, w, cout)
        if stats:
            of = ob.astype(jnp.float32)
            stat_refs[0][0, 0] = jnp.sum(of, axis=0)
            stat_refs[1][0, 0] = jnp.sum(of * of, axis=0)

    w9 = kernel.reshape(9, c, cout)
    out_shape = [jax.ShapeDtypeStruct((n, h, w, cout), x.dtype)]
    out_specs = [pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0))]
    if stats:
        for _ in range(2):
            out_shape.append(
                jax.ShapeDtypeStruct((n, 1, cout), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1, cout),
                                          lambda i: (i, 0, 0)))
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((n, c), lambda i: (0, 0)),
            pl.BlockSpec((n, c), lambda i: (0, 0)),
            pl.BlockSpec((9, c, cout), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
            (pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0))
             if residual else
             pl.BlockSpec((1, 1, 1, cout), lambda i: (0, 0, 0, 0))),
        ],
        out_specs=out_specs if stats else out_specs[0],
        out_shape=out_shape if stats else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, a, b, w9, bias.reshape(1, -1), res)
    return out


def timeit(f, *a):
    r = f(*a)
    r = r[0] if isinstance(r, (tuple, list)) else r
    float(jnp.mean(r.astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*a)
        r = r[0] if isinstance(r, (tuple, list)) else r
        float(jnp.mean(r.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.audit_r03.jsonl")
    args = ap.parse_args()
    import tooncrafter_tpu.ops.spatial_conv as sc
    from tooncrafter_tpu.ops.norms import gn_affine

    rows = []
    for (h, w, cin, cout) in [(40, 64, 320, 320), (40, 64, 640, 320),
                              (20, 32, 640, 640), (10, 16, 1280, 1280)]:
        n = 32
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        x = jax.random.normal(ks[0], (n, h, w, cin), jnp.bfloat16)
        k = (jax.random.normal(ks[1], (3, 3, cin, cout)) * 0.02) \
            .astype(jnp.bfloat16)
        bias = (jax.random.normal(ks[2], (cout,)) * 0.1) \
            .astype(jnp.bfloat16)
        scale = jnp.ones((cin,))
        gbias = jnp.zeros((cin,))
        gf = 2 * n * h * w * 9 * cin * cout / 1e9

        def fix(y):
            if y.shape[-1] == cin:
                return y
            if y.shape[-1] > cin:
                return y[..., :cin]
            return jnp.concatenate([y] * (cin // y.shape[-1]), -1)

        def mk(body):
            @jax.jit
            def f(x, k):
                def step(c, _):
                    return body(c, k), jnp.float32(0)
                c, _ = jax.lax.scan(step, x, None, length=REPS)
                return c
            return f

        def body_xla(c, k, stats=False):
            a, b = gn_affine(c, scale, gbias, 32, 1e-5)
            out = sc._xla_impl(c, a, b, k, bias, None, True, stats)
            return fix(out[0] if stats else out)

        def body_9(c, k, stats=False):
            a, b = gn_affine(c, scale, gbias, 32, 1e-5)
            out = conv9(c, a, b, k, bias, None, True, stats)
            return fix(out[0] if stats else out)

        res = {}
        for name, body in [
                ("xla", lambda c, k: body_xla(c, k, False)),
                ("xla_stats", lambda c, k: body_xla(c, k, True)),
                ("p9", lambda c, k: body_9(c, k, False)),
                ("p9_stats", lambda c, k: body_9(c, k, True))]:
            try:
                ms = timeit(mk(body), x, k)
                res[name] = round(ms, 3)
                print(f"{h}x{w}x{cin}->{cout} {name}: {ms:.3f} ms "
                      f"({gf/ms:.0f} TF/s)", flush=True)
            except Exception as e:
                print(f"{h}x{w}x{cin}->{cout} {name}: FAIL "
                      f"{str(e)[:160]}", flush=True)
        # numerics check (single call, no scan)
        try:
            a, b = gn_affine(x, scale, gbias, 32, 1e-5)
            want = sc._xla_impl(x, a, b, k, bias, None, True, False)
            got = conv9(x, a, b, k, bias, None, True, False)
            d = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                      - want.astype(jnp.float32))))
            print(f"  max|p9-xla| = {d:.2e}", flush=True)
            res["maxdelta"] = d
        except Exception as e:
            print(f"  numerics FAIL {str(e)[:160]}", flush=True)
        rows.append({"name": "conv9_ab", "shape": f"{h}x{w}x{cin}->{cout}",
                     "gf": round(gf, 1), "ms": res})
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
