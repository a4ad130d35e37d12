"""A/B a Winograd F(2x2,3x3) Pallas conv against XLA's conv emitter.

Direct 3x3 conv is compute-bound at the UNet shapes (in-loop fusions run
150-194 TF/s, .audit_r04.jsonl generic_fusion_attribution_r4) — the only
way past it is fewer FLOPs. Winograd F(2x2,3x3) computes each 2x2 output
tile from a 4x4 input tile with 16 multiplies instead of 36: a 2.25x
multiply reduction. The transforms are pure +/- (and 0.5 factors folded
into the pre-transformed weights), so the MXU work drops to 16 batched
(tiles, Cin) @ (Cin, Cout) dots while the VPU does elementwise combines
that overlap with them.

Layout strategy (all in VMEM, per-sample slab like bench_conv9):
  * H-transform: paired-row reshape views zp[0:h].reshape(th,2,...) /
    zp[2:h+2].reshape(th,2,...) — contiguous slices + free major-dim
    splits, no stride-2 sublane gathers.
  * W-transform: per t_i, slice cols [0:w]/[2:w+2] then merge the
    (2, C) minor pair into lanes — e0/e1 become cheap lane slices.
  * 16 MXU dots against pre-transformed resident weights.
  * inverse transform A^T M A as f32 adds, reassembled by lane-concat +
    sublane-split reshapes.

Usage: python tools/bench_winograd.py [--out /root/repo/.audit_r04.jsonl]
"""
import argparse
import functools
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
_INTERPRET = _os.environ.get("TC_WINO_INTERPRET") == "1"

# G for F(2x2, 3x3): (4, 3)
_G = np.array([[1.0, 0.0, 0.0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0.0, 0.0, 1.0]])


def transform_kernel(kernel):
    """(3,3,Cin,Cout) -> (16, Cin, Cout): W'_{ij} = sum_ab G[i,a]G[j,b] g_ab,
    computed in f32."""
    g = kernel.astype(jnp.float32)
    w4 = jnp.einsum("ia,jb,abck->ijck", _G, _G, g)
    return w4.reshape(16, *kernel.shape[2:])


def winograd_conv(x, a, b, wt, bias, *, silu=True, nb=1, ct=0,
                  f32t=False, band=0):
    """x: (N,H,W,C) bf16; a/b: (N,C) f32 folded GN affine; wt: (16,C,Cout)
    pre-transformed weights (bf16); bias: (Cout,). nb = samples per grid
    step (raises the MXU M dim at small spatial levels); ct = Cout tile
    (0 = full). f32t: do the input transform combines in f32. band =
    tile-rows per in-kernel band (0 = whole slab; nb==1 only) — bounds
    the per-dot M dim and the live f32 component set."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    cout = wt.shape[-1]
    ct = ct or cout
    n_ct = cout // ct
    th, tw = h // 2, w // 2
    band = band or th
    assert band == th or nb == 1, "banding is a single-sample path"
    tdt = jnp.float32 if f32t else x.dtype

    def transform_in(zp, b0, rows):
        """zp (h+2, w+2, c) padded slab -> 16 x (rows*tw, c) transformed
        components for tile rows [b0, b0+rows)."""
        A = zp[2 * b0:2 * (b0 + rows)].reshape(rows, 2, w + 2, c)
        B = zp[2 * b0 + 2:2 * (b0 + rows) + 2].reshape(rows, 2, w + 2, c)
        d0, d1 = A[:, 0], A[:, 1]
        d2, d3 = B[:, 0], B[:, 1]
        t = [d0 - d2, d1 + d2, d2 - d1, d1 - d3]  # (rows, w+2, c) x4
        u = []
        for ti in t:
            E = ti[:, 0:w].reshape(rows, tw, 2 * c)
            F = ti[:, 2:w + 2].reshape(rows, tw, 2 * c)
            e0, e1 = E[..., :c], E[..., c:]
            f0, f1 = F[..., :c], F[..., c:]
            u += [e0 - f0, e1 + f0, f0 - e1, e1 - f1]
        return [ui.reshape(rows * tw, c) for ui in u]

    def dots_inverse(us, w_ref, bias_v, nb_, rows, dt, paired):
        """16 MXU dots + inverse transform.

        paired=True -> (nb_, 2*rows, tw, 2*ct): output column pairs stay
        adjacent in LANES (every in-kernel reshape splits major dims
        only — legal at any ct); the W interleave is a free outside
        reshape (row-major (tw, 2ct) == (w, ct)). paired=False keeps the
        in-kernel interleave, which needs ct % 128 == 0 (the lane split
        at ct must hit a native tile boundary — cout=320 crashes Mosaic).
        """
        m = [jax.lax.dot_general(
                us[j].astype(dt), w_ref[j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
             for j in range(16)]                      # (tiles, ct) f32
        v = [m[0 + j] + m[4 + j] + m[8 + j] for j in range(4)] + \
            [m[4 + j] - m[8 + j] - m[12 + j] for j in range(4)]
        y0 = v[0] + v[1] + v[2] + bias_v   # out row 2r,   col 2s
        y1 = v[1] - v[2] - v[3] + bias_v   # out row 2r,   col 2s+1
        y2 = v[4] + v[5] + v[6] + bias_v   # out row 2r+1, col 2s
        y3 = v[5] - v[6] - v[7] + bias_v   # out row 2r+1, col 2s+1
        top = jnp.concatenate([y0.astype(dt), y1.astype(dt)], axis=-1)
        bot = jnp.concatenate([y2.astype(dt), y3.astype(dt)], axis=-1)
        if paired:
            top = top.reshape(nb_, rows, 1, tw, 2 * ct)
            bot = bot.reshape(nb_, rows, 1, tw, 2 * ct)
            return jnp.concatenate([top, bot], axis=2) \
                .reshape(nb_, 2 * rows, tw, 2 * ct)
        top = top.reshape(nb_, rows, 1, w, ct)
        bot = bot.reshape(nb_, rows, 1, w, ct)
        return jnp.concatenate([top, bot], axis=2) \
            .reshape(nb_, 2 * rows, w, ct)

    paired = ct % 128 != 0
    assert not (paired and n_ct > 1), \
        "paired output layout assumes a single Cout tile"

    def kern(x_ref, a_ref, b_ref, w_ref, bias_ref, o_ref):
        i = pl.program_id(0)
        bias_v = bias_ref[0].astype(jnp.float32)
        dt = o_ref.dtype
        zps = []
        for s in range(nb):
            z = x_ref[s].astype(jnp.float32) * a_ref[i * nb + s][None] \
                + b_ref[i * nb + s][None]
            if silu:
                z = z * jax.nn.sigmoid(z)
            zps.append(jnp.pad(z.astype(tdt), ((1, 1), (1, 1), (0, 0))))
        if nb > 1:
            us = [jnp.concatenate(parts, 0) for parts in
                  zip(*[transform_in(zp, 0, th) for zp in zps])]
            o_ref[...] = dots_inverse(us, w_ref, bias_v, nb, th, dt,
                                      paired)
        else:
            for b0 in range(0, th, band):
                rows = min(band, th - b0)
                us = transform_in(zps[0], b0, rows)
                ob = dots_inverse(us, w_ref, bias_v, 1, rows, dt, paired)
                o_ref[0, 2 * b0:2 * (b0 + rows)] = ob[0]

    grid = (n // nb, n_ct) if n_ct > 1 else (n // nb,)
    if n_ct > 1:
        ix = lambda i, j: (i, 0, 0, 0)
        iab = lambda i, j: (0, 0)
        iw = lambda i, j: (0, 0, j)
        ibias = lambda i, j: (0, j)
        iout = lambda i, j: (i, 0, 0, j)
        sem = ("parallel", "arbitrary")
    else:
        ix = lambda i: (i, 0, 0, 0)
        iab = lambda i: (0, 0)
        iw = lambda i: (0, 0, 0)
        ibias = lambda i: (0, 0)
        iout = lambda i: (i, 0, 0, 0)
        sem = ("parallel",)

    ow3, oc3 = (tw, 2 * ct) if paired else (w, ct)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, h, w, c), ix),
            pl.BlockSpec((n, c), iab),
            pl.BlockSpec((n, c), iab),
            pl.BlockSpec((16, c, ct), iw),
            pl.BlockSpec((1, ct), ibias),
        ],
        out_specs=pl.BlockSpec((nb, h, ow3, oc3), iout),
        out_shape=jax.ShapeDtypeStruct(
            (n, h, ow3, (cout // ct) * oc3), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=sem,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x, a, b, wt, bias.reshape(1, -1))
    if paired:
        # row-major (tw, 2*ct) == (w, ct): a free layout reshape outside
        # the kernel (only legal outside — Mosaic rejects the lane split
        # at non-128-aligned ct).
        out = out.reshape(n, h, w, cout)
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
    ap.add_argument("--out", default="/root/repo/.audit_r04.jsonl")
    ap.add_argument("--only", default="",
                    help="substring filter on HxWxCin->Cout")
    args = ap.parse_args()
    import tooncrafter_tpu.ops.spatial_conv as sc
    from tooncrafter_tpu.ops.norms import gn_affine

    rows = []
    for (h, w, cin, cout, nb, ct, bands) in [
            (40, 64, 320, 320, 1, 0, (10, 5, 4)),
            (40, 64, 640, 320, 1, 0, (10, 5, 4)),
            (20, 32, 640, 640, 2, 0, (0,)),
            (20, 32, 1280, 640, 2, 0, (0,)),
            (10, 16, 1280, 1280, 8, 640, (0,)),
            # 576x1024-model geometry (72x128 latents)
            (36, 64, 640, 640, 1, 0, (0, 9, 3)),
            (18, 32, 1280, 1280, 2, 640, (0,))]:
        if args.only and args.only not in f"{h}x{w}x{cin}->{cout}":
            continue
        n = 32
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        x = jax.random.normal(ks[0], (n, h, w, cin), jnp.bfloat16)
        k = (jax.random.normal(ks[1], (3, 3, cin, cout)) * 0.02) \
            .astype(jnp.bfloat16)
        bias = (jax.random.normal(ks[2], (cout,)) * 0.1) \
            .astype(jnp.bfloat16)
        wt = transform_kernel(k).astype(jnp.bfloat16)
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
            def f(x, k, wt):
                def step(c, _):
                    return body(c, k, wt), jnp.float32(0)
                c, _ = jax.lax.scan(step, x, None, length=REPS)
                return c
            return f

        def body_xla(c, k, wt):
            a, b = gn_affine(c, scale, gbias, 32, 1e-5)
            return fix(sc._xla_impl(c, a, b, k, bias, None, True, False))

        def body_wino(c, k, wt, f32t=False, band=0):
            a, b = gn_affine(c, scale, gbias, 32, 1e-5)
            return fix(winograd_conv(c, a, b, wt, bias, silu=True,
                                     nb=nb, ct=ct, f32t=f32t, band=band))

        variants = [("xla", body_xla)]
        for band in bands:
            sfx = f"_b{band}" if band else ""
            variants += [
                (f"wino{sfx}",
                 lambda c, k, wt, band=band: body_wino(c, k, wt, False,
                                                       band)),
                (f"wino_f32t{sfx}",
                 lambda c, k, wt, band=band: body_wino(c, k, wt, True,
                                                       band))]
        res = {}
        for name, body in variants:
            try:
                ms = timeit(mk(body), x, k, wt)
                res[name] = round(ms, 3)
                print(f"{h}x{w}x{cin}->{cout} {name}: {ms:.3f} ms "
                      f"({gf/ms:.0f} TF/s-direct)", flush=True)
            except Exception as e:
                print(f"{h}x{w}x{cin}->{cout} {name}: FAIL "
                      f"{str(e)[:300]}", flush=True)
        try:
            a, b = gn_affine(x, scale, gbias, 32, 1e-5)
            want = sc._xla_impl(x, a, b, k, bias, None, True, False)
            for nm, f32t in (("wino", False), ("wino_f32t", True)):
                got = winograd_conv(x, a, b, wt, bias, silu=True, nb=nb,
                                    ct=ct, f32t=f32t, band=bands[0])
                dmax = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                             - want.astype(jnp.float32))))
                rel = dmax / float(jnp.max(jnp.abs(
                    want.astype(jnp.float32))))
                print(f"  max|{nm}-xla| = {dmax:.2e} (rel {rel:.2e})",
                      flush=True)
                res[f"maxdelta_{nm}"] = dmax
        except Exception as e:
            print(f"  numerics FAIL {str(e)[:300]}", flush=True)
        rows.append({"name": "winograd_ab",
                     "shape": f"{h}x{w}x{cin}->{cout}",
                     "gf": round(gf, 1), "nb": nb, "ct": ct, "ms": res})
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
