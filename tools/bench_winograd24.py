"""A/B the F(2x4,3x3) Winograd kernel vs F(2x2) and XLA at the adopted
allowlist shapes (plus the 1024-geometry entries).

F(2x4) runs 24 dots per 2x4 output tile = 3x fewer MXU multiplies than
direct (F(2x2): 2.25x), at the cost of small-integer-coefficient W
transforms (fp32 VPU) and 1.5x transformed-weight footprint. Only
entered into ops/winograd._TABLE24 where this A/B beats BOTH baselines.

Usage: python tools/bench_winograd24.py [--out /root/repo/.audit_r04.jsonl]
"""
import argparse
import json
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import tooncrafter_tpu.ops.spatial_conv as sc
from tooncrafter_tpu.ops import winograd as wg
from tooncrafter_tpu.ops.norms import gn_affine

REPS = 20


def timeit(f, *a):
    r = f(*a)
    float(jnp.mean(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*a)
        float(jnp.mean(jax.tree_util.tree_leaves(r)[0]
                       .astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS * 1e3


def mk_loop(fn, kernel, cbias, scale, bias, silu, stats):
    cin, cout = kernel.shape[2], kernel.shape[3]

    def fix(y):
        # keep the scan carry at cin width (cheap, consistent across
        # variants; matches bench_winograd.py's harness)
        if cout >= cin:
            return y[..., :cin]
        reps = -(-cin // cout)
        return jnp.concatenate([y] * reps, -1)[..., :cin]

    @jax.jit
    def loop(x, res):
        def step(c, _):
            a, b = gn_affine(c, scale, bias, num_groups=32, eps=1e-5)
            out = fn(c, a, b, kernel, cbias, res, silu, stats)
            y = out[0] if stats else out
            return fix(y), jnp.float32(0)
        c, _ = jax.lax.scan(step, x, None, length=REPS)
        return c
    return loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.audit_r04.jsonl")
    args = ap.parse_args()

    # (n, h, w, cin, cout, f22_entry, f24 candidates)
    cases = [
        # run 1 (measured, .audit_r04.jsonl): 20x32 shapes — f24 WINS
        # (640->640 -9%, 1280->640 -15%, 1920->640 nb2 -12% vs f22);
        # 10x16x1280->1280 f24 LOSES (tw4=4 too coarse) and the ds4
        # wide-cin variants are dropped on that pattern.
        (32, 36, 64, 640, 640, (1, 0, True, 0)),
        (32, 18, 32, 1280, 1280, (2, 640, False, 0)),
        (32, 18, 32, 1920, 1280, (2, 640, False, 640)),
        (32, 18, 32, 2560, 1280, (2, 640, False, 640)),
    ]
    rows = []
    for (n, h, w, cin, cout, e22) in cases:
        ks = jax.random.split(jax.random.PRNGKey(h * w + cin), 6)
        x = (jax.random.normal(ks[0], (n, h, w, cin)) * 1.0) \
            .astype(jnp.bfloat16)
        scale = jax.random.normal(ks[1], (cin,)) * 0.2 + 1.0
        bias = jax.random.normal(ks[2], (cin,)) * 0.1
        kernel = (jax.random.normal(ks[3], (3, 3, cin, cout)) * 0.05) \
            .astype(jnp.bfloat16)
        cbias = jax.random.normal(ks[4], (cout,)) * 0.1
        res = (jax.random.normal(ks[5], (n, h, w, cout))) \
            .astype(jnp.bfloat16)
        silu, stats = True, True
        gf = 2 * n * h * w * 9 * cin * cout / 1e9
        res_d = {}

        ms = timeit(mk_loop(sc._xla_impl, kernel, cbias, scale, bias,
                            silu, stats), x, res)
        res_d["xla"] = round(ms, 3)
        print(f"{h}x{w}x{cin}->{cout}: xla {ms:.3f} ms "
              f"({gf/ms:.0f} TF/s)", flush=True)

        key22 = (h, w, cin, cout)
        had22 = wg._TABLE.get(key22)
        wg._TABLE[key22] = e22
        try:
            ms = timeit(mk_loop(
                lambda *a: wg.winograd_gn_silu_conv3x3(*a),
                kernel, cbias, scale, bias, silu, stats), x, res)
            res_d["f22"] = round(ms, 3)
            print(f"{h}x{w}x{cin}->{cout}: f22 {ms:.3f} ms", flush=True)
        except Exception as ex:
            print(f"{h}x{w}x{cin}->{cout}: f22 FAIL {str(ex)[:150]}",
                  flush=True)
        finally:
            if had22 is None:
                wg._TABLE.pop(key22, None)
            else:
                wg._TABLE[key22] = had22

        nb22, ct22, f32t22, ck22 = e22
        cands = []
        for nb in {nb22, max(1, nb22 // 2), nb22 * 2}:
            if n % nb:
                continue
            for f32t in (False, True):
                cands.append((nb, ct22, f32t, ck22))
        best = None
        for e24 in sorted(set(cands)):
            wg._TABLE24[key22] = e24
            tag = f"f24_nb{e24[0]}{'_f32t' if e24[2] else ''}"
            try:
                ms = timeit(mk_loop(
                    lambda *a: wg.winograd24_gn_silu_conv3x3(*a),
                    kernel, cbias, scale, bias, silu, stats), x, res)
                res_d[tag] = round(ms, 3)
                print(f"{h}x{w}x{cin}->{cout}: {tag} {ms:.3f} ms "
                      f"({gf/ms:.0f} TF/s-equiv)", flush=True)
                if best is None or ms < best[1]:
                    best = (e24, ms)
            except Exception as ex:
                print(f"{h}x{w}x{cin}->{cout}: {tag} FAIL "
                      f"{str(ex)[:150]}", flush=True)
            finally:
                wg._TABLE24.pop(key22, None)
        if best:
            # numerics vs the xla path at the best config AND its f32t
            # sibling (the F(4,3) integer coefficients amplify bf16
            # component rounding; adoption may require f32t)
            a_, b_ = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
            want = sc._xla_impl(x, a_, b_, kernel, cbias, res, silu,
                                stats)[0].astype(jnp.float32)
            for f32t_chk in (False, True):
                e = (best[0][0], best[0][1], f32t_chk, best[0][3])
                wg._TABLE24[key22] = e
                got = wg.winograd24_gn_silu_conv3x3(
                    x, a_, b_, kernel, cbias, res, silu, stats)[0]
                dmax = float(jnp.max(jnp.abs(
                    got.astype(jnp.float32) - want)))
                res_d["maxdelta" + ("_f32t" if f32t_chk else "")] = dmax
                print(f"  {e} max|f24-xla| = {dmax:.4f}", flush=True)
                wg._TABLE24.pop(key22, None)
            res_d["best"] = list(best[0])
        rows.append({"name": "winograd24_ab",
                     "shape": f"{h}x{w}x{cin}->{cout}", "gf": round(gf, 1),
                     "ms": res_d})
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
