"""Winograd coverage extension A/Bs: (a) channel-PADDED dispatch at the
UNet ds1 level, (b) dual-ref decoder 512-ch shapes.

(a) The 40x64 ds1 sites run XLA conv at only 64-91 TF/s (winograd_ab
    rows), but the Winograd kernels reject them: cin=320 hits the Mosaic
    lane-merge limit (cin % 128 != 0) and cout=320 needs the paired
    output layout that measured a loss. Instead of kernel surgery, pad
    cin/cout up to 384 OUTSIDE the kernel (zero affine rows + zero
    weight columns keep it exact), run the aligned kernel, and slice the
    output back. The pads/slices are elementwise HBM passes XLA can fuse
    into producer/consumer; the dots shrink 2.25-3x.

(b) The dual-ref decoder's ResnetBlocks (models/vae.py via
    models/vae_dualref.VideoResBlock) hit (16, 40x64 / 80x128, 512)
    conv shapes per decode pass — all 128-aligned, never swept. The
    160x256+ levels exceed the kernel's per-block VMEM (no H tiling)
    and are not attempted.

Usage: python tools/bench_winograd_pad.py [--out /root/repo/.audit_r04.jsonl]
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


def padded_call(impl, cin_pad, cout_pad):
    """Wrap a winograd impl with outside-the-kernel channel padding.

    Exactness: padded affine rows are (a=0, b=0) so the prologue emits
    silu(0)=0 there regardless of x's pad values; padded weight columns
    are zero so padded-cout lanes never reach the sliced output; the
    residual pad rides only padded lanes. Stats are sums over channels —
    slicing the (N, cout_pad) sums back to cout drops the pad lanes.
    """
    def fn(x, a, b, kernel, cbias, res, silu, stats):
        n, h, w, cin = x.shape
        cout = kernel.shape[-1]
        dcin, dcout = cin_pad - cin, cout_pad - cout
        if dcin:
            x = jnp.pad(x, ((0, 0),) * 3 + ((0, dcin),))
            a = jnp.pad(a, ((0, 0), (0, dcin)))
            b = jnp.pad(b, ((0, 0), (0, dcin)))
            kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, dcin), (0, 0)))
        if dcout:
            kernel = jnp.pad(kernel, ((0, 0),) * 3 + ((0, dcout),))
            cbias = jnp.pad(cbias, (0, dcout))
            if res is not None:
                res = jnp.pad(res, ((0, 0),) * 3 + ((0, dcout),))
        out = impl(x, a, b, kernel, cbias, res, silu, stats)
        if not dcout:
            return out
        if stats:
            y, s1, s2 = out
            return y[..., :cout], s1[:, :cout], s2[:, :cout]
        return out[..., :cout]
    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.audit_r04.jsonl")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    # (tag, n, h, w, cin, cout, cin_pad, cout_pad,
    #  [(kind, nb, ct, f32t, ck), ...]) — kind in {f22, f24}
    cases = [
        # --- (a) UNet ds1 padded dispatch ---
        ("ds1_320x320", 32, 40, 64, 320, 320, 384, 384,
         [("f22", 1, 0, False, 0), ("f22", 2, 0, False, 0),
          ("f24", 1, 0, False, 0), ("f24", 2, 0, False, 0)]),
        ("ds1_640x320", 32, 40, 64, 640, 320, 640, 384,
         [("f22", 1, 0, False, 0), ("f24", 1, 0, False, 0),
          ("f24", 2, 0, False, 0)]),
        # --- (a') 1024-model ds1 (72x128 latents), same lockout ---
        ("ds1_1024_320x320", 32, 72, 128, 320, 320, 384, 384,
         [("f22", 1, 0, False, 0), ("f24", 1, 0, False, 0)]),
        ("ds1_1024_640x320", 32, 72, 128, 640, 320, 640, 384,
         [("f22", 1, 0, False, 0), ("f24", 1, 0, False, 0)]),
        # --- (b) decoder shapes (aligned; no padding) ---
        ("dec_40x64_512", 16, 40, 64, 512, 512, 512, 512,
         [("f22", 2, 0, False, 0), ("f22", 4, 0, False, 0),
          ("f24", 2, 0, False, 0), ("f24", 4, 0, False, 0)]),
        ("dec_80x128_512", 16, 80, 128, 512, 512, 512, 512,
         [("f22", 1, 256, False, 0), ("f22", 1, 256, False, 256),
          ("f24", 1, 0, False, 0), ("f24", 1, 256, False, 0),
          ("f24", 2, 256, False, 256)]),
    ]
    only = [s for s in args.only.split(",") if s]
    for (tag, n, h, w, cin, cout, cin_pad, cout_pad, cands) in cases:
        if only and not any(s in tag for s in only):
            continue
        ks = jax.random.split(jax.random.PRNGKey(h * w + cin), 6)
        x = jax.random.normal(ks[0], (n, h, w, cin)).astype(jnp.bfloat16)
        scale = jax.random.normal(ks[1], (cin,)) * 0.2 + 1.0
        bias = jax.random.normal(ks[2], (cin,)) * 0.1
        kernel = (jax.random.normal(ks[3], (3, 3, cin, cout)) * 0.05) \
            .astype(jnp.bfloat16)
        cbias = jax.random.normal(ks[4], (cout,)) * 0.1
        res = jax.random.normal(ks[5], (n, h, w, cout)).astype(jnp.bfloat16)
        silu, stats = True, True
        gf = 2 * n * h * w * 9 * cin * cout / 1e9
        res_d = {}

        ms = timeit(mk_loop(sc._xla_impl, kernel, cbias, scale, bias,
                            silu, stats), x, res)
        res_d["xla"] = round(ms, 3)
        print(f"{tag}: xla {ms:.3f} ms ({gf/ms:.0f} TF/s)", flush=True)

        key = (h, w, cin_pad, cout_pad)
        best = None
        for (kind, nb, ct, f32t, ck) in cands:
            table = wg._TABLE if kind == "f22" else wg._TABLE24
            impl = wg.winograd_gn_silu_conv3x3 if kind == "f22" \
                else wg.winograd24_gn_silu_conv3x3
            entry = (nb, ct, f32t, ck)
            label = f"{kind}_nb{nb}" + (f"_ct{ct}" if ct else "") \
                + ("_f32t" if f32t else "") + (f"_ck{ck}" if ck else "")
            table[key] = entry
            fn = padded_call(impl, cin_pad, cout_pad)
            try:
                ms = timeit(mk_loop(fn, kernel, cbias, scale, bias,
                                    silu, stats), x, res)
                res_d[label] = round(ms, 3)
                print(f"{tag}: {label} {ms:.3f} ms", flush=True)
                if best is None or ms < best[1]:
                    best = ((kind, entry), ms)
            except Exception as ex:
                res_d[label] = "FAIL"
                print(f"{tag}: {label} FAIL {str(ex)[:180]}", flush=True)
            finally:
                table.pop(key, None)
        if best and best[1] < res_d["xla"]:
            # parity check only where the variant actually won (the
            # losing-variant parity at 72x128 OOMed scoped VMEM once —
            # guard it so one bad case can't sink the whole sweep)
            (kind, entry), _ = best
            table = wg._TABLE if kind == "f22" else wg._TABLE24
            impl = wg.winograd_gn_silu_conv3x3 if kind == "f22" \
                else wg.winograd24_gn_silu_conv3x3
            table[key] = entry
            try:
                a_, b_ = gn_affine(x, scale, bias, num_groups=32,
                                   eps=1e-5)
                want = sc._xla_impl(x, a_, b_, kernel, cbias, res, silu,
                                    stats)[0]
                got = padded_call(impl, cin_pad, cout_pad)(
                    x, a_, b_, kernel, cbias, res, silu, stats)[0]
                dmax = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                             - want.astype(jnp.float32))))
                res_d["maxdelta"] = dmax
                res_d["best"] = [kind] + list(entry)
                print(f"  best {kind} {entry} max|wino-xla| = {dmax:.4f}",
                      flush=True)
            except Exception as ex:
                res_d["maxdelta"] = "FAIL"
                print(f"  parity FAIL {str(ex)[:180]}", flush=True)
            finally:
                table.pop(key, None)
        # append per case: a crash mid-sweep must not lose earlier rows
        with open(args.out, "a") as f:
            f.write(json.dumps(
                {"name": "winograd_pad_ab", "tag": tag,
                 "shape": f"{n}:{h}x{w}x{cin}->{cout}"
                          f" (pad {cin_pad}->{cout_pad})",
                 "gf": round(gf, 1), "ms": res_d}) + "\n")


if __name__ == "__main__":
    main()
