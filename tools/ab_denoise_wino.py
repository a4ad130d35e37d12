"""In-loop adoption A/B for the Winograd conv variants: run the REAL
DDIM denoise loop (random data, synth weights) under each dispatch
config and report ms/step AND the final-latent deviation vs the pure
XLA conv path.

The deviation gate matters for F(2x4): its F(4,3) inverse-transform
cancellation makes bf16-weight rounding ~7x looser per conv than F(2x2)
(maxdelta 0.22 vs 0.03 at 20x32x640->640, .audit_r04.jsonl) — before
adopting, the accumulated 50-step effect must stay in the
bf16-reordering noise band. f22's deviation vs XLA is printed as the
already-shipped yardstick.

Usage: python tools/ab_denoise_wino.py [--steps 10]
       [--f24 "20x32x640x640:2,0,0,0;..."]   (entries to trial)
       [--out /root/repo/.audit_r04.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tooncrafter_tpu.ops import winograd as wg


def parse_f24(s):
    out = {}
    for part in filter(None, s.split(";")):
        key, val = part.split(":")
        h, w, ci, co = (int(v) for v in key.split("x"))
        nb, ct, f32t, ck = (int(v) for v in val.split(","))
        out[(h, w, ci, co)] = (nb, ct, bool(f32t), ck)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--f24", default="")
    p.add_argument("--latent", default=None)
    p.add_argument("--out", default="/root/repo/.audit_r04.jsonl")
    args = p.parse_args()

    from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter
    from tooncrafter_tpu.sampling.ddim import GuidanceConfig
    from tooncrafter_tpu.utils.synth import synth_params

    if args.latent:
        lh_, lw_ = (int(v) for v in args.latent.split("x"))
        cfg = ModelConfig(latent_h=lh_, latent_w=lw_,
                          compute_dtype=jnp.bfloat16)
    else:
        cfg = ModelConfig(compute_dtype=jnp.bfloat16)
    model = ToonCrafter(cfg)
    params = synth_params({"unet": model.param_shapes()["unet"]})
    t, lh, lw = cfg.video_length, cfg.latent_h, cfg.latent_w
    guidance = GuidanceConfig(cfg_scale=7.5, guidance_rescale=0.7)

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    x_T = jax.random.normal(ks[0], (1, t, lh, lw, 4), jnp.float32)
    contexts = (jax.random.normal(ks[1], (2, 1, 77 + t * 16, 1024))
                * 0.3).astype(jnp.bfloat16)
    concat = (jax.random.normal(ks[2], (1, t, lh, lw, 4))
              * 0.5).astype(jnp.bfloat16)
    fs = jnp.full((1,), 10, jnp.int32)

    f24_entries = parse_f24(args.f24)

    saved = (dict(wg._TABLE), dict(wg._TABLE24))
    configs = [
        ("xla", {}, {}),
        ("f22_shipped", saved[0], saved[1]),
        ("trial", saved[0], {**saved[1], **f24_entries}),
    ]
    results = {}
    for name, t22, t24 in configs:
        wg._TABLE.clear(); wg._TABLE.update(t22)
        wg._TABLE24.clear(); wg._TABLE24.update(t24)

        def denoise(params, x_T, contexts, concat, fs, rng):
            return model.denoise(params, x_T, contexts, concat, fs, rng,
                                 guidance, ddim_steps=args.steps)
        fn = jax.jit(denoise)
        t0 = time.perf_counter()
        out = fn(params, x_T, contexts, concat, fs, ks[3])
        out = jax.tree_util.tree_leaves(out)[0]
        float(jnp.mean(out.astype(jnp.float32)))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f} s",
              flush=True)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(params, x_T, contexts, concat, fs, ks[3])
            out = jax.tree_util.tree_leaves(out)[0]
            float(jnp.mean(out.astype(jnp.float32)))
            walls.append(time.perf_counter() - t0)
        ms_step = min(walls) / args.steps * 1e3
        results[name] = (ms_step, jnp.asarray(out, jnp.float32))
        print(f"{name}: {ms_step:.2f} ms/step "
              f"(walls {[round(w,3) for w in walls]})", flush=True)
    wg._TABLE.clear(); wg._TABLE.update(saved[0])
    wg._TABLE24.clear(); wg._TABLE24.update(saved[1])

    ref = results["xla"][1]
    rms = float(jnp.sqrt(jnp.mean(ref * ref)))
    row = {"name": "wino_trial_inloop", "steps": args.steps,
           "latent": args.latent or "40x64",
           "f24": args.f24, "ms_step": {}, "num": {}}
    for name, (ms, out) in results.items():
        row["ms_step"][name] = round(ms, 2)
        if name != "xla":
            rmse = float(jnp.sqrt(jnp.mean((out - ref) ** 2)))
            psnr = 20 * jnp.log10(rms / max(rmse, 1e-12))
            row["num"][name] = {"rel_rmse": round(rmse / rms, 6),
                                "psnr_db": round(float(psnr), 2)}
            print(f"{name}: rel_rmse {rmse/rms:.2e} "
                  f"psnr {float(psnr):.1f} dB vs xla", flush=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
