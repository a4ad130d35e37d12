"""Profile the DDIM denoise LOOP (the in-context hot path) on TPU.

The standalone CFG-forward profile includes work that XLA LICM hoists out
of the real `lax.scan` (cross-attn K/V projections of the constant
context, schedule gathers); this traces N in-loop steps so the per-step
op mix reflects what the 50-step loop actually runs.

Usage: python tools/profile_denoise.py [--steps 6] [--logdir DIR]
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--logdir", default="/tmp/denoise_profile")
    p.add_argument("--hlo", default=None,
                   help="dump the optimized loop HLO text here")
    p.add_argument("--latent", default=None,
                   help="HxW latent geometry override, e.g. 72x128 "
                        "(the 576x1024 interpolation model)")
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
    shapes = model.param_shapes()
    params = synth_params({"unet": shapes["unet"]})
    t, lh, lw = cfg.video_length, cfg.latent_h, cfg.latent_w
    guidance = GuidanceConfig(cfg_scale=7.5, guidance_rescale=0.7)

    @jax.jit
    def denoise(params, x_T, contexts, concat, fs, rng):
        return model.denoise(params, x_T, contexts, concat, fs, rng,
                             guidance, ddim_steps=args.steps)

    x_T = jnp.zeros((1, t, lh, lw, 4), jnp.float32)
    contexts = jnp.zeros((2, 1, 77 + t * 16, 1024), jnp.bfloat16)
    concat = jnp.zeros((1, t, lh, lw, 4), jnp.bfloat16)
    fs = jnp.full((1,), 10.0)
    rng = jax.random.PRNGKey(0)
    a = (params, x_T, contexts, concat, fs, rng)

    t0 = time.time()
    if args.hlo:
        compiled = denoise.lower(*a).compile()
        with open(args.hlo, "w") as f:
            f.write(compiled.as_text())
        print(f"[{time.time()-t0:.0f}s] HLO -> {args.hlo}", flush=True)
    out = denoise(*a)
    print(f"[{time.time()-t0:.0f}s] compiled; first run "
          f"{float(jnp.mean(out)):.4f}", flush=True)
    t0 = time.time()
    float(jnp.mean(denoise(*a)))
    wall = time.time() - t0
    print(f"{args.steps}-step loop: {wall*1e3:.1f} ms "
          f"({wall*1e3/args.steps:.1f} ms/step)", flush=True)

    jax.profiler.start_trace(args.logdir)
    float(jnp.mean(denoise(*a)))
    jax.profiler.stop_trace()
    from profile_unet import parse_trace
    parse_trace(args.logdir)
    print(f"\n(divide trace totals by {args.steps} steps)")


if __name__ == "__main__":
    main()
