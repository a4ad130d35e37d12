"""Profile the dual-reference VAE decode (2nd hot path) on TPU.

Usage:  python tools/profile_decode.py [--trace]
"""

from __future__ import annotations

import argparse
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def build(latent=None):
    from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter
    from tooncrafter_tpu.utils.synth import synth_params

    if latent:
        lh_, lw_ = (int(v) for v in latent.split("x"))
        cfg = ModelConfig(latent_h=lh_, latent_w=lw_,
                          compute_dtype=jnp.bfloat16)
    else:
        cfg = ModelConfig(compute_dtype=jnp.bfloat16)
    model = ToonCrafter(cfg)
    shapes = model.param_shapes()
    params = synth_params({"dualref_decoder": shapes["dualref_decoder"]})

    t = cfg.video_length
    z = jnp.zeros((1, t, cfg.latent_h, cfg.latent_w, cfg.z_channels),
                  jnp.bfloat16)
    taps = model._tap_shapes(cfg.latent_h * 8, cfg.latent_w * 8)
    refs = [jnp.zeros((1, 2, th, tw, tc), jnp.bfloat16)
            for (th, tw, tc) in taps]

    @jax.jit
    def dec(params, z, refs):
        return model.dualref_decoder.apply(
            {"params": params["dualref_decoder"]}, z, refs)

    return dec, (params, z, refs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", action="store_true")
    p.add_argument("--logdir", default="/tmp/decode_profile")
    p.add_argument("--hlo", default=None,
                   help="dump the optimized decode HLO text here")
    p.add_argument("--latent", default=None,
                   help="HxW latent override, e.g. 72x128")
    args = p.parse_args()

    t0 = time.time()
    dec, inputs = build(args.latent)
    print(f"[{time.time()-t0:.1f}s] built; compiling...", flush=True)
    sync = lambda y: float(jnp.mean(y.astype(jnp.float32)))
    if args.hlo:
        compiled = dec.lower(*inputs).compile()
        with open(args.hlo, "w") as f:
            f.write(compiled.as_text())
        print(f"[{time.time()-t0:.1f}s] HLO -> {args.hlo}", flush=True)
    sync(dec(*inputs))
    print(f"[{time.time()-t0:.1f}s] compiled; timing...", flush=True)
    times = []
    for _ in range(6):
        s = time.perf_counter()
        sync(dec(*inputs))
        times.append(time.perf_counter() - s)
    times.sort()
    print(f"median decode (16 frames @320x512): {times[3]*1e3:.1f} ms")

    if args.trace:
        jax.profiler.start_trace(args.logdir)
        for _ in range(3):
            sync(dec(*inputs))
        jax.profiler.stop_trace()
        sys.path.insert(0, "/root/repo/tools")
        from profile_unet import parse_trace
        parse_trace(args.logdir)


if __name__ == "__main__":
    main()
