"""One-command end-to-end smoke: tiny random-weight model, full pipeline.

    python -m tooncrafter_tpu.cli.smoke [--steps N] [--out DIR]

Builds the tiny config (same topology as the 512 model, every tower
shrunk), runs encode -> conditioning -> DDIM -> dual-ref decode + splice,
and writes an mp4. Used by the project verify skill and as a quick
installation check.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--out", type=str, default="/tmp/tooncrafter_smoke")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tooncrafter_tpu.models.diffusion import (ModelConfig, Pipeline,
                                                  ToonCrafter)
    from tooncrafter_tpu.sampling.ddim import GuidanceConfig
    from tooncrafter_tpu.utils.video_io import write_video

    t0 = time.time()
    cfg = ModelConfig().tiny()
    model = ToonCrafter(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    print(f"[smoke] tiny model initialized in {time.time() - t0:.1f}s "
          f"on {jax.default_backend()}")

    t = cfg.video_length
    h_px, w_px = cfg.latent_h * 8, cfg.latent_w * 8
    fa = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, h_px, w_px, 3),
                            minval=-1, maxval=1)
    fb = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, h_px, w_px, 3),
                            minval=-1, maxval=1)
    video = jnp.concatenate(
        [fa.repeat(t // 2, 1), fb.repeat(t - t // 2, 1)], 1)
    tokens = jnp.zeros((1, 77), jnp.int32)

    pipe = Pipeline(model, ddim_steps=args.steps,
                    guidance=GuidanceConfig(cfg_scale=7.5,
                                            guidance_rescale=0.7))
    out = pipe(params, video, tokens, tokens, jnp.full((1,), 10.0),
               jax.random.PRNGKey(3))
    arr = np.asarray(out[0], np.float32)
    assert np.isfinite(arr).all(), "non-finite output"
    path = write_video(f"{args.out}.mp4", arr, fps=8)
    print(f"[smoke] OK: {out.shape} -> {path} "
          f"(total {time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
