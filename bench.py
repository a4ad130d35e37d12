"""End-to-end inference benchmark.

Measures p50 clip latency for the headline workload: 320x512, 16 frames,
DDIM-50 with 2-branch CFG, dual-reference VAE decode with the middle-frame
splice — the same work the reference does in ~24 s on an A100
(BASELINE.md). Prints ONE JSON line.

On TPU the full-size model runs in bf16. On CPU (no TPU available) the
benchmark auto-shrinks so the harness still produces a signal.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the full-pipeline XLA compile is minutes; cache
# it so driver re-runs measure runtime, not compile time
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BASELINE_S = 24.0  # A100 end-to-end (reference README.md:220-222)


def build(full: bool):
    from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter

    if full:
        cfg = ModelConfig(compute_dtype=jnp.bfloat16)
        ddim_steps = 50
    else:
        cfg = ModelConfig().tiny()
        ddim_steps = 5
    return ToonCrafter(cfg), cfg, ddim_steps


def main():
    full = jax.default_backend() not in ("cpu",)
    model, cfg, ddim_steps = build(full)
    from tooncrafter_tpu.sampling.ddim import GuidanceConfig

    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    if full:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params)

    t = cfg.video_length
    h_px, w_px = cfg.latent_h * 8, cfg.latent_w * 8
    b = 1
    video = jax.random.uniform(jax.random.PRNGKey(1),
                               (b, t, h_px, w_px, 3), minval=-1, maxval=1)
    tokens = jnp.zeros((b, 77), jnp.int32)
    fs = jnp.full((b,), 10.0)
    guidance = GuidanceConfig(cfg_scale=7.5, guidance_rescale=0.7)

    def clip_pipeline(params, video, tokens, fs, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        z, refs = model.encode_first_stage(params, video, rng=r1)
        concat = model.build_concat_cond(z, "interp")
        text_emb = model.encode_text(params, tokens)
        img_ctx = model.encode_image_context(params, video[:, 0])
        uc_img = model.encode_image_context(params,
                                            jnp.zeros_like(video[:, 0]))
        cond = jnp.concatenate([text_emb, img_ctx], axis=1)
        uc = jnp.concatenate([text_emb, uc_img], axis=1)
        contexts = jnp.stack([uc, cond])
        x_T = jax.random.normal(r2, z.shape)
        samples = model.denoise(params, x_T, contexts, concat, fs, r3,
                                guidance, ddim_steps=ddim_steps)
        from tooncrafter_tpu.models.diffusion import middle_frame_splice
        return middle_frame_splice(model, params, samples, refs)

    fn = jax.jit(clip_pipeline)
    # warmup/compile
    out = fn(params, video, tokens, fs, jax.random.PRNGKey(2))
    jax.block_until_ready(out)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(params, video, tokens, fs, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]

    metric = ("clip_latency_320x512x16_ddim50_s" if full
              else "clip_latency_tiny_cpu_s")
    vs = BASELINE_S / p50 if full else 0.0
    print(json.dumps({
        "metric": metric,
        "value": round(p50, 3),
        "unit": "s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
