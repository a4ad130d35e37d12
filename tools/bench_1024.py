"""576x1024 interpolation-model TPU benchmark (VERDICT r3 item 4).

Times the configs/inference_1024_v1.0.yaml workload — 72x128 latents
(9216 spatial tokens, 3.6x the flagship's quadratic site), 16 frames,
DDIM-50 2-branch CFG, perframe_ae VAE chunking — on the real chip, with
a per-phase split, and appends the datum to .audit_r04.jsonl. Synthetic
weights (runtime is value-independent, same rationale as bench.py).

Reference capability: /root/reference/configs/inference_1024_v1.0.yaml,
README model table (576x1024 interpolation checkpoint).

Usage: python tools/bench_1024.py [--steps 50]
"""

import argparse
import json
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

OUT = "/root/repo/.audit_r04.jsonl"
T0 = time.perf_counter()


def log(msg):
    print(f"[1024 +{time.perf_counter() - T0:.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    from tooncrafter_tpu.models.diffusion import (ModelConfig, Pipeline,
                                                  ToonCrafter)
    from tooncrafter_tpu.sampling.ddim import GuidanceConfig
    from tooncrafter_tpu.utils.synth import synth_params

    cfg = ModelConfig(latent_h=72, latent_w=128,
                      compute_dtype=jnp.bfloat16)
    model = ToonCrafter(cfg)
    params = synth_params(model.param_shapes())
    log("params ready")

    guidance = GuidanceConfig(cfg_scale=7.5, guidance_rescale=0.7)
    pipe = Pipeline(model, ddim_steps=args.steps, guidance=guidance,
                    perframe_ae=True)

    b, t = 1, cfg.video_length
    video = jax.random.uniform(jax.random.PRNGKey(1),
                               (b, t, 576, 1024, 3), minval=-1, maxval=1)
    tokens = jnp.zeros((b, 77), jnp.int32)
    fs = jnp.full((b,), 10.0)
    rng = jax.random.PRNGKey(0)

    import jax.random as R
    enc_rng, den_rng = R.split(rng)

    def sync(x):
        return float(jnp.mean(jax.tree_util.tree_leaves(x)[0]
                              .astype(jnp.float32)))

    phases = {}

    def timed(name, fn, *a, reps=2):
        log(f"{name}: compiling/warmup")
        out = fn(*a)
        sync(out)
        log(f"{name}: warm")
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        phases[name] = round(min(ts), 3)
        log(f"{name}: {min(ts):.3f}s")
        return out

    z, refs, concat = timed("encode", pipe._encode, params, video, enc_rng)
    contexts = timed("conditioning", pipe._conditioning, params, tokens,
                     tokens, video[:, 0])
    samples = timed("denoise", pipe._denoise, params, z, contexts, concat,
                    fs, den_rng, reps=1)
    timed("decode_full", pipe._decode, params, samples, refs)
    keep = [i for i in range(t) if i not in (1, t - 2)]
    timed("decode_splice", pipe._decode, params, samples[:, keep], refs)

    e2e = sum(phases.values())
    rec = {"name": "bench_1024_r4", "steps": args.steps,
           "latent": [72, 128], "phases_s": phases,
           "e2e_s": round(e2e, 3),
           "denoise_ms_per_step": round(
               phases["denoise"] * 1000 / args.steps, 1)}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({"metric": "clip_latency_576x1024x16_ddim50_s",
                      "value": round(e2e, 3), "unit": "s"}))


if __name__ == "__main__":
    main()
