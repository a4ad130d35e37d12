"""Audit: exact XLA FLOP counts + per-phase B=1 vs B=2 timings on TPU.

Round-2 ground truth for PARITY.md's perf section:
  * per-compile `cost_analysis()['flops']` — fixes the round-1 2x
    double-count (SURVEY's "100 UNet forwards" are the single-branch halves
    of 50 CFG-batched evals, not 100 extra evals)
  * phase timings (encode / conditioning / denoise / decode) at clip batch
    1 and 2 to localize the measured B=2 throughput regression
    (BENCH_r01: 4.57 clips/min at B=1 vs 4.46 at B=2).

Appends one JSON line per measurement to .audit_r02.jsonl as it goes, so a
long run can be inspected mid-flight.

Usage: python tools/flops_audit.py [--only unet,decode,denoise,encode]
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

V5E_PEAK_TFLOPS = 197.0  # bf16
OUT = "/root/repo/.audit_r05.jsonl"
T0 = time.time()
TAG = None  # set by --tag; suffixes every record name so A/B variants
#             can't be mistaken for the current baseline (ADVICE r2 #1)


def log(msg):
    print(f"[audit +{time.time() - T0:.0f}s] {msg}", flush=True)


def emit(record):
    record["t_wall"] = round(time.time() - T0, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(record) + "\n")
    log(json.dumps(record))


def sync(y):
    return float(jnp.mean(jax.tree_util.tree_leaves(y)[0]
                          .astype(jnp.float32)))


def measure(name, fn, args, n_timed=8):
    """Compile fn(*args), read cost_analysis flops, time it."""
    if TAG:
        name = f"{name}_{TAG}"
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        hbm = float(ca.get("bytes accessed", 0.0))
    except Exception as exc:  # noqa: BLE001
        flops, hbm = 0.0, 0.0
        log(f"cost_analysis failed for {name}: {exc}")
    sync(compiled(*args))  # warm
    times = []
    for _ in range(n_timed):
        s = time.perf_counter()
        sync(compiled(*args))
        times.append(time.perf_counter() - s)
    times.sort()
    med = times[len(times) // 2]
    emit({
        "name": name,
        "median_ms": round(med * 1e3, 2),
        "tflop": round(flops / 1e12, 3),
        "tflops_per_s": round(flops / 1e12 / med, 1),
        "mfu_pct": round(100 * flops / 1e12 / med / V5E_PEAK_TFLOPS, 1),
        "hbm_gb_per_call": round(hbm / 2**30, 2),
        "compile_s": round(compile_s, 1),
        "min_ms": round(times[0] * 1e3, 2),
    })
    return compiled


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", default="unet,encode,decode,denoise")
    p.add_argument("--batches", default="1,2",
                   help="clip batch sizes to measure (comma-separated)")
    p.add_argument("--tag", default=None,
                   help="suffix for record names (A/B experiment label)")
    p.add_argument("--latent", default=None,
                   help="HxW latent override, e.g. 72x128 (the 576x1024 "
                        "interpolation model)")
    args = p.parse_args()
    if args.tag:
        global TAG
        TAG = args.tag
    phases = set(args.only.split(","))
    batches = tuple(int(b) for b in args.batches.split(","))

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
    t = cfg.video_length
    lh, lw = cfg.latent_h, cfg.latent_w
    h_px, w_px = lh * 8, lw * 8
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    if "unet" in phases:
        params = synth_params({"unet": shapes["unet"]})

        def fwd(params, x, ts, ctx, fs):
            return model.unet.apply({"params": params["unet"]}, x, ts, ctx,
                                    fs)

        for nb, tag in [(2 * b, f"unet_cfg_fwd_b{b}clip") for b in batches]:
            x = jnp.zeros((nb, t, lh, lw, 8), jnp.bfloat16)
            ts = jnp.full((nb,), 500.0)
            ctx = jnp.zeros((nb, 77 + t * 16, 1024), jnp.bfloat16)
            fs = jnp.full((nb,), 10.0)
            measure(tag, fwd, (params, x, ts, ctx, fs))
        del params

    if "encode" in phases:
        params = synth_params({"vae": shapes["vae"]})
        full = {"vae": params["vae"]}

        def enc(params, video, rng):
            return model.encode_first_stage(params, video, rng=rng)

        for b in batches:
            video = jnp.zeros((b, t, h_px, w_px, 3), jnp.bfloat16)
            measure(f"encode_b{b}", enc, (full, video, jax.random.PRNGKey(0)),
                    n_timed=4)
        del params, full

    if "decode" in phases:
        params = synth_params({"dualref_decoder": shapes["dualref_decoder"]})

        def dec(params, z, refs):
            return model.decode_first_stage(params, z, refs)

        taps = model._tap_shapes(h_px, w_px)
        for b in batches:
            z = jnp.zeros((b, t, lh, lw, 4), jnp.bfloat16)
            refs = [jnp.zeros((b, 2, th, tw, tc), jnp.bfloat16)
                    for (th, tw, tc) in taps]
            measure(f"decode_b{b}", dec, (params, z, refs), n_timed=4)
        del params

    if "denoise" in phases:
        params = synth_params({"unet": shapes["unet"]})
        guidance = GuidanceConfig(cfg_scale=7.5, guidance_rescale=0.7)

        def denoise(params, x_T, contexts, concat, fs, rng):
            return model.denoise(params, x_T, contexts, concat, fs, rng,
                                 guidance, ddim_steps=50)

        for b in batches:
            # fp32 latent carry, exactly like Pipeline._denoise (x_T comes
            # from jax.random.normal; schedule math is fp32)
            x_T = jnp.zeros((b, t, lh, lw, 4), jnp.float32)
            contexts = jnp.zeros((2, b, 77 + t * 16, 1024), jnp.bfloat16)
            concat = jnp.zeros((b, t, lh, lw, 4), jnp.bfloat16)
            fs = jnp.full((b,), 10.0)
            measure(f"denoise50_b{b}", denoise,
                    (params, x_T, contexts, concat, fs,
                     jax.random.PRNGKey(0)), n_timed=3)

    log("audit complete")


if __name__ == "__main__":
    main()
