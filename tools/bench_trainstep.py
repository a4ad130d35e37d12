"""Single-chip training-step timing (VERDICT r2 next #9).

The reference publishes ~3 s/step as its training hint (bs=2/GPU x 8
A100s x grad-accum 2, configs/training_512_v1.0/config.yaml:155). Full
fp32 AdamW state for the 1.1B-param UNet does not fit one 16 GB v5e
(PARITY.md), so this benches the largest single-chip configuration that
does and records exactly what it measured:

  * bs=1, 320x512x16, remat (use_checkpoint) ON, EMA off
  * AdamW with bf16 first moment (mu_dtype) — second moment fp32
  * full diffusion_loss (frozen VAE encode + CLIP text/image cond +
    UNet fwd/bwd) — the same work the reference step does
  * optionally --grad-only: value_and_grad without the optimizer
    update, the pure compute number

Appends one JSON line per measurement to .audit_r03.jsonl.
"""

from __future__ import annotations

import argparse
import functools
import json
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

OUT = "/root/repo/.audit_r05.jsonl"
T0 = time.time()


def log(msg):
    print(f"[trainbench +{time.time() - T0:.0f}s] {msg}", flush=True)


def emit(rec):
    rec["t_wall"] = round(time.time() - T0, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(json.dumps(rec))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grad-only", action="store_true")
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--remat", default="full",
                    choices=["full", "dots", "dots_no_batch", "off"],
                    help="per-block remat policy sweep (r5 attribution): "
                         "full = save nothing, dots = save MXU outputs, "
                         "off = no remat (memory permitting)")
    ap.add_argument("--trace", default=None,
                    help="profiler logdir: trace one step and print the "
                         "per-bucket op breakdown")
    ap.add_argument("--optimizer", default="adamw_bf16mu",
                    choices=["adamw_bf16mu", "adafactor"],
                    help="full-update path only: adamw_bf16mu OOMs one "
                         "16 GB chip (r3/r5); adafactor is the "
                         "single-chip profile (trainer.py r5)")
    args = ap.parse_args()

    import dataclasses

    import optax

    from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter
    from tooncrafter_tpu.training import trainer as T
    from tooncrafter_tpu.utils.synth import synth_params

    cfg = ModelConfig(compute_dtype=jnp.bfloat16,
                      use_checkpoint=args.remat != "off",
                      remat_policy=(None if args.remat in ("full", "off")
                                    else args.remat))
    model = ToonCrafter(cfg)
    shapes = model.param_shapes()
    log(f"backend={jax.default_backend()}")
    params = synth_params(shapes)
    train, frozen = T.split_trainable(params)
    n_train = sum(x.size for x in jax.tree_util.tree_leaves(train))
    log(f"trainable params: {n_train/1e9:.2f}B")

    b, t = args.bs, cfg.video_length
    batch = {
        "video": jnp.zeros((b, t, cfg.latent_h * 8, cfg.latent_w * 8, 3),
                           jnp.bfloat16),
        "tokens": jnp.zeros((b, 77), jnp.int32),
        "null_tokens": jnp.zeros((b, 77), jnp.int32),
        "fs": jnp.full((b,), 10, jnp.int32),
        "fps": jnp.full((b,), 8.0, jnp.float32),
    }
    rng = jax.random.PRNGKey(0)

    def loss_fn(tp, fr, bt):
        loss, metrics = T.diffusion_loss(model, tp, fr, bt, rng)
        return loss, metrics

    if args.grad_only:
        @jax.jit
        def step(tp, fr, bt):
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(tp, fr, bt)
            return loss, optax.global_norm(grads)

        arg = (train, frozen, batch)
        name = f"trainstep_gradonly_bs{b}_remat_{args.remat}"
    else:
        if args.optimizer == "adafactor":
            opt = optax.adafactor(1e-5, weight_decay_rate=1e-2,
                                  momentum=None)
        else:
            # bf16 mu: the fp32 (params, mu, nu) triple alone is
            # 13.2 GB and evicts the activations (OOMs in practice)
            opt = optax.adamw(1e-5, mu_dtype=jnp.bfloat16,
                              weight_decay=1e-2)
        opt_state = opt.init(train)

        # donate params + opt state: without donation the update holds
        # old AND new params live (2x 6 GB) and the SECOND call OOMs a
        # 16 GB chip (r5); the real trainer threads state the same way
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(tp, os_, fr, bt):
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(tp, fr, bt)
            updates, os_ = opt.update(grads, os_, tp)
            return optax.apply_updates(tp, updates), os_, loss

        arg = (train, opt_state, frozen, batch)
        name = f"trainstep_{args.optimizer}_bs{b}_remat_{args.remat}"

    t0 = time.time()
    # compile explicitly so cost_analysis is readable (NOTE: the figure
    # UNDERREPORTS model FLOPs — Pallas kernels (flash fwd/bwd, fused FF)
    # hide theirs from XLA's count; treat it as a floor)
    flops = hbm = 0.0
    try:
        c = step.lower(*arg).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        hbm = float(ca.get("bytes accessed", 0.0))
        step = c
    except Exception as exc:  # noqa: BLE001
        log(f"cost_analysis unavailable: {exc}")
    out = step(*arg)
    jax.block_until_ready(out)
    # block_until_ready under-synchronizes through the axon relay; force a
    # host read of one scalar
    float(jnp.mean(jax.tree_util.tree_leaves(out)[-1].astype(jnp.float32)))
    compile_s = time.time() - t0
    log(f"compiled+first step in {compile_s:.0f}s")

    times = []
    for _ in range(args.steps):
        s = time.perf_counter()
        if args.grad_only:
            out = step(*arg)
        else:
            # donated buffers: thread the updated (params, opt_state)
            tp_, os2, loss_ = out
            out = step(tp_, os2, frozen, batch)
        float(jnp.mean(
            jax.tree_util.tree_leaves(out)[-1].astype(jnp.float32)))
        times.append(time.perf_counter() - s)
    times.sort()
    med = times[len(times) // 2]
    emit({"name": name, "median_s": round(med, 3),
          "min_s": round(times[0], 3), "compile_s": round(compile_s, 1),
          "xla_tflop_floor": round(flops / 1e12, 2),
          "xla_tflops_per_s_floor": round(flops / 1e12 / med, 1),
          "hbm_gb_per_step": round(hbm / 2**30, 1),
          "remat": args.remat, "ema": False, "note":
          "single chip; reference hint ~3 s/step at bs2x8gpu+accum2; "
          "tflop is an XLA floor (Pallas kernels hide FLOPs)"})

    if args.trace:
        jax.profiler.start_trace(args.trace)
        if args.grad_only:
            out = step(*arg)
        else:
            tp_, os2, loss_ = out
            out = step(tp_, os2, frozen, batch)
        float(jnp.mean(
            jax.tree_util.tree_leaves(out)[-1].astype(jnp.float32)))
        jax.profiler.stop_trace()
        _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
        from profile_unet import parse_trace
        parse_trace(args.trace)


if __name__ == "__main__":
    main()
