"""Training CLI.

Counterpart of /root/reference/main/trainer.py: config-driven data + model
construction, LR scaling by global batch (trainer.py:88-93), periodic
checkpoints, sampled-video logging, SIGUSR1 save-on-preemption
(trainer.py:129-142), auto-resume.

  python -m tooncrafter_tpu.cli.train --config config.yaml --name run0 \
      --logdir ./runs [--train]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import signal


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--name", type=str, default="run")
    p.add_argument("--logdir", type=str, default="./runs")
    p.add_argument("--train", action="store_true")
    p.add_argument("--auto_resume", action="store_true")
    p.add_argument("--max_steps", type=int, default=100000)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--sample_every", type=int, default=500)
    p.add_argument("--val_every", type=int, default=1000)
    p.add_argument("--seed", type=int, default=20230211)
    p.add_argument("--pretrained_ckpt", type=str, default=None,
                   help="torch ckpt to warm-start from (any dialect)")
    p.add_argument("--ignore_keys", type=str, default="",
                   help="comma-separated torch-key prefixes to drop from "
                        "the pretrained ckpt (ddpm3d.py:204-220)")
    p.add_argument("--only_model", action="store_true",
                   help="load only the denoiser weights from the ckpt")
    p.add_argument("--bpe_path", type=str, default=None)
    p.add_argument("--n_model_shards", type=int, default=1)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    import jax

    # honor an explicit JAX_PLATFORMS env var (see cli/inference.py — on
    # hosts with a force-registered TPU plugin the env var alone loses)
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    import jax.numpy as jnp

    from tooncrafter_tpu.config import load_yaml, model_config_from_dict
    from tooncrafter_tpu.data.webvid import PrefetchLoader, WebVidDataset
    from tooncrafter_tpu.models.diffusion import ToonCrafter
    from tooncrafter_tpu.parallel import mesh as M
    from tooncrafter_tpu.training import callbacks as CB
    from tooncrafter_tpu.training import checkpoints as CKPT
    from tooncrafter_tpu.training import trainer as T
    from tooncrafter_tpu.utils.tokenizer import ClipTokenizer

    raw = load_yaml(args.config)
    cfg = model_config_from_dict(raw)
    if jax.default_backend() != "cpu":
        cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
    model = ToonCrafter(cfg)

    workdir = os.path.join(args.logdir, args.name)
    ckpt_dir = os.path.join(workdir, "checkpoints")
    os.makedirs(workdir, exist_ok=True)
    logger = CB.MetricLogger(workdir)

    # ---- data ----
    dcfg = raw.get("data", {}).get("params", {})
    train_d = dcfg.get("train", {}).get("params", {})
    base_lr = raw.get("model", {}).get("base_learning_rate", 1e-5)
    bs = dcfg.get("batch_size", 1)
    if args.bpe_path:
        tokenizer = ClipTokenizer(bpe_path=args.bpe_path)
    else:
        import warnings

        warnings.warn(
            "no --bpe_path: falling back to byte-level tokenization, which "
            "matches NO released CLIP checkpoint — text conditioning will "
            "be garbage outside smoke runs", stacklevel=2)
        tokenizer = ClipTokenizer(merges=[])
    ds = WebVidDataset(
        meta_path=train_d.get("meta_path", ""),
        data_dir=train_d.get("data_dir", ""),
        video_length=train_d.get("video_length", cfg.video_length),
        frame_stride=train_d.get("frame_stride", 6),
        resolution=train_d.get("resolution", [cfg.latent_h * 8,
                                              cfg.latent_w * 8]),
        fps_max=train_d.get("fps_max"),
        fixed_fps=train_d.get("fixed_fps"),
    )
    # each host loads a disjoint shard of every epoch (the reference's
    # DistributedSampler/worker split, main/utils_data.py:15-28); on a
    # single host this is the identity
    host_shard = (jax.process_index(), jax.process_count())
    loader = PrefetchLoader(ds, bs, tokenizer=tokenizer,
                            num_workers=dcfg.get("num_workers", 4),
                            seed=args.seed, shard=host_shard)

    # optional validation split (reference validation_step, ddpm3d.py:399-406)
    val_d = dcfg.get("validation", {}).get("params", {})
    val_loader = None
    if val_d.get("meta_path"):
        val_ds = WebVidDataset(
            meta_path=val_d["meta_path"],
            data_dir=val_d.get("data_dir", train_d.get("data_dir", "")),
            video_length=val_d.get("video_length", cfg.video_length),
            frame_stride=val_d.get("frame_stride", 6),
            resolution=val_d.get("resolution", [cfg.latent_h * 8,
                                                cfg.latent_w * 8]),
            fps_max=val_d.get("fps_max"), fixed_fps=val_d.get("fixed_fps"))
        val_loader = PrefetchLoader(val_ds, bs, tokenizer=tokenizer,
                                    num_workers=2, seed=args.seed + 1,
                                    shard=host_shard)

    # ---- mesh / params / optimizer ----
    mesh = M.make_mesh(n_model=args.n_model_shards)
    n_chips = len(jax.devices())
    lr = base_lr * bs * n_chips  # trainer.py:88-93 scaling rule
    mp = raw.get("model", {}).get("params", {})
    tcfg = T.TrainConfig(
        learning_rate=lr,
        uncond_prob=mp.get("uncond_prob", 0.05),
        rand_cond_frame=mp.get("rand_cond_frame", True),
        # reference scheduler YAML (`scheduler_config`, ddpm3d.py:1015-1039)
        scheduler=mp.get("scheduler_config"))
    lr_of_step = tcfg.lr_schedule()

    rng = jax.random.PRNGKey(args.seed)
    params = model.init_params(rng)
    if args.pretrained_ckpt:
        from tooncrafter_tpu.utils.checkpoint import load_checkpoint

        ik = tuple(k for k in args.ignore_keys.split(",") if k)
        params, report = load_checkpoint(args.pretrained_ckpt, cfg, params,
                                         ignore_keys=ik,
                                         only_model=args.only_model)
        print(f"warm start: {len(report['missing'])} missing, "
              f"{len(report.get('filled_from_init', []))} filled from init")

    state, opt = T.make_train_state(model, params, tcfg, use_ema=True)
    if args.auto_resume:
        state, start_step = CKPT.restore_train_state(ckpt_dir, state)
        print(f"resumed at step {start_step}")

    # shard: batch over data axis; big params ZeRO/TP-sharded
    state = dataclasses.replace(
        state,
        train_params=jax.device_put(
            state.train_params, M.shard_params(state.train_params, mesh)))
    # donate the state: the loop rebinds `state = step_fn(state, ...)`,
    # and without donation the update holds old AND new params live
    # (2x peak — measured to OOM a full single-chip step, r5)
    step_fn = jax.jit(T.make_train_step(model, opt, tcfg),
                      donate_argnums=(0,))
    val_fn = jax.jit(T.make_val_step(model, tcfg))
    sampler_log = CB.VideoSampleLogger(model, workdir,
                                       every_steps=args.sample_every)
    tracker = CB.ThroughputTracker(bs)

    # SIGUSR1 -> checkpoint now (preemption hook, trainer.py:129-142)
    want_ckpt = {"now": False}
    signal.signal(signal.SIGUSR1,
                  lambda *_: want_ckpt.update(now=True))

    if not args.train:
        print("dry run complete (pass --train to start)")
        return

    probe = None
    val_iter = iter(val_loader) if val_loader is not None else None
    step = int(state.step)
    while step < args.max_steps:
        for batch in loader:
            if probe is None:
                probe = batch
            jb = {
                "video": jnp.asarray(batch["video"]),
                "tokens": jnp.asarray(batch["tokens"]),
                "null_tokens": jnp.asarray(batch["null_tokens"]),
                "fs": jnp.asarray(batch["fs"]),
                "fps": jnp.asarray(batch["fps"]),
            }
            jb = jax.device_put(jb, M.batch_sharding(mesh))
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, jb, sub)
            step = int(state.step)
            metrics = {k: float(v) for k, v in metrics.items()}
            metrics.update(tracker.step())
            metrics.update(CB.device_memory_stats())
            metrics["lr"] = float(lr_of_step(step))
            logger.log(step, metrics)
            if step % 50 == 0:
                print(f"step {step}: loss={metrics['loss']:.4f} "
                      f"({metrics.get('samples_per_sec', 0):.2f} samples/s)")
            # sampled-video probe runs with EMA weights (reference ImageLogger
            # samples inside ema_scope, ddpm3d.py:192-202)
            rng, sub = jax.random.split(rng)
            out = sampler_log.maybe_log(step, T.eval_param_tree(state),
                                        probe, sub)
            if out:
                print(f"sampled video -> {out}")
            if val_loader is not None and step % args.val_every == 0:
                # persistent iterator: cycle through the split across events
                # instead of re-spawning a loader and validating on its
                # first batch forever
                try:
                    vb = next(val_iter)
                except StopIteration:
                    val_iter = iter(val_loader)
                    vb = next(val_iter)
                vjb = {
                    "video": jnp.asarray(vb["video"]),
                    "tokens": jnp.asarray(vb["tokens"]),
                    "null_tokens": jnp.asarray(vb["null_tokens"]),
                    "fs": jnp.asarray(vb["fs"]),
                    "fps": jnp.asarray(vb["fps"]),
                }
                vjb = jax.device_put(vjb, M.batch_sharding(mesh))
                rng, sub = jax.random.split(rng)
                vm = {k: float(v) for k, v in val_fn(state, vjb, sub).items()}
                logger.log(step, vm)
                print(f"step {step}: " + " ".join(
                    f"{k}={v:.4f}" for k, v in vm.items()))
            if step % args.ckpt_every == 0 or want_ckpt["now"]:
                CKPT.save_train_state(ckpt_dir, step, state)
                want_ckpt["now"] = False
            if step >= args.max_steps:
                break
    CKPT.save_train_state(ckpt_dir, step, state, wait=True)
    logger.close()
    print(f"done at step {step}")


if __name__ == "__main__":
    main()
