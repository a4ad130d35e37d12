"""Inference CLI — flag-compatible with the reference's
`scripts/evaluation/inference.py` (see its get_parser at :347-374 and
scripts/run.sh):

  python -m tooncrafter_tpu.cli.inference \
      --ckpt_path model.ckpt --config configs/inference_512_v1.0.yaml \
      --prompt_dir prompts/512_interp --savedir results/ \
      --height 320 --width 512 --interp --text_input \
      --unconditional_guidance_scale 7.5 --ddim_steps 50 --ddim_eta 1.0 \
      --timestep_spacing uniform_trailing --guidance_rescale 0.7 \
      --frame_stride 10 --seed 123

Multi-host batch sharding (the ddp_wrapper equivalent) falls out of
jax.process_index(): each host takes its slice of the prompt list.
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--savedir", type=str, default="results")
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--prompt_dir", type=str, required=True)
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--ddim_eta", type=float, default=1.0)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--frame_stride", type=int, default=10)
    p.add_argument("--unconditional_guidance_scale", type=float, default=7.5)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--negative_prompt", action="store_true")
    p.add_argument("--text_input", action="store_true")
    p.add_argument("--multiple_cond_cfg", action="store_true")
    p.add_argument("--cfg_img", type=float, default=None)
    p.add_argument("--timestep_spacing", type=str, default="uniform_trailing")
    p.add_argument("--guidance_rescale", type=float, default=0.0)
    # default=None: fall back to the model YAML's `perframe_ae` key
    # (inference_512_v1.0.yaml:23) when the flag isn't given
    p.add_argument("--perframe_ae", action="store_true", default=None)
    p.add_argument("--loop", action="store_true")
    p.add_argument("--interp", action="store_true")
    p.add_argument("--bpe_path", type=str, default=None,
                   help="CLIP BPE merges file (ships with the checkpoint)")
    p.add_argument("--save_fps", type=int, default=8)
    return p


def load_data_prompts(data_dir, video_size, video_frames, interp):
    """Image pairs + prompts.txt, packed like inference.py:64-106."""
    from tooncrafter_tpu.ops.resize import center_crop_resize
    from tooncrafter_tpu.utils.video_io import load_image
    import jax.numpy as jnp

    prompt_files = sorted(glob.glob(os.path.join(data_dir, "*.txt")))
    assert prompt_files, f"no prompt .txt in {data_dir}"
    with open(prompt_files[0]) as f:
        prompts = [l.strip() for l in f if l.strip()]
    images = sorted(
        sum((glob.glob(os.path.join(data_dir, e))
             for e in ("*.png", "*.jpg", "*.jpeg", "*.JPEG", "*.PNG")), []))
    data, names = [], []
    for i in range(len(prompts)):
        if interp:
            a = load_image(images[2 * i])[None]
            b = load_image(images[2 * i + 1])[None]
            a = np.asarray(center_crop_resize(jnp.asarray(a), *video_size))
            b = np.asarray(center_crop_resize(jnp.asarray(b), *video_size))
            half = video_frames // 2
            vid = np.concatenate([np.repeat(a, half, 0),
                                  np.repeat(b, video_frames - half, 0)], 0)
            names.append(os.path.basename(images[2 * i]))
        else:
            a = load_image(images[i])[None]
            a = np.asarray(center_crop_resize(jnp.asarray(a), *video_size))
            vid = np.repeat(a, video_frames, 0)
            names.append(os.path.basename(images[i]))
        data.append(vid)
    return names, data, prompts


def host_shard(n_items: int, pid: int, n_proc: int) -> slice:
    """Slice of the prompt list this host owns.

    The reference drops the remainder when n_items % n_proc != 0
    (inference.py:314-320, `num_samples // gpu_num` on every rank) — here
    the remainder is spread over the first (n_items % n_proc) hosts so no
    prompt is skipped and no single host absorbs up to n_proc-1 extras."""
    share, rem = divmod(n_items, n_proc)
    lo = pid * share + min(pid, rem)
    hi = lo + share + (1 if pid < rem else 0)
    return slice(lo, hi)


def main(argv=None):
    args = get_parser().parse_args(argv)
    import jax

    # Honor an explicit JAX_PLATFORMS env var through the config knob: on
    # hosts whose sitecustomize force-registers a TPU plugin, the env var
    # alone loses and a "cpu" subprocess silently lands on the TPU
    # (contending with the real workload).
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    import jax.numpy as jnp

    from tooncrafter_tpu.config import model_config_from_yaml
    from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter
    from tooncrafter_tpu.sampling.ddim import GuidanceConfig
    from tooncrafter_tpu.utils.tokenizer import ClipTokenizer
    from tooncrafter_tpu.utils.video_io import write_video

    t_start = time.time()
    if args.config:
        cfg = model_config_from_yaml(args.config)
    else:
        cfg = ModelConfig()
    import dataclasses
    cfg = dataclasses.replace(
        cfg, video_length=args.video_length,
        latent_h=args.height // 8, latent_w=args.width // 8,
        compute_dtype=jnp.bfloat16
        if jax.default_backend() != "cpu" else jnp.float32)

    model = ToonCrafter(cfg)
    rng = jax.random.PRNGKey(args.seed)
    if args.ckpt_path:
        from tooncrafter_tpu.utils.checkpoint import load_checkpoint
        template = model.init_params(rng)
        params, report = load_checkpoint(args.ckpt_path, cfg, template)
        if report["missing"]:
            print(f"[warn] {len(report['missing'])} params missing from ckpt")
    else:
        print("[warn] no --ckpt_path: using random weights (smoke mode)")
        params = model.init_params(rng)

    tokenizer = None
    if args.bpe_path:
        tokenizer = ClipTokenizer(bpe_path=args.bpe_path)
    elif args.text_input:
        import warnings

        warnings.warn(
            "--text_input without --bpe_path: prompts will be IGNORED "
            "(zero tokens for both cond and uncond)", stacklevel=2)

    names, data, prompts = load_data_prompts(
        args.prompt_dir, (args.height, args.width), args.video_length,
        args.interp)

    # host-sharded workload (ddp_wrapper equivalent)
    sel = host_shard(len(prompts), jax.process_index(), jax.process_count())

    guidance = GuidanceConfig(
        cfg_scale=args.unconditional_guidance_scale,
        cfg_img=args.cfg_img if args.multiple_cond_cfg else None,
        guidance_rescale=args.guidance_rescale)

    from tooncrafter_tpu.models.diffusion import Pipeline

    perframe_ae = (cfg.perframe_ae if args.perframe_ae is None
                   else args.perframe_ae)
    jpipe = Pipeline(
        model, ddim_steps=args.ddim_steps, eta=args.ddim_eta,
        spacing=args.timestep_spacing, guidance=guidance,
        mode="interp" if (args.interp or args.loop) else "repeat",
        perframe_ae=perframe_ae)
    os.makedirs(os.path.join(args.savedir, "samples_separate"),
                exist_ok=True)

    # batched inference over --bs prompts per pipeline call (reference
    # inference.py:323-342). The tail batch is padded by repeating its last
    # prompt so the jitted pipeline keeps ONE compiled batch shape; padded
    # outputs are dropped. Per-item keys (utils/rngs.py) keyed by global
    # prompt index make any --bs reproduce the --bs 1 outputs exactly.
    from tooncrafter_tpu.utils import rngs as R

    idx_list = list(range(sel.start or 0, sel.stop or len(prompts)))
    bs = max(1, args.bs)
    for i0 in range(0, len(idx_list), bs):
        chunk = idx_list[i0:i0 + bs]
        padded = chunk + [chunk[-1]] * (bs - len(chunk))
        batch_prompts = [prompts[j] if args.text_input else ""
                         for j in padded]
        if tokenizer is not None:
            tokens = jnp.asarray(tokenizer(batch_prompts))
            null_tokens = jnp.tile(jnp.asarray(tokenizer([""])), (bs, 1))
        else:
            tokens = jnp.zeros((bs, 77), jnp.int32)
            null_tokens = jnp.zeros((bs, 77), jnp.int32)
        video = jnp.asarray(np.stack([data[j] for j in padded]))
        fs = jnp.full((bs,), float(args.frame_stride))
        for n in range(args.n_samples):
            keys = R.per_item_keys(
                rng, [j * args.n_samples + n for j in padded])
            out = jpipe(params, video, tokens, null_tokens, fs, keys)
            for k, idx in enumerate(chunk):
                out_np = np.asarray(out[k], np.float32)
                if args.loop:
                    out_np = out_np[:-1]
                stem = os.path.splitext(names[idx])[0]
                path = os.path.join(args.savedir, "samples_separate",
                                    f"{stem}_sample{n}.mp4")
                written = write_video(path, out_np, fps=args.save_fps)
                print(f"saved {written}")
    print(f"Saved in {args.savedir}. Time used: "
          f"{time.time() - t_start:.2f} seconds")


if __name__ == "__main__":
    main()
