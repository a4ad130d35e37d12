"""One-command e2e visual parity gate vs a reference-output directory.

The day the real artifacts land (model.ckpt, CLIP BPE vocab, and a
directory of reference PyTorch outputs), parity proof is ONE command:

  python tools/parity_gate.py \
      --ckpt /path/model.ckpt --bpe /path/bpe_simple_vocab_16e6.txt.gz \
      --prompt_dir prompts/512_interp --ref_dir /path/ref_outputs \
      [--lpips_ckpt /path/vgg_lpips.pth]

It runs the converter -> 320x512 interp pipeline (the exact CLI path,
reference scripts/evaluation/inference.py:180-277) over the prompt dir,
then scores every generated clip against the same-stem reference clip
(PSNR/SSIM always; LPIPS when weights are given) and PASSes/FAILs
against thresholds.

Runnable today with synthetic weights (VERDICT r3 next-step #6): omit
--ckpt for deterministic random weights, and use --synthesize_ref once
to record the current outputs as the golden directory — the CI test
(tests/test_parity_gate.py) drives exactly that at tiny geometry, so
every stage of this command stays proven-runnable end to end.

Exit code 0 = all clips pass, 1 = any clip fails or pairs are missing.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default=None,
                   help="torch checkpoint; omit for synthetic weights")
    p.add_argument("--bpe", default=None, help="CLIP BPE vocab (.txt.gz)")
    p.add_argument("--prompt_dir", default="prompts/512_interp")
    p.add_argument("--ref_dir", required=True,
                   help="directory of reference output clips (.mp4); "
                        "matched to generated clips by filename stem")
    p.add_argument("--lpips_ckpt", default=None,
                   help="LPIPS VGG16+lin weights (optional)")
    p.add_argument("--out", default="/tmp/parity_gate_out")
    p.add_argument("--config", default=None, help="model YAML")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--frame_stride", type=int, default=10)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--cfg_scale", type=float, default=7.5)
    p.add_argument("--psnr_min", type=float, default=28.0)
    p.add_argument("--ssim_min", type=float, default=0.90)
    p.add_argument("--lpips_max", type=float, default=0.15)
    p.add_argument("--synthesize_ref", action="store_true",
                   help="record the generated outputs INTO --ref_dir as "
                        "goldens instead of comparing (bootstrap mode)")
    p.add_argument("--cpu", action="store_true")
    return p


def generate(args) -> str:
    """Run the production inference CLI into args.out; returns the
    directory holding the generated clips."""
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tooncrafter_tpu.cli import inference as CLI

    argv = [
        "--prompt_dir", args.prompt_dir, "--savedir", args.out,
        "--height", str(args.height), "--width", str(args.width),
        "--video_length", str(args.video_length),
        "--ddim_steps", str(args.ddim_steps), "--ddim_eta", "1.0",
        "--interp", "--text_input",
        "--unconditional_guidance_scale", str(args.cfg_scale),
        "--timestep_spacing", "uniform_trailing",
        "--guidance_rescale", "0.7",
        "--frame_stride", str(args.frame_stride),
        "--seed", str(args.seed), "--bs", "1",
    ]
    if args.config:
        argv += ["--config", args.config]
    if args.ckpt:
        argv += ["--ckpt_path", args.ckpt]
    if args.bpe:
        argv += ["--bpe_path", args.bpe]
    CLI.main(argv)
    return os.path.join(args.out, "samples_separate")


def _read_clip(path: str) -> np.ndarray:
    """(T, H, W, 3) float32 in [-1, 1]."""
    from tooncrafter_tpu.utils.video_io import read_video_frames

    frames = read_video_frames(path)
    return frames.astype(np.float32) / 127.5 - 1.0


def compare(gen_dir: str, ref_dir: str, args):
    """Score generated clips against same-stem reference clips.
    Returns (rows, ok)."""
    from tooncrafter_tpu.utils import metrics as ME

    lpips_params = None
    if args.lpips_ckpt:
        from tooncrafter_tpu.models.lpips import load_lpips_params
        from tooncrafter_tpu.utils.checkpoint import load_torch_state_dict

        sd = load_torch_state_dict(args.lpips_ckpt)
        lpips_params = load_lpips_params(sd, sd)

    def stem(p):
        s = os.path.splitext(os.path.basename(p))[0]
        return s.split("_sample")[0]

    gen = {stem(p): p for p in sorted(glob.glob(
        os.path.join(gen_dir, "*.mp4")))}
    ref = {stem(p): p for p in sorted(glob.glob(
        os.path.join(ref_dir, "*.mp4")))}
    rows, ok = [], True
    if not gen:
        print(f"FAIL: no generated clips under {gen_dir}")
        return rows, False
    for s, gpath in gen.items():
        if s not in ref:
            print(f"FAIL: no reference clip for '{s}' in {ref_dir}")
            ok = False
            continue
        a = _read_clip(gpath)
        b = _read_clip(ref[s])
        t = min(len(a), len(b))
        a, b = a[:t], b[:t]
        row = {"clip": s,
               "psnr": round(float(ME.video_psnr(a, b)), 3),
               "ssim": round(float(np.mean(
                   [ME.ssim(x, y) for x, y in zip(a, b)])), 4)}
        passed = (row["psnr"] >= args.psnr_min
                  and row["ssim"] >= args.ssim_min)
        if lpips_params is not None:
            row["lpips"] = round(float(np.mean(
                [ME.lpips(x[None], y[None], params=lpips_params)
                 for x, y in zip(a, b)])), 4)
            passed = passed and row["lpips"] <= args.lpips_max
        row["pass"] = bool(passed)
        ok = ok and passed
        rows.append(row)
        print(f"{s:32s} psnr={row['psnr']:7.2f} ssim={row['ssim']:.4f}"
              + (f" lpips={row['lpips']:.4f}" if "lpips" in row else "")
              + ("  PASS" if passed else "  FAIL"), flush=True)
    return rows, ok


def main(argv=None):
    args = get_parser().parse_args(argv)
    gen_dir = generate(args)
    if args.synthesize_ref:
        os.makedirs(args.ref_dir, exist_ok=True)
        n = 0
        for p in glob.glob(os.path.join(gen_dir, "*.mp4")):
            shutil.copy2(p, args.ref_dir)
            n += 1
        print(f"recorded {n} golden clips -> {args.ref_dir}")
        return 0
    rows, ok = compare(gen_dir, args.ref_dir, args)
    print(json.dumps({"gate": "parity", "pass": ok, "clips": rows}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
