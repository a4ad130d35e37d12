"""E2E golden fixture + drift gates (SURVEY.md §4e).

Three gates:
  1. committed golden: the tiny-config pipeline output must match
     tests/goldens/tiny_pipeline_v1.npz within a PSNR bound — a changed
     constant anywhere in schedule/sampler/model numerics fails the suite
     (the reference's analogue is the prompts/512_interp visual fixture,
     scripts/run.sh + prompts/512_interp/prompts.txt).
  2. bf16-vs-fp32 drift: the bf16 compute path must stay close to the fp32
     path (measured ~50 dB on this fixture; gated with margin).
  3. the prompts/512_interp image pair driven through the real inference
     CLI (scripts/evaluation/inference.py:280-344 equivalent) end to end.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from tooncrafter_tpu.models.diffusion import (ModelConfig, Pipeline,
                                              ToonCrafter)
from tooncrafter_tpu.sampling.ddim import GuidanceConfig
from tooncrafter_tpu.utils.metrics import psnr

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "tiny_pipeline_v1.npz")
REPO = os.path.dirname(os.path.dirname(__file__))


def _run_tiny_pipeline(dtype):
    """Deterministic tiny-config run; seeds are part of the fixture."""
    cfg = ModelConfig().tiny(compute_dtype=dtype)
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    t = cfg.video_length
    h_px, w_px = cfg.latent_h * 8, cfg.latent_w * 8
    fa = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, h_px, w_px, 3),
                            minval=-1, maxval=1)
    fb = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, h_px, w_px, 3),
                            minval=-1, maxval=1)
    video = jnp.concatenate(
        [fa.repeat(t // 2, 1), fb.repeat(t - t // 2, 1)], 1)
    tokens = jnp.zeros((1, 77), jnp.int32)
    pipe = Pipeline(model, ddim_steps=3,
                    guidance=GuidanceConfig(cfg_scale=7.5,
                                            guidance_rescale=0.7))
    out = pipe(params, video, tokens, tokens, jnp.full((1,), 10.0),
               jax.random.PRNGKey(3))
    return np.asarray(out, np.float32)


@pytest.fixture(scope="module")
def fp32_out():
    return _run_tiny_pipeline(jnp.float32)


def test_golden_pipeline_output(fp32_out):
    """Regenerate with tests/goldens/regen (documented in the npz) if a
    numeric change is intentional."""
    golden = np.load(GOLDEN)["out"]
    assert fp32_out.shape == golden.shape
    p = float(np.min(np.asarray(psnr(jnp.asarray(golden),
                                     jnp.asarray(fp32_out)))))
    assert p >= 40.0, (
        f"pipeline drifted from committed golden (min PSNR {p:.1f} dB); "
        "if the numeric change is intentional, regenerate the golden "
        "(see tests/goldens/README.md)")


def test_bf16_drift_bound(fp32_out):
    bf16 = _run_tiny_pipeline(jnp.bfloat16)
    p = float(np.min(np.asarray(psnr(jnp.asarray(fp32_out),
                                     jnp.asarray(bf16)))))
    assert p >= 35.0, f"bf16 compute drifted {p:.1f} dB from fp32"


def test_cli_interp_fixture(tmp_path):
    """prompts/512_interp through the real CLI (tiny config, 2 steps)."""
    cfg = {
        "model": {
            "target": "lvdm.models.ddpm3d.LatentVisualDiffusion",
            "params": {
                "unet_config": {
                    "target":
                        "lvdm.modules.networks.openaimodel3d.UNetModel",
                    "params": {
                        "model_channels": 64, "num_res_blocks": 1,
                        "channel_mult": [1, 2],
                        "attention_resolutions": [1, 2],
                        "num_head_channels": 32, "context_dim": 64,
                        "temporal_length": 4,
                    },
                },
                "first_stage_config": {
                    "target":
                        "lvdm.models.autoencoder.AutoencoderKL_Dualref",
                    "params": {"embed_dim": 4, "ddconfig": {
                        "z_channels": 4, "ch": 32, "ch_mult": [1, 2, 2, 2],
                        "num_res_blocks": 1}},
                },
                "cond_stage_config": {
                    "target": "lvdm.modules.encoders.condition."
                              "FrozenOpenCLIPEmbedder",
                    "params": {"width": 64, "heads": 4, "layers": 2},
                },
                "img_cond_stage_config": {
                    "target": "lvdm.modules.encoders.condition."
                              "FrozenOpenCLIPImageEmbedderV2",
                    "params": {"width": 64, "heads": 4, "layers": 2,
                               "image_size": 28},
                },
                "image_proj_stage_config": {
                    "target": "lvdm.modules.encoders.resampler.Resampler",
                    "params": {"depth": 1, "heads": 4, "num_queries": 4},
                },
            },
        },
    }
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    savedir = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    r = subprocess.run(
        [sys.executable, "-m", "tooncrafter_tpu.cli.inference",
         "--config", str(cfg_path),
         "--prompt_dir", os.path.join(REPO, "prompts", "512_interp"),
         "--savedir", str(savedir), "--interp", "--text_input",
         "--height", "32", "--width", "32", "--video_length", "4",
         "--ddim_steps", "2", "--frame_stride", "10", "--seed", "123"],
        env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    vids = list((savedir / "samples_separate").iterdir())
    assert len(vids) >= 1, r.stdout
