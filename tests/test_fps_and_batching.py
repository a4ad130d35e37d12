"""Round-2 behavioral gaps: fps_condition_type selection
(ddpm3d.py:486,1124-1129), model-level perframe_ae/loop_video YAML keys
(inference_512_v1.0.yaml:23-24), and batch-size-invariant sampling
(--bs batched CLI inference, inference.py:323-342)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.config import model_config_from_yaml
from tooncrafter_tpu.models.diffusion import (ModelConfig, Pipeline,
                                              ToonCrafter)
from tooncrafter_tpu.sampling.ddim import GuidanceConfig
from tooncrafter_tpu.training import trainer as T
from tooncrafter_tpu.utils import rngs as R

REPO = os.path.dirname(os.path.dirname(__file__))


# ---------------------------------------------------------------------------
# config keys
# ---------------------------------------------------------------------------

def test_yaml_parses_fps_perframe_loop_keys():
    cfg = model_config_from_yaml(
        os.path.join(REPO, "configs", "inference_512_v1.0.yaml"))
    assert cfg.fps_condition_type == "fps"
    assert cfg.perframe_ae is True
    assert cfg.loop_video is True
    tcfg = model_config_from_yaml(
        os.path.join(REPO, "configs", "training_512_v1.0.yaml"))
    assert tcfg.fps_condition_type == "fps"
    assert tcfg.perframe_ae is True
    assert tcfg.loop_video is False  # absent in the reference training YAML


def test_training_1024_yaml_parses():
    # counterpart of /root/reference/configs/training_1024_v1.0/config.yaml
    cfg = model_config_from_yaml(
        os.path.join(REPO, "configs", "training_1024_v1.0.yaml"))
    assert (cfg.latent_h, cfg.latent_w) == (72, 128)
    assert cfg.base_scale == 0.3
    assert cfg.fps_condition_type == "fps"
    assert cfg.perframe_ae is True


def test_defaults_match_reference_ctor():
    # ddpm3d.py:485-487 defaults
    cfg = ModelConfig()
    assert cfg.fps_condition_type == "fs"
    assert cfg.perframe_ae is False
    assert cfg.loop_video is False


def test_inference_cli_perframe_ae_defaults_from_yaml():
    from tooncrafter_tpu.cli.inference import get_parser

    args = get_parser().parse_args(["--prompt_dir", "x"])
    assert args.perframe_ae is None  # -> falls back to the YAML key
    args = get_parser().parse_args(["--prompt_dir", "x", "--perframe_ae"])
    assert args.perframe_ae is True


# ---------------------------------------------------------------------------
# fps_condition_type in the training loss
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_setup():
    cfg = ModelConfig().tiny()
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    train, frozen = T.split_trainable(params)
    b, t = 2, cfg.video_length
    batch = {
        "video": jnp.asarray(np.random.RandomState(0).uniform(
            -1, 1, (b, t, cfg.latent_h * 8, cfg.latent_w * 8, 3)),
            jnp.float32),
        "tokens": jnp.zeros((b, 77), jnp.int32),
        "null_tokens": jnp.zeros((b, 77), jnp.int32),
        "fs": jnp.full((b,), 10, jnp.int32),
        "fps": jnp.full((b,), 24.0, jnp.float32),
    }
    return cfg, params, train, frozen, batch


def _loss(cfg, train, frozen, batch, fct):
    model = ToonCrafter(dataclasses.replace(cfg, fps_condition_type=fct))
    loss, _ = T.diffusion_loss(model, train, frozen, batch,
                               jax.random.PRNGKey(7), train=False)
    return float(loss)


def test_fps_condition_type_selects_batch_signal(tiny_setup):
    cfg, params, train, frozen, batch = tiny_setup
    # every residual branch ends in a zero-init kernel at init (reference
    # zero_module parity), which makes the UNet ignore the embeddings
    # entirely — fill all zero kernels so the fps signal shows through
    train = dict(train)
    train["unet"] = jax.tree_util.tree_map(
        lambda x: jnp.where(jnp.all(x == 0) & (x.ndim >= 2),
                            jnp.full_like(x, 0.01), x), train["unet"])
    # 'fps' mode must read batch['fps']: feeding the fps value through the
    # fs key in 'fs' mode reproduces it exactly
    l_fps = _loss(cfg, train, frozen, batch, "fps")
    swapped = dict(batch, fs=batch["fps"], fps=batch["fs"])
    l_fs_on_fps_value = _loss(cfg, train, frozen, swapped, "fs")
    assert l_fps == l_fs_on_fps_value
    # and the two signals genuinely differ (10 vs 24 -> different fps emb)
    l_fs = _loss(cfg, train, frozen, batch, "fs")
    assert l_fps != l_fs


def test_unknown_fps_condition_type_raises(tiny_setup):
    cfg, params, train, frozen, batch = tiny_setup
    with pytest.raises(ValueError, match="fps_condition_type"):
        _loss(cfg, train, frozen, batch, "frames")


# ---------------------------------------------------------------------------
# batch-size-invariant sampling (per-item keys)
# ---------------------------------------------------------------------------

def test_rngs_helpers_single_key_passthrough():
    k = jax.random.PRNGKey(0)
    a, b = R.split(k)
    ra, rb = jax.random.split(k)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(ra))
    np.testing.assert_array_equal(
        np.asarray(R.normal(k, (3, 4))),
        np.asarray(jax.random.normal(k, (3, 4))))


def test_rngs_batched_matches_per_item():
    keys = R.per_item_keys(jax.random.PRNGKey(0), [0, 1, 2])
    batched = R.normal(keys, (3, 5))
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(batched[i]),
            np.asarray(jax.random.normal(keys[i], (5,))))
    # split unpacks per item
    a, b = R.split(keys)
    for i in range(3):
        ra, rb = jax.random.split(keys[i])
        np.testing.assert_array_equal(np.asarray(a[i]), np.asarray(ra))
        np.testing.assert_array_equal(np.asarray(b[i]), np.asarray(rb))


def test_cli_bs2_matches_bs1_outputs(tmp_path):
    """--bs 2 through the real CLI writes the same videos as --bs 1
    (reference inference.py:323-342 batching, with per-item keys)."""
    import subprocess
    import sys

    import yaml

    from tooncrafter_tpu.utils.video_io import read_video_frames

    cfg = {"model": {"params": {
        "unet_config": {"params": {
            "model_channels": 64, "num_res_blocks": 1,
            "channel_mult": [1, 2], "attention_resolutions": [1, 2],
            "num_head_channels": 32, "context_dim": 64,
            "temporal_length": 4}},
        "first_stage_config": {"params": {"ddconfig": {
            "z_channels": 4, "ch": 32, "ch_mult": [1, 2, 2, 2],
            "num_res_blocks": 1}}},
        "cond_stage_config": {"params": {"width": 64, "heads": 4,
                                         "layers": 2}},
        "img_cond_stage_config": {"params": {"width": 64, "heads": 4,
                                             "layers": 2, "image_size": 28}},
        "image_proj_stage_config": {"params": {"depth": 1, "heads": 4,
                                               "num_queries": 4}},
    }}}
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    outs = {}
    for bs in (1, 2):
        savedir = tmp_path / f"out_bs{bs}"
        r = subprocess.run(
            [sys.executable, "-m", "tooncrafter_tpu.cli.inference",
             "--config", str(cfg_path),
             "--prompt_dir", os.path.join(REPO, "prompts", "512_interp"),
             "--savedir", str(savedir), "--interp",
             "--height", "32", "--width", "32", "--video_length", "4",
             "--ddim_steps", "2", "--seed", "123", "--bs", str(bs)],
            env=env, capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, r.stderr[-3000:]
        outs[bs] = sorted((savedir / "samples_separate").iterdir())
    assert [p.name for p in outs[1]] == [p.name for p in outs[2]]
    assert len(outs[1]) >= 2  # the fixture has >= 2 prompts (odd tail too)
    for p1, p2 in zip(outs[1], outs[2]):
        f1 = read_video_frames(str(p1)).astype(np.int16)
        f2 = read_video_frames(str(p2)).astype(np.int16)
        # identical draws; only compile-order float noise + codec rounding
        assert np.max(np.abs(f1 - f2)) <= 1, p1.name


def test_pipeline_bs2_matches_two_bs1_runs():
    """The --bs contract: a batched run with per-item keys reproduces each
    clip's B=1 output."""
    cfg = ModelConfig().tiny()
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    t = cfg.video_length
    h_px, w_px = cfg.latent_h * 8, cfg.latent_w * 8
    vids = jax.random.uniform(jax.random.PRNGKey(1), (2, t, h_px, w_px, 3),
                              minval=-1, maxval=1)
    tokens = jnp.zeros((2, 77), jnp.int32)
    fs = jnp.full((2,), 10.0)
    pipe = Pipeline(model, ddim_steps=2,
                    guidance=GuidanceConfig(cfg_scale=7.5,
                                            guidance_rescale=0.7))
    keys = R.per_item_keys(jax.random.PRNGKey(9), [0, 1])
    out2 = np.asarray(pipe(params, vids, tokens, tokens, fs, keys),
                      np.float32)
    for i in range(2):
        out1 = np.asarray(
            pipe(params, vids[i:i + 1], tokens[:1], tokens[:1], fs[:1],
                 keys[i:i + 1]), np.float32)
        np.testing.assert_allclose(out2[i], out1[0], atol=2e-5, rtol=2e-5)
