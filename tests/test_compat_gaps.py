"""Small reference-compatibility behaviors: `uncond_type: zero_embed`
(inference.py:206-210) and partial checkpoint load via ignore_keys /
only_model (ddpm3d.py:204-220)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.models.diffusion import (ModelConfig, Pipeline,
                                              ToonCrafter)
from tooncrafter_tpu.utils import checkpoint as CK


def test_zero_embed_uncond_branch():
    cfg = ModelConfig().tiny(uncond_type="zero_embed")
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = Pipeline(model, ddim_steps=2, use_splice=False)
    tokens = jnp.ones((1, 77), jnp.int32)
    frame0 = jnp.zeros((1, cfg.latent_h * 8, cfg.latent_w * 8, 3))
    ctxs = pipe._conditioning(params, tokens, tokens, frame0)
    # branch 0 is uncond: its text block must be exactly zero, while the
    # cond branch's text block is not
    assert np.abs(np.asarray(ctxs[0][:, :77])).max() == 0.0
    assert np.abs(np.asarray(ctxs[-1][:, :77])).max() > 0.0


def test_empty_seq_uncond_branch_is_not_zero():
    cfg = ModelConfig().tiny()  # default empty_seq
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = Pipeline(model, ddim_steps=2, use_splice=False)
    tokens = jnp.ones((1, 77), jnp.int32)
    frame0 = jnp.zeros((1, cfg.latent_h * 8, cfg.latent_w * 8, 3))
    ctxs = pipe._conditioning(params, tokens, tokens, frame0)
    assert np.abs(np.asarray(ctxs[0][:, :77])).max() > 0.0


def test_load_checkpoint_ignore_keys_and_only_model(tmp_path):
    import torch

    cfg = ModelConfig().tiny()
    model = ToonCrafter(cfg)
    template = model.param_shapes()
    out_conv = CK._get_path(template["unet"], ("out_conv", "kernel"))
    kh, kw, i, o = out_conv.shape
    sd = {
        "model.diffusion_model.out.2.weight":
            torch.zeros((o, i, kh, kw)),
        # deliberately wrong-shaped VAE tensor: must be droppable
        "first_stage_model.encoder.conv_in.weight": torch.zeros((1, 1, 1, 1)),
    }
    p = os.path.join(tmp_path, "ckpt.pt")
    torch.save({"state_dict": sd}, p)

    # unfiltered load trips the shape validator
    with pytest.raises(ValueError, match="shape mismatch"):
        CK.load_checkpoint(p, cfg, template)
    # ignore_keys drops the bad tower
    params, report = CK.load_checkpoint(
        p, cfg, template, ignore_keys=("first_stage_model.",))
    assert params["unet"]["out_conv"]["kernel"].shape == (kh, kw, i, o)
    # only_model keeps just the denoiser weights
    params, report = CK.load_checkpoint(p, cfg, template, only_model=True)
    assert params["unet"]["out_conv"]["kernel"].shape == (kh, kw, i, o)
