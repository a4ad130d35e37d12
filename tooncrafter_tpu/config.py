"""Reference-compatible YAML config loading.

The reference constructs everything through OmegaConf YAML with
`target:`/`params:` reflection (`/root/reference/utils/utils.py:27-42`).
We keep the YAML schema (a user's existing inference/training YAML works
unchanged) but resolve the `lvdm.*` target strings through a registry that
produces a `ModelConfig` for the JAX pipeline instead of instantiating torch
modules.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import yaml

from tooncrafter_tpu.models.diffusion import ModelConfig


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


KNOWN_MODEL_TARGETS = {
    "lvdm.models.ddpm3d.LatentVisualDiffusion",
    "lvdm.models.ddpm3d.LatentDiffusion",
}
KNOWN_UNET_TARGETS = {"lvdm.modules.networks.openaimodel3d.UNetModel"}
KNOWN_VAE_TARGETS = {
    "lvdm.models.autoencoder.AutoencoderKL",
    "lvdm.models.autoencoder.AutoencoderKL_Dualref",
}


@dataclasses.dataclass
class InferenceDefaults:
    """Sampler knobs the YAML/model choice implies (funcs.py:21-26 picks
    uniform_trailing + rescale 0.7 for non-256 models)."""

    ddim_steps: int = 50
    ddim_eta: float = 1.0
    cfg_scale: float = 7.5
    timestep_spacing: str = "uniform_trailing"
    guidance_rescale: float = 0.7
    frame_stride: int = 10


def model_config_from_yaml(path: str) -> ModelConfig:
    cfg = load_yaml(path)
    return model_config_from_dict(cfg)


def model_config_from_dict(cfg: Dict[str, Any]) -> ModelConfig:
    m = cfg.get("model", cfg)
    target = m.get("target", "")
    if target and target not in KNOWN_MODEL_TARGETS:
        raise ValueError(f"unknown model target '{target}'")
    p = m.get("params", {})
    unet = p.get("unet_config", {}).get("params", {})
    if (p.get("unet_config", {}).get("target")
            and p["unet_config"]["target"] not in KNOWN_UNET_TARGETS):
        raise ValueError("unknown unet target")
    vae_cfg = p.get("first_stage_config", {})
    if vae_cfg.get("target") and vae_cfg["target"] not in KNOWN_VAE_TARGETS:
        raise ValueError("unknown first-stage target")
    dd = vae_cfg.get("params", {}).get("ddconfig", {})
    rs = p.get("image_proj_stage_config", {}).get("params", {})
    # extension: the reference hard-codes ViT-H towers; allow shrinking them
    # in YAML for smoke/testing (width/heads/layers keys are ignored by the
    # reference loader, so reference YAMLs stay compatible)
    txt = p.get("cond_stage_config", {}).get("params", {})
    img = p.get("img_cond_stage_config", {}).get("params", {})

    image_size = p.get("image_size", [40, 64])
    if isinstance(image_size, int):
        image_size = [image_size, image_size]

    return ModelConfig(
        timesteps=p.get("timesteps", 1000),
        linear_start=p.get("linear_start", 0.00085),
        linear_end=p.get("linear_end", 0.012),
        rescale_betas_zero_snr=p.get("rescale_betas_zero_snr", True),
        parameterization=p.get("parameterization", "v"),
        scale_factor=p.get("scale_factor", 0.18215),
        uncond_type=p.get("uncond_type", "empty_seq"),
        use_dynamic_rescale=p.get("use_dynamic_rescale", True),
        base_scale=p.get("base_scale", 0.7),
        fps_condition_type=p.get("fps_condition_type", "fs"),
        learn_logvar=p.get("learn_logvar", False),
        logvar_init=p.get("logvar_init", 0.0),
        original_elbo_weight=p.get("original_elbo_weight", 0.0),
        l_simple_weight=p.get("l_simple_weight", 1.0),
        noise_strength=p.get("noise_strength", 0.0),
        perframe_ae=p.get("perframe_ae", False),
        loop_video=p.get("loop_video", False),
        video_length=unet.get("temporal_length", 16),
        latent_h=image_size[0],
        latent_w=image_size[1],
        unet_in_channels=unet.get("in_channels", 8),
        unet_out_channels=unet.get("out_channels", 4),
        model_channels=unet.get("model_channels", 320),
        num_res_blocks=unet.get("num_res_blocks", 2),
        attention_resolutions=tuple(unet.get("attention_resolutions",
                                             (4, 2, 1))),
        channel_mult=tuple(unet.get("channel_mult", (1, 2, 4, 4))),
        num_head_channels=unet.get("num_head_channels", 64),
        transformer_depth=unet.get("transformer_depth", 1),
        context_dim=unet.get("context_dim", 1024),
        fs_condition=unet.get("fs_condition", True),
        default_fs=unet.get("default_fs", 24),
        use_checkpoint=unet.get("use_checkpoint", False),
        remat_policy=unet.get("remat_policy", None),
        image_cross_attention_scale_learnable=unet.get(
            "image_cross_attention_scale_learnable", False),
        use_relative_position=unet.get("use_relative_position", False),
        use_causal_attention=unet.get("use_causal_attention", False),
        vae_ch=dd.get("ch", 128),
        vae_ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        vae_num_res_blocks=dd.get("num_res_blocks", 2),
        z_channels=dd.get("z_channels", 4),
        dualref_time_mode=dd.get("time_mode", "conv-only"),
        resampler_depth=rs.get("depth", 4),
        resampler_heads=rs.get("heads", 12),
        resampler_queries=rs.get("num_queries", 16),
        clip_text_width=txt.get("width", 1024),
        clip_text_heads=txt.get("heads", 16),
        clip_text_layers=txt.get("layers", 24),
        clip_vision_width=img.get("width", 1280),
        clip_vision_heads=img.get("heads", 16),
        clip_vision_layers=img.get("layers", 32),
        clip_image_size=img.get("image_size", 224),
    )
