"""Activation parity vs the reference Resampler (Perceiver image projector,
lvdm/modules/encoders/resampler.py:48-145)."""

import numpy as np

from tests.parity import refutil
from tests.parity.refutil import assert_close, convert_tower, state_dict_np

refutil.setup_reference()

import torch  # noqa: E402

from lvdm.modules.encoders import resampler as ref_rs  # noqa: E402

from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter  # noqa: E402


def test_resampler_parity():
    torch.manual_seed(0)
    cfg = ModelConfig().tiny(video_length=4, resampler_depth=2,
                             resampler_heads=4, resampler_queries=4,
                             clip_vision_width=96, context_dim=64)
    ref = ref_rs.Resampler(
        dim=cfg.context_dim, depth=cfg.resampler_depth, dim_head=64,
        heads=cfg.resampler_heads, num_queries=cfg.resampler_queries,
        embedding_dim=cfg.clip_vision_width, output_dim=cfg.context_dim,
        ff_mult=4, video_length=cfg.video_length).eval()

    model = ToonCrafter(cfg)
    sd = state_dict_np(ref, "image_proj_model")
    params = convert_tower(sd, cfg, "image_proj", model=model)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 9, cfg.clip_vision_width).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))
    out_j = model.image_proj.apply({"params": params}, x)
    assert_close(out_j, out_t.numpy(), tol=1e-4, name="resampler")
