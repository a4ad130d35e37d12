"""Activation parity vs the reference PyTorch UNet stack.

Each test random-initializes the *reference* torch module
(/root/reference/lvdm/modules/networks/openaimodel3d.py, lvdm/modules/
attention.py), exports its state dict, converts it through the production
checkpoint converter (utils/checkpoint.py), and asserts the flax module
reproduces the torch activations in fp32.
"""

import numpy as np
import pytest

from tests.parity import refutil
from tests.parity.refutil import (assert_close, convert_entries,
                                  convert_tower, state_dict_np)

refutil.setup_reference()

import torch  # noqa: E402

from lvdm.modules.networks import openaimodel3d as ref_unet  # noqa: E402
from lvdm.modules import attention as ref_attn  # noqa: E402

from tooncrafter_tpu.models import unet as jx  # noqa: E402
from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter  # noqa: E402
from tooncrafter_tpu.utils import checkpoint as ck  # noqa: E402

B, T, H, W = 1, 4, 8, 8


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def test_resblock_temporal_conv_parity():
    """ResBlock + TemporalConvBlock (openaimodel3d.py:109-279) with channel
    change (exercises the 1x1 skip_connection transform)."""
    torch.manual_seed(0)
    ref = ref_unet.ResBlock(channels=64, emb_channels=256, dropout=0.0,
                            out_channels=128, use_temporal_conv=True).eval()
    x = _rand(B * T, 64, H, W, seed=1)
    emb = _rand(B * T, 256, seed=2)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), torch.from_numpy(emb), batch_size=B)

    entries = []
    ck._unet_resblock(entries, (), "m")
    params = convert_entries(entries, state_dict_np(ref, "m"))

    mod = jx.UNetResBlock(out_channels=128, dropout=0.0)
    out_j = mod.apply({"params": params},
                      np.transpose(x, (0, 2, 3, 1)), emb, T)
    assert_close(out_j, np.transpose(out_t.numpy(), (0, 2, 3, 1)),
                 tol=1e-4, name="resblock")


def test_spatial_transformer_image_branch_parity():
    """SpatialTransformer with the image cross-attn branch
    (attention.py:249-310, image branch :129-142)."""
    torch.manual_seed(0)
    ch, heads, dim_head, ctx_dim = 64, 2, 32, 48
    ref = ref_attn.SpatialTransformer(
        ch, heads, dim_head, depth=1, context_dim=ctx_dim, use_linear=True,
        use_checkpoint=False, image_cross_attention=True,
        image_cross_attention_scale_learnable=True).eval()
    # make the zero-init parts observable
    with torch.no_grad():
        for blk in ref.transformer_blocks:
            blk.attn2.alpha.uniform_(-0.5, 0.5)
        ref.proj_out.weight.uniform_(-0.05, 0.05)

    x = _rand(B * T, ch, H, W, seed=3)
    ctx = _rand(B * T, 77 + 16, ctx_dim, seed=4)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), context=torch.from_numpy(ctx))

    entries = []
    ck._spatial_transformer(entries, (), "m", depth=1, image_branch=True)
    params = convert_entries(entries, state_dict_np(ref, "m"))

    mod = jx.SpatialTransformer(heads, dim_head, depth=1, image_branch=True,
                                ip_scale_learnable=True)
    out_j = mod.apply({"params": params}, np.transpose(x, (0, 2, 3, 1)), ctx)
    assert_close(out_j, np.transpose(out_t.numpy(), (0, 2, 3, 1)),
                 tol=1e-4, name="spatial_transformer")


def test_temporal_transformer_parity():
    """TemporalTransformer self-attention over T (attention.py:313-412)."""
    torch.manual_seed(0)
    ch, heads, dim_head = 64, 2, 32
    ref = ref_attn.TemporalTransformer(
        ch, heads, dim_head, depth=1, use_linear=True, use_checkpoint=False,
        only_self_att=True, causal_attention=False,
        relative_position=False, temporal_length=T).eval()
    with torch.no_grad():
        ref.proj_out.weight.uniform_(-0.05, 0.05)

    x = _rand(B, ch, T, H, W, seed=5)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))

    entries = []
    ck._temporal_transformer(entries, (), "m", depth=1)
    params = convert_entries(entries, state_dict_np(ref, "m"))

    mod = jx.TemporalTransformer(heads, dim_head, depth=1)
    out_j = mod.apply({"params": params}, np.transpose(x, (0, 2, 3, 4, 1)))
    assert_close(out_j, np.transpose(out_t.numpy(), (0, 2, 3, 4, 1)),
                 tol=1e-4, name="temporal_transformer")


def test_temporal_transformer_relative_position_parity():
    """Relative-position bias variant (attention.py:20-39,104-124)."""
    torch.manual_seed(0)
    ch, heads, dim_head = 64, 2, 32
    ref = ref_attn.TemporalTransformer(
        ch, heads, dim_head, depth=1, use_linear=True, use_checkpoint=False,
        only_self_att=True, causal_attention=False,
        relative_position=True, temporal_length=T).eval()
    with torch.no_grad():
        ref.proj_out.weight.uniform_(-0.05, 0.05)

    x = _rand(B, ch, T, H, W, seed=6)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))

    entries = []
    ck._temporal_transformer(entries, (), "m", depth=1)
    params = convert_entries(entries, state_dict_np(ref, "m"))

    mod = jx.TemporalTransformer(heads, dim_head, depth=1,
                                 relative_position=True)
    out_j = mod.apply({"params": params}, np.transpose(x, (0, 2, 3, 4, 1)))
    assert_close(out_j, np.transpose(out_t.numpy(), (0, 2, 3, 4, 1)),
                 tol=1e-4, name="temporal_transformer_relpos")


@pytest.fixture(scope="module")
def tiny_unet_pair():
    """Reference UNetModel + converted flax params at a shrunk config.

    The reference hard-codes the per-frame context split at 77 + t*16
    (openaimodel3d.py:556), so img tokens/frame stays 16."""
    torch.manual_seed(0)
    cfg = ModelConfig().tiny(resampler_queries=16, video_length=T,
                             latent_h=H, latent_w=W)
    ref = ref_unet.UNetModel(
        in_channels=cfg.unet_in_channels, model_channels=cfg.model_channels,
        out_channels=cfg.unet_out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions),
        dropout=0.0, channel_mult=list(cfg.channel_mult),
        context_dim=cfg.context_dim, use_linear=True, use_checkpoint=False,
        temporal_conv=True, tempspatial_aware=False, temporal_attention=True,
        temporal_selfatt_only=True, use_relative_position=False,
        use_causal_attention=False, temporal_length=T,
        use_fp16=False, addition_attention=True,
        num_head_channels=cfg.num_head_channels,
        transformer_depth=cfg.transformer_depth,
        image_cross_attention=True,
        image_cross_attention_scale_learnable=False,
        default_fs=cfg.default_fs, fs_condition=True).eval()
    # de-zero the zero-init tails so every path is observable
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if p.abs().max() == 0:
                p.uniform_(-0.05, 0.05)

    model = ToonCrafter(cfg)
    sd = state_dict_np(ref, "model.diffusion_model")
    params = convert_tower(sd, cfg, "unet", model=model)
    return ref, model, params, cfg


def test_full_unet_forward_parity(tiny_unet_pair):
    """Full UNet forward (openaimodel3d.py:548-603): hybrid 8-ch input,
    77+T*16 context routing, fps conditioning, init_attn, skip concat."""
    ref, model, params, cfg = tiny_unet_pair
    x = _rand(B, 8, T, H, W, seed=7)
    ctx = _rand(B, 77 + T * 16, cfg.context_dim, seed=8)
    ts = np.array([321.0], np.float32)
    fs = np.array([10.0], np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), torch.from_numpy(ts),
                    context=torch.from_numpy(ctx),
                    fs=torch.from_numpy(fs).long())
    out_j = model.unet.apply({"params": params},
                             np.transpose(x, (0, 2, 3, 4, 1)), ts, ctx, fs)
    assert_close(out_j, np.transpose(out_t.numpy(), (0, 2, 3, 4, 1)),
                 tol=3e-4, name="unet_full")


def test_full_unet_text_only_context_parity(tiny_unet_pair):
    """Context without image tokens takes the broadcast-only path
    (openaimodel3d.py:561-562)."""
    ref, model, params, cfg = tiny_unet_pair
    x = _rand(B, 8, T, H, W, seed=9)
    ctx = _rand(B, 77, cfg.context_dim, seed=10)
    ts = np.array([77.0], np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), torch.from_numpy(ts),
                    context=torch.from_numpy(ctx))
    out_j = model.unet.apply({"params": params},
                             np.transpose(x, (0, 2, 3, 4, 1)), ts, ctx)
    assert_close(out_j, np.transpose(out_t.numpy(), (0, 2, 3, 4, 1)),
                 tol=3e-4, name="unet_text_only")
