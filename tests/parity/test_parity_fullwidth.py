"""Full-width block parity (VERDICT r1 item 7).

The tiny-config parity suite runs blocks at 32-64 channels (1-2 channels
per GroupNorm group), which cannot expose group-count/eps effects at the
shipped widths. These cases run ONE block of each family at the real
channel counts — UNet 320/640/1280 (openaimodel3d.py:109-279,
attention.py:249-412) and dual-ref decoder 512
(autoencoder_dualref.py:846-911) — against the reference torch modules via
the production converter. Spatial extent stays tiny; width is the thing
under test.
"""

import numpy as np
import pytest

from tests.parity import refutil
from tests.parity.refutil import assert_close, convert_entries, state_dict_np

refutil.setup_reference()

import torch  # noqa: E402

from lvdm.modules.networks import openaimodel3d as ref_unet  # noqa: E402
from lvdm.modules import attention as ref_attn  # noqa: E402
from lvdm.models import autoencoder_dualref as ref_dual  # noqa: E402

from tooncrafter_tpu.models import unet as jx  # noqa: E402
from tooncrafter_tpu.models import vae_dualref as jdual  # noqa: E402
from tooncrafter_tpu.utils import checkpoint as ck  # noqa: E402

B, T, H, W = 1, 4, 4, 4


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(*shape) * 0.5).astype(np.float32)


@pytest.mark.parametrize("ch,out_ch", [(320, 320), (640, 1280), (1280, 1280)])
def test_resblock_temporal_conv_fullwidth(ch, out_ch):
    """ResBlock+TemporalConvBlock at real widths — 32 GN groups see
    10/20/40 channels each instead of the tiny suite's 1-2."""
    torch.manual_seed(ch)
    ref = ref_unet.ResBlock(channels=ch, emb_channels=1280, dropout=0.0,
                            out_channels=out_ch,
                            use_temporal_conv=True).eval()
    refutil_dezero(ref)
    x = _rand(B * T, ch, H, W, seed=1)
    emb = _rand(B * T, 1280, seed=2)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), torch.from_numpy(emb), batch_size=B)

    entries = []
    ck._unet_resblock(entries, (), "m")
    params = convert_entries(entries, state_dict_np(ref, "m"))
    mod = jx.UNetResBlock(out_channels=out_ch, dropout=0.0)
    out_j = mod.apply({"params": params},
                      np.transpose(x, (0, 2, 3, 1)), emb, T)
    assert_close(out_j, np.transpose(out_t.numpy(), (0, 2, 3, 1)),
                 tol=2e-4, name=f"resblock{ch}->{out_ch}")


@pytest.mark.parametrize("ch", [640, 1280])
def test_spatial_transformer_fullwidth(ch):
    """SpatialTransformer with image branch at real width (heads = ch/64,
    context 1024 — the shipped num_head_channels/context_dim)."""
    torch.manual_seed(ch)
    heads, dim_head, ctx_dim = ch // 64, 64, 1024
    ref = ref_attn.SpatialTransformer(
        ch, heads, dim_head, depth=1, context_dim=ctx_dim, use_linear=True,
        use_checkpoint=False, image_cross_attention=True,
        image_cross_attention_scale_learnable=True).eval()
    with torch.no_grad():
        for blk in ref.transformer_blocks:
            blk.attn2.alpha.uniform_(-0.5, 0.5)
        ref.proj_out.weight.uniform_(-0.02, 0.02)

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
                 tol=2e-4, name=f"spatial_transformer{ch}")


def test_temporal_transformer_fullwidth():
    """TemporalTransformer at 1280 (the ds=4/8 UNet levels)."""
    torch.manual_seed(7)
    ch, heads, dim_head = 1280, 20, 64
    ref = ref_attn.TemporalTransformer(
        ch, heads, dim_head, depth=1, use_linear=True, use_checkpoint=False,
        only_self_att=True, causal_attention=False,
        relative_position=False, temporal_length=T).eval()
    with torch.no_grad():
        ref.proj_out.weight.uniform_(-0.02, 0.02)

    x = _rand(B, ch, T, H, W, seed=5)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))

    entries = []
    ck._temporal_transformer(entries, (), "m", depth=1)
    params = convert_entries(entries, state_dict_np(ref, "m"))
    mod = jx.TemporalTransformer(heads, dim_head, depth=1)
    out_j = mod.apply({"params": params}, np.transpose(x, (0, 2, 3, 4, 1)))
    assert_close(out_j, np.transpose(out_t.numpy(), (0, 2, 3, 4, 1)),
                 tol=2e-4, name="temporal_transformer1280")


def test_video_resblock_fullwidth():
    """Dual-ref decoder VideoResBlock at 512 channels (the mid/deep decoder
    width; autoencoder_dualref.py:846-911): spatial ResnetBlock + SVD
    temporal stack + learned sigmoid alpha merge."""
    torch.manual_seed(9)
    ch = 512
    ref = ref_dual.VideoResBlock(
        out_channels=ch, in_channels=ch, temb_channels=0, dropout=0.0,
        video_kernel_size=[3, 1, 1], alpha=0.0,
        merge_strategy="learned").eval()
    refutil_dezero(ref)
    x = _rand(B * T, ch, H, W, seed=10)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), temb=None, timesteps=T)

    entries = []
    ck._video_resblock(entries, (), "m")
    params = convert_entries(entries, state_dict_np(ref, "m"))
    mod = jdual.VideoResBlock(out_channels=ch, dropout=0.0)
    x_j = np.transpose(x.reshape(B, T, ch, H, W), (0, 1, 3, 4, 2))
    out_j = mod.apply({"params": params}, x_j)
    want = np.transpose(out_t.numpy().reshape(B, T, ch, H, W),
                        (0, 1, 3, 4, 2))
    assert_close(out_j, want, tol=2e-4, name="video_resblock512")


def test_whole_unet_fullwidth():
    """Whole-model UNet forward at SHIPPED widths (model_channels 320,
    channel_mult 1/2/4/4, 2 res blocks, heads=C/64, context 1024 —
    inference_512_v1.0.yaml) with tiny spatial extent (8x8 latents, T=4).

    Closes the converter/topology blind spot between the per-block
    full-width cases above and the full-model tiny-width forward
    (test_parity_unet.py) — VERDICT r2 weak #3 / next #6. ~1.1B params;
    spatial extent keeps the FLOPs CI-sized."""
    from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter
    from tests.parity.refutil import convert_tower

    t, lh, lw = 4, 8, 8
    torch.manual_seed(0)
    cfg = ModelConfig(video_length=t, latent_h=lh, latent_w=lw)
    ref = ref_unet.UNetModel(
        in_channels=cfg.unet_in_channels, model_channels=cfg.model_channels,
        out_channels=cfg.unet_out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions),
        dropout=0.0, channel_mult=list(cfg.channel_mult),
        context_dim=cfg.context_dim, use_linear=True, use_checkpoint=False,
        temporal_conv=True, tempspatial_aware=False, temporal_attention=True,
        temporal_selfatt_only=True, use_relative_position=False,
        use_causal_attention=False, temporal_length=t,
        use_fp16=False, addition_attention=True,
        num_head_channels=cfg.num_head_channels,
        transformer_depth=cfg.transformer_depth,
        image_cross_attention=True,
        image_cross_attention_scale_learnable=False,
        default_fs=cfg.default_fs, fs_condition=True).eval()
    with torch.no_grad():  # de-zero the zero-init tails
        for name, p in ref.named_parameters():
            if p.numel() and p.abs().max() == 0:
                p.uniform_(-0.02, 0.02)

    x = _rand(1, 8, t, lh, lw, seed=21) * 0.5
    ctx = _rand(1, 77 + t * 16, cfg.context_dim, seed=22) * 0.5
    ts = np.array([321.0], np.float32)
    fs = np.array([10.0], np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), torch.from_numpy(ts),
                    context=torch.from_numpy(ctx),
                    fs=torch.from_numpy(fs).long())

    model = ToonCrafter(cfg)
    sd = state_dict_np(ref, "model.diffusion_model")
    del ref
    params = convert_tower(sd, cfg, "unet", model=model)
    del sd
    out_j = model.unet.apply({"params": params},
                             np.transpose(x, (0, 2, 3, 4, 1)), ts, ctx, fs)
    assert_close(out_j, np.transpose(out_t.numpy(), (0, 2, 3, 4, 1)),
                 tol=3e-4, name="unet_whole_fullwidth")


def refutil_dezero(module):
    """Fill zero-init tensors so residual branches are observable."""
    with torch.no_grad():
        for p in module.parameters():
            if p.numel() and p.abs().max() == 0:
                p.uniform_(-0.02, 0.02)
