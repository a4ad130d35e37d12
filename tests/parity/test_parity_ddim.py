"""End-to-end denoise-loop parity vs the reference DDIM samplers.

Instantiates the *reference* DDPM (lvdm/models/ddpm3d.py:41-463) around the
reference tiny UNet, runs the reference DDIMSampler
(lvdm/models/samplers/ddim.py) / multi-cond sampler (ddim_multiplecond.py),
and asserts our lax.scan sampler (tooncrafter_tpu/sampling/ddim.py) with
converter-round-tripped weights produces the same latents — covering
schedule registration (ZTSNR), v->eps conversion, CFG combine + rescale,
dynamic rescale, the DDIM update, and mask/x0 blending. eta=0 keeps the
loop deterministic on both sides.
"""

import numpy as np
import pytest

from tests.parity import refutil
from tests.parity.refutil import AttrDict, assert_close, convert_tower

refutil.setup_reference()

import torch  # noqa: E402

from lvdm.models import ddpm3d as ref_ddpm  # noqa: E402
from lvdm.models.samplers.ddim import DDIMSampler as RefDDIM  # noqa: E402
from lvdm.models.samplers.ddim_multiplecond import (  # noqa: E402
    DDIMSampler as RefDDIMMulti)

for _cls in (RefDDIM, RefDDIMMulti):
    # the reference sampler pins its schedule buffers to CUDA
    # (ddim.py:18-22); keep them on CPU for this host
    _cls.register_buffer = lambda self, name, attr: setattr(self, name, attr)

from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter  # noqa: E402
from tooncrafter_tpu.ops import schedule as S  # noqa: E402
from tooncrafter_tpu.sampling.ddim import GuidanceConfig, ddim_sample  # noqa: E402

B, T, H, W = 1, 4, 8, 8
CTX_DIM = 64
STEPS = 4


class TinyLDM(ref_ddpm.DDPM):
    """Reference DDPM base + LatentDiffusion's conditioning router
    (ddpm3d.py:735-750) and dynamic-rescale attributes (ddpm3d.py:523-528)."""

    apply_model = ref_ddpm.LatentDiffusion.apply_model

    @property
    def device(self):
        return torch.device("cpu")


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    cfg = ModelConfig().tiny(resampler_queries=16, video_length=T,
                             latent_h=H, latent_w=W)
    unet_params = dict(
        in_channels=8, out_channels=4, model_channels=cfg.model_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions),
        channel_mult=list(cfg.channel_mult), dropout=0.0,
        num_head_channels=cfg.num_head_channels, transformer_depth=1,
        context_dim=CTX_DIM, use_linear=True, use_checkpoint=False,
        temporal_conv=True, temporal_attention=True,
        temporal_selfatt_only=True, use_relative_position=False,
        use_causal_attention=False, temporal_length=T,
        addition_attention=True, image_cross_attention=True,
        default_fs=cfg.default_fs, fs_condition=True)
    m = TinyLDM(
        unet_config=AttrDict(dict(
            target="lvdm.modules.networks.openaimodel3d.UNetModel",
            params=unet_params)),
        timesteps=cfg.timesteps, linear_start=cfg.linear_start,
        linear_end=cfg.linear_end, parameterization="v",
        rescale_betas_zero_snr=True, use_ema=False,
        conditioning_key="hybrid").eval()
    # dynamic-rescale buffers exactly as LatentDiffusion builds them
    # (ddpm3d.py:523-528)
    scale_arr = np.concatenate([
        np.linspace(1.0, cfg.base_scale, cfg.turning_step),
        np.full(cfg.timesteps, cfg.base_scale)])
    m.use_dynamic_rescale = True
    m.register_buffer("scale_arr", torch.tensor(scale_arr,
                                                dtype=torch.float32))
    with torch.no_grad():
        for p in m.model.parameters():
            if p.abs().max() == 0:
                p.uniform_(-0.05, 0.05)

    model = ToonCrafter(cfg)
    sd = {k: v.detach().float().numpy() for k, v in m.state_dict().items()
          if k.startswith("model.diffusion_model.")}
    params = convert_tower(sd, cfg, "unet", model=model)
    return m, model, params, cfg


def test_schedule_buffers_parity(pair):
    """ZTSNR-rescaled betas/alphas and v-param helper buffers
    (ddpm3d.py:124-190, utils_diffusion.py:112-144)."""
    m, model, _, _ = pair
    sch = model.schedule
    np.testing.assert_allclose(sch.betas, m.betas.numpy(), atol=2e-7)
    np.testing.assert_allclose(sch.alphas_cumprod, m.alphas_cumprod.numpy(),
                               atol=2e-7)
    np.testing.assert_allclose(sch.sqrt_one_minus_alphas_cumprod,
                               m.sqrt_one_minus_alphas_cumprod.numpy(),
                               atol=2e-6)
    np.testing.assert_allclose(sch.scale_arr[:m.scale_arr.shape[0]],
                               m.scale_arr.numpy()[:sch.scale_arr.shape[0]],
                               atol=1e-7)


def test_q_sample_and_v_target_parity(pair):
    """Training-side forward process + v-target (ddpm3d.py:712-733,
    get_v/q_sample)."""
    m, model, _, _ = pair
    x0 = _rand(B, 4, T, H, W, seed=50)
    noise = _rand(B, 4, T, H, W, seed=51)
    t = np.array([123], np.int64)
    with torch.no_grad():
        xt_t = m.q_sample(torch.from_numpy(x0), torch.from_numpy(t),
                          noise=torch.from_numpy(noise))
        v_t = m.get_v(torch.from_numpy(x0), torch.from_numpy(noise),
                      torch.from_numpy(t))
    sch = model.schedule
    xt_j = sch.q_sample(np.transpose(x0, (0, 2, 3, 4, 1)), t,
                        np.transpose(noise, (0, 2, 3, 4, 1)))
    v_j = sch.get_v(np.transpose(x0, (0, 2, 3, 4, 1)),
                    np.transpose(noise, (0, 2, 3, 4, 1)), t)
    assert_close(xt_j, np.transpose(xt_t.numpy(), (0, 2, 3, 4, 1)),
                 tol=1e-5, name="q_sample")
    assert_close(v_j, np.transpose(v_t.numpy(), (0, 2, 3, 4, 1)),
                 tol=1e-5, name="get_v")


def test_ddim_schedule_parity(pair):
    """DDIM sub-schedule: uniform_trailing timesteps, alphas, sigmas
    (ddim.py:24-57, utils_diffusion.py:56-91)."""
    m, model, _, _ = pair
    sampler = RefDDIM(m)
    sampler.make_schedule(STEPS, ddim_discretize="uniform_trailing",
                          ddim_eta=1.0, verbose=False)
    dd = S.build_ddim_schedule(model.schedule, STEPS, 1.0,
                               "uniform_trailing")
    np.testing.assert_array_equal(dd.timesteps,
                                  np.asarray(sampler.ddim_timesteps))
    np.testing.assert_allclose(dd.alphas, sampler.ddim_alphas.numpy(),
                               atol=1e-7)
    np.testing.assert_allclose(dd.alphas_prev,
                               np.asarray(sampler.ddim_alphas_prev).ravel(),
                               atol=1e-7)
    np.testing.assert_allclose(dd.sigmas, sampler.ddim_sigmas.numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(dd.scale_arr,
                               sampler.ddim_scale_arr.numpy(), atol=1e-7)


def _run_reference(m, sampler_cls, x_T, ctx_cond, ctx_uc, concat, fs,
                   **extra):
    sampler = sampler_cls(m)
    cond = {"c_crossattn": [torch.from_numpy(ctx_cond)],
            "c_concat": [torch.from_numpy(concat)]}
    uc = {"c_crossattn": [torch.from_numpy(ctx_uc)],
          "c_concat": [torch.from_numpy(concat)]}
    with torch.no_grad():
        samples, _ = sampler.sample(
            S=STEPS, batch_size=B, shape=(4, T, H, W), conditioning=cond,
            unconditional_conditioning=uc, unconditional_guidance_scale=7.5,
            eta=0.0, x_T=torch.from_numpy(x_T),
            timestep_spacing="uniform_trailing", guidance_rescale=0.7,
            verbose=False, schedule_verbose=False,
            fs=torch.from_numpy(fs).long(), **extra)
    return samples.numpy()


def _jax_inputs(x_T, concat):
    x_T_j = np.transpose(x_T, (0, 2, 3, 4, 1))
    concat_j = np.transpose(concat, (0, 2, 3, 4, 1))
    return x_T_j, concat_j


def test_ddim_loop_2branch_parity(pair):
    """Full DDIM loop, 2-branch CFG + guidance rescale + dynamic rescale."""
    m, model, params, cfg = pair
    x_T = _rand(B, 4, T, H, W, seed=20)
    concat = _rand(B, 4, T, H, W, seed=21)
    ctx_cond = _rand(B, 77 + T * 16, CTX_DIM, seed=22)
    ctx_uc = _rand(B, 77 + T * 16, CTX_DIM, seed=23)
    fs = np.array([10], np.int64)

    out_t = _run_reference(m, RefDDIM, x_T, ctx_cond, ctx_uc, concat, fs)

    dd = S.build_ddim_schedule(model.schedule, STEPS, 0.0,
                               "uniform_trailing")
    x_T_j, concat_j = _jax_inputs(x_T, concat)

    def denoiser(x, ts, ctx, fs_):
        return model.unet.apply({"params": params}, x, ts, ctx, fs_)

    import jax
    out_j = ddim_sample(denoiser, model.schedule, dd, x_T_j,
                        np.stack([ctx_uc, ctx_cond]), concat_j,
                        fs.astype(np.float32), jax.random.PRNGKey(0),
                        GuidanceConfig(7.5, None, 0.7))
    assert_close(out_j, np.transpose(out_t, (0, 2, 3, 4, 1)), tol=1e-3,
                 name="ddim_2branch")


def test_ddim_loop_3branch_parity(pair):
    """Multi-cond sampler: 3-pass dual CFG (ddim_multiplecond.py:226-236)."""
    m, model, params, cfg = pair
    x_T = _rand(B, 4, T, H, W, seed=30)
    concat = _rand(B, 4, T, H, W, seed=31)
    ctx_cond = _rand(B, 77 + T * 16, CTX_DIM, seed=32)
    ctx_uc = _rand(B, 77 + T * 16, CTX_DIM, seed=33)
    ctx_uc_img = _rand(B, 77 + T * 16, CTX_DIM, seed=34)
    fs = np.array([10], np.int64)

    uc_img = {"c_crossattn": [torch.from_numpy(ctx_uc_img)],
              "c_concat": [torch.from_numpy(concat)]}
    out_t = _run_reference(
        m, RefDDIMMulti, x_T, ctx_cond, ctx_uc, concat, fs,
        cfg_img=2.5, unconditional_conditioning_img_nonetext=uc_img)

    dd = S.build_ddim_schedule(model.schedule, STEPS, 0.0,
                               "uniform_trailing")
    x_T_j, concat_j = _jax_inputs(x_T, concat)

    def denoiser(x, ts, ctx, fs_):
        return model.unet.apply({"params": params}, x, ts, ctx, fs_)

    import jax
    out_j = ddim_sample(denoiser, model.schedule, dd, x_T_j,
                        np.stack([ctx_uc, ctx_uc_img, ctx_cond]), concat_j,
                        fs.astype(np.float32), jax.random.PRNGKey(0),
                        GuidanceConfig(7.5, 2.5, 0.7))
    assert_close(out_j, np.transpose(out_t, (0, 2, 3, 4, 1)), tol=1e-3,
                 name="ddim_3branch")


def test_ddim_mask_clean_cond_parity(pair):
    """Interpolation-style mask/x0 blending with clean_cond=True
    (ddim.py:173-180)."""
    m, model, params, cfg = pair
    x_T = _rand(B, 4, T, H, W, seed=40)
    concat = _rand(B, 4, T, H, W, seed=41)
    x0 = _rand(B, 4, T, H, W, seed=42)
    ctx_cond = _rand(B, 77 + T * 16, CTX_DIM, seed=43)
    ctx_uc = _rand(B, 77 + T * 16, CTX_DIM, seed=44)
    fs = np.array([10], np.int64)
    mask = np.zeros((B, 1, T, 1, 1), np.float32)
    mask[:, :, 0] = 1.0
    mask[:, :, -1] = 1.0

    out_t = _run_reference(
        m, RefDDIM, x_T, ctx_cond, ctx_uc, concat, fs,
        mask=torch.from_numpy(mask), x0=torch.from_numpy(x0),
        clean_cond=True)

    dd = S.build_ddim_schedule(model.schedule, STEPS, 0.0,
                               "uniform_trailing")
    x_T_j, concat_j = _jax_inputs(x_T, concat)

    def denoiser(x, ts, ctx, fs_):
        return model.unet.apply({"params": params}, x, ts, ctx, fs_)

    import jax
    out_j = ddim_sample(denoiser, model.schedule, dd, x_T_j,
                        np.stack([ctx_uc, ctx_cond]), concat_j,
                        fs.astype(np.float32), jax.random.PRNGKey(0),
                        GuidanceConfig(7.5, None, 0.7),
                        mask=np.transpose(mask, (0, 2, 3, 4, 1)),
                        x0=np.transpose(x0, (0, 2, 3, 4, 1)),
                        clean_cond=True)
    assert_close(out_j, np.transpose(out_t, (0, 2, 3, 4, 1)), tol=1e-3,
                 name="ddim_mask")
