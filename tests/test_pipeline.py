"""End-to-end pipeline tests on the tiny config + DDIM oracle tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tooncrafter_tpu.models.diffusion import (ModelConfig, ToonCrafter,
                                              middle_frame_splice)
from tooncrafter_tpu.ops import schedule as S
from tooncrafter_tpu.sampling.ddim import GuidanceConfig, ddim_sample


def test_ddim_oracle_recovers_x0():
    """With a denoiser that always implies the same x0, DDIM(eta=0) must
    converge to exactly that x0 — validates the update equations."""
    sched = S.build_schedule(use_dynamic_rescale=False)
    ddim = S.build_ddim_schedule(sched, 10, eta=0.0)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4, 4))

    sa = jnp.asarray(sched.sqrt_alphas_cumprod)
    so = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def oracle(x, ts, ctx, fs):
        t = ts.astype(jnp.int32)
        a = sa[t].reshape(-1, 1, 1, 1, 1)
        s = so[t].reshape(-1, 1, 1, 1, 1)
        eps = (x - a * x0) / jnp.maximum(s, 1e-8)
        return a * eps - s * x0  # the v whose implied x0 is exactly x0

    x_T = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    ctx = jnp.zeros((1, 1, 1, 1))
    out = ddim_sample(oracle, sched, ddim, x_T, ctx,
                      jnp.zeros(x0.shape[:-1] + (0,)), jnp.zeros((1,)),
                      jax.random.PRNGKey(2), GuidanceConfig(cfg_scale=1.0))
    # DDIM's endpoint keeps the t=0 marginal: sqrt(a0)x0 + sqrt(1-a0)eps
    # where eps stays the implied-noise of the trajectory (eps = x_T when
    # ZTSNR makes alpha_bar(999) = 0).
    a0 = sched.alphas_cumprod[0]
    expect = np.sqrt(a0) * np.asarray(x0) + np.sqrt(1 - a0) * np.asarray(x_T)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-3)


def test_ddim_cfg_branches_combine():
    """cfg combination: uc + s*(c - uc); with uc==c any scale is identity."""
    sched = S.build_schedule(use_dynamic_rescale=False)
    ddim = S.build_ddim_schedule(sched, 4, eta=0.0)
    x0 = jnp.ones((1, 2, 4, 4, 4)) * 0.3
    sa = jnp.asarray(sched.sqrt_alphas_cumprod)
    so = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def oracle(x, ts, ctx, fs):
        t = ts.astype(jnp.int32)
        a = sa[t].reshape(-1, 1, 1, 1, 1)
        s = so[t].reshape(-1, 1, 1, 1, 1)
        eps = (x - a * x0[:1].repeat(x.shape[0], 0)) / jnp.maximum(s, 1e-8)
        return a * eps - s * x0[:1].repeat(x.shape[0], 0)

    x_T = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    ctx2 = jnp.zeros((2, 1, 1, 1))
    out = ddim_sample(oracle, sched, ddim, x_T, ctx2,
                      jnp.zeros(x0.shape[:-1] + (0,)), jnp.zeros((1,)),
                      jax.random.PRNGKey(2),
                      GuidanceConfig(cfg_scale=7.5))
    a0 = sched.alphas_cumprod[0]
    expect = np.sqrt(a0) * np.asarray(x0) + np.sqrt(1 - a0) * np.asarray(x_T)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-3)


def test_full_pipeline_tiny():
    cfg = ModelConfig().tiny()
    model = ToonCrafter(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)

    b, t = 1, cfg.video_length
    h_px, w_px = cfg.latent_h * 8, cfg.latent_w * 8
    # interp input: frame A repeated first half, frame B second half
    fa = jax.random.uniform(jax.random.PRNGKey(1), (b, 1, h_px, w_px, 3),
                            minval=-1, maxval=1)
    fb = jax.random.uniform(jax.random.PRNGKey(2), (b, 1, h_px, w_px, 3),
                            minval=-1, maxval=1)
    video = jnp.concatenate([fa.repeat(t // 2, 1), fb.repeat(t // 2, 1)], 1)

    z, refs = model.encode_first_stage(params, video,
                                       rng=jax.random.PRNGKey(3))
    assert z.shape == (b, t, cfg.latent_h, cfg.latent_w, 4)
    assert len(refs) == 5 and all(r.shape[1] == 2 for r in refs)

    concat = model.build_concat_cond(z, "interp")
    np.testing.assert_allclose(np.asarray(concat[:, 1]), 0.0)
    np.testing.assert_allclose(np.asarray(concat[:, 0]), np.asarray(z[:, 0]))

    # conditioning: fake tokens + image context from frame 0
    toks = jnp.zeros((b, 77), jnp.int32)
    text_emb = model.encode_text(params, toks)
    img_emb = model.encode_image_context(params, video[:, 0])
    assert text_emb.shape == (b, 77, cfg.context_dim)
    assert img_emb.shape == (b, t * cfg.resampler_queries, cfg.context_dim)
    cond_ctx = jnp.concatenate([text_emb, img_emb], axis=1)
    uc_ctx = jnp.concatenate([text_emb * 0, img_emb * 0], axis=1)
    contexts = jnp.stack([uc_ctx, cond_ctx])

    x_T = jax.random.normal(jax.random.PRNGKey(4), z.shape)
    samples = model.denoise(
        params, x_T, contexts, concat, jnp.full((b,), 10.0),
        jax.random.PRNGKey(5), GuidanceConfig(cfg_scale=7.5),
        ddim_steps=3)
    assert samples.shape == z.shape
    assert np.isfinite(np.asarray(samples)).all()

    video_out = middle_frame_splice(model, params, samples, refs)
    assert video_out.shape == (b, t, h_px, w_px, 3)
    assert np.isfinite(np.asarray(video_out)).all()


def test_full_pipeline_tiny_1024_aspect():
    """The second shipped resolution's geometry, shrunk: 576x1024 runs at
    72x128 latents (configs/inference_1024_v1.0.yaml:31-39 in the
    reference); this locks the non-square aspect end-to-end at 18x32
    latents (same 9:16 ratio, every level even) through the per-phase
    Pipeline with the 1024 recipe — perframe_ae VAE chunking, 2-branch
    CFG, middle-frame splice — so context-split routing, splice indexing,
    and kernel dispatch integrate at a non-flagship aspect."""
    from tooncrafter_tpu.models.diffusion import Pipeline

    cfg = ModelConfig().tiny(latent_h=18, latent_w=32)
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    b, t = 1, cfg.video_length
    h_px, w_px = cfg.latent_h * 8, cfg.latent_w * 8
    fa = jax.random.uniform(jax.random.PRNGKey(1), (b, 1, h_px, w_px, 3),
                            minval=-1, maxval=1)
    fb = jax.random.uniform(jax.random.PRNGKey(2), (b, 1, h_px, w_px, 3),
                            minval=-1, maxval=1)
    video = jnp.concatenate([fa.repeat(t // 2, 1), fb.repeat(t // 2, 1)], 1)
    tokens = jnp.zeros((b, 77), jnp.int32)

    pipe = Pipeline(model, ddim_steps=2,
                    guidance=GuidanceConfig(cfg_scale=7.5,
                                            guidance_rescale=0.7),
                    perframe_ae=True)
    out = pipe(params, video, tokens, tokens, jnp.full((b,), 10.0),
               jax.random.PRNGKey(3))
    assert out.shape == (b, t, h_px, w_px, 3)
    assert np.isfinite(np.asarray(out)).all()
