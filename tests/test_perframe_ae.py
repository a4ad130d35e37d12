"""Chunked VAE paths (`perframe_ae` semantics, ddpm3d.py:630-679)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.models.diffusion import (ModelConfig, Pipeline,
                                              ToonCrafter)


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig().tiny(video_length=8)
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params


def test_perframe_encode_matches_full(tiny):
    """The encoder is per-frame, so chunked encode is numerically
    identical (reference encodes one frame at a time, ddpm3d.py:634-640)."""
    cfg, model, params = tiny
    video = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (1, 8, cfg.latent_h * 8, cfg.latent_w * 8, 3)), jnp.float32)
    z_full, taps_full = model.encode_first_stage(params, video)
    z_chunk, taps_chunk = model.encode_first_stage(params, video,
                                                   chunk_size=1)
    np.testing.assert_allclose(np.asarray(z_chunk), np.asarray(z_full),
                               atol=1e-5)
    for a, b in zip(taps_chunk, taps_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_chunked_decode_contract(tiny):
    """T > chunk decodes as independent chunk_size-frame videos reusing the
    same first/last refs (ddpm3d.py:660-675), concatenated along T."""
    cfg, model, params = tiny
    t, chunk = 8, 4
    z = jnp.asarray(np.random.RandomState(1).randn(
        1, t, cfg.latent_h, cfg.latent_w, cfg.z_channels), jnp.float32)
    taps = model._tap_shapes(cfg.latent_h * 8, cfg.latent_w * 8)
    refs = [jnp.asarray(np.random.RandomState(10 + i).randn(1, 2, h, w, c),
                        jnp.float32) for i, (h, w, c) in enumerate(taps)]

    out = model.decode_first_stage(params, z, refs, chunk_size=chunk)
    assert out.shape == (1, t, cfg.latent_h * 8, cfg.latent_w * 8, 3)
    # chunk 0 decoded alone must equal the first half of the chunked decode
    first = model.decode_first_stage(params, z[:, :chunk], refs)
    np.testing.assert_allclose(np.asarray(out[:, :chunk]), np.asarray(first),
                               atol=1e-5)
    # chunk_size >= T is exactly the unchunked decode
    full = model.decode_first_stage(params, z, refs)
    same = model.decode_first_stage(params, z, refs, chunk_size=t)
    np.testing.assert_allclose(np.asarray(same), np.asarray(full), atol=0)
    # chunked decode genuinely changes execution for T > chunk (temporal
    # convs/mixing see different neighborhoods across the split)
    assert not np.allclose(np.asarray(out), np.asarray(full), atol=1e-5)


def test_pipeline_perframe_flag_runs(tiny):
    cfg, model, params = tiny
    pipe = Pipeline(model, ddim_steps=2, use_splice=False, perframe_ae=True)
    assert pipe._enc_chunk == 1 and pipe._dec_chunk == cfg.video_length
    video = jnp.asarray(np.random.RandomState(2).uniform(
        -1, 1, (1, 8, cfg.latent_h * 8, cfg.latent_w * 8, 3)), jnp.float32)
    tokens = jnp.zeros((1, 77), jnp.int32)
    out = pipe(params, video, tokens, tokens,
               jnp.full((1,), 10.0), jax.random.PRNGKey(3))
    assert out.shape == video.shape
    assert np.isfinite(np.asarray(out)).all()
