"""Batched multi-chip serving over the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from tooncrafter_tpu.models.diffusion import (ModelConfig, Pipeline,
                                              ToonCrafter)
from tooncrafter_tpu.parallel import mesh as M
from tooncrafter_tpu.parallel.serving import BatchedPipeline
from tooncrafter_tpu.sampling.ddim import GuidanceConfig


def test_batched_serving_shards_clips():
    cfg = ModelConfig().tiny()
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = Pipeline(model, ddim_steps=2,
                    guidance=GuidanceConfig(cfg_scale=7.5),
                    use_splice=False)
    mesh = M.make_mesh(n_data=4, n_model=2)
    srv = BatchedPipeline(pipe, mesh)
    params = srv.place_params(params)

    b, t = 4, cfg.video_length
    h_px, w_px = cfg.latent_h * 8, cfg.latent_w * 8
    videos = jax.random.uniform(jax.random.PRNGKey(1),
                                (b, t, h_px, w_px, 3), minval=-1, maxval=1)
    tokens = jnp.zeros((b, 77), jnp.int32)
    out = srv(params, videos, tokens, tokens, jnp.full((b,), 10.0),
              jax.random.PRNGKey(2))
    assert out.shape == (b, t, h_px, w_px, 3)
    assert np.isfinite(np.asarray(out)).all()
    # output batch sharding follows the inputs
    spec = out.sharding.spec if hasattr(out.sharding, "spec") else None
    assert spec is None or spec[0] in ("data", None)
