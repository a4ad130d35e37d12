"""Determinism: explicit key threading must make the full pipeline
reproducible (the reference relies on seed_everything; SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from tooncrafter_tpu.models.diffusion import (ModelConfig, Pipeline,
                                              ToonCrafter)
from tooncrafter_tpu.sampling.ddim import GuidanceConfig


def test_pipeline_is_deterministic_given_keys():
    cfg = ModelConfig().tiny()
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = Pipeline(model, ddim_steps=2,
                    guidance=GuidanceConfig(cfg_scale=7.5),
                    use_splice=False)
    t = cfg.video_length
    video = jax.random.uniform(
        jax.random.PRNGKey(1),
        (1, t, cfg.latent_h * 8, cfg.latent_w * 8, 3), minval=-1, maxval=1)
    tokens = jnp.zeros((1, 77), jnp.int32)
    fs = jnp.full((1,), 10.0)

    a = pipe(params, video, tokens, tokens, fs, jax.random.PRNGKey(42))
    b = pipe(params, video, tokens, tokens, fs, jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    c = pipe(params, video, tokens, tokens, fs, jax.random.PRNGKey(43))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_loader_propagates_dataset_errors():
    from tooncrafter_tpu.data.webvid import PrefetchLoader

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("decode exploded")

    loader = PrefetchLoader(Broken(), batch_size=2, num_workers=1)
    import pytest

    with pytest.raises(RuntimeError, match="decode exploded"):
        list(loader)
