"""logvar / VLB / offset-noise loss knobs (ddpm3d.py:62-71,753-794).

VERDICT r2 missing #3: the reference weights the simple loss by a
per-timestep logvar and adds `original_elbo_weight * loss_vlb`; inert at
shipped values but the knobs must be honored, not silently ignored.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.config import model_config_from_dict
from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter
from tooncrafter_tpu.training import trainer as T


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = ModelConfig().tiny()
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    b, t = 2, cfg.video_length
    batch = {
        "video": jnp.asarray(np.random.RandomState(0).uniform(
            -1, 1, (b, t, cfg.latent_h * 8, cfg.latent_w * 8, 3)),
            jnp.float32),
        "tokens": jnp.zeros((b, 77), jnp.int32),
        "null_tokens": jnp.zeros((b, 77), jnp.int32),
        "fs": jnp.full((b,), 10, jnp.int32),
    }
    return cfg, params, batch


def _loss(cfg, params, batch, rng=None):
    model = ToonCrafter(cfg)
    train, frozen = T.split_trainable(params)
    rng = jax.random.PRNGKey(7) if rng is None else rng
    loss, metrics = T.diffusion_loss(model, train, frozen, batch, rng)
    return float(loss), {k: float(v) for k, v in metrics.items()}


def test_default_knobs_reduce_to_simple_loss(tiny_setup):
    cfg, params, batch = tiny_setup
    loss, m = _loss(cfg, params, batch)
    np.testing.assert_allclose(loss, m["loss_simple"], rtol=1e-6)
    # v-parameterization: lvlb_weights are all ones (ddpm3d.py:179-181),
    # so loss_vlb == loss_simple
    np.testing.assert_allclose(m["loss_vlb"], m["loss_simple"], rtol=1e-6)


def test_logvar_init_weights_the_loss(tiny_setup):
    cfg, params, batch = tiny_setup
    _, m0 = _loss(cfg, params, batch)
    cfg2 = dataclasses.replace(cfg, logvar_init=1.0)
    loss2, m2 = _loss(cfg2, params, batch)
    # same rng -> same loss_simple; loss = ls/e^1 + 1
    np.testing.assert_allclose(m2["loss_simple"], m0["loss_simple"],
                               rtol=1e-6)
    np.testing.assert_allclose(loss2, m0["loss_simple"] / np.e + 1.0,
                               rtol=1e-5)


def test_elbo_weight_adds_vlb_term(tiny_setup):
    cfg, params, batch = tiny_setup
    loss0, m0 = _loss(cfg, params, batch)
    cfg2 = dataclasses.replace(cfg, original_elbo_weight=0.5)
    loss2, m2 = _loss(cfg2, params, batch)
    np.testing.assert_allclose(loss2, loss0 + 0.5 * m0["loss_vlb"],
                               rtol=1e-5)
    cfg3 = dataclasses.replace(cfg, l_simple_weight=2.0)
    loss3, _ = _loss(cfg3, params, batch)
    np.testing.assert_allclose(loss3, 2.0 * loss0, rtol=1e-5)


def test_learn_logvar_trains_the_parameter(tiny_setup):
    cfg, params, batch = tiny_setup
    cfg2 = dataclasses.replace(cfg, learn_logvar=True)
    model = ToonCrafter(cfg2)
    tcfg = T.TrainConfig(learning_rate=1e-2)
    state, opt = T.make_train_state(model, params, tcfg, use_ema=False)
    assert "logvar" in state.train_params
    lv0 = np.asarray(state.train_params["logvar"]["logvar"])
    assert lv0.shape == (model.schedule.num_timesteps,)
    step_fn = jax.jit(T.make_train_step(model, opt, tcfg))
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    assert "logvar" in metrics and "loss_gamma" in metrics
    lv1 = np.asarray(state2.train_params["logvar"]["logvar"])
    assert not np.array_equal(lv0, lv1), "logvar must receive gradients"


def test_offset_noise_changes_loss(tiny_setup):
    cfg, params, batch = tiny_setup
    loss0, _ = _loss(cfg, params, batch)
    cfg2 = dataclasses.replace(cfg, noise_strength=0.5)
    loss2, _ = _loss(cfg2, params, batch)
    assert loss0 != loss2


def test_yaml_keys_are_parsed():
    cfg = model_config_from_dict({
        "model": {"params": {
            "learn_logvar": True, "logvar_init": 0.3,
            "original_elbo_weight": 0.1, "l_simple_weight": 0.9,
            "noise_strength": 0.2,
        }}})
    assert cfg.learn_logvar and cfg.logvar_init == 0.3
    assert cfg.original_elbo_weight == 0.1
    assert cfg.l_simple_weight == 0.9 and cfg.noise_strength == 0.2
