"""Validation step, EMA eval scope, and LR-scheduler wiring
(reference: ddpm3d.py:399-406 validation_step, lvdm/ema.py ema_scope,
ddpm3d.py:1015-1039 configure_schedulers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter
from tooncrafter_tpu.training import trainer as T
from tooncrafter_tpu.training.lr_schedule import from_config


@pytest.fixture(scope="module")
def tiny_state():
    cfg = ModelConfig().tiny()
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    tcfg = T.TrainConfig(learning_rate=1e-4)
    state, opt = T.make_train_state(model, params, tcfg, use_ema=True)
    b, t = 2, cfg.video_length
    batch = {
        "video": jnp.asarray(np.random.RandomState(0).uniform(
            -1, 1, (b, t, cfg.latent_h * 8, cfg.latent_w * 8, 3)),
            jnp.float32),
        "tokens": jnp.zeros((b, 77), jnp.int32),
        "null_tokens": jnp.zeros((b, 77), jnp.int32),
        "fs": jnp.full((b,), 10, jnp.int32),
    }
    return cfg, model, tcfg, state, opt, batch


def test_val_step_with_and_without_ema(tiny_state):
    cfg, model, tcfg, state, opt, batch = tiny_state
    val_fn = jax.jit(T.make_val_step(model, tcfg))
    m = val_fn(state, batch, jax.random.PRNGKey(1))
    assert set(m) == {"val/loss", "val/loss_ema"}
    assert np.isfinite(float(m["val/loss"]))
    # fresh EMA shadow == raw weights -> identical losses
    np.testing.assert_allclose(float(m["val/loss"]),
                               float(m["val/loss_ema"]), rtol=1e-5)
    # after a train step the shadow lags the raw weights -> losses diverge
    step_fn = jax.jit(T.make_train_step(model, opt, tcfg))
    state2, _ = step_fn(state, batch, jax.random.PRNGKey(2))
    m2 = val_fn(state2, batch, jax.random.PRNGKey(1))
    assert float(m2["val/loss"]) != float(m2["val/loss_ema"])


def test_eval_param_tree_uses_ema_shadow(tiny_state):
    cfg, model, tcfg, state, opt, batch = tiny_state
    step_fn = jax.jit(T.make_train_step(model, opt, tcfg))
    state2, _ = step_fn(state, batch, jax.random.PRNGKey(2))
    tree = T.eval_param_tree(state2)
    # the EMA shadow, not the raw post-step weights
    ema_leaf = jax.tree_util.tree_leaves(state2.ema_params)[0]
    raw_leaf = jax.tree_util.tree_leaves(state2.train_params)[0]
    got_leaf = jax.tree_util.tree_leaves(
        {k: tree[k] for k in state2.train_params})[0]
    np.testing.assert_array_equal(np.asarray(got_leaf), np.asarray(ema_leaf))
    assert not np.array_equal(np.asarray(got_leaf), np.asarray(raw_leaf))
    # frozen towers ride along unchanged
    assert set(tree) == set(state2.train_params) | set(state2.frozen_params)
    # and without EMA it falls back to raw weights
    tree_raw = T.eval_param_tree(state2, use_ema=False)
    got_raw = jax.tree_util.tree_leaves(
        {k: tree_raw[k] for k in state2.train_params})[0]
    np.testing.assert_array_equal(np.asarray(got_raw), np.asarray(raw_leaf))


def test_scheduler_yaml_decays_lr():
    """A reference-style scheduler_config block must control the LR."""
    sched_cfg = {
        "target": "utils.lr_scheduler.LambdaLRScheduler",
        "params": {"num_warmup_steps": 100},
    }
    tcfg = T.TrainConfig(learning_rate=1e-4, scheduler=sched_cfg)
    lr = tcfg.lr_schedule()
    assert float(lr(0)) == 0.0
    assert float(lr(50)) == pytest.approx(5e-5)
    assert float(lr(100)) == pytest.approx(1e-4)
    assert float(lr(10_000)) == pytest.approx(1e-4)

    cos = from_config(1e-4, {"target": "x.CosineAnnealingLRScheduler",
                             "params": {"decay_steps": 1000}})
    assert float(cos(0)) == pytest.approx(1e-4)
    assert float(cos(1000)) < float(cos(500)) < float(cos(0))


def test_scheduler_changes_optimizer_updates(tiny_state):
    """The schedule must actually reach optax: step-0 update is zero under
    warmup."""
    cfg, model, tcfg, state, opt, batch = tiny_state
    warm = T.TrainConfig(learning_rate=1e-4, scheduler={
        "target": "utils.lr_scheduler.LambdaLRScheduler",
        "params": {"num_warmup_steps": 10}})
    state_w, opt_w = T.make_train_state(model,
                                        {**state.train_params,
                                         **state.frozen_params},
                                        warm, use_ema=False)
    step_fn = jax.jit(T.make_train_step(model, opt_w, warm))
    state2, _ = step_fn(state_w, batch, jax.random.PRNGKey(3))
    before = jax.tree_util.tree_leaves(state_w.train_params)[0]
    after = jax.tree_util.tree_leaves(state2.train_params)[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))


def test_train_step_with_donation(tiny_state):
    """cli/train.py jits the step with donate_argnums=(0,) (r5: without
    donation the update holds old+new params live and OOMs a full
    single-chip step). The loop's rebind pattern must stay valid: two
    chained steps run, and touching the donated old state raises."""
    cfg, model, tcfg0, _, _, batch = tiny_state
    tcfg = T.TrainConfig(uncond_prob=0.0, rand_cond_frame=False)
    params = model.init_params(jax.random.PRNGKey(0))
    state, opt = T.make_train_state(model, params, tcfg)
    step_fn = jax.jit(T.make_train_step(model, opt, tcfg),
                      donate_argnums=(0,))
    s1, m1 = step_fn(state, batch, jax.random.PRNGKey(0))
    s2, m2 = step_fn(s1, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))
    with pytest.raises(Exception):
        # donated buffers are invalidated — using the old state must fail
        jax.block_until_ready(
            jax.tree_util.tree_leaves(s1.train_params)[0] + 0)
