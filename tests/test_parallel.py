"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter
from tooncrafter_tpu.parallel import mesh as M
from tooncrafter_tpu.training import trainer as T


def test_mesh_shapes():
    m = M.make_mesh()
    assert m.shape["data"] * m.shape["model"] == len(jax.devices())
    m2 = M.make_mesh(n_data=4, n_model=2)
    assert m2.shape == {"data": 4, "model": 2}


def test_param_partition_rules():
    m = M.make_mesh(n_data=4, n_model=2)
    spec = M.param_partition_spec(("attn1", "to_q", "kernel"),
                                  jnp.zeros((512, 512)), m)
    assert spec == P(None, "model")
    # small params replicate
    spec = M.param_partition_spec(("norm", "weight"), jnp.zeros((64,)), m)
    assert spec == P()
    # big non-kernel params ZeRO-shard over data when divisible
    spec = M.param_partition_spec(("token_embedding", "embedding"),
                                  jnp.zeros((49408, 1024)), m)
    assert "data" in str(spec)


def test_sharded_train_step_runs():
    """One real optimizer step of the tiny model, batch sharded over 8 CPUs
    in a (4 data, 2 model) mesh."""
    cfg = ModelConfig().tiny()
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    tcfg = T.TrainConfig(learning_rate=1e-4)
    state, opt = T.make_train_state(model, params, tcfg, use_ema=True)
    step = T.make_train_step(model, opt, tcfg)

    m = M.make_mesh(n_data=4, n_model=2)
    b, t = 4, cfg.video_length
    h_px, w_px = cfg.latent_h * 8, cfg.latent_w * 8
    batch = {
        "video": jax.random.uniform(jax.random.PRNGKey(1),
                                    (b, t, h_px, w_px, 3), minval=-1,
                                    maxval=1),
        "tokens": jnp.zeros((b, 77), jnp.int32),
        "null_tokens": jnp.zeros((b, 77), jnp.int32),
        "fs": jnp.full((b,), 10, jnp.int32),
    }
    batch = jax.device_put(batch, M.batch_sharding(m))
    jstep = jax.jit(step)
    state2, metrics = jstep(state, batch, jax.random.PRNGKey(2))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params actually changed somewhere (zero-init leaves can stay zero)
    diff = jax.tree_util.tree_map(lambda a, b: jnp.abs(a - b).max(),
                                  state.train_params, state2.train_params)
    total = max(float(x) for x in jax.tree_util.tree_leaves(diff))
    assert total > 0.0
    # second step reuses the compiled graph
    state3, _ = jstep(state2, batch, jax.random.PRNGKey(3))
    assert int(state3.step) == 2


def test_sharded_train_step_logvar_vlb():
    """learn_logvar + original_elbo_weight on the 8-device mesh: the
    (1000,) logvar buffer is a trainable param that crosses the ZeRO
    partition rule — it must replicate/shard cleanly AND receive updates
    under the sharded step (VERDICT r3 next-step #8; reference
    ddpm3d.py:775-794,1208-1240)."""
    cfg = ModelConfig().tiny(learn_logvar=True, original_elbo_weight=1e-2,
                             logvar_init=0.0)
    model = ToonCrafter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    tcfg = T.TrainConfig(learning_rate=1e-3)
    state, opt = T.make_train_state(model, params, tcfg, use_ema=False)
    assert "logvar" in state.train_params, "logvar must be trainable"

    m = M.make_mesh(n_data=4, n_model=2)
    b, t = 4, cfg.video_length
    h_px, w_px = cfg.latent_h * 8, cfg.latent_w * 8
    batch = {
        "video": jax.random.uniform(jax.random.PRNGKey(1),
                                    (b, t, h_px, w_px, 3), minval=-1,
                                    maxval=1),
        "tokens": jnp.zeros((b, 77), jnp.int32),
        "null_tokens": jnp.zeros((b, 77), jnp.int32),
        "fs": jnp.full((b,), 10, jnp.int32),
    }
    batch = jax.device_put(batch, M.batch_sharding(m))
    step = jax.jit(T.make_train_step(model, opt, tcfg))
    state2, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_vlb"]))
    assert np.isfinite(float(metrics["loss_gamma"]))
    lv0 = np.asarray(state.train_params["logvar"]["logvar"])
    lv1 = np.asarray(state2.train_params["logvar"]["logvar"])
    assert lv1.shape == (cfg.timesteps,)
    # only the drawn timesteps receive gradient; at b=4 at most 4 rows move
    moved = np.flatnonzero(lv0 != lv1)
    assert 1 <= moved.size <= b, f"logvar rows moved: {moved.size}"
    # a second step executes the same compiled graph (sharding stable)
    state3, _ = step(state2, batch, jax.random.PRNGKey(3))
    assert int(state3.step) == 2


def test_ema_warmup_decay():
    ema = {"w": jnp.zeros((2,))}
    new = {"w": jnp.ones((2,))}
    out = T.ema_update(ema, new, step=jnp.asarray(0), decay=0.9999)
    # step 0: d = 1/10 -> ema = 0.9 * new
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9, atol=1e-6)
