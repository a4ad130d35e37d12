"""Multi-step training proof: overfit smoke, EMA tracking over steps,
and MultiSteps gradient accumulation equivalence.

Every other training test runs exactly one optimizer step; nothing
proved the optimizer + EMA + LR schedule + accumulation interact
correctly OVER steps (VERDICT r3 missing #4). The reference's
equivalent evidence is that it actually trains
(/root/reference/main/trainer.py:147-160); here a tiny model overfits
one repeated batch with a fixed diffusion draw.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter
from tooncrafter_tpu.training import trainer as T


@pytest.fixture(scope="module")
def tiny():
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
    return cfg, model, batch


def test_overfit_one_batch(tiny):
    """~40 steps on one repeated batch with a FIXED rng (fixed timestep /
    noise draw -> a deterministic regression target): the loss must fall
    >= 10x, the EMA shadow must track toward the raw weights, and the
    warmup LR schedule must engage (step-0 update is zero, later steps
    move)."""
    cfg, model, batch = tiny
    tcfg = T.TrainConfig(
        learning_rate=2e-3, weight_decay=0.0, uncond_prob=0.0,
        rand_cond_frame=False,
        scheduler={"target": "utils.lr_scheduler.LambdaLRScheduler",
                   "params": {"num_warmup_steps": 2}})
    params = model.init_params(jax.random.PRNGKey(0))
    state, opt = T.make_train_state(model, params, tcfg, use_ema=True)
    step_fn = jax.jit(T.make_train_step(model, opt, tcfg))
    rng = jax.random.PRNGKey(7)  # same draw every step

    losses = []
    for _ in range(40):
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics["loss"]))

    # warmup engaged: with num_warmup_steps=2 the step-0 LR is 0, so the
    # step-0 loss repeats at step 1 (params unchanged by the zero update
    # -- modulo nothing else moving; EMA does not feed back into loss)
    assert losses[1] == pytest.approx(losses[0], rel=1e-5), \
        "warmup step-0 update should be zero"
    assert losses[-1] < losses[0] / 10, \
        f"no overfit: {losses[0]:.4f} -> {losses[-1]:.4f}"
    assert int(state.step) == 40

    # EMA tracks: the shadow moved off its init toward the raw weights
    def dist(a, b):
        sq = jax.tree_util.tree_map(
            lambda x, y: jnp.sum((x.astype(jnp.float32)
                                  - y.astype(jnp.float32)) ** 2), a, b)
        return float(jnp.sqrt(sum(jax.tree_util.tree_leaves(sq))))

    init_train, _ = T.split_trainable(params)
    d_init = dist(state.ema_params, init_train)
    d_raw = dist(state.ema_params, state.train_params)
    assert d_init > 0.0, "EMA never moved"
    assert d_raw < d_init, "EMA should be closer to raw than to init"
    # warmup decay (1+n)/(10+n) keeps the shadow between init and raw
    d_total = dist(init_train, state.train_params)
    assert d_raw < d_total


def test_grad_accum_matches_unaccumulated_step(tiny):
    """optax.MultiSteps wiring: k=2 accumulation fed the same micro-batch
    twice must (a) leave params untouched after the first micro-step and
    (b) land exactly where one step of the non-accumulated optimizer
    lands (the averaged gradient equals the single gradient)."""
    cfg, model, batch = tiny
    params = model.init_params(jax.random.PRNGKey(0))
    base = T.TrainConfig(learning_rate=1e-4, uncond_prob=0.0,
                         rand_cond_frame=False)
    acc = dataclasses.replace(base, grad_accum=2)
    rng = jax.random.PRNGKey(11)

    state_b, opt_b = T.make_train_state(model, params, base)
    step_b = jax.jit(T.make_train_step(model, opt_b, base))
    ref_state, _ = step_b(state_b, batch, rng)

    state_a, opt_a = T.make_train_state(model, params, acc)
    step_a = jax.jit(T.make_train_step(model, opt_a, acc))
    mid, _ = step_a(state_a, batch, rng)
    # first micro-step only accumulates
    leaves0 = jax.tree_util.tree_leaves(state_a.train_params)
    leaves1 = jax.tree_util.tree_leaves(mid.train_params)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves0, leaves1)), \
        "accumulation step must not touch params"
    done, _ = step_a(mid, batch, rng)
    for a, b in zip(jax.tree_util.tree_leaves(done.train_params),
                    jax.tree_util.tree_leaves(ref_state.train_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7)


@pytest.mark.parametrize("policy", [None, "dots", "dots_no_batch"])
def test_remat_policies_grad_identical(tiny, policy):
    """use_checkpoint + any remat_policy must be loss- AND grad-identical
    to the unrematted forward (remat changes memory/recompute only).
    Locks the r5 remat_policy plumbing (models/unet.py `rematted`)."""
    cfg, model, batch = tiny
    rng = jax.random.PRNGKey(11)

    def loss_for(m):
        train, frozen = T.split_trainable(m.init_params(
            jax.random.PRNGKey(0)))

        def f(tp):
            loss, _ = T.diffusion_loss(m, tp, frozen, batch, rng)
            return loss
        return jax.value_and_grad(f)(train)

    base_l, base_g = loss_for(model)
    mr = ToonCrafter(dataclasses.replace(
        cfg, use_checkpoint=True, remat_policy=policy))
    re_l, re_g = loss_for(mr)
    assert float(base_l) == pytest.approx(float(re_l), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(base_g),
                    jax.tree_util.tree_leaves(re_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("optname", ["adamw", "adamw_lowmem", "adafactor"])
def test_optimizer_memory_profiles(optname):
    """TrainConfig.optimizer (r5): 'adamw_lowmem' carries a bf16 first
    moment; 'adafactor' factors the second moment away (single-chip
    profile). Updates must apply and keep params finite."""
    tcfg = T.TrainConfig(optimizer=optname)
    opt = T.make_optimizer(tcfg)
    # w large enough that adafactor's factoring engages
    # (min_dim_size_to_factor=128)
    params = {"w": jnp.ones((256, 256)), "b": jnp.zeros((32,))}
    state = opt.init(params)
    grads = jax.tree_util.tree_map(lambda x: x * 0.01 + 0.01, params)
    updates, state = opt.update(grads, state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    for leaf in jax.tree_util.tree_leaves(new):
        assert np.isfinite(np.asarray(leaf)).all()
    if optname == "adamw_lowmem":
        mus = [x.dtype for x in jax.tree_util.tree_leaves(state)
               if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
        assert mus, "bf16 first moment expected in adamw_lowmem state"
    if optname == "adafactor":
        nbytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree_util.tree_leaves(state)
                     if hasattr(x, "dtype"))
        pbytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree_util.tree_leaves(params))
        assert nbytes < pbytes, "factored state must be below param size"
    with pytest.raises(ValueError):
        T.make_optimizer(T.TrainConfig(optimizer="nope"))
