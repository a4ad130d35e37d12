"""Training step: v-prediction diffusion loss with 3-way CFG dropout.

Rebuilds the training semantics of LatentVisualDiffusion
(/root/reference/lvdm/models/ddpm3d.py):

  * get_batch_input (:1070-1134): VAE-encode the clip, build hybrid cond
    with the cond-frame latent repeated T times (training uses single-frame
    repeat, NOT the interp zeros-fill), CLIP text+image context with the
    3-way classifier-free dropout — 5% text-only, 5% image-only, 5% both
    (uncond_prob=0.05 per branch window, :1085-1094).
  * forward/p_losses (:723-796): t ~ U[0, 1000), dynamic-rescale x0,
    q_sample, v-target MSE averaged over (t,h,w,c) then batch.
  * optimizer: AdamW over UNet + image projector only (configure_optimizers
    :1208-1240); first-stage VAE and CLIP towers stay frozen.
  * EMA shadow with warmup decay min(decay, (1+n)/(10+n)) (lvdm/ema.py).

TPU: the whole step jits; batch is sharded over the mesh 'data' axis and
the psum over gradients compiles to an ICI all-reduce.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tooncrafter_tpu.models.diffusion import ToonCrafter


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 1e-2
    uncond_prob: float = 0.05
    ema_decay: float = 0.9999
    grad_clip: float = 0.0
    scale_lr_by_batch: bool = False  # reference: lr = ngpu*bs*base_lr
    rand_cond_frame: bool = True
    grad_accum: int = 1
    # optimizer memory profile (r5): 'adamw' matches the reference's
    # configure_optimizers (ddpm3d.py) — fp32 mu+nu, 12 GB of state for
    # the 1.49B trainables, needs ZeRO sharding over the 'data' mesh on
    # 16 GB chips. 'adamw_lowmem' keeps the AdamW rule with a bf16
    # first moment (state 9 GB; nu stays fp32 — bf16 nu stalls the
    # 1e-3-scale beta2 accumulation). 'adafactor' factors the second
    # moment away (state ~0 beyond params; the single-chip option,
    # different update rule).
    optimizer: str = "adamw"
    # reference scheduler YAML block (ddpm3d.py:1015-1039); resolved through
    # training/lr_schedule.from_config. None -> constant learning_rate.
    scheduler: Optional[dict] = None

    def lr_schedule(self) -> optax.Schedule:
        from tooncrafter_tpu.training.lr_schedule import from_config

        if self.scheduler is None:
            return optax.constant_schedule(self.learning_rate)
        return from_config(self.learning_rate, self.scheduler)


TRAINABLE = ("unet", "image_proj")


def split_trainable(params):
    train = {k: params[k] for k in TRAINABLE if k in params}
    frozen = {k: v for k, v in params.items() if k not in TRAINABLE}
    return train, frozen


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    sched = cfg.lr_schedule()
    if cfg.optimizer == "adamw":
        tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "adamw_lowmem":
        tx = optax.adamw(sched, weight_decay=cfg.weight_decay,
                         mu_dtype=jnp.bfloat16)
    elif cfg.optimizer == "adafactor":
        tx = optax.adafactor(
            sched, weight_decay_rate=(cfg.weight_decay or None),
            momentum=None)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    parts = []
    if cfg.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    parts.append(tx)
    opt = optax.chain(*parts)
    if cfg.grad_accum > 1:
        opt = optax.MultiSteps(opt, cfg.grad_accum)
    return opt


def ema_update(ema_params, new_params, step, decay: float = 0.9999):
    """Classic shadow EMA with (1+n)/(10+n) warmup (lvdm/ema.py:28-44)."""
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
        ema_params, new_params)


def diffusion_loss(model: ToonCrafter, train_params, frozen_params, batch,
                   rng, uncond_prob: float = 0.05,
                   rand_cond_frame: bool = True, train: bool = True):
    """batch: {'video': (B,T,H,W,3) in [-1,1], 'tokens': (B,77) int32,
    'null_tokens': (B,77), 'fs': (B,) frame strides, 'fps': (B,) real fps}.

    The fps-embedding input is selected by the model's
    `fps_condition_type` — 'fs' feeds frame_stride, 'fps' feeds the clip
    fps (ddpm3d.py:1124-1129; the shipped training YAML uses 'fps').

    Returns (loss, metrics)."""
    params = {**train_params, **frozen_params}
    fct = model.config.fps_condition_type
    if fct not in ("fs", "fps"):
        raise ValueError(f"unknown fps_condition_type '{fct}'")
    fs_signal = batch["fs"] if fct == "fs" else batch["fps"]
    sched = model.schedule
    video = batch["video"]
    b, t = video.shape[:2]
    rngs = jax.random.split(rng, 8)

    # --- first stage (frozen): encode clip, sample posterior ---
    z, _ = model.encode_first_stage(params, video, rng=rngs[0])
    z = jax.lax.stop_gradient(z)

    # --- conditioning with 3-way CFG dropout (ddpm3d.py:1085-1094) ---
    u = uncond_prob
    rand = jax.random.uniform(rngs[1], (b,))
    drop_text = (rand < 2 * u)[:, None, None]
    drop_image = ((rand >= u) & (rand < 3 * u))[:, None, None, None]

    text_emb = model.encode_text(params, batch["tokens"])
    null_emb = model.encode_text(params, batch["null_tokens"])
    text_emb = jnp.where(drop_text, null_emb,
                         jax.lax.stop_gradient(text_emb))

    if rand_cond_frame:
        cond_frame = jax.random.randint(rngs[2], (), 0, t)
    else:
        cond_frame = 0
    img = jax.lax.dynamic_index_in_dim(video, cond_frame, axis=1,
                                       keepdims=False)
    img = jnp.where(drop_image, jnp.zeros_like(img), img)
    img_ctx = model.encode_image_context(params, img)  # grads -> image_proj

    context = jnp.concatenate([text_emb, img_ctx], axis=1)

    # hybrid concat: cond-frame latent repeated T times (ddpm3d.py:1107-1113)
    z_cond = jax.lax.dynamic_index_in_dim(z, cond_frame, axis=1,
                                          keepdims=True)
    concat = jnp.tile(z_cond, (1, t, 1, 1, 1))

    # --- diffusion target ---
    mcfg = model.config
    ts = jax.random.randint(rngs[3], (b,), 0, sched.num_timesteps)
    x0 = sched.dynamic_rescale(z, ts)
    noise = jax.random.normal(rngs[4], z.shape, z.dtype)
    if mcfg.noise_strength > 0:
        # offset noise (ddpm3d.py:753-757): per-(batch, frame, channel)
        # component broadcast over H, W — channels-last layout here
        offset = jax.random.normal(
            rngs[6], (b, t, 1, 1, z.shape[-1]), z.dtype)
        noise = noise + mcfg.noise_strength * offset
    x_noisy = sched.q_sample(x0, ts, noise)
    target = sched.get_v(x0, noise, ts)

    unet_in = jnp.concatenate([x_noisy, concat], axis=-1)
    pred = model.unet.apply(
        {"params": params["unet"]}, unet_in, ts.astype(jnp.float32), context,
        fs_signal.astype(jnp.float32), deterministic=not train,
        rngs={"dropout": rngs[5]} if train else None)

    loss_simple = jnp.mean(jnp.square(pred - target), axis=(1, 2, 3, 4))
    # per-timestep logvar weighting + VLB term (ddpm3d.py:775-794):
    #   loss = l_simple_weight * mean(loss_simple/exp(logvar_t) + logvar_t)
    #        + original_elbo_weight * mean(lvlb_weights[t] * loss_simple)
    # At the shipped values (logvar 0, elbo weight 0, l_simple 1) this
    # reduces exactly to mean(loss_simple).
    if mcfg.learn_logvar:
        logvar = train_params["logvar"]["logvar"]
    else:
        logvar = jnp.full((sched.num_timesteps,), mcfg.logvar_init,
                          jnp.float32)
    logvar_t = logvar[ts]
    loss_gamma = loss_simple / jnp.exp(logvar_t) + logvar_t
    loss = mcfg.l_simple_weight * jnp.mean(loss_gamma)
    loss_vlb = jnp.mean(jnp.asarray(sched.lvlb_weights)[ts] * loss_simple)
    loss = loss + mcfg.original_elbo_weight * loss_vlb
    metrics = {"loss": loss, "loss_simple": jnp.mean(loss_simple),
               "loss_vlb": loss_vlb,
               "t_mean": jnp.mean(ts.astype(jnp.float32))}
    if mcfg.learn_logvar:
        metrics["loss_gamma"] = jnp.mean(loss_gamma)
        metrics["logvar"] = jnp.mean(logvar)
    return loss, metrics


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    train_params: Any
    frozen_params: Any
    opt_state: Any
    ema_params: Optional[Any]


def make_train_state(model: ToonCrafter, params, cfg: TrainConfig,
                     use_ema: bool = False) -> Tuple[TrainState,
                                                     optax.GradientTransformation]:
    train, frozen = split_trainable(params)
    if model.config.learn_logvar and "logvar" not in train:
        # the reference promotes its per-timestep logvar buffer to a
        # trainable nn.Parameter under learn_logvar (ddpm3d.py:119-122)
        train = dict(train, logvar={"logvar": jnp.full(
            (model.schedule.num_timesteps,), model.config.logvar_init,
            jnp.float32)})
    opt = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        train_params=train,
        frozen_params=frozen,
        opt_state=opt.init(train),
        ema_params=jax.tree_util.tree_map(jnp.copy, train) if use_ema
        else None,
    )
    return state, opt


def eval_param_tree(state: "TrainState", use_ema: bool = True):
    """The reference's `ema_scope` (lvdm/ema.py:14-76, ddpm3d.py:192-202):
    evaluate with the EMA shadow swapped in. Functionally there is nothing to
    store/restore — just assemble the full tree from the shadow."""
    train = state.ema_params if (use_ema and state.ema_params is not None) \
        else state.train_params
    return {**train, **state.frozen_params}


def make_val_step(model: ToonCrafter, cfg: TrainConfig):
    """Jittable validation step: val loss with raw weights and (when an EMA
    shadow exists) with EMA weights — reference validation_step
    (ddpm3d.py:399-406)."""

    def val_fn(state: TrainState, batch, rng):
        loss, _ = diffusion_loss(model, state.train_params,
                                 state.frozen_params, batch, rng,
                                 cfg.uncond_prob, cfg.rand_cond_frame,
                                 train=False)
        metrics = {"val/loss": loss}
        if state.ema_params is not None:
            loss_ema, _ = diffusion_loss(model, state.ema_params,
                                         state.frozen_params, batch, rng,
                                         cfg.uncond_prob, cfg.rand_cond_frame,
                                         train=False)
            metrics["val/loss_ema"] = loss_ema
        return metrics

    return val_fn


def make_train_step(model: ToonCrafter, opt, cfg: TrainConfig):
    """Returns a jittable (state, batch, rng) -> (state, metrics)."""

    def step_fn(state: TrainState, batch, rng):
        def loss_fn(tp):
            return diffusion_loss(model, tp, state.frozen_params, batch, rng,
                                  cfg.uncond_prob, cfg.rand_cond_frame)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.train_params)
        updates, opt_state = opt.update(grads, state.opt_state,
                                        state.train_params)
        train_params = optax.apply_updates(state.train_params, updates)
        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, train_params, state.step, cfg.ema_decay)
        new_state = TrainState(
            step=state.step + 1, train_params=train_params,
            frozen_params=state.frozen_params, opt_state=opt_state,
            ema_params=ema)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step_fn


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["step", "train_params", "frozen_params", "opt_state",
                 "ema_params"],
    meta_fields=[])
