"""DDIM sampling as one jitted `lax.scan` with batched CFG.

Rebuilds the math of /root/reference/lvdm/models/samplers/ddim.py
(p_sample_ddim :205-279, loop :134-203) and the dual-guidance variant
ddim_multiplecond.py (:226-236), with the TPU-native restructuring:

  * the reference runs the UNet 2 (or 3) times sequentially per step for
    classifier-free guidance (ddim.py:221-222); here the guidance branches
    are folded into the batch axis of ONE UNet call per step, which keeps
    the MXU at full tilt and halves dispatch overhead;
  * the python loop over 50 steps becomes `lax.scan` over stacked per-step
    schedule constants (one compiled step graph, no retracing);
  * v-parameterization conversions gather from the full 1000-entry
    alpha tables by the step's DDPM index, exactly like
    predict_eps_from_z_and_v / predict_start_from_z_and_v.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tooncrafter_tpu.ops.schedule import (DDIMSchedule, DiffusionSchedule,
                                          rescale_noise_cfg)
from tooncrafter_tpu.utils import rngs as R


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """Classifier-free guidance configuration.

    cfg_scale: text guidance scale (`unconditional_guidance_scale`).
    cfg_img: optional separate image guidance scale; when set, sampling uses
        the 3-branch combination of ddim_multiplecond.py:226-236.
    guidance_rescale: std-rescale of the combined prediction (run.sh 0.7 for
        the 512 model).
    """

    cfg_scale: float = 7.5
    cfg_img: Optional[float] = None
    guidance_rescale: float = 0.0

    @property
    def num_branches(self) -> int:
        if self.cfg_scale == 1.0:
            return 1
        return 3 if self.cfg_img is not None and self.cfg_img != 1.0 else 2


def ddim_sample(
    denoiser: Callable[..., jax.Array],
    sched: DiffusionSchedule,
    ddim: DDIMSchedule,
    x_T: jax.Array,                     # (B, T, h, w, C)
    contexts: jax.Array,                # (num_branches, B, L, D) stacked
    concat: jax.Array,                  # (B, T, h, w, C_cond)
    fs: jax.Array,                      # (B,)
    rng: jax.Array,
    guidance: GuidanceConfig,
    temperature: float = 1.0,
    mask: Optional[jax.Array] = None,   # broadcastable to x; 1 = keep x0
    x0: Optional[jax.Array] = None,
    clean_cond: bool = False,
) -> jax.Array:
    """Run the full DDIM loop; returns denoised latents (B,T,h,w,C).

    `denoiser(x, t, context, fs)` is the UNet apply closed over params; it
    receives the CFG-batched tensors. `contexts` stacks the guidance
    branches in evaluation order: [uncond, (uncond_img,) cond].

    mask/x0 latent blending (ddim.py:173-180): at every step the masked
    region is replaced with the original latent — clean (clean_cond=True)
    or noised to the step's marginal via q_sample.
    """
    n = guidance.num_branches
    b = x_T.shape[0]

    # constants for the scan, ordered last step -> first (sampling order)
    order = slice(None, None, -1)
    steps = jnp.asarray(ddim.timesteps[order])
    alphas = jnp.asarray(ddim.alphas[order])
    alphas_prev = jnp.asarray(ddim.alphas_prev[order])
    sigmas = jnp.asarray(ddim.sigmas[order] * temperature)
    if ddim.scale_arr is not None:
        rescales = jnp.asarray((ddim.scale_arr_prev / ddim.scale_arr)[order])
    else:
        rescales = jnp.ones_like(alphas)

    ctx_flat = contexts.reshape((n * b,) + contexts.shape[2:])
    concat_n = jnp.tile(concat, (n,) + (1,) * (concat.ndim - 1))
    fs_n = jnp.tile(fs, (n,))

    def step(carry, per_step):
        x, rng = carry
        t_idx, a_t, a_prev, sigma, rescale = per_step
        rng, nrng = R.split(rng)

        if mask is not None:
            assert x0 is not None, "mask blending requires x0"
            rng, mrng = R.split(rng)
            t_b0 = jnp.full((x.shape[0],), t_idx, jnp.int32)
            orig = x0 if clean_cond else sched.q_sample(
                x0, t_b0, R.normal(mrng, x.shape, x.dtype))
            x = orig * mask + (1.0 - mask) * x

        xin = jnp.tile(x, (n,) + (1,) * (x.ndim - 1))
        xin = jnp.concatenate([xin, concat_n], axis=-1)
        ts = jnp.full((n * b,), t_idx, jnp.float32)
        v_all = denoiser(xin, ts, ctx_flat, fs_n)
        v_all = v_all.reshape((n, b) + v_all.shape[1:])

        if n == 1:
            v = v_all[0]
        elif n == 2:
            e_uc, e_c = v_all[0], v_all[1]
            v = e_uc + guidance.cfg_scale * (e_c - e_uc)
            if guidance.guidance_rescale > 0:
                v = rescale_noise_cfg(v, e_c, guidance.guidance_rescale)
        else:
            e_uc, e_uc_img, e_c = v_all[0], v_all[1], v_all[2]
            v = (e_uc
                 + guidance.cfg_img * (e_uc_img - e_uc)
                 + guidance.cfg_scale * (e_c - e_uc_img))
            if guidance.guidance_rescale > 0:
                v = rescale_noise_cfg(v, e_c, guidance.guidance_rescale)

        t_b = jnp.full((b,), t_idx, jnp.int32)
        if sched.parameterization == "v":
            e_t = sched.predict_eps_from_z_and_v(x, t_b, v)
            pred_x0 = sched.predict_start_from_z_and_v(x, t_b, v)
        else:
            e_t = v
            pred_x0 = (x - jnp.sqrt(1.0 - a_t) * e_t) / jnp.sqrt(a_t)
        pred_x0 = pred_x0 * rescale  # dynamic rescale (ddim.py:262-266)

        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * e_t
        noise = sigma * R.normal(nrng, x.shape, x.dtype)
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
        return (x_prev, rng), None

    (x, _), _ = jax.lax.scan(
        step, (x_T, rng),
        (steps.astype(jnp.float32), alphas, alphas_prev, sigmas, rescales))
    return x


def stochastic_encode(ddim: DDIMSchedule, x0, step_index: int, rng):
    """Noise x0 to the DDIM step `step_index` marginal (ddim.py:303-317):
    x_t = sqrt(a)x0 + sqrt(1-a)eps over the DDIM sub-schedule.

    `rng` may be a plain key or a (B, 2) per-item key stack (utils/rngs) —
    the per-item form keeps the drawn noise batch-size invariant like
    every other sampling path."""
    from tooncrafter_tpu.utils import rngs as R

    a = float(ddim.alphas[step_index])
    noise = R.normal(rng, x0.shape, x0.dtype)
    return np.sqrt(a) * x0 + np.sqrt(1.0 - a) * noise


def ddim_decode_from(
    denoiser, sched: DiffusionSchedule, ddim: DDIMSchedule, x_t,
    contexts, concat, fs, rng, guidance: GuidanceConfig,
    t_start: int,
):
    """Run the DDIM loop from step t_start (exclusive) down to 0 —
    the sampler's `decode` path (ddim.py:281-301) used for img2img-style
    editing after `stochastic_encode`."""
    sub = DDIMSchedule(
        timesteps=ddim.timesteps[:t_start],
        alphas=ddim.alphas[:t_start],
        alphas_prev=ddim.alphas_prev[:t_start],
        sigmas=ddim.sigmas[:t_start],
        sqrt_one_minus_alphas=ddim.sqrt_one_minus_alphas[:t_start],
        scale_arr=None if ddim.scale_arr is None
        else ddim.scale_arr[:t_start],
        scale_arr_prev=None if ddim.scale_arr_prev is None
        else ddim.scale_arr_prev[:t_start],
    )
    return ddim_sample(denoiser, sched, sub, x_t, contexts, concat, fs, rng,
                       guidance)
