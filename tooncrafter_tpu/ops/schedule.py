"""Diffusion schedule math (pure numpy / jnp; no state).

Functional parity targets in the reference:
  * beta schedules            — /root/reference/lvdm/models/utils_diffusion.py:31-53
  * DDIM timestep selection   — utils_diffusion.py:56-76 (incl. the +1 / -1
    off-by-one quirks of 'uniform' vs 'uniform_trailing')
  * DDIM alphas/sigmas        — utils_diffusion.py:79-91
  * zero-terminal-SNR rescale — utils_diffusion.py:112-144 (arXiv 2305.08891)
  * CFG rescale               — utils_diffusion.py:147-158
  * sinusoidal timestep embed — utils_diffusion.py:8-28
  * dynamic rescale array     — lvdm/models/ddpm3d.py:523-528
  * full DDPM buffer set      — lvdm/models/ddpm3d.py:124-190

Everything here is computed eagerly in float64 numpy at model-build time and
becomes constant operands of the jitted sampling/training graphs; nothing in
this file traces.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# beta schedules
# --------------------------------------------------------------------------

def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Return float64 betas of shape (n_timestep,)."""
    if schedule == "linear":
        # sqrt-space linspace, then squared (SD convention)
        betas = np.linspace(linear_start**0.5, linear_end**0.5, n_timestep,
                            dtype=np.float64) ** 2
    elif schedule == "cosine":
        steps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(steps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep,
                            dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"unknown beta schedule '{schedule}'")
    return betas


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Shift/scale sqrt(alpha_bar) so the final step has exactly zero SNR.

    Algorithm 1 of arXiv 2305.08891. The terminal alpha_bar becomes 0 (the
    final beta becomes 1), making the v-prediction model see pure noise at
    t=T-1.
    """
    alphas = 1.0 - betas
    alphas_bar = np.cumprod(alphas, axis=0)
    sqrt_ab = np.sqrt(alphas_bar)

    sqrt_ab_0 = sqrt_ab[0].copy()
    sqrt_ab_T = sqrt_ab[-1].copy()
    sqrt_ab = sqrt_ab - sqrt_ab_T
    sqrt_ab = sqrt_ab * sqrt_ab_0 / (sqrt_ab_0 - sqrt_ab_T)

    alphas_bar = sqrt_ab**2
    alphas = np.concatenate([alphas_bar[:1], alphas_bar[1:] / alphas_bar[:-1]])
    return 1.0 - alphas


# --------------------------------------------------------------------------
# DDIM timestep selection (both spacings, with the reference's exact quirks)
# --------------------------------------------------------------------------

def make_ddim_timesteps(
    method: str, num_ddim_steps: int, num_ddpm_steps: int
) -> np.ndarray:
    if method == "uniform":
        c = num_ddpm_steps // num_ddim_steps
        steps = np.arange(0, num_ddpm_steps, c, dtype=np.int64) + 1
    elif method == "uniform_trailing":
        c = num_ddpm_steps / num_ddim_steps
        steps = np.flip(np.round(np.arange(num_ddpm_steps, 0, -c))).astype(np.int64)
        steps = steps - 1
    elif method == "quad":
        steps = (np.linspace(0, np.sqrt(num_ddpm_steps * 0.8),
                             num_ddim_steps) ** 2).astype(np.int64) + 1
    else:
        raise NotImplementedError(f"unknown ddim discretization '{method}'")
    return steps


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
):
    """Per-DDIM-step (sigma, alpha, alpha_prev) per arXiv 2010.02502 eq. 16."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.concatenate([alphacums[:1], alphacums[ddim_timesteps[:-1]]])
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return sigmas, alphas, alphas_prev


# --------------------------------------------------------------------------
# classifier-free guidance rescale (arXiv 2305.08891 §3.4)
# --------------------------------------------------------------------------

def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale=0.0):
    """Rescale the CFG-combined prediction toward the text branch's std.

    Guarded against a zero-variance prediction (e.g. a zero-init model):
    the reference's raw division produces NaN there."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / jnp.maximum(std_cfg, 1e-12))
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


# --------------------------------------------------------------------------
# sinusoidal embeddings
# --------------------------------------------------------------------------

def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """[cos | sin] sinusoidal embedding, matching the OpenAI/ADM layout.

    timesteps: (N,) possibly-fractional scalars. Returns (N, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = jnp.asarray(timesteps, jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def fairseq_timestep_embedding(timesteps, dim: int):
    """[sin | cos] variant used by the SD VAE lineage (tensor2tensor/Fairseq).

    Reference analogue: ae_modules.get_timestep_embedding (divides by
    half_dim - 1 and orders sin before cos).
    """
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    args = jnp.asarray(timesteps, jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# --------------------------------------------------------------------------
# the full precomputed schedule bundle
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All per-timestep constants of the DDPM process (float32 numpy).

    Mirrors the buffer set registered in the reference's
    DDPM.register_schedule (ddpm3d.py:124-190) plus LatentDiffusion's dynamic
    rescale array (ddpm3d.py:523-528).
    """

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    lvlb_weights: np.ndarray
    scale_arr: Optional[np.ndarray]  # dynamic-rescale, len num_timesteps(+turning)
    num_timesteps: int
    parameterization: str  # 'eps' | 'x0' | 'v'

    # ---- pointwise process math (all take gathered per-sample coefs) ----

    def _gather(self, arr, t, ndim):
        out = jnp.take(jnp.asarray(arr), t)
        return out.reshape(out.shape + (1,) * (ndim - 1))

    def q_sample(self, x_start, t, noise):
        """Forward diffusion q(x_t | x_0)."""
        a = self._gather(self.sqrt_alphas_cumprod, t, x_start.ndim)
        s = self._gather(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
        return a * x_start + s * noise

    def get_v(self, x, noise, t):
        """v-target: v = sqrt(ab)*eps - sqrt(1-ab)*x  (Salimans & Ho 2022)."""
        a = self._gather(self.sqrt_alphas_cumprod, t, x.ndim)
        s = self._gather(self.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return a * noise - s * x

    def predict_start_from_z_and_v(self, x_t, t, v):
        a = self._gather(self.sqrt_alphas_cumprod, t, x_t.ndim)
        s = self._gather(self.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
        return a * x_t - s * v

    def predict_eps_from_z_and_v(self, x_t, t, v):
        a = self._gather(self.sqrt_alphas_cumprod, t, x_t.ndim)
        s = self._gather(self.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
        return a * v + s * x_t

    def dynamic_rescale(self, x, t):
        """x * scale_arr[t] — applied to x0 before q_sample during training."""
        if self.scale_arr is None:
            return x
        return x * self._gather(self.scale_arr, t, x.ndim)


def build_schedule(
    timesteps: int = 1000,
    beta_schedule: str = "linear",
    linear_start: float = 0.00085,
    linear_end: float = 0.012,
    cosine_s: float = 8e-3,
    given_betas: Optional[np.ndarray] = None,
    rescale_betas_zero_snr: bool = True,
    parameterization: str = "v",
    v_posterior: float = 0.0,
    use_dynamic_rescale: bool = True,
    base_scale: float = 0.7,
    turning_step: int = 400,
) -> DiffusionSchedule:
    betas = (np.asarray(given_betas, np.float64) if given_betas is not None
             else make_beta_schedule(beta_schedule, timesteps,
                                     linear_start, linear_end, cosine_s))
    if rescale_betas_zero_snr:
        betas = rescale_zero_terminal_snr(betas)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    posterior_variance = (
        (1 - v_posterior) * betas * (1.0 - alphas_cumprod_prev)
        / (1.0 - alphas_cumprod)
        + v_posterior * betas
    )
    if parameterization == "eps":
        with np.errstate(divide="ignore", invalid="ignore"):
            lvlb = betas**2 / (
                2 * posterior_variance * alphas * (1 - alphas_cumprod)
            )
    elif parameterization == "x0":
        lvlb = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
    elif parameterization == "v":
        lvlb = np.ones_like(betas)
    else:
        raise NotImplementedError(parameterization)
    lvlb = lvlb.copy()
    lvlb[0] = lvlb[1]

    scale_arr = None
    if use_dynamic_rescale:
        # ramp 1.0 -> base_scale over turning_step, then flat (ddpm3d.py:523-528)
        scale_arr = np.concatenate([
            np.linspace(1.0, base_scale, turning_step),
            np.full(timesteps, base_scale),
        ]).astype(np.float32)

    f32 = lambda a: np.asarray(a, np.float32)
    with np.errstate(divide="ignore"):
        log_omac = np.log(1.0 - alphas_cumprod)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(log_omac),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas)
            / (1.0 - alphas_cumprod)),
        lvlb_weights=f32(lvlb),
        scale_arr=scale_arr,
        num_timesteps=int(timesteps),
        parameterization=parameterization,
    )


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Per-DDIM-step constants, stacked for `lax.scan` over the denoise loop."""

    timesteps: np.ndarray        # (S,) DDPM step indices, ascending
    alphas: np.ndarray           # (S,) alpha_bar at each step
    alphas_prev: np.ndarray      # (S,)
    sigmas: np.ndarray           # (S,)
    sqrt_one_minus_alphas: np.ndarray  # (S,)
    scale_arr: Optional[np.ndarray]       # (S,) dynamic-rescale at step
    scale_arr_prev: Optional[np.ndarray]  # (S,)

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def build_ddim_schedule(
    sched: DiffusionSchedule,
    num_steps: int,
    eta: float = 1.0,
    spacing: str = "uniform_trailing",
) -> DDIMSchedule:
    tsteps = make_ddim_timesteps(spacing, num_steps, sched.num_timesteps)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        sched.alphas_cumprod.astype(np.float64), tsteps, eta)
    scale_arr = scale_arr_prev = None
    if sched.scale_arr is not None:
        scale_arr = sched.scale_arr[tsteps]
        scale_arr_prev = np.concatenate([scale_arr[:1], scale_arr[:-1]])
    f32 = lambda a: np.asarray(a, np.float32)
    return DDIMSchedule(
        timesteps=tsteps.astype(np.int32),
        alphas=f32(alphas),
        alphas_prev=f32(alphas_prev),
        sigmas=f32(sigmas),
        sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
        scale_arr=None if scale_arr is None else f32(scale_arr),
        scale_arr_prev=None if scale_arr_prev is None else f32(scale_arr_prev),
    )
