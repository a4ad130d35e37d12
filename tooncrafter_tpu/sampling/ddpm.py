"""Ancestral DDPM sampling (the base-model path, DDIM-free).

Counterpart of DDPM.p_sample / p_sample_loop
(/root/reference/lvdm/models/ddpm3d.py:268-301): full 1000-step ancestral
sampling with the posterior q(x_{t-1}|x_t, x0) variance, as a `lax.scan`.
Mostly used for validation/completeness — the inference path uses DDIM.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tooncrafter_tpu.ops.schedule import DiffusionSchedule


def ddpm_sample(
    denoiser: Callable[..., jax.Array],
    sched: DiffusionSchedule,
    x_T: jax.Array,
    contexts: jax.Array,   # (1, B, L, D) — no CFG in the base path
    concat: jax.Array,
    fs: jax.Array,
    rng: jax.Array,
    clip_denoised: bool = False,
) -> jax.Array:
    n_steps = sched.num_timesteps
    b = x_T.shape[0]
    ctx = contexts.reshape((-1,) + contexts.shape[2:])

    sqrt_ab = jnp.asarray(sched.sqrt_alphas_cumprod)
    sqrt_omab = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)
    coef1 = jnp.asarray(sched.posterior_mean_coef1)
    coef2 = jnp.asarray(sched.posterior_mean_coef2)
    logvar = jnp.asarray(sched.posterior_log_variance_clipped)

    def step(carry, t):
        x, rng = carry
        rng, nrng = jax.random.split(rng)
        ts = jnp.full((b,), t, jnp.float32)
        xin = jnp.concatenate([x, concat], axis=-1)
        out = denoiser(xin, ts, ctx, fs)
        tb = jnp.full((b,), t, jnp.int32)
        if sched.parameterization == "v":
            x0 = sched.predict_start_from_z_and_v(x, tb, out)
        elif sched.parameterization == "eps":
            g = lambda a: a[tb].reshape((b,) + (1,) * (x.ndim - 1))
            x0 = (x - g(sqrt_omab) * out) / jnp.maximum(g(sqrt_ab), 1e-8)
        else:
            x0 = out
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        g = lambda a: a[tb].reshape((b,) + (1,) * (x.ndim - 1))
        mean = g(coef1) * x0 + g(coef2) * x
        noise = jax.random.normal(nrng, x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype)
        x_prev = mean + nonzero * jnp.exp(0.5 * g(logvar)) * noise
        return (x_prev, rng), None

    (x, _), _ = jax.lax.scan(step, (x_T, rng),
                             jnp.arange(n_steps - 1, -1, -1))
    return x
