"""Golden-value and invariant tests for the schedule math.

The DDIM spacing quirks and ZTSNR behavior are the cheap-but-critical numerics
the whole sampler depends on (SURVEY.md §4b)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tooncrafter_tpu.ops import schedule as S


def test_linear_betas_endpoints():
    b = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    assert b.shape == (1000,)
    assert np.isclose(b[0], 0.00085)
    assert np.isclose(b[-1], 0.012)
    # sqrt-space interpolation: midpoint beta is ((sqrt(s)+sqrt(e))/2)^2
    mid = ((0.00085**0.5 + 0.012**0.5) / 2) ** 2
    assert np.isclose(b[499:501].mean(), mid, rtol=1e-3)


def test_ztsnr_terminal_alpha_zero():
    b = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    b2 = S.rescale_zero_terminal_snr(b)
    ab = np.cumprod(1 - b2)
    ab0 = np.cumprod(1 - b)
    assert abs(ab[-1]) < 1e-12          # terminal SNR exactly zero
    assert np.isclose(ab[0], ab0[0])    # first step preserved
    assert b2[-1] == pytest.approx(1.0)


def test_ddim_uniform_spacing_golden():
    # range(0,1000,20) + 1 -> starts at 1, ends at 981
    t = S.make_ddim_timesteps("uniform", 50, 1000)
    assert t.shape == (50,)
    assert t[0] == 1 and t[1] == 21 and t[-1] == 981


def test_ddim_uniform_trailing_spacing_golden():
    # flip(round(arange(1000, 0, -20))) - 1 -> starts at 19, ends at 999
    t = S.make_ddim_timesteps("uniform_trailing", 50, 1000)
    assert t.shape == (50,)
    assert t[-1] == 999  # trailing spacing hits the terminal step
    assert t[0] == 19
    assert np.all(np.diff(t) == 20)


def test_ddim_trailing_non_divisible():
    t = S.make_ddim_timesteps("uniform_trailing", 7, 1000)
    assert t[-1] == 999 and t.shape == (7,)
    assert np.all(t >= 0)


def test_ddim_sampling_parameters_eta1():
    sched = S.build_schedule()
    dd = S.build_ddim_schedule(sched, 50, eta=1.0, spacing="uniform_trailing")
    # alphas_prev[0] is alphacums[0] by construction
    assert np.isclose(dd.alphas_prev[0], sched.alphas_cumprod[0])
    assert np.all(dd.sigmas >= 0)
    # last step with ZTSNR: alpha_bar(999) == 0 -> sigma formula holds finite
    assert np.isfinite(dd.sigmas).all()
    assert dd.num_steps == 50


def test_v_parameterization_roundtrip():
    sched = S.build_schedule(rescale_betas_zero_snr=False)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(2, 4, 4)), jnp.float32)
    t = jnp.asarray([10, 700])
    xt = sched.q_sample(x0, t, noise)
    v = sched.get_v(x0, noise, t)
    x0_rec = sched.predict_start_from_z_and_v(xt, t, v)
    eps_rec = sched.predict_eps_from_z_and_v(xt, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-5)


def test_dynamic_rescale_array():
    sched = S.build_schedule(use_dynamic_rescale=True, base_scale=0.7,
                             turning_step=400)
    assert sched.scale_arr is not None
    assert np.isclose(sched.scale_arr[0], 1.0)
    assert np.isclose(sched.scale_arr[399], 0.7)
    assert np.isclose(sched.scale_arr[900], 0.7)
    dd = S.build_ddim_schedule(sched, 50)
    assert np.isclose(dd.scale_arr_prev[0], dd.scale_arr[0])


def test_timestep_embedding_matches_formula():
    emb = S.timestep_embedding(jnp.asarray([0.0, 5.0]), 8)
    assert emb.shape == (2, 8)
    # t=0 -> cos(0)=1 for first half, sin(0)=0 for second half
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 0.0, atol=1e-6)
    freqs = np.exp(-np.log(10000) * np.arange(4) / 4)
    np.testing.assert_allclose(np.asarray(emb[1, :4]), np.cos(5 * freqs),
                               atol=1e-5)


def test_fairseq_embedding_orders_sin_first():
    emb = S.fairseq_timestep_embedding(jnp.asarray([0.0]), 8)
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 1.0, atol=1e-6)


def test_rescale_noise_cfg_interpolates():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(2, 3, 8, 8)) * 2.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, 3, 8, 8)), jnp.float32)
    out0 = S.rescale_noise_cfg(a, b, 0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(a))
    out1 = S.rescale_noise_cfg(a, b, 1.0)
    # fully rescaled: per-sample std matches the text branch
    std_out = np.asarray(out1).std(axis=(1, 2, 3))
    std_b = np.asarray(b).std(axis=(1, 2, 3))
    np.testing.assert_allclose(std_out, std_b, rtol=2e-2)


def test_unknown_spacing_and_schedule_raise():
    """Error paths: unknown names fail loudly (the reference raises
    NotImplementedError for unknown ddim discretization too,
    utils_diffusion.py:74-76)."""
    import pytest

    with pytest.raises(NotImplementedError, match="bogus"):
        S.make_ddim_timesteps("bogus", 50, 1000)
    with pytest.raises((ValueError, NotImplementedError, KeyError)):
        S.build_schedule(beta_schedule="nonsense")
