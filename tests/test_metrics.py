"""PSNR/SSIM metric tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.utils import metrics as M


def test_psnr_identity_and_known_value():
    a = jnp.zeros((1, 16, 16, 3))
    assert float(M.psnr(a, a)[0]) > 100
    b = a + 0.2  # mse = 0.04 with range 2 -> 10*log10(4/0.04) = 20dB
    np.testing.assert_allclose(float(M.psnr(a, b)[0]), 20.0, atol=1e-3)


def test_ssim_bounds():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    s_same = M.ssim(a, a)
    np.testing.assert_allclose(np.asarray(s_same), 1.0, atol=1e-5)
    noise = jnp.asarray(rng.uniform(-1, 1, a.shape), jnp.float32)
    s_noise = M.ssim(a, noise)
    assert np.all(np.asarray(s_noise) < 0.3)


def test_video_psnr_shape():
    a = jnp.zeros((2, 4, 8, 8, 3))
    out = M.video_psnr(a, a + 0.1)
    assert out.shape == (2,)


def test_lpips_requires_extractor():
    with pytest.raises(ValueError):
        M.lpips(jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8, 8, 3)))
    # with a trivial extractor it runs
    fe = lambda x: [x, x[:, ::2, ::2]]
    d = M.lpips(jnp.zeros((1, 8, 8, 3)), jnp.ones((1, 8, 8, 3)) * 0.5, fe)
    assert np.isfinite(float(d[0]))
