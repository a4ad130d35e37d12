"""Video quality metrics for regression gating.

SURVEY.md §4e calls for PSNR/LPIPS gates over the prompts/512_interp e2e
fixture. PSNR and SSIM are implemented natively (jnp); LPIPS requires
pretrained perceptual weights that ship separately — the hook accepts any
feature extractor with the same signature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a, b, data_range: float = 2.0):
    """Peak signal-to-noise ratio; inputs in [-1, 1] by default.
    a, b: (..., H, W, C); returns scalar per leading batch dims."""
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)),
                   axis=(-3, -2, -1))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return g


def ssim(a, b, data_range: float = 2.0, size: int = 11,
         sigma: float = 1.5):
    """Structural similarity over (..., H, W, C) images (per-channel mean),
    standard Gaussian-window formulation (Wang et al. 2004)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    lead = a.shape[:-3]
    h, w, c = a.shape[-3:]
    a = a.reshape((-1, h, w, c))
    b = b.reshape((-1, h, w, c))
    win = _gaussian_kernel(size, sigma)

    def blur(x):
        # separable depthwise Gaussian via two 1-D convs
        x = jax.vmap(lambda img: jnp.apply_along_axis(
            lambda r: jnp.convolve(r, win, mode="valid"), 0, img))(x)
        x = jax.vmap(lambda img: jnp.apply_along_axis(
            lambda r: jnp.convolve(r, win, mode="valid"), 1, img))(x)
        return x

    mu_a = blur(a)
    mu_b = blur(b)
    saa = blur(a * a) - mu_a**2
    sbb = blur(b * b) - mu_b**2
    sab = blur(a * b) - mu_a * mu_b
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (saa + sbb + c2))
    out = jnp.mean(s, axis=(1, 2, 3))
    return out.reshape(lead) if lead else out[0]


def video_psnr(a, b):
    """(B, T, H, W, C) -> per-clip mean PSNR across frames."""
    return jnp.mean(psnr(a, b), axis=-1)


def lpips(a, b, feature_fn=None, params=None):
    """Perceptual distance. Preferred path: pass `params` from
    models/lpips.load_lpips_params (torchvision VGG16 + lpips lin weights)
    to run the full LPIPS head (models/lpips.py, parity-tested). Legacy
    path: a bare `feature_fn(images) -> list of (B,H_l,W_l,C_l)` gives the
    unweighted variant. Weights remain an external artifact."""
    if params is not None:
        from tooncrafter_tpu.models.lpips import LPIPS

        return LPIPS().apply({"params": params}, a, b)
    if feature_fn is None:
        raise ValueError(
            "lpips needs weights: pass params= from "
            "tooncrafter_tpu.models.lpips.load_lpips_params (torchvision "
            "vgg16 features + lpips lin state dicts), or a raw feature_fn")
    fa = feature_fn(a)
    fb = feature_fn(b)
    dist = 0.0
    for xa, xb in zip(fa, fb):
        na = xa / jnp.maximum(jnp.linalg.norm(xa, axis=-1, keepdims=True),
                              1e-8)
        nb = xb / jnp.maximum(jnp.linalg.norm(xb, axis=-1, keepdims=True),
                              1e-8)
        dist = dist + jnp.mean(jnp.sum((na - nb) ** 2, axis=-1),
                               axis=(-2, -1))
    return dist
