"""Image resizing ops.

`resize_bicubic` reproduces torch/kornia bicubic interpolation with
`align_corners=True, antialias=True` — the exact preprocess the reference
applies before the CLIP vision tower (`lvdm/modules/encoders/condition.py:
322-330`). Implemented as two dense interpolation matrices applied as
matmuls: shapes are static under jit, the matrices fold into constants, and
the contraction runs on the MXU instead of a gather pipeline.

`upsample_nearest_2x` is the UNet/VAE upsampling primitive
(`openaimodel3d.py:98-106`, `ae_modules.py:245-252`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic kernel with torch's A=-0.75 convention."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, align_corners: bool,
                   antialias: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix.

    antialias=True follows torch's PIL-derived separable pipeline
    (aten _compute_indices_weights_aa): cubic kernel a=-0.5, pixel centers at
    j+0.5, window truncated to the valid range and renormalized;
    align_corners only changes the scale ratio. antialias=False follows the
    classic convolutional bicubic with a=-0.75 and border replication.
    """
    if align_corners and out_size > 1:
        scale = (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
    mat = np.zeros((out_size, in_size), np.float64)
    if antialias:
        ss = max(scale, 1.0)
        support = 2.0 * ss
        for i in range(out_size):
            center = scale * (i + 0.5)
            lo = max(int(center - support + 0.5), 0)
            hi = min(int(center + support + 0.5), in_size)
            idx = np.arange(lo, hi)
            w = _cubic_kernel((idx - center + 0.5) / ss, a=-0.5)
            mat[i, lo:hi] = w / w.sum()
    else:
        for i in range(out_size):
            if align_corners and out_size > 1:
                center = i * scale
            else:
                center = (i + 0.5) * scale - 0.5
            lo = int(np.floor(center)) - 1
            idx = np.arange(lo, lo + 4)
            w = _cubic_kernel(idx - center, a=-0.75)
            np.add.at(mat[i], np.clip(idx, 0, in_size - 1), w)
    return mat.astype(np.float32)


def resize_bicubic(x, out_h: int, out_w: int, align_corners: bool = True,
                   antialias: bool = True):
    """x: (..., H, W, C) -> (..., out_h, out_w, C); fp32 accumulation."""
    h, w = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(_resize_matrix(h, out_h, align_corners, antialias))
    mw = jnp.asarray(_resize_matrix(w, out_w, align_corners, antialias))
    orig_dtype = x.dtype
    y = jnp.einsum("oh,...hwc->...owc", mh, x.astype(jnp.float32))
    y = jnp.einsum("pw,...owc->...opc", mw, y)
    return y.astype(orig_dtype)


def upsample_nearest_2x(x):
    """x: (..., H, W, C) -> (..., 2H, 2W, C) by pixel duplication."""
    x = jnp.repeat(x, 2, axis=-3)
    x = jnp.repeat(x, 2, axis=-2)
    return x


def upsample2x_conv3x3(x, kernel, bias, return_stats: bool = False):
    """conv3x3_SAME(nearest_2x(x)) as ONE input-dilated conv.

    Nearest-2x is a stride-2 transposed conv with a 2x2 box kernel, and
    convolution is associative, so the chain folds into a single
    lhs-dilated conv with the 4x4 composite kernel K = w (*) box —
    2.25x fewer MACs and no 4x-materialized intermediate. Measured on
    v5e: 1.5-2.3x faster than upsample-then-conv at every UNet/decoder
    upsample shape. Numerically identical (the composite taps are exact
    partial sums of w).

    x: (N, H, W, C); kernel: (3, 3, C, Cout) conv weights; -> (N, 2H,
    2W, Cout).
    """
    p = ((0, 0), (0, 0))
    k4 = (jnp.pad(kernel, ((0, 1), (0, 1)) + p)
          + jnp.pad(kernel, ((1, 0), (0, 1)) + p)
          + jnp.pad(kernel, ((0, 1), (1, 0)) + p)
          + jnp.pad(kernel, ((1, 0), (1, 0)) + p))
    y = jax.lax.conv_general_dilated(
        x, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias.astype(y.dtype)
    if return_stats:
        # inline per-sample (N, C) sums fuse into the conv epilogue —
        # the consumer's GroupNorm costs no pass (ops/norms)
        s1 = jnp.sum(y, axis=(1, 2), dtype=jnp.float32)
        s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(1, 2))
        return y, s1, s2
    return y


def center_crop_resize(x, out_h: int, out_w: int):
    """Resize-shorter-side + center crop, the CLI's image loading transform
    (`scripts/evaluation/inference.py:65-69`)."""
    h, w = x.shape[-3], x.shape[-2]
    scale = max(out_h / h, out_w / w)
    rh, rw = round(h * scale), round(w * scale)
    y = resize_bicubic(x, rh, rw, align_corners=False, antialias=True)
    top = (rh - out_h) // 2
    left = (rw - out_w) // 2
    return y[..., top:top + out_h, left:left + out_w, :]
