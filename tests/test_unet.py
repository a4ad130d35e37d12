"""Structural tests for the 3D UNet denoiser (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np

from tooncrafter_tpu.models.unet import UNetModel

TINY = dict(
    in_channels=8, model_channels=64, out_channels=4, num_res_blocks=1,
    attention_resolutions=(1, 2), channel_mult=(1, 2), num_head_channels=32,
    context_dim=32, temporal_length=4, text_len=5, img_tokens_per_frame=2,
    dropout=0.0,
)


def _inputs(b=1, t=4, hw=(8, 8)):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, *hw, 8))
    ts = jnp.asarray([3.0] * b)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 5 + t * 2, 32))
    fs = jnp.asarray([10.0] * b)
    return x, ts, ctx, fs


def test_unet_shape_and_zero_init_output():
    unet = UNetModel(**TINY)
    x, ts, ctx, fs = _inputs()
    params = unet.init(jax.random.PRNGKey(0), x, ts, ctx, fs)
    y = unet.apply(params, x, ts, ctx, fs)
    assert y.shape == (1, 4, 8, 8, 4)
    # zero-init final conv -> output must be exactly zero at init
    np.testing.assert_allclose(np.asarray(y), 0.0)


def test_unet_context_split_and_fs_effect():
    unet = UNetModel(**TINY)
    x, ts, ctx, fs = _inputs()
    params = unet.init(jax.random.PRNGKey(0), x, ts, ctx, fs)

    # de-zero the output conv so effects are observable
    params = jax.tree_util.tree_map(
        lambda p: jnp.where(jnp.all(p == 0), jnp.ones_like(p) * 0.01, p),
        params)
    y1 = unet.apply(params, x, ts, ctx, fs)
    # per-frame image tokens: perturbing frame-2 tokens must not affect
    # frame 0 through *spatial* attention... (temporal attn does mix,
    # so only check the output changed at all)
    ctx2 = ctx.at[:, 5 + 2 * 2:5 + 3 * 2].add(1.0)
    y2 = unet.apply(params, x, ts, ctx2, fs)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))

    # fs conditioning flows (fps_embedding de-zeroed above)
    y3 = unet.apply(params, x, ts, ctx, fs + 5.0)
    assert not np.allclose(np.asarray(y1), np.asarray(y3))

    # short context (no per-frame split) also accepted
    ctx_short = ctx[:, :5]
    y4 = unet.apply(params, x, ts, ctx_short, fs)
    assert y4.shape == y1.shape


def test_unet_batch_independence():
    unet = UNetModel(**TINY)
    x, ts, ctx, fs = _inputs(b=2)
    params = unet.init(jax.random.PRNGKey(0), x, ts, ctx, fs)
    params = jax.tree_util.tree_map(
        lambda p: jnp.where(jnp.all(p == 0), jnp.ones_like(p) * 0.01, p),
        params)
    y = unet.apply(params, x, ts, ctx, fs)
    y0 = unet.apply(params, x[:1], ts[:1], ctx[:1], fs[:1])
    np.testing.assert_allclose(np.asarray(y[:1]), np.asarray(y0),
                               atol=1e-4, rtol=1e-4)


def test_unet_cfg_groups_stem_sharing_identical():
    """cfg_groups=n (sampling's CFG batching contract: identical x/ts/fs,
    per-branch context) must reproduce the plain forward exactly — the
    shared stem is a pure dedup, not an approximation."""
    unet = UNetModel(**TINY)
    x, ts, ctx, fs = _inputs(b=2)  # 2 clips
    params = unet.init(jax.random.PRNGKey(0), x, ts, ctx, fs)
    params = jax.tree_util.tree_map(
        lambda p: jnp.where(jnp.all(p == 0), jnp.ones_like(p) * 0.01, p),
        params)
    # build the CFG batch exactly like sampling/ddim.py: branches tiled
    # over the batch axis, contexts differing per branch
    ctx_uc = jnp.zeros_like(ctx)
    xin = jnp.tile(x, (2, 1, 1, 1, 1))
    tsin = jnp.tile(ts, (2,))
    fsin = jnp.tile(fs, (2,))
    ctxin = jnp.concatenate([ctx_uc, ctx], axis=0)
    y_plain = unet.apply(params, xin, tsin, ctxin, fsin)
    y_shared = unet.apply(params, xin, tsin, ctxin, fsin, cfg_groups=2)
    np.testing.assert_array_equal(np.asarray(y_plain), np.asarray(y_shared))
