"""Fused GN->SiLU->conv3x3 (ops/spatial_conv) vs the unfused reference."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.models.unet import UNetResBlock
from tooncrafter_tpu.ops import spatial_conv as sc
from tooncrafter_tpu.ops.norms import gn_affine, group_norm
from tooncrafter_tpu.ops.spatial_conv import gn_silu_conv3x3


def _ref(x, scale, bias, kernel, cbias, res=None, silu=True):
    z = group_norm(x, scale, bias, num_groups=32, eps=1e-5)
    if silu:
        z = jax.nn.silu(z)
    y = jax.lax.conv_general_dilated(
        z, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + cbias
    return y if res is None else y + res


def _mats(key, n=2, h=8, w=8, cin=64, cout=64):
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (n, h, w, cin))
    scale = jax.random.normal(ks[1], (cin,)) * 0.2 + 1.0
    bias = jax.random.normal(ks[2], (cin,)) * 0.1
    kernel = jax.random.normal(ks[3], (3, 3, cin, cout)) * 0.05
    cbias = jax.random.normal(ks[4], (cout,)) * 0.1
    res = jax.random.normal(ks[5], (n, h, w, cout))
    return x, scale, bias, kernel, cbias, res


@pytest.mark.parametrize("use_res", [False, True])
def test_matches_unfused(use_res):
    x, scale, bias, kernel, cbias, res = _mats(jax.random.PRNGKey(0))
    aff = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
    got = gn_silu_conv3x3(x, aff, kernel, cbias,
                          residual=res if use_res else None)
    ref = _ref(x, scale, bias, kernel, cbias, res if use_res else None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_kernel_matches_xla():
    x, scale, bias, kernel, cbias, res = _mats(jax.random.PRNGKey(1))
    aff = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
    ref = sc._xla_impl(x, aff[0], aff[1], kernel, cbias, res, True, False)
    old = sc._INTERPRET
    sc._INTERPRET = True
    try:
        assert sc._use_kernel(8, 8, 64, 64)
        got = sc._pallas_fused_conv(x, aff[0], aff[1], kernel, cbias,
                                    res, True, False)
    finally:
        sc._INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_shift_fold_matches_materialized_add():
    """gn_affine(shift=e) on x == plain GN stats of (x + e)."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (3, 8, 8, 64))
    e = jax.random.normal(jax.random.PRNGKey(3), (3, 64))
    scale = jnp.ones((64,)) * 1.3
    bias = jnp.ones((64,)) * 0.2
    a, b = gn_affine(x, scale, bias, num_groups=32, eps=1e-5, shift=e)
    got = x * a[:, None, None] + b[:, None, None]
    ref = group_norm(x + e[:, None, None], scale, bias,
                     num_groups=32, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_grad_flows():
    x, scale, bias, kernel, cbias, res = _mats(jax.random.PRNGKey(4))

    def loss(kernel, x):
        aff = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
        return jnp.sum(gn_silu_conv3x3(x, aff, kernel, cbias,
                                       residual=res) ** 2)

    gk, gx = jax.grad(loss, argnums=(0, 1))(kernel, x)
    gk_ref, gx_ref = jax.grad(
        lambda k, x: jnp.sum(_ref(x, scale, bias, k, cbias, res) ** 2),
        argnums=(0, 1))(kernel, x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-3, rtol=1e-3)


def test_resblock_fused_path_matches_reference_composition():
    """UNetResBlock's fused inference path == hand-composed unfused math
    on the same params (incl. temb-shift fold and skip epilogue)."""
    mod = UNetResBlock(out_channels=64, dropout=0.5)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 32))
    emb = jax.random.normal(jax.random.PRNGKey(6), (2, 128))
    params = mod.init(jax.random.PRNGKey(7), x, emb, 2, True)["params"]
    # de-zero out_conv so the second fused conv is observable
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params)
    got = mod.apply({"params": params}, x, emb, 2, True)

    p = params
    h = jax.nn.silu(group_norm(x, p["in_norm"]["weight"],
                               p["in_norm"]["bias"], 32, 1e-5))
    h = jax.lax.conv_general_dilated(
        h, p["in_conv"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["in_conv"]["bias"]
    e = jax.nn.silu(emb) @ p["emb_proj"]["kernel"] + p["emb_proj"]["bias"]
    h = h + e[:, None, None, :]
    h2 = jax.nn.silu(group_norm(h, p["out_norm"]["weight"],
                                p["out_norm"]["bias"], 32, 1e-5))
    h2 = jax.lax.conv_general_dilated(
        h2, p["out_conv"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["out_conv"]["bias"]
    skip = x @ p["skip"]["kernel"] + p["skip"]["bias"]
    ref = skip + h2
    np.testing.assert_allclose(np.asarray(got[..., :64]), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_temporal_conv_grad():
    from tooncrafter_tpu.ops.temporal_conv import TemporalConv3
    mod = TemporalConv3(64)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 4, 4, 64))
    params = mod.init(jax.random.PRNGKey(9), x)

    def loss(params, x):
        return jnp.sum(mod.apply(params, x) ** 2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    ref_mod = nn.Conv(64, (3, 1, 1))
    gp_ref, gx_ref = jax.grad(
        lambda p, x: jnp.sum(ref_mod.apply(p, x) ** 2),
        argnums=(0, 1))(params, x)
    kp = gp["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(kp),
                               np.asarray(gp_ref["params"]["kernel"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-4, rtol=1e-4)


def test_upsample_conv_matches_unfolded():
    """UpsampleConv2x == nearest_2x -> nn.Conv on the same params."""
    from tooncrafter_tpu.ops.resize import upsample_nearest_2x
    from tooncrafter_tpu.ops.spatial_conv import UpsampleConv2x

    x = jax.random.normal(jax.random.PRNGKey(10), (2, 5, 6, 16))
    ref_mod = nn.Conv(16, (3, 3))
    params = ref_mod.init(jax.random.PRNGKey(11), upsample_nearest_2x(x))
    ref = ref_mod.apply(params, upsample_nearest_2x(x))
    got = UpsampleConv2x(16).apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_upsample_conv_grad_matches():
    from tooncrafter_tpu.ops.resize import upsample_nearest_2x
    from tooncrafter_tpu.ops.spatial_conv import UpsampleConv2x

    x = jax.random.normal(jax.random.PRNGKey(12), (1, 4, 4, 8))
    mod = UpsampleConv2x(8)
    params = mod.init(jax.random.PRNGKey(13), x)
    ref_mod = nn.Conv(8, (3, 3))

    gp, gx = jax.grad(
        lambda p, x: jnp.sum(mod.apply(p, x) ** 2), argnums=(0, 1))(params, x)
    gp_r, gx_r = jax.grad(
        lambda p, x: jnp.sum(ref_mod.apply(p, upsample_nearest_2x(x)) ** 2),
        argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gp["params"]["kernel"]),
                               np.asarray(gp_r["params"]["kernel"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)


def test_stats_epilogue_matches_direct_sums():
    from tooncrafter_tpu.ops.norms import gn_affine_from_stats

    x, scale, bias, kernel, cbias, res = _mats(jax.random.PRNGKey(20))
    aff = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
    y, s1, s2 = gn_silu_conv3x3(x, aff, kernel, cbias, residual=res,
                                return_stats=True)
    y_ref = gn_silu_conv3x3(x, aff, kernel, cbias, residual=res)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1),
                               np.asarray(jnp.sum(y, axis=(1, 2))),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2),
                               np.asarray(jnp.sum(y ** 2, axis=(1, 2))),
                               atol=1e-4, rtol=1e-5)
    # the affine built from the epilogue == the affine built from y
    a1, b1 = gn_affine_from_stats(s1, s2, y.shape[1] * y.shape[2],
                                  scale, bias, 32, 1e-5)
    a2, b2 = gn_affine(y, scale, bias, 32, 1e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               atol=1e-5, rtol=1e-5)


def test_stats_epilogue_pallas_matches(monkeypatch):
    x, scale, bias, kernel, cbias, res = _mats(jax.random.PRNGKey(21))
    aff = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
    ref = sc._xla_impl(x, aff[0], aff[1], kernel, cbias, res, True, True)
    monkeypatch.setattr(sc, "_INTERPRET", True)
    got = sc._pallas_fused_conv(x, aff[0], aff[1], kernel, cbias, res,
                                True, True)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-3, rtol=1e-3)


def test_resblock_stats_chain_matches_unchained():
    """UNetResBlock (incl. 4-conv temporal stack) with the stats chain ==
    a fully hand-composed reference that recomputes every GN from the
    actual activations — an independent check of the chained statistics,
    the temb-shift fold, and the folded residuals."""
    from tooncrafter_tpu.ops.temporal_conv import TemporalConv3  # noqa: F401

    mod = UNetResBlock(out_channels=64, dropout=0.0, use_temporal_conv=True)
    t = 2
    x = jax.random.normal(jax.random.PRNGKey(22), (4, 8, 8, 64))
    emb = jax.random.normal(jax.random.PRNGKey(23), (4, 128))
    params = mod.init(jax.random.PRNGKey(24), x, emb, t, True)["params"]
    # de-zero every conv (incl. the zero-init out_conv and the 5-D
    # temporal kernels) so every chained stage is observable
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim >= 4 else p, params)
    got = mod.apply({"params": params}, x, emb, t, True)

    def conv2d(h, p):
        return jax.lax.conv_general_dilated(
            h, p["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]

    def tconv(h5, p):
        # nn.Conv((3,1,1)) on (B,T,H,W,C)
        return jax.lax.conv_general_dilated(
            h5.reshape(h5.shape[:2] + (-1, h5.shape[-1])),
            p["kernel"][:, 0], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")
        ).reshape(h5.shape[:-1] + (p["kernel"].shape[-1],)) + p["bias"]

    def gnsilu(h, p):
        return jax.nn.silu(group_norm(h, p["weight"], p["bias"], 32, 1e-5))

    p = params
    h = conv2d(gnsilu(x, p["in_norm"]), p["in_conv"])
    e = jax.nn.silu(emb) @ p["emb_proj"]["kernel"] + p["emb_proj"]["bias"]
    h = h + e[:, None, None, :]
    h = conv2d(gnsilu(h, p["out_norm"]), p["out_conv"])
    ref = x + h  # out_channels == cin -> identity skip
    # temporal stack: 4x (GN+SiLU+tconv), residual at the end
    tp = p["temporal_conv"]
    h5 = ref.reshape((2, t) + ref.shape[1:])
    hh = h5
    for i in range(1, 5):
        hh = tconv(gnsilu(hh, tp[f"norm{i}"]), tp[f"conv{i}"])
    ref5 = h5 + hh
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref5.reshape(ref.shape)),
                               atol=2e-4, rtol=2e-4)


def test_ktiled_kernel_matches(monkeypatch):
    """cin-tiled (k-grid) Pallas path == XLA, with residual + stats."""
    monkeypatch.setattr(sc, "_INTERPRET", True)
    x, scale, bias, kernel, cbias, res = _mats(jax.random.PRNGKey(30),
                                               n=2, h=8, w=8,
                                               cin=256, cout=64)
    monkeypatch.setattr(sc, "_VMEM_BUDGET", 1200 * 1024)  # force k-tiling
    ck, ct = sc._pick_tiles(8, 8, 256, 64)
    assert ck == 128 and ck < 256, (ck, ct)
    aff = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
    got = sc._pallas_fused_conv(x, aff[0], aff[1], kernel, cbias, res,
                                True, True)
    ref = sc._xla_impl(x, aff[0], aff[1], kernel, cbias, res, True, True)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-3, rtol=1e-3)


def test_resblock_fused_path_grad_under_remat():
    """jax.grad through the fused inference-style path (dropout=0.0 in
    training => stats chains + custom_vjp epilogues + temb fold), wrapped
    in nn.remat like the UNet does — the combination a user hits with a
    dropout: 0.0 training config."""
    import flax.linen as fnn

    cls = fnn.remat(UNetResBlock, static_argnums=(3, 4))
    mod = cls(out_channels=32, dropout=0.0, use_temporal_conv=True)
    x = jax.random.normal(jax.random.PRNGKey(30), (4, 8, 8, 32))
    emb = jax.random.normal(jax.random.PRNGKey(31), (4, 64))
    rngs = {"params": jax.random.PRNGKey(32),
            "dropout": jax.random.PRNGKey(33)}
    params = mod.init(rngs, x, emb, 2, False)
    # de-zero the zero-init convs so gradient paths are observable
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim >= 4 else p, params)

    def loss(params, x):
        return jnp.sum(mod.apply(params, x, emb, 2, False,
                                 rngs={"dropout": jax.random.PRNGKey(34)})
                       ** 2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    leaves = jax.tree_util.tree_leaves(gp)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert bool(jnp.all(jnp.isfinite(gx)))
    # in_conv kernel must receive signal through the chained path
    gk = gp["params"]["in_conv"]["kernel"]
    assert float(jnp.max(jnp.abs(gk))) > 0
