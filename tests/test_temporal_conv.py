"""TemporalConv3 (shifted-matmul + Pallas) vs nn.Conv((3,1,1)) reference."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.ops import temporal_conv as tc
from tooncrafter_tpu.ops.temporal_conv import TemporalConv3


@pytest.mark.parametrize("shape,cout", [
    ((1, 4, 8, 16, 128), 128),
    ((2, 3, 4, 4, 64), 32),
])
def test_matches_nn_conv(shape, cout):
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    ref_mod = nn.Conv(cout, (3, 1, 1))
    new_mod = TemporalConv3(cout)
    params = ref_mod.init(jax.random.PRNGKey(1), x)
    ref = ref_mod.apply(params, x)
    got = new_mod.apply(params, x)  # identical param tree
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_kernel_matches_fallback():
    shape, cout = (1, 8, 16, 16, 128), 128
    x = jax.random.normal(jax.random.PRNGKey(2), shape)
    mod = TemporalConv3(cout)
    params = mod.init(jax.random.PRNGKey(3), x)
    ref = mod.apply(params, x)
    old = tc._INTERPRET
    tc._INTERPRET = True
    try:
        assert tc._use_kernel(8, 256, 128, 128)
        got = mod.apply(params, x)
    finally:
        tc._INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dispatch_conditions():
    assert not tc._use_kernel(64, 2048, 128, 128)   # T too long
    assert not tc._use_kernel(16, 2048, 128, 256)   # cin != cout
    assert not tc._use_kernel(16, 100, 128, 128)    # no tile divides P


def test_silu_without_affine_consistent_across_backends():
    """silu=True, affine=None must mean SiLU(x) -> conv on BOTH backends
    (the Pallas path synthesizes an identity affine, so the XLA form has
    to apply SiLU independently of the affine)."""
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 16, 16, 128))
    w = jax.random.normal(jax.random.PRNGKey(8), (3, 128, 128)) * 0.05
    b = jnp.zeros((128,))
    ref = tc.temporal_conv3(jax.nn.silu(x), w, b)
    got_xla = tc._xla_tconv(x, w, b, None, None, None, None, True, False)
    np.testing.assert_allclose(np.asarray(got_xla), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    old = tc._INTERPRET
    tc._INTERPRET = True
    try:
        got_k = tc.temporal_conv3(x, w, b, silu=True)
    finally:
        tc._INTERPRET = old
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_prologue_matches_unfused():
    """temporal_conv3 with a folded GN+SiLU prologue == GN -> SiLU -> conv."""
    from tooncrafter_tpu.ops.norms import gn_affine, group_norm

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 8, 64))
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 64, 64)) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(6), (64,)) * 0.1
    scale = jnp.ones((64,)) * 1.1
    bias = jnp.ones((64,)) * 0.1
    aff = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
    got = tc.temporal_conv3(x, w, b, affine=aff, silu=True)
    z = jax.nn.silu(group_norm(x, scale, bias, 32, 1e-5))
    ref = tc.temporal_conv3(z, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_prologue_pallas_matches(monkeypatch):
    from tooncrafter_tpu.ops.norms import gn_affine

    x = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 16, 16, 128))
    w = jax.random.normal(jax.random.PRNGKey(8), (3, 128, 128)) * 0.05
    b = jnp.zeros((128,))
    aff = gn_affine(x, jnp.ones((128,)), jnp.zeros((128,)),
                    num_groups=32, eps=1e-5)
    ref = tc.temporal_conv3(x, w, b, affine=aff, silu=True)
    monkeypatch.setattr(tc, "_INTERPRET", True)
    assert tc._use_kernel(8, 256, 128, 128)
    got = tc.temporal_conv3(x, w, b, affine=aff, silu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_prologue_grad():
    from tooncrafter_tpu.ops.norms import gn_affine, group_norm

    x = jax.random.normal(jax.random.PRNGKey(9), (1, 3, 4, 4, 64))
    w = jax.random.normal(jax.random.PRNGKey(10), (3, 64, 64)) * 0.05
    b = jnp.zeros((64,))
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))

    def loss(x, w):
        aff = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
        return jnp.sum(tc.temporal_conv3(x, w, b, affine=aff,
                                         silu=True) ** 2)

    def loss_ref(x, w):
        z = jax.nn.silu(group_norm(x, scale, bias, 32, 1e-5))
        return jnp.sum(tc._xla_tconv(z, w, b, None, None, None, None, False, False) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                               atol=1e-3, rtol=1e-3)


def test_residual_and_stats_epilogue(monkeypatch):
    """Residual + stats epilogues match the composed reference, both XLA
    and (interpret-mode) Pallas."""
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 8, 16, 16, 128))
    res = jax.random.normal(jax.random.PRNGKey(12), (1, 8, 16, 16, 128))
    w = jax.random.normal(jax.random.PRNGKey(13), (3, 128, 128)) * 0.05
    b = jnp.zeros((128,))

    def check():
        y, s1, s2 = tc.temporal_conv3(x, w, b, residual=res,
                                      return_stats=True)
        y_ref = tc.temporal_conv3(x, w, b) + res
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)
        # stats are PER-FRAME (B, T, C) sums over the spatial axes
        assert s1.shape == (y.shape[0], y.shape[1], y.shape[-1])
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(jnp.sum(y, axis=(2, 3))),
            atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(s2), np.asarray(jnp.sum(y ** 2, axis=(2, 3))),
            atol=1e-3, rtol=1e-4)

    check()                                   # XLA fallback
    monkeypatch.setattr(tc, "_INTERPRET", True)
    assert tc._use_kernel(8, 256, 128, 128)
    check()                                   # Pallas interpret


def test_out_scale_epilogue(monkeypatch):
    """out_scale rides the epilogue: x + a*stack == the dual-ref alpha
    merge a*(x+stack) + (1-a)*x (autoencoder_dualref.py:892-911), both
    XLA and (interpret-mode) Pallas; gradient flows to the scale."""
    x = jax.random.normal(jax.random.PRNGKey(21), (1, 8, 16, 16, 128))
    w = jax.random.normal(jax.random.PRNGKey(22), (3, 128, 128)) * 0.05
    b = jnp.full((128,), 0.1)
    a = jnp.float32(0.37)

    def check():
        y, s1, s2 = tc.temporal_conv3(x, w, b, residual=x, out_scale=a,
                                      return_stats=True)
        stack = tc.temporal_conv3(x, w, b)
        merged = a * (x + stack) + (1 - a) * x
        np.testing.assert_allclose(np.asarray(y), np.asarray(merged),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(jnp.sum(y, axis=(2, 3))),
            atol=1e-3, rtol=1e-4)

    check()                                   # XLA fallback
    monkeypatch.setattr(tc, "_INTERPRET", True)
    assert tc._use_kernel(8, 256, 128, 128)
    check()                                   # Pallas interpret
    monkeypatch.setattr(tc, "_INTERPRET", False)

    ga = jax.grad(lambda s: jnp.sum(
        tc.temporal_conv3(x, w, b, residual=x, out_scale=s)))(a)
    ga_ref = jax.grad(lambda s: jnp.sum(
        x + s * tc.temporal_conv3(x, w, b)))(a)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref),
                               rtol=1e-4)
