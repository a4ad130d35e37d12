"""Fused GroupNorm+SiLU Pallas kernel parity (interpret mode on CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.ops import fused_norms as FN


@pytest.fixture(autouse=True)
def _enable_kernel(monkeypatch):
    monkeypatch.setattr(FN, "_FUSED_GN", True)
    monkeypatch.setattr(FN, "_INTERPRET", True)
    yield


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 320), 32),       # lane-unfriendly C/G = 10
    ((1, 4, 6, 6, 64), 32),     # 5D: stats span T,H,W
    ((2, 16, 16, 128), 32),
])
def test_fused_gn_silu_matches_xla(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
    b = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
    for act in (True, False):
        got = FN.group_norm_silu(x, w, b, groups, 1e-5, act)
        ref = FN._xla_impl(x, w, b, groups, 1e-5, act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5)


def test_fused_gn_gradient_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 128)), jnp.float32)
    w = jnp.ones(128)
    b = jnp.zeros(128)
    g = jax.grad(lambda x_: jnp.sum(
        FN.group_norm_silu(x_, w, b, 32, 1e-5, True) ** 2))(x)
    gr = jax.grad(lambda x_: jnp.sum(
        FN._xla_impl(x_, w, b, 32, 1e-5, True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-4)


def test_disabled_by_default(monkeypatch):
    monkeypatch.setattr(FN, "_FUSED_GN", False)
    monkeypatch.setattr(FN, "_INTERPRET", False)
    x = jnp.ones((1, 4, 4, 64))
    out = FN.group_norm_silu(x, jnp.ones(64), jnp.zeros(64))
    assert out.shape == x.shape  # falls through to the XLA path
