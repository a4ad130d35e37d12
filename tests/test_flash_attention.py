"""Flash attention forward + blockwise backward kernel parity
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.ops import flash_attention as fa
from tooncrafter_tpu.ops.attention import dot_product_attention


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fa, "_INTERPRET", True)
    yield


def test_forward_matches_reference():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 1024, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1536, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 1536, 2, 64)), jnp.float32)
    out = fa.flash_attention(q, k, v)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_backward_matches_reference():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 1024, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1280, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 1280, 2, 64)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(1, 1024, 2, 64)), jnp.float32)

    f = lambda *a: jnp.sum(fa.flash_attention(*a) * g)
    r = lambda *a: jnp.sum(dot_product_attention(*a) * g)
    got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_small_shapes_fall_back_to_xla():
    # sequences below the kernel threshold route through XLA and still
    # differentiate
    q = jnp.ones((1, 64, 2, 16))
    g = jax.grad(lambda q_: jnp.sum(fa.flash_attention(q_, q_, q_) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()


def test_block_picker():
    assert fa._pick_block(2560) == 1280
    assert fa._pick_block(10240) == 1280
    assert fa._pick_block(2561) == 0
    assert not fa._use_kernel(2561, 2561, 64)
