"""ops/stats.channel_sums vs direct reductions (XLA + interpret Pallas)."""

import jax
import jax.numpy as jnp
import numpy as np

from tooncrafter_tpu.ops import stats as st


def _ref(x):
    axes = tuple(range(1, x.ndim - 1))
    return (jnp.sum(x, axis=axes, dtype=jnp.float32),
            jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axes))


def test_matches_reference_4d_5d():
    for shape in [(2, 8, 8, 64), (2, 3, 4, 4, 128), (3, 7, 64)]:
        x = jax.random.normal(jax.random.PRNGKey(0), shape)
        s1, s2 = st.channel_sums(x)
        r1, r2 = _ref(x)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(r1),
                                   atol=1e-4, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(r2),
                                   atol=1e-4, rtol=1e-5)


def test_pallas_matches(monkeypatch):
    monkeypatch.setattr(st, "_INTERPRET", True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 128))
    assert st._use_kernel(256, 128)
    s1, s2 = st.channel_sums(x)
    r1, r2 = _ref(x)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(r1),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(r2),
                               atol=1e-3, rtol=1e-4)


def test_grad():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 64))

    def loss(x):
        s1, s2 = st.channel_sums(x)
        return jnp.sum(s1 * 0.3 + s2 * 0.7)

    def loss_ref(x):
        r1, r2 = _ref(x)
        return jnp.sum(r1 * 0.3 + r2 * 0.7)

    np.testing.assert_allclose(np.asarray(jax.grad(loss)(x)),
                               np.asarray(jax.grad(loss_ref)(x)),
                               atol=1e-4, rtol=1e-4)


def test_dispatch_envelope(monkeypatch):
    from tooncrafter_tpu.ops import _dispatch
    monkeypatch.setattr(_dispatch, "on_tpu", lambda: True)
    # UNet GN sites: (32, 2560, 320), (32, 640, 640), temporal 5-D
    assert st._use_kernel(2560, 320)
    assert st._use_kernel(640, 640)
    assert st._use_kernel(16 * 2560, 320)
    # full-res decoder GN sites
    assert st._use_kernel(320 * 512, 128)
