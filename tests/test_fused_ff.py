"""Fused GEGLU feed-forward kernel: numerics, grads, dispatch, wiring.

Interpret-mode runs the real Pallas kernel body on CPU and checks it
against the differentiable XLA form and against the unfused flax
FeedForward path (reference attention.py:51-74 semantics).

Tolerances on kernel-vs-XLA checks are set by the kernel's deg-15 erf
polynomial (|erf err| <= 8.1e-5, amplified by the h half of the gate
product): ~3e-4 in f32. The XLA fallback uses exact gelu, so parity
tests of the full model on CPU are unaffected; in bf16 (the production
compute dtype) the poly error sits ~50x below the rounding of the
gated product.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.ops import fused_ff


def _mk(n, c, mult=4, dtype=jnp.float32, seed=0):
    d = c * mult
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (n, c), dtype)
    w1 = (jax.random.normal(ks[1], (c, 2 * d), dtype)
          / np.sqrt(c)).astype(dtype)
    b1 = jax.random.normal(ks[2], (2 * d,), dtype) * 0.1
    w2 = (jax.random.normal(ks[3], (d, c), dtype)
          / np.sqrt(d)).astype(dtype)
    b2 = jax.random.normal(ks[4], (c,), dtype) * 0.1
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("c,n", [(320, 512), (640, 256)])
def test_kernel_matches_xla(monkeypatch, c, n):
    monkeypatch.setattr(fused_ff, "_INTERPRET", True)
    x, w1, b1, w2, b2 = _mk(n, c)
    got = fused_ff.fused_geglu_ff(x, w1, b1, w2, b2)
    want = fused_ff._xla_ff(x, w1, b1[None], w2, b2[None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=4e-4, rtol=4e-4)


def test_kernel_matches_unfused_module(monkeypatch):
    # the fused path must reproduce GEGLU -> Dense(out) exactly
    # (param tree AND values identical between branches)
    from tooncrafter_tpu.models import unet as U

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 320))
    ff = U.FeedForward(dtype=jnp.float32)
    params = ff.init(jax.random.PRNGKey(2), x)
    want = ff.apply(params, x)

    monkeypatch.setattr(fused_ff, "_INTERPRET", True)
    got = ff.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=4e-4, rtol=4e-4)


def test_param_tree_identical_between_branches(monkeypatch):
    from tooncrafter_tpu.models import unet as U

    x = jnp.zeros((2, 256, 320))
    ff = U.FeedForward(dtype=jnp.float32)
    p_unfused = ff.init(jax.random.PRNGKey(3), x)
    monkeypatch.setattr(fused_ff, "_INTERPRET", True)
    p_fused = ff.init(jax.random.PRNGKey(3), x)
    flat_u = jax.tree_util.tree_leaves_with_path(p_unfused)
    flat_f = jax.tree_util.tree_leaves_with_path(p_fused)
    assert [(jax.tree_util.keystr(k), v.shape) for k, v in flat_u] \
        == [(jax.tree_util.keystr(k), v.shape) for k, v in flat_f]
    for (_, a), (_, b) in zip(flat_u, flat_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grads_flow_through_custom_vjp(monkeypatch):
    monkeypatch.setattr(fused_ff, "_INTERPRET", True)
    x, w1, b1, w2, b2 = _mk(256, 320)

    def loss(x, w1, b1, w2, b2):
        return jnp.sum(fused_ff.fused_geglu_ff(x, w1, b1, w2, b2) ** 2)

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(fused_ff._xla_ff(x, w1, b1[None], w2,
                                        b2[None]) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=4e-3, rtol=1e-3)


def test_dispatch_envelope(monkeypatch):
    monkeypatch.setattr(fused_ff, "_on_tpu", lambda: True)
    # UNet FF sites: spatial/temporal ds1 + ds2 + init_attn
    assert fused_ff._mode(2 * 2560 * 16, 320, 1280, 320) == "resident"
    assert fused_ff._mode(2 * 640 * 16, 640, 2560, 640) == "resident"
    # ds4 (C=1280): weights exceed VMEM -> streamed-chunk kernel
    assert fused_ff._mode(2 * 160 * 16, 1280, 5120, 1280) == "streamed"
    assert fused_ff.use_kernel(2 * 160 * 16, 1280, 5120)
    # mid block (B=2 CFG, 40 tokens x 16 frames): streamed single tile
    assert fused_ff._mode(2 * 40 * 16, 1280, 5120, 1280) == "streamed"
    # non-divisible token counts -> XLA
    assert not fused_ff.use_kernel(100, 320, 1280)
    # CPU -> XLA
    monkeypatch.setattr(fused_ff, "_on_tpu", lambda: False)
    assert not fused_ff.use_kernel(2 * 2560 * 16, 320, 1280)


def test_streamed_kernel_matches_xla(monkeypatch):
    # force the streamed path on a small shape by shrinking the
    # resident budget so _mode picks "streamed"
    monkeypatch.setattr(fused_ff, "_INTERPRET", True)
    monkeypatch.setattr(fused_ff, "_pick_tile",
                        lambda n, c, d, budget=0: 0)
    x, w1, b1, w2, b2 = _mk(512, 256)
    assert fused_ff._mode(512, 256, 1024, 256) == "streamed"
    got = fused_ff.fused_geglu_ff(x, w1, b1, w2, b2)
    want = fused_ff._xla_ff(x, w1, b1[None], w2, b2[None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=4e-4, rtol=4e-4)


def test_streamed_tile_picker():
    # ds4 CFG shape: weights 39 MB stream in chunks, big token tiles
    tn, dk = fused_ff._pick_tile_streamed(5120, 1280, 5120)
    assert tn >= 1280 and 5120 % dk == 0
    # mid block single tile
    tn, dk = fused_ff._pick_tile_streamed(1280, 1280, 5120)
    assert tn == 1280


def _ln_ref(x, w, b, eps=1e-5):
    from tooncrafter_tpu.ops import norms
    return norms.layer_norm(x, w, b, eps)


@pytest.mark.parametrize("streamed", [False, True])
def test_ln_prologue_matches_separate_ln(monkeypatch, streamed):
    monkeypatch.setattr(fused_ff, "_INTERPRET", True)
    if streamed:
        monkeypatch.setattr(fused_ff, "_pick_tile",
                            lambda n, c, d, budget=0: 0)
    x, w1, b1, w2, b2 = _mk(512, 256)
    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    lnw = 1.0 + 0.1 * jax.random.normal(ks[0], (256,))
    lnb = 0.1 * jax.random.normal(ks[1], (256,))
    got = fused_ff.fused_geglu_ff(x, w1, b1, w2, b2, ln_w=lnw, ln_b=lnb)
    want = fused_ff._xla_ff(_ln_ref(x, lnw, lnb), w1, b1[None], w2,
                            b2[None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=4e-4, rtol=4e-4)


def test_ln_grads_match(monkeypatch):
    monkeypatch.setattr(fused_ff, "_INTERPRET", True)
    x, w1, b1, w2, b2 = _mk(256, 320)
    lnw = jnp.ones((320,))
    lnb = jnp.zeros((320,))

    def loss(x, w1, b1, w2, b2, lnw, lnb):
        return jnp.sum(fused_ff.fused_geglu_ff(
            x, w1, b1, w2, b2, ln_w=lnw, ln_b=lnb) ** 2)

    def loss_ref(x, w1, b1, w2, b2, lnw, lnb):
        return jnp.sum(fused_ff._xla_ff(
            _ln_ref(x, lnw, lnb), w1, b1[None], w2, b2[None]) ** 2)

    g = jax.grad(loss, argnums=tuple(range(7)))(x, w1, b1, w2, b2,
                                                lnw, lnb)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(x, w1, b1, w2, b2,
                                                     lnw, lnb)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=4e-3, rtol=1e-3)


def test_bf16_path(monkeypatch):
    monkeypatch.setattr(fused_ff, "_INTERPRET", True)
    x, w1, b1, w2, b2 = _mk(256, 320, dtype=jnp.bfloat16)
    got = fused_ff.fused_geglu_ff(x, w1, b1, w2, b2)
    want = fused_ff._xla_ff(x, w1, b1[None], w2, b2[None])
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)
