"""Fused dual cross-attention kernel (ops/cross_attention, parked) vs
the production two-attention XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.ops import cross_attention as ca


def _mats(key, b=2, sq=512, lt=77, li=16, c=128):
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, sq, c))
    kt = jax.random.normal(ks[1], (b, lt, c))
    vt = jax.random.normal(ks[2], (b, lt, c))
    ki = jax.random.normal(ks[3], (b, li, c))
    vi = jax.random.normal(ks[4], (b, li, c))
    return q, kt, vt, ki, vi


@pytest.mark.parametrize("sq,c,heads", [(512, 128, 2), (640, 320, 5)])
def test_kernel_matches_xla(sq, c, heads):
    q, kt, vt, ki, vi = _mats(jax.random.PRNGKey(0), sq=sq, c=c)
    s_ip = jnp.float32(0.73)
    ref = ca._xla_dual(q, kt, vt, ki, vi, s_ip, heads, None)
    old = ca._INTERPRET
    ca._INTERPRET = True
    try:
        assert ca.use_kernel(sq, 77, 16, c, heads)
        got = ca._dual_kernel_call(
            q, kt, vt, ki, vi, s_ip.reshape(1, 1), heads,
            (c // heads) ** -0.5, ca._pick_blk(sq))
    finally:
        ca._INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_dispatch_envelope():
    # parked by default off-TPU: no env gate -> XLA path
    assert not ca.use_kernel(512, 77, 16, 128, 2) or ca._INTERPRET
    # head dim must be 64
    old = ca._INTERPRET
    ca._INTERPRET = True
    try:
        assert not ca.use_kernel(512, 77, 16, 128, 4)   # d=32
        assert not ca.use_kernel(513, 77, 16, 128, 2)   # no blk divides
        assert not ca.use_kernel(512, 2000, 16, 128, 2)  # lt too big
    finally:
        ca._INTERPRET = old


def test_gradients_match_xla():
    q, kt, vt, ki, vi = _mats(jax.random.PRNGKey(1), sq=256, li=32)

    def loss_fused(q, kt, vt, ki, vi, s):
        return jnp.sum(
            ca.dual_cross_attention(q, kt, vt, ki, vi, s, 2, None) ** 2)

    def loss_ref(q, kt, vt, ki, vi, s):
        return jnp.sum(ca._xla_dual(q, kt, vt, ki, vi, s, 2, None) ** 2)

    args = (q, kt, vt, ki, vi, jnp.float32(0.3))
    g = jax.grad(loss_fused, argnums=(0, 1, 5))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 5))(*args)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_short_context_pad_is_exact():
    """attention() lane-pads Sk<160 contexts (the UNet's 77-token text
    slice); padded keys get probability 0, so the result matches the
    unpadded form to f32 summation-order noise."""
    from tooncrafter_tpu.ops.attention import (attention,
                                               dot_product_attention)

    b, sq, sk, heads, d = 2, 64, 77, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, sq, heads * d), jnp.float32)
    k = jax.random.normal(ks[1], (b, sk, heads * d), jnp.float32)
    v = jax.random.normal(ks[2], (b, sk, heads * d), jnp.float32)
    ref = dot_product_attention(q.reshape(b, sq, heads, d),
                                k.reshape(b, sk, heads, d),
                                v.reshape(b, sk, heads, d)
                                ).reshape(b, sq, heads * d)
    from tooncrafter_tpu.ops import attention as A
    old = A._PAD_SHORT_KV
    A._PAD_SHORT_KV = True
    try:
        got = attention(q, k, v, heads=heads)
    finally:
        A._PAD_SHORT_KV = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=0)
