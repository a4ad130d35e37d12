"""Pallas temporal-attention kernel vs the einsum reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.ops import temporal_attention as ta
from tooncrafter_tpu.ops.attention import temporal_attention_inplace


def _ref(q, k, v, heads, scale):
    b, p, t, inner = q.shape
    d = inner // heads
    qh = q.reshape(b, p, t, heads, d).astype(jnp.float32)
    kh = k.reshape(b, p, t, heads, d).astype(jnp.float32)
    vh = v.reshape(b, p, t, heads, d).astype(jnp.float32)
    logits = jnp.einsum("bptnd,bpsnd->bpnts", qh, kh) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bpnts,bpsnd->bptnd", probs, vh)
    return out.reshape(b, p, t, inner)


@pytest.mark.parametrize("shape,heads", [
    ((2, 128, 16, 128), 2),
    ((1, 160, 16, 64), 1),     # ds=4-like P
    ((1, 256, 4, 256), 4),     # short T
])
def test_kernel_matches_reference(shape, heads):
    b, p, t, inner = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    d = inner // heads
    ref = _ref(q, k, v, heads, d ** -0.5)
    old = ta._INTERPRET
    ta._INTERPRET = True
    try:
        got = ta.temporal_attention_ptc(q, k, v, heads=heads,
                                        scale=d ** -0.5)
    finally:
        ta._INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_dispatch_conditions():
    # masked / rel-pos / tiny-P shapes must NOT take the kernel
    assert not ta.use_kernel(16, 2560, 64, mask=jnp.ones((16, 16), bool))
    assert not ta.use_kernel(16, 2560, 64, rel_k=jnp.zeros((16, 16, 64)))
    assert not ta.use_kernel(16, 40, 64)    # mid-block P — einsum path
    assert not ta.use_kernel(64, 2560, 64)  # T too long to unroll
    assert not ta.use_kernel(16, 2560, 40)  # init_attn head_dim


def test_temporal_transformer_fast_path_matches_einsum():
    """Full TemporalTransformer: (B,P,T,C) kernel layout vs the in-place
    einsum layout, same params."""
    from tooncrafter_tpu.models.unet import TemporalTransformer

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16, 128),
                          jnp.float32)
    mod = TemporalTransformer(heads=2, dim_head=64)
    params = mod.init(jax.random.PRNGKey(1), x)
    ref = mod.apply(params, x)
    old = ta._INTERPRET
    ta._INTERPRET = True
    try:
        assert ta.use_kernel(8, 128, 64)
        got = mod.apply(params, x)
    finally:
        ta._INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_block_kernel_matches_module_chain():
    """fused LN+QKV+attn+out+residual kernel vs the explicit chain."""
    from tooncrafter_tpu.ops import norms

    b, p, t, c = 1, 128, 16, 128
    heads, d = 2, 64
    inner = heads * d
    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    x = jax.random.normal(ks[0], (b, p, t, c), jnp.float32)
    lnw = jax.random.normal(ks[1], (c,), jnp.float32) * 0.1 + 1.0
    lnb = jax.random.normal(ks[2], (c,), jnp.float32) * 0.1
    wq = jax.random.normal(ks[3], (c, inner), jnp.float32) * c ** -0.5
    wk = jax.random.normal(ks[4], (c, inner), jnp.float32) * c ** -0.5
    wv = jax.random.normal(ks[5], (c, inner), jnp.float32) * c ** -0.5
    wo = jax.random.normal(ks[6], (inner, c), jnp.float32) * inner ** -0.5
    bo = jax.random.normal(ks[7], (c,), jnp.float32) * 0.1

    z = norms.layer_norm(x, lnw, lnb)
    ref = x + (jnp.dot(_ref(jnp.dot(z, wq), jnp.dot(z, wk),
                            jnp.dot(z, wv), heads, d ** -0.5), wo) + bo)
    old = ta._INTERPRET
    ta._INTERPRET = True
    try:
        assert ta.use_fused_kernel(t, p, d, c, inner)
        got = ta.fused_temporal_attn(x, (lnw, lnb), wq, wk, wv, wo, bo,
                                     heads=heads, scale=d ** -0.5)
    finally:
        ta._INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_fused_block_gradients_match_xla():
    from tooncrafter_tpu.ops import temporal_attention as ta2

    b, p, t, c = 1, 128, 4, 64
    heads, d = 1, 64
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(b, p, t, c)), jnp.float32)
    lnw = jnp.ones((c,)); lnb = jnp.zeros((c,))
    w = jnp.asarray(rng.normal(size=(c, c)) * c ** -0.5, jnp.float32)
    bo = jnp.zeros((c,))
    ta2._INTERPRET = True
    try:
        f = lambda v: jnp.sum(ta2.fused_temporal_attn(
            v, (lnw, lnb), w, w, w, w, bo, heads=heads,
            scale=d ** -0.5) ** 2)
        r = lambda v: jnp.sum(ta2._xla_fused_tattn(
            v, lnw, lnb, jnp.concatenate([w, w, w], axis=1), w, bo,
            heads, d ** -0.5, 1e-5) ** 2)
        got = jax.grad(f)(x)
        ref = jax.grad(r)(x)
    finally:
        ta2._INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_kernel_gradients_match_xla():
    # jax.grad must survive the Pallas forward (custom_vjp recompute);
    # before the vjp existed, an on-TPU training step died here
    import numpy as np
    ta._INTERPRET = True
    try:
        q = jnp.asarray(np.random.default_rng(7).normal(
            size=(1, 128, 16, 64)), jnp.float32)
        f = lambda t: jnp.sum(
            ta.temporal_attention_ptc(t, t, t, heads=1, scale=0.125) ** 2)
        r = lambda t: jnp.sum(
            ta._xla_ptc(t, t, t, 1, 0.125) ** 2)
        got = jax.grad(f)(q)
        ref = jax.grad(r)(q)
    finally:
        ta._INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_pair_kernel_matches_two_stages():
    """attn1+attn2 pair kernel == two sequential fused sub-blocks."""
    b, p, t, c = 1, 128, 16, 128
    heads, d = 2, 64
    inner = heads * d
    ks = jax.random.split(jax.random.PRNGKey(5), 13)
    x = jax.random.normal(ks[0], (b, p, t, c), jnp.float32)

    def mk(i):
        lnw = jax.random.normal(ks[i], (c,), jnp.float32) * 0.1 + 1.0
        lnb = jax.random.normal(ks[i + 1], (c,), jnp.float32) * 0.1
        wq = jax.random.normal(ks[i + 2], (c, inner)) * c ** -0.5
        wk = jax.random.normal(ks[i + 3], (c, inner)) * c ** -0.5
        wv = jax.random.normal(ks[i + 4], (c, inner)) * c ** -0.5
        wo = jax.random.normal(ks[i + 5], (inner, c)) * inner ** -0.5
        return ((lnw, lnb), wq, wk, wv, wo, jnp.zeros((c,)))

    a1, a2 = mk(1), mk(7)
    old = ta._INTERPRET
    ta._INTERPRET = True
    try:
        assert ta.use_pair_kernel(t, p, d, c, inner)
        y = ta.fused_temporal_attn(x, *a1, heads=heads, scale=d ** -0.5)
        ref = ta.fused_temporal_attn(y, *a2, heads=heads, scale=d ** -0.5)
        got = ta.fused_temporal_attn_pair(x, a1, a2, heads=heads,
                                          scale=d ** -0.5)
    finally:
        ta._INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_fused_pair_gradients_match_xla():
    b, p, t, c = 1, 128, 4, 64
    heads, d = 1, 64
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(b, p, t, c)), jnp.float32)
    lnw = jnp.ones((c,)); lnb = jnp.zeros((c,))
    w = jnp.asarray(rng.normal(size=(c, c)) * c ** -0.5, jnp.float32)
    bo = jnp.zeros((c,))
    a = ((lnw, lnb), w, w, w, w, bo)
    ta._INTERPRET = True
    try:
        f = lambda v: jnp.sum(ta.fused_temporal_attn_pair(
            v, a, a, heads=heads, scale=d ** -0.5) ** 2)

        def r(v):
            wqkv = jnp.concatenate([w, w, w], axis=1)
            y = ta._xla_fused_tattn(v, lnw, lnb, wqkv, w, bo,
                                    heads, d ** -0.5, 1e-5)
            return jnp.sum(ta._xla_fused_tattn(
                y, lnw, lnb, wqkv, w, bo, heads, d ** -0.5, 1e-5) ** 2)

        got = jax.grad(f)(x)
        ref = jax.grad(r)(x)
    finally:
        ta._INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)
