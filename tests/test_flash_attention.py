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


def test_single_pass_picker():
    # UNet self-attn shapes take the single-pass kernel
    assert fa._single_pass_blk(2560, 2560, 64) == 1280
    assert fa._single_pass_blk(640, 640, 64) == 640
    assert fa._single_pass_blk(160, 160, 64) == 160
    # dual-ref fusion site (Sk = 2*Sq, up to 20480) stays two-pass
    assert fa._single_pass_blk(10240, 20480, 64) == 0
    assert fa._single_pass_blk(2560, 5120, 64) == 0


def test_two_pass_forward_matches_reference(monkeypatch):
    # force the online two-pass kernel even at a single-pass shape
    monkeypatch.setattr(fa, "_single_pass_blk", lambda *a: 0)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 1024, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1536, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 1536, 2, 64)), jnp.float32)
    out = fa.flash_attention(q, k, v)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_multihead_matches_reference():
    rng = np.random.default_rng(4)
    b, s, c, heads = 2, 256, 128, 2
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * c)), jnp.float32)
    assert fa._mh_blk(s, s, c, heads) > 0
    out = fa.flash_attention_packed(qkv, heads)
    c_ = qkv.shape[-1] // 3
    ref = fa._xla_mh(qkv[..., :c_], qkv[..., c_:2*c_], qkv[..., 2*c_:],
                     heads, (c // heads) ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_multihead_backward():
    rng = np.random.default_rng(5)
    qkv = jnp.asarray(rng.normal(size=(1, 256, 384)), jnp.float32)
    f = lambda t: jnp.sum(fa.flash_attention_packed(t, 2) ** 2)
    r = lambda t: jnp.sum(fa._xla_mh(t[..., :128], t[..., 128:256],
                                     t[..., 256:], 2, 64 ** -0.5) ** 2)
    got = jax.grad(f)(qkv)
    ref = jax.grad(r)(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_packed_picker_envelope():
    # model shapes: (S, C, H) at ds1/ds2/ds4 all take the kernel
    assert fa._mh_blk(2560, 2560, 320, 5) > 0
    assert fa._mh_blk(640, 640, 640, 10) > 0
    assert fa._mh_blk(160, 160, 1280, 20) > 0
    # the 1024-model ds1 site (S=9216) is in the envelope since the
    # round-4 sweep (bq=256 beat the two-pass fallback); beyond it
    # falls back
    assert fa._mh_blk(9216, 9216, 320, 5) == 256
    # advisor r4: intermediate lengths in (4096, 9216) are NOT swept —
    # they take the measured two-pass fallback, not the 9216 extrapolation
    assert fa._mh_blk(4608, 4608, 320, 5) == 0
    assert fa._mh_blk(6144, 6144, 320, 5) == 0
    assert fa._mh_blk(8192, 8192, 320, 5) == 0
    # non-64 head dim or huge KV fall back
    assert fa._mh_blk(2560, 2560, 320, 4) == 0
    assert fa._mh_blk(10240, 10240, 320, 5) == 0
    # cross-attention (sq != sk) is outside the measured envelope
    assert fa._mh_blk(2560, 77, 320, 5) == 0
    assert fa._mh_blk(2560, 256, 320, 5) == 0


def test_mh_cross_entry_matches_xla():
    # sq != sk stays off the kernel but the public entry is correct
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.normal(size=(2, 256, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 64, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 64, 128)), jnp.float32)
    out = fa.flash_attention_mh(q, k, v, 2)
    ref = fa._xla_mh(q, k, v, 2, 64 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_mh_kernel_cross_shape_correct():
    # the raw kernel itself handles sq != sk (K/V blocks sized by sk)
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(2, 256, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 512, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 512, 128)), jnp.float32)
    out = fa._flash_mh(q, k, v, 2, 64 ** -0.5, 128)
    ref = fa._xla_mh(q, k, v, 2, 64 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_single_pass_lse_matches_two_pass():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(2, 256, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 256, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 256, 64)), jnp.float32)
    o1, lse1 = fa._flash_bh_single(q, k, v, 0.125, 128)
    blk = fa._pick_block(256)
    assert blk
    import contextlib
    with contextlib.ExitStack() as st:
        # route with_lse through the two-pass body
        orig = fa._single_pass_blk
        fa._single_pass_blk = lambda *a: 0
        st.callback(lambda: setattr(fa, "_single_pass_blk", orig))
        o2, lse2 = fa._flash_bh_with_lse(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse1), np.asarray(lse2),
                               atol=1e-5)


def test_packed_direct_bind_matches_reference():
    # ds1 envelope (c=320, s % 512 == 0): the packed array is bound
    # straight into the kernel, q/k/v carved out in-kernel
    rng = np.random.default_rng(8)
    b, s, c, heads = 1, 512, 320, 5
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * c)), jnp.float32)
    assert fa._packed_direct_blk(s, c, heads) == 512
    out = fa.flash_attention_packed(qkv, heads)
    ref = fa._xla_mh(qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:],
                     heads, 64 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_packed_direct_blk_envelope():
    assert fa._packed_direct_blk(2560, 320, 5) == 512   # ds1
    assert fa._packed_direct_blk(640, 640, 10) == 640   # ds2
    assert fa._packed_direct_blk(160, 1280, 20) == 0    # ds4: sliced wins
    assert fa._packed_direct_blk(2561, 320, 5) == 0     # indivisible
    assert fa._packed_direct_blk(2560, 320, 4) == 0     # d != 64


def test_mh_onescol_matches_xla():
    # the r5 onescol mh variant: per-head [v | ones] interleave, rowsum
    # from the PV dot's idle lanes — exact vs the XLA reference
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.normal(size=(2, 256, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 512, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 512, 128)), jnp.float32)
    out = fa._flash_mh_ones(q, k, v, 2, 64 ** -0.5, 128)
    ref = fa._xla_mh(q, k, v, 2, 64 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
