"""Structural tests for the VAE and dual-reference decoder (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tooncrafter_tpu.models.vae import AutoencoderKL, Encoder, Decoder
from tooncrafter_tpu.models.vae_dualref import DualRefVideoDecoder

TINY = dict(ch=32, ch_mult=(1, 2, 2, 2), num_res_blocks=1)


def test_encoder_shapes_and_taps():
    enc = Encoder(z_channels=4, **TINY)
    x = jnp.zeros((2, 32, 32, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    h, taps = enc.apply(params, x, return_hidden_states=True)
    assert h.shape == (2, 4, 4, 8)  # f=8, 2*z double_z
    assert len(taps) == 5
    # per-level taps at descending res, then conv_in feature at full res
    assert taps[0].shape == (2, 32, 32, 32)
    assert taps[1].shape == (2, 16, 16, 64)
    assert taps[2].shape == (2, 8, 8, 64)
    assert taps[3].shape == (2, 4, 4, 64)
    assert taps[4].shape == (2, 32, 32, 32)


def test_autoencoder_roundtrip_shapes():
    ae = AutoencoderKL(embed_dim=4, z_channels=4, **TINY)
    x = jnp.zeros((1, 32, 32, 3))
    params = ae.init(jax.random.PRNGKey(0), x)
    rec, moments = ae.apply(params, x)
    assert rec.shape == x.shape
    assert moments.shape == (1, 4, 4, 8)
    z = ae.apply(params, moments[..., :4], method=AutoencoderKL.decode)
    assert z.shape == x.shape


def test_dualref_decoder_injects_refs():
    dec = DualRefVideoDecoder(attn_level=(2, 3), **TINY)
    b, t = 1, 4
    z = jnp.zeros((b, t, 4, 4, 4))
    ref = [
        jnp.zeros((b, 2, 32, 32, 32)),
        jnp.zeros((b, 2, 16, 16, 64)),
        jnp.zeros((b, 2, 8, 8, 64)),
        jnp.zeros((b, 2, 4, 4, 64)),
        jnp.zeros((b, 2, 32, 32, 32)),
    ]
    params = dec.init(jax.random.PRNGKey(0), z, ref)
    out = dec.apply(params, z, ref)
    assert out.shape == (b, t, 32, 32, 3)

    # zero-init injections: with refs vs without must agree at init
    out_noref = dec.apply(params, z, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_noref),
                               atol=1e-6)


def test_dualref_final_combiner_spreads_one_frame_only():
    # The final Combiner (after norm_out) injects into frames 0 and -1; the
    # only temporal op after it is AE3DConv's (3,1,1) mix, so perturbing the
    # conv_in ref feature may reach frames {0,1} and {-2,-1} but must leave
    # deeper middle frames untouched.
    dec = DualRefVideoDecoder(attn_level=(), **TINY)
    b, t = 1, 6
    z = jax.random.normal(jax.random.PRNGKey(1), (b, t, 4, 4, 4))
    ref = [jax.random.normal(jax.random.PRNGKey(i), s) for i, s in enumerate([
        (b, 2, 32, 32, 32), (b, 2, 16, 16, 64), (b, 2, 8, 8, 64),
        (b, 2, 4, 4, 64), (b, 2, 32, 32, 32)])]
    params = dec.init(jax.random.PRNGKey(0), z, ref)
    # make zero-init convs nonzero so injection actually flows
    params = jax.tree_util.tree_map(
        lambda p: jnp.where(jnp.all(p == 0), jnp.ones_like(p) * 0.1, p), params)
    out1 = dec.apply(params, z, ref)
    ref2 = list(ref)
    ref2[-1] = ref[-1] + 1.0  # perturb only the final-combiner feature
    out2 = dec.apply(params, z, ref2)
    mid = slice(2, t - 2)
    np.testing.assert_allclose(np.asarray(out1[:, mid]),
                               np.asarray(out2[:, mid]), atol=1e-4)
    assert not np.allclose(np.asarray(out1[:, 0]), np.asarray(out2[:, 0]))
