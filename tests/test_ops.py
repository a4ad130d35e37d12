"""Op-level parity tests against torch oracles (primitive ops only)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from tooncrafter_tpu.ops import attention as A
from tooncrafter_tpu.ops import norms as N
from tooncrafter_tpu.ops import resize as R


@pytest.mark.parametrize("shape,groups,eps", [
    ((2, 8, 8, 64), 32, 1e-6),
    ((3, 5, 7, 32), 32, 1e-5),
    ((2, 4, 6, 6, 64), 32, 1e-5),  # 5D: (B,T,H,W,C) joint over T,H,W
])
def test_group_norm_matches_torch(shape, groups, eps):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    c = shape[-1]
    wt = rng.normal(size=c).astype(np.float32)
    bs = rng.normal(size=c).astype(np.float32)

    out = N.group_norm(jnp.asarray(x), jnp.asarray(wt), jnp.asarray(bs),
                       num_groups=groups, eps=eps)

    # torch layout: channels first
    perm = (0, len(shape) - 1) + tuple(range(1, len(shape) - 1))
    xt = torch.from_numpy(np.transpose(x, perm))
    ref = F.group_norm(xt, groups, torch.from_numpy(wt), torch.from_numpy(bs),
                       eps)
    inv = (0,) + tuple(range(2, len(shape))) + (1,)
    ref = np.transpose(ref.numpy(), inv)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 48)).astype(np.float32)
    ln = N.LayerNorm()
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    wt = rng.normal(size=48).astype(np.float32)
    bs = rng.normal(size=48).astype(np.float32)
    params = {"params": {"weight": jnp.asarray(wt), "bias": jnp.asarray(bs)}}
    out = ln.apply(params, jnp.asarray(x))
    ref = F.layer_norm(torch.from_numpy(x), (48,), torch.from_numpy(wt),
                       torch.from_numpy(bs), 1e-5).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


@pytest.mark.parametrize("sq,sk,h,d", [(64, 64, 4, 32), (33, 17, 2, 16)])
def test_attention_matches_torch_sdpa(sq, sk, h, d):
    rng = np.random.default_rng(2)
    q = rng.normal(size=(2, sq, h, d)).astype(np.float32)
    k = rng.normal(size=(2, sk, h, d)).astype(np.float32)
    v = rng.normal(size=(2, sk, h, d)).astype(np.float32)
    out = A.dot_product_attention(*map(jnp.asarray, (q, k, v)))
    ref = F.scaled_dot_product_attention(
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(k).permute(0, 2, 1, 3),
        torch.from_numpy(v).permute(0, 2, 1, 3),
    ).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_attention_entrypoint_merges_heads():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 10, 64)).astype(np.float32)
    kv = rng.normal(size=(2, 6, 64)).astype(np.float32)
    out = A.attention(jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
                      heads=4)
    assert out.shape == (2, 10, 64)
    ref = F.scaled_dot_product_attention(
        torch.from_numpy(q.reshape(2, 10, 4, 16)).permute(0, 2, 1, 3),
        torch.from_numpy(kv.reshape(2, 6, 4, 16)).permute(0, 2, 1, 3),
        torch.from_numpy(kv.reshape(2, 6, 4, 16)).permute(0, 2, 1, 3),
    ).permute(0, 2, 1, 3).reshape(2, 10, 64).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_causal_mask_attention():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 5, 2, 8)).astype(np.float32)
    mask = jnp.tril(jnp.ones((5, 5), bool))[None, None]
    out = A.dot_product_attention(jnp.asarray(x), jnp.asarray(x),
                                  jnp.asarray(x), mask=mask)
    ref = F.scaled_dot_product_attention(
        torch.from_numpy(x).permute(0, 2, 1, 3),
        torch.from_numpy(x).permute(0, 2, 1, 3),
        torch.from_numpy(x).permute(0, 2, 1, 3),
        is_causal=True,
    ).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((320, 512), (224, 224)),
                                          ((64, 48), (224, 224)),
                                          ((128, 128), (32, 32))])
def test_bicubic_resize_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)
    out = R.resize_bicubic(jnp.asarray(x), *out_hw)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), out_hw, mode="bicubic",
        align_corners=True, antialias=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)


def test_nearest_upsample_matches_torch():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 5, 6, 4)).astype(np.float32)
    out = R.upsample_nearest_2x(jnp.asarray(x))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        scale_factor=2, mode="nearest")
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref)
