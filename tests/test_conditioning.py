"""Tests for CLIP towers, tokenizer, and resampler (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from tooncrafter_tpu.models.clip import (CLIPTextTower, CLIPVisionTower,
                                         clip_preprocess)
from tooncrafter_tpu.models.resampler import Resampler
from tooncrafter_tpu.utils.tokenizer import ClipTokenizer, bytes_to_unicode


def test_text_tower_penultimate_runs_n_minus_1_blocks():
    tower = CLIPTextTower(vocab_size=64, width=32, heads=4, layers=3,
                          context_length=8)
    toks = jnp.asarray([[1, 5, 9, 2, 0, 0, 0, 0]], jnp.int32)
    params = tower.init(jax.random.PRNGKey(0), toks)
    names = set(params["params"].keys())
    assert "resblock_0" in names and "resblock_1" in names
    assert "resblock_2" not in names  # penultimate drops the last block
    out = tower.apply(params, toks)
    assert out.shape == (1, 8, 32)


def test_text_tower_causal_mask():
    tower = CLIPTextTower(vocab_size=64, width=32, heads=4, layers=2,
                          context_length=8)
    t1 = jnp.asarray([[1, 5, 9, 2, 0, 0, 0, 0]], jnp.int32)
    t2 = t1.at[0, 5].set(33)  # change a later token
    params = tower.init(jax.random.PRNGKey(0), t1)
    o1 = tower.apply(params, t1)
    o2 = tower.apply(params, t2)
    # positions before the edit are causal-invariant
    np.testing.assert_allclose(np.asarray(o1[:, :5]), np.asarray(o2[:, :5]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(o1[:, 5]), np.asarray(o2[:, 5]))


def test_vision_tower_all_tokens():
    tower = CLIPVisionTower(width=32, heads=4, layers=2, patch_size=8,
                            image_size=32)
    x = jnp.zeros((2, 32, 32, 3))
    params = tower.init(jax.random.PRNGKey(0), x)
    out = tower.apply(params, x)
    assert out.shape == (2, 1 + 16, 32)  # cls + (32/8)^2 patches


def test_clip_preprocess_range():
    x = jnp.zeros((1, 64, 48, 3))  # all zeros in [-1,1] -> 0.5 gray
    y = clip_preprocess(x)
    assert y.shape == (1, 224, 224, 3)
    expect = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / \
        np.array([0.26862954, 0.26130258, 0.27577711])
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), expect, atol=1e-5)


def test_resampler_shapes_per_frame_queries():
    rs = Resampler(dim=32, depth=2, dim_head=8, heads=4, num_queries=4,
                   embedding_dim=16, output_dim=24, video_length=3)
    x = jnp.zeros((2, 10, 16))
    params = rs.init(jax.random.PRNGKey(0), x)
    out = rs.apply(params, x)
    assert out.shape == (2, 12, 24)  # 3 frames x 4 queries


def _tiny_tokenizer():
    # merges that build "he", "ll", "hell", "o</w>"
    merges = ["h e", "l l", "he ll", "o o"]
    return ClipTokenizer(merges=merges)


def test_tokenizer_bpe_and_padding():
    tok = _tiny_tokenizer()
    ids = tok(["Hello hello", ""], context_length=10)
    assert ids.shape == (2, 10)
    sot, eot = tok.sot, tok.eot
    assert ids[0, 0] == sot
    # both words identical after lowercasing
    row = list(ids[0])
    end = row.index(eot)
    word1 = row[1:(1 + (end - 1) // 2)]
    word2 = row[1 + (end - 1) // 2:end]
    assert word1 == word2
    # empty prompt: just sot/eot then zeros
    assert ids[1, 0] == sot and ids[1, 1] == eot and ids[1, 2:].sum() == 0


def test_tokenizer_truncation_keeps_eot():
    tok = _tiny_tokenizer()
    ids = tok(["hello " * 50], context_length=12)
    assert ids.shape == (1, 12)
    assert ids[0, -1] == tok.eot


def test_bytes_to_unicode_reversible():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256
