"""Checkpoint converter tests.

Builds a synthetic torch-style state dict whose keys come from the mapping
table and whose shapes are the exact inverses of the flax template shapes,
then checks the round trip covers the whole parameter tree. This pins the
flax module names <-> torch key paths contract without needing the real
700-tensor checkpoint.
"""

import numpy as np
import jax
import pytest

from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter
from tooncrafter_tpu.utils import checkpoint as CK


def _leaf_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaf_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _inverse_shape(fn, shape):
    """Shape a torch tensor must have so fn(tensor).shape == shape."""
    if fn is CK.t_linear:
        return (shape[1], shape[0])
    if fn is CK.t_conv2d:
        kh, kw, i, o = shape
        return (o, i, kh, kw)
    if fn is CK.t_conv1x1:
        i, o = shape
        return (o, i, 1, 1)
    if fn is CK.t_conv1d1:
        i, o = shape
        return (o, i, 1)
    if fn is CK.t_conv3d:
        kt, kh, kw, i, o = shape
        return (o, i, kt, kh, kw)
    return shape


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig().tiny()
    model = ToonCrafter(cfg)
    params = model.param_shapes()  # shape-only template, no compute
    return cfg, model, params


def test_mapping_covers_full_param_tree(tiny_model):
    cfg, model, params = tiny_model
    mapping = CK.full_mapping(cfg)

    # synthesize a torch state dict from the mapping + template shapes
    sd = {}
    for tower, entries in mapping.items():
        for jpath, tkey, fn in entries:
            want = CK._get_path(params[tower], jpath)
            if want is None:
                continue  # optional (e.g. skip convs that don't exist)
            rng = np.random.default_rng(abs(hash(tkey)) % 2**31)
            sd[tkey] = rng.normal(
                size=_inverse_shape(fn, tuple(want.shape))).astype(np.float32)

    conv, report = CK.convert_state_dict(sd, cfg, template=params)
    assert report["missing"] == []
    assert report["unused"] == []

    # every template leaf must be populated with the right shape — except
    # the plain VAE decoder, which dualref checkpoints legitimately lack
    merged, filled = CK.merge_with_template(conv, params)
    assert all(p.startswith("vae/decoder/") for p in filled), filled[:8]
    for tower in params:
        tpl_leaves = dict(_leaf_paths(params[tower]))
        conv_leaves = dict(_leaf_paths(merged[tower]))
        missing = set(tpl_leaves) - set(conv_leaves)
        assert not missing, f"{tower}: unmapped params {sorted(missing)[:8]}"
        for path, leaf in tpl_leaves.items():
            assert tuple(conv_leaves[path].shape) == tuple(leaf.shape), (
                tower, path)


def test_plain_decoder_mapping_for_dynamicrafter_ckpt(tiny_model):
    cfg, model, params = tiny_model
    # a non-dualref sd: plain decoder keys, no time_mix_conv anywhere
    mapping = CK.full_mapping(cfg, dualref=False)
    sd = {}
    for tower, entries in mapping.items():
        for jpath, tkey, fn in entries:
            want = CK._get_path(params[tower], jpath)
            if want is None:
                continue
            sd[tkey] = np.zeros(
                _inverse_shape(fn, tuple(want.shape)), np.float32)
    assert not CK.is_dualref_checkpoint(sd)
    conv, report = CK.convert_state_dict(sd, cfg, template=params)
    assert report["missing"] == [] and report["unused"] == []
    merged, filled = CK.merge_with_template(conv, params)
    # here the dualref decoder is what gets filled from init
    assert filled and all(p.startswith("dualref_decoder/") for p in filled)


def test_transforms_invert_torch_layouts():
    w = np.arange(24, dtype=np.float32).reshape(4, 6)        # torch Linear
    assert CK.t_linear(w).shape == (6, 4)
    w = np.zeros((8, 3, 3, 3), np.float32)                   # torch Conv2d
    assert CK.t_conv2d(w).shape == (3, 3, 3, 8)
    w = np.zeros((8, 4, 1, 1), np.float32)
    assert CK.t_conv1x1(w).shape == (4, 8)
    w = np.zeros((8, 4, 3, 1, 1), np.float32)                # torch Conv3d
    assert CK.t_conv3d(w).shape == (3, 1, 1, 4, 8)
    w = np.zeros((8, 4, 1), np.float32)                      # torch Conv1d k=1
    assert CK.t_conv1d1(w).shape == (4, 8)
    w = np.float32(0.25)                                     # 0-dim scalar
    assert CK.t_none(w).shape == ()


def test_dialect_normalization_deepspeed_prefix():
    # simulate the deepspeed dict shape without writing a real file
    import torch
    sd = {"module": {"_forward_module.model.x": torch.ones(2)}}
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ckpt.pt")
        torch.save(sd, p)
        out = CK.load_torch_state_dict(p)
    assert list(out.keys()) == ["model.x"]


def test_legacy_framestride_rename():
    import torch, tempfile, os
    sd = {"state_dict": {
        "model.diffusion_model.framestride_embed.0.weight": torch.ones(2, 2)}}
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ckpt.pt")
        torch.save(sd, p)
        out = CK.load_torch_state_dict(p)
    assert "model.diffusion_model.fps_embedding.0.weight" in out
