"""LPIPS activation parity vs an inline torch twin of the standard
`lpips` package (VGG16 variant), with random weights routed through
lpips_mapping — validates the architecture, normalization, scaling
buffers, lin heads, and the converter layout transforms. Real pretrained
weights drop in through the same path."""

import numpy as np
import pytest
import torch

from tooncrafter_tpu.models.lpips import (LPIPS, TAP_CHANNELS, _SCALE,
                                          _SHIFT, load_lpips_params,
                                          lpips_mapping)


def _torch_vgg16_features():
    """torchvision VGG16 `features` topology with identical state-dict
    keys (features.N.weight), random init."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            in_ch = v
    return torch.nn.Sequential(*layers)


def _torch_lpips(feats, lins, a, b):
    """The lpips package's forward, spelled out (lpips/lpips.py)."""
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
    taps = (3, 8, 15, 22, 29)

    def run(x):
        x = (x - shift) / scale
        out = []
        for i, layer in enumerate(feats):
            x = layer(x)
            if i in taps:
                out.append(x)
        return out

    dist = 0.0
    for fa, fb, lin in zip(run(a), run(b), lins):
        na = fa / (fa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = fb / (fb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = torch.nn.functional.conv2d((na - nb) ** 2, lin.clamp(min=0))
        dist = dist + d.mean(dim=(1, 2, 3))
    return dist


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    feats = _torch_vgg16_features()
    with torch.no_grad():
        for p in feats.parameters():
            p.mul_(0.2)  # tame activations through 13 random conv layers
    lins = [torch.rand(1, c, 1, 1) for c in TAP_CHANNELS]
    vgg_sd = {f"features.{i}" + k: v.detach().numpy()
              for i, m in enumerate(feats)
              if isinstance(m, torch.nn.Conv2d)
              for k, v in ((".weight", m.weight), (".bias", m.bias))}
    lin_sd = {f"lin{i}.model.1.weight": l.numpy()
              for i, l in enumerate(lins)}
    return feats, lins, vgg_sd, lin_sd


def test_lpips_parity_random_weights(pair):
    feats, lins, vgg_sd, lin_sd = pair
    rng = np.random.RandomState(1)
    a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        want = _torch_lpips(
            feats, lins,
            torch.from_numpy(a.transpose(0, 3, 1, 2)),
            torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()

    params = load_lpips_params(vgg_sd, lin_sd)
    got = np.asarray(LPIPS().apply({"params": params}, a, b))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_lpips_identical_inputs_zero(pair):
    _, _, vgg_sd, lin_sd = pair
    params = load_lpips_params(vgg_sd, lin_sd)
    a = np.random.RandomState(2).uniform(
        -1, 1, (1, 32, 32, 3)).astype(np.float32)
    d = float(np.asarray(LPIPS().apply({"params": params}, a, a))[0])
    assert d == 0.0


def test_lpips_missing_lins_default_to_ones(pair):
    _, _, vgg_sd, _ = pair
    params = load_lpips_params(vgg_sd, {})
    for i, c in enumerate(TAP_CHANNELS):
        assert params[f"lin{i}"].shape == (c, 1)
        assert float(params[f"lin{i}"].min()) == 1.0


def test_lpips_mapping_covers_all_tensors(pair):
    _, _, vgg_sd, lin_sd = pair
    keys = {tkey for _, tkey, _ in lpips_mapping()}
    assert keys == set(vgg_sd) | set(lin_sd)
