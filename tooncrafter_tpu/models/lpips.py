"""LPIPS perceptual distance (Zhang et al. 2018), VGG16 variant.

SURVEY.md §4e calls for PSNR/LPIPS e2e gates; the reference repo itself
never computes LPIPS (paper-only), so this is the framework-side
implementation the gate plugs into. Architecture matches the standard
`lpips` pip package with `net='vgg'`:

  input in [-1,1] -> ScalingLayer (ImageNet-ish shift/scale)
  -> VGG16 features, tapped after relu1_2 / relu2_2 / relu3_3 / relu4_3 /
     relu5_3 (torchvision `features` indices 3, 8, 15, 22, 29)
  -> per-position channel unit-normalization (eps 1e-10)
  -> squared difference -> learned 1x1 "lin" head (C_l -> 1, no bias)
  -> spatial mean, summed over the 5 taps.

Weights are an external artifact (torchvision VGG16 `features.*` +
the LPIPS package's `lin*.model.1.weight`); `lpips_mapping()` gives the
converter entries so both state dicts drop in through
utils/checkpoint.convert-style plumbing. Tested for exact activation
parity against an inline torch twin with random weights
(tests/test_lpips.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

# torchvision VGG16 `features` topology: (layer index, out channels);
# 'M' = 2x2 max pool. Taps fire right after the ReLU of the listed convs.
_VGG16_LAYOUT: Sequence[Any] = (
    (0, 64), (2, 64), "M",
    (5, 128), (7, 128), "M",
    (10, 256), (12, 256), (14, 256), "M",
    (17, 512), (19, 512), (21, 512), "M",
    (24, 512), (26, 512), (28, 512),
)
_TAP_AFTER = (2, 7, 14, 21, 28)
TAP_CHANNELS = (64, 128, 256, 512, 512)

# lpips.ScalingLayer buffers (shift/scale of the [-1,1] input)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 feature trunk, channels-last, returning the 5 LPIPS taps."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        for item in _VGG16_LAYOUT:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            idx, ch = item
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{idx}")(x)
            x = nn.relu(x)
            if idx in _TAP_AFTER:
                taps.append(x)
        return taps


class LPIPS(nn.Module):
    """Full LPIPS head. __call__(a, b) -> (B,) distances; inputs are
    (B, H, W, 3) in [-1, 1]."""

    dtype: Any = jnp.float32

    def setup(self):
        self.net = VGG16Features(dtype=self.dtype)
        self.lins = [
            self.param(f"lin{i}", nn.initializers.ones, (c, 1), jnp.float32)
            for i, c in enumerate(TAP_CHANNELS)]

    def _features(self, x):
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        return self.net((x - shift) / scale)

    def __call__(self, a, b):
        dist = 0.0
        for fa, fb, lin in zip(self._features(a), self._features(b),
                               self.lins):
            na = fa / (jnp.sqrt(jnp.sum(jnp.square(fa), axis=-1,
                                        keepdims=True)) + 1e-10)
            nb = fb / (jnp.sqrt(jnp.sum(jnp.square(fb), axis=-1,
                                        keepdims=True)) + 1e-10)
            d = jnp.square(na - nb) @ jnp.maximum(lin, 0.0)  # (B,H,W,1)
            dist = dist + jnp.mean(d, axis=(1, 2, 3))
        return dist


def lpips_mapping() -> List[Tuple[Tuple[str, ...], str, Any]]:
    """Converter entries: torchvision VGG16 (`features.N.weight/bias`) +
    LPIPS lin heads (`linN.model.1.weight`, shape (1, C, 1, 1)).

    Same entry format as utils/checkpoint mappings — usable with
    tests.parity.refutil.convert_entries or _set_path plumbing."""
    from tooncrafter_tpu.utils.checkpoint import t_conv2d, t_none

    entries: List[Tuple[Tuple[str, ...], str, Any]] = []
    for item in _VGG16_LAYOUT:
        if item == "M":
            continue
        idx, _ = item
        entries.append((("net", f"conv{idx}", "kernel"),
                        f"features.{idx}.weight", t_conv2d))
        entries.append((("net", f"conv{idx}", "bias"),
                        f"features.{idx}.bias", t_none))
    for i, c in enumerate(TAP_CHANNELS):
        # (1, C, 1, 1) 1x1 conv -> (C, 1) matrix
        entries.append(((f"lin{i}",), f"lin{i}.model.1.weight",
                        lambda w: w.reshape(w.shape[1], 1)))
    return entries


def load_lpips_params(vgg_sd: Dict[str, Any],
                      lin_sd: Dict[str, Any]) -> Dict[str, Any]:
    """Assemble LPIPS flax params from the two external torch state dicts
    (numpy-valued). Missing lin heads default to ones (unweighted)."""
    from tooncrafter_tpu.utils.checkpoint import _set_path

    sd = {**vgg_sd, **lin_sd}
    params: Dict[str, Any] = {}
    for jpath, tkey, fn in lpips_mapping():
        if tkey in sd:
            _set_path(params, jpath, jnp.asarray(fn(sd[tkey])))
        elif jpath[0].startswith("lin"):
            i = int(jpath[0][3:])
            _set_path(params, jpath,
                      jnp.ones((TAP_CHANNELS[i], 1), jnp.float32))
        else:
            raise KeyError(f"missing VGG16 tensor {tkey}")
    return params
