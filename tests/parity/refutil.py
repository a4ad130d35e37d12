"""Harness for activation-parity tests against /root/reference (PyTorch).

The reference implementation is imported read-only under CPU torch, with
lightweight stand-ins for its CUDA-era dependencies (xformers /
pytorch_lightning / torchvision) so the *reference's own* numerics run on
this host. Parameters always flow torch -> flax through
tooncrafter_tpu/utils/checkpoint.py, so every test here also validates the
converter's layout transforms against real torch modules (VERDICT.md
"Missing #1").

Nothing from the reference is executed at import time beyond module
definitions; the stubs only fill the import graph:
  * xformers.ops.memory_efficient_attention -> exact plain-softmax attention
    (that is what the CUDA kernel computes; lvdm uses no attn_bias/mask).
  * pytorch_lightning.LightningModule -> torch.nn.Module (ddpm3d.py:41 only
    needs the nn.Module behavior for schedule math on CPU).
  * torchvision.utils.make_grid -> unused at test time (logging-only).
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

import numpy as np


def _stub_module(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec works on the stub
    # (transformers probes optional deps that way)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m

REF_PATH = "/root/reference"
_installed = False


def setup_reference():
    """Make `import lvdm.*` work against /root/reference on CPU torch."""
    global _installed
    if _installed:
        return
    import torch

    if "xformers" not in sys.modules:
        xf = _stub_module("xformers")
        ops = _stub_module("xformers.ops")

        def memory_efficient_attention(q, k, v, attn_bias=None, op=None):
            assert attn_bias is None
            scale = q.shape[-1] ** -0.5
            w = torch.softmax(
                torch.matmul(q.float(), k.float().transpose(-1, -2)) * scale,
                dim=-1)
            return torch.matmul(w, v.float()).to(q.dtype)

        ops.memory_efficient_attention = memory_efficient_attention
        xf.ops = ops
        xf.__version__ = "0.0.20"  # pre-0.0.21: single-shot branch
        sys.modules["xformers"] = xf
        sys.modules["xformers.ops"] = ops

    if "pytorch_lightning" not in sys.modules:
        pl = _stub_module("pytorch_lightning")
        pl.LightningModule = torch.nn.Module
        util = _stub_module("pytorch_lightning.utilities")
        util.rank_zero_only = lambda fn: fn
        pl.utilities = util
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.utilities"] = util

    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tvu = _stub_module("torchvision.utils")
        tvu.make_grid = None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    _installed = True


class AttrDict(dict):
    """Mapping with attribute access — stands in for OmegaConf DictConfig in
    reference constructors (e.g. ddpm3d.py reads unet_config.params.*)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return AttrDict(v) if isinstance(v, dict) else v

    def get(self, k, default=None):
        v = super().get(k, default)
        return AttrDict(v) if isinstance(v, dict) else v


# ---------------------------------------------------------------------------
# torch -> flax via the production converter
# ---------------------------------------------------------------------------

def state_dict_np(module, prefix: str):
    """Reference module's state dict keyed as it would appear in model.ckpt."""
    return {f"{prefix}.{k}": v.detach().cpu().float().numpy()
            for k, v in module.state_dict().items()}


def convert_tower(sd, config, tower: str, model=None, allowed_unused=()):
    """Run a prefixed torch state dict through the production converter and
    return the given tower's flax params.

    Asserts every provided torch tensor was consumed (mapping coverage);
    shape validation happens inside convert_state_dict via the template.
    """
    from tooncrafter_tpu.models.diffusion import ToonCrafter
    from tooncrafter_tpu.utils import checkpoint as ck

    model = model or ToonCrafter(config)
    template = model.param_shapes()
    params, report = ck.convert_state_dict(sd, config, template)
    unexpected = [k for k in report["unused"]
                  if not any(pat in k for pat in allowed_unused)]
    assert not unexpected, f"converter dropped torch tensors: {unexpected[:8]}"
    return params[tower]


def convert_entries(entries, sd, allowed_unused=()):
    """Convert a bare module state dict via explicit mapping entries
    (for single-block tests). Returns a nested flax param dict."""
    from tooncrafter_tpu.utils.checkpoint import _set_path

    params = {}
    used = set()
    for jpath, tkey, fn in entries:
        if tkey not in sd:
            continue
        _set_path(params, jpath, fn(sd[tkey]))
        used.add(tkey)
    unexpected = [k for k in sd if k not in used
                  and not any(pat in k for pat in allowed_unused)]
    assert not unexpected, f"unmapped torch tensors: {unexpected[:8]}"
    return params


# ---------------------------------------------------------------------------
# layout + comparison helpers
# ---------------------------------------------------------------------------

def t2j_video(x):
    """torch (B,C,T,H,W) -> numpy (B,T,H,W,C)"""
    return np.transpose(x.detach().cpu().float().numpy(), (0, 2, 3, 4, 1))


def t2j_img(x):
    """torch (B,C,H,W) -> numpy (B,H,W,C)"""
    return np.transpose(x.detach().cpu().float().numpy(), (0, 2, 3, 1))


def j2t_video(x):
    """numpy (B,T,H,W,C) -> torch (B,C,T,H,W)"""
    import torch
    return torch.from_numpy(np.ascontiguousarray(
        np.transpose(np.asarray(x, np.float32), (0, 4, 1, 2, 3))))


def j2t_img(x):
    """numpy (B,H,W,C) -> torch (B,C,H,W)"""
    import torch
    return torch.from_numpy(np.ascontiguousarray(
        np.transpose(np.asarray(x, np.float32), (0, 3, 1, 2))))


def assert_close(actual, expected, tol=2e-4, name=""):
    """Max |a-e| relative to the magnitude of the expected activation."""
    a = np.asarray(actual, np.float32)
    e = np.asarray(expected, np.float32)
    assert a.shape == e.shape, (name, a.shape, e.shape)
    scale = max(1e-3, float(np.abs(e).max()))
    rel = float(np.abs(a - e).max()) / scale
    assert rel <= tol, (
        f"{name}: max rel err {rel:.3e} > {tol} (scale {scale:.3e})")
