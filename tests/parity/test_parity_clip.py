"""CLIP tower parity vs an independent torch implementation.

open_clip is not installed in this environment, so the reference's frozen
ViT-H towers (condition.py:174-372) cannot be run directly. HuggingFace
transformers ships an architecturally identical, independently written CLIP
(same pre-LN ViT; laion's ViT-H checkpoints are distributed in both layouts),
so we random-init HF CLIP at a shrunk config, re-key its state dict into the
open_clip layout the checkpoint converter expects, and assert our flax
towers reproduce the torch activations:

  * text: penultimate-layer output + ln_final, causal mask, all 77 tokens
    (condition.py:224-233)
  * vision: all patch tokens + class token, ln_pre, NO ln_post/projection
    (condition.py:342-372)
"""

import numpy as np
import pytest

from tests.parity import refutil
from tests.parity.refutil import assert_close, convert_tower

refutil.setup_reference()

import torch  # noqa: E402

from transformers import CLIPTextConfig, CLIPTextModel  # noqa: E402
from transformers import CLIPVisionConfig, CLIPVisionModel  # noqa: E402

from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter  # noqa: E402

WIDTH, HEADS, LAYERS = 64, 4, 3
IMG = 28  # 2x2 patches of 14 + cls = 5 tokens


def _np(t):
    return t.detach().cpu().float().numpy()


def _block_sd(sd, prefix, layer):
    """HF CLIPEncoderLayer -> open_clip ResidualAttentionBlock keys."""
    a = layer.self_attn
    sd[f"{prefix}.ln_1.weight"] = _np(layer.layer_norm1.weight)
    sd[f"{prefix}.ln_1.bias"] = _np(layer.layer_norm1.bias)
    sd[f"{prefix}.ln_2.weight"] = _np(layer.layer_norm2.weight)
    sd[f"{prefix}.ln_2.bias"] = _np(layer.layer_norm2.bias)
    sd[f"{prefix}.attn.in_proj_weight"] = np.concatenate(
        [_np(a.q_proj.weight), _np(a.k_proj.weight), _np(a.v_proj.weight)])
    sd[f"{prefix}.attn.in_proj_bias"] = np.concatenate(
        [_np(a.q_proj.bias), _np(a.k_proj.bias), _np(a.v_proj.bias)])
    sd[f"{prefix}.attn.out_proj.weight"] = _np(a.out_proj.weight)
    sd[f"{prefix}.attn.out_proj.bias"] = _np(a.out_proj.bias)
    sd[f"{prefix}.mlp.c_fc.weight"] = _np(layer.mlp.fc1.weight)
    sd[f"{prefix}.mlp.c_fc.bias"] = _np(layer.mlp.fc1.bias)
    sd[f"{prefix}.mlp.c_proj.weight"] = _np(layer.mlp.fc2.weight)
    sd[f"{prefix}.mlp.c_proj.bias"] = _np(layer.mlp.fc2.bias)


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig().tiny(
        clip_text_width=WIDTH, clip_text_heads=HEADS, clip_text_layers=LAYERS,
        clip_vision_width=WIDTH, clip_vision_heads=HEADS,
        clip_vision_layers=LAYERS, clip_image_size=IMG)


def test_clip_text_penultimate_parity(cfg):
    torch.manual_seed(0)
    hf = CLIPTextModel(CLIPTextConfig(
        vocab_size=49408, hidden_size=WIDTH, intermediate_size=4 * WIDTH,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        max_position_embeddings=77, hidden_act="gelu",
        attn_implementation="eager")).eval()
    tm = hf.text_model

    p = "cond_stage_model.model"
    sd = {f"{p}.token_embedding.weight": _np(
              tm.embeddings.token_embedding.weight),
          f"{p}.positional_embedding": _np(
              tm.embeddings.position_embedding.weight),
          f"{p}.ln_final.weight": _np(tm.final_layer_norm.weight),
          f"{p}.ln_final.bias": _np(tm.final_layer_norm.bias)}
    for i in range(LAYERS - 1):  # penultimate: last block never runs
        _block_sd(sd, f"{p}.transformer.resblocks.{i}", tm.encoder.layers[i])

    model = ToonCrafter(cfg)
    params = convert_tower(sd, cfg, "text_encoder", model=model)

    tokens = np.random.RandomState(1).randint(0, 49408, (2, 77))
    with torch.no_grad():
        hs = hf(torch.from_numpy(tokens), output_hidden_states=True
                ).hidden_states
        # penultimate-layer output + ln_final (condition.py:224-233)
        out_t = tm.final_layer_norm(hs[LAYERS - 1])
    out_j = model.text_encoder.apply({"params": params},
                                     tokens.astype(np.int32))
    assert_close(out_j, out_t.numpy(), tol=1e-4, name="clip_text")


def test_clip_vision_all_tokens_parity(cfg):
    torch.manual_seed(0)
    hf = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=WIDTH, intermediate_size=4 * WIDTH,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        image_size=IMG, patch_size=14, hidden_act="gelu",
        attn_implementation="eager")).eval()
    vm = hf.vision_model

    p = "embedder.model.visual"
    sd = {f"{p}.class_embedding": _np(vm.embeddings.class_embedding),
          f"{p}.positional_embedding": _np(
              vm.embeddings.position_embedding.weight),
          f"{p}.conv1.weight": _np(vm.embeddings.patch_embedding.weight),
          f"{p}.ln_pre.weight": _np(vm.pre_layrnorm.weight),
          f"{p}.ln_pre.bias": _np(vm.pre_layrnorm.bias)}
    for i in range(LAYERS):
        _block_sd(sd, f"{p}.transformer.resblocks.{i}", vm.encoder.layers[i])

    model = ToonCrafter(cfg)
    params = convert_tower(sd, cfg, "image_encoder", model=model)

    x = np.random.RandomState(2).randn(2, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        # hidden_states[-1] is the encoder output BEFORE post_layernorm —
        # the reference vision embedder stops there (condition.py:342-372)
        out_t = hf(torch.from_numpy(x),
                   output_hidden_states=True).hidden_states[-1]
    out_j = model.image_encoder.apply({"params": params},
                                      np.transpose(x, (0, 2, 3, 1)))
    assert_close(out_j, out_t.numpy(), tol=1e-4, name="clip_vision")
