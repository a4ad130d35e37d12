"""Attention core.

One implementation surface used by every attention site in the framework
(UNet spatial/temporal transformers, VAE attn blocks, dual-ref fusion
attention, CLIP towers, Perceiver resampler). Reference analogues:
`lvdm/modules/attention.py:101-124` (einsum path) and the xformers /
torch-SDPA fast paths (`attention.py:146-209`, `attention_svd.py:332-336`).

TPU story: softmax statistics in fp32, matmuls in the input dtype (bf16 on
TPU) with fp32 accumulation via `preferred_element_type`. For long sequences
a Pallas flash-attention kernel (ops/flash_attention.py) is dispatched; the
XLA path below is the reference semantics and the fallback.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# read once at import (flipping after a trace has no effect — see
# ops/spatial_conv.py)
_PAD_SHORT_KV = bool(os.environ.get("TC_PAD_SHORT_KV"))


def dot_product_attention(
    q: jax.Array,          # (B, Sq, H, D)
    k: jax.Array,          # (B, Sk, H, D)
    v: jax.Array,          # (B, Sk, H, D)
    bias: Optional[jax.Array] = None,   # broadcastable to (B, H, Sq, Sk)
    mask: Optional[jax.Array] = None,   # bool, True = keep
    scale: Optional[float] = None,
) -> jax.Array:
    """Plain softmax attention, fp32 softmax, returns (B, Sq, H, D)."""
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def attention(q, k, v, *, heads: int, bias=None, mask=None, scale=None,
              use_flash: bool = True):
    """Multi-head attention over flat (B, S, H*D) projections.

    Splits heads, runs the core (Pallas flash kernel when profitable and
    available, else XLA), and re-merges. This is the single entry point the
    model code uses.
    """
    b, sq, inner = q.shape
    sk = k.shape[1]
    d = inner // heads
    if _PAD_SHORT_KV and bias is None and mask is None \
            and sk < 160 and sk % 128:
        # DEAD END kept behind TC_PAD_SHORT_KV for the record: lane-
        # aligning the 77-token text context (zero K/V rows + finfo.min
        # logit bias — padded keys get exactly probability 0, the rest
        # differs only by f32 summation order) measured 3.2 ms/step
        # SLOWER in the round-3 loop: the f32 logits grow 77->128 and
        # the bias add breaks XLA's fused softmax pattern
        # (.audit_r03.jsonl denoise6 203.5 vs 200.3 ms/step).
        pad = 128 - sk % 128
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        bias = jnp.full((1, 1, 1, sk + pad), 0.0, jnp.float32)
        bias = bias.at[..., sk:].set(jnp.finfo(jnp.float32).min)
        sk += pad
    qh = q.reshape(b, sq, heads, d)
    kh = k.reshape(b, sk, heads, d)
    vh = v.reshape(b, sk, heads, d)
    if use_flash and bias is None and mask is None:
        from tooncrafter_tpu.ops import flash_attention as fa
        out = fa.flash_attention(qh, kh, vh, scale=scale)
    else:
        out = dot_product_attention(qh, kh, vh, bias=bias, mask=mask,
                                    scale=scale)
    return out.reshape(b, sq, inner)


def temporal_attention_inplace(q, k, v, *, heads: int, mask=None,
                               scale: Optional[float] = None,
                               rel_k=None, rel_v=None):
    """Self-attention over the T axis of (B, T, H, W, heads*D) tensors,
    expressed as einsums so XLA folds the layout change into the matmuls
    instead of materializing the (B*H*W, T, C) transpose the reference
    layout implies (attention.py:365-412).

    rel_k/rel_v: optional (T, T, D) relative-position tables; added to the
    logits / output exactly like attention.py:104-124."""
    b, t, hh, ww, inner = q.shape
    d = inner // heads
    scale = d ** -0.5 if scale is None else scale
    qh = q.reshape(b, t, hh, ww, heads, d)
    kh = k.reshape(b, t, hh, ww, heads, d)
    vh = v.reshape(b, t, hh, ww, heads, d)
    logits = jnp.einsum("bthwnd,bshwnd->bhwnts", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if rel_k is not None:
        logits = logits + jnp.einsum(
            "bthwnd,tsd->bhwnts", qh, rel_k,
            preferred_element_type=jnp.float32) * scale
    if mask is not None:  # (t, s) bool
        logits = jnp.where(mask[None, None, None, None],
                           logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhwnts,bshwnd->bthwnd", probs, vh,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    if rel_v is not None:
        out = out + jnp.einsum("bhwnts,tsd->bthwnd", probs, rel_v,
                               preferred_element_type=jnp.float32
                               ).astype(v.dtype)
    return out.reshape(b, t, hh, ww, inner)
