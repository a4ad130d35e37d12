"""Fused dual cross-attention (text + image branch) for the UNet attn2.

Rebuilds the spatial cross-attention of the reference transformer
(/root/reference/lvdm/modules/attention.py:112-141: separate text and
image attentions over the hybrid context, combined as
`out + scale_ip * out_ip`) as ONE Pallas kernel.

Why: both KV sets are tiny (77 text tokens, 16*T image tokens) while Q
is the full token stream — the XLA lowering runs two separate attention
fusions that each re-read Q from HBM, materialize their own [Sq, Sk]
probability tiles, write two [Sq, C] outputs, and then a third fusion
reads both to combine. The kernel keeps BOTH KV sets VMEM-resident,
sweeps Q once, and writes the combined output once: Q/out cross HBM
exactly one time and no probability tile ever leaves registers.

STATUS: PARKED (measured non-win, tools/bench_cross2.py, real attn2
shapes batch=32/Lt=77/Li=16). Full attn2 complex per-step times:
  ds1 (Sq=2560,C=320,h=5):  XLA 2.31 ms | this kernel 2.49 | blockdiag 2.74
  ds2 (Sq=640, C=640,h=10): XLA 1.74 ms | this kernel 2.07 | blockdiag 2.81
  ds4 (Sq=160, C=1280,h=20):XLA 1.67 ms | this kernel 1.81 | blockdiag 5.22
The per-head unrolled loop pays 128-lane padding on 77/16-wide score
tiles (MXU N-dim), which outweighs the saved Q/out HBM traffic; a pure
XLA block-diagonal formulation (one token-major matmul for all heads +
segmented softmax via indicator dots, variant_c in the bench) inflates
FLOPs by `heads`× and loses worse. XLA's two batched attention fusions
remain the best known lowering for tiny-KV dual cross-attention.
Enable for experiments with TC_DUAL_CROSS_PALLAS=1.

Softmax statistics in f32, probs rounded to the compute dtype before
the PV dot, matching ops/attention.dot_product_attention semantics.
log2(e) is folded into the QK scale so the exponent lowers to exp2
(same trick as ops/flash_attention._flash_bh_single).

Backward recomputes through the differentiable XLA form (house
pattern, see ops/temporal_conv.py) so the Pallas forward stays a leaf.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from tooncrafter_tpu.ops import _dispatch

_INTERPRET = False
# read once at import — flipping mid-process has no effect on traced code
_DUAL_CROSS_PALLAS = os.environ.get("TC_DUAL_CROSS_PALLAS") == "1"
_LOG2E = 1.4426950408889634


def _on_tpu() -> bool:
    return _dispatch.on_tpu()


def _pick_blk(sq: int) -> int:
    for bq in (512, 320, 256, 160, 128):
        if sq % bq == 0:
            return bq
    return 0


def use_kernel(sq: int, lt: int, li: int, c: int, heads: int) -> bool:
    """Envelope: every spatial attn2 the model emits (d=64 heads,
    Sq in {2560, 640, 160}, Lt=77, Li=16*T). KV stays resident: both
    score tiles + KV well under VMEM for lt+li <= 1024."""
    if c % heads or c // heads != 64:
        return False
    if lt > 1024 or li > 1024 or _pick_blk(sq) == 0:
        return False
    if not (_on_tpu() or _INTERPRET):
        return False
    # parked: loses to XLA's two-attention lowering (see module docstring)
    return _INTERPRET or _DUAL_CROSS_PALLAS


@functools.partial(jax.jit, static_argnames=("heads", "scale", "blk_q"))
def _dual_kernel_call(q, kt, vt, ki, vi, s_ip, heads: int, scale: float,
                      blk_q: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sq, c = q.shape
    lt = kt.shape[1]
    li = ki.shape[1]
    d = c // heads
    n_q = sq // blk_q
    s2 = scale * _LOG2E

    def _attend(qh, kh, vh, odt):
        sc = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * s2
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp2(sc - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(odt), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc / l

    def kernel(q_ref, kt_ref, vt_ref, ki_ref, vi_ref, si_ref, o_ref):
        qb = q_ref[0]                  # (blk_q, H*D)
        si = si_ref[0, 0]
        outs = []
        for h in range(heads):
            lo = h * d
            qh = qb[:, lo:lo + d]
            acc_t = _attend(qh, kt_ref[0][:, lo:lo + d],
                            vt_ref[0][:, lo:lo + d], qb.dtype)
            acc_i = _attend(qh, ki_ref[0][:, lo:lo + d],
                            vi_ref[0][:, lo:lo + d], qb.dtype)
            outs.append((acc_t + si * acc_i).astype(o_ref.dtype))
        o_ref[0] = jnp.concatenate(outs, axis=-1)

    return pl.pallas_call(
        kernel,
        grid=(b, n_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, lt, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, lt, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, li, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, li, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, 1), lambda b_, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, c), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(q, kt, vt, ki, vi, s_ip)


def _xla_dual(q, kt, vt, ki, vi, scale_ip, heads: int,
              scale: Optional[float]):
    from tooncrafter_tpu.ops.attention import dot_product_attention

    b, sq, c = q.shape
    d = c // heads
    qh = q.reshape(b, sq, heads, d)
    split = lambda t: t.reshape(b, t.shape[1], heads, d)
    out = dot_product_attention(qh, split(kt), split(vt), scale=scale)
    out_ip = dot_product_attention(qh, split(ki), split(vi), scale=scale)
    return (out + scale_ip * out_ip.astype(out.dtype)).reshape(b, sq, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def dual_cross_attention(q, kt, vt, ki, vi, scale_ip, heads: int,
                         scale: Optional[float] = None):
    """out = attn(q, kt, vt) + scale_ip * attn(q, ki, vi), token-major.

    q: (B, Sq, H*D); kt/vt: (B, Lt, H*D); ki/vi: (B, Li, H*D);
    scale_ip: scalar (may be traced — the learnable tanh-alpha gate).
    Dispatches to the fused resident-KV Pallas kernel on TPU when the
    shape fits (`use_kernel`); XLA two-attention fallback otherwise.
    """
    b, sq, c = q.shape
    sc = (c // heads) ** -0.5 if scale is None else scale
    if use_kernel(sq, kt.shape[1], ki.shape[1], c, heads):
        si = jnp.asarray(scale_ip, jnp.float32).reshape(1, 1)
        return _dual_kernel_call(q, kt, vt, ki, vi, si, heads, sc,
                                 _pick_blk(sq))
    return _xla_dual(q, kt, vt, ki, vi, scale_ip, heads, sc)


def _dual_fwd(q, kt, vt, ki, vi, scale_ip, heads, scale):
    return (dual_cross_attention(q, kt, vt, ki, vi, scale_ip, heads,
                                 scale),
            (q, kt, vt, ki, vi, scale_ip))


def _dual_bwd(heads, scale, res, g):
    q, kt, vt, ki, vi, scale_ip = res
    sc = (q.shape[-1] // heads) ** -0.5 if scale is None else scale
    _, vjp = jax.vjp(
        lambda *a: _xla_dual(*a, heads, sc), q, kt, vt, ki, vi, scale_ip)
    return vjp(g)


dual_cross_attention.defvjp(_dual_fwd, _dual_bwd)
