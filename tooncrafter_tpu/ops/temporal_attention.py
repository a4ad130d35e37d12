"""Pallas temporal-attention kernel: softmax attention over the T axis,
independently per pixel.

The UNet's TemporalTransformer (reference `lvdm/modules/attention.py:365-412`)
attends over T=16 tokens *per pixel*: logically a batch of B*H*W*heads tiny
(T x T x d=64) attention problems. Those are the worst possible shapes for
XLA on TPU — the batched einsum lowers to thousands of 16x16 matmuls, the
fp32 softmax runs on (..., 16, 16)-minor tensors that tile at 1/8 lane
occupancy, and the head-split reshapes materialize full copies. Profiling
the 320x512 UNet forward put the temporal attention cores at ~48 ms for
0.017 TFLOP (1.4 TFLOP/s).

TPU-native answer: per grid step a (Ptile, T, d) block of pixels for one
head is resident in VMEM; QK^T and PV run as pixel-batched MXU dots, the
fp32 softmax never leaves VMEM, and q/k/v/out cross HBM exactly once.
Measured (v5e, chained): 2.4/2.0/1.7 ms vs 4.5/2.4/1.8 ms for the einsum
path on the ds=1/2/4 sites — and the surrounding reshape/convert/softmax
glue disappears entirely.

Layout contract: the caller runs the whole temporal transformer in
(B, P, T, C) layout (one transpose on entry/exit of the transformer), so
projections produce (B, P, T, inner) naturally; this module only pays one
T<->heads swap per tensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import os as _os

_INTERPRET = False  # set True to debug off-TPU
# A/B knobs, read ONCE at import (flipping them later in a process that
# already compiled has no effect — fresh process per A/B):
#   TC_TATTN_PACK: block-diagonal pixel packing inside the kernels
#   TC_TATTN_PAIR: fuse attn1+attn2 into one kernel per temporal block
_PACK = _os.environ.get("TC_TATTN_PACK", "1") == "1"
_PAIR = _os.environ.get("TC_TATTN_PAIR", "1") == "1"


from tooncrafter_tpu.ops import _dispatch


def _on_tpu() -> bool:
    return _dispatch.on_tpu()


def _pick_ptile(p: int, inner: int, t: int,
                budget: int = 6 * 1024 * 1024) -> int:
    """Largest pixel tile whose (pt, T, inner) bf16 block fits the VMEM
    budget (4 blocks double-buffered under the 100 MB limit)."""
    for blk in (512, 256, 160, 128, 64, 32, 16, 8):
        if p % blk == 0 and t * blk * inner * 2 <= budget:
            return blk
    return 0


def use_kernel(t: int, p: int, d: int, *, mask=None, rel_k=None,
               rel_v=None, inner: int = 0) -> bool:
    """Kernel coverage: plain self-attention (no causal mask, no
    relative-position bias — the shipped ToonCrafter config uses neither),
    T small enough to keep (pt, T, T) logits in VMEM, d lane-native."""
    return (mask is None and rel_k is None and rel_v is None
            and t <= 32 and d in (64, 128) and p >= 128
            and _pick_ptile(p, inner or d, t) >= 64
            and (_on_tpu() or _INTERPRET))


def _xla_ptc(q, k, v, heads: int, scale: float):
    """Differentiable XLA reference form of the per-pixel T-attention,
    same fp32-softmax semantics as the kernel."""
    b, p, t, inner = q.shape
    d = inner // heads
    qh = q.reshape(b, p, t, heads, d)
    kh = k.reshape(b, p, t, heads, d)
    vh = v.reshape(b, p, t, heads, d)
    logits = jnp.einsum("bpthd,bpshd->bphts", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bphts,bpshd->bpthd", probs, vh,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.reshape(b, p, t, inner)


@functools.partial(jax.jit, static_argnames=("heads", "scale"))
def _ptc_kernel_call(q, k, v, *, heads: int, scale: float):
    """q,k,v: (B, P, T, heads*d) -> out (B, P, T, heads*d).

    Heads stay packed in the minor axis — blocks carry the full `inner`
    dim and each head is a static lane slice inside the kernel (measured
    faster than splitting heads into a grid axis, which costs a
    materialized T<->heads transpose per tensor)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, p, t, inner = q.shape
    d = inner // heads
    pt = _pick_ptile(p, inner, t)
    n_p = p // pt

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            qb = q_ref[0, :, :, sl]   # (pt, T, d)
            kb = k_ref[0, :, :, sl]
            vb = v_ref[0, :, :, sl]
            logits = jax.lax.dot_general(
                qb, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # (pt, T, T)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(vb.dtype)
            out = jax.lax.dot_general(
                probs, vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # (pt, T, d)
            o_ref[0, :, :, sl] = out.astype(o_ref.dtype)

    spec = pl.BlockSpec((1, pt, t, inner), lambda bi, pi: (bi, pi, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(b, n_p),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, p, t, inner), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ptc(q, k, v, heads: int, scale: float):
    return _ptc_kernel_call(q, k, v, heads=heads, scale=scale)


def _ptc_fwd(q, k, v, heads, scale):
    return _ptc(q, k, v, heads, scale), (q, k, v)


def _ptc_bwd(heads, scale, res, g):
    # backward recomputes through the differentiable XLA form (house
    # pattern, see ops/temporal_conv.py) so the Pallas forward stays a
    # leaf — without this, jax.grad through a training step on TPU dies
    # inside the pallas_call
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_ptc(a, b, c, heads, scale),
                     q, k, v)
    return vjp(g)


_ptc.defvjp(_ptc_fwd, _ptc_bwd)


def temporal_attention_ptc(q, k, v, *, heads: int, scale: float):
    """Per-pixel attention over T, (B, P, T, heads*d) in/out; Pallas
    kernel forward (coverage per `use_kernel`), XLA-recompute backward."""
    return _ptc(q, k, v, heads, scale)


# ---------------------------------------------------------------------------
# Fused temporal-attention BLOCK kernel: LayerNorm -> packed QKV GEMM ->
# per-pixel T-attention -> out-projection -> +residual, one HBM round trip.
#
# Motivation (round-3 in-loop trace, tools/profile_denoise.py): the unfused
# arrangement spends ~12 ms/forward around the temporal attention cores —
# three separate QKV dots each followed by a ~0.9 ms retiling copy into the
# _ptc kernel's layout, the standalone LayerNorm passes, the to_out dot's
# layout copy, and the residual-add pass. All of it is traffic over the same
# (B, P, T, C) activation this kernel now keeps resident in VMEM.
#
# Rebuilds the attn1/attn2 sub-blocks of the reference TemporalTransformer
# (`lvdm/modules/attention.py:236-247` BasicTransformerBlock norm+attn,
# self-attention instance) with identical rounding: LN stats in f32
# (ops/norms.layer_norm), bf16 GEMM outputs, f32 softmax.
# ---------------------------------------------------------------------------


def _fused_vmem(pt: int, t: int, c: int, inner: int) -> int:
    tok = pt * t
    io = 4 * tok * c * 2                     # x in + out, double-buffered
    w = (c * 3 * inner + inner * c) * 2      # wqkv + wout, bf16, resident
    z = tok * c * 2                          # normalized tile
    qkv = tok * 3 * inner * 2                # packed projections
    o = tok * inner * 2                      # attention output
    acc = tok * c * 4                        # out-GEMM f32 accumulator
    blk = 128 if (t <= 128 and 128 % t == 0) else t   # pixel packing
    logits = tok * blk * 4 * 2               # per-head logits + probs
    return io + w + z + qkv + o + acc + logits


def _pick_ptile_fused(p: int, t: int, c: int, inner: int,
                      budget: int = 64 * 1024 * 1024) -> int:
    # tile-sweep preference at the UNet temporal shapes
    # (tools/bench_ff4.py --only tattn, .audit_r03.jsonl): the largest
    # fitting tile is NOT best — ds1 (P=2560, C=320) prefers pt=160,
    # ds2 (P=640, C=640) prefers pt=64
    pref = {(2560, 320): 160, (640, 640): 64}.get((p, c))
    if pref and p % pref == 0 \
            and _fused_vmem(pref, t, c, inner) <= budget:
        return pref
    for blk in (512, 256, 160, 128, 80, 64, 40, 32, 16, 8):
        if p % blk == 0 and _fused_vmem(blk, t, c, inner) <= budget:
            return blk
    return 0


def use_fused_kernel(t: int, p: int, d: int, c: int, inner: int) -> bool:
    """Coverage for the fused LN+QKV+attention+out block kernel: the plain
    self-attention shapes of `use_kernel`, plus lane-friendly widths for
    the in-kernel GEMMs. Unlike `use_kernel`, small pixel counts are in
    coverage (the UNet mid block, P=40: the 5-D einsum fallback lowers
    its (B,H,W,heads,T,T) softmax pathologically — ~6 ms/step in the
    round-3 in-loop trace for 40 pixels)."""
    return (t <= 32 and d in (64, 128) and p >= 32
            and c % 64 == 0 and inner % 64 == 0
            and _pick_ptile_fused(p, t, c, inner) >= 32
            and (_on_tpu() or _INTERPRET))


def _xla_fused_tattn(x, lnw, lnb, wqkv, wout, bout, heads: int,
                     scale: float, eps: float):
    """Differentiable XLA form — exactly the unfused module arrangement:
    layer_norm -> three Dense(no-bias) projections -> per-pixel attention
    -> Dense out-projection -> residual add."""
    from tooncrafter_tpu.ops import norms

    cdt = x.dtype
    inner = wout.shape[0]
    z = norms.layer_norm(x, lnw, lnb, eps)
    qkv = jnp.dot(z, wqkv.astype(cdt))
    q = qkv[..., :inner]
    k = qkv[..., inner:2 * inner]
    v = qkv[..., 2 * inner:]
    o = _xla_ptc(q, k, v, heads, scale)
    y = jnp.dot(o, wout.astype(cdt)) + bout.astype(cdt)
    return x + y


def _fused_tattn_call(x, lnw, lnb, wqkv, wout, bout, heads: int,
                      scale: float, eps: float):
    """x: (B, P, T, C) bf16; lnw/lnb: (C,) f32; wqkv: (C, 3*inner);
    wout: (inner, C); bout: (C,). Returns x + attn_block(x)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, p, t, c = x.shape
    inner = wout.shape[0]
    d = inner // heads
    pt = _pick_ptile_fused(p, t, c, inner)
    cdt = x.dtype

    def kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, wout_ref, bout_ref,
               o_ref):
        o_ref[0] = _attn_stage(
            x_ref[0], lnw_ref, lnb_ref, wqkv_ref, wout_ref, bout_ref,
            pt=pt, t=t, c=c, inner=inner, heads=heads, scale=scale,
            eps=eps, cdt=cdt)

    spec = pl.BlockSpec((1, pt, t, c), lambda bi, pi: (bi, pi, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(b, p // pt),
        in_specs=[
            spec,
            pl.BlockSpec((1, c), lambda bi, pi: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, pi: (0, 0)),
            pl.BlockSpec((c, 3 * inner), lambda bi, pi: (0, 0)),
            pl.BlockSpec((inner, c), lambda bi, pi: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, pi: (0, 0)),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, p, t, c), cdt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x, lnw.reshape(1, c), lnb.reshape(1, c), wqkv,
      wout, bout.reshape(1, c))


# ---------------------------------------------------------------------------
# Fused temporal attn1+attn2 PAIR kernel.
#
# In the UNet's temporal BasicTransformerBlock both attention sub-blocks are
# self-attention over T with identical geometry (reference
# `lvdm/modules/attention.py:236-247` — attn2 gets context=None in the
# TemporalTransformer), and the round-3 in-loop trace shows the two fused
# sub-block kernels back-to-back on the same activation (attn2.N consumes
# attn1.N directly, 0.90+0.91 ms at the ds1 sites). Running both stages in
# one kernel halves the HBM round-trips and grid launches: x crosses HBM
# once for the whole pair instead of twice.
# ---------------------------------------------------------------------------


def _pair_vmem(pt: int, t: int, c: int, inner: int) -> int:
    tok = pt * t
    io = 4 * tok * c * 2
    w = 2 * (c * 3 * inner + inner * c) * 2      # both stages' weights
    z = tok * c * 2
    qkv = tok * 3 * inner * 2
    o = tok * inner * 2
    acc = tok * c * 4
    blk = 128 if (t <= 128 and 128 % t == 0) else t
    logits = tok * blk * 4 * 2
    return io + w + z + qkv + o + acc + logits


def _pick_ptile_pair(p: int, t: int, c: int, inner: int,
                     budget: int = 64 * 1024 * 1024) -> int:
    pref = {(2560, 320): 160, (640, 640): 64}.get((p, c))
    if pref and p % pref == 0 and _pair_vmem(pref, t, c, inner) <= budget:
        return pref
    for blk in (512, 256, 160, 128, 80, 64, 40, 32, 16, 8):
        if p % blk == 0 and _pair_vmem(blk, t, c, inner) <= budget:
            return blk
    return 0


def use_pair_kernel(t: int, p: int, d: int, c: int, inner: int) -> bool:
    """Coverage for the fused attn1+attn2 pair kernel — the fused
    sub-block conditions with VMEM room for both stages' weights."""
    return (_PAIR and t <= 32 and d in (64, 128) and p >= 32
            and c % 64 == 0 and inner % 64 == 0
            and _pick_ptile_pair(p, t, c, inner) >= 32
            and (_on_tpu() or _INTERPRET))


def _attn_stage(xb, lnw_ref, lnb_ref, wqkv_ref, wout_ref, bout_ref,
                *, pt, t, c, inner, heads, scale, eps, cdt):
    """One  x + to_out(T-attention(qkv(ln(x))))  stage on a resident
    (pt, T, C) tile; shared by the single and pair kernels."""
    d = inner // heads
    xf = xb.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    z = (xf - mean) * jax.lax.rsqrt(var + eps)
    z = z * lnw_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    z2 = z.astype(cdt).reshape(pt * t, c)
    grp = 128 // t if (t <= 128 and 128 % t == 0) else 0
    packed = _PACK and grp > 1 and pt % grp == 0
    nb_, blk = (pt // grp, grp * t) if packed else (pt, t)
    qkv = jax.lax.dot_general(
        z2, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) \
        .reshape(nb_, blk, 3 * inner)
    if packed:
        ri = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
        bd_mask = jnp.where((ri // t) == (ci // t), 0.0,
                            -1e30).astype(jnp.float32)[None]
    outs = []
    for h in range(heads):
        qb = qkv[:, :, h * d:(h + 1) * d]
        kb = qkv[:, :, inner + h * d:inner + (h + 1) * d]
        vb = qkv[:, :, 2 * inner + h * d:2 * inner + (h + 1) * d]
        logits = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if packed:
            logits = logits + bd_mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
        outs.append(jax.lax.dot_general(
            probs, vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(cdt))
    o = jnp.concatenate(outs, axis=-1).reshape(pt * t, inner)
    y = jax.lax.dot_general(
        o, wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) + bout_ref[0]
    return xb + y.reshape(pt, t, c)


def _fused_tpair_call(x, p1, p2, heads: int, scale: float, eps: float):
    """x: (B, P, T, C); p1/p2: (lnw, lnb, wqkv, wout, bout) for the two
    attention stages. Returns stage2(stage1(x))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, p, t, c = x.shape
    inner = p1[3].shape[0]
    pt = _pick_ptile_pair(p, t, c, inner)
    cdt = x.dtype

    def kernel(x_ref, ln1w, ln1b, wqkv1, wout1, bout1,
               ln2w, ln2b, wqkv2, wout2, bout2, o_ref):
        kw = dict(pt=pt, t=t, c=c, inner=inner, heads=heads,
                  scale=scale, eps=eps, cdt=cdt)
        y = _attn_stage(x_ref[0], ln1w, ln1b, wqkv1, wout1, bout1, **kw)
        o_ref[0] = _attn_stage(y, ln2w, ln2b, wqkv2, wout2, bout2, **kw)

    spec = pl.BlockSpec((1, pt, t, c), lambda bi, pi: (bi, pi, 0, 0))
    vec = pl.BlockSpec((1, c), lambda bi, pi: (0, 0))
    wspec = [vec, vec,
             pl.BlockSpec((c, 3 * inner), lambda bi, pi: (0, 0)),
             pl.BlockSpec((inner, c), lambda bi, pi: (0, 0)),
             vec]
    args = []
    for stage in (p1, p2):
        lnw, lnb, wqkv, wout, bout = stage
        args += [lnw.reshape(1, c), lnb.reshape(1, c), wqkv, wout,
                 bout.reshape(1, c)]
    return pl.pallas_call(
        kernel,
        grid=(b, p // pt),
        in_specs=[spec] + wspec + wspec,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, p, t, c), cdt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x, *args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _fused_tpair(x, ln1w, ln1b, wqkv1, wout1, bout1,
                 ln2w, ln2b, wqkv2, wout2, bout2, heads, scale, eps):
    return _fused_tpair_call(x, (ln1w, ln1b, wqkv1, wout1, bout1),
                             (ln2w, ln2b, wqkv2, wout2, bout2),
                             heads, scale, eps)


def _fused_tpair_fwd(x, ln1w, ln1b, wqkv1, wout1, bout1,
                     ln2w, ln2b, wqkv2, wout2, bout2, heads, scale, eps):
    out = _fused_tpair(x, ln1w, ln1b, wqkv1, wout1, bout1,
                       ln2w, ln2b, wqkv2, wout2, bout2, heads, scale, eps)
    return out, (x, ln1w, ln1b, wqkv1, wout1, bout1,
                 ln2w, ln2b, wqkv2, wout2, bout2)


def _fused_tpair_bwd(heads, scale, eps, res, g):
    (x, ln1w, ln1b, wqkv1, wout1, bout1,
     ln2w, ln2b, wqkv2, wout2, bout2) = res

    def ref(x_, a1w, a1b, q1, o1, b1, a2w, a2b, q2, o2, b2):
        y = _xla_fused_tattn(x_, a1w, a1b, q1, o1, b1,
                             heads=heads, scale=scale, eps=eps)
        return _xla_fused_tattn(y, a2w, a2b, q2, o2, b2,
                                heads=heads, scale=scale, eps=eps)

    _, vjp = jax.vjp(ref, x, ln1w, ln1b, wqkv1, wout1, bout1,
                     ln2w, ln2b, wqkv2, wout2, bout2)
    return vjp(g)


_fused_tpair.defvjp(_fused_tpair_fwd, _fused_tpair_bwd)


def fused_temporal_attn_pair(x, attn1, attn2, *, heads: int, scale: float,
                             eps: float = 1e-5):
    """Both temporal attention sub-blocks of a BasicTransformerBlock in
    one kernel:

        y  = x + to_out1(ptc_attn(qkv1(ln1(x))))
        out = y + to_out2(ptc_attn(qkv2(ln2(y))))

    attn1/attn2: (ln, wq, wk, wv, wout, bout) with ln a (weight, bias)
    pair. Numerically identical to two `fused_temporal_attn` calls;
    Pallas forward (coverage per `use_pair_kernel`), XLA-recompute
    backward."""
    cdt = x.dtype
    flat = []
    for ln, wq, wk, wv, wout, bout in (attn1, attn2):
        wqkv = jnp.concatenate([wq, wk, wv], axis=1).astype(cdt)
        flat += [ln[0], ln[1], wqkv, wout.astype(cdt), bout.astype(cdt)]
    return _fused_tpair(x, *flat, heads, scale, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _fused_tattn(x, lnw, lnb, wqkv, wout, bout, heads, scale, eps):
    return _fused_tattn_call(x, lnw, lnb, wqkv, wout, bout,
                             heads=heads, scale=scale, eps=eps)


def _fused_tattn_fwd(x, lnw, lnb, wqkv, wout, bout, heads, scale, eps):
    return _fused_tattn(x, lnw, lnb, wqkv, wout, bout, heads, scale,
                        eps), (x, lnw, lnb, wqkv, wout, bout)


def _fused_tattn_bwd(heads, scale, eps, res, g):
    x, lnw, lnb, wqkv, wout, bout = res
    _, vjp = jax.vjp(
        lambda *a: _xla_fused_tattn(*a, heads=heads, scale=scale, eps=eps),
        x, lnw, lnb, wqkv, wout, bout)
    return vjp(g)


_fused_tattn.defvjp(_fused_tattn_fwd, _fused_tattn_bwd)


def fused_temporal_attn(x, ln, wq, wk, wv, wout, bout, *, heads: int,
                        scale: float, eps: float = 1e-5):
    """One-kernel temporal attention sub-block on (B, P, T, C):

        x + to_out(ptc_attention(to_q(ln(x)), to_k(ln(x)), to_v(ln(x))))

    `ln` is the (weight, bias) pair of the preceding LayerNorm; wq/wk/wv
    are the nn.Dense(no-bias) kernels, wout/bout the out-projection.
    Numerically matches the unfused module chain at fp32-stat tolerance;
    Pallas forward (coverage per `use_fused_kernel`), XLA-recompute
    backward."""
    cdt = x.dtype
    wqkv = jnp.concatenate([wq, wk, wv], axis=1).astype(cdt)
    return _fused_tattn(x, ln[0], ln[1], wqkv, wout.astype(cdt),
                        bout.astype(cdt), heads, scale, eps)
