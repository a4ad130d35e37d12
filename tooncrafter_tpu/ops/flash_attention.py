"""Pallas flash-attention for TPU, with an XLA fallback.

Replaces the reference's xformers `memory_efficient_attention` /
torch-SDPA dispatch (`lvdm/modules/attention.py:146-209`,
`lvdm/modules/attention_svd.py:332-336`). The kernel is written for the
shapes this model actually produces:

  * UNet spatial self-attn: Sq = Sk = h*w in {2560, 640, 160}, D = 64
  * dual-ref fusion attn:   Sq up to 10240, Sk = 2*Sq, D = 64
  * VAE mid attn:           Sq = Sk = 2560, single head D = 512
  * everything else (cross 77/16/257 tokens, temporal t=16) is tiny and
    runs better through plain XLA fusion.

The TPU kernel processes Q in 512-row blocks against KV in 512-row blocks
with an online-softmax accumulator held in VMEM.

For the moderate KV lengths the UNet emits (Sk <= 4096) a single-pass
variant is dispatched instead: the whole KV is resident per q block, so
the softmax is exact in one shot — no running-max corrections, no
accumulator rescale multiplies on the score tile — and log2(e) is folded
into the QK scale so the exp lowers to a bare exp2. A/B on v5e
(tools/bench_flash3.py): ds1 2560x2560x64 6.32 -> 5.62 ms, ds2
640x640x64 2.55 -> 2.07 ms, bitwise-comparable outputs (max |diff| at
bf16 resolution). The two-pass kernel remains for the dual-ref fusion
site (Sk up to 20480, score tile would blow VMEM).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_INTERPRET = False  # set True to debug the kernel off-TPU


from tooncrafter_tpu.ops import _dispatch


def _on_tpu() -> bool:
    return _dispatch.on_tpu()


def _pick_block(s: int) -> int:
    """Largest MXU-aligned tile that divides the sequence exactly (the
    kernel has no ragged-block masking)."""
    # 192 covers the 1024-model ds4 level (18x32 = 576 tokens = 3*192);
    # every 512-model seq already divides a larger block
    for blk in (1280, 1024, 768, 640, 512, 384, 320, 256, 192, 160, 128):
        if s % blk == 0:
            return blk
    return 0


def _pick_fwd_blocks(sq: int, sk: int):
    """(blk_q, blk_k) for the forward kernel — swept on v5e at the REAL
    folded fusion shapes (tools/bench_fusion2.py; the earlier
    tools/bench_flash2.py sweep used the per-frame Sq=10240 proxy).
    Level-2 site (8, 163840x20480, d=64): block choice is a wash —
    104.4-109.8 ms across (1024,2048)/(512,4096)/(256,20480)/... —
    the kernel is pinned at ~65 TF/s by d=64 (half-MXU contraction)
    plus the per-score VPU softmax work; (512,2048) measured best.
    Level-3 site (8, 40960x5120): whole-KV blocks won standalone
    (11.2 ms (512,5120) vs 12.6 ms (1024,2048)) but BOTH standalone
    winners measured at-or-above the shipped config inside the full
    decode (354.5/355.5 vs 349-355 run spread) — in-context, the
    fusion sites are insensitive to blocks, so the widely-tested
    (1024, widest-bk) choice stays. The ds1 narrow-q standalone
    winner (5.64 vs 6.40 ms) likewise measured SLOWER inside the
    full UNet (288.6 vs 285.7 ms) — kept out."""
    if max(sq, sk) >= 8192 and sq % 1024 == 0 and sk % 1024 == 0:
        for bk in (2048, 1024):
            if sk % bk == 0:
                return 1024, bk
    return _pick_block(sq), _pick_block(sk)


def _use_kernel(sq: int, sk: int, d: int) -> bool:
    # Covers every self-attention the model emits (h*w in {2560,640,160},
    # dual-ref fusion 2*S): the XLA fallback materializes fp32 logits in
    # HBM, which at >=160 tokens costs more than the kernel's one pass.
    # Token counts below 160 (cross-attn over 77/93/16/257 ctx) stay on the
    # XLA path — measured faster through one fused softmax.
    return (sq >= 160 and sk >= 160 and d % 128 in (0, 64) and d <= 512
            and _pick_block(sq) > 0 and _pick_block(sk) > 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: Optional[float] = None):
    """q,k,v: (B, S, H, D) -> (B, Sq, H, D).

    Differentiable: the backward runs the blockwise flash-backward Pallas
    kernels (O(S) memory — no SqxSk score matrix materializes), with an XLA
    fallback for shapes the kernels don't tile."""
    return _flash_fwd_impl(q, k, v, scale)


def _flash_fwd(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    q, k, v = res
    b, sq, h, d = q.shape
    sk = k.shape[1]
    s = d ** -0.5 if scale is None else scale
    if (_on_tpu() or _INTERPRET) and _use_kernel(sq, sk, d):
        fold = lambda t: t.transpose(0, 2, 1, 3).reshape(b * h, t.shape[1], d)
        unfold = lambda t, sl: t.reshape(b, h, sl, d).transpose(0, 2, 1, 3)
        dq, dk, dv = _flash_bwd_bh(fold(q), fold(k), fold(v), fold(g), s)
        return unfold(dq, sq), unfold(dk, sk), unfold(dv, sk)
    from tooncrafter_tpu.ops.attention import dot_product_attention

    _, vjp = jax.vjp(
        lambda q_, k_, v_: dot_product_attention(q_, k_, v_, scale=s),
        q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_bwd_bh(q, k, v, dout, scale: float):
    """Blockwise flash attention backward for (BH, S, D) operands.

    Standard formulation (Dao 2022): recompute p = exp(qk*scale - lse) per
    block; D = rowsum(dout*out);
      dv = p^T dout;  ds = p * (dout v^T - D);  dq = ds k * scale;
      dk = ds^T q * scale.
    Two kernels: one grids over q-blocks (dq), one over kv-blocks (dk, dv).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, sq, d = q.shape
    sk = k.shape[1]
    blk_q = _pick_block(sq)
    blk_k = _pick_block(sk)
    n_q = sq // blk_q
    n_k = sk // blk_k

    # recompute lse + D in one cheap pass via the forward kernel + XLA
    out, lse = _flash_bh_with_lse(q, k, v, scale)
    dmat = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1, keepdims=True)                    # (BH, Sq, 1)

    def dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref, dq_ref, acc):
        kv_i = pl.program_id(2)

        @pl.when(kv_i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        qb = q_ref[0]
        kb = k_ref[0]
        vb = v_ref[0]
        dob = do_ref[0].astype(jnp.float32)
        s_ = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s_ - lse_ref[0])                          # (bq, bk)
        dp = jax.lax.dot_general(dob.astype(vb.dtype), vb,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - d_ref[0])                              # (bq, bk) fp32
        acc[:] += jax.lax.dot_general(
            ds.astype(kb.dtype), kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        @pl.when(kv_i == n_k - 1)
        def _():
            dq_ref[0] = acc[:].astype(dq_ref.dtype)

    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(q, k, v, dout, lse, dmat)

    def dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref,
                   dk_ref, dv_ref, acc_k, acc_v):
        q_i = pl.program_id(2)

        @pl.when(q_i == 0)
        def _():
            acc_k[:] = jnp.zeros_like(acc_k)
            acc_v[:] = jnp.zeros_like(acc_v)

        qb = q_ref[0]
        kb = k_ref[0]
        vb = v_ref[0]
        dob = do_ref[0].astype(jnp.float32)
        s_ = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s_ - lse_ref[0])                          # (bq, bk)
        acc_v[:] += jax.lax.dot_general(
            p.astype(dob.dtype), dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (bk, d)
        dp = jax.lax.dot_general(dob.astype(vb.dtype), vb,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - d_ref[0])
        acc_k[:] += jax.lax.dot_general(
            ds.astype(qb.dtype), qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # (bk, d)

        @pl.when(q_i == n_q - 1)
        def _():
            dk_ref[0] = acc_k[:].astype(dk_ref.dtype)
            dv_ref[0] = acc_v[:].astype(dv_ref.dtype)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, blk_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, blk_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, blk_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, blk_k, d), lambda b, j, i: (b, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((blk_k, d), jnp.float32),
                        pltpu.VMEM((blk_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(q, k, v, dout, lse, dmat)
    return dq, dk, dv


def _flash_fwd_impl(q, k, v, scale: Optional[float] = None):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    if not (_on_tpu() or _INTERPRET) or not _use_kernel(sq, sk, d):
        from tooncrafter_tpu.ops.attention import dot_product_attention
        return dot_product_attention(q, k, v, scale=scale)
    # (the stock jax.experimental tpu flash kernel was measured 2.8x slower
    # than this one on the model's 2560-token/64-dim shapes)
    # barrier: without it XLA fuses the head-fold transpose below INTO
    # the producing q/k/v projection matmuls, forcing a {1,2,0} output
    # layout that runs them at ~8.6 TF/s (traced); split apart, the
    # matmul runs at full rate and the transpose is one bandwidth copy
    q, k, v = jax.lax.optimization_barrier((q, k, v))
    # fold batch and heads; our kernel runs per (b*h)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    out = _flash_bh(qf, kf, vf, scale)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_bh(q, k, v, scale: float):
    """(BH, Sq, D) x (BH, Sk, D) flash attention via Pallas."""
    out, _ = _flash_bh_with_lse(q, k, v, scale)
    return out


_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _single_pass_blk(sq: int, sk: int, d: int) -> int:
    """q-block size for the single-pass kernel, or 0 if the resident-KV
    score tile would not fit VMEM comfortably (then the two-pass online
    kernel runs). Budget: f32 score tile + bf16 probs copy + resident
    K/V + double-buffered q/out, under the 100 MB scoped-vmem limit.
    Sk is capped at 4096 — the swept envelope (ds1/ds2/ds4 self-attn);
    beyond it only narrow q blocks fit, a regime the block sweep showed
    losing in context at the dual-ref fusion site."""
    if sk > 4096:
        return 0
    for bq in (1280, 1024, 768, 640, 512, 384, 320, 256, 160, 128):
        if sq % bq:
            continue
        score = bq * sk * 4 + bq * sk * 2          # s f32 + p bf16
        kv = 3 * sk * d * 2 * 2                    # k + 2d-wide v, db
        io = 2 * (bq * d * 2) * 2 + bq * d * 4     # q/out db + f32 acc
        if score + kv + io <= 60 * 1024 * 1024:
            return bq
    return 0


@functools.partial(jax.jit, static_argnames=("scale", "blk_q"))
def _flash_bh_single(q, k, v, scale: float, blk_q: int):
    """Single-pass forward: whole KV resident per q block (Sk small
    enough that the [blk_q, Sk] f32 score tile fits VMEM). Exact
    softmax in one sweep; scale*log2(e) folded into the QK product so
    the exponent is a bare exp2; row-sum divide applied to the [bq, d]
    accumulator instead of the [bq, Sk] probs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, sq, d = q.shape
    sk = k.shape[1]
    n_q = sq // blk_q
    s2 = scale * _LOG2E
    # onescol (see _flash_bh_with_lse): the PV dot's idle output lanes
    # emit the row-sum, killing the (blk_q, Sk) lane-sum reduction
    v = jnp.concatenate([v, jnp.ones((bh, sk, d), v.dtype)], axis=-1)

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
        qb = q_ref[0]
        kb = k_ref[0]
        vb = v_ref[0]
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * s2
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        acc = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [p@v | rowsum(p)]
        o_ref[0] = (acc[:, :d] / acc[:, d:]).astype(o_ref.dtype)
        lse_ref[0] = (m + jnp.log2(acc[:, d:d + 1])) * _LN2

    return pl.pallas_call(
        kernel,
        grid=(bh, n_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, sk, 2 * d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda b, i: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(q, k, v)


def _mh_blk(sq: int, sk: int, c: int, heads: int) -> int:
    """q-block size for the packed multi-head kernel, or 0.

    Envelope: every head dim the model emits is 64; single KV pass must
    fit (sk <= 4096); small q blocks pipeline better here than the
    1280-row blocks of the per-(bh) kernel (swept in
    tools/bench_attn1.py: ds1 best at 512/640, ds2 at 320, ds4 at 160).
    Self-attention only (sq == sk): cross-attention with the model's
    small KV (77/256 ctx tokens) measured 1.1-3x SLOWER through this
    kernel than XLA's fused einsum (tools/bench_cross_mh.py) — tiny
    per-head score matmuls starve the MXU there.
    """
    if sq != sk or c % heads or c // heads != 64 or sk > 9216:
        return 0
    if sk > 4096:
        # only the swept geometry is admitted (advisor r4): intermediate
        # lengths in (4096, 9216) would route here without measurement —
        # send them to the measured two-pass per-(bh) fallback instead
        if sk != 9216:
            return 0
        # 1024-model ds1 self-attn (S=9216, C=320): swept at the real
        # shape (tools/bench_attn1_1024.py) — bq=256 beats 128/384/512
        # AND the two-pass per-(bh) fallback (48.3 vs 52.4 ms/call),
        # and the token-major path drops the fold/unfold transposes.
        # The resident-KV VMEM check below still gates the fit.
        order = (256, 128)
    else:
        order = (512, 320, 256, 160, 128)
    for bq in order:
        if sq % bq:
            continue
        score = 2 * bq * sk * 4 + bq * sk * 2     # ~2 live f32 tiles + p
        kv = 2 * sk * c * 2 * 2                   # k + v, double-buffered
        io = 2 * (bq * c * 2) * 2
        if score + kv + io <= 60 * 1024 * 1024:
            return bq
    return 0


def use_packed_kernel(sq: int, c: int, heads: int) -> bool:
    """Can the packed-QKV multi-head kernel take this self-attention?"""
    return (_mh_blk(sq, sq, c, heads) > 0
            and (_on_tpu() or _INTERPRET))


@functools.partial(jax.jit, static_argnames=("heads", "scale", "blk_q"))
def _flash_mh(q, k, v, heads: int, scale: float, blk_q: int):
    """q,k,v: (B, S, H*D) token-major (lane-packed heads).

    Single-pass flash attention with all heads processed inside one
    grid step via static lane subranges — no fold/unfold transposes and
    no barrier copies exist anywhere on this path. Returns (B, S, H*D)
    token-major, ready for to_out. (Binding one packed (B,S,3C) array
    three times would save the q/k/v slices too, but Mosaic requires
    block minor dims to be 128-multiples or the full array dim, and
    C=320 slices of a 960-wide array violate that — the sliced form is
    what the A/B in tools/bench_attn1.py measured winning.)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, c = q.shape
    sk = k.shape[1]
    d = c // heads
    n_q = s // blk_q
    s2 = scale * _LOG2E

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[0]            # (blk_q, H*D)
        kb = k_ref[0]            # (S, H*D)
        vb = v_ref[0]
        outs = []
        for h in range(heads):
            lo = h * d
            qh = qb[:, lo:lo + d]
            kh = kb[:, lo:lo + d]
            vh = vb[:, lo:lo + d]
            sc = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * s2
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp2(sc - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append((acc / l).astype(o_ref.dtype))
        o_ref[0] = jnp.concatenate(outs, axis=-1)

    return pl.pallas_call(
        kernel,
        grid=(b, n_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, sk, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, sk, c), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, c), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(q, k, v)


def _flash_mh_ones(q, k, v, heads: int, scale: float, blk_q: int):
    """MEASURED DEAD END — nothing dispatches here (r5 closure
    `attn1_1024_onescol_closure_r5`: wash at S=9216, loss at S=2304 —
    the doubled V footprint cancels the lane-sum saving). Kept with its
    interpret parity test as the record of the experiment; delete
    freely if the mh kernel's structure changes.

    onescol variant of _flash_mh (r5): V is interleaved per-head with
    a d-wide ones block OUTSIDE the kernel ((B, S, H*2D)), so each
    head's PV dot emits [p@v | rowsum(p)] from the MXU's otherwise-idle
    output lanes (d=64 of 128) in one (blk_q, 2d) op — killing the
    per-head (blk_q, Sk) f32 lane-sum the VPU otherwise runs. The 2d=128
    V lane slices are also Mosaic-native. Same mechanism as
    _flash_bh_single's onescol (r4, -11% at the dual-ref fusion site)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, c = q.shape
    sk = k.shape[1]
    d = c // heads
    n_q = s // blk_q
    s2 = scale * _LOG2E
    v2 = jnp.concatenate(
        [v.reshape(b, sk, heads, d),
         jnp.ones((b, sk, heads, d), v.dtype)],
        axis=-1).reshape(b, sk, heads * 2 * d)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[0]            # (blk_q, H*D)
        kb = k_ref[0]            # (S, H*D)
        vb = v_ref[0]            # (S, H*2D) — per-head [v | ones]
        outs = []
        for h in range(heads):
            lo = h * d
            qh = qb[:, lo:lo + d]
            kh = kb[:, lo:lo + d]
            vh = vb[:, 2 * lo:2 * lo + 2 * d]
            sc = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * s2
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp2(sc - m)
            acc = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [p@v | rowsum]
            outs.append((acc[:, :d] / acc[:, d:d + 1])
                        .astype(o_ref.dtype))
        o_ref[0] = jnp.concatenate(outs, axis=-1)

    return pl.pallas_call(
        kernel,
        grid=(b, n_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, sk, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, sk, 2 * c), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, c), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(q, k, v2)


def _xla_mh(q, k, v, heads: int, scale):
    from tooncrafter_tpu.ops.attention import dot_product_attention

    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // heads
    out = dot_product_attention(q.reshape(b, sq, heads, d),
                                k.reshape(b, sk, heads, d),
                                v.reshape(b, sk, heads, d), scale=scale)
    return out.reshape(b, sq, c)


def use_mh_kernel(sq: int, sk: int, c: int, heads: int) -> bool:
    """Can the token-major multi-head kernel take this attention?"""
    return (_mh_blk(sq, sk, c, heads) > 0
            and (_on_tpu() or _INTERPRET))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_mh(q, k, v, heads: int,
                       scale: Optional[float] = None):
    """Attention over token-major (B, S, H*D) projections — q and k/v
    may come from different sources (cross-attention). Kernel path when
    `use_mh_kernel` holds; XLA fallback otherwise. Backward recomputes
    through the XLA form (house pattern)."""
    b, sq, c = q.shape
    sk = k.shape[1]
    sc = (c // heads) ** -0.5 if scale is None else scale
    blk = _mh_blk(sq, sk, c, heads)
    if (_on_tpu() or _INTERPRET) and blk:
        return _flash_mh(q, k, v, heads, sc, blk)
    return _xla_mh(q, k, v, heads, sc)


def _mh_fwd(q, k, v, heads, scale):
    return flash_attention_mh(q, k, v, heads, scale), (q, k, v)


def _mh_bwd(heads, scale, res, g):
    q, k, v = res
    sc = (q.shape[-1] // heads) ** -0.5 if scale is None else scale
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_mh(q_, k_, v_, heads, sc), q, k, v)
    return vjp(g)


flash_attention_mh.defvjp(_mh_fwd, _mh_bwd)


def _packed_direct_blk(s: int, c: int, heads: int) -> int:
    """q-block for binding the packed (B,S,3C) array straight into the
    kernel (two views: q-blocked + full KV-resident) with in-kernel
    64-aligned lane slicing — no materialized q/k/v slice copies.

    Measured envelope (tools/bench_attn1_packed.py, full LN+proj+attn+out
    complex): ds1 c=320 blk=512 6.14->5.40 ms, ds2 c=640 blk=640
    2.30->2.28; ds4 c=1280 LOSES (1.83->2.01, full-width KV blocks
    outweigh the small slice) so it keeps the sliced path."""
    if c % heads or c // heads != 64:
        return 0
    blk = {320: 512, 640: 640}.get(c, 0)
    return blk if blk and s % blk == 0 and s <= 4096 else 0


@functools.partial(jax.jit, static_argnames=("heads", "scale", "blk_q"))
def _flash_mh_packed(qkv, heads: int, scale: float, blk_q: int):
    """Packed-QKV single-pass flash: qkv (B, S, 3C) bound twice — a
    q-blocked view and a KV-resident full view — q/k/v carved out of the
    lane dim inside the kernel (64-aligned slices; BlockSpec minor dims
    stay full-width, which is what Mosaic requires)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    n_q = s // blk_q
    s2 = scale * _LOG2E

    def kernel(q_ref, kv_ref, o_ref):
        qb = q_ref[0]            # (blk_q, 3C) — q lanes [0:C)
        kvb = kv_ref[0]          # (S, 3C) — k lanes [C:2C), v [2C:3C)
        outs = []
        for h in range(heads):
            lo = h * d
            qh = qb[:, lo:lo + d]
            kh = kvb[:, c + lo:c + lo + d]
            vh = kvb[:, 2 * c + lo:2 * c + lo + d]
            sc = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * s2
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp2(sc - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append((acc / l).astype(o_ref.dtype))
        o_ref[0] = jnp.concatenate(outs, axis=-1)

    return pl.pallas_call(
        kernel,
        grid=(b, n_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, c3), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, s, c3), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, c), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(qkv, qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def flash_attention_packed(qkv, heads: int, scale: Optional[float] = None):
    """Self-attention over a packed (B, S, 3*H*D) projection.

    Kernel path when `use_packed_kernel` holds; XLA fallback otherwise.
    Backward recomputes through the XLA form (house pattern).
    """
    b, s, c3 = qkv.shape
    c = c3 // 3
    if scale is None:
        scale = (c // heads) ** -0.5
    if _on_tpu() or _INTERPRET:
        dblk = _packed_direct_blk(s, c, heads)
        if dblk:
            return _flash_mh_packed(qkv, heads, scale, dblk)
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    blk = _mh_blk(s, s, c, heads)
    if (_on_tpu() or _INTERPRET) and blk:
        return _flash_mh(q, k, v, heads, scale, blk)
    return _xla_mh(q, k, v, heads, scale)


def _packed_fwd(qkv, heads, scale):
    return flash_attention_packed(qkv, heads, scale), qkv


def _packed_bwd(heads, scale, qkv, g):
    c = qkv.shape[-1] // 3
    sc = (c // heads) ** -0.5 if scale is None else scale
    _, vjp = jax.vjp(
        lambda t: _xla_mh(t[..., :c], t[..., c:2 * c], t[..., 2 * c:],
                          heads, sc), qkv)
    return vjp(g)


flash_attention_packed.defvjp(_packed_fwd, _packed_bwd)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_bh_with_lse(q, k, v, scale: float):
    """Flash attention forward that also emits the per-row logsumexp
    (needed by the blockwise backward)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, sq, d = q.shape
    sk = k.shape[1]
    bq_single = _single_pass_blk(sq, sk, d)
    if bq_single:
        return _flash_bh_single(q, k, v, scale, bq_single)
    blk_q, blk_k = _pick_fwd_blocks(sq, sk)
    # `onescol`: pad V with a d-wide block of ONES so the PV dot's
    # otherwise-idle output lanes (N=64 of the MXU's 128) emit the
    # softmax row-sum for free — the per-half f32 lane-sum reduction
    # over (blk_q, blk_k) disappears and acc/l unify into one
    # (blk_q, 2d) accumulator updated elementwise (no lane extracts).
    # l now sums the SAME bf16-rounded p the PV dot consumes (f32
    # accumulate). A/B at the dual-ref inject_2 site (8, 163840x20480):
    # 101.1 -> 89.7 ms (tools/bench_flash5.py, .audit_r04.jsonl).
    v = jnp.concatenate([v, jnp.ones((bh, sk, d), v.dtype)], axis=-1)
    # Process several K half-blocks per grid step with a JOINT
    # running-max update: one K block per step serializes the
    # QK (MXU) -> softmax (VPU) -> PV (MXU) chain across the sweep;
    # with independent halves in one body the scheduler overlaps half
    # j's exp2 passes with half j+1's dots. Math = standard flash at
    # block size halves*blk_k (identical modulo f32 reassociation).
    # A/B at the dual-ref inject_2 site (8, 163840x20480, d=64):
    # 134.2 -> 124.3 ms standalone with halves=4 (tools/bench_flash4.py).
    halves = 1
    for h in (4, 2):
        if sk % (blk_k * h) == 0:
            halves = h
            break
    step_k = blk_k * halves
    n_q = pl.cdiv(sq, blk_q)
    n_k = pl.cdiv(sk, step_k)
    s2 = scale * _LOG2E  # exp2-domain softmax: exponent is a bare exp2

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref):
        kv_i = pl.program_id(2)

        @pl.when(kv_i == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)

        qb = q_ref[0]            # (blk_q, d)
        ss = []
        for h in range(halves):
            kb = k_ref[0, h * blk_k:(h + 1) * blk_k]
            ss.append(jax.lax.dot_general(
                qb, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s2)               # (blk_q, blk_k) fp32, log2 units

        m_prev = m_ref[:]         # (blk_q, 128) broadcast storage
        m_cur = jnp.max(ss[0], axis=-1, keepdims=True)      # (blk_q, 1)
        for s in ss[1:]:
            m_cur = jnp.maximum(m_cur, jnp.max(s, axis=-1, keepdims=True))
        m_new = jnp.maximum(m_prev[:, :1], m_cur)
        correction = jnp.exp2(m_prev[:, :1] - m_new)
        pv = None
        for h, s in enumerate(ss):
            p = jnp.exp2(s - m_new)                  # (blk_q, blk_k)
            vb = v_ref[0, h * blk_k:(h + 1) * blk_k]  # (blk_k, 2d) w/ ones
            t = jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                     # (blk_q, 2d): [p@v | rowsum(p)]
            pv = t if pv is None else pv + t
        acc_ref[:] = acc_ref[:] * correction + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

        @pl.when(kv_i == n_k - 1)
        def _finish():
            a = acc_ref[:]
            o_ref[0] = (a[:, :d] / a[:, d:]).astype(o_ref.dtype)
            lse_ref[0] = (m_ref[:, :1]
                          + jnp.log2(a[:, d:d + 1])) * _LN2

    grid = (bh, n_q, n_k)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, step_k, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, step_k, 2 * d), lambda b_, i, j: (b_, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda b_, i, j: (b_, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 2 * d), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(q, k, v)
    return out, lse
