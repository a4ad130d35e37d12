"""Pin which real model shapes take each Pallas kernel on TPU.

These encode measured decisions (tools/bench_convkernel.py,
bench_tconv.py, profile_unet.py on v5e): the temporal-conv and
temporal-attention kernels dispatch at the UNet/decoder shapes; the
spatial fused-conv kernel is default-off (XLA's conv fusion measured
faster at every UNet shape) but keeps a valid dispatch envelope behind
its opt-in flag. A refactor that silently changes an envelope fails
here, not in a TPU run three weeks later.
"""

import pytest

import tooncrafter_tpu.ops.spatial_conv as sc
import tooncrafter_tpu.ops.temporal_conv as tc
from tooncrafter_tpu.ops import temporal_attention as ta


@pytest.fixture(autouse=True)
def fake_tpu(monkeypatch):
    monkeypatch.setattr(sc, "_on_tpu", lambda: True)
    monkeypatch.setattr(tc, "_on_tpu", lambda: True)
    monkeypatch.setattr(ta, "_on_tpu", lambda: True)


def test_spatial_conv_defaults_to_xla():
    # measured slower than XLA at every UNet shape -> default off
    assert not sc._use_kernel(40, 64, 320, 320)


def test_spatial_conv_optin_envelope(monkeypatch):
    monkeypatch.setattr(sc, "_SPATIAL_CONV_PALLAS", True)
    # every UNet ResBlock conv shape must fit when opted in
    for h, w, cin, cout in [
        (40, 64, 320, 320), (40, 64, 640, 320), (40, 64, 320, 640),
        (20, 32, 640, 640), (20, 32, 1280, 640), (20, 32, 1920, 640),
        (10, 16, 1280, 1280), (10, 16, 2560, 1280),
    ]:
        assert sc._use_kernel(h, w, cin, cout), (h, w, cin, cout)
    # known fallbacks: 5x8 (too small), 960 (no 128-multiple divisor)
    assert not sc._use_kernel(5, 8, 1280, 1280)
    assert not sc._use_kernel(40, 64, 960, 320)


def test_temporal_conv_envelope():
    # UNet temporal stacks (ds1, ds2) and the dual-ref decoder's
    # 512ch level-2 / 128ch full-res stacks dispatch
    assert tc._use_kernel(16, 40 * 64, 320, 320)
    assert tc._use_kernel(16, 20 * 32, 640, 640)
    assert tc._use_kernel(16, 80 * 128, 512, 512)
    assert tc._use_kernel(16, 320 * 512, 128, 128)
    # known fallbacks: tiny-P high-C levels, channel-changing convs
    assert not tc._use_kernel(16, 10 * 16, 1280, 1280)
    assert not tc._use_kernel(16, 40 * 64, 320, 640)


def test_1024_geometry_dispatch():
    """The 576x1024 model (inference/training_1024_v1.0: 72x128 latents,
    ds levels 9216/2304/576 tokens) must keep the kernel predicates —
    VERDICT r2 next #7."""
    import tooncrafter_tpu.ops.flash_attention as fa
    import tooncrafter_tpu.ops.fused_ff as ff

    # spatial self-attn at ds1/ds2/ds4 (ds4 = 576 = 3*192)
    for s in (9216, 2304, 576):
        assert fa._pick_block(s) > 0, s
        assert fa._use_kernel(s, s, 64), s
    # dual-ref fusion attention sites at 576x1024 output (levels 2, 3)
    assert fa._pick_fwd_blocks(16 * 144 * 256, 2 * 144 * 256) == (1024, 2048)
    assert fa._pick_fwd_blocks(16 * 72 * 128, 2 * 72 * 128) == (1024, 2048)
    # fused GEGLU FF at every level (2-clip CFG batch, 16 frames)
    for seq, c in ((9216, 320), (2304, 640), (576, 1280)):
        assert ff._mode(32 * seq, c, 4 * c, c) is not None, (seq, c)
    # temporal convs dispatch at ds1/ds2; ds4 falls back (same as the
    # 512 model's 10x16 level — weights alone blow the VMEM budget)
    assert tc._use_kernel(16, 9216, 320, 320)
    assert tc._use_kernel(16, 2304, 640, 640)
    assert not tc._use_kernel(16, 576, 1280, 1280)
    # per-pixel temporal attention at all three levels
    for p in (9216, 2304, 576):
        assert ta.use_kernel(16, p * 2, 64, inner=512), p


def test_temporal_attention_envelope():
    # per-pixel T=16 attention at every UNet level, d=64
    for p in (40 * 64, 20 * 32, 10 * 16):
        assert ta.use_kernel(16, p * 2, 64, inner=512), p


def test_winograd_declined_under_bf16_prologue(monkeypatch):
    """The Winograd kernels implement only the 'ref'/'f32' prologue cast
    points; under the experimental 'bf16' mode the dispatch must fall to
    XLA so every conv site measures the same folded numerics (r5)."""
    import jax
    import jax.numpy as jnp

    from tooncrafter_tpu.ops import winograd as wg
    from tooncrafter_tpu.ops.norms import gn_affine

    def boom(*a, **k):
        raise AssertionError("winograd kernel dispatched")

    h = w = 8
    monkeypatch.setattr(wg, "_INTERPRET", True)
    monkeypatch.setitem(wg._TABLE, (h, w, 128, 128), (2, 0, False, 0))
    monkeypatch.setattr(wg, "winograd_gn_silu_conv3x3", boom)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (2, h, w, 128)).astype(jnp.bfloat16)
    scale = jax.random.normal(ks[1], (128,)) * 0.2 + 1.0
    bias = jax.random.normal(ks[2], (128,)) * 0.1
    kern = (jax.random.normal(ks[3], (3, 3, 128, 128)) * 0.05) \
        .astype(jnp.bfloat16)
    cb = jax.random.normal(ks[4], (128,)) * 0.1
    a, b = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
    monkeypatch.setattr(sc, "_PROLOGUE_DTYPE", "bf16")
    sc._impl(x, a, b, kern, cb, None, True, False)  # XLA path, no boom
    monkeypatch.setattr(sc, "_PROLOGUE_DTYPE", "ref")
    with pytest.raises(AssertionError, match="winograd kernel"):
        sc._impl(x, a, b, kern, cb, None, True, False)


def test_remat_policy_validation():
    """An unknown remat_policy must raise a ValueError naming the field
    at trace time, not a bare KeyError (r5 review)."""
    import jax
    import jax.numpy as jnp

    from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter

    cfg = ModelConfig().tiny(use_checkpoint=True, remat_policy="dotz")
    m = ToonCrafter(cfg)
    t = cfg.video_length
    xx = jnp.zeros((1, t, cfg.latent_h, cfg.latent_w, 8))
    ctx = jnp.zeros((1, 77 + t * cfg.resampler_queries, cfg.context_dim))
    with pytest.raises(ValueError, match="remat_policy"):
        jax.eval_shape(
            lambda: m.unet.init(jax.random.PRNGKey(0), xx,
                                jnp.full((1,), 500.0), ctx,
                                jnp.full((1,), 10.0)))
