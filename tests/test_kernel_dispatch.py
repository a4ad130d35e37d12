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
