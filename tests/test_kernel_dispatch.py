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
    monkeypatch.setenv("TC_SPATIAL_CONV_PALLAS", "1")
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


def test_temporal_attention_envelope():
    # per-pixel T=16 attention at every UNet level, d=64
    for p in (40 * 64, 20 * 32, 10 * 16):
        assert ta.use_kernel(16, p * 2, 64, inner=512), p
