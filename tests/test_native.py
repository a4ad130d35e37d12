"""Native C++ preprocess library tests (auto-builds via make)."""

import numpy as np
import pytest

from tooncrafter_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_preprocess_shapes_and_range(lib_ok):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (4, 60, 90, 3), dtype=np.uint8)
    out = native.preprocess_clip(frames, 32, 48)
    assert out.shape == (4, 32, 48, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_preprocess_matches_cv2_on_smooth_image(lib_ok):
    import cv2

    h, w = 64, 96
    xx = np.linspace(0, 255, w)[None, :].repeat(h, 0)
    yy = np.linspace(0, 255, h)[:, None].repeat(w, 1)
    img = np.stack([xx, yy, (xx + yy) / 2], -1).astype(np.uint8)
    out = native.preprocess_clip(img[None], 80, 128)[0]
    scale = max(80 / 64, 128 / 96)
    nh, nw = int(round(64 * scale)), int(round(96 * scale))
    ref = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top, left = (nh - 80) // 2, (nw - 128) // 2
    ref = ref[top:top + 80, left:left + 128].astype(np.float32) / 127.5 - 1
    # conventions differ by <= half a source pixel (cv2 rounds the
    # intermediate size); on smooth content that is ~2 gray levels
    assert np.abs(out - ref).max() < 0.03


def test_uint8_roundtrip(lib_ok):
    rng = np.random.default_rng(1)
    v = rng.uniform(-1.2, 1.2, (2, 8, 8, 3)).astype(np.float32)
    u8 = native.to_uint8_clip(v)
    ref = ((np.clip(v, -1, 1) + 1) * 127.5 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(u8, ref)


def test_identity_when_sizes_match(lib_ok):
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (2, 32, 48, 3), dtype=np.uint8)
    out = native.preprocess_clip(frames, 32, 48)
    ref = frames.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out, ref, atol=1e-5)
