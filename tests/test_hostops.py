"""Native host-ops parity vs cv2/numpy reference."""

import cv2
import numpy as np
import pytest

from diffute_tpu.io import hostops


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not hostops.available():
        pytest.skip("native toolchain unavailable; fallbacks already cover")


def test_resize_matches_cv2():
    rng = np.random.RandomState(0)
    src = rng.randint(0, 255, (37, 53, 3), np.uint8)
    ours = hostops.resize_bilinear_u8(src, 512, 512)
    ref = cv2.resize(src, (512, 512), interpolation=cv2.INTER_LINEAR)
    # identical sampling rule; cv2 uses fixed-point interpolation so a
    # fraction of pixels round one step differently
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.25


def test_resize_2d_mask():
    src = (np.random.RandomState(1).rand(40, 60) > 0.5).astype(np.uint8)
    ours = hostops.resize_bilinear_u8(src, 128, 128)
    ref = cv2.resize(src, (128, 128), interpolation=cv2.INTER_LINEAR)
    assert ours.shape == (128, 128)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_crop_resize_normalize_fused():
    rng = np.random.RandomState(2)
    src = rng.randint(0, 255, (100, 160, 3), np.uint8)
    ours = hostops.crop_resize_normalize(src, 512, 512)
    ref_u8 = cv2.resize(src, (512, 512), interpolation=cv2.INTER_LINEAR)
    ref = (ref_u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    assert ours.dtype == np.float32
    # fused path skips the uint8 quantization step -> tolerance 1/127
    np.testing.assert_allclose(ours, ref, atol=1.1 / 127)


def test_masked_fill():
    rng = np.random.RandomState(3)
    src = rng.randint(0, 255, (50, 70, 3), np.uint8)
    mask = (rng.rand(50, 70) > 0.5).astype(np.uint8)
    ours = hostops.masked_fill(src, mask)
    ref = src * (mask < 0.5)[..., None]
    np.testing.assert_array_equal(ours, ref)
