"""Crop-policy tests: the training random window (train_diffute_v1.py:
457-494), the inference ladder (app.ipynb:667-725), and paste-back
(app.ipynb:827-840)."""

import numpy as np
import pytest

from diffute_tpu.pipeline import infer_crop_params, paste_back, train_crop
from diffute_tpu.pipeline.regions import generate_mask, make_masked_image


def _setup(h, w, box):
    img = np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8)
    mask = generate_mask((h, w), box)
    masked = make_masked_image(img, mask)
    return img, mask, masked


def test_train_crop_window_contains_small_box():
    box = np.int32([300, 300, 360, 330])
    img, mask, masked = _setup(600, 800, box)
    for seed in range(5):
        r = train_crop(img, mask, masked, box, "hello", np.random.default_rng(seed))
        assert r.image.shape == (256, 256, 3)
        assert r.text == "hello"
        # window start sampled from [max(0, x2-256), x1)
        assert max(0, 360 - 256) <= r.x_s < 300
        assert max(0, 330 - 256) <= r.y_s < 300
        # the box is inside the window horizontally
        assert r.x_s + 256 >= 360 and r.y_s + 256 >= 330
        # crop equals the window slice of the original
        np.testing.assert_array_equal(
            r.image, img[r.y_s : r.y_s + 256, r.x_s : r.x_s + 256])


def test_train_crop_truncates_wide_box_text():
    box = np.int32([100, 300, 612, 330])  # width 512 = 2x crop
    img, mask, masked = _setup(600, 800, box)
    r = train_crop(img, mask, masked, box, "0123456789", np.random.default_rng(0))
    assert r.x_s == 100
    assert r.text == "01234"  # int(10 * 256/512) = 5 chars


def test_train_crop_upscales_small_images():
    box = np.int32([10, 10, 60, 30])
    img, mask, masked = _setup(100, 120, box)  # short side 100 < 256
    r = train_crop(img, mask, masked, box, "x", np.random.default_rng(0))
    # scale = int(512/100) = 5 -> image is 500x600, window fits fully
    assert r.image.shape == (256, 256, 3)
    assert r.mask.shape == (256, 256)


def test_train_crop_degenerate_range_falls_back_to_zero():
    # x1 <= max(0, x2-256): reference randint raises -> except -> x_s = 0
    box = np.int32([0, 0, 50, 20])
    img, mask, masked = _setup(600, 800, box)
    r = train_crop(img, mask, masked, box, "x", np.random.default_rng(0))
    assert r.x_s == 0 and r.y_s == 0


@pytest.mark.parametrize("char_h,expected_len", [
    (10, 128),   # 6*10=60 < 128
    (30, 256),   # 180 < 256
    (60, 384),   # 360 < 384
    (80, 512),   # 480 < 512
    (100, 640),  # 600 < 640
    (125, 784),  # 750 < 784
    (160, 1000), # 960 < 1000
    (200, 1200), # 1200 >= 1000 -> 6*h
])
def test_infer_ladder_buckets(char_h, expected_len):
    # huge image so short_side never binds; narrow box so char_len < CROP_LENTH
    box = np.int32([2000, 2000, 2050, 2000 + char_h])
    x_s, y_s, crop = infer_crop_params((4000, 4000), box)
    assert crop == expected_len


def test_infer_crop_bounded_by_short_side():
    box = np.int32([10, 10, 60, 40])  # 6*30=180 -> ladder 256
    x_s, y_s, crop = infer_crop_params((200, 900), box)
    assert crop == 200


def test_infer_window_prefers_trailing_edge():
    box = np.int32([500, 500, 560, 530])  # char_h 30 -> crop 256
    x_s, y_s, crop = infer_crop_params((2000, 2000), box)
    assert crop == 256
    assert x_s == 560 - 256 and y_s == 530 - 256


def test_paste_back_only_changes_bbox():
    h, w = 300, 400
    img = np.random.RandomState(1).randint(0, 255, (h, w, 3), np.uint8)
    box = np.int32([120, 100, 220, 140])
    x_s, y_s, crop = 60, 40, 256
    edited = np.random.RandomState(2).randint(0, 255, (512, 512, 3), np.uint8)
    out = paste_back(img, edited, x_s, y_s, crop, box)
    assert out.shape == img.shape and out.dtype == np.uint8
    changed = (out != img).any(axis=-1)
    ys, xs = np.where(changed)
    assert xs.min() >= box[0] and xs.max() < box[2]
    assert ys.min() >= box[1] and ys.max() < box[3]


def test_paste_back_window_at_image_edge():
    h, w = 300, 400
    img = np.zeros((h, w, 3), np.uint8)
    box = np.int32([350, 250, 390, 290])
    x_s, y_s, crop = 200, 100, 256  # window extends past both edges
    edited = np.full((512, 512, 3), 128, np.uint8)
    out = paste_back(img, edited, x_s, y_s, crop, box)
    assert (out[260:280, 360:380] == 128).all()


def test_paste_back_matches_full_frame_formulation():
    """The O(bbox) paste is bit-identical to the reference's full-frame
    two-copy float formulation (app.ipynb:827-840) across fuzzed
    window/bbox geometries, including boxes extending past the window."""
    import cv2

    def full_frame(original, edited_crop, x_s, y_s, crop_scale, box):
        h, w = original.shape[:2]
        r_h = h - y_s if y_s + crop_scale > h else crop_scale
        r_w = w - x_s if x_s + crop_scale > w else crop_scale
        x1, y1, x2, y2 = (int(v) for v in box)
        mid = np.array(original, dtype=np.float32, copy=True)
        mid[y_s:y_s + crop_scale, x_s:x_s + crop_scale] = cv2.resize(
            edited_crop.astype(np.float32), (r_w, r_h))
        result = np.array(original, dtype=np.float32, copy=True)
        result[y1:y2, x1:x2] = mid[y1:y2, x1:x2]
        return np.clip(np.round(result), 0, 255).astype(np.uint8)

    rng = np.random.RandomState(0)
    for _ in range(40):
        h, w = rng.randint(64, 400), rng.randint(64, 400)
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        cs = rng.randint(32, min(h, w) + 1)
        x_s = rng.randint(0, max(1, w - 16))
        y_s = rng.randint(0, max(1, h - 16))
        x1 = rng.randint(0, w - 8)
        y1 = rng.randint(0, h - 8)
        box = np.int32([x1, y1, rng.randint(x1 + 1, w + 1),
                        rng.randint(y1 + 1, h + 1)])
        edited = rng.randint(0, 256, (128, 128, 3), np.uint8)
        got = paste_back(img, edited, x_s, y_s, cs, box)
        want = full_frame(img, edited, x_s, y_s, cs, box)
        np.testing.assert_array_equal(got, want)
