"""Native host-ops parity vs cv2/numpy, and product-path wiring.

The native kernel (native/hostops.cpp) replicates cv2's INTER_LINEAR
fixed-point pipeline (2^11 coefficients, float source coordinates, the
vector-path descale approximation): bit-identical for downscales; for
upscales cv2 shuttles border rows through a different descale, leaving a
<=1-LSB difference on <0.5% of pixels (diffute_tpu/io/hostops.py docstring).
"""

import cv2
import numpy as np
import pytest

from diffute_tpu.io import hostops


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not hostops.available():
        pytest.skip("native toolchain unavailable; fallbacks already cover")


@pytest.mark.parametrize("shape", [(768, 1024, 3), (2000, 1500, 3),
                                   (600, 600, 3), (513, 1023, 3)])
@pytest.mark.parametrize("dst", [(512, 512), (384, 384)])
def test_resize_downscale_bitexact_vs_cv2(shape, dst):
    rng = np.random.RandomState(hash((shape, dst)) % (2**32))
    src = rng.randint(0, 255, shape, np.uint8)
    ours = hostops.resize_bilinear_u8(src, *dst, backend="native")
    ref = cv2.resize(src, dst[::-1], interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("shape", [(300, 80, 3), (37, 53, 3), (5, 5, 3)])
def test_resize_upscale_tolerance_vs_cv2(shape):
    rng = np.random.RandomState(0)
    src = rng.randint(0, 255, shape, np.uint8)
    ours = hostops.resize_bilinear_u8(src, 512, 512, backend="native")
    ref = cv2.resize(src, (512, 512), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.03


def test_resize_2d_mask_bitexact():
    src = (np.random.RandomState(1).rand(400, 600) > 0.5).astype(np.uint8)
    ours = hostops.resize_bilinear_u8(src, 128, 128, backend="native")
    ref = cv2.resize(src, (128, 128), interpolation=cv2.INTER_LINEAR)
    assert ours.shape == (128, 128)
    np.testing.assert_array_equal(ours, ref)


def test_product_dispatch_prefers_cv2_for_plain_resize():
    """With cv2 importable, the default path must be cv2 (it is ~3x the
    native kernel) — and therefore exactly equal to cv2."""
    report = hostops.backend_report()
    assert report["resize_bilinear_u8"] == "cv2"
    assert report["crop_resize_normalize"] == "native"
    assert report["masked_fill"] == "native"
    rng = np.random.RandomState(2)
    src = rng.randint(0, 255, (300, 80, 3), np.uint8)  # upscale: paths differ
    ref = cv2.resize(src, (512, 512), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(hostops.resize_bilinear_u8(src, 512, 512),
                                  ref)


def test_crop_resize_normalize_fused_bitexact_downscale():
    """The fused kernel quantizes to uint8 exactly like the resize kernel
    before normalizing, so for downscales it is bit-identical to the
    cv2-resize-then-normalize sequence the reference uses."""
    rng = np.random.RandomState(2)
    src = rng.randint(0, 255, (1000, 1600, 3), np.uint8)
    ours = hostops.crop_resize_normalize(src, 512, 512)
    ref_u8 = cv2.resize(src, (512, 512), interpolation=cv2.INTER_LINEAR)
    ref = (ref_u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    assert ours.dtype == np.float32
    np.testing.assert_array_equal(ours, ref)


def test_crop_resize_normalize_fused_upscale_tolerance():
    rng = np.random.RandomState(3)
    src = rng.randint(0, 255, (100, 160, 3), np.uint8)
    ours = hostops.crop_resize_normalize(src, 512, 512)
    ref_u8 = cv2.resize(src, (512, 512), interpolation=cv2.INTER_LINEAR)
    ref = (ref_u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(ours, ref, atol=1.01 * 2 / 255)


def test_masked_fill():
    rng = np.random.RandomState(3)
    src = rng.randint(0, 255, (50, 70, 3), np.uint8)
    mask = (rng.rand(50, 70) > 0.5).astype(np.uint8)
    ours = hostops.masked_fill(src, mask)
    ref = src * (mask < 0.5)[..., None]
    np.testing.assert_array_equal(ours, ref)


def test_masked_fill_4ch():
    rng = np.random.RandomState(4)
    src = rng.randint(0, 255, (20, 30, 4), np.uint8)
    mask = (rng.rand(20, 30) > 0.5).astype(np.uint8)
    np.testing.assert_array_equal(hostops.masked_fill(src, mask),
                                  src * (mask < 0.5)[..., None])


def test_make_masked_image_routes_native():
    """regions.make_masked_image must produce identical output through the
    native kernel (uint8) and the numpy path (float)."""
    from diffute_tpu.pipeline.regions import make_masked_image

    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (64, 48, 3), np.uint8)
    mask = (rng.rand(64, 48) > 0.7).astype(np.uint8)
    out_u8 = make_masked_image(img, mask)
    out_np = img.astype(np.int32) * (mask < 0.5)[..., None]
    np.testing.assert_array_equal(out_u8.astype(np.int32), out_np)


# --- native JPEG decode (io/hostops.decode_jpeg, io/storage.decode_image) ---


def _jpeg_bytes(arr_bgr, quality=85):
    ok, enc = cv2.imencode(".jpg", arr_bgr,
                           [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return enc.tobytes()


@pytest.mark.parametrize("quality", [60, 95])
def test_decode_jpeg_bitexact_vs_cv2(quality):
    """Native decode uses the same libjpeg-turbo cv2 bundles: identical
    pixels in both channel orders."""
    if hostops.backend_report()["jpeg_decode"] != "native":
        pytest.skip("built without libjpeg")
    rng = np.random.RandomState(quality)
    src = rng.randint(0, 255, (123, 211, 3), np.uint8)
    data = _jpeg_bytes(src, quality)
    ref_bgr = cv2.imdecode(np.frombuffer(data, np.uint8), flags=1)
    np.testing.assert_array_equal(hostops.decode_jpeg(data, bgr=True),
                                  ref_bgr)
    np.testing.assert_array_equal(
        hostops.decode_jpeg(data),
        cv2.cvtColor(ref_bgr, cv2.COLOR_BGR2RGB))


def test_decode_jpeg_grayscale_promotes_to_3ch():
    if hostops.backend_report()["jpeg_decode"] != "native":
        pytest.skip("built without libjpeg")
    rng = np.random.RandomState(7)
    gray = rng.randint(0, 255, (64, 80), np.uint8)
    data = _jpeg_bytes(gray)
    out = hostops.decode_jpeg(data)
    ref = cv2.imdecode(np.frombuffer(data, np.uint8), flags=1)  # gray->BGR
    np.testing.assert_array_equal(out, ref)  # replicated channels: order moot


def test_decode_jpeg_rejects_garbage_and_png():
    assert hostops.decode_jpeg(b"\xff\xd8\xff\x00not a real jpeg") is None
    assert hostops.decode_jpeg(b"\x89PNG\r\n\x1a\n") is None


def test_storage_decode_image_routes_native_jpeg(tmp_path):
    """decode_image must produce cv2-identical output for JPEG blobs and
    still handle non-JPEG formats through cv2."""
    from diffute_tpu.io import storage

    rng = np.random.RandomState(11)
    src = rng.randint(0, 255, (90, 120, 3), np.uint8)
    data = _jpeg_bytes(src)
    ref_bgr = cv2.imdecode(np.frombuffer(data, np.uint8), flags=1)
    np.testing.assert_array_equal(storage.decode_image(data, bgr=True),
                                  ref_bgr)
    np.testing.assert_array_equal(storage.decode_image(data),
                                  cv2.cvtColor(ref_bgr, cv2.COLOR_BGR2RGB))
    # PNG goes through cv2 (lossless: decodes back to src exactly)
    ok, png = cv2.imencode(".png", src)
    assert ok
    np.testing.assert_array_equal(
        storage.decode_image(png.tobytes(), bgr=True), src)
    # read_image end-to-end over a file path
    p = tmp_path / "img.jpg"
    p.write_bytes(data)
    np.testing.assert_array_equal(storage.read_image(str(p), bgr=True),
                                  ref_bgr)
