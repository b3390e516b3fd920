"""Host-prep micro-benchmark: native hostops vs cv2/numpy.

Measures the three host-side hot ops on a representative crop window
(768x1024 -> 512x512) and prints a JSON report.  The numbers here set the
dispatch policy documented in diffute_tpu/io/hostops.py.

Run: python benchmarks/hostops_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffute_tpu.io import hostops  # noqa: E402


def timeit(fn, iters: int = 200) -> float:
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    assert hostops.available(), "native hostops failed to build"
    rng = np.random.RandomState(0)
    src = rng.randint(0, 255, (768, 1024, 3), np.uint8)
    mask = (rng.rand(768, 1024) > 0.9).astype(np.uint8)

    def cv2_resize():
        return cv2.resize(src, (512, 512), interpolation=cv2.INTER_LINEAR)

    def cv2_resize_norm():
        r = cv2_resize()
        return (r.astype(np.float32) / 255.0 - 0.5) / 0.5

    report = {
        "resize_u8_cv2_ms": round(timeit(cv2_resize), 3),
        "resize_u8_native_ms": round(timeit(
            lambda: hostops.resize_bilinear_u8(src, 512, 512,
                                               backend="native")), 3),
        "resize_normalize_cv2_ms": round(timeit(cv2_resize_norm), 3),
        "resize_normalize_native_fused_ms": round(timeit(
            lambda: hostops.crop_resize_normalize(src, 512, 512)), 3),
        "masked_fill_numpy_ms": round(timeit(
            lambda: src * (mask < 0.5)[..., None].astype(np.uint8)), 3),
        "masked_fill_native_ms": round(timeit(
            lambda: hostops.masked_fill(src, mask)), 3),
        "dispatch": hostops.backend_report(),
    }
    ok, enc = cv2.imencode(".jpg", src, [cv2.IMWRITE_JPEG_QUALITY, 85])
    assert ok
    jpg = enc.tobytes()
    buf = np.frombuffer(jpg, np.uint8)
    report["jpeg_decode_cv2_ms"] = round(timeit(
        lambda: cv2.imdecode(buf, flags=1), iters=50), 3)
    if hostops.decode_jpeg(jpg, bgr=True) is not None:
        report["jpeg_decode_native_ms"] = round(timeit(
            lambda: hostops.decode_jpeg(jpg, bgr=True), iters=50), 3)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
