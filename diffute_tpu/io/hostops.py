"""Host image ops with native (C++) and cv2/numpy backends, fastest-first.

The reference's host preprocessing runs through OpenCV/albumentations
(train_diffute_v1.py:336-348); this module is the single entry point the
product paths (``pipeline/edit.py``, ``pipeline/regions.py``,
``io/dataset.py``) use, dispatching each op to the fastest measured backend
(``python benchmarks/hostops_bench.py``, 768x1024 -> 512x512 on the build
machine):

  op                      native   cv2/numpy   product backend
  resize_bilinear_u8      3.6 ms   1.3 ms      cv2 (SIMD fixed-point wins)
  crop_resize_normalize   2.5 ms   2.0 ms      native (within ~0.5 ms of
                                               cv2 run-to-run; one pass, no
                                               intermediate u8 allocation,
                                               keeps cv2 optional)
  masked_fill             0.35 ms  4.6 ms      native (13x)
  decode_jpeg             (libjpeg-turbo, the same codec cv2 bundles:
                          bit-identical output, time parity; native is the
                          product default so cv2 is a soft dependency of the
                          blob-decode path — io/storage.decode_image)

The native library (native/hostops.cpp, built lazily with the in-image
toolchain) replicates cv2's INTER_LINEAR fixed-point arithmetic: output is
bit-identical to cv2 for downscales (every row width a multiple of 16 —
true of all product shapes) and within 1 uint8 LSB on <0.5% of pixels for
upscales, where cv2 routes border rows through a different descale path
(tests/test_hostops.py pins both properties).  With cv2 absent the native
backend covers everything, so the package has no hard cv2 dependency on
this path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the image
    cv2 = None

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "hostops.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                   "libhostops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.abspath(_SRC)
        so = os.path.abspath(_SO)
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                base = ["-O3", "-march=native", "-shared", "-fPIC", src,
                        "-o", so]
                # JPEG decode needs libjpeg(-turbo) headers+lib; build
                # without it where absent (the symbols are #ifdef-gated).
                variants = [base[:5] + ["-DHOSTOPS_HAVE_JPEG"] + base[5:]
                            + ["-ljpeg"], base]
                for cc in ("c++", "g++", "cc"):
                    done = False
                    for flags in variants:
                        try:
                            subprocess.run([cc] + flags, check=True,
                                           capture_output=True)
                            done = True
                            break
                        except (FileNotFoundError,
                                subprocess.CalledProcessError):
                            continue
                    if done:
                        break
                else:
                    return None
            lib = ctypes.CDLL(so)
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i = ctypes.c_int
            lib.resize_bilinear_u8.argtypes = [u8p, i, i, i, u8p, i, i]
            lib.crop_resize_normalize_f32.argtypes = [u8p, i, i, i, f32p, i, i]
            lib.masked_fill_u8.argtypes = [u8p, u8p, i, i, i, u8p]
            if hasattr(lib, "jpeg_decode_u8"):  # -DHOSTOPS_HAVE_JPEG build
                ul, ip = ctypes.c_ulong, ctypes.POINTER(ctypes.c_int)
                cp = ctypes.c_char_p
                lib.jpeg_probe_u8.argtypes = [cp, ul, ip, ip]
                lib.jpeg_decode_u8.argtypes = [cp, ul, u8p, i, i, i]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def backend_report() -> dict:
    """Which backend each product op resolves to (for tests/benchmarks)."""
    native = available()
    jpeg = native and hasattr(_lib, "jpeg_decode_u8")
    return {
        "native_lib": native,
        "resize_bilinear_u8": "cv2" if cv2 is not None else (
            "native" if native else "unavailable"),
        "crop_resize_normalize": "native" if native else (
            "cv2" if cv2 is not None else "unavailable"),
        "masked_fill": "native" if native else "numpy",
        "jpeg_decode": "native" if jpeg else (
            "cv2" if cv2 is not None else "unavailable"),
    }


def _resize_native(lib, src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    sh, sw, c = src.shape
    out = np.empty((dh, dw, c), np.uint8)
    lib.resize_bilinear_u8(src, sh, sw, c, out, dh, dw)
    return out


def resize_bilinear_u8(src: np.ndarray, dh: int, dw: int,
                       backend: Optional[str] = None) -> np.ndarray:
    """cv2.resize(INTER_LINEAR)-compatible uint8 resize (HWC or HW).

    cv2 backend when importable (its SIMD path is ~3x the native kernel);
    the native fixed-point kernel otherwise.  ``backend`` forces "cv2" or
    "native" (tests compare the two).
    """
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    src = np.ascontiguousarray(src, dtype=np.uint8)
    use_cv2 = cv2 is not None if backend is None else backend == "cv2"
    if use_cv2:
        out = cv2.resize(src, (dw, dh), interpolation=cv2.INTER_LINEAR)
        if out.ndim == 2:
            out = out[..., None]
    else:
        lib = _load()
        if lib is None:
            raise RuntimeError("neither cv2 nor native hostops is available")
        out = _resize_native(lib, src, dh, dw)
    return out[..., 0] if squeeze else out


def crop_resize_normalize(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 HWC -> INTER_LINEAR resize -> Normalize(0.5, 0.5) float32.

    Native fused single-pass kernel when available (beats the two-pass
    cv2-resize-then-normalize and keeps the reference's uint8 intermediate
    quantization, so results are bit-identical for product shapes).
    """
    src = np.ascontiguousarray(src, dtype=np.uint8)
    sh, sw, c = src.shape
    lib = _load()
    if lib is None:
        r = resize_bilinear_u8(src, dh, dw)
        return (r.astype(np.float32) / 255.0 - 0.5) / 0.5
    out = np.empty((dh, dw, c), np.float32)
    lib.crop_resize_normalize_f32(src, sh, sw, c, out, dh, dw)
    return out


def decode_jpeg(data: bytes, bgr: bool = False) -> Optional[np.ndarray]:
    """Native JPEG blob -> uint8 HWC (RGB; ``bgr=True`` gives cv2's order).

    Returns ``None`` when the native library lacks JPEG support or the blob
    isn't a JPEG it handles (CMYK, corrupt header, ...) — callers fall back
    to cv2/PIL (``io/storage.read_image``).  Uses the same system
    libjpeg-turbo cv2 bundles, so output is bit-identical to
    ``cv2.imdecode(flags=1)`` (pinned by tests/test_hostops.py).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "jpeg_decode_u8"):
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.jpeg_probe_u8(data, len(data), ctypes.byref(h), ctypes.byref(w)):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.jpeg_decode_u8(data, len(data), out, h.value, w.value,
                          1 if bgr else 0):
        return None
    return out


def masked_fill(src: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """image * (mask < 0.5) for uint8 HWC images (reference
    train_diffute_v1.py:385-388) — native is 14x numpy."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    lib = _load()
    if lib is None:
        return src * (np.asarray(mask) < 0.5)[..., None].astype(np.uint8)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w, c = src.shape
    out = np.empty_like(src)
    lib.masked_fill_u8(src, mask, h, w, c, out)
    return out
