"""ctypes bindings for the native host-ops library (native/hostops.cpp).

Builds the shared object on first use (cc available in the image) and caches
it next to the source; all entry points fall back to cv2/numpy when the
toolchain or .so is unavailable, so the framework never hard-depends on the
native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

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
                for cc in ("c++", "g++", "cc"):
                    try:
                        subprocess.run(
                            [cc, "-O3", "-shared", "-fPIC", src, "-o", so],
                            check=True, capture_output=True)
                        break
                    except (FileNotFoundError, subprocess.CalledProcessError):
                        continue
                else:
                    return None
            lib = ctypes.CDLL(so)
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i = ctypes.c_int
            lib.resize_bilinear_u8.argtypes = [u8p, i, i, i, u8p, i, i]
            lib.crop_resize_normalize_f32.argtypes = [u8p, i, i, i, f32p, i, i]
            lib.masked_fill_u8.argtypes = [u8p, u8p, i, i, i, u8p]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def resize_bilinear_u8(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """cv2.resize(INTER_LINEAR)-compatible uint8 resize (HWC or HW)."""
    lib = _load()
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    src = np.ascontiguousarray(src, dtype=np.uint8)
    sh, sw, c = src.shape
    if lib is None:
        import cv2

        out = cv2.resize(src, (dw, dh), interpolation=cv2.INTER_LINEAR)
        if out.ndim == 2:
            out = out[..., None]
    else:
        out = np.empty((dh, dw, c), np.uint8)
        lib.resize_bilinear_u8(src, sh, sw, c, out, dh, dw)
    return out[..., 0] if squeeze else out


def crop_resize_normalize(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 HWC -> bilinear resize -> [-1, 1] float32, one fused pass."""
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.uint8)
    sh, sw, c = src.shape
    if lib is None:
        import cv2

        r = cv2.resize(src, (dw, dh), interpolation=cv2.INTER_LINEAR)
        return (r.astype(np.float32) / 255.0 - 0.5) / 0.5
    out = np.empty((dh, dw, c), np.float32)
    lib.crop_resize_normalize_f32(src, sh, sw, c, out, dh, dw)
    return out


def masked_fill(src: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """image * (mask < 0.5) without intermediate float allocation."""
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if lib is None:
        return src * (np.asarray(mask) < 0.5)[..., None].astype(np.uint8)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w, c = src.shape
    out = np.empty_like(src)
    lib.masked_fill_u8(src, mask, h, w, c, out)
    return out
