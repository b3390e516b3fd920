"""Pluggable blob storage + image decode.

The reference reads training blobs from Aliyun OSS through pcache_fileio and
decodes with cv2 (train_diffute_v1.py:12-18,390-396 — note flags=1 yields
BGR and no BGR->RGB conversion is ever applied in training, while the demo
feeds RGB; SURVEY.md §1 L1).  Here the storage is a scheme-dispatched opener
(local paths out of the box; gs:// etc. can be registered) and decode
defaults to RGB, with ``bgr=True`` available for bit-faithful reproduction of
the reference training colour order.

JPEG blobs decode through the first-party native path
(``io/hostops.decode_jpeg``, libjpeg-turbo — the same codec cv2 bundles, so
output is bit-identical to ``cv2.imdecode``); cv2 is only needed for
non-JPEG formats (PNG, ...) and exotic JPEGs (CMYK), making it a soft
dependency of this module.
"""

from __future__ import annotations

from typing import BinaryIO, Callable, Dict

import numpy as np

from diffute_tpu.io import hostops

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the build image
    cv2 = None

_OPENERS: Dict[str, Callable[[str], BinaryIO]] = {}


def register_opener(scheme: str, opener: Callable[[str], BinaryIO]) -> None:
    _OPENERS[scheme] = opener


def open_blob(path: str) -> BinaryIO:
    if "://" in path:
        scheme = path.split("://", 1)[0]
        if scheme == "file":
            return open(path.split("://", 1)[1], "rb")
        if scheme in _OPENERS:
            return _OPENERS[scheme](path)
        try:  # generic fallback: fsspec handles gs://, s3://, http(s)://, ...
            import fsspec

            return fsspec.open(path, "rb").open()
        except ImportError:
            raise ValueError(f"No opener registered for scheme {scheme!r}")
    return open(path, "rb")


def decode_image(data: bytes, bgr: bool = False) -> np.ndarray:
    """Decode an image blob -> uint8 HWC.  RGB by default; ``bgr=True``
    reproduces the reference's cv2.imdecode(flags=1) order."""
    if data[:3] == b"\xff\xd8\xff":  # JPEG magic: native decode first
        img = hostops.decode_jpeg(data, bgr=bgr)
        if img is not None:
            return img
    if cv2 is None:
        raise ValueError(
            "Cannot decode blob: not a native-decodable JPEG and cv2 is "
            "not installed")
    img = cv2.imdecode(np.frombuffer(data, dtype=np.uint8), flags=1)
    if img is None:
        raise ValueError("Failed to decode image blob")
    return img if bgr else cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def read_image(path: str, bgr: bool = False) -> np.ndarray:
    """:func:`decode_image` over :func:`open_blob`."""
    with open_blob(path) as f:
        data = f.read()
    try:
        return decode_image(data, bgr=bgr)
    except ValueError as e:
        raise ValueError(f"{e}: {path}") from None
