"""Pluggable blob storage + image decode.

The reference reads training blobs from Aliyun OSS through pcache_fileio and
decodes with cv2 (train_diffute_v1.py:12-18,390-396 — note flags=1 yields
BGR and no BGR->RGB conversion is ever applied in training, while the demo
feeds RGB; SURVEY.md §1 L1).  Here the storage is a scheme-dispatched opener
(local paths out of the box; gs:// etc. can be registered) and decode
defaults to RGB, with ``bgr=True`` available for bit-faithful reproduction of
the reference training colour order.
"""

from __future__ import annotations

from typing import BinaryIO, Callable, Dict

import cv2
import numpy as np

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


def read_image(path: str, bgr: bool = False) -> np.ndarray:
    """Decode an image blob -> uint8 HWC.  RGB by default; ``bgr=True``
    reproduces the reference's cv2.imdecode(flags=1) order."""
    with open_blob(path) as f:
        buf = np.frombuffer(f.read(), dtype=np.uint8)
    img = cv2.imdecode(buf, flags=1)
    if img is None:
        raise ValueError(f"Failed to decode image: {path}")
    return img if bgr else cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
