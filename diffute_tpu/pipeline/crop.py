"""Crop-window policies and paste-back.

The reference scales *spatially by cropping*, never by resizing the whole
image: training picks a random crop_scale=256 window around one OCR box
(train_diffute_v1.py:457-494); inference picks an adaptive window from a
ladder keyed on 6x the character height (app.ipynb:667-725); the edited
512^2 crop is resized back and ONLY the bbox pixels are pasted into the
original (app.ipynb:827-840).

Documented intent-vs-bug divergences from the reference (SURVEY.md §0.7):
- train upscaling: the reference resizes image/mask/masked when the short
  side < 256 but forgets to rescale the box coordinates
  (train_diffute_v1.py:466-471); we scale the box (the intent).
- inference window y-branch compares ``y1 + crop_scale < w`` (app.ipynb:716)
  using the *width*; we use the height (the intent).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import cv2
import numpy as np


@dataclasses.dataclass
class CropResult:
    image: np.ndarray        # cropped instance image (<= crop x crop)
    mask: np.ndarray         # cropped mask
    masked_image: np.ndarray  # cropped masked image
    x_s: int
    y_s: int
    crop_scale: int
    text: str                # possibly truncated (train policy)


def _rescale_if_small(
    image: np.ndarray, mask: np.ndarray, masked: np.ndarray,
    box: np.ndarray, crop_scale: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Upscale by int(2*crop/short_side) when the short side is below the
    crop window (train_diffute_v1.py:462-468)."""
    h, w = image.shape[:2]
    short_side = min(h, w)
    if short_side < crop_scale:
        scale = int(crop_scale * 2 / short_side)
        image = cv2.resize(image, (w * scale, h * scale))
        mask = cv2.resize(mask, (w * scale, h * scale))
        masked = cv2.resize(masked, (w * scale, h * scale))
        box = box * scale  # intent; reference forgets this (see module doc)
    return image, mask, masked, box


def train_crop(
    image: np.ndarray,
    mask: np.ndarray,
    masked: np.ndarray,
    box: np.ndarray,
    text: str,
    rng: np.random.Generator,
    crop_scale: int = 256,
) -> CropResult:
    """Random crop_scale^2 window containing (a prefix of) the box.

    Reproduces train_diffute_v1.py:461-494: per axis, if the box fits, sample
    a window start in [max(0, end-crop), start); on an empty range fall back
    to 0 (the reference swallows the randint error, :473-475).  If the box
    exceeds the window, anchor at the box start and truncate the text
    proportionally.
    """
    image, mask, masked, box = _rescale_if_small(image, mask, masked, box, crop_scale)
    x1, y1, x2, y2 = (int(v) for v in box)

    if x2 - x1 < crop_scale:
        lo = max(0, x2 - crop_scale)
        x_s = int(rng.integers(lo, x1)) if x1 > lo else 0
    else:
        x_s = x1
        text = text[: int(len(text) * crop_scale / (x2 - x1))]
    if y2 - y1 < crop_scale:
        lo = max(0, y2 - crop_scale)
        y_s = int(rng.integers(lo, y1)) if y1 > lo else 0
    else:
        y_s = y1
        text = text[: int(len(text) * crop_scale / (y2 - y1))]

    return CropResult(
        image=image[y_s : y_s + crop_scale, x_s : x_s + crop_scale],
        mask=mask[y_s : y_s + crop_scale, x_s : x_s + crop_scale],
        masked_image=masked[y_s : y_s + crop_scale, x_s : x_s + crop_scale],
        x_s=x_s, y_s=y_s, crop_scale=crop_scale, text=text,
    )


# The inference ladder: (6*char_height upper bound, window length),
# app.ipynb:674-690.
_CROP_LADDER = (128, 256, 384, 512, 640, 784, 1000)


def infer_crop_params(
    image_hw: Tuple[int, int], box: np.ndarray,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[int, int, int]:
    """Adaptive inference crop: -> (x_s, y_s, crop_scale).

    Reproduces app.ipynb:667-725: pick CROP_LENTH from the ladder keyed on
    6x char height (max'd with the box length), bound by the short side;
    place the window preferring to end at the box's trailing edge.
    """
    h, w = image_hw
    short_side = min(h, w)
    x1, y1, x2, y2 = (int(v) for v in box)
    char_height = y2 - y1
    char_length = x2 - x1

    crop_length = None
    for bound in _CROP_LADDER:
        if 6 * char_height < bound:
            crop_length = max(bound, char_length)
            break
    if crop_length is None:
        crop_length = 6 * char_height

    if char_length < crop_length:
        crop_scale = min(crop_length, short_side)
    else:
        crop_scale = short_side

    rng = rng or np.random.default_rng(0)

    if x2 - x1 < crop_scale:
        if x2 - crop_scale > 0:
            x_s = x2 - crop_scale
        elif x1 + crop_scale < w:
            x_s = x1
        else:
            x_s = 0
    else:
        hi = max(0, x2 - crop_scale - 1)
        x_s = int(rng.integers(x1, hi)) if hi > x1 else x1

    if y2 - y1 < crop_scale:
        if y2 - crop_scale > 0:
            y_s = y2 - crop_scale
        elif y1 + crop_scale < h:  # intent; reference compares against w
            y_s = y1
        else:
            y_s = 0
    else:
        hi = max(0, y2 - crop_scale - 1)
        y_s = int(rng.integers(y1, hi)) if hi > y1 else y1

    return x_s, y_s, int(crop_scale)


def paste_back(
    original: np.ndarray,
    edited_crop: np.ndarray,
    x_s: int,
    y_s: int,
    crop_scale: int,
    box: np.ndarray,
) -> np.ndarray:
    """Resize the edited 512^2 crop back into the window; paste ONLY the bbox
    pixels into the original (app.ipynb:827-840).

    The reference materializes two full-image float copies and rounds the
    whole frame; only bbox ∩ window pixels can change (round-trip through
    f32+round is the identity elsewhere), so this computes exactly that
    intersection — O(bbox) host work instead of O(image)."""
    h, w = original.shape[:2]
    r_h = h - y_s if y_s + crop_scale > h else crop_scale
    r_w = w - x_s if x_s + crop_scale > w else crop_scale

    x1, y1, x2, y2 = (int(v) for v in box)
    result = original.astype(np.uint8, copy=True)
    ry1, ry2 = max(y1, y_s), min(y2, y_s + r_h)
    rx1, rx2 = max(x1, x_s), min(x2, x_s + r_w)
    if ry2 > ry1 and rx2 > rx1:
        resized = cv2.resize(edited_crop.astype(np.float32), (r_w, r_h))
        patch = resized[ry1 - y_s : ry2 - y_s, rx1 - x_s : rx2 - x_s]
        result[ry1:ry2, rx1:rx2] = np.clip(
            np.round(patch), 0, 255).astype(np.uint8)
    return result
