"""TrOCR glyph-image preprocessing.

Equivalent of ``TrOCRProcessor``'s image path (reference
train_diffute_v1.py:868, app.ipynb:773): resize any-size glyph render to
384x384 (PIL bilinear — what HF's ViTImageProcessor uses), rescale by 1/255,
normalize with mean=std=0.5 to [-1, 1].

Split host/device TPU-first: the aspect-destroying resize of the
variable-width glyph canvas happens on host (it's what makes the shape
static), everything after — normalization and the ViT encode — is jit'd
on device.  Host resizes are cheap (60xW -> 384x384 uint8) and overlap with
device compute when batching.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from diffute_tpu.config import TrOCRConfig


def trocr_preprocess_host(
    images: Sequence[np.ndarray], config: TrOCRConfig = TrOCRConfig()
) -> np.ndarray:
    """List of uint8 HWC RGB glyph renders -> (B, size, size, 3) uint8.

    Mirrors TrOCRProcessor handling of a *list* of variable-width images
    (the reference keeps ttf_imgs as a python list through collation,
    train_diffute_v1.py:729-746).
    """
    size = config.image_size
    out = np.empty((len(images), size, size, 3), dtype=np.uint8)
    for i, im in enumerate(images):
        pil = Image.fromarray(np.asarray(im, dtype=np.uint8))
        out[i] = np.array(pil.resize((size, size), Image.BILINEAR))
    return out


def trocr_normalize(pixels_uint8: jax.Array) -> jax.Array:
    """(B, H, W, 3) uint8 -> float in [-1, 1] (rescale 1/255, mean=std=0.5).

    Device-side, fuses into the TrOCR encoder under jit.
    """
    x = pixels_uint8.astype(jnp.float32) / 255.0
    return (x - 0.5) / 0.5
