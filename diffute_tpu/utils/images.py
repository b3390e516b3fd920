"""Image conversion utilities (reference R18: numpy_to_pil / tensor2im /
to_tensor, train_diffute_v1.py:530-562, app.ipynb:403-436,586-596).

Our tensors are NHWC float in [-1, 1]; the reference's are NCHW torch.  The
conversions match the reference's arithmetic: ``(x / 2 + 0.5) * 255`` with
round-to-nearest for output, ``(x / 255 - 0.5) / 0.5`` for input.
"""

from __future__ import annotations

import numpy as np


def image_to_tensor(image_u8: np.ndarray) -> np.ndarray:
    """uint8 HWC [0,255] -> float32 HWC [-1, 1]."""
    return (np.asarray(image_u8, np.float32) / 255.0 - 0.5) / 0.5


def device_to_unit_range(x, dtype):
    """Device-side half of the compact-batch path: uint8 -> ``dtype`` [-1,1].

    Trainers ship raw uint8 pixels over the host->device link (4x fewer
    bytes than f32 through the relay, 4x less HBM for staged scan inputs)
    and normalize in the jit'd step with :func:`image_to_tensor`'s
    arithmetic (XLA fuses it to one multiply-add — within 1 ulp of the
    host-numpy result).  Normalization runs in f32 and only then casts, so
    bf16 training matches the old host-f32-then-cast path.  Float inputs
    pass through (back-compat with tests/custom loaders that still feed
    pre-normalized batches)."""
    import jax.numpy as jnp

    if x.dtype == jnp.uint8:
        x = (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    return x.astype(dtype)


def tensor_to_image(x: np.ndarray) -> np.ndarray:
    """float HWC (or NHWC) [-1, 1] -> uint8 [0, 255] (reference tensor2im /
    post-processing at app.ipynb:822-824)."""
    x = np.asarray(x, np.float32)
    x = (x / 2 + 0.5) * 255.0
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


def numpy_to_pil(images: np.ndarray):
    """NHWC float [0,1] or uint8 -> list of PIL images (reference
    numpy_to_pil, train_diffute_v1.py:530-543)."""
    from PIL import Image

    images = np.asarray(images)
    if images.ndim == 3:
        images = images[None]
    if images.dtype != np.uint8:
        images = np.clip(np.round(images * 255.0), 0, 255).astype(np.uint8)
    if images.shape[-1] == 1:
        return [Image.fromarray(im[..., 0], mode="L") for im in images]
    return [Image.fromarray(im) for im in images]
