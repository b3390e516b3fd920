"""torch-compatible nearest-neighbor resize.

The reference downsamples the inpainting mask to latent resolution with
``torch.nn.functional.interpolate`` in its default 'nearest' mode
(train_diffute_v1.py:881-883, app.ipynb:787-790), which samples
``src = floor(dst * in/out)`` — the FIRST pixel of each block.
``jax.image.resize(method='nearest')`` samples block centers instead,
flipping the boundary rows/columns of the downsampled mask (measured ~50%
of elements on random masks, one row/col per edge on rectangle masks).
Since the mask is one of the UNet's 9 conditioning channels, reference
parity requires torch's convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_resize_2d(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """(B, H, W) or (B, H, W, C) -> same rank with (out_h, out_w) spatial dims,
    using torch F.interpolate 'nearest' index semantics."""
    h, w = x.shape[1], x.shape[2]
    iy = (jnp.arange(out_h) * h) // out_h
    ix = (jnp.arange(out_w) * w) // out_w
    return x[:, iy][:, :, ix]
