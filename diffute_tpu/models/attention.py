"""Transformer blocks for the UNet (self + cross attention, GEGLU FFN).

Implements the slice of diffusers' Transformer2DModel that SD2-inpainting
exercises (the reference's UNet forward at train_diffute_v1.py:913 /
app.ipynb:814): linear-projection spatial transformer, pre-LN blocks, GEGLU
feed-forward, cross-attention over the 577-token TrOCR conditioning.

All attention routes through diffute_tpu.ops.dot_product_attention so the
Pallas flash kernel swaps in via a single flag (the TPU analogue of the
reference's xformers opt-in, train_diffute_v1.py:648-659).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffute_tpu.ops import dot_product_attention


class Attention(nn.Module):
    """Multi-head attention with separate q/k/v projections (no biases),
    matching SD's `CrossAttention` parameterization."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    out_bias: bool = True
    qkv_bias: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[jax.Array] = None
    ) -> jax.Array:
        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_v")(context)

        b, s, _ = q.shape
        t = k.shape[1]
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, t, self.num_heads, self.head_dim)
        v = v.reshape(b, t, self.num_heads, self.head_dim)

        out = dot_product_attention(q, k, v, use_flash=self.use_flash)
        out = out.reshape(b, s, inner)
        return nn.Dense(inner, use_bias=self.out_bias, dtype=self.dtype,
                        name="to_out_0")(out)


class GEGLU(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.inner_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        attn_kw = dict(num_heads=self.num_heads, head_dim=self.head_dim,
                       dtype=self.dtype, use_flash=self.use_flash)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + Attention(**attn_kw, name="attn1")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Attention(**attn_kw, name="attn2")(h, context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(x.shape[-1], dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> (linear) proj_in -> blocks -> proj_out + res.

    SD2 uses use_linear_projection=True (1x1-conv-free path); depth is 1
    everywhere in SD2-inpainting.
    """

    num_heads: int
    head_dim: int
    depth: int = 1
    groups: int = 32
    use_linear_projection: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(c, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                num_heads=self.num_heads, head_dim=self.head_dim,
                dtype=self.dtype, use_flash=self.use_flash,
                name=f"transformer_blocks_{i}",
            )(x, context)
        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, c)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual
