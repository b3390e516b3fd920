"""Transformer blocks for the UNet (self + cross attention, GEGLU FFN).

Implements the slice of diffusers' Transformer2DModel that SD2-inpainting
exercises (the reference's UNet forward at train_diffute_v1.py:913 /
app.ipynb:814): linear-projection spatial transformer, pre-LN blocks, GEGLU
feed-forward, cross-attention over the 577-token TrOCR conditioning.

All attention routes through diffute_tpu.ops.dot_product_attention so the
Pallas flash kernel swaps in via a single flag (the TPU analogue of the
reference's xformers opt-in, train_diffute_v1.py:648-659).

Cross-attention K/V over the conditioning are loop-invariant in a denoising
sampler (the TrOCR context never changes across steps); ``cross_kv`` lets
callers precompute them once outside the scan (``Transformer2D.cross_kv``)
and skip the to_k/to_v projections on every step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffute_tpu.models.layers import QuantDense
from diffute_tpu.ops import dot_product_attention

KV = Tuple[jax.Array, jax.Array]  # each (B, T, heads, head_dim)


class Attention(nn.Module):
    """Multi-head attention with separate q/k/v projections (no biases),
    matching SD's `CrossAttention` parameterization."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    out_bias: bool = True
    qkv_bias: bool = False
    use_int8: bool = False

    def setup(self):
        inner = self.num_heads * self.head_dim
        Dense = QuantDense if self.use_int8 else nn.Dense
        dense = lambda name: Dense(inner, use_bias=self.qkv_bias,
                                   dtype=self.dtype, name=name)
        self.to_q = dense("to_q")
        self.to_k = dense("to_k")
        self.to_v = dense("to_v")
        self.to_out_0 = Dense(inner, use_bias=self.out_bias,
                              dtype=self.dtype, name="to_out_0")

    def kv(self, context: jax.Array) -> KV:
        """Project context -> (k, v), each (B, T, H, D) — precomputable."""
        b, t, _ = context.shape
        k = self.to_k(context).reshape(b, t, self.num_heads, self.head_dim)
        v = self.to_v(context).reshape(b, t, self.num_heads, self.head_dim)
        return k, v

    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        kv: Optional[KV] = None,
    ) -> jax.Array:
        if kv is None:
            kv = self.kv(x if context is None else context)
        k, v = kv
        b, s, _ = x.shape
        q = self.to_q(x).reshape(b, s, self.num_heads, self.head_dim)
        out = dot_product_attention(q, k, v, use_flash=self.use_flash)
        out = out.reshape(b, s, self.num_heads * self.head_dim)
        return self.to_out_0(out)


class GEGLU(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32
    use_int8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        Dense = QuantDense if self.use_int8 else nn.Dense
        h = Dense(self.inner_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) GELU — SD's GEGLU uses torch F.gelu, not the tanh
        # approximation (flax's default)
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    use_int8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = GEGLU(self.dim * self.mult, dtype=self.dtype,
                  use_int8=self.use_int8, name="net_0")(x)
        Dense = QuantDense if self.use_int8 else nn.Dense
        return Dense(self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_int8: bool = False

    def setup(self):
        attn_kw = dict(num_heads=self.num_heads, head_dim=self.head_dim,
                       dtype=self.dtype, use_flash=self.use_flash,
                       use_int8=self.use_int8)
        # torch nn.LayerNorm default eps (the SD2 checkpoints' value) is
        # 1e-5; flax's default is 1e-6
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn1 = Attention(**attn_kw)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn2 = Attention(**attn_kw)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.ff = FeedForward(self.num_heads * self.head_dim,
                              dtype=self.dtype, use_int8=self.use_int8)

    def cross_kv(self, context: jax.Array) -> KV:
        return self.attn2.kv(context)

    def __call__(self, x: jax.Array, context: jax.Array,
                 cross_kv: Optional[KV] = None) -> jax.Array:
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context, kv=cross_kv)
        x = x + self.ff(self.norm3(x))
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
    use_int8: bool = False

    def setup(self):
        c = self.num_heads * self.head_dim
        self.norm = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                                 dtype=self.dtype)
        Dense = QuantDense if self.use_int8 else nn.Dense
        if self.use_linear_projection:
            self.proj_in = Dense(c, dtype=self.dtype)
            self.proj_out = Dense(c, dtype=self.dtype)
        else:
            self.proj_in = nn.Conv(c, (1, 1), dtype=self.dtype)
            self.proj_out = nn.Conv(c, (1, 1), dtype=self.dtype)
        self.transformer_blocks = [
            BasicTransformerBlock(
                num_heads=self.num_heads, head_dim=self.head_dim,
                dtype=self.dtype, use_flash=self.use_flash,
                use_int8=self.use_int8, name=f"transformer_blocks_{i}")
            for i in range(self.depth)
        ]

    def cross_kv(self, context: jax.Array) -> Tuple[KV, ...]:
        return tuple(blk.cross_kv(context) for blk in self.transformer_blocks)

    def __call__(self, x: jax.Array, context: jax.Array,
                 cross_kv: Optional[Tuple[KV, ...]] = None) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        x = self.norm(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = self.proj_in(x)
        else:
            x = self.proj_in(x)
            x = x.reshape(b, h * w, c)
        for i, blk in enumerate(self.transformer_blocks):
            x = blk(x, context,
                    cross_kv=cross_kv[i] if cross_kv is not None else None)
        if self.use_linear_projection:
            x = self.proj_out(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, c)
            x = self.proj_out(x)
        return x + residual
