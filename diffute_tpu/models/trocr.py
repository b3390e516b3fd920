"""TrOCR-large glyph encoder (ViT-large) in Flax.

The conditioning network: the reference feeds rendered glyph images through
``VisionEncoderDecoderModel.from_pretrained('trocr-large-printed').encoder``
and uses ``last_hidden_state`` (B, 577, 1024) as the UNet's cross-attention
context (reference train_diffute_v1.py:631,870-871; app.ipynb:547,775-776).

This is a standard pre-LN ViT: 16x16 patch conv on 384x384 input -> 576
patches + CLS -> 24 layers (hidden 1024, 16 heads, MLP 4096, GELU) -> final
LayerNorm.  Frozen in both training stages and at inference.

Module names mirror HF's ViTModel so weight import is mechanical
(diffute_tpu.compat.hf_import); numeric parity is tested against
transformers' torch ViTModel in tests/test_trocr.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffute_tpu.config import TrOCRConfig
from diffute_tpu.ops import dot_product_attention


class ViTSelfAttention(nn.Module):
    config: TrOCRConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads
        q = nn.Dense(cfg.hidden_size, use_bias=cfg.qkv_bias, dtype=cfg.dtype,
                     name="query")(x)
        k = nn.Dense(cfg.hidden_size, use_bias=cfg.qkv_bias, dtype=cfg.dtype,
                     name="key")(x)
        v = nn.Dense(cfg.hidden_size, use_bias=cfg.qkv_bias, dtype=cfg.dtype,
                     name="value")(x)
        b, s, _ = x.shape
        q = q.reshape(b, s, heads, head_dim)
        k = k.reshape(b, s, heads, head_dim)
        v = v.reshape(b, s, heads, head_dim)
        out = dot_product_attention(q, k, v, use_flash=cfg.use_flash_attention)
        out = out.reshape(b, s, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output_dense")(out)


class ViTLayer(nn.Module):
    config: TrOCRConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="layernorm_before")(x)
        x = x + ViTSelfAttention(cfg, name="attention")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="layernorm_after")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                     name="intermediate_dense")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output_dense")(h)
        return x + h


class TrOCREncoder(nn.Module):
    config: TrOCRConfig = TrOCRConfig()

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """pixel_values (B, 384, 384, 3), normalized to [-1, 1] (TrOCRProcessor
        semantics, see diffute_tpu.text.preprocess) -> (B, 577, 1024)."""
        cfg = self.config
        b = pixel_values.shape[0]
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    dtype=cfg.dtype, name="patch_embeddings")(pixel_values)
        x = x.reshape(b, -1, cfg.hidden_size)  # (B, 576, H)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size), cfg.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), x],
                            axis=1)
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (1, cfg.seq_len, cfg.hidden_size), cfg.dtype)
        x = x + pos
        for i in range(cfg.num_hidden_layers):
            x = ViTLayer(cfg, name=f"layer_{i}")(x)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            name="layernorm")(x)
