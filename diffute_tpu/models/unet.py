"""UNet2DCondition (SD2-inpainting topology) in Flax, NHWC.

The denoiser at the heart of DiffUTE: 9 input channels (4 noisy latent + 1
downsampled mask + 4 masked-image latent, concatenated at reference
train_diffute_v1.py:912 / app.ipynb:811), cross-attention over 577-token
TrOCR glyph embeddings of width 1024 (reference train_diffute_v1.py:870-871).

Topology = SD2-inpainting `unet/config.json`: block_out_channels
(320,640,1280,1280), 2 layers/block, CrossAttn on the three highest
resolutions, heads (5,10,20,20) -> uniform head_dim 64, linear transformer
projections, GroupNorm(32, eps 1e-5), SiLU.

TPU-first choices: NHWC layout, a single `__call__` usable under `jit`/`pjit`
with static shapes, optional `nn.remat` over transformer+resnet pairs for
training memory, and attention routed through the Pallas flash kernel when
``config.use_flash_attention`` is set.
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffute_tpu.config import UNetConfig
from diffute_tpu.models.attention import Transformer2D
from diffute_tpu.models.layers import (
    Downsample2D,
    GroupNormSiLU,
    ResnetBlock2D,
    TimestepEmbedding,
    Upsample2D,
    timestep_embedding,
)


class UNet2DCondition(nn.Module):
    config: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,          # (B, H, W, 9)
        timesteps: jax.Array,       # () or (B,)
        encoder_hidden_states: jax.Array,  # (B, 577, 1024)
    ) -> jax.Array:                 # (B, H, W, 4)
        cfg = self.config
        ch0 = cfg.block_out_channels[0]
        time_embed_dim = ch0 * 4

        resnet = functools.partial(ResnetBlock2D,
                                   fused_gn=cfg.use_fused_groupnorm)
        transformer = Transformer2D
        if cfg.remat:
            resnet = functools.partial(nn.remat(ResnetBlock2D),
                                       fused_gn=cfg.use_fused_groupnorm)
            transformer = nn.remat(Transformer2D)

        # --- time embedding ---
        t_emb = timestep_embedding(
            timesteps, ch0, flip_sin_to_cos=cfg.flip_sin_to_cos,
            freq_shift=cfg.freq_shift,
        ).astype(cfg.dtype)
        if t_emb.shape[0] == 1 and sample.shape[0] > 1:
            t_emb = jnp.broadcast_to(t_emb, (sample.shape[0], t_emb.shape[1]))
        temb = TimestepEmbedding(time_embed_dim, dtype=cfg.dtype,
                                 name="time_embedding")(t_emb)

        def make_attn(i: int, name: str):
            heads = cfg.num_attention_heads[i]
            ch = cfg.block_out_channels[i]
            return transformer(
                num_heads=heads, head_dim=ch // heads,
                use_linear_projection=cfg.use_linear_projection,
                groups=cfg.norm_num_groups, dtype=cfg.dtype,
                use_flash=cfg.use_flash_attention, name=name,
            )

        # --- down path ---
        x = nn.Conv(ch0, (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype,
                    name="conv_in")(sample)
        skips = [x]
        n_blocks = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = resnet(ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                           name=f"down_blocks_{i}_resnets_{j}")(x, temb)
                if cfg.down_block_has_attn[i]:
                    x = make_attn(i, f"down_blocks_{i}_attentions_{j}")(
                        x, encoder_hidden_states)
                skips.append(x)
            if i < n_blocks - 1:
                x = Downsample2D(ch, dtype=cfg.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(x)
                skips.append(x)

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        mid_heads = cfg.num_attention_heads[-1]
        x = resnet(mid_ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                   name="mid_block_resnets_0")(x, temb)
        x = transformer(
            num_heads=mid_heads, head_dim=mid_ch // mid_heads,
            use_linear_projection=cfg.use_linear_projection,
            groups=cfg.norm_num_groups, dtype=cfg.dtype,
            use_flash=cfg.use_flash_attention, name="mid_block_attentions_0",
        )(x, encoder_hidden_states)
        x = resnet(mid_ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                   name="mid_block_resnets_1")(x, temb)

        # --- up path ---
        rev_ch = tuple(reversed(cfg.block_out_channels))
        rev_idx = tuple(reversed(range(n_blocks)))
        for u, (ch, i) in enumerate(zip(rev_ch, rev_idx)):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = resnet(ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                           name=f"up_blocks_{u}_resnets_{j}")(x, temb)
                if cfg.up_block_has_attn[u]:
                    heads = cfg.num_attention_heads[i]
                    x = transformer(
                        num_heads=heads, head_dim=ch // heads,
                        use_linear_projection=cfg.use_linear_projection,
                        groups=cfg.norm_num_groups, dtype=cfg.dtype,
                        use_flash=cfg.use_flash_attention,
                        name=f"up_blocks_{u}_attentions_{j}",
                    )(x, encoder_hidden_states)
            if u < n_blocks - 1:
                x = Upsample2D(ch, dtype=cfg.dtype,
                               name=f"up_blocks_{u}_upsamplers_0")(x)

        # --- out ---
        if cfg.use_fused_groupnorm:
            x = GroupNormSiLU(groups=cfg.norm_num_groups, eps=1e-5,
                              name="conv_norm_out")(x)
        else:
            x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                             dtype=cfg.dtype, name="conv_norm_out")(x)
            x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=cfg.dtype, name="conv_out")(x)
        return x


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
