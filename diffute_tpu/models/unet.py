"""UNet2DCondition (SD2-inpainting topology) in Flax, NHWC.

The denoiser at the heart of DiffUTE: 9 input channels (4 noisy latent + 1
downsampled mask + 4 masked-image latent, concatenated at reference
train_diffute_v1.py:912 / app.ipynb:811), cross-attention over 577-token
TrOCR glyph embeddings of width 1024 (reference train_diffute_v1.py:870-871).

Topology = SD2-inpainting `unet/config.json`: block_out_channels
(320,640,1280,1280), 2 layers/block, CrossAttn on the three highest
resolutions, heads (5,10,20,20) -> uniform head_dim 64, linear transformer
projections, GroupNorm(32, eps 1e-5), SiLU.

TPU-first choices: NHWC layout, static shapes under `jit`/`pjit`, optional
`nn.remat`, Pallas flash attention via ``config.use_flash_attention``.

The forward is split into :meth:`encode` (conv_in + down path) and
:meth:`decode` (mid + up path + head) so samplers can cache and propagate
encoder features across adjacent timesteps — the "encoder propagation"
acceleration of Faster Diffusion (Li et al., arXiv:2312.09608; see
PAPERS.md): E(z_t) changes little between neighbouring t, so non-key steps
re-run only the decoder.  ``__call__`` composes both and is the exact
standard UNet forward.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

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

    def setup(self):
        cfg = self.config
        ch0 = cfg.block_out_channels[0]
        n_blocks = len(cfg.block_out_channels)

        resnet = ResnetBlock2D
        transformer = Transformer2D
        if cfg.remat:
            resnet = nn.remat(ResnetBlock2D)
            transformer = nn.remat(Transformer2D)
        resnet = functools.partial(resnet, groups=cfg.norm_num_groups,
                                   dtype=cfg.dtype,
                                   fused_gn=cfg.use_fused_groupnorm,
                                   fused_conv=cfg.use_fused_conv)

        def attn(i, name):
            heads = cfg.num_attention_heads[i]
            ch = cfg.block_out_channels[i]
            return transformer(
                num_heads=heads, head_dim=ch // heads,
                use_linear_projection=cfg.use_linear_projection,
                groups=cfg.norm_num_groups, dtype=cfg.dtype,
                use_flash=cfg.use_flash_attention,
                use_int8=cfg.use_int8_weights, name=name)

        self.time_embedding = TimestepEmbedding(ch0 * 4, dtype=cfg.dtype)
        self.conv_in = nn.Conv(ch0, (3, 3), padding=((1, 1), (1, 1)),
                               dtype=cfg.dtype)

        down_resnets, down_attns, downsamplers = [], [], []
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                down_resnets.append(resnet(
                    ch, name=f"down_blocks_{i}_resnets_{j}"))
                down_attns.append(
                    attn(i, f"down_blocks_{i}_attentions_{j}")
                    if cfg.down_block_has_attn[i] else None)
            downsamplers.append(
                Downsample2D(ch, dtype=cfg.dtype,
                             name=f"down_blocks_{i}_downsamplers_0")
                if i < n_blocks - 1 else None)
        self._down_resnets = down_resnets
        self._down_attns = down_attns
        self._downsamplers = downsamplers

        mid_ch = cfg.block_out_channels[-1]
        self.mid_block_resnets_0 = resnet(mid_ch)
        self.mid_block_attentions_0 = attn(n_blocks - 1, None)
        self.mid_block_resnets_1 = resnet(mid_ch)

        rev_ch = tuple(reversed(cfg.block_out_channels))
        rev_idx = tuple(reversed(range(n_blocks)))
        up_resnets, up_attns, upsamplers = [], [], []
        for u, (ch, i) in enumerate(zip(rev_ch, rev_idx)):
            for j in range(cfg.layers_per_block + 1):
                up_resnets.append(resnet(ch, name=f"up_blocks_{u}_resnets_{j}"))
                up_attns.append(
                    attn(i, f"up_blocks_{u}_attentions_{j}")
                    if cfg.up_block_has_attn[u] else None)
            upsamplers.append(
                Upsample2D(ch, dtype=cfg.dtype,
                           name=f"up_blocks_{u}_upsamplers_0")
                if u < n_blocks - 1 else None)
        self._up_resnets = up_resnets
        self._up_attns = up_attns
        self._upsamplers = upsamplers

        if cfg.use_fused_groupnorm:
            self.conv_norm_out = GroupNormSiLU(groups=cfg.norm_num_groups,
                                               eps=1e-5)
        else:
            self.conv_norm_out = nn.GroupNorm(num_groups=cfg.norm_num_groups,
                                              epsilon=1e-5, dtype=cfg.dtype)
        self.conv_out = nn.Conv(cfg.out_channels, (3, 3),
                                padding=((1, 1), (1, 1)), dtype=cfg.dtype)

    # ------------------------------------------------------------------

    def time_embed(self, timesteps: jax.Array, batch: int) -> jax.Array:
        cfg = self.config
        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift,
        ).astype(cfg.dtype)
        if t_emb.shape[0] == 1 and batch > 1:
            t_emb = jnp.broadcast_to(t_emb, (batch, t_emb.shape[1]))
        return self.time_embedding(t_emb)

    def cross_attention_kv(self, encoder_hidden_states: jax.Array):
        """Precompute every cross-attention layer's (k, v) over the
        conditioning — loop-invariant across denoising steps; pass the result
        as ``cross_kv`` to encode/decode/__call__ to skip the projections."""
        kvs = []
        for a in self._down_attns:
            if a is not None:
                kvs.append(a.cross_kv(encoder_hidden_states))
        kvs.append(self.mid_block_attentions_0.cross_kv(encoder_hidden_states))
        for a in self._up_attns:
            if a is not None:
                kvs.append(a.cross_kv(encoder_hidden_states))
        return tuple(kvs)

    @property
    def _n_down_attns(self) -> int:
        return sum(a is not None for a in self._down_attns)

    def encode(
        self,
        sample: jax.Array,               # (B, H, W, 9)
        temb: jax.Array,                 # (B, 1280)
        encoder_hidden_states: jax.Array,
        cross_kv=None,
    ) -> Tuple[jax.Array, List[jax.Array]]:
        """conv_in + down path -> (bottom features, skip stack)."""
        cfg = self.config
        x = self.conv_in(sample)
        skips = [x]
        li = 0
        ai = 0
        n_blocks = len(cfg.block_out_channels)
        for i in range(n_blocks):
            for _ in range(cfg.layers_per_block):
                x = self._down_resnets[li](x, temb)
                if self._down_attns[li] is not None:
                    x = self._down_attns[li](
                        x, encoder_hidden_states,
                        cross_kv=cross_kv[ai] if cross_kv is not None else None)
                    ai += 1
                skips.append(x)
                li += 1
            if self._downsamplers[i] is not None:
                x = self._downsamplers[i](x)
                skips.append(x)
        return x, skips

    def decode(
        self,
        x: jax.Array,
        skips: List[jax.Array],
        temb: jax.Array,
        encoder_hidden_states: jax.Array,
        cross_kv=None,
    ) -> jax.Array:
        """mid block + up path + output head."""
        cfg = self.config
        skips = list(skips)
        ai = self._n_down_attns  # decode's slice of the kv tuple starts here

        def kv(idx):
            return cross_kv[idx] if cross_kv is not None else None

        x = self.mid_block_resnets_0(x, temb)
        x = self.mid_block_attentions_0(x, encoder_hidden_states,
                                        cross_kv=kv(ai))
        ai += 1
        x = self.mid_block_resnets_1(x, temb)

        li = 0
        n_blocks = len(cfg.block_out_channels)
        for u in range(n_blocks):
            for _ in range(cfg.layers_per_block + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = self._up_resnets[li](x, temb)
                if self._up_attns[li] is not None:
                    x = self._up_attns[li](x, encoder_hidden_states,
                                           cross_kv=kv(ai))
                    ai += 1
                li += 1
            if self._upsamplers[u] is not None:
                x = self._upsamplers[u](x)

        x = self.conv_norm_out(x)
        if not cfg.use_fused_groupnorm:
            x = nn.silu(x)
        return self.conv_out(x)

    def __call__(
        self,
        sample: jax.Array,          # (B, H, W, 9)
        timesteps: jax.Array,       # () or (B,)
        encoder_hidden_states: jax.Array,  # (B, 577, 1024)
        cross_kv=None,
    ) -> jax.Array:                 # (B, H, W, 4)
        temb = self.time_embed(timesteps, sample.shape[0])
        x, skips = self.encode(sample, temb, encoder_hidden_states, cross_kv)
        return self.decode(x, skips, temb, encoder_hidden_states, cross_kv)


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
