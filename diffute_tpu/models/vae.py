"""AutoencoderKL (SD2 VAE) in Flax, NHWC.

The model the reference fine-tunes for document fidelity in stage 1
(reference train_vae.py:516-517, full fwd at :721-722) and uses frozen for
latent encode/decode in stage 2 (train_diffute_v1.py:632,875-876,886-887) and
at inference (app.ipynb:781-783,818-819).

Architecture = SD2 `vae/config.json`: block_out_channels (128,256,512,512),
2 layers/block, latent_channels 4, GroupNorm(32, eps 1e-6), SiLU, single-head
mid-block attention.  Scaling by `scaling_factor` (0.18215) is the caller's
job, mirroring the reference call sites.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffute_tpu.config import VAEConfig
from diffute_tpu.models.attention import Attention
from diffute_tpu.models.layers import Downsample2D, ResnetBlock2D, Upsample2D


class MidBlock(nn.Module):
    """resnet -> single-head attention -> resnet (VAE mid block)."""

    channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResnetBlock2D(self.channels, use_time_emb=False, groups=self.groups,
                          eps=1e-6, dtype=self.dtype, name="resnets_0")(x)
        b, h, w, c = x.shape
        res = x
        hidden = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                              dtype=self.dtype, name="attn_group_norm")(x)
        hidden = hidden.reshape(b, h * w, c)
        hidden = Attention(num_heads=1, head_dim=c, qkv_bias=True,
                           use_flash=self.use_flash,
                           dtype=self.dtype, name="attentions_0")(hidden)
        x = res + hidden.reshape(b, h, w, c)
        x = ResnetBlock2D(self.channels, use_time_emb=False, groups=self.groups,
                          eps=1e-6, dtype=self.dtype, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        resnet = nn.remat(ResnetBlock2D) if cfg.remat else ResnetBlock2D
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=cfg.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = resnet(ch, use_time_emb=False, groups=cfg.norm_num_groups,
                           eps=1e-6, dtype=cfg.dtype,
                           name=f"down_blocks_{i}_resnets_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                x = Downsample2D(ch, dtype=cfg.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(x)
        x = MidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                     dtype=cfg.dtype, use_flash=cfg.use_flash_attention,
                     name="mid_block")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=cfg.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=cfg.dtype, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        resnet = nn.remat(ResnetBlock2D) if cfg.remat else ResnetBlock2D
        rev = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype,
                    name="conv_in")(z)
        x = MidBlock(rev[0], cfg.norm_num_groups, dtype=cfg.dtype,
                     use_flash=cfg.use_flash_attention, name="mid_block")(x)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = resnet(ch, use_time_emb=False, groups=cfg.norm_num_groups,
                           eps=1e-6, dtype=cfg.dtype,
                           name=f"up_blocks_{i}_resnets_{j}")(x)
            if i < len(rev) - 1:
                x = Upsample2D(ch, dtype=cfg.dtype,
                               name=f"up_blocks_{i}_upsamplers_0")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=cfg.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=cfg.dtype, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    """KL autoencoder with diagonal-Gaussian latent.

    ``encode`` returns (mean, logvar); sampling and the 0.18215 scale happen
    at the call site, matching `latent_dist.sample() * scaling_factor`
    (reference train_diffute_v1.py:875-876).
    """

    config: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.config.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.config.dtype,
                                       name="post_quant_conv")

    def encode(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x (B,H,W,3) in [-1,1] -> (mean, logvar), each (B,H/8,W/8,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def decode(self, z: jax.Array) -> jax.Array:
        """z (B,h,w,4) (already divided by scaling_factor) -> (B,H,W,3)."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        """Full encode->sample->decode pass, the stage-1 training forward
        (reference train_vae.py:721-722)."""
        mean, logvar = self.encode(x)
        z = sample_latent(mean, logvar, rng)
        return self.decode(z)


def sample_latent(mean: jax.Array, logvar: jax.Array, rng: jax.Array) -> jax.Array:
    """DiagonalGaussianDistribution.sample()."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
