"""Shared building blocks for the VAE and UNet (Flax, NHWC).

TPU-first design notes:
- All convolutions run in NHWC/HWIO — the layout XLA:TPU tiles best; the
  reference's torch stack is NCHW (weight import transposes, see
  diffute_tpu.compat.hf_import).
- Submodule names intentionally mirror diffusers' module paths
  (norm1/conv1/time_emb_proj/...) so HF checkpoint import is a mechanical
  rename, keeping loader compatibility with the checkpoints the reference
  trains (train_diffute_v1.py:628-635).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class QuantDense(nn.Module):
    """Dense layer over int8 weights with per-output-channel scales.

    Drop-in for ``nn.Dense`` in SERVING paths (no custom VJP): params are
    ``kernel_q`` (K, N) int8 + ``kernel_scale`` (N,) f32 instead of a float
    ``kernel``; :func:`diffute_tpu.ops.quant.convert_dense_params_to_int8`
    rewrites a float checkpoint tree into this structure.  The matmul reads
    int8 from HBM and applies the scale to the accumulator
    (diffute_tpu.ops.quant.quant_matmul) — the weight-bandwidth half of the
    reference's 8-bit opt-ins (train_diffute_v1.py:244-248).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from diffute_tpu.ops.quant import quant_matmul

        k = x.shape[-1]
        q = self.param("kernel_q", nn.initializers.zeros,
                       (k, self.features), jnp.int8)
        scale = self.param("kernel_scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        y = quant_matmul(x.astype(self.dtype), q, scale)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep embeddings (SD convention).

    Equivalent of the `Timesteps` projection feeding the UNet's time MLP
    (the reference gets this inside diffusers' UNet2DConditionModel forward,
    train_diffute_v1.py:913).
    """
    timesteps = jnp.atleast_1d(timesteps)
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        out = jnp.concatenate([cos, sin], axis=-1)
    else:
        out = jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP over the sinusoidal embedding."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class GroupNormSiLU(nn.Module):
    """GroupNorm fused with SiLU (Pallas kernel when shapes allow).

    Parameter names/shapes identical to ``nn.GroupNorm`` (scale, bias) so the
    HF weight mapping is unchanged.
    """

    groups: int = 32
    eps: float = 1e-5
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from diffute_tpu.ops.groupnorm import group_norm_silu

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_silu(x, scale, bias, self.groups, self.eps,
                               use_pallas=self.use_pallas)


class _AffineParams(nn.Module):
    """GroupNorm-compatible (scale, bias) params without the compute —
    lets the fused GN+SiLU+conv kernel own the math while the param tree
    stays bit-identical to ``nn.GroupNorm`` (checkpoint-interchangeable)."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class _Conv3x3Params(nn.Module):
    """``nn.Conv(3x3)``-compatible (kernel, bias) params (HWIO)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class ResnetBlock2D(nn.Module):
    """GroupNorm -> SiLU -> Conv ×2 with optional time-embedding injection."""

    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    fused_gn: bool = False
    fused_conv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        in_channels = x.shape[-1]

        def norm_silu(name):
            if self.fused_gn:
                return GroupNormSiLU(groups=self.groups, eps=self.eps, name=name)
            gn = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                              dtype=self.dtype, name=name)
            return lambda x: nn.silu(gn(x))

        def gn_conv(norm_name, conv_name, inp):
            """One GN->SiLU->conv3x3 half of the block."""
            if self.fused_conv:
                from diffute_tpu.ops.conv_fused import gn_silu_conv3x3

                s, b = _AffineParams(inp.shape[-1], name=norm_name)()
                k, cb = _Conv3x3Params(inp.shape[-1], self.out_channels,
                                       name=conv_name)()
                return gn_silu_conv3x3(inp.astype(self.dtype), s, b, k, cb,
                                       self.groups, self.eps)
            h = norm_silu(norm_name)(inp)
            return nn.Conv(self.out_channels, (3, 3),
                           padding=((1, 1), (1, 1)), dtype=self.dtype,
                           name=conv_name)(h)

        h = gn_conv("norm1", "conv1", x)
        if self.use_time_emb:
            assert temb is not None
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = gn_conv("norm2", "conv2", h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv with asymmetric (0,1) padding (SD convention)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    """Nearest ×2 upsample + 3x3 conv (SD convention)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        # Nearest x2 as broadcast+reshape: bit-identical to
        # jax.image.resize(method="nearest") at exact integer scale, but
        # lowers to a fusable broadcast instead of a gather on TPU.
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (b, h, 2, w, 2, c)).reshape(b, h * 2, w * 2, c)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(x)
