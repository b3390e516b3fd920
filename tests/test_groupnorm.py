"""Fused GroupNorm+SiLU kernel parity vs flax GroupNorm + silu."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from diffute_tpu.ops.groupnorm import group_norm_silu, _xla_gn_silu


def _flax_ref(x, scale, bias, groups, eps):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps)
    params = {"params": {"scale": scale, "bias": bias}}
    return nn.silu(gn.apply(params, x))


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 64), 4),
    ((1, 64, 64, 320), 32),   # UNet top block at 512^2
    ((1, 16, 16, 1280), 32),  # UNet deep block
])
def test_pallas_gn_silu_parity(shape, groups):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape)
    scale = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (shape[-1],)) * 0.1
    ref = _flax_ref(x, scale, bias, groups, 1e-5)
    with pltpu.force_tpu_interpret_mode():
        out = group_norm_silu(x, scale, bias, groups, 1e-5, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_xla_fallback_parity():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 64))
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    ref = _flax_ref(x, scale, bias, 8, 1e-6)
    out = _xla_gn_silu(x, scale, bias, 8, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_large_slab_falls_back():
    # VAE-scale slab exceeds the VMEM limit -> must route to XLA (same math)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 256, 128))
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))
    out = group_norm_silu(x, scale, bias, 32, 1e-6, use_pallas=True)
    ref = _flax_ref(x, scale, bias, 32, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_bfloat16():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 64), jnp.bfloat16)
    scale = jnp.ones((64,), jnp.bfloat16)
    bias = jnp.zeros((64,), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = group_norm_silu(x, scale, bias, 8, 1e-5)
    assert out.dtype == jnp.bfloat16
    ref = _flax_ref(x.astype(jnp.float32), scale.astype(jnp.float32),
                    bias.astype(jnp.float32), 8, 1e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)
