"""Parameter initialization helpers.

Always initialize under ``jit``: on the tunneled single-TPU dev setup each
eager op pays a network round-trip, so un-jitted flax ``init`` (thousands of
tiny ops) takes minutes while a jitted init compiles once and runs in
milliseconds.

Per-component helpers are shared by test/bench init and by
serve.loading's missing-component fallback (one source of init shapes).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from diffute_tpu.config import DiffUTEConfig
from diffute_tpu.models import AutoencoderKL, TrOCREncoder, UNet2DCondition


def init_vae_params(config: DiffUTEConfig, key: jax.Array) -> dict:
    vae = AutoencoderKL(config.vae)
    res = config.edit.resolution
    return jax.jit(vae.init)(key, jnp.zeros((1, res, res, 3)), key)["params"]


def init_unet_params(config: DiffUTEConfig, key: jax.Array) -> dict:
    unet = UNet2DCondition(config.unet)
    lat = config.edit.resolution // config.vae.scale_factor
    return jax.jit(unet.init)(
        key, jnp.zeros((1, lat, lat, config.unet.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, config.trocr.seq_len, config.trocr.hidden_size)))["params"]


def init_trocr_params(config: DiffUTEConfig, key: jax.Array) -> dict:
    trocr = TrOCREncoder(config.trocr)
    size = config.trocr.image_size
    return jax.jit(trocr.init)(key, jnp.zeros((1, size, size, 3)))["params"]


def init_pipeline_params(config: DiffUTEConfig, seed: int = 0) -> Dict[str, dict]:
    """Random-init params for all three models (for tests/benches; real use
    imports HF weights via diffute_tpu.compat)."""
    k_vae, k_unet, k_trocr = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {
        "vae": init_vae_params(config, k_vae),
        "unet": init_unet_params(config, k_unet),
        "trocr": init_trocr_params(config, k_trocr),
    }
