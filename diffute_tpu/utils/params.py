"""Parameter initialization helpers.

Always initialize under ``jit``: on the tunneled single-TPU dev setup each
eager op pays a network round-trip, so un-jitted flax ``init`` (thousands of
tiny ops) takes minutes while a jitted init compiles once and runs in
milliseconds.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from diffute_tpu.config import DiffUTEConfig
from diffute_tpu.models import AutoencoderKL, TrOCREncoder, UNet2DCondition


def init_pipeline_params(config: DiffUTEConfig, seed: int = 0) -> Dict[str, dict]:
    """Random-init params for all three models (for tests/benches; real use
    imports HF weights via diffute_tpu.compat)."""
    vae = AutoencoderKL(config.vae)
    unet = UNet2DCondition(config.unet)
    trocr = TrOCREncoder(config.trocr)
    res = config.edit.resolution
    lat = res // config.vae.scale_factor
    k = jax.random.PRNGKey(seed)
    k_vae, k_unet, k_trocr, k_s = jax.random.split(k, 4)

    vae_params = jax.jit(vae.init)(
        k_vae, jnp.zeros((1, res, res, 3)), k_s)["params"]
    unet_params = jax.jit(unet.init)(
        k_unet, jnp.zeros((1, lat, lat, 9)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, config.trocr.seq_len, config.trocr.hidden_size)))["params"]
    trocr_params = jax.jit(trocr.init)(
        k_trocr, jnp.zeros((1, config.trocr.image_size,
                            config.trocr.image_size, 3)))["params"]
    return {"vae": vae_params, "unet": unet_params, "trocr": trocr_params}
