"""Load model params from a diffusers-layout checkpoint directory.

Accepts the directory structure the reference trains into / loads from
(train_diffute_v1.py:628-635): ``unet/`` (or ``unet_ema/``), ``vae/`` with
``diffusion_pytorch_model.safetensors``, plus an optional ``trocr/`` export
(``model.safetensors`` in transformers naming).  Only MISSING components are
random-initialized (full-size inits cost minutes of compile on the remote
TPU service — never pay them for weights that are about to be overwritten).
"""

from __future__ import annotations

import os
from typing import Dict

import jax

from diffute_tpu.compat import (
    import_trocr_state_dict,
    import_unet_state_dict,
    import_vae_state_dict,
    load_safetensors,
)
from diffute_tpu.config import DiffUTEConfig
from diffute_tpu.utils.params import (
    init_trocr_params,
    init_unet_params,
    init_vae_params,
)


def _find(path: str, sub: str, names) -> str | None:
    for n in names:
        p = os.path.join(path, sub, n)
        if os.path.exists(p):
            return p
    return None


def load_diffusers_layout(path: str, config: DiffUTEConfig) -> Dict[str, dict]:
    params: Dict[str, dict] = {}

    unet_f = (_find(path, "unet_ema", ["diffusion_pytorch_model.safetensors"]) or
              _find(path, "unet", ["diffusion_pytorch_model.safetensors"]))
    if unet_f:
        params["unet"] = import_unet_state_dict(load_safetensors(unet_f))
    vae_f = _find(path, "vae", ["diffusion_pytorch_model.safetensors"])
    if vae_f:
        params["vae"] = import_vae_state_dict(load_safetensors(vae_f))
    trocr_f = _find(path, "trocr", ["model.safetensors"])
    if trocr_f:
        params["trocr"] = import_trocr_state_dict(load_safetensors(trocr_f))

    # random-init only the components the checkpoint does not provide
    k = jax.random.PRNGKey(0)
    if "vae" not in params:
        params["vae"] = init_vae_params(config, k)
    if "unet" not in params:
        params["unet"] = init_unet_params(config, k)
    if "trocr" not in params:
        params["trocr"] = init_trocr_params(config, k)
    return params
