"""Load model params from a diffusers-layout checkpoint directory.

Accepts the directory structure the reference trains into / loads from
(train_diffute_v1.py:628-635): ``unet/`` (or ``unet_ema/``), ``vae/`` with
``diffusion_pytorch_model.safetensors``, plus an optional ``trocr/`` export
(``model.safetensors`` in transformers naming).  Missing components fall
back to random init so partial checkpoints remain usable.
"""

from __future__ import annotations

import os
from typing import Dict

from diffute_tpu.compat import (
    import_trocr_state_dict,
    import_unet_state_dict,
    import_vae_state_dict,
    load_safetensors,
)
from diffute_tpu.config import DiffUTEConfig
from diffute_tpu.utils import init_pipeline_params


def load_diffusers_layout(path: str, config: DiffUTEConfig) -> Dict[str, dict]:
    params = init_pipeline_params(config)

    def find(sub, names):
        for n in names:
            p = os.path.join(path, sub, n)
            if os.path.exists(p):
                return p
        return None

    unet_f = (find("unet_ema", ["diffusion_pytorch_model.safetensors"]) or
              find("unet", ["diffusion_pytorch_model.safetensors"]))
    if unet_f:
        params["unet"] = import_unet_state_dict(load_safetensors(unet_f))
    vae_f = find("vae", ["diffusion_pytorch_model.safetensors"])
    if vae_f:
        params["vae"] = import_vae_state_dict(load_safetensors(vae_f))
    trocr_f = find("trocr", ["model.safetensors"])
    if trocr_f:
        params["trocr"] = import_trocr_state_dict(load_safetensors(trocr_f))
    return params
