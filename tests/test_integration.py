"""End-to-end framework integration: train (both stages) -> export diffusers
layout -> load -> edit.  The full user workflow in one test."""

import dataclasses

import jax
import numpy as np
import pytest

from diffute_tpu.config import tiny_test_config
from diffute_tpu.io import SyntheticSceneDataset, make_unet_batch, make_vae_batch
from diffute_tpu.pipeline import DiffUTEPipeline
from diffute_tpu.serve.loading import load_diffusers_layout
from diffute_tpu.train import UNetTrainer, VAETrainer
from diffute_tpu.train.checkpoint import (
    diffusers_unet_config_json,
    diffusers_vae_config_json,
    export_diffusers_layout,
)
from diffute_tpu.utils import init_pipeline_params


def test_full_workflow(tmp_path):
    cfg = tiny_test_config()
    params = init_pipeline_params(cfg)
    dataset = SyntheticSceneDataset(cfg)

    # stage 1: VAE
    vae_trainer = VAETrainer(cfg, params["vae"], total_steps=4)
    batch = make_vae_batch([dataset[i] for i in range(8)])
    for i in range(2):
        m = vae_trainer.step(batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(m["loss"]))

    # stage 2: UNet on top of the trained VAE
    frozen = {"vae": vae_trainer.state.params, "trocr": params["trocr"]}
    unet_trainer = UNetTrainer(cfg, params["unet"], frozen, total_steps=4)
    ubatch = make_unet_batch([dataset[i] for i in range(8)], cfg)
    for i in range(2):
        m = unet_trainer.step(ubatch, jax.random.PRNGKey(i))
    assert np.isfinite(float(m["loss"]))

    # export both into ONE diffusers-layout dir (like the reference's hooks)
    ckpt = str(tmp_path / "release")
    export_diffusers_layout(
        ckpt,
        unet_params=unet_trainer.state.params,
        vae_params=vae_trainer.state.params,
        unet_config=diffusers_unet_config_json(cfg.unet),
        vae_config=diffusers_vae_config_json(cfg.vae),
    )

    # load through the serving path and edit an image
    loaded = load_diffusers_layout(ckpt, cfg)
    pipe = DiffUTEPipeline(cfg, loaded)
    img = np.random.RandomState(0).randint(0, 255, (120, 160, 3), np.uint8)
    out, mask = pipe.edit(img, (40, 50, 100, 70), "NEW", num_inference_steps=2)
    assert out.shape == img.shape
    changed = (out != img).any(axis=-1)
    assert changed.any()
    ys, xs = np.where(changed)
    assert xs.min() >= 40 and xs.max() < 100
