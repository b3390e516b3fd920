"""Checkpoint loading: diffusers-layout export -> load_diffusers_layout
round-trip, unet_ema preference, partial checkpoints."""

import numpy as np
import pytest

from diffute_tpu.config import tiny_test_config
from diffute_tpu.serve.loading import load_diffusers_layout
from diffute_tpu.train.checkpoint import (
    diffusers_unet_config_json,
    diffusers_vae_config_json,
    export_diffusers_layout,
)
from diffute_tpu.utils import init_pipeline_params


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def params(cfg):
    return init_pipeline_params(cfg, seed=7)


def _tree_allclose(a, b):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_export_load_roundtrip(tmp_path, cfg, params):
    path = str(tmp_path / "ckpt")
    export_diffusers_layout(
        path, unet_params=params["unet"], vae_params=params["vae"],
        unet_config=diffusers_unet_config_json(cfg.unet),
        vae_config=diffusers_vae_config_json(cfg.vae))
    loaded = load_diffusers_layout(path, cfg)
    _tree_allclose(loaded["unet"], params["unet"])
    _tree_allclose(loaded["vae"], params["vae"])


def test_ema_preferred_over_live(tmp_path, cfg, params):
    import jax

    ema = jax.tree_util.tree_map(lambda x: x * 0 + 1.5, params["unet"])
    path = str(tmp_path / "ckpt_ema")
    export_diffusers_layout(path, unet_params=params["unet"],
                            unet_ema_params=ema)
    loaded = load_diffusers_layout(path, cfg)
    leaf = jax.tree_util.tree_leaves(loaded["unet"])[0]
    assert np.allclose(np.asarray(leaf), 1.5)


def test_partial_checkpoint_falls_back_to_init(tmp_path, cfg, params):
    path = str(tmp_path / "ckpt_partial")
    export_diffusers_layout(path, vae_params=params["vae"])
    loaded = load_diffusers_layout(path, cfg)
    # vae loaded, unet/trocr random-initialized with the right structure
    _tree_allclose(loaded["vae"], params["vae"])
    assert set(loaded.keys()) == {"vae", "unet", "trocr"}
