"""Compact uint8 training batches: datasets ship raw uint8, train steps
normalize on device (utils.images.device_to_unit_range) — 4x fewer
host->device bytes / staged-input HBM than f32 with bit-identical numerics.

The f32-batch back-compat path must stay equivalent.  XLA compiles the
in-step ``(x/255 - 0.5)/0.5`` to a fused multiply-add, so device-normalized
inputs can differ from host-numpy-normalized ones by 1 ulp — step outputs
must agree to float32 round-off, not bit-for-bit.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffute_tpu.config import tiny_test_config
from diffute_tpu.io import SyntheticSceneDataset, make_unet_batch, make_vae_batch
from diffute_tpu.train import UNetTrainer, VAETrainer
from diffute_tpu.utils import init_pipeline_params
from diffute_tpu.utils.images import device_to_unit_range, image_to_tensor


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def params(cfg):
    return init_pipeline_params(cfg)


def test_datasets_yield_uint8(cfg):
    ds = SyntheticSceneDataset(cfg, seed=0)
    ex = ds[0]
    assert ex["pixel_values"].dtype == np.uint8
    assert ex["masks"].dtype == np.uint8
    assert ex["masked_images"].dtype == np.uint8
    assert set(np.unique(ex["masks"])) <= {0, 1}
    batch = make_unet_batch([ds[i] for i in range(2)], cfg)
    assert batch["pixel_values"].dtype == np.uint8
    assert batch["glyph_pixels"].dtype == np.uint8
    assert make_vae_batch([ex])["pixel_values"].dtype == np.uint8


def test_device_to_unit_range_matches_host_normalize():
    u8 = np.arange(256, dtype=np.uint8).reshape(16, 16)
    host = image_to_tensor(u8)
    dev = np.asarray(device_to_unit_range(jnp.asarray(u8), jnp.float32))
    np.testing.assert_allclose(host, dev, atol=2e-7, rtol=0)
    # float input passes through untouched (back-compat)
    f = np.linspace(-1, 1, 7, dtype=np.float32)
    np.testing.assert_array_equal(
        np.asarray(device_to_unit_range(jnp.asarray(f), jnp.float32)), f)
    # bf16: normalize in f32 FIRST, cast after — matches the old
    # host-f32-then-cast path (1-ulp f32 drift vanishes under the bf16 cast
    # except exactly at rounding boundaries; bound it by one bf16 ulp)
    bf = np.asarray(device_to_unit_range(jnp.asarray(u8), jnp.bfloat16),
                    np.float32)
    ref = host.astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_allclose(bf, ref, atol=1 / 128, rtol=0)


def _f32_variant(batch):
    out = dict(batch)
    for k in ("pixel_values", "masked_images"):
        out[k] = image_to_tensor(batch[k])
    out["masks"] = batch["masks"].astype(np.float32)
    return out


def test_unet_step_u8_equals_f32(cfg, params):
    ds = SyntheticSceneDataset(cfg, seed=0)
    batch = make_unet_batch([ds[i] for i in range(8)], cfg)

    def one_step(b):
        trainer = UNetTrainer(cfg, params["unet"],
                              {"vae": params["vae"], "trocr": params["trocr"]},
                              total_steps=4)
        m = trainer.step(b, jax.random.PRNGKey(0))
        leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
        return float(m["loss"]), float(m["grad_norm"]), np.asarray(leaf)

    loss_u8, gn_u8, p_u8 = one_step(batch)
    loss_f32, gn_f32, p_f32 = one_step(_f32_variant(batch))
    np.testing.assert_allclose(loss_u8, loss_f32, rtol=1e-5)
    np.testing.assert_allclose(gn_u8, gn_f32, rtol=1e-4)
    np.testing.assert_allclose(p_u8, p_f32, atol=1e-4, rtol=1e-4)


def test_vae_step_u8_equals_f32(cfg, params):
    ds = SyntheticSceneDataset(cfg, seed=0)
    batch = make_vae_batch([ds[i] for i in range(8)])

    def one_step(b):
        trainer = VAETrainer(cfg, params["vae"], total_steps=4)
        m = trainer.step(b, jax.random.PRNGKey(0))
        leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
        return float(m["loss"]), np.asarray(leaf)

    loss_u8, p_u8 = one_step(batch)
    loss_f32, p_f32 = one_step(
        {"pixel_values": image_to_tensor(batch["pixel_values"])})
    np.testing.assert_allclose(loss_u8, loss_f32, rtol=1e-5)
    np.testing.assert_allclose(p_u8, p_f32, atol=1e-4, rtol=1e-4)
