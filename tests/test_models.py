"""Model topology tests: shapes on tiny configs, parameter counts on the
full SD2-inpainting / TrOCR-large configs (via eval_shape, no compute).

Full-size parameter counts are pinned to the known sizes of the HF models the
reference loads (train_diffute_v1.py:628-635): SD2-inpaint UNet ~866M, SD2
VAE ~83.7M, TrOCR-large (ViT-large) encoder ~303M — catching any topology
drift from the reference architecture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffute_tpu.config import (
    TrOCRConfig,
    UNetConfig,
    VAEConfig,
    tiny_test_config,
)
from diffute_tpu.models import AutoencoderKL, TrOCREncoder, UNet2DCondition
from diffute_tpu.models.unet import count_params
from diffute_tpu.models.vae import sample_latent


@pytest.fixture(scope="module")
def tiny():
    return tiny_test_config()


def test_vae_roundtrip_shapes(tiny):
    model = AutoencoderKL(tiny.vae)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    mean, logvar = model.apply(params, x, method=model.encode)
    f = tiny.vae.scale_factor
    assert mean.shape == (2, 32 // f, 32 // f, 4)
    assert logvar.shape == mean.shape
    z = sample_latent(mean, logvar, jax.random.PRNGKey(2))
    out = model.apply(params, z, method=model.decode)
    assert out.shape == x.shape
    recon = model.apply(params, x, jax.random.PRNGKey(3))
    assert recon.shape == x.shape
    assert np.isfinite(np.asarray(recon)).all()


def test_unet_shapes(tiny):
    model = UNet2DCondition(tiny.unet)
    x = jnp.zeros((2, 8, 8, 9))
    ctx = jnp.zeros((2, 7, tiny.unet.cross_attention_dim))
    t = jnp.array([5, 100])
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out = model.apply(params, x, t, ctx)
    assert out.shape == (2, 8, 8, 4)
    # scalar timestep broadcast
    out2 = model.apply(params, x, jnp.array(7), ctx)
    assert out2.shape == (2, 8, 8, 4)


def test_unet_odd_spatial(tiny):
    # 10x10 -> down to 5x5 -> up must restore 10x10 via skip alignment.
    model = UNet2DCondition(tiny.unet)
    x = jnp.zeros((1, 16, 16, 9))
    ctx = jnp.zeros((1, 7, tiny.unet.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array(0), ctx)
    out = model.apply(params, x, jnp.array(0), ctx)
    assert out.shape == (1, 16, 16, 4)


def test_trocr_shapes(tiny):
    model = TrOCREncoder(tiny.trocr)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, tiny.trocr.seq_len, tiny.trocr.hidden_size)


def _param_count(model, *args):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(shapes))


def test_full_unet_param_count():
    model = UNet2DCondition(UNetConfig())
    n = _param_count(
        model,
        jnp.zeros((1, 64, 64, 9)),
        jnp.array([0]),
        jnp.zeros((1, 577, 1024)),
    )
    # SD2-inpainting UNet: the 4-channel SD2 text2img UNet has 865,910,724
    # params; the 9-channel inpaint conv_in adds 3*3*5*320 = 14,400.
    assert n == 865_925_124, n


def test_full_vae_param_count():
    model = AutoencoderKL(VAEConfig())
    def init(key, x, rng):
        return model.init(key, x, rng)
    shapes = jax.eval_shape(init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1))
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(shapes))
    # SD AutoencoderKL: 83,653,863 parameters.
    assert n == 83_653_863, n


def test_full_trocr_param_count():
    model = TrOCREncoder(TrOCRConfig())
    n = _param_count(model, jnp.zeros((1, 384, 384, 3)))
    # ViT-large 24-layer encoder (trocr-large encoder): 303,301,632 params
    # REVISIT: pinned after cross-check against HF in test_trocr_parity.
    assert 300e6 < n < 310e6, n


def test_count_params_helper(tiny):
    model = UNet2DCondition(tiny.unet)
    x = jnp.zeros((1, 8, 8, 9))
    ctx = jnp.zeros((1, 7, tiny.unet.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array(0), ctx)
    assert count_params(params) > 0
