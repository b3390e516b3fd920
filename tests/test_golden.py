"""Golden regression tests: tiny-model outputs pinned to stored arrays.

PRNG impl is pinned to threefry explicitly: other tests (the CLI trainers)
switch the process-global default to rbg, which would otherwise make these
goldens order-dependent.

These catch silent topology/numerics drift across refactors (the tests that
matter most for a framework whose reference parity cannot be re-checked
against downloaded weights in this environment).  Goldens were generated on
CPU fp32 with `--regen-goldens` (pytest flag below).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffute_tpu.config import tiny_test_config
from diffute_tpu.models import AutoencoderKL, TrOCREncoder, UNet2DCondition

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _golden(name, compute, regen):
    path = os.path.join(GOLDEN_DIR, name + ".npy")
    value = np.asarray(compute())
    if regen or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, value)
        if regen:
            pytest.skip(f"regenerated {path}")
    golden = np.load(path)
    np.testing.assert_allclose(value, golden, atol=5e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def regen(request):
    return bool(os.environ.get("REGEN_GOLDENS"))


def test_unet_golden(regen):
    cfg = tiny_test_config().unet

    def compute():
        model = UNet2DCondition(cfg)
        x = jnp.linspace(-1, 1, 1 * 8 * 8 * 9).reshape(1, 8, 8, 9)
        ctx = jnp.linspace(-1, 1, 1 * 5 * cfg.cross_attention_dim).reshape(
            1, 5, cfg.cross_attention_dim)
        params = model.init(jax.random.key(42, impl="threefry2x32"), x, jnp.array(0), ctx)
        with jax.default_matmul_precision("highest"):
            return model.apply(params, x, jnp.array(100), ctx)

    _golden("unet_tiny", compute, regen)


def test_vae_golden(regen):
    cfg = tiny_test_config().vae

    def compute():
        model = AutoencoderKL(cfg)
        x = jnp.linspace(-1, 1, 1 * 32 * 32 * 3).reshape(1, 32, 32, 3)
        params = model.init(jax.random.key(42, impl="threefry2x32"), x, jax.random.key(1, impl="threefry2x32"))
        with jax.default_matmul_precision("highest"):
            mean, logvar = model.apply(params, x, method=AutoencoderKL.encode)
            dec = model.apply(params, mean, method=AutoencoderKL.decode)
        return jnp.concatenate([mean.ravel(), logvar.ravel(), dec.ravel()])

    _golden("vae_tiny", compute, regen)


def test_trocr_golden(regen):
    cfg = tiny_test_config().trocr

    def compute():
        model = TrOCREncoder(cfg)
        x = jnp.linspace(-1, 1, 1 * 32 * 32 * 3).reshape(1, 32, 32, 3)
        params = model.init(jax.random.key(42, impl="threefry2x32"), x)
        with jax.default_matmul_precision("highest"):
            return model.apply(params, x)

    _golden("trocr_tiny", compute, regen)
