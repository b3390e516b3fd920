"""Fused GN+SiLU+conv3x3 kernel (ops/conv_fused.py) parity tests.

On CPU the kernel runs in Pallas interpret mode, so these pin the kernel
MATH (stats chunking, padded-slab taps, cout tiling) against the XLA
composition; on-chip perf is recorded in BASELINE.md."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffute_tpu.ops.conv_fused import _fwd_impl, _xla_ref, gn_silu_conv3x3


def _case(b, h, w, c, cout, groups, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    s = jnp.asarray(rng.normal(1.0, 0.1, size=(c,)).astype(np.float32))
    bi = jnp.asarray(rng.normal(0.0, 0.1, size=(c,)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, c, cout)) / np.sqrt(9 * c))
                     .astype(np.float32))
    cb = jnp.asarray(rng.normal(0.0, 0.1, size=(cout,)).astype(np.float32))
    return x, s, bi, wk, cb


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 8, 16, 4),     # expanding
    (1, 8, 8, 16, 8, 4),     # contracting
    (1, 4, 4, 8, 8, 8),      # groups == channels/1
])
def test_fused_kernel_matches_xla(shape):
    b, h, w, c, cout, groups = shape
    x, s, bi, wk, cb = _case(b, h, w, c, cout, groups)
    ref = _xla_ref(x, s, bi, wk, cb, groups, 1e-5)
    out = _fwd_impl(x, s, bi, wk, cb, groups, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_kernel_cout_tiling():
    # force cout tiling by shrinking the weight-tile budget
    import diffute_tpu.ops.conv_fused as cf

    b, h, w, c, cout, groups = 1, 4, 4, 8, 256, 4
    x, s, bi, wk, cb = _case(b, h, w, c, cout, groups)
    ref = _xla_ref(x, s, bi, wk, cb, groups, 1e-5)
    old = cf._WTILE_LIMIT
    try:
        cf._WTILE_LIMIT = 9 * c * 128 * 4  # exactly one 128-wide tile
        assert cf._cout_tile(c, cout, 4) == 128
        out = cf._fwd_impl(x, s, bi, wk, cb, groups, 1e-5)
    finally:
        cf._WTILE_LIMIT = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_conv_grad_via_xla_vjp():
    b, h, w, c, cout, groups = 1, 4, 4, 8, 8, 4
    x, s, bi, wk, cb = _case(b, h, w, c, cout, groups)

    def loss_fused(x, wk):
        return jnp.sum(gn_silu_conv3x3(x, s, bi, wk, cb, groups) ** 2)

    def loss_ref(x, wk):
        return jnp.sum(_xla_ref(x, s, bi, wk, cb, groups, 1e-5) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, wk)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4)


def test_unet_with_fused_conv_matches_baseline():
    """Same params, same inputs: fused-conv UNet == plain UNet (interpret
    mode on CPU) within kernel tolerance."""
    from diffute_tpu.config import tiny_test_config
    from diffute_tpu.models import UNet2DCondition
    from diffute_tpu.utils.params import init_unet_params

    cfg = tiny_test_config()
    params = init_unet_params(cfg, jax.random.PRNGKey(0))
    lat = cfg.edit.resolution // cfg.vae.scale_factor
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, lat, lat, cfg.unet.in_channels))
    t = jnp.array([7], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, cfg.trocr.seq_len,
                             cfg.unet.cross_attention_dim))

    ref = UNet2DCondition(cfg.unet).apply({"params": params}, x, t, ctx)
    fcfg = dataclasses.replace(cfg.unet, use_fused_conv=True)
    # param tree is structurally identical — no conversion needed
    out = UNet2DCondition(fcfg).apply({"params": params}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)
