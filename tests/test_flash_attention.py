"""Pallas flash-attention parity vs naive XLA attention (interpret mode on
CPU; the same kernel compiles natively on TPU).

Covers the shapes the models produce: UNet self-attn 64..4096 tokens,
cross-attn KV=577 (non-multiple-of-block), ViT 577, head_dim 64.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from diffute_tpu.ops.attention import _xla_attention
from diffute_tpu.ops import flash_attention as fa


def _run_flash(q, k, v, scale=None, block_q=256, block_kv=512):
    with pltpu.force_tpu_interpret_mode():
        return fa.flash_attention(q, k, v, scale, block_q, block_kv)


@pytest.mark.parametrize("s,t", [(64, 64), (256, 256), (1024, 1024)])
def test_self_attention_parity(s, t):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, s, 2, 64))
    k = jax.random.normal(kk, (1, t, 2, 64))
    v = jax.random.normal(kv, (1, t, 2, 64))
    ref = _xla_attention(q, k, v, 64**-0.5)
    out = _run_flash(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_cross_attention_kv577():
    # TrOCR conditioning length: 577 tokens, not a multiple of any block
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 128, 2, 64))
    k = jax.random.normal(kk, (2, 577, 2, 64))
    v = jax.random.normal(kv, (2, 577, 2, 64))
    ref = _xla_attention(q, k, v, 64**-0.5)
    out = _run_flash(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_q_not_multiple_of_block():
    # 577 queries (ViT self-attention)
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 577, 2, 32))
    k = jax.random.normal(kk, (1, 577, 2, 32))
    v = jax.random.normal(kv, (1, 577, 2, 32))
    ref = _xla_attention(q, k, v, 32**-0.5)
    out = _run_flash(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_bfloat16():
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 256, 4, 64), jnp.bfloat16)
    k = jax.random.normal(kk, (1, 256, 4, 64), jnp.bfloat16)
    v = jax.random.normal(kv, (1, 256, 4, 64), jnp.bfloat16)
    ref = _xla_attention(q, k, v, 64**-0.5)
    out = _run_flash(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2)


def test_custom_scale():
    key = jax.random.PRNGKey(4)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 128, 1, 64))
    k = jax.random.normal(kk, (1, 128, 1, 64))
    v = jax.random.normal(kv, (1, 128, 1, 64))
    ref = _xla_attention(q, k, v, 0.05)
    out = _run_flash(q, k, v, scale=0.05)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("s,t,d", [
    (64, 64, 32),      # tiny
    (256, 256, 64),    # multi-block q and kv
    (128, 577, 64),    # cross-attn: padded KV gradients
    (577, 577, 32),    # padded Q gradients (ViT)
])
def test_gradients_match_reference(s, t, d):
    key = jax.random.PRNGKey(5)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, s, 2, d))
    k = jax.random.normal(kk, (1, t, 2, d))
    v = jax.random.normal(kv, (1, t, 2, d))

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fa.flash_attention(q, k, v, None, 128, 128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, d**-0.5) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_gradients_bfloat16():
    key = jax.random.PRNGKey(6)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 128, 2, 64), jnp.bfloat16)
    k = jax.random.normal(kk, (1, 128, 2, 64), jnp.bfloat16)
    v = jax.random.normal(kv, (1, 128, 2, 64), jnp.bfloat16)

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fa.flash_attention(q, k, v).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, 64**-0.5).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.35, rtol=0.1)


# ---------------------------------------------------------------------------
# Deferred-softmax (pipelined) forward: kv_len % block_kv == 0, >= 2 blocks
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("s,t", [(256, 2048), (512, 2048)])
def test_pipelined_long_kv_parity(s, t):
    # multi-block unpadded KV dispatches to _fwd_kernel_pipelined (base-2
    # softmax, double-buffered score tiles)
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, s, 1, 64))
    k = jax.random.normal(kk, (1, t, 1, 64))
    v = jax.random.normal(kv, (1, t, 1, 64))
    ref = _xla_attention(q, k, v, 64**-0.5)
    out = _run_flash(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_pipelined_bfloat16():
    key = jax.random.PRNGKey(4)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 256, 1, 64), jnp.bfloat16)
    k = jax.random.normal(kk, (1, 2048, 1, 64), jnp.bfloat16)
    v = jax.random.normal(kv, (1, 2048, 1, 64), jnp.bfloat16)
    ref = _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), 64**-0.5)
    out = _run_flash(q, k, v)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=3e-2, rtol=3e-2)


def test_pipelined_gradients_match_reference():
    # the backward kernels consume the pipelined forward's LSE — this pins
    # the base-2 -> natural-log conversion
    key = jax.random.PRNGKey(5)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 256, 1, 64))
    k = jax.random.normal(kk, (1, 2048, 1, 64))
    v = jax.random.normal(kv, (1, 2048, 1, 64))

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            out = fa.flash_attention(q, k, v, None, 256, 512)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = _xla_attention(q, k, v, 64**-0.5)
        return jnp.sum(out * jnp.cos(out))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-5, rtol=1e-3)


def test_f32_vmem_cap_on_blocks():
    # f32 tiles at (1024, 2048) measured 16.42M scoped vmem under jit
    # fusion on the v5e (OOM at the 16M limit); _pick_blocks caps the
    # score tile for f32 while bf16 keeps the swept-fast (1024, 2048)
    bq, bkv = fa._pick_blocks(16384, 16384, 1024, 2048, dtype=jnp.float32)
    assert (bq, bkv) == (1024, 1024)
    bq, bkv = fa._pick_blocks(16384, 16384, 1024, 2048, dtype=jnp.bfloat16)
    assert (bq, bkv) == (1024, 2048)
    # short-KV rounding unaffected (block_q clamps to the 128 queries)
    assert fa._pick_blocks(128, 577, 256, 512,
                           dtype=jnp.float32) == (128, 640)
