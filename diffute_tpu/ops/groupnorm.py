"""Fused GroupNorm + SiLU Pallas kernel (NHWC).

Every resnet block in the VAE/UNet runs GroupNorm(32) immediately followed by
SiLU (reference models, SURVEY.md E1/E2); fusing them saves one full HBM
round-trip of the activation tensor.  One grid step processes one batch
element with the whole (H*W, C) slab resident in VMEM — all UNet activation
shapes at 512^2..1024^2 fit (<= ~2.6 MB bf16); larger slabs (VAE at pixel
resolution) fall back to the XLA path automatically.

Group reductions are expressed as matmuls against a one-hot channel->group
membership matrix: per-channel sum/sumsq vectors (1, C) x (C, G) -> (1, G)
and back via (G, C).  Mosaic cannot shape-cast a C-lane vector into
(G, C/G) when C isn't lane-aligned (C=320/640 here), and the MXU does these
tiny contractions essentially for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max bytes of one (H*W, C) activation slab to keep in VMEM.
_VMEM_SLAB_LIMIT = 6 * 1024 * 1024


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, cg_ref, gc_ref, o_ref, *,
                    groups: int, eps: float, chunk: int):
    hw, c = x_ref.shape[1], x_ref.shape[2]
    n = hw * (c // groups)
    n_chunks = hw // chunk

    # Pass 1: chunked sum/sumsq so only a (chunk, C) fp32 tile is live at a
    # time (a whole-slab fp32 copy overflows the VMEM stack at 4096x320).
    def acc_body(i, carry):
        s1, s2 = carry
        xblk = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        s1 = s1 + jnp.sum(xblk, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(xblk * xblk, axis=0, keepdims=True)
        return s1, s2

    zeros = jnp.zeros((1, c), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, n_chunks, acc_body, (zeros, zeros))

    cg = cg_ref[:]                               # (C, G) one-hot
    gc = gc_ref[:]                               # (G, C) one-hot
    s1g = jax.lax.dot_general(s1, cg, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (1, G)
    s2g = jax.lax.dot_general(s2, cg, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    mean = s1g / n
    var = s2g / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)               # (1, G)
    mean_c = jax.lax.dot_general(mean, gc, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (1, C)
    inv_c = jax.lax.dot_general(inv, gc, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    scale = scale_ref[:].astype(jnp.float32) * inv_c          # (1, C)
    bias = bias_ref[:].astype(jnp.float32) - mean_c * scale

    # Pass 2: normalize + SiLU, chunk by chunk.
    def norm_body(i, _):
        xblk = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xblk * scale + bias
        o_ref[0, pl.ds(i * chunk, chunk), :] = (
            y * jax.nn.sigmoid(y)).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)


def _xla_gn_silu(x, scale, bias, groups, eps):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


@functools.lru_cache(maxsize=32)
def _group_maps(c: int, groups: int):
    cg = np.zeros((c, groups), np.float32)
    cg[np.arange(c), np.arange(c) // (c // groups)] = 1.0
    return cg, np.ascontiguousarray(cg.T)


def group_norm_silu(
    x: jax.Array,          # (B, H, W, C)
    scale: jax.Array,      # (C,)
    bias: jax.Array,       # (C,)
    groups: int = 32,
    eps: float = 1e-5,
    use_pallas: bool = True,
) -> jax.Array:
    b, h, w, c = x.shape
    slab_bytes = h * w * c * x.dtype.itemsize
    if (not use_pallas or c % groups != 0
            or slab_bytes > _VMEM_SLAB_LIMIT):
        return _xla_gn_silu(x, scale, bias, groups, eps)
    return _pallas_gn_silu(x, scale, bias, groups, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_gn_silu(x, scale, bias, groups, eps):
    """Pallas forward with an XLA-math backward so the fused kernel remains
    usable under jax.grad (training with use_fused_groupnorm on)."""
    return _pallas_gn_silu_fwd_impl(x, scale, bias, groups, eps)


def _pallas_gn_silu_fwd(x, scale, bias, groups, eps):
    return _pallas_gn_silu_fwd_impl(x, scale, bias, groups, eps), (x, scale, bias)


def _pallas_gn_silu_bwd(groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x, s, b: _xla_gn_silu(x, s, b, groups, eps),
                     x, scale, bias)
    return vjp(g)


def _pallas_gn_silu_fwd_impl(x, scale, bias, groups, eps):
    b, h, w, c = x.shape

    hw = h * w
    chunk = hw
    for cand in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if hw % cand == 0 and cand <= hw:
            chunk = cand
            break

    cg, gc = _group_maps(c, groups)
    x3 = x.reshape(b, hw, c)
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, groups=groups, eps=eps,
                          chunk=chunk),
        # interpret on CPU so the same model flag works in tests/dev
        interpret=jax.default_backend() == "cpu",
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x3, scale.reshape(1, c), bias.reshape(1, c),
      jnp.asarray(cg), jnp.asarray(gc))
    return out.reshape(b, h, w, c)


_pallas_gn_silu.defvjp(_pallas_gn_silu_fwd, _pallas_gn_silu_bwd)
