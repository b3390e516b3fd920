"""Fused GroupNorm + SiLU + 3x3 Conv Pallas kernel (NHWC).

Roadmap item 1 / VERDICT r2 next-step 2: the UNet/VAE hot pattern is
``conv3x3(silu(groupnorm(x)))`` (every ResnetBlock2D half, reference models
SURVEY.md E1/E2; hot call train_diffute_v1.py:913).  The standalone fused
GroupNorm+SiLU kernel LOSES end-to-end because ``pallas_call`` is an XLA
fusion barrier (0.79 vs 1.29 img/s, BASELINE.md) — this kernel folds the
conv itself in, so the barrier sits where XLA could not fuse anyway:

  HBM traffic   XLA: read x (stats) + read x + write normalized + read
                normalized (conv) + write y
  fused         read x (stats) + read x + write y   — the normalized tensor
                never leaves VMEM.

The conv runs as 9 shifted (H*W, C) x (C, Cout) MXU matmuls against a
zero-padded normalized slab held in VMEM scratch.  Grid is
(batch, cout-tiles); GroupNorm statistics are recomputed per cout-tile
(cheap: one pass over the slab) so tiles stay independent.

Serving-oriented; a custom VJP routes gradients through the XLA reference
math so the flag is also safe under jax.grad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffute_tpu.ops.groupnorm import _group_maps, _xla_gn_silu

# VMEM budgets (bytes): padded normalized slab and one conv-weight tile.
_SLAB_LIMIT = 6 * 1024 * 1024
_WTILE_LIMIT = 4 * 1024 * 1024


def _kernel(x_ref, scale_ref, bias_ref, cg_ref, gc_ref, w_ref, b_ref, o_ref,
            pad_ref, *, groups: int, eps: float, rh: int):
    # x (1, H, W, C); w (9*C, CoT); b (1, CoT); o (1, H, W, CoT)
    # pad_ref scratch: (H+2, W+2, C) in the compute dtype
    H, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    n = H * W * (C // groups)
    n_chunks = H // rh

    # Pass 1: chunked sum/sumsq (full-slab fp32 would overflow VMEM at
    # 64x64x320 — same scheme as ops/groupnorm.py).
    def acc_body(i, carry):
        s1, s2 = carry
        xblk = x_ref[0, pl.ds(i * rh, rh), :, :].astype(jnp.float32)
        s1 = s1 + jnp.sum(xblk, axis=(0, 1))[None, :]
        s2 = s2 + jnp.sum(xblk * xblk, axis=(0, 1))[None, :]
        return s1, s2

    zeros = jnp.zeros((1, C), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, n_chunks, acc_body, (zeros, zeros))

    dotf = functools.partial(jax.lax.dot_general,
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    mean_g = dotf(s1, cg_ref[:]) / n              # (1, G)
    var_g = dotf(s2, cg_ref[:]) / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = dotf(mean_g, gc_ref[:])              # (1, C)
    inv_c = dotf(inv_g, gc_ref[:])
    a = scale_ref[:].astype(jnp.float32) * inv_c  # (1, C) affine fold
    d = bias_ref[:].astype(jnp.float32) - mean_c * a

    # Pass 2: normalize + SiLU into the zero-padded scratch slab.
    pad_ref[...] = jnp.zeros(pad_ref.shape, pad_ref.dtype)

    def norm_body(i, _):
        xblk = x_ref[0, pl.ds(i * rh, rh), :, :].astype(jnp.float32)
        y = xblk * a[0][None, None, :] + d[0][None, None, :]
        pad_ref[pl.ds(1 + i * rh, rh), pl.ds(1, W), :] = (
            y * jax.nn.sigmoid(y)).astype(pad_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)

    # 3x3 conv = 9 shifted matmuls on the MXU, accumulated per row chunk:
    # a full-slab (H*W, CoT) fp32 accumulator plus its tap temporaries
    # overflows the 16 MB scoped-vmem stack at 64x64x320 (measured 17.4 MB),
    # so output rows [i*rh, i*rh+rh) are produced from pad rows
    # [i*rh+dy, i*rh+rh+dy) and written as they complete.
    cot = o_ref.shape[3]
    bias = b_ref[0].astype(jnp.float32)[None, :]

    def conv_body(i, _):
        acc = jnp.zeros((rh * W, cot), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = pad_ref[pl.ds(i * rh + dy, rh),
                              pl.ds(dx, W), :].reshape(rh * W, C)
                wt = w_ref[pl.ds((dy * 3 + dx) * C, C), :]
                acc = acc + jax.lax.dot_general(
                    tap, wt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(i * rh, rh), :, :] = (
            (acc + bias).reshape(rh, W, cot).astype(o_ref.dtype))
        return 0

    jax.lax.fori_loop(0, n_chunks, conv_body, 0)


def _xla_ref(x, gn_scale, gn_bias, w, b, groups, eps):
    h = _xla_gn_silu(x, gn_scale, gn_bias, groups, eps)
    y = jax.lax.conv_general_dilated(
        h, w.astype(h.dtype), window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)[None, None, None, :]


def _cout_tile(c: int, cout: int, itemsize: int) -> int:
    if 9 * c * cout * itemsize <= _WTILE_LIMIT:
        return cout
    t = (_WTILE_LIMIT // (9 * c * itemsize)) // 128 * 128
    return int(t)


def gn_silu_conv3x3(
    x: jax.Array,          # (B, H, W, C)
    gn_scale: jax.Array,   # (C,)
    gn_bias: jax.Array,    # (C,)
    w: jax.Array,          # (3, 3, C, Cout) HWIO
    b: jax.Array,          # (Cout,)
    groups: int = 32,
    eps: float = 1e-5,
    use_pallas: bool = True,
) -> jax.Array:
    """conv3x3(silu(groupnorm(x))) with the normalized tensor kept in VMEM.

    Falls back to the XLA composition off-TPU or when a shape exceeds the
    VMEM budgets (pixel-resolution VAE slabs)."""
    bsz, h_, w_, c = x.shape
    cout = w.shape[-1]
    pad_bytes = (h_ + 2) * (w_ + 2) * c * x.dtype.itemsize
    cot = _cout_tile(c, cout, x.dtype.itemsize)
    if (not use_pallas or c % groups != 0 or pad_bytes > _SLAB_LIMIT
            or (cot < cout and (cot < 128 or cout % cot != 0))):
        return _xla_ref(x, gn_scale, gn_bias, w, b, groups, eps)
    return _pallas_gn_silu_conv(x, gn_scale, gn_bias, w, b, groups, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _pallas_gn_silu_conv(x, gn_scale, gn_bias, w, b, groups, eps):
    return _fwd_impl(x, gn_scale, gn_bias, w, b, groups, eps)


def _pallas_fwd(x, gn_scale, gn_bias, w, b, groups, eps):
    return (_fwd_impl(x, gn_scale, gn_bias, w, b, groups, eps),
            (x, gn_scale, gn_bias, w, b))


def _pallas_bwd(groups, eps, res, g):
    x, gn_scale, gn_bias, w, b = res
    _, vjp = jax.vjp(
        lambda *a: _xla_ref(*a, groups, eps), x, gn_scale, gn_bias, w, b)
    return vjp(g)


_pallas_gn_silu_conv.defvjp(_pallas_fwd, _pallas_bwd)


def _fwd_impl(x, gn_scale, gn_bias, w, b, groups, eps):
    bsz, h_, w_, c = x.shape
    cout = w.shape[-1]
    cot = _cout_tile(c, cout, x.dtype.itemsize)
    rh = h_
    for cand in (16, 8, 4, 2, 1):
        if h_ % cand == 0:
            rh = cand
            break
    cg, gc = _group_maps(c, groups)
    w2d = w.astype(x.dtype).reshape(9 * c, cout)

    return pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps, rh=rh),
        # interpret on CPU so the same model flag works in tests/dev
        interpret=jax.default_backend() == "cpu",
        grid=(bsz, cout // cot),
        in_specs=[
            pl.BlockSpec((1, h_, w_, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, cot), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cot), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_, w_, cot), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h_, w_, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((h_ + 2, w_ + 2, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, gn_scale[None, :], gn_bias[None, :], jnp.asarray(cg),
      jnp.asarray(gc), w2d, b[None, :])
