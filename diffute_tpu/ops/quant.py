"""Int8 weight-only quantization for serving (roadmap item 2).

TPU analogue of the reference's opt-in 8-bit memory levers
(train_diffute_v1.py:244-248 bnb AdamW8bit, :648-659 xformers): UNet
transformer weights are stored int8 with per-output-channel scales and
consumed by a Pallas matmul that reads int8 from HBM and dequantizes
in-register — halving the weight bytes the denoise loop streams per step.
Convolutions stay in the compute dtype (XLA's conv cannot consume a fused
dequant; a separate dequant materializes a full-precision copy and loses the
bandwidth win).

Per-channel symmetric round-to-nearest quantization (weights are static —
stochastic rounding is for gradients/training):  w[:, n] ~ q[:, n] * s[n],
s[n] = max|w[:, n]| / 127.

``quant_matmul`` computes y = (x @ q) * s without ever materializing the
dequantized matrix: the scale is per-output-column, so it commutes with the
contraction.  Inference-only: no custom VJP is defined (the serving pipeline
never differentiates through it).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_per_channel(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(K, N) float -> ((K, N) int8, (N,) float32 scale), symmetric
    round-to-nearest per output channel."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale[None, :]


def _xla_matmul_w8(x2d: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    acc = jnp.dot(x2d, q.astype(x2d.dtype),
                  preferred_element_type=jnp.float32)
    return acc * scale[None, :].astype(jnp.float32)


def _w8_kernel(x_ref, q_ref, s_ref, o_ref):
    # x (bm, K) compute-dtype, q (K, bn) int8, s (1, bn) f32 -> o (bm, bn)
    acc = jnp.dot(x_ref[:], q_ref[:].astype(x_ref.dtype),
                  preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def _pallas_matmul_w8(x2d, q, scale, block_m: int = 256, block_n: int = 256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x2d.shape
    _, n = q.shape
    cdiv = lambda a, b: -(-a // b)
    bm, bn = min(block_m, m), min(block_n, n)
    grid = (cdiv(m, bm), cdiv(n, bn))
    out = pl.pallas_call(
        _w8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x2d.dtype),
    )(x2d, q, scale[None, :].astype(jnp.float32))
    return out


def quantize_blockwise(x: jax.Array, block: int = 256
                       ) -> Tuple[jax.Array, jax.Array]:
    """Any-shape float -> ((nb, block) int8, (nb,) f32 absmax scales).

    Flattens, zero-pads to a block multiple, symmetric RTN per block — the
    storage scheme of bnb's 8-bit optimizer states (reference opt-in
    train_diffute_v1.py:244-248)."""
    flat = jnp.ravel(x).astype(jnp.float32)
    n = flat.shape[0]
    nb = -(-n // block)
    flat = jnp.pad(flat, (0, nb * block - n)).reshape(nb, block)
    amax = jnp.max(jnp.abs(flat), axis=1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(flat / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_blockwise(q: jax.Array, scale: jax.Array,
                         shape: Tuple[int, ...]) -> jax.Array:
    """Inverse of :func:`quantize_blockwise` back to ``shape`` (f32)."""
    numel = 1
    for d in shape:
        numel *= d
    flat = (q.astype(jnp.float32) * scale[:, None]).reshape(-1)[:numel]
    return flat.reshape(shape)


def convert_dense_params_to_int8(params, target):
    """Rewrite a float param tree into the structure of a ``use_int8`` model.

    ``target`` is the quantized model's param STRUCTURE (e.g. from
    ``jax.eval_shape(model.init, ...)``): wherever it carries a
    ``kernel_q``/``kernel_scale`` pair, the float tree's ``kernel`` at the
    same path is per-channel quantized; every other leaf passes through.
    This keeps checkpoints float (HF-layout compatible) and quantizes once
    at load."""
    if isinstance(target, dict):
        if "kernel_q" in target:
            q, s = quantize_per_channel(params["kernel"])
            out = {"kernel_q": q, "kernel_scale": s}
            if "bias" in target:
                out["bias"] = jnp.asarray(params["bias"], jnp.float32)
            return out
        return {k: convert_dense_params_to_int8(params[k], v)
                for k, v in target.items()}
    return params


def quant_matmul(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x (..., K) @ dequant(q (K, N), scale (N,)) -> (..., N).

    Routes to the Pallas int8-read kernel on TPU backends; elsewhere (CPU
    tests, parity runs) an XLA reference path computes the identical
    contraction (y = (x @ q) * s, exact in f32 accumulation).
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = q.shape[-1]
    x2d = x.reshape(-1, k)
    # int8 VMEM tiles are (32, 128): require lane/sublane-friendly K and N
    # for the kernel; odd shapes (none in SD topologies) fall back to XLA
    use_pallas = (jax.default_backend() not in ("cpu",)
                  and k % 32 == 0 and n % 128 == 0)
    if use_pallas:
        y = _pallas_matmul_w8(x2d, q, scale)
    else:
        y = _xla_matmul_w8(x2d, q, scale)
    return y.astype(x.dtype).reshape(*lead, n)
