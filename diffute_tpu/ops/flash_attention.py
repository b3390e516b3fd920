"""Pallas TPU flash attention.

The TPU analogue of the reference's opt-in xformers memory-efficient
attention (reference train_diffute_v1.py:648-659): an online-softmax tiled
kernel that never materializes the (S, T) score matrix in HBM.

Shapes served (SD2-inpainting + TrOCR, SURVEY.md §5.7):
- UNet self-attention: S = T in {64, 256, 1024, 4096} (512^2 latents) and
  16384 (1024^2), head_dim 64
- UNet cross-attention: T = 577 TrOCR tokens (non-multiple-of-block —
  handled by padding + in-kernel masking)
- TrOCR ViT self-attention: S = T = 577, head_dim 64

Design: grid (batch*heads, q_blocks, kv_blocks) with the kv dimension
innermost; online-softmax state (m, l, acc) lives in VMEM scratch that
persists across the sequential kv iterations; logits/accumulation in fp32 on
the MXU regardless of input dtype.  Backward currently recomputes attention
with XLA ops via custom_vjp (exact, memory-heavier than a bwd kernel; fine
for the <=4096-token training shapes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale: float, kv_len: int, block_kv: int):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BKV, D)
    v = v_ref[0]  # (BKV, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (BQ, BKV)

    # mask out padded kv positions (cross-attn T=577 etc.)
    if kv_len % block_kv != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:]                      # (BQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                  # (BQ, BKV)
    l_new = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kv_idx == n_kv - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _flash_fwd_3d(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                  block_q: int, block_kv: int) -> jax.Array:
    """q (BH, S, D), k/v (BH, T, D) -> (BH, S, D)."""
    bh, s_len, d = q.shape
    kv_len = k.shape[1]
    block_q = min(block_q, _round_up(s_len, 128))
    if kv_len <= 1024:
        # short KV (e.g. 577-token TrOCR cross-attention): one kv block with
        # minimal 128-padding beats iterating half-empty 512 blocks
        block_kv = _round_up(kv_len, 128)
    else:
        block_kv = min(block_kv, _round_up(kv_len, 128))

    kv_pad = _round_up(kv_len, block_kv) - kv_len
    if kv_pad:
        k = jnp.pad(k, ((0, 0), (0, kv_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, kv_pad), (0, 0)))
    q_pad = _round_up(s_len, block_q) - s_len
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, q_pad), (0, 0)))

    grid = (bh, q.shape[1] // block_q, k.shape[1] // block_kv)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=kv_len,
                          block_kv=block_kv),
        # interpret on CPU so the same model flag works in tests/dev
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(q, k, v)
    if q_pad:
        out = out[:, :s_len]
    return out


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _reference_attention(q, k, v, scale):
    logits = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhst,bthd->bshd", weights, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_kv: int = 512,
) -> jax.Array:
    """Flash attention over (batch, seq, heads, head_dim) tensors."""
    return _flash_impl(q, k, v, scale, block_q, block_kv)


def _flash_impl(q, k, v, scale, block_q, block_kv):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, s, h, d = q.shape
    t = k.shape[1]
    q3 = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    k3 = k.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    v3 = v.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    o3 = _flash_fwd_3d(q3, k3, v3, scale, block_q, block_kv)
    return o3.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _flash_fwd_rule(q, k, v, scale, block_q, block_kv):
    return _flash_impl(q, k, v, scale, block_q, block_kv), (q, k, v)


def _flash_bwd_rule(scale, block_q, block_kv, res, g):
    # Exact backward by differentiating the reference formulation (XLA).
    q, k, v = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    _, vjp = jax.vjp(lambda q, k, v: _reference_attention(q, k, v, scale),
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
