"""Pallas TPU flash attention (forward + backward kernels).

The TPU analogue of the reference's opt-in xformers memory-efficient
attention (reference train_diffute_v1.py:648-659): an online-softmax tiled
kernel that never materializes the (S, T) score matrix in HBM.

Shapes served (SD2-inpainting + TrOCR, SURVEY.md §5.7):
- UNet self-attention: S = T in {64, 256, 1024, 4096} (512^2 latents) and
  16384 (1024^2), head_dim 64
- UNet cross-attention: T = 577 TrOCR tokens (non-multiple-of-block —
  handled by padding + in-kernel masking)
- TrOCR ViT self-attention: S = T = 577, head_dim 64

Forward: grid (batch*heads, q_blocks, kv_blocks) with the kv dimension
innermost; online-softmax state (m, l, acc) lives in VMEM scratch that
persists across the sequential kv iterations; logits/accumulation in fp32 on
the MXU regardless of input dtype.  The per-row log-sum-exp is emitted for
the backward.

Backward: the standard flash backward as two kernels over the saved LSE —
dq accumulates across kv-innermost grid steps, dk/dv across q-innermost
steps, with ``delta = rowsum(dO * O)`` precomputed in XLA.  No (S, T)
matrix ever reaches HBM in either direction.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Route unpadded multi-block-KV forwards through the deferred-softmax
# pipelined kernel (docs/attention_roofline.md).  Module-level so benchmarks
# can A/B the two kernels on the same day/chip.  Measured (attn_r5_ab.json):
# the 2x score-tile scratch starves VMEM at the winning (1024, 1024) blocks
# (67.7 vs 77.3 TF/s) and only helps at (512, 512) tiles — OFF by default.
PIPELINE_FWD = False

# Run the standard kernel's softmax in base 2 with softmax_scale*log2(e)
# pre-folded into q: one fewer VPU pass over the score tile
# (docs/attention_roofline.md optimization 2).  Applied to non-f32 inputs
# only: the prescale's extra operand rounding measurably doubles f32 error
# vs XLA on chip (2.4e-3 -> 5e-3) while bf16 stays within matmul noise.
LOG2_SOFTMAX = True


def _interpret() -> bool:
    # interpret on CPU so the same model flag works in tests/dev
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Default forward/backward block sizes by query length, measured with
# benchmarks/attn_bench.py on the v5e (BASELINE.md kernel table); callers
# can always override explicitly.  At long T the forward re-streams K/V once
# per q-block (HBM traffic ~ n_q*T*D bytes), so a larger block_q wins until
# the f32 (block_q, block_kv) score tile pressures VMEM.
_TUNED_BLOCKS = (
    # (min_query_tokens, block_q, block_kv) — ascending by min_query_tokens.
    # Round-3 RTT-cancelled sweep (time_op scan differencing with adaptive
    # ~1s chains; end-to-end call timing is relay noise at these kernel
    # sizes).  The old (256, 512) default left 2x+ on the table: measured
    # best 4096 tokens 0.30-0.31 ms = 71 TF/s (old 0.61 ms, XLA 2.4 ms);
    # 9216 (1024, 1024) 1.50 ms = 72 TF/s; 16384 (1024, 1024) 4.66 ms =
    # 74 TF/s (old 9.8 ms, XLA 21 ms).  block_q 2048 was 2% faster at
    # 4096 tokens but its ~17 MB tile footprint overflows the 16 MB
    # scoped-vmem stack at batch >= 2 (measured at compile); (1024, 1024)
    # holds the same plateau with half the footprint.
    (0, 256, 512),
    (4096, 1024, 1024),
    # round-5 log2-softmax sweep (benchmarks/records/attn_r5_{log2,9216}
    # .json, same-day A/B, long RTT-cancelling chains): (1024, 2048) wins
    # 16384 tokens at 3.50 ms = 98.1 TF/s (vs the round-3/4 74 TF/s
    # plateau at (1024, 1024) — docs/attention_roofline.md) and 9216
    # tokens at 91.2 TF/s (even with the padded+masked 10240 tail; 86.1
    # at (1024, 1024)), while 4096 prefers (1024, 1024) (83.1 vs 78.5).
    # (2048, x) rows were 2-6% faster still but block_q 2048's ~17 MB
    # tile footprint overflowed scoped vmem at batch >= 2 in round 3;
    # not worth the risk.
    (9216, 1024, 2048),
)

# The backward kernels keep more operands resident per tile (q, k, v, o,
# do, lse, two accumulators), so the forward winners overflow the 16 MB
# scoped-vmem stack — (2048, 1024) at 4096 tokens was measured 19.8 MB at
# compile.  Round-5 sweep with the base-2 softmax
# (benchmarks/records/attn_r5_bwd_blocks.json, same-day, long chains):
# grad 4096 tokens 0.694 -> 0.382 ms at (512, 512) (1.8x) and 16384
# 11.97 -> 8.93 ms at (1024, 512) (1.3x); validated inside the full-size
# 866M training step (train_bench).
_TUNED_BLOCKS_BWD = (
    (0, 256, 512),
    (4096, 512, 512),
    (16384, 1024, 512),
)


def _resolve_blocks(s_len: int, block_q, block_kv, table=_TUNED_BLOCKS):
    """Fill None block sizes from the tuned table (largest matching row)."""
    if block_q is None or block_kv is None:
        for min_t, bq, bkv in reversed(table):
            if s_len >= min_t:
                block_q = bq if block_q is None else block_q
                block_kv = bkv if block_kv is None else block_kv
                break
    return block_q, block_kv


def _pick_blocks(s_len: int, kv_len: int, block_q: int, block_kv: int,
                 dtype=None):
    block_q = min(block_q, _round_up(s_len, 128))
    if kv_len <= 1024:
        # short KV (e.g. 577-token TrOCR cross-attention): one kv block with
        # minimal 128-padding beats iterating half-empty 512 blocks
        block_kv = _round_up(kv_len, 128)
    else:
        block_kv = min(block_kv, _round_up(kv_len, 128))
    if dtype == jnp.float32:
        # f32 operand tiles double the VMEM footprint: (1024, 2048) measured
        # 16.42M scoped vmem under jit fusion (OOM at the 16M limit) where
        # the bf16 sweep fit.  Cap the score tile at 1024x1024 for f32.
        while block_q * block_kv > 1024 * 1024 and block_kv > 512:
            block_kv //= 2
    return block_q, block_kv


def _pad_seq(x: jax.Array, block: int) -> jax.Array:
    pad = _round_up(x.shape[1], block) - x.shape[1]
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

_LOG2E = 1.4426950408889634  # log2(e)
_LN2 = 0.6931471805599453    # 1 / log2(e)


def _fwd_kernel_pipelined(q_ref, k_ref, v_ref, o_ref, lse_ref,
                          m_scr, l_scr, acc_scr, s0_scr, s1_scr):
    """Deferred-softmax forward: tile j's QK^T (MXU) is issued in the same
    body that runs the softmax update of tile j-1 (VPU), with NO data
    dependence between them — the score tiles double-buffer through VMEM
    scratch (s0/s1 by kv parity) so Mosaic can overlap the units.

    Motivation (docs/attention_roofline.md): at head_dim 64 the kernel is
    VPU-bound — per score element the matmuls cost 4*D=256 MXU FLOPs but the
    softmax costs ~5 VPU ops, and MXU:VPU throughput is ~50:1 — so the
    serial body pays t_mxu + t_vpu per tile (measured 3.6 us at
    (1024,1024)), capping the plateau at ~74 TF/s.  Overlap targets
    max(t_mxu, t_vpu).

    Softmax runs in base 2: the caller pre-scales q by softmax_scale*log2(e)
    (one XLA-fused multiply), replacing exp(s*scale - m) with exp2(s2 - m2)
    — one fewer VPU pass over the (BQ, BKV) tile, and exp2 is the native
    transcendental.  The emitted LSE is converted back to natural log for
    the (unchanged) backward kernels.

    Grid is (bh, n_q, n_kv + 1): step j produces tile j (j < n_kv) and
    consumes tile j-1 (j > 0).  kv_len must be a multiple of block_kv (the
    dispatcher guarantees it)."""
    j = pl.program_id(2)
    n_kv = pl.num_programs(2) - 1

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # ---- produce: score tile j -> scratch buffer (j % 2)  [MXU]
    @pl.when(j < n_kv)
    def _():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (BQ, BKV), log2 units

        @pl.when(j % 2 == 0)
        def _():
            s0_scr[:] = s

        @pl.when(j % 2 == 1)
        def _():
            s1_scr[:] = s

    # ---- consume: softmax update of tile j-1  [VPU + one MXU matmul]
    def consume(s_prev):
        m_prev = m_scr[:]                       # (BQ, 1), log2 units
        m_cur = jnp.max(s_prev, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s_prev - m_new)            # (BQ, BKV)
        l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new

    @pl.when((j > 0) & (j % 2 == 1))
    def _():
        consume(s0_scr[:])

    @pl.when((j > 0) & (j % 2 == 0))
    def _():
        consume(s1_scr[:])

    @pl.when(j == n_kv)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)
        # natural-log LSE (the backward kernels expect p = exp(s*scale - lse))
        lse_ref[0] = (m_scr[:] + jnp.log2(l_scr[:])) * _LN2


def _flash_fwd_3d_pipelined(q, k, v, scale, block_q, block_kv):
    """Dispatch target for kv_len % block_kv == 0 with >= 2 kv blocks.
    q/k/v already padded; q PRE-SCALED by scale*log2(e) happens here."""
    bh, s_len, d = q.shape
    kv_len = k.shape[1]
    n_q, n_kv = s_len // block_q, kv_len // block_kv
    # fold softmax scale + the base-2 conversion into q (one fused multiply
    # in XLA; bf16 inputs take one extra rounding, within matmul noise)
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    grid = (bh, n_q, n_kv + 1)
    last_kv = n_kv - 1
    out, lse = pl.pallas_call(
        _fwd_kernel_pipelined,
        interpret=_interpret(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # produce reads k[j] (clamped on the final, produce-free step)
            pl.BlockSpec((1, block_kv, d),
                         lambda b, i, j: (b, jnp.minimum(j, last_kv), 0),
                         memory_space=pltpu.VMEM),
            # consume reads v[j-1] (clamped on the consume-free first step)
            pl.BlockSpec((1, block_kv, d),
                         lambda b, i, j: (b, jnp.maximum(j - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((bh, q.shape[1], 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, block_kv), jnp.float32),
            pltpu.VMEM((block_q, block_kv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q, k, v)
    return out[:, :s_len], lse[:, :s_len]


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, scale: float, kv_len: int, block_kv: int,
                log2_domain: bool = False):
    """``log2_domain``: q arrives PRE-SCALED by softmax_scale*log2(e), so the
    per-element ``* scale`` pass disappears and exp -> exp2 (the native
    transcendental) — one fewer VPU pass over the (BQ, BKV) tile, the
    VPU-bound kernel's unit of cost (docs/attention_roofline.md).  The
    emitted LSE is converted back to natural log either way."""
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

    exp = jnp.exp2 if log2_domain else jnp.exp
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BQ, BKV)
    if not log2_domain:
        s = s * scale

    # mask out padded kv positions (cross-attn T=577 etc.)
    if kv_len % block_kv != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:]                      # (BQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = exp(m_prev - m_new)
    p = exp(s - m_new)                      # (BQ, BKV)
    l_new = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kv_idx == n_kv - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)
        if log2_domain:
            lse_ref[0] = (m_scr[:] + jnp.log2(l_scr[:])) * _LN2
        else:
            lse_ref[0] = m_scr[:] + jnp.log(l_scr[:])


def _flash_fwd_3d(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                  block_q: int, block_kv: int):
    """q (BH, S, D), k/v (BH, T, D) -> (o (BH, S, D), lse (BH, S, 1))."""
    bh, s_len, d = q.shape
    kv_len = k.shape[1]
    block_q, block_kv = _pick_blocks(s_len, kv_len, block_q, block_kv,
                                     dtype=q.dtype)
    q = _pad_seq(q, block_q)
    k = _pad_seq(k, block_kv)
    v = _pad_seq(v, block_kv)

    # long multi-block KV with no padding tail: the deferred-softmax kernel
    # (MXU/VPU overlap + base-2 softmax), targeting the 74 TF/s plateau —
    # see docs/attention_roofline.md.  PIPELINE_FWD is the A/B switch for
    # benchmarks (benchmarks/attn_bench.py --ab).
    if PIPELINE_FWD and kv_len % block_kv == 0 and kv_len // block_kv >= 2:
        out, lse = _flash_fwd_3d_pipelined(q, k, v, scale, block_q, block_kv)
        return out[:, :s_len], lse[:, :s_len]

    # bf16-only: the prescale adds an independent operand rounding that
    # measurably doubles f32 error vs XLA on chip (2.4e-3 -> 5e-3, within
    # bf16 noise but not free at f32) — f32 callers (parity/acceptance)
    # keep the exact-scale kernel, bf16 serving/training takes the speed.
    log2 = LOG2_SOFTMAX and q.dtype != jnp.float32
    if log2:
        q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    grid = (bh, q.shape[1] // block_q, k.shape[1] // block_kv)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len,
                          block_kv=block_kv, log2_domain=log2),
        interpret=_interpret(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((bh, q.shape[1], 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q, k, v)
    return out[:, :s_len], lse[:, :s_len]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_scr, *, scale: float, kv_len: int, block_kv: int,
                   log2_domain: bool = False):
    """``log2_domain``: q arrives pre-scaled by softmax_scale*log2(e) and
    lse in log2 units, so ``p = exp2(s2 - lse2)`` with no per-element scale
    pass (same VPU saving as the forward).  dq stays in ORIGINAL q units —
    its ``* scale`` factor uses the unscaled k operand and is unchanged."""
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                       # (BQ, 1)
    delta = delta_ref[0]                   # (BQ, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if not log2_domain:
        s = s * scale
    if kv_len % block_kv != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = (jnp.exp2 if log2_domain else jnp.exp)(s - lse)  # (BQ, BKV)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(kv_idx == n_kv - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale: float, kv_len: int, block_kv: int,
                    log2_domain: bool = False):
    q_idx = pl.program_id(2)
    n_q = pl.num_programs(2)
    kv_idx = pl.program_id(1)

    @pl.when(q_idx == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if not log2_domain:
        s = s * scale
    if kv_len % block_kv != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = (jnp.exp2 if log2_domain else jnp.exp)(s - lse)  # (BQ, BKV)
    # dv += P^T dO
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    # dk += dS^T Q * scale; in log2 domain q is PRE-SCALED by
    # scale*log2(e), so the factor reduces to ln(2):
    # dS^T q_orig * scale = dS^T q2 * scale/(scale*log2e) = dS^T q2 * ln2
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (_LN2 if log2_domain else scale)

    @pl.when(q_idx == n_q - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_3d(q, k, v, o, lse, do, scale, block_q, block_kv):
    bh, s_len, d = q.shape
    kv_len = k.shape[1]
    block_q, block_kv = _pick_blocks(s_len, kv_len, block_q, block_kv,
                                     dtype=q.dtype)

    log2 = LOG2_SOFTMAX and q.dtype != jnp.float32  # bf16-only (see fwd)
    if log2:
        # same base-2 trick as the forward: prescale q and convert the
        # saved natural-log LSE, removing the per-element scale pass from
        # BOTH backward kernels (p = exp2(s2 - lse2))
        q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
        lse = lse * _LOG2E

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)  # (BH, S, 1)

    q = _pad_seq(q, block_q)
    do = _pad_seq(do, block_q)
    lse = _pad_seq(lse, block_q)
    delta = _pad_seq(delta, block_q)
    k = _pad_seq(k, block_kv)
    v = _pad_seq(v, block_kv)
    s_pad, kv_pad = q.shape[1], k.shape[1]

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    q1_spec = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                           memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=kv_len,
                          block_kv=block_kv, log2_domain=log2),
        interpret=_interpret(),
        grid=(bh, s_pad // block_q, kv_pad // block_kv),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, q1_spec, q1_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q, k, v, do, lse, delta)

    # dk/dv: kv blocks outer, q blocks innermost (accumulate across q)
    q_spec2 = pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0),
                            memory_space=pltpu.VMEM)
    q1_spec2 = pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=kv_len,
                          block_kv=block_kv, log2_domain=log2),
        interpret=_interpret(),
        grid=(bh, kv_pad // block_kv, s_pad // block_q),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, q1_spec2, q1_spec2],
        out_specs=(kv_spec2, kv_spec2),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        scratch_shapes=[pltpu.VMEM((block_kv, d), jnp.float32),
                        pltpu.VMEM((block_kv, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q, k, v, do, lse, delta)

    return dq[:, :s_len], dk[:, :kv_len], dv[:, :kv_len]


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


def _to3d(x):
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _from3d(x, b, h):
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
) -> jax.Array:
    """Flash attention over (batch, seq, heads, head_dim) tensors.

    ``block_q``/``block_kv`` default to the measured per-regime table
    (``_TUNED_BLOCKS``); pass explicit sizes to override (the sweep in
    benchmarks/attn_bench.py does)."""
    out, _ = _flash_fwd_rule(q, k, v, scale, block_q, block_kv)
    return out


def _flash_fwd_rule(q, k, v, scale, block_q, block_kv):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    block_q, block_kv = _resolve_blocks(q.shape[1], block_q, block_kv)
    b, _, h, _ = q.shape
    o3, lse = _flash_fwd_3d(_to3d(q), _to3d(k), _to3d(v), scale,
                            block_q, block_kv)
    return _from3d(o3, b, h), (q, k, v, o3, lse)


def _flash_bwd_rule(scale, block_q, block_kv, res, g):
    q, k, v, o3, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    block_q, block_kv = _resolve_blocks(q.shape[1], block_q, block_kv,
                                        table=_TUNED_BLOCKS_BWD)
    b, _, h, _ = q.shape
    dq3, dk3, dv3 = _flash_bwd_3d(
        _to3d(q), _to3d(k), _to3d(v), o3, lse, _to3d(g), scale,
        block_q, block_kv)
    return _from3d(dq3, b, h), _from3d(dk3, b, h), _from3d(dv3, b, h)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
