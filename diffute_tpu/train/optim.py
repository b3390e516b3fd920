"""Optimizer + LR schedule builders (optax).

Mirrors the reference's AdamW setup (train_diffute_v1.py:709-727: betas
(0.9, 0.999), weight decay 1e-2, eps 1e-8, lr 1e-4) and diffusers'
``get_scheduler`` family (train_diffute_v1.py:772-777, flag :203-213:
constant / constant_with_warmup / linear / cosine / cosine_with_restarts /
polynomial, warmup 500).  Gradient clipping (max_grad_norm 1.0,
train_diffute_v1.py:925-927) is part of the chain.
"""

from __future__ import annotations

import optax

from diffute_tpu.config import OptimizerConfig


def build_lr_schedule(config: OptimizerConfig, total_steps: int) -> optax.Schedule:
    lr = config.learning_rate
    warmup = config.lr_warmup_steps
    name = config.lr_scheduler
    if name == "constant":
        return optax.constant_schedule(lr)
    if name == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), optax.constant_schedule(lr)],
            [warmup],
        )
    if name == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup),
             optax.linear_schedule(lr, 0.0, max(1, total_steps - warmup))],
            [warmup],
        )
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, max(warmup + 1, total_steps))
    if name == "cosine_with_restarts":
        # diffusers get_cosine_with_hard_restarts_schedule_with_warmup:
        # linear warmup, then num_cycles hard-restart cosine arcs — the LR
        # falls to 0 at each cycle boundary and snaps back to full lr:
        #   factor = 0.5 * (1 + cos(pi * ((num_cycles * progress) % 1)))
        # with progress in [0,1) over the post-warmup span, 0 after.
        import jax.numpy as jnp

        cycles = max(1, config.lr_num_cycles)
        decay_span = max(1, total_steps - warmup)

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            warm = lr * step / jnp.maximum(1.0, warmup)
            progress = (step - warmup) / decay_span
            frac = jnp.mod(cycles * progress, 1.0)
            arc = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
            arc = jnp.where(progress >= 1.0, 0.0, arc)
            return jnp.where(step < warmup, warm, arc)

        return schedule
    if name == "polynomial":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup),
             optax.polynomial_schedule(lr, 0.0, 1.0,
                                       max(1, total_steps - warmup))],
            [warmup],
        )
    raise ValueError(f"Unknown lr_scheduler: {name}")


def scale_by_adam_int8(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8,
                       block: int = 256) -> optax.GradientTransformation:
    """Adam with BOTH moments stored int8 (blockwise absmax scales) — the
    exact optax analogue of bitsandbytes AdamW8bit, the reference's opt-in
    memory lever (train_diffute_v1.py:244-248, ``--use_8bit_adam``).

    The first moment is quantized linearly; the second moment is stored as
    the quantized SQUARE ROOT — sqrt compresses nu's dynamic range
    quadratically, which a linear int8 code cannot span (bnb uses a dynamic
    exponent code for the same reason).  State: ~2 bytes/param vs Adam's 8.
    """
    import jax
    import jax.numpy as jnp

    from diffute_tpu.ops.quant import dequantize_blockwise, quantize_blockwise

    def init(params):
        def zero_q(p):
            q, s = quantize_blockwise(jnp.zeros(p.shape, jnp.float32), block)
            return {"q": q, "s": s}

        return {
            "count": jnp.zeros((), jnp.int32),
            "mu": jax.tree_util.tree_map(zero_q, params),
            "nu_sqrt": jax.tree_util.tree_map(zero_q, params),
        }

    def update(grads, state, params=None):
        del params
        count = state["count"] + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(g, mu8, nus8):
            g = g.astype(jnp.float32)
            mu = dequantize_blockwise(mu8["q"], mu8["s"], g.shape)
            nu = dequantize_blockwise(nus8["q"], nus8["s"], g.shape) ** 2
            mu = b1 * mu + (1.0 - b1) * g
            nu = b2 * nu + (1.0 - b2) * g * g
            upd = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
            mq, ms = quantize_blockwise(mu, block)
            nq, ns = quantize_blockwise(jnp.sqrt(nu), block)
            return upd, {"q": mq, "s": ms}, {"q": nq, "s": ns}

        flat, treedef = jax.tree_util.tree_flatten(grads)
        mus = treedef.flatten_up_to(state["mu"])
        nus = treedef.flatten_up_to(state["nu_sqrt"])
        out = [leaf(g, m, n) for g, m, n in zip(flat, mus, nus)]
        updates = treedef.unflatten([o[0] for o in out])
        new_mu = treedef.unflatten([o[1] for o in out])
        new_nu = treedef.unflatten([o[2] for o in out])
        return updates, {"count": count, "mu": new_mu, "nu_sqrt": new_nu}

    return optax.GradientTransformation(init, update)


def build_optimizer(config: OptimizerConfig, total_steps: int,
                    total_batch_size: int = 1) -> optax.GradientTransformation:
    import dataclasses

    import jax.numpy as jnp

    if config.scale_lr:
        # reference --scale_lr: lr *= grad_accum * batch * world
        # (train_diffute_v1.py:704-707)
        config = dataclasses.replace(
            config, learning_rate=config.learning_rate * total_batch_size)
    schedule = build_lr_schedule(config, total_steps)

    if config.name == "adafactor":
        opt = optax.adafactor(
            learning_rate=schedule,
            multiply_by_parameter_scale=False,
            clipping_threshold=1.0,
            weight_decay_rate=config.adam_weight_decay,
        )
    elif config.name == "adamw":
        opt = optax.adamw(
            learning_rate=schedule,
            b1=config.adam_beta1,
            b2=config.adam_beta2,
            eps=config.adam_epsilon,
            weight_decay=config.adam_weight_decay,
            # bf16 first moment: the TPU counterpart of bnb AdamW8bit
            # (reference train_diffute_v1.py:244-248)
            mu_dtype=jnp.bfloat16 if config.low_memory_adam else None,
        )
    elif config.name == "adamw8bit":
        # bnb AdamW8bit analogue: int8 moments + decoupled weight decay
        # (reference train_diffute_v1.py:244-248,709-719)
        opt = optax.chain(
            scale_by_adam_int8(b1=config.adam_beta1, b2=config.adam_beta2,
                               eps=config.adam_epsilon),
            optax.add_decayed_weights(config.adam_weight_decay),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        raise ValueError(f"Unknown optimizer: {config.name}")

    return optax.chain(optax.clip_by_global_norm(config.max_grad_norm), opt)
