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
        # single-cycle cosine repeated; diffusers default num_cycles=1 reduces
        # to plain cosine.
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, max(warmup + 1, total_steps))
    if name == "polynomial":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup),
             optax.polynomial_schedule(lr, 0.0, 1.0,
                                       max(1, total_steps - warmup))],
            [warmup],
        )
    raise ValueError(f"Unknown lr_scheduler: {name}")


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
    else:
        raise ValueError(f"Unknown optimizer: {config.name}")

    return optax.chain(optax.clip_by_global_norm(config.max_grad_norm), opt)
