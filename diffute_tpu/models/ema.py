"""Exponential moving average of a parameter tree.

Functional replacement for diffusers' EMAModel used by the reference
(train_diffute_v1.py:642-646, stepped after each synced optimizer step at
:934-935).  Implements the same warmup-aware decay ramp:
``decay_t = min(max_decay, (1 + step) / (10 + step))``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EmaState:
    params: Any
    step: jax.Array  # int32 scalar


def ema_init(params: Any) -> EmaState:
    return EmaState(params=jax.tree_util.tree_map(jnp.array, params),
                    step=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, new_params: Any, max_decay: float = 0.9999) -> EmaState:
    step = state.step + 1
    decay = jnp.minimum(max_decay, (1.0 + step) / (10.0 + step))
    ema = jax.tree_util.tree_map(
        lambda e, p: e - (1.0 - decay) * (e - p), state.params, new_params
    )
    return EmaState(params=ema, step=step)
