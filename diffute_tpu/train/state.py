"""Train state pytree: trainable params, optimizer state, EMA, step."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from diffute_tpu.models.ema import EmaState, ema_init


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    ema: Optional[EmaState]

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation,
               use_ema: bool = False) -> "TrainState":
        # Copy incoming params: train steps donate the state for in-place
        # updates, which would otherwise invalidate the caller's arrays.
        params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            ema=ema_init(params) if use_ema else None,
        )
