"""Stage-1 trainer: VAE reconstruction fine-tune on document images.

Re-implements the reference's stage-1 loop (train_vae.py:704-759): full
encode -> sample -> decode, pixel-space MSE against the input (no KL /
perceptual / GAN term, train_vae.py:721-724), AdamW + clip, data-parallel.
The trained VAE checkpoint then feeds stage 2 (train_diffute_v1.py:632).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffute_tpu.config import DiffUTEConfig
from diffute_tpu.models import AutoencoderKL
from diffute_tpu.models.ema import ema_update
from diffute_tpu.parallel import make_mesh, shard_batch
import optax

from diffute_tpu.train.optim import build_optimizer
from diffute_tpu.train.state import TrainState
from diffute_tpu.utils.images import device_to_unit_range


def make_vae_train_step(config: DiffUTEConfig, tx) -> Callable:
    """Batch layout: pixel_values (B, R, R, 3) uint8 raw pixels (the product
    layout — normalized on device, see utils.images.device_to_unit_range) or
    float32 in [-1, 1]; with gradient_accumulation_steps > 1,
    (accum, micro, R, R, 3)."""
    bf16 = config.train.mixed_precision == "bf16"
    accum = config.train.gradient_accumulation_steps
    if bf16:
        import dataclasses as _dc

        # see unet_train: module dtype must match or Flax upcasts to fp32
        config = _dc.replace(
            config, vae=_dc.replace(config.vae, dtype=jnp.bfloat16))
    vae = AutoencoderKL(config.vae)

    def loss_fn(params, micro, rng):
        dtype = jnp.bfloat16 if bf16 else jnp.float32
        p = jax.tree_util.tree_map(lambda x: x.astype(dtype), params) if bf16 else params
        pixels = device_to_unit_range(micro["pixel_values"], dtype)
        recon = vae.apply({"params": p}, pixels, rng)
        return jnp.mean((recon.astype(jnp.float32)
                         - pixels.astype(jnp.float32)) ** 2)

    grad_fn = jax.value_and_grad(loss_fn)

    def train_step(state: TrainState, batch, rng):
        if accum > 1:
            def micro_step(carry, xs):
                loss_acc, grad_acc = carry
                micro, k = xs
                loss, grads = grad_fn(state.params, micro, k)
                return (loss_acc + loss,
                        jax.tree_util.tree_map(jnp.add, grad_acc, grads)), None

            keys = jax.random.split(rng, accum)
            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                micro_step, (jnp.zeros(()), zero), (batch, keys))
            loss = loss_sum / accum
            grads = jax.tree_util.tree_map(lambda g: g / accum, grad_sum)
        else:
            loss, grads = grad_fn(state.params, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
        new_ema = (ema_update(state.ema, new_params, config.train.ema_decay)
                   if state.ema is not None else None)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1, ema=new_ema)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return train_step


class VAETrainer:
    def __init__(self, config: DiffUTEConfig, vae_params, mesh=None,
                 total_steps: Optional[int] = None):
        self.config = config
        self.mesh = mesh or make_mesh(config.train.dp_size)
        total = total_steps or config.train.max_train_steps or 10_000
        tbs = (config.train.train_batch_size * self.mesh.devices.size
               * config.train.gradient_accumulation_steps)
        self.tx = build_optimizer(config.train.optimizer, total, tbs)
        self.state = TrainState.create(vae_params, self.tx,
                                       use_ema=config.train.use_ema)
        from diffute_tpu.train.unet_train import make_multi_step, resolve_donation

        donate = (0,) if resolve_donation(config) else ()
        self._step = jax.jit(make_vae_train_step(config, self.tx),
                             donate_argnums=donate)
        self.steps_per_call = config.train.steps_per_call
        if self.steps_per_call > 1:
            if config.train.gradient_accumulation_steps > 1:
                raise ValueError("steps_per_call > 1 requires "
                                 "gradient_accumulation_steps == 1")
            base = make_vae_train_step(config, self.tx)
            self._multi = jax.jit(
                make_multi_step(lambda s, frozen, b, k: base(s, b, k),
                                self.steps_per_call),
                donate_argnums=donate)

    def step(self, batch: Dict[str, np.ndarray], rng) -> Dict[str, float]:
        accum = self.config.train.gradient_accumulation_steps
        if not all(isinstance(x, jax.Array)
                   for x in jax.tree_util.tree_leaves(batch)):
            # host batch: place it now; device batches (e.g. from
            # parallel.DevicePrefetcher) are already mesh-resident
            batch = shard_batch(self.mesh, batch,
                                batch_axis=1 if accum > 1 else 0)
        self.state, metrics = self._step(self.state, batch, rng)
        return metrics

    def run_steps(self, batches, rng) -> Dict[str, np.ndarray]:
        """Advance ``steps_per_call`` steps in one device call (see
        UNetTrainer.run_steps)."""
        if not all(isinstance(x, jax.Array)
                   for x in jax.tree_util.tree_leaves(batches)):
            batches = shard_batch(self.mesh, batches, batch_axis=1)
        self.state, metrics = self._multi(self.state, {}, batches, rng)
        return metrics
