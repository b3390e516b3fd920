"""Stage-2 trainer: SD2-inpaint UNet with TrOCR glyph conditioning.

Re-implements the reference's training step (train_diffute_v1.py:858-951)
as ONE jit'd function over a data-parallel mesh:

  glyph -> TrOCR encode (frozen)                       [ref :868-871]
  pixels/masked -> VAE encode x sf (frozen)            [ref :875-876,886-887]
  mask -> nearest-downsample to latent res             [ref :880-884]
  t ~ U[0, T); noisy = add_noise(latents, eps, t)      [ref :892-897]
  target = eps | velocity                              [ref :904-909]
  pred = unet(concat 9ch, t, ctx); loss = MSE          [ref :912-918]
  grad accumulation -> clip -> AdamW -> EMA            [ref :873,925-935]

Distribution: batch sharded over the ``data`` mesh axis, params replicated;
XLA derives the gradient all-reduce (the reference's DDP/NCCL allreduce,
SURVEY.md §2d).  The loss in metrics is the global mean — the jnp.mean over
the sharded batch dimension compiles to a psum, replacing
``accelerator.gather(loss)`` (ref :921).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffute_tpu.config import DiffUTEConfig
from diffute_tpu.diffusion import add_noise, make_schedule, training_target
from diffute_tpu.models import AutoencoderKL, TrOCREncoder, UNet2DCondition
from diffute_tpu.models.ema import ema_update
from diffute_tpu.models.vae import sample_latent
from diffute_tpu.parallel import make_mesh, shard_batch
from diffute_tpu.text import trocr_normalize
from diffute_tpu.train.optim import build_optimizer
from diffute_tpu.train.state import TrainState
from diffute_tpu.utils.images import device_to_unit_range


def _cast(tree, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)


def resolve_donation(config: DiffUTEConfig) -> bool:
    """Whether the train step should donate its state (TrainConfig.
    donate_state; None = auto).  Donation is the right call on directly
    attached TPUs (in-place update, halves transient param HBM), but on the
    tunneled axon relay it round-trips the donated buffers through the host
    — measured 76 s/step for the 866M trainer vs 0.37 s without donation
    for the identical program."""
    if config.train.donate_state is not None:
        return config.train.donate_state
    return "axon" not in str(jax.config.jax_platforms or "")


def make_unet_train_step(
    config: DiffUTEConfig,
    tx,
    opt_shardings=None,
) -> Callable:
    """Build the jit-able train step.

    Batch layout (all device arrays, leading dim = global batch):
      pixel_values  (B, R, R, 3) uint8 raw pixels (or float32 in [-1, 1])
      masks         (B, R, R)    uint8 {0, 1} (or float32)
      masked_images (B, R, R, 3) uint8 (or float32 in [-1, 1])
      glyph_pixels  (B, 384, 384, 3) uint8

    uint8 batches are the product layout (4x fewer host->device bytes and
    staged-input HBM; normalization happens here on device, within 1 ulp
    of the old host f32 path); float batches still work.

    With gradient_accumulation_steps > 1 the caller passes
    (accum, micro, ...) leading dims instead and the step scans.
    """
    accum = config.train.gradient_accumulation_steps
    bf16 = config.train.mixed_precision == "bf16"
    if bf16:
        # the module dtype must be bf16 too: Flax layers promote operands to
        # their own dtype, so bf16 params with dtype=fp32 modules would be
        # silently upcast and compute in fp32
        import dataclasses as _dc

        config = _dc.replace(
            config,
            vae=_dc.replace(config.vae, dtype=jnp.bfloat16),
            unet=_dc.replace(config.unet, dtype=jnp.bfloat16),
            trocr=_dc.replace(config.trocr, dtype=jnp.bfloat16))
    vae = AutoencoderKL(config.vae)
    unet = UNet2DCondition(config.unet)
    trocr = TrOCREncoder(config.trocr)
    schedule = make_schedule(config.scheduler)
    sf = config.vae.scaling_factor
    f = config.vae.scale_factor
    T = config.scheduler.num_train_timesteps
    noise_offset = config.train.noise_offset

    def loss_fn(unet_params, frozen, micro, rng):
        kv, km, kn, kt, ko = jax.random.split(rng, 5)
        compute_dtype = jnp.bfloat16 if bf16 else jnp.float32
        u_params = _cast(unet_params, compute_dtype) if bf16 else unet_params
        # frozen models are stored in the compute dtype by the trainer, so
        # these casts are no-ops there (saves an HBM copy per step)
        v_params = _cast(frozen["vae"], compute_dtype) if bf16 else frozen["vae"]
        t_params = _cast(frozen["trocr"], compute_dtype) if bf16 else frozen["trocr"]

        pixels = device_to_unit_range(micro["pixel_values"], compute_dtype)
        masked = device_to_unit_range(micro["masked_images"], compute_dtype)
        glyphs = trocr_normalize(micro["glyph_pixels"]).astype(compute_dtype)

        ctx = trocr.apply({"params": t_params}, glyphs)

        mean, logvar = vae.apply({"params": v_params}, pixels, method=vae.encode)
        latents = sample_latent(mean, logvar, kv) * sf
        mmean, mlogvar = vae.apply({"params": v_params}, masked, method=vae.encode)
        masked_latents = sample_latent(mmean, mlogvar, km) * sf

        B, r = latents.shape[0], latents.shape[1]
        from diffute_tpu.ops.interpolate import nearest_resize_2d

        # torch F.interpolate 'nearest' semantics (reference :881-883)
        mask_lat = nearest_resize_2d(
            micro["masks"].astype(compute_dtype), r, r)[..., None]

        noise = jax.random.normal(kn, latents.shape, latents.dtype)
        if noise_offset:
            noise = noise + noise_offset * jax.random.normal(
                ko, (B, 1, 1, latents.shape[-1]), latents.dtype)
        t = jax.random.randint(kt, (B,), 0, T)
        noisy = add_noise(schedule, latents, noise, t)
        target = training_target(schedule, latents, noise, t)

        x_in = jnp.concatenate([noisy, mask_lat, masked_latents], axis=-1)
        pred = unet.apply({"params": u_params}, x_in, t, ctx)
        loss = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
        return loss

    grad_fn = jax.value_and_grad(loss_fn)

    def train_step(state: TrainState, frozen: Dict[str, Any], batch, rng):
        if accum > 1:
            def micro_step(carry, xs):
                loss_acc, grad_acc = carry
                micro, k = xs
                loss, grads = grad_fn(state.params, frozen, micro, k)
                return (loss_acc + loss,
                        jax.tree_util.tree_map(jnp.add, grad_acc, grads)), None

            keys = jax.random.split(rng, accum)
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                micro_step, (jnp.zeros(()), zero_grads), (batch, keys))
            loss = loss_sum / accum
            grads = jax.tree_util.tree_map(lambda g: g / accum, grad_sum)
        else:
            loss, grads = grad_fn(state.params, frozen, batch, rng)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if opt_shardings is not None:
            # ZeRO-1: keep optimizer moments sharded over the data axis; XLA
            # partitions the update math and all-gathers only the params.
            new_opt = jax.lax.with_sharding_constraint(new_opt, opt_shardings)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_ema = (ema_update(state.ema, new_params, config.train.ema_decay)
                   if state.ema is not None else None)
        grad_norm = optax.global_norm(grads)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1, ema=new_ema)
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    return train_step


def make_multi_step(step_fn, k: int):
    """Wrap a train step in a ``lax.scan`` over ``k`` consecutive steps.

    One executable advances the state k times ON DEVICE — the state never
    crosses the host/runtime boundary between steps.  This amortizes
    per-call dispatch everywhere, and on the tunneled relay backend it is
    the difference between usable and unusable: feeding the 866M state tree
    back through the runtime between calls measured 45-90 s per step, while
    the identical program chained inside one executable runs at device
    speed (~0.4 s/step).

    ``batches`` carries a leading ``k`` dim; metrics are returned per-step
    (leading dim k)."""

    def multi(state, frozen, batches, rng):
        keys = jax.random.split(rng, k)

        def body(s, xs):
            batch, key = xs
            s2, m = step_fn(s, frozen, batch, key)
            return s2, m

        state, metrics = jax.lax.scan(body, state, (batches, keys))
        return state, metrics

    return multi


class UNetTrainer:
    """Host-side orchestration: mesh placement, jit, checkpoint, logging."""

    def __init__(
        self,
        config: DiffUTEConfig,
        unet_params,
        frozen_params: Dict[str, Any],
        mesh=None,
        total_steps: Optional[int] = None,
    ):
        self.config = config
        self.mesh = mesh or make_mesh(config.train.dp_size)
        total = total_steps or config.train.max_train_steps or 10_000
        tbs = (config.train.train_batch_size * self.mesh.devices.size
               * config.train.gradient_accumulation_steps)
        self.tx = build_optimizer(config.train.optimizer, total, tbs)
        self.state = TrainState.create(unet_params, self.tx,
                                       use_ema=config.train.use_ema)
        if config.train.mixed_precision == "bf16":
            # frozen VAE/TrOCR live in bf16 (the reference casts them to the
            # half dtype too, train_diffute_v1.py:789-797); halves their HBM
            frozen_params = _cast(frozen_params, jnp.bfloat16)
        self.frozen = frozen_params
        opt_shardings = None
        if config.train.shard_optimizer_states:
            from diffute_tpu.parallel import zero1_shardings

            opt_shardings = zero1_shardings(self.state.opt_state, self.mesh)
            self.state.opt_state = jax.device_put(self.state.opt_state,
                                                  opt_shardings)
        donate = (0,) if resolve_donation(config) else ()
        self._step = jax.jit(
            make_unet_train_step(config, self.tx, opt_shardings),
            donate_argnums=donate)
        self.steps_per_call = config.train.steps_per_call
        if self.steps_per_call > 1:
            if config.train.gradient_accumulation_steps > 1:
                raise ValueError("steps_per_call > 1 requires "
                                 "gradient_accumulation_steps == 1")
            self._multi = jax.jit(
                make_multi_step(
                    make_unet_train_step(config, self.tx, opt_shardings),
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
        self.state, metrics = self._step(self.state, self.frozen, batch, rng)
        return metrics

    def run_steps(self, batches, rng) -> Dict[str, np.ndarray]:
        """Advance ``steps_per_call`` optimizer steps in one device call.

        ``batches``: the per-step batch pytree with an extra LEADING
        steps_per_call dim (host numpy or mesh-placed arrays).  Returns
        metrics with leading dim steps_per_call."""
        if not all(isinstance(x, jax.Array)
                   for x in jax.tree_util.tree_leaves(batches)):
            batches = shard_batch(self.mesh, batches, batch_axis=1)
        self.state, metrics = self._multi(self.state, self.frozen, batches,
                                          rng)
        return metrics
