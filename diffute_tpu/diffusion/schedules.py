"""Pure-JAX diffusion schedules and samplers (DDPM ancestral, DDIM,
DPM-Solver++(2M)).

Functional re-design of the scheduler surface the reference exercises through
diffusers' ``DDPMScheduler`` (reference train_diffute_v1.py:628,892-909 and
app.ipynb:545,796-816):

- ``add_noise``                  (train_diffute_v1.py:897)
- ``get_velocity``               (train_diffute_v1.py:907)
- ``init_noise_sigma``           (app.ipynb:800)
- ``set_timesteps`` -> here the static helpers ``ddpm_timesteps`` /
  ``ddim_timesteps``             (app.ipynb:803)
- ``scale_model_input``          (app.ipynb:810)
- ``step(...).prev_sample`` -> ``ddpm_step`` / ``ddim_step``  (app.ipynb:816)

Everything is a pure function of a :class:`DiffusionSchedule` pytree of
precomputed tables, so the whole denoising loop traces into a single
``lax.fori_loop``/``scan`` with no host round-trips — the reference instead
re-enters Python every step (app.ipynb:806-816).  Timestep *sequences* are
computed host-side with numpy (they are static for a given step count) and
passed into the jit'd loop as a constant array; per-step coefficient lookups
are ``jnp.take`` gathers, which XLA turns into cheap dynamic-slices.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffute_tpu.config import SchedulerConfig

import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed noise-schedule tables (all shape [num_train_timesteps])."""

    betas: jax.Array
    alphas: jax.Array
    alphas_cumprod: jax.Array
    # Static metadata (aux fields, not traced):
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    prediction_type: str = dataclasses.field(metadata=dict(static=True))
    clip_sample: bool = dataclasses.field(metadata=dict(static=True))
    variance_type: str = dataclasses.field(metadata=dict(static=True))
    set_alpha_to_one: bool = dataclasses.field(metadata=dict(static=True))
    steps_offset: int = dataclasses.field(metadata=dict(static=True))

    @property
    def final_alpha_cumprod(self) -> jax.Array:
        # DDIM boundary condition: alpha_bar for the step "before" t=0.
        if self.set_alpha_to_one:
            return jnp.asarray(1.0, dtype=self.alphas_cumprod.dtype)
        return self.alphas_cumprod[0]


def _beta_table(config: SchedulerConfig) -> np.ndarray:
    T = config.num_train_timesteps
    if config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, T, dtype=np.float64)
    elif config.beta_schedule == "scaled_linear":
        # SD-family schedule: linear in sqrt(beta).
        betas = (
            np.linspace(config.beta_start**0.5, config.beta_end**0.5, T, dtype=np.float64)
            ** 2
        )
    elif config.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(T, dtype=np.float64)
        betas = np.minimum(1.0 - alpha_bar((ts + 1) / T) / alpha_bar(ts / T), 0.999)
    else:
        raise ValueError(f"Unknown beta_schedule: {config.beta_schedule}")
    return betas


def make_schedule(config: SchedulerConfig, dtype=jnp.float32) -> DiffusionSchedule:
    betas = _beta_table(config)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    return DiffusionSchedule(
        betas=jnp.asarray(betas, dtype=dtype),
        alphas=jnp.asarray(alphas, dtype=dtype),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=dtype),
        num_train_timesteps=config.num_train_timesteps,
        prediction_type=config.prediction_type,
        clip_sample=config.clip_sample,
        variance_type=config.variance_type,
        set_alpha_to_one=config.set_alpha_to_one,
        steps_offset=config.steps_offset,
    )


def _gather(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep coefficients and broadcast to an ndim-rank tensor.

    ``t`` may be scalar or per-batch shape (B,).
    """
    coef = jnp.take(table, t)
    return coef.reshape(coef.shape + (1,) * (ndim - coef.ndim))


def add_noise(
    schedule: DiffusionSchedule, x0: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """Forward process q(x_t | x_0) (reference train_diffute_v1.py:897)."""
    a = _gather(jnp.sqrt(schedule.alphas_cumprod), t, x0.ndim)
    s = _gather(jnp.sqrt(1.0 - schedule.alphas_cumprod), t, x0.ndim)
    return a * x0 + s * noise


def get_velocity(
    schedule: DiffusionSchedule, x0: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """v-prediction target (reference train_diffute_v1.py:907)."""
    a = _gather(jnp.sqrt(schedule.alphas_cumprod), t, x0.ndim)
    s = _gather(jnp.sqrt(1.0 - schedule.alphas_cumprod), t, x0.ndim)
    return a * noise - s * x0


def training_target(
    schedule: DiffusionSchedule, x0: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """epsilon / v target selection (reference train_diffute_v1.py:904-909)."""
    if schedule.prediction_type == "epsilon":
        return noise
    if schedule.prediction_type == "v_prediction":
        return get_velocity(schedule, x0, noise, t)
    raise ValueError(f"Unknown prediction type {schedule.prediction_type}")


def init_noise_sigma(schedule: DiffusionSchedule, sampler: str = "ddpm") -> float:
    """Initial latent scale (app.ipynb:800).  1.0 for both DDPM and DDIM."""
    del schedule, sampler
    return 1.0


def scale_model_input(x: jax.Array, t: jax.Array) -> jax.Array:
    """Identity for DDPM/DDIM (app.ipynb:810); kept for API parity."""
    del t
    return x


# ---------------------------------------------------------------------------
# Timestep spacing (host-side, static per step count)
# ---------------------------------------------------------------------------


def ddpm_timesteps(schedule: DiffusionSchedule, num_inference_steps: int) -> np.ndarray:
    """Descending timestep sequence for DDPM ancestral sampling.

    Matches diffusers' default ("leading") spacing used by the reference's
    ``set_timesteps(N)`` call (app.ipynb:803): floor-strided arange, reversed.
    Also returns the implied previous-timestep offset via :func:`ddpm_prev_t`.
    """
    T = schedule.num_train_timesteps
    if num_inference_steps > T:
        raise ValueError(f"num_inference_steps {num_inference_steps} > {T}")
    step_ratio = T // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
    return ts.astype(np.int32).copy()


def ddim_timesteps(schedule: DiffusionSchedule, num_inference_steps: int) -> np.ndarray:
    """Descending timesteps for DDIM ("leading" spacing + steps_offset)."""
    T = schedule.num_train_timesteps
    if num_inference_steps > T:
        raise ValueError(f"num_inference_steps {num_inference_steps} > {T}")
    step_ratio = T // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
    ts = ts + schedule.steps_offset
    return np.clip(ts, 0, T - 1).astype(np.int32).copy()


# ---------------------------------------------------------------------------
# Reverse-process steps (jit-safe; trace inside scan/fori_loop)
# ---------------------------------------------------------------------------


def _predict_x0_eps(
    schedule: DiffusionSchedule,
    model_output: jax.Array,
    t: jax.Array,
    sample: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Return (pred_x0, pred_epsilon) from the model output under the
    configured prediction type."""
    alpha_prod_t = _gather(schedule.alphas_cumprod, t, sample.ndim)
    beta_prod_t = 1.0 - alpha_prod_t
    if schedule.prediction_type == "epsilon":
        pred_x0 = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(alpha_prod_t)
        pred_eps = model_output
    elif schedule.prediction_type == "v_prediction":
        pred_x0 = jnp.sqrt(alpha_prod_t) * sample - jnp.sqrt(beta_prod_t) * model_output
        pred_eps = jnp.sqrt(alpha_prod_t) * model_output + jnp.sqrt(beta_prod_t) * sample
    else:
        raise ValueError(f"Unknown prediction type {schedule.prediction_type}")
    if schedule.clip_sample:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
    return pred_x0, pred_eps


def ddpm_step(
    schedule: DiffusionSchedule,
    model_output: jax.Array,
    t: jax.Array,
    sample: jax.Array,
    noise: jax.Array,
    num_inference_steps: int,
) -> jax.Array:
    """One ancestral DDPM reverse step x_t -> x_{t-k}.

    Functional equivalent of ``DDPMScheduler.step(...).prev_sample``
    (app.ipynb:816) with variance_type fixed_small.  ``noise`` supplies the
    ancestral standard normal (generate it OUTSIDE any scan body — in-body
    threefry alongside a large network slows XLA compile pathologically);
    it is only applied when the *previous* timestep is >= 0.
    """
    T = schedule.num_train_timesteps
    prev_t = t - T // num_inference_steps

    alpha_prod_t = _gather(schedule.alphas_cumprod, t, sample.ndim)
    alpha_prod_prev = jnp.where(
        prev_t >= 0,
        _gather(schedule.alphas_cumprod, jnp.clip(prev_t, 0), sample.ndim),
        jnp.ones_like(alpha_prod_t),
    )
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_prev = 1.0 - alpha_prod_prev
    current_alpha = alpha_prod_t / alpha_prod_prev
    current_beta = 1.0 - current_alpha

    pred_x0, _ = _predict_x0_eps(schedule, model_output, t, sample)

    # mu_t(x_t, x0)
    coef_x0 = jnp.sqrt(alpha_prod_prev) * current_beta / beta_prod_t
    coef_xt = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
    prev_mean = coef_x0 * pred_x0 + coef_xt * sample

    # posterior variance, clamped for numerical safety like diffusers.
    if schedule.variance_type == "fixed_small":
        variance = jnp.clip(beta_prod_prev / beta_prod_t * current_beta, 1e-20)
    elif schedule.variance_type == "fixed_large":
        variance = jnp.clip(current_beta, 1e-20)
    else:
        raise ValueError(f"Unsupported variance_type {schedule.variance_type}")
    add = jnp.where(prev_t >= 0, jnp.sqrt(variance) * noise, jnp.zeros_like(sample))
    return prev_mean + add


def ddim_step(
    schedule: DiffusionSchedule,
    model_output: jax.Array,
    t: jax.Array,
    prev_t: jax.Array,
    sample: jax.Array,
    eta: float = 0.0,
    key: jax.Array | None = None,
) -> jax.Array:
    """One DDIM reverse step (deterministic for eta=0).

    ``prev_t`` is the next timestep in the (descending) sequence; pass -1 for
    the final step so alpha_bar_prev falls back to ``final_alpha_cumprod``.
    """
    alpha_prod_t = _gather(schedule.alphas_cumprod, t, sample.ndim)
    alpha_prod_prev = jnp.where(
        prev_t >= 0,
        _gather(schedule.alphas_cumprod, jnp.clip(prev_t, 0), sample.ndim),
        jnp.full_like(alpha_prod_t, schedule.final_alpha_cumprod),
    )
    beta_prod_t = 1.0 - alpha_prod_t

    pred_x0, pred_eps = _predict_x0_eps(schedule, model_output, t, sample)

    if eta > 0.0:
        if key is None:
            raise ValueError("eta > 0 requires a PRNG key")
        variance = (1.0 - alpha_prod_prev) / beta_prod_t * (
            1.0 - alpha_prod_t / alpha_prod_prev
        )
        std = eta * jnp.sqrt(jnp.clip(variance, 0.0))
        noise = jax.random.normal(key, sample.shape, dtype=sample.dtype)
    else:
        std = jnp.zeros_like(alpha_prod_t)
        noise = jnp.zeros_like(sample)

    dir_xt = jnp.sqrt(jnp.clip(1.0 - alpha_prod_prev - std**2, 0.0)) * pred_eps
    return jnp.sqrt(alpha_prod_prev) * pred_x0 + dir_xt + std * noise


def _alpha_sigma_lambda(
    schedule: DiffusionSchedule, t: jax.Array, ndim: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(alpha_t, sigma_t, lambda_t) in DPM-Solver's half-log-SNR notation:
    alpha = sqrt(alpha_bar), sigma = sqrt(1 - alpha_bar),
    lambda = log(alpha/sigma)."""
    ac = _gather(schedule.alphas_cumprod, t, ndim)
    alpha = jnp.sqrt(ac)
    sigma = jnp.sqrt(1.0 - ac)
    lam = 0.5 * (jnp.log(ac) - jnp.log1p(-ac))
    return alpha, sigma, lam


def dpmpp_2m_step(
    schedule: DiffusionSchedule,
    model_output: jax.Array,
    t: jax.Array,
    prev_t: jax.Array,
    t_last: jax.Array,
    sample: jax.Array,
    prev_x0: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """One DPM-Solver++(2M) multistep update x_t -> x_{prev_t}.

    Data-prediction second-order multistep solver (Lu et al. 2022,
    arXiv:2211.01095 eq. (4.4); the method behind diffusers'
    ``DPMSolverMultistepScheduler(algorithm_type="dpmsolver++",
    solver_order=2)``) — reaches DDIM-at-50-steps quality in ~20 steps,
    a beyond-reference sampler (the reference exposes DDPM only,
    app.ipynb:545).

    ``t_last`` is the timestep of the *previous* solver step (pass -1 on
    the first step: falls back to the first-order update, which equals
    DDIM rewritten in x0 form). ``prev_x0`` is the previous step's x0
    prediction (any same-shaped array on the first step). ``prev_t`` is
    the next timestep in the descending sequence; pass -1 on the final
    step — the boundary then uses ``final_alpha_cumprod``, the same
    convention as :func:`ddim_step`, and (like diffusers'
    ``lower_order_final``) drops to first order.

    Returns ``(prev_sample, pred_x0)``; carry ``pred_x0`` into the next
    call.
    """
    nd = sample.ndim
    _, sigma_t, lam_t = _alpha_sigma_lambda(schedule, t, nd)
    ac_s = jnp.where(
        prev_t >= 0,
        _gather(schedule.alphas_cumprod, jnp.clip(prev_t, 0), nd),
        jnp.full((1,) * nd, schedule.final_alpha_cumprod),
    )
    alpha_s, sigma_s = jnp.sqrt(ac_s), jnp.sqrt(1.0 - ac_s)
    # +inf at the set_alpha_to_one sigma->0 boundary; expm1(-inf) = -1 and
    # sigma_s = 0 there, so the update degenerates to pred_x0 with no NaNs.
    lam_s = 0.5 * (jnp.log(ac_s) - jnp.log1p(-ac_s))
    _, _, lam_l = _alpha_sigma_lambda(schedule, jnp.clip(t_last, 0), nd)

    pred_x0, _ = _predict_x0_eps(schedule, model_output, t, sample)

    h = lam_s - lam_t
    h_last = lam_t - lam_l
    r = h_last / h
    # second-order correction from the previous x0 prediction; first-order
    # (D = x0) on the first step and, like diffusers' lower_order_final,
    # on the final step.
    second = (t_last >= 0) & (prev_t >= 0)
    d_corr = (1.0 + 1.0 / (2.0 * r)) * pred_x0 - 1.0 / (2.0 * r) * prev_x0
    d = jnp.where(second, d_corr, pred_x0)

    x = (sigma_s / sigma_t) * sample - alpha_s * jnp.expm1(-h) * d
    return x, pred_x0
