from diffute_tpu.diffusion.schedules import (  # noqa: F401
    DiffusionSchedule,
    make_schedule,
    add_noise,
    get_velocity,
    training_target,
    ddpm_timesteps,
    ddim_timesteps,
    ddpm_step,
    ddim_step,
    dpmpp_2m_step,
    init_noise_sigma,
    scale_model_input,
)
