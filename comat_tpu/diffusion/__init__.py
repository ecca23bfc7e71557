from comat_tpu.diffusion.schedulers import (
    DiffusionSchedule,
    SamplerCoeffs,
    make_schedule,
    make_sampler_coeffs,
    ddpm_step_from_coeffs,
    add_noise,
)
