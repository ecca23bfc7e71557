"""Diffusion noise schedules and sampler steps as pure functions.

The reference swaps whatever scheduler a pretrained pipeline ships with
for a `DDPMScheduler` with `variance_type='fixed_small'` and epsilon
prediction (reference: training_utils/pipeline.py:50-59), with the SD
config: scaled_linear betas 0.00085..0.012 over 1000 train timesteps,
`steps_offset=1`, `clip_sample=False`, "leading" timestep spacing.

TPU-first design: instead of a stateful scheduler object mutated by
`set_timesteps` and queried per step (the diffusers pattern), we
precompute a per-inference-step coefficient table `SamplerCoeffs` once
at trace time. Every sampler step is then a gather + an affine update

    prev = coef_sample[i] * x + coef_eps[i] * eps + sigma[i] * noise

which (a) keeps the `lax.scan` body free of integer division / searching,
and (b) makes the differentiable-replay pass (see
`comat_tpu.diffusion.sampler`) a cheap affine recomputation: the chain
x_t -> x_0 is affine in the per-step eps predictions, which is exactly
the property the two-pass gradient structure exploits.

All schedule math is float32 regardless of model compute dtype (the
reference relies on diffusers computing schedules in fp32 too).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    """Training-time noise schedule tables (length = num_train_timesteps)."""

    betas: jnp.ndarray            # (T,) f32
    alphas_cumprod: jnp.ndarray   # (T,) f32
    num_train_timesteps: int


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
) -> DiffusionSchedule:
    """Build the beta/alpha tables. `scaled_linear` matches SD1.5/SDXL."""
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(
            beta_start, beta_end, num_train_timesteps, dtype=np.float64
        )
    else:
        raise ValueError(f"unknown beta_schedule {beta_schedule!r}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    return DiffusionSchedule(
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        num_train_timesteps=num_train_timesteps,
    )


def inference_timesteps(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    steps_offset: int = 1,
    timestep_spacing: str = "leading",
) -> np.ndarray:
    """Descending inference timesteps.

    Matches diffusers DDPMScheduler.set_timesteps "leading" spacing with
    the SD `steps_offset=1` convention: e.g. 50 steps -> [981, 961, ..., 1].
    """
    if timestep_spacing == "leading":
        step_ratio = num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
        ts = ts.astype(np.int64) + steps_offset
    elif timestep_spacing == "trailing":
        step_ratio = num_train_timesteps / num_inference_steps
        ts = np.round(np.arange(num_train_timesteps, 0, -step_ratio)).astype(
            np.int64
        )
        ts -= 1
    else:
        raise ValueError(f"unknown timestep_spacing {timestep_spacing!r}")
    return ts.astype(np.int32)


class SamplerCoeffs(NamedTuple):
    """Per-inference-step affine coefficients for one sampler run.

        prev_x   = coef_sample[i] * x + coef_eps[i] * eps + sigma[i] * noise
        pred_x0  = x0_from_sample[i] * x + x0_from_eps[i] * eps

    Shapes all (S,) float32; `timesteps` (S,) int32 descending.
    """

    timesteps: jnp.ndarray
    coef_sample: jnp.ndarray
    coef_eps: jnp.ndarray
    sigma: jnp.ndarray
    x0_from_sample: jnp.ndarray
    x0_from_eps: jnp.ndarray
    # sqrt(alpha_cumprod[t]) / sqrt(1 - alpha_cumprod[t]) per step — used by
    # add_noise-style ops and guidance-rescale variants.
    sqrt_alpha_prod: jnp.ndarray
    sqrt_one_minus_alpha_prod: jnp.ndarray


def make_sampler_coeffs(
    schedule: DiffusionSchedule,
    num_inference_steps: int,
    kind: str = "ddpm",
    eta: float = 0.0,
    steps_offset: int = 1,
    timestep_spacing: str = "leading",
) -> SamplerCoeffs:
    """Precompute the affine step table for `kind` in {"ddpm", "ddim"}.

    DDPM (variance fixed_small, epsilon prediction, no sample clipping)
    reproduces diffusers DDPMScheduler.step as configured by the
    reference (training_utils/pipeline.py:50-59). DDIM uses the standard
    deterministic update (eta=0) for validation sampling.
    """
    T = schedule.num_train_timesteps
    acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    ts = inference_timesteps(
        num_inference_steps, T, steps_offset, timestep_spacing
    )
    step_ratio = T // num_inference_steps
    prev_ts = ts - step_ratio

    alpha_prod_t = acp[ts]
    alpha_prod_prev = np.where(prev_ts >= 0, acp[np.maximum(prev_ts, 0)], 1.0)
    beta_prod_t = 1.0 - alpha_prod_t
    current_alpha_t = alpha_prod_t / alpha_prod_prev
    current_beta_t = 1.0 - current_alpha_t

    # pred_x0 = (x - sqrt(1-acp_t) * eps) / sqrt(acp_t)
    x0_from_sample = 1.0 / np.sqrt(alpha_prod_t)
    x0_from_eps = -np.sqrt(beta_prod_t) / np.sqrt(alpha_prod_t)

    if kind == "ddpm":
        coef_x0 = np.sqrt(alpha_prod_prev) * current_beta_t / beta_prod_t
        coef_x = np.sqrt(current_alpha_t) * (1.0 - alpha_prod_prev) / beta_prod_t
        coef_sample = coef_x0 * x0_from_sample + coef_x
        coef_eps = coef_x0 * x0_from_eps
        variance = (1.0 - alpha_prod_prev) / (1.0 - alpha_prod_t) * current_beta_t
        variance = np.clip(variance, 1e-20, None)
        sigma = np.where(ts > 0, np.sqrt(variance), 0.0)
    elif kind == "ddim":
        sigma_ddim = eta * np.sqrt(
            (1.0 - alpha_prod_prev)
            / (1.0 - alpha_prod_t)
            * (1.0 - alpha_prod_t / alpha_prod_prev)
        )
        # prev = sqrt(acp_prev) * x0 + sqrt(1 - acp_prev - sigma^2) * eps
        dir_coef = np.sqrt(np.maximum(1.0 - alpha_prod_prev - sigma_ddim**2, 0.0))
        coef_sample = np.sqrt(alpha_prod_prev) * x0_from_sample
        coef_eps = np.sqrt(alpha_prod_prev) * x0_from_eps + dir_coef
        sigma = sigma_ddim
    else:
        raise ValueError(f"unknown sampler kind {kind!r}")

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return SamplerCoeffs(
        timesteps=jnp.asarray(ts, dtype=jnp.int32),
        coef_sample=f32(coef_sample),
        coef_eps=f32(coef_eps),
        sigma=f32(sigma),
        x0_from_sample=f32(x0_from_sample),
        x0_from_eps=f32(x0_from_eps),
        sqrt_alpha_prod=f32(np.sqrt(alpha_prod_t)),
        sqrt_one_minus_alpha_prod=f32(np.sqrt(beta_prod_t)),
    )


def ddpm_step_from_coeffs(
    coeffs: SamplerCoeffs,
    i: jnp.ndarray,
    sample: jnp.ndarray,
    eps: jnp.ndarray,
    noise: jnp.ndarray,
):
    """One affine sampler step at inference-step index `i` (traced scalar).

    Returns (prev_sample, pred_x0). Math in fp32, result cast back to
    sample dtype.
    """
    x = sample.astype(jnp.float32)
    e = eps.astype(jnp.float32)
    prev = (
        coeffs.coef_sample[i] * x
        + coeffs.coef_eps[i] * e
        + coeffs.sigma[i] * noise.astype(jnp.float32)
    )
    pred_x0 = coeffs.x0_from_sample[i] * x + coeffs.x0_from_eps[i] * e
    return prev.astype(sample.dtype), pred_x0.astype(sample.dtype)


def v_to_eps(
    schedule: DiffusionSchedule,
    t: jnp.ndarray,
    sample: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Convert a v-prediction model output to epsilon at timestep t
    (--prediction_type v_prediction; diffusers DDPMScheduler.step's
    `v_prediction` branch computes x0 = a*x - s*v, which equals running
    the epsilon branch with eps = a*v + s*x for a=sqrt(acp_t),
    s=sqrt(1-acp_t) — exact, so every eps-based sampler table here
    works unchanged)."""
    acp = schedule.alphas_cumprod[t].astype(jnp.float32)
    while acp.ndim < sample.ndim:
        acp = acp[..., None]
    a = jnp.sqrt(acp)
    s = jnp.sqrt(1.0 - acp)
    out = a * v.astype(jnp.float32) + s * sample.astype(jnp.float32)
    return out.astype(v.dtype)


def add_noise(
    schedule: DiffusionSchedule,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """q(x_t | x_0): sqrt(acp_t) x_0 + sqrt(1-acp_t) noise (per-sample t)."""
    acp = schedule.alphas_cumprod[t].astype(jnp.float32)
    while acp.ndim < sample.ndim:
        acp = acp[..., None]
    out = jnp.sqrt(acp) * sample.astype(jnp.float32) + jnp.sqrt(1.0 - acp) * (
        noise.astype(jnp.float32)
    )
    return out.astype(sample.dtype)


def sample_dpmpp_2m(
    eps_model,
    schedule: DiffusionSchedule,
    num_inference_steps: int,
    latents0: jnp.ndarray,
    steps_offset: int = 1,
):
    """DPM-Solver++ 2M inference sampling (deterministic).

    The reference swaps in diffusers DPMSolverMultistepScheduler for
    validation image dumps (training_script.py:428-454). This is the
    algorithm="dpmsolver++", solver_order=2, epsilon-prediction variant
    as a single `lax.scan`: data-prediction updates
        x_{i+1} = (s_{i+1}/s_i) x - a_{i+1} (e^{-h} - 1) D
    with the 2M correction D = (1 + 1/2r) x0_i - (1/2r) x0_{i-1}.
    """
    T = schedule.num_train_timesteps
    acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    ts = inference_timesteps(num_inference_steps, T, steps_offset)
    alpha = np.sqrt(acp[ts])
    sigma = np.sqrt(1.0 - acp[ts])
    lam = np.log(alpha) - np.log(sigma)
    # Terminal boundary (alpha->1, sigma->0) is singular: the final
    # update returns pred_x0 directly (diffusers' lower_order_final /
    # sigma_min behaviour).
    S = len(ts)
    timesteps = jnp.asarray(ts, jnp.int32)
    alpha_j = jnp.asarray(alpha, jnp.float32)
    sigma_j = jnp.asarray(sigma, jnp.float32)
    lam_j = jnp.asarray(lam, jnp.float32)

    def x0_of(x, eps, i):
        return (x - sigma_j[i] * eps) / alpha_j[i]

    def body(carry, i):
        x, x0_prev, lam_prev, have_prev = carry
        eps, _ = eps_model(x, timesteps[i], False)
        eps = eps.astype(jnp.float32)
        x = x.astype(jnp.float32)
        x0 = x0_of(x, eps, i)
        is_last = i == S - 1

        def final(_):
            return x0  # terminal: alpha->1, sigma->0

        def mid(_):
            h = lam_j[i + 1] - lam_j[i]
            r = (lam_j[i] - lam_prev) / h
            d2 = x0 + (x0 - x0_prev) / (2.0 * r)
            d = jnp.where(have_prev, d2, x0)
            return (
                sigma_j[i + 1] / sigma_j[i] * x
                - alpha_j[i + 1] * (jnp.exp(-h) - 1.0) * d
            )

        x_next = jax.lax.cond(is_last, final, mid, None)
        return (x_next, x0, lam_j[i], jnp.bool_(True)), None

    init = (
        latents0.astype(jnp.float32),
        jnp.zeros_like(latents0, jnp.float32),
        jnp.float32(0.0),
        jnp.bool_(False),
    )
    (x, _, _, _), _ = jax.lax.scan(body, init, jnp.arange(S))
    return x.astype(latents0.dtype)
