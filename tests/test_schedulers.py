"""Scheduler parity tests.

Golden reference: the diffusers DDPMScheduler formulas (as configured by
/root/reference/training_utils/pipeline.py:50-59 — variance fixed_small,
epsilon prediction, clip_sample False, scaled_linear 0.00085..0.012,
steps_offset 1, leading spacing), re-derived here step-by-step in numpy
so parity is checked against an independent implementation rather than
our own coefficient tables.
"""

import numpy as np
import jax
import jax.numpy as jnp

from comat_tpu.diffusion import (
    make_schedule,
    make_sampler_coeffs,
    ddpm_step_from_coeffs,
    add_noise,
)
from comat_tpu.diffusion.schedulers import inference_timesteps


def _golden_tables(T=1000, b0=0.00085, b1=0.012):
    betas = np.linspace(b0**0.5, b1**0.5, T, dtype=np.float64) ** 2
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    return betas, acp


def _golden_ddpm_step(sample, eps, t, prev_t, acp, noise):
    alpha_prod_t = acp[t]
    alpha_prod_prev = acp[prev_t] if prev_t >= 0 else 1.0
    beta_prod_t = 1.0 - alpha_prod_t
    current_alpha_t = alpha_prod_t / alpha_prod_prev
    current_beta_t = 1.0 - current_alpha_t
    pred_x0 = (sample - beta_prod_t**0.5 * eps) / alpha_prod_t**0.5
    coef_x0 = (alpha_prod_prev**0.5 * current_beta_t) / beta_prod_t
    coef_x = (current_alpha_t**0.5 * (1.0 - alpha_prod_prev)) / beta_prod_t
    prev = coef_x0 * pred_x0 + coef_x * sample
    if t > 0:
        variance = max(
            (1.0 - alpha_prod_prev) / (1.0 - alpha_prod_t) * current_beta_t,
            1e-20,
        )
        prev = prev + variance**0.5 * noise
    return prev, pred_x0


def test_inference_timesteps_leading_offset():
    ts = inference_timesteps(50, 1000, steps_offset=1)
    assert ts[0] == 981 and ts[-1] == 1
    assert len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_ddpm_step_matches_golden():
    rng = np.random.RandomState(0)
    schedule = make_schedule()
    S = 50
    coeffs = make_sampler_coeffs(schedule, S, kind="ddpm")
    _, acp = _golden_tables()

    sample = rng.randn(2, 4, 8, 8).astype(np.float32)
    eps = rng.randn(2, 4, 8, 8).astype(np.float32)
    noise = rng.randn(2, 4, 8, 8).astype(np.float32)

    ts = np.asarray(coeffs.timesteps)
    for i in [0, 10, 25, 49]:
        t = int(ts[i])
        prev_t = t - 1000 // S
        got_prev, got_x0 = ddpm_step_from_coeffs(
            coeffs, jnp.asarray(i), jnp.asarray(sample), jnp.asarray(eps),
            jnp.asarray(noise),
        )
        want_prev, want_x0 = _golden_ddpm_step(
            sample.astype(np.float64), eps.astype(np.float64), t, prev_t,
            acp, noise.astype(np.float64),
        )
        np.testing.assert_allclose(np.asarray(got_prev), want_prev, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_x0), want_x0, atol=2e-5)


def test_ddim_step_deterministic_and_terminal():
    schedule = make_schedule()
    coeffs = make_sampler_coeffs(schedule, 50, kind="ddim")
    assert np.allclose(np.asarray(coeffs.sigma), 0.0)
    # Final step: alpha_prod_prev == 1 -> prev == pred_x0 exactly.
    sample = jnp.ones((1, 2, 2, 4))
    eps = 0.5 * jnp.ones((1, 2, 2, 4))
    prev, x0 = ddpm_step_from_coeffs(
        coeffs, jnp.asarray(49), sample, eps, jnp.zeros_like(sample)
    )
    np.testing.assert_allclose(np.asarray(prev), np.asarray(x0), atol=1e-6)


def test_add_noise_matches_golden():
    schedule = make_schedule()
    _, acp = _golden_tables()
    rng = np.random.RandomState(1)
    x0 = rng.randn(3, 2, 2, 4).astype(np.float32)
    noise = rng.randn(3, 2, 2, 4).astype(np.float32)
    t = np.array([0, 500, 999], dtype=np.int32)
    got = add_noise(schedule, jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t))
    want = (
        np.sqrt(acp[t])[:, None, None, None] * x0
        + np.sqrt(1 - acp[t])[:, None, None, None] * noise
    )
    np.testing.assert_allclose(np.asarray(got), want.astype(np.float32), atol=2e-5)


def test_ddpm_step_is_affine():
    """The two-pass differentiable replay relies on step affinity."""
    schedule = make_schedule()
    coeffs = make_sampler_coeffs(schedule, 10, kind="ddpm")
    k = jax.random.PRNGKey(0)
    x1, x2, e1, e2, n = [
        jax.random.normal(jax.random.fold_in(k, j), (1, 4, 4, 4))
        for j in range(5)
    ]
    f = lambda x, e: ddpm_step_from_coeffs(coeffs, jnp.asarray(3), x, e, n)[0]
    # affine jointly in (x, e): f(a*(x1,e1) + b*(x2,e2)) = a f + b f when a+b=1
    lhs = f(0.3 * x1 + 0.7 * x2, 0.3 * e1 + 0.7 * e2)
    rhs = 0.3 * f(x1, e1) + 0.7 * f(x2, e2)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_dpmpp_2m_converges_to_x0():
    """With an oracle eps-model (exact noise for a known x0), DPM++ 2M
    must recover x0 (validation-sampler sanity)."""
    from comat_tpu.diffusion.schedulers import sample_dpmpp_2m

    schedule = make_schedule()
    acp = schedule.alphas_cumprod
    x0_true = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4),
                          jnp.float32)

    def eps_model(x, t, capture):
        a = jnp.sqrt(acp[t])
        s = jnp.sqrt(1.0 - acp[t])
        return (x - a * x0_true) / s, {}

    k = jax.random.PRNGKey(0)
    x_T = jax.random.normal(k, x0_true.shape)
    out = sample_dpmpp_2m(eps_model, schedule, 20, x_T)
    err = float(jnp.abs(out - x0_true).max())
    assert err < 5e-2, err


def test_v_to_eps_inverts_v_parameterization():
    """v = a*eps - s*x0 and x_t = a*x0 + s*eps  =>  v_to_eps(t, x_t, v)
    recovers eps exactly (--prediction_type v_prediction support)."""
    import jax
    import jax.numpy as jnp
    from comat_tpu.diffusion.schedulers import v_to_eps

    schedule = make_schedule()
    k = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.fold_in(k, 1), (2, 4, 4, 4))
    eps = jax.random.normal(jax.random.fold_in(k, 2), (2, 4, 4, 4))
    t = jnp.asarray([7, 541], jnp.int32)
    acp = schedule.alphas_cumprod[t][:, None, None, None]
    a, s = jnp.sqrt(acp), jnp.sqrt(1.0 - acp)
    x_t = a * x0 + s * eps
    v = a * eps - s * x0
    got = v_to_eps(schedule, t, x_t, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(eps),
                               rtol=1e-5, atol=1e-6)
