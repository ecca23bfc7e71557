"""Two-pass sampler tests.

The decisive test: gradients from the two-pass design must equal the
gradients of an unrolled loop implementing the reference's grad-toggle
semantics directly (TrainableSDPipeline.py:132-185 with the trainer's
hardcoded flags) — stop_gradient on the UNet output at non-trained
steps, full gradients at trained steps, scheduler chain attached.
"""

import pytest

pytestmark = pytest.mark.slow  # expensive e2e jit compiles

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comat_tpu.diffusion import make_schedule, make_sampler_coeffs
from comat_tpu.diffusion.sampler import (
    sample_comat,
    sample_inference,
    _step_noise,
)
from comat_tpu.diffusion.schedulers import ddpm_step_from_coeffs

S, K = 10, 3
INTERVAL = S // K  # 3, so interval*K = 9 < 10 — exercises the tail path


def _make_eps_model(w):
    """Tiny nonlinear eps model: per-pixel channel mixing."""

    def eps_model(x, t, capture=False):
        h = jnp.tanh(x @ w)
        eps = h @ w.T
        captured = {"probe": jnp.sum(h, axis=(1, 2, 3))} if capture else {}
        return eps, captured

    return eps_model


@pytest.fixture(scope="module")
def setup():
    schedule = make_schedule()
    coeffs = make_sampler_coeffs(schedule, S, kind="ddpm")
    k = jax.random.PRNGKey(7)
    w = jax.random.normal(jax.random.fold_in(k, 1), (4, 4)) * 0.3
    x0 = jax.random.normal(jax.random.fold_in(k, 2), (2, 8, 8, 4))
    rng = jax.random.fold_in(k, 3)
    return coeffs, w, x0, rng


def _reference_unrolled(coeffs, w, x0, rng, trained_set):
    """Unrolled python loop with the reference's gradient semantics."""
    eps_model = _make_eps_model(w)
    x = x0
    for i in range(S):
        eps, _ = eps_model(x, coeffs.timesteps[i])
        if i not in trained_set:
            eps = jax.lax.stop_gradient(eps)
        noise = _step_noise(rng, jnp.asarray(i), x.shape, jnp.float32)
        x, _ = ddpm_step_from_coeffs(coeffs, jnp.asarray(i), x, eps, noise)
    return x


@pytest.mark.parametrize("start", [0, 1, 3])
def test_values_match_inference(setup, start):
    coeffs, w, x0, rng = setup
    trained = jnp.arange(start, start + K * INTERVAL, INTERVAL)
    res = sample_comat(
        _make_eps_model(w), coeffs, x0, rng, trained, INTERVAL
    )
    x_inf, eps_table, traj = sample_inference(
        _make_eps_model(w), coeffs, x0, rng
    )
    np.testing.assert_allclose(
        np.asarray(res.latents), np.asarray(x_inf), atol=1e-4
    )
    assert res.eps_table.shape == (S, 2, 8, 8, 4)
    assert res.latents_traj.shape == (S, 2, 8, 8, 4)


@pytest.mark.parametrize("start", [0, 2])
def test_grads_match_reference_semantics(setup, start):
    coeffs, w, x0, rng = setup
    trained = jnp.arange(start, start + K * INTERVAL, INTERVAL)
    trained_set = set(range(start, start + K * INTERVAL, INTERVAL))

    def loss_twopass(w_):
        res = sample_comat(
            _make_eps_model(w_), coeffs, x0, rng, trained, INTERVAL
        )
        return (res.latents ** 2).mean()

    def loss_ref(w_):
        x = _reference_unrolled(coeffs, w_, x0, rng, trained_set)
        return (x ** 2).mean()

    v1, g1 = jax.value_and_grad(loss_twopass)(w)
    v2, g2 = jax.value_and_grad(loss_ref)(w)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=1e-6)
    assert float(jnp.abs(g1).sum()) > 0


def test_grads_zero_when_no_influence(setup):
    """Sanity: latents BEFORE the first trained step carry no param
    gradient (matches reference :133)."""
    coeffs, w, x0, rng = setup
    trained = jnp.arange(2, 2 + K * INTERVAL, INTERVAL)

    def first_entry(w_):
        res = sample_comat(
            _make_eps_model(w_), coeffs, x0, rng, trained, INTERVAL
        )
        return (res.latents_traj[2] ** 2).mean()

    g = jax.grad(first_entry)(w)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)


def test_capture_stacks_over_trained_steps(setup):
    coeffs, w, x0, rng = setup
    trained = jnp.arange(0, K * INTERVAL, INTERVAL)
    res = sample_comat(
        _make_eps_model(w), coeffs, x0, rng, trained, INTERVAL, capture=True
    )
    assert res.captured["probe"].shape == (K, 2)
    # captured values are differentiable w.r.t. w
    g = jax.grad(
        lambda w_: sample_comat(
            _make_eps_model(w_), coeffs, x0, rng, trained, INTERVAL,
            capture=True,
        ).captured["probe"].sum()
    )(w)
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.parametrize("start", [0, 2])
def test_cached_primal_matches_plain_path(setup, start):
    """Cached-primal replay (diff_eps_model + diff_tree) must be
    bitwise-value and gradient-equivalent to the remat replay path."""
    coeffs, w, x0, rng = setup
    trained = jnp.arange(start, start + K * INTERVAL, INTERVAL)

    def diff_eps_model(d, aux, x, t):
        eps, _ = _make_eps_model(d["w"])(x, t, False)
        return eps + 0.0 * aux["c"]

    def loss_cached(w_):
        res = sample_comat(
            _make_eps_model(w_), coeffs, x0, rng, trained, INTERVAL,
            diff_eps_model=diff_eps_model, diff_tree={"w": w_},
            aux_tree={"c": jnp.zeros(())},
        )
        return (res.latents ** 2).mean()

    def loss_plain(w_):
        res = sample_comat(
            _make_eps_model(w_), coeffs, x0, rng, trained, INTERVAL
        )
        return (res.latents ** 2).mean()

    # jit matters: custom_vjp closure bugs (tracer leaks) only surface
    # when the transpose is traced under an outer jit
    v1, g1 = jax.jit(jax.value_and_grad(loss_cached))(w)
    v2, g2 = jax.value_and_grad(loss_plain)(w)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-8
    )
    assert float(jnp.abs(g1).sum()) > 0


@pytest.mark.parametrize("start", [0, 2])
def test_cached_capture_matches_plain_capture_path(setup, start):
    """The cached-primal CAPTURE path (_make_capture_only on gathered
    entry latents) must match the remat fallback in values AND
    gradients, with cotangents entering through BOTH the captured maps
    (grounding-loss path) and the final latents (reward/GAN path)."""
    coeffs, w, x0, rng = setup
    trained = jnp.arange(start, start + K * INTERVAL, INTERVAL)

    def diff_capture_primal(d, aux, x, t):
        _, cap = _make_eps_model(d["w"])(x, t, True)
        return jax.tree_util.tree_map(lambda a: a + 0.0 * aux["c"], cap)

    def diff_eps_model(d, aux, x, t):
        eps, _ = _make_eps_model(d["w"])(x, t, False)
        return eps + 0.0 * aux["c"]

    def combined_loss(res):
        return (res.latents ** 2).mean() + 0.1 * res.captured["probe"].sum()

    def loss_cached(w_):
        res = sample_comat(
            _make_eps_model(w_), coeffs, x0, rng, trained, INTERVAL,
            capture=True,
            diff_eps_model=diff_eps_model, diff_tree={"w": w_},
            aux_tree={"c": jnp.zeros(())},
            diff_capture_primal=diff_capture_primal,
        )
        return combined_loss(res)

    def loss_plain(w_):
        res = sample_comat(
            _make_eps_model(w_), coeffs, x0, rng, trained, INTERVAL,
            capture=True,
        )
        return combined_loss(res)

    v1, g1 = jax.jit(jax.value_and_grad(loss_cached))(w)
    v2, g2 = jax.value_and_grad(loss_plain)(w)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-8
    )
    assert float(jnp.abs(g1).sum()) > 0


@pytest.mark.parametrize("cap_segments", [(0, 2), (1, 1)])
def test_capture_idx_subset_matches_unrolled_reference(setup, cap_segments):
    """capture_idx: maps are captured ONLY at the chosen A segments
    (leading dim A), and the joint gradient (latents-loss + probe-loss
    at the chosen steps) matches an unrolled loop with the reference's
    semantics — capture at the attrcon-chosen trained steps only
    (AttrConcenTrainableSDPipeline.py:159-167). The (1, 1) case checks
    duplicate draws: the unrolled reference's timestep-keyed dict
    collapses them, mirrored by dedup weights."""
    from comat_tpu.losses.grounding import dedup_draw_weights

    coeffs, w, x0, rng = setup
    start = 1
    trained = jnp.arange(start, start + K * INTERVAL, INTERVAL)
    cap_idx = jnp.asarray(cap_segments)
    weights = dedup_draw_weights(cap_idx)

    def diff_capture_primal(d, aux, x, t):
        _, cap = _make_eps_model(d["w"])(x, t, True)
        return jax.tree_util.tree_map(lambda a: a + 0.0 * aux["c"], cap)

    def diff_eps_model(d, aux, x, t):
        eps, _ = _make_eps_model(d["w"])(x, t, False)
        return eps + 0.0 * aux["c"]

    def loss_twopass(w_):
        res = sample_comat(
            _make_eps_model(w_), coeffs, x0, rng, trained, INTERVAL,
            capture=True,
            diff_eps_model=diff_eps_model, diff_tree={"w": w_},
            aux_tree={"c": jnp.zeros(())},
            diff_capture_primal=diff_capture_primal,
            capture_idx=cap_idx,
        )
        assert res.captured["probe"].shape == (len(cap_segments), 2)
        probe = (weights[:, None] * res.captured["probe"]).sum()
        return (res.latents ** 2).mean() + 0.1 * probe

    def loss_ref(w_):
        """Unrolled loop: probes taken at the distinct chosen trained
        steps (dict-collapse semantics)."""
        eps_model = _make_eps_model(w_)
        cap_steps = {start + INTERVAL * int(c) for c in cap_segments}
        trained_set = set(int(t) for t in trained)
        x = x0
        probe = 0.0
        for i in range(S):
            eps, cap = eps_model(x, coeffs.timesteps[i], i in cap_steps)
            if i in cap_steps:
                probe = probe + cap["probe"].sum()
            if i not in trained_set:
                eps = jax.lax.stop_gradient(eps)
            noise = _step_noise(rng, jnp.asarray(i), x.shape, jnp.float32)
            x, _ = ddpm_step_from_coeffs(
                coeffs, jnp.asarray(i), x, eps, noise
            )
        return (x ** 2).mean() + 0.1 * probe

    v1, g1 = jax.jit(jax.value_and_grad(loss_twopass))(w)
    v2, g2 = jax.value_and_grad(loss_ref)(w)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=1e-6
    )
    assert float(jnp.abs(g1).sum()) > 0


def test_cached_primal_x0_grad_zero(setup):
    """Reference semantics hold on the cached path too: the initial
    latent is consumed by the stop-gradient pass 1 only, so it carries
    no gradient (TrainableSDPipeline.py:133)."""
    coeffs, w, x0, rng = setup
    trained = jnp.arange(1, 1 + K * INTERVAL, INTERVAL)

    def diff_eps_model(d, aux, x, t):
        eps, _ = _make_eps_model(d["w"])(x, t, False)
        return eps + 0.0 * aux["c"]

    def loss(x0_):
        res = sample_comat(
            _make_eps_model(w), coeffs, x0_, rng, trained, INTERVAL,
            diff_eps_model=diff_eps_model, diff_tree={"w": w},
            aux_tree={"c": jnp.zeros(())},
        )
        return (res.latents ** 2).mean()

    g = jax.grad(loss)(x0)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)


def test_generate_dpmpp_pipeline_integration():
    """pipeline.generate(kind='dpmpp') end-to-end on the tiny pipeline."""
    import numpy as np
    from comat_tpu.models.pipeline import (
        DiffusionPipeline, make_pipeline_config,
    )
    from comat_tpu.text.tokenizer import HashTokenizer

    pcfg = make_pipeline_config("sd_1_5", lora_rank=0, resolution=64,
                                tiny=True)
    pipe = DiffusionPipeline(pcfg)
    k = jax.random.PRNGKey(0)
    params = pipe.init_params(k)
    tok = HashTokenizer(1000)
    enc = tok(["a cat"], max_length=pcfg.text.max_length)
    null = tok([""], max_length=pcfg.text.max_length)
    img = pipe.generate(
        params, k, jnp.asarray(enc["input_ids"]),
        jnp.asarray(null["input_ids"]),
        num_inference_steps=8, kind="dpmpp",
        eos_positions=jnp.asarray(enc["eos_positions"]),
    )
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
