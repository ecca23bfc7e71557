"""Fidelity-preservation GAN tests (reference: training_utils/gan_sdxl.py)."""

import pytest

pytestmark = pytest.mark.slow  # expensive e2e jit compiles

import jax
import jax.numpy as jnp
import numpy as np

from comat_tpu.config import BLIPConfig, UNetConfig
from comat_tpu.losses.gan import (
    Discriminator,
    GanConfig,
    bce_with_logits,
    gan_d_loss,
    gan_g_loss,
)
from comat_tpu.models.blip import BLIPCaptioner
from comat_tpu.models.pipeline import DiffusionPipeline, make_pipeline_config
from comat_tpu.training.train_step import (
    TrainConfig,
    init_disc_state,
    init_train_state,
    make_d_optimizer,
    make_optimizer,
    make_train_step,
)
from tests.test_train_step import _build

K = jax.random.PRNGKey(0)


def test_bce_with_logits_matches_golden():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 5).astype(np.float32)
    y = (rng.rand(4, 5) > 0.5).astype(np.float32)
    got = float(bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
    p = 1.0 / (1.0 + np.exp(-x))
    want = float(np.mean(-(y * np.log(p) + (1 - y) * np.log(1 - p))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _tiny_disc():
    disc = Discriminator(UNetConfig.tiny(), GanConfig(lora_rank=4))
    d_params = disc.init_params(K, latent_size=8, context_dim=32)
    return disc, d_params


def test_discriminator_shapes_and_sides():
    disc, d_params = _tiny_disc()
    B = 2
    gen = jax.random.normal(K, (B, 8, 8, 4))
    gt = jax.random.normal(jax.random.fold_in(K, 1), (B, 8, 8, 4))
    ctx = jnp.zeros((B, 77, 32))
    t = jnp.ones((B,), jnp.int32)
    g = gan_g_loss(disc, d_params, gen, t, ctx)
    assert g.shape == () and np.isfinite(float(g))
    t2 = jnp.ones((2 * B,), jnp.int32)
    ctx2 = ctx
    d = gan_d_loss(disc, d_params, gen, gt, t2, ctx2)
    assert d.shape == () and np.isfinite(float(d))
    # G-loss gradient reaches the latents but not D params
    g_lat = jax.grad(lambda x: gan_g_loss(disc, d_params, x, t, ctx))(gen)
    assert float(jnp.abs(g_lat).sum()) > 0
    g_dp = jax.grad(lambda p: gan_g_loss(disc, p, gen, t, ctx))(d_params)
    assert all(
        float(jnp.abs(v).sum()) == 0 for v in jax.tree_util.tree_leaves(g_dp)
    )


def test_lastlayer_cls_variant():
    disc = Discriminator(
        UNetConfig.tiny(), GanConfig(lora_rank=4, lastlayer_cls=True)
    )
    d_params = disc.init_params(K, latent_size=8, context_dim=32)
    logits = disc.logits(
        d_params, jnp.zeros((1, 8, 8, 4)), jnp.ones((1,), jnp.int32),
        jnp.zeros((1, 77, 32)),
    )
    assert logits.shape == (1, 8, 8, 1)


def test_train_step_with_gan():
    pipe, blip, params, blip_params, batch, tcfg = _build(2)
    tcfg = type(tcfg)(**{**tcfg.__dict__, "gan_loss": True, "gan_loss_weight": 1.0})
    disc, d_params = _tiny_disc()
    opt = make_optimizer(tcfg)
    d_opt = make_d_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)
    d_state, d_frozen = init_disc_state(d_params, d_opt)
    batch = dict(batch)
    batch["gt_latents"] = jax.random.normal(K, (2, 8, 8, 4))

    step = jax.jit(
        make_train_step(pipe, blip, tcfg, opt, disc=disc, d_optimizer=d_opt)
    )
    state2, d_state2, metrics = step(
        state, frozen, blip_params, batch, jax.random.PRNGKey(3), d_state,
        d_frozen,
    )
    assert np.isfinite(float(metrics["G_loss"]))
    assert np.isfinite(float(metrics["D_loss"]))
    assert np.isfinite(float(metrics["step_loss"]))
    # D trainables moved (head bias at least)
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(d_state.trainable),
            jax.tree_util.tree_leaves(d_state2.trainable),
        )
    )
    assert moved
