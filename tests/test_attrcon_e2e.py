"""End-to-end attribute-concentration train step on tiny models:
capture -> host segmenter callback -> grounding losses -> grads."""

import pytest

pytestmark = pytest.mark.slow  # expensive e2e jit compiles

import jax
import jax.numpy as jnp
import numpy as np

from comat_tpu.segmentation.interface import (
    CenterPriorSegmenter,
    SegmenterHolder,
)
from comat_tpu.training.attrcon import (
    attrcon_batch_fields,
    make_attrcon_extra_losses,
)
from comat_tpu.training.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from comat_tpu.text.tokenizer import HashTokenizer
from tests.test_train_step import _build


def test_attrcon_train_step():
    pipe, blip, params, blip_params, batch, tcfg = _build(2)
    # switch on attrcon
    tcfg = type(tcfg)(**{**tcfg.__dict__, "attrcon": True,
                         "attrcon_train_steps": 2})
    # the tiny pipeline was built without attrcon; enable capture layers
    import dataclasses

    pipe.cfg = dataclasses.replace(pipe.cfg, attrcon=True)

    holder = SegmenterHolder(CenterPriorSegmenter(), max_words=4)
    tok = HashTokenizer(1000)
    prompts = ["a red car and a blue bird", "two cats on a mat"]
    batch = dict(batch)
    batch.update(attrcon_batch_fields(
        prompts, tok, holder, 77, resolution=tcfg.resolution
    ))

    extra = make_attrcon_extra_losses(pipe, holder, tcfg)
    opt = make_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)
    step = jax.jit(make_train_step(pipe, blip, tcfg, opt, extra_losses=extra))

    state2, _, metrics = step(
        state, frozen, blip_params, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["token_loss"]))
    assert np.isfinite(float(metrics["pixel_loss"]))
    assert np.isfinite(float(metrics["step_loss"]))
    assert float(metrics["token_loss"]) > 0
    assert float(metrics["pixel_loss"]) > 0


def test_cached_capture_pipeline_matches_fallback():
    """Pipeline-level guard for the cached-primal CAPTURE path: with a
    (trainable, frozen) partition, forward(capture=True) runs
    sampler._make_capture_only (cond-half capture forwards on gathered
    segment-entry latents); without the partition it takes the remat'd
    fallback. Values and LoRA gradients must agree through the real
    tiny UNet, with cotangents entering through BOTH the captured maps
    (grounding path) and the image (reward path). fuse_pass1=False so
    pass 1 computes eps with the same unfused arithmetic the fallback's
    segment recompute uses."""
    import dataclasses

    from comat_tpu.training.train_step import merge_params, partition_params

    pipe, blip, params, blip_params, batch, tcfg = _build(2)
    pipe.cfg = dataclasses.replace(pipe.cfg, attrcon=True)
    trainable, frozen = partition_params(params, tcfg)
    trained_idx = jnp.array([1, 4, 7])  # K=3, interval=3 of total 10
    rng = jax.random.PRNGKey(5)

    def total_loss(image, result):
        cap = sum(
            jnp.sum(v.astype(jnp.float32) ** 2)
            for v in jax.tree_util.tree_leaves(result.captured)
        )
        return jnp.mean(image.astype(jnp.float32) ** 2) + 1e-4 * cap

    def run(tr, partitioned):
        image, result = pipe.forward(
            merge_params(tr, frozen), rng,
            batch["input_ids"], batch["null_ids"], trained_idx,
            num_inference_steps=tcfg.total_step, K=tcfg.K,
            eos_positions=batch["eos_positions"],
            capture=True, fuse_pass1=False,
            trainable=tr if partitioned else None,
            frozen=frozen if partitioned else None,
        )
        return total_loss(image, result)

    v1, g1 = jax.jit(
        jax.value_and_grad(lambda tr: run(tr, True))
    )(trainable)
    v2, g2 = jax.jit(
        jax.value_and_grad(lambda tr: run(tr, False))
    )(trainable)

    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-3)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    checked = 0
    for path, leaf in flat1:
        other = flat2[path]
        a, b = np.asarray(leaf, np.float64), np.asarray(other, np.float64)
        denom = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a / denom, b / denom, atol=2e-2,
            err_msg=jax.tree_util.keystr(path),
        )
        checked += 1
    assert checked > 0
    assert float(sum(np.abs(np.asarray(l)).sum()
                     for _, l in flat1)) > 0


def test_presample_split_matches_single_program():
    """The Grounded-SAM split flow (presample program -> host masks ->
    grad program consuming eps_table/latents_traj) must reproduce the
    single-program step exactly: same rng => bitwise-same trajectory,
    so all losses match."""
    import dataclasses

    from comat_tpu.training.train_step import make_presample

    pipe, blip, params, blip_params, batch, tcfg = _build(2)
    tcfg = type(tcfg)(**{**tcfg.__dict__, "attrcon": True,
                         "attrcon_train_steps": 2})
    pipe.cfg = dataclasses.replace(pipe.cfg, attrcon=True)

    holder = SegmenterHolder(CenterPriorSegmenter(), max_words=4)
    tok = HashTokenizer(1000)
    prompts = ["a red car and a blue bird", "two cats on a mat"]
    batch = dict(batch)
    batch.update(attrcon_batch_fields(
        prompts, tok, holder, 77, resolution=tcfg.resolution
    ))

    extra = make_attrcon_extra_losses(pipe, holder, tcfg)
    opt = make_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)
    step = jax.jit(make_train_step(pipe, blip, tcfg, opt, extra_losses=extra))
    rng = jax.random.PRNGKey(3)

    _, _, m1 = step(state, frozen, blip_params, batch, rng)

    presample = jax.jit(make_presample(pipe, tcfg))
    image, eps_table, traj = presample(state, frozen, batch, rng)
    assert np.isfinite(np.asarray(image)).all()
    assert eps_table.shape[0] == tcfg.total_step
    batch2 = dict(batch)
    batch2["eps_table"] = eps_table
    batch2["latents_traj"] = traj
    _, _, m2 = step(state, frozen, blip_params, batch2, rng)

    for key in ("step_loss", "reward_blip", "token_loss", "pixel_loss"):
        np.testing.assert_allclose(
            float(m1[key]), float(m2[key]), rtol=2e-5, err_msg=key
        )
