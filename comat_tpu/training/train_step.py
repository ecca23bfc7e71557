"""The jitted CoMat train step.

One XLA program per optimizer step, covering the reference's entire
per-step pipeline (training_script.py:543-694): K-schedule sampling ->
two-pass differentiable generation -> VAE decode -> crop jitter ->
BLIP reward (-> GAN G loss -> grounding losses) -> backward -> AdamW on
the LoRA subtree -> metrics. Data parallelism comes from input
shardings (parallel/mesh.py); the gradient mean over the mesh is
XLA-inserted.

Gradient surface: the generator's trainable subtree (LoRA by default)
is *partitioned out* of the frozen params before `jax.grad`, so no
cotangents are materialized for frozen weights (the reference instead
relies on requires_grad=False). The reference's image-gradient hook
(training_script.py:644-651) — recording ||dL/dimage|| and optionally
renormalizing it (--norm_grad) — is reproduced with a custom_vjp
gradient tap, computed exactly: only the caption reward backpropagates
through the decoded image (GAN flows through latents, grounding through
attention maps), so dL/dimage = w * d(-reward)/dimage.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from comat_tpu.models.lora import trainable_mask
from comat_tpu.models.pipeline import DiffusionPipeline
from comat_tpu.losses.caption_reward import blip_caption_reward, crop_jitter


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirror of the reference flag surface that reaches the hot loop
    (training_utils/arguments.py; defaults = scripts/sd15.sh)."""

    total_step: int = 50            # --total_step (denoise steps)
    K: int = 5                      # --K (trained steps)
    guidance_scale: float = 7.5     # --cfg_scale
    guidance_rescale: float = 0.0   # --cfg_rescale
    resolution: int = 512
    reward_weight: float = 1.0      # --reward_weights[0] ('Blip')
    learning_rate: float = 5e-5
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    adam_weight_decay: float = 1e-2
    max_grad_norm: float = 0.1
    norm_grad: bool = False         # --norm_grad
    train_text_encoder: bool = False
    gan_loss: bool = False
    gan_loss_weight: float = 1.0
    attrcon: bool = False
    attrcon_train_steps: int = 2
    mask_token_loss_weight: float = 1e-3
    mask_pixel_loss_weight: float = 5e-5
    gradient_accumulation_steps: int = 1

    @property
    def interval(self) -> int:
        return self.total_step // self.K


class TrainState(NamedTuple):
    step: jnp.ndarray
    trainable: Any     # LoRA (+ optionally text-enc) params
    frozen: Any        # same structure, complementary leaves
    opt_state: Any


def partition_params(params) -> Tuple[Any, Any]:
    """Split into (trainable, frozen) trees with None placeholders."""
    mask = trainable_mask(params)
    trainable = jax.tree_util.tree_map(
        lambda m, p: p if m else None, mask, params
    )
    frozen = jax.tree_util.tree_map(
        lambda m, p: None if m else p, mask, params
    )
    return trainable, frozen


def merge_params(trainable, frozen):
    return jax.tree_util.tree_map(
        lambda a, b: a if a is not None else b, trainable, frozen,
        is_leaf=lambda x: x is None,
    )


@jax.custom_vjp
def _grad_tap(x, factor):
    return x


def _grad_tap_fwd(x, factor):
    return x, factor


def _grad_tap_bwd(factor, g):
    return g * factor, None


_grad_tap.defvjp(_grad_tap_fwd, _grad_tap_bwd)


def make_optimizer(cfg: TrainConfig, lr_schedule=None) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            lr_schedule if lr_schedule is not None else cfg.learning_rate,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.adam_weight_decay,
        ),
    )


def init_train_state(
    params, cfg: TrainConfig, optimizer: optax.GradientTransformation
) -> TrainState:
    trainable, frozen = partition_params(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        opt_state=optimizer.init(trainable),
    )


def sample_trained_idx(rng: jnp.ndarray, cfg: TrainConfig) -> jnp.ndarray:
    """K-step gradient schedule (training_script.py:563-566): uniform
    stride `interval` with random start in [0, max_start]."""
    interval = cfg.interval
    max_start = cfg.total_step - interval * (cfg.K - 1) - 1
    start = jax.random.randint(rng, (), 0, max_start + 1)
    return start + interval * jnp.arange(cfg.K)


def make_train_step(
    pipeline: DiffusionPipeline,
    blip_module,
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    extra_losses: Optional[Callable] = None,
):
    """Build the jitted train step.

    extra_losses(merged_params, batch, image, result, rng) ->
    (loss_add, metrics_dict) — hook for GAN G-loss / grounding losses,
    added in their own milestones without touching this core.
    """

    def loss_fn(trainable, frozen, blip_params, batch, rng):
        params = merge_params(trainable, frozen)
        rngs = jax.random.split(rng, 4)
        trained_idx = sample_trained_idx(rngs[0], cfg)

        image, result = pipeline.forward(
            params,
            rngs[1],
            batch["input_ids"],
            batch["null_ids"],
            trained_idx,
            num_inference_steps=cfg.total_step,
            K=cfg.K,
            guidance_scale=cfg.guidance_scale,
            guidance_rescale=cfg.guidance_rescale,
            eos_positions=batch.get("eos_positions"),
            input_ids2=batch.get("input_ids2"),
            train_text_encoder=cfg.train_text_encoder,
            capture=cfg.attrcon,
        )

        # ---- reward-gradient tap (training_script.py:644-651) ----
        # reward_norm = w * ||d caption_loss/d image||, computed exactly
        # with a BLIP-only backward on a stopped image copy.
        def caption_loss_of_image(img):
            r = blip_caption_reward(
                blip_module, blip_params, img,
                batch["caption_ids"], batch["caption_mask"],
                batch["caption_labels"],
            )
            return -(cfg.reward_weight * r)

        # crop jitter (training_script.py:606-611)
        offset_range = cfg.resolution // 224
        ox = jax.random.randint(rngs[2], (), 0, offset_range + 1)
        oy = jax.random.randint(rngs[3], (), 0, offset_range + 1)
        size = cfg.resolution - offset_range
        cropped = crop_jitter(image, ox, oy, size)

        reward_norm = jnp.linalg.norm(
            jax.grad(caption_loss_of_image)(
                jax.lax.stop_gradient(cropped)
            ).astype(jnp.float32)
        )
        factor = jnp.where(
            cfg.norm_grad, 1e4 / jnp.maximum(reward_norm, 1e-12), 1.0
        )
        tapped = _grad_tap(cropped, factor)

        reward = blip_caption_reward(
            blip_module, blip_params, tapped,
            batch["caption_ids"], batch["caption_mask"],
            batch["caption_labels"],
        )
        total_reward = cfg.reward_weight * reward
        loss = -total_reward  # training_script.py:618

        metrics = {
            "reward_blip": reward,
            "reward_total": total_reward,
            "reward_norm": reward_norm,
        }
        if extra_losses is not None:
            add, extra_metrics = extra_losses(params, batch, image, result, rng)
            loss = loss + add
            metrics.update(extra_metrics)
        metrics["step_loss"] = loss
        return loss, metrics

    def train_step(state: TrainState, blip_params, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, state.frozen, blip_params, batch, rng
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.trainable
        )
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(
            step=state.step + 1,
            trainable=trainable,
            frozen=state.frozen,
            opt_state=opt_state,
        )
        return new_state, metrics

    return train_step
