"""Fidelity-preservation GAN: latent-space discriminator.

Reference: training_utils/gan_sdxl.py. The discriminator is a SECOND
frozen SD UNet with its own LoRA plus a tiny classification head:
either a per-latent-pixel Linear(4 -> 1) on the UNet's eps output
(:31-34) or the UNet's conv_out replaced by a 1-channel conv
(`--gan_unet_lastlayer_cls`, :27-30). Scoring runs the D-UNet at the
final inference timestep with the null-text condition (:68-78).

- G side (:50-89): BCE-with-logits of D(gen_latents) against ones —
  added to the generator loss; gradients flow through the *latents*
  into the sampler, never into D's params (structural here: D params
  are not inputs of the G loss).
- D side (:92-132): gen latents (stopped) are concatenated with
  pre-generated ground-truth latents from the dataset (labels 0 / 1)
  and only D's LoRA + head update.

Differences by design: the null-text embedding is computed once with
the shared CLIP weights (the reference instantiates D's own text
encoder just to compute the same vector, then moves it to CPU —
gan_sdxl.py:134-155).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from comat_tpu.config import UNetConfig
from comat_tpu.models.unet import UNet2DCondition


@dataclasses.dataclass(frozen=True)
class GanConfig:
    lora_rank: int = 32
    lastlayer_cls: bool = False     # --gan_unet_lastlayer_cls
    condition_discriminator: bool = False
    # --gan_model_arch differs from the generator family: the published
    # SDXL recipe runs an SD1.5-architecture D over the SDXL generator's
    # latents (scripts/sdxl.sh: gan_model_arch gansd_1_5 — latents are
    # 64x64x4 in both). D's text condition then comes from the CLIP-L
    # tower alone (768-dim), not the SDXL concat.
    cross_arch: bool = False


class DiscriminatorHead(nn.Module):
    """Linear(4 -> 1) over the channel axis (gan_sdxl.py:32-34)."""

    @nn.compact
    def __call__(self, eps: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(1, dtype=jnp.float32, name="mlp")(eps)


class Discriminator:
    """D-UNet + head bundle. Param tree: {"unet": ..., "head": ...}."""

    def __init__(self, unet_cfg: UNetConfig, gan_cfg: GanConfig):
        self.gan_cfg = gan_cfg
        if gan_cfg.lastlayer_cls:
            unet_cfg = dataclasses.replace(unet_cfg, out_channels=1)
        self.unet = UNet2DCondition(unet_cfg, lora_rank=gan_cfg.lora_rank)
        self.head = None if gan_cfg.lastlayer_cls else DiscriminatorHead()

    def init_params(self, rng, latent_size: int, context_dim: int,
                    context_len: int = 77, added_cond=None) -> Dict[str, Any]:
        k1, k2 = jax.random.split(rng)
        lat = jnp.zeros((1, latent_size, latent_size, 4))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, context_len, context_dim))
        params = {"unet": self.unet.init(k1, lat, t, ctx, added_cond)}
        if self.head is not None:
            params["head"] = self.head.init(k2, jnp.zeros((1, 2, 2, 4)))
        return params

    def logits(
        self, params, latents: jnp.ndarray, t: jnp.ndarray,
        null_context: jnp.ndarray, added_cond=None,
    ) -> jnp.ndarray:
        """(B, h, w, 1) classification logits at timestep t."""
        eps, _ = self.unet.apply(
            params["unet"], latents, t, null_context, added_cond,
            # fast=True: Pallas flash attention (custom-VJP) instead of
            # the unfused XLA path. Without it the D-update backward
            # materializes fp32 (2B, heads, 4096, 4096) attn1 probs at
            # res 64 — a 4GB temp that OOMed the 512px full-recipe step
            # and dominated the measured GAN tax.
            fast=True,
        )
        if self.head is None:
            return eps  # conv_out already emits 1 channel
        return self.head.apply(params["head"], eps.astype(jnp.float32))


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch BCEWithLogitsLoss (mean) = mean(softplus(x) - x*y)."""
    x = logits.astype(jnp.float32)
    return jnp.mean(jax.nn.softplus(x) - x * targets)


def gan_g_loss(
    disc: Discriminator, d_params, gen_latents: jnp.ndarray,
    t_final: jnp.ndarray, null_context: jnp.ndarray, added_cond=None,
) -> jnp.ndarray:
    """Generator-side loss (gan_sdxl.py:50-89): fool D toward 'real'."""
    d_params = jax.lax.stop_gradient(d_params)
    logits = disc.logits(d_params, gen_latents, t_final, null_context,
                         added_cond)
    return bce_with_logits(logits, jnp.ones_like(logits))


def gan_d_loss(
    disc: Discriminator, d_params, gen_latents: jnp.ndarray,
    gt_latents: jnp.ndarray, t_final: jnp.ndarray,
    null_context: jnp.ndarray, added_cond=None,
) -> jnp.ndarray:
    """Discriminator-side loss (gan_sdxl.py:92-132): gen=0, GT=1."""
    gen = jax.lax.stop_gradient(gen_latents)
    lat = jnp.concatenate([gen, gt_latents.astype(gen.dtype)], axis=0)
    B = gen.shape[0]
    ctx2 = jnp.concatenate([null_context, null_context], axis=0)
    ac2 = None
    if added_cond is not None:
        ac2 = {k: jnp.concatenate([v, v], axis=0) for k, v in added_cond.items()}
    logits = disc.logits(d_params, lat, t_final, ctx2, ac2)
    targets = jnp.concatenate(
        [jnp.zeros((B,) + logits.shape[1:]), jnp.ones((B,) + logits.shape[1:])],
        axis=0,
    )
    return bce_with_logits(logits, targets)
