"""Attribute-concentration wiring for the train step.

Builds the `extra_losses` hook: chooses the attrcon step subset
(reference: random.choices(training_steps, k=attrcon_train_steps) —
training_script.py:590; with-replacement draws collapse to distinct
timesteps in the attn dict, reproduced here by scattering 1s into a
(K,) mask), fetches per-noun masks through the host segmenter bridge,
and evaluates the grounding losses on the captured attention maps.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from comat_tpu.losses.grounding import comat_grounding_loss
from comat_tpu.segmentation.interface import SegmenterHolder
from comat_tpu.text.linguistics import extract_attribute_groups, pad_groups


def make_attrcon_extra_losses(pipeline, holder: SegmenterHolder, cfg):
    def extra(params, batch, image, result, rng):
        K = cfg.K
        A = min(cfg.attrcon_train_steps, K)
        draws = jax.random.randint(
            jax.random.fold_in(rng, 0xA77C), (A,), 0, K
        )
        step_mask = jnp.zeros((K,), jnp.float32).at[draws].set(1.0)
        masks = holder.device_masks(image)
        token_loss, pixel_loss = comat_grounding_loss(
            result.captured,
            step_mask,
            masks,
            batch["token_idx"],
            batch["token_valid"],
            batch["word_valid"],
            # maps arrive cond-half-only from the eps model (guidance
            # slices at the source)
            cond_offset=0,
            capture_layers=pipeline.cfg.capture_layers,
        )
        add = (
            cfg.mask_token_loss_weight * token_loss
            + cfg.mask_pixel_loss_weight * pixel_loss
        )
        return add, {"token_loss": token_loss, "pixel_loss": pixel_loss}

    return extra


def attrcon_batch_fields(
    prompts: List[str], tokenizer, holder: SegmenterHolder,
    max_length: int = 77,
):
    """Host-side: extract attribute groups, align to CLIP tokens, pad,
    and arm the segmenter holder with this batch's nouns."""
    groups = [
        extract_attribute_groups(p, tokenizer, max_length) for p in prompts
    ]
    padded = pad_groups(groups, max_words=holder.max_words)
    holder.set_batch(padded.pop("nouns"))
    return padded
