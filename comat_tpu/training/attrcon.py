"""Attribute-concentration wiring for the train step.

Builds the `extra_losses` hook: chooses the attrcon step subset
(reference: random.choices(training_steps, k=attrcon_train_steps) —
training_script.py:590) as (A,) with-replacement draws into the K
trained segments. Capture runs ONLY at those A segments (the sampler
receives the same draws as `capture_idx`), and duplicate draws get
weight 0 in the grounding loss via `dedup_draw_weights` — matching the
reference, where repeated draws collapse to one dict entry per
timestep. The hook evaluates the grounding losses on the captured
attention maps against per-noun segmentation masks.

Masks arrive as an explicit batch input (`batch["seg_masks"]`,
(B, max_words, H, W) uint8/float), NOT through an in-graph host
callback: the axon TPU PJRT relay does not support
pure_callback/io_callback, and masks are frozen constants anyway (the
reference wraps get_mask in no_grad, gsam_interface.py:54). For
image-independent segmenters (CenterPrior, precomputed stores) the
masks are computed at batch-build time; for the image-dependent
Grounded-SAM segmenter the trainer runs the no-grad presample program
first, segments its decoded image on host, and feeds the masks into
the grad program (training/trainer.py).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from comat_tpu.losses.grounding import comat_grounding_loss, dedup_draw_weights
from comat_tpu.segmentation.interface import SegmenterHolder
from comat_tpu.text.linguistics import extract_attribute_groups, pad_groups


def sample_attrcon_draws(rng, cfg) -> jnp.ndarray:
    """The (A,) with-replacement draws into the K trained segments
    (reference training_script.py:590). Shared derivation: the train
    step passes these to pipeline.forward as `capture_idx` (capture
    runs ONLY at these segments) and the extra-losses hook re-derives
    them bitwise from the same rng for the dedup weights."""
    A = min(cfg.attrcon_train_steps, cfg.K)
    return jax.random.randint(
        jax.random.fold_in(rng, 0xA77C), (A,), 0, cfg.K
    )


def make_attrcon_extra_losses(pipeline, holder: SegmenterHolder, cfg):
    def extra(params, batch, image, result, rng):
        draws = sample_attrcon_draws(rng, cfg)
        weights = dedup_draw_weights(draws)
        masks = jax.lax.stop_gradient(
            batch["seg_masks"].astype(jnp.float32)
        )
        token_loss, pixel_loss = comat_grounding_loss(
            result.captured,
            weights,
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
    resolution: Optional[int] = None,
):
    """Host-side: extract attribute groups, align to CLIP tokens, pad,
    arm the segmenter holder with this batch's nouns, and — when the
    segmenter is image-independent (CenterPrior / precomputed stores
    ignore the pixels; `resolution` sizes the zero placeholder image) —
    add `seg_masks` (uint8, (B, W, H, W)) now. Image-dependent
    segmenters (Grounded-SAM) get their masks later, from the decoded
    presample image, via `holder.host_masks` in the trainer — this
    function runs BEFORE the presample program (its noun arming is what
    the segmenter consumes), so it can never see the image itself."""
    groups = [
        extract_attribute_groups(p, tokenizer, max_length) for p in prompts
    ]
    padded = pad_groups(groups, max_words=holder.max_words)
    holder.set_batch(padded.pop("nouns"))
    if resolution is not None and not holder.image_dependent:
        B = len(prompts)
        padded["seg_masks"] = holder.host_masks(
            np.zeros((B, resolution, resolution, 3), np.float32)
        ).astype(np.uint8)
    return padded
