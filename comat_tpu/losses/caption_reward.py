"""Concept-matching reward: frozen BLIP caption cross-entropy.

Reference: concept_mat_utils/caption_blip.py — images are resized to
384x384 bicubic (antialiased), CLIP-normalized, captions are
"a photography of " + prompt.lower(), labels mask padding and the
prompt prefix with -100, and the reward is minus the LM loss
(:33-58). The vendored BlipProcessor skips image preprocessing so the
*differentiable* image tensor flows straight in
(concept_mat_utils/processing_blip.py:106) — here the resize+normalize
are jitted alongside the VAE decode instead, fusing the whole reward
path into one XLA program.

Host-side caption/label construction lives in `build_caption_batch`
(tokenization is per-prompt string work, outside the jit boundary).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)
CAPTION_PREFIX = "a photography of"
IGNORE_INDEX = -100


def blip_preprocess(image01: jnp.ndarray, size: int = 384) -> jnp.ndarray:
    """(B, H, W, 3) in [0,1] -> resized 384^2, CLIP-normalized. Bicubic
    with antialiasing, matching torchvision Resize(antialias=True)
    (caption_blip.py:33-36). Differentiable."""
    B, H, W, C = image01.shape
    x = jax.image.resize(
        image01.astype(jnp.float32), (B, size, size, C), method="bicubic",
        antialias=True,
    )
    mean = jnp.asarray(CLIP_IMAGE_MEAN, dtype=jnp.float32)
    std = jnp.asarray(CLIP_IMAGE_STD, dtype=jnp.float32)
    return (x - mean) / std


def crop_jitter(
    image: jnp.ndarray, offset_x: jnp.ndarray, offset_y: jnp.ndarray,
    size: int,
) -> jnp.ndarray:
    """Random crop jitter before the reward (training_script.py:606-611):
    image[:, ox:ox+size, oy:oy+size, :] with traced offsets (the
    reference crops NCHW dims 2,3 = our NHWC dims 1,2)."""
    B, H, W, C = image.shape
    return jax.lax.dynamic_slice(
        image,
        (jnp.int32(0), offset_x.astype(jnp.int32), offset_y.astype(jnp.int32),
         jnp.int32(0)),
        (B, size, size, C),
    )


def build_caption_batch(
    tokenizer, prompts, prompt_length: Optional[int] = None
) -> Dict[str, np.ndarray]:
    """Host-side: tokenize "a photography of " + prompt.lower(), build
    labels with pad + prefix masking (caption_blip.py:47-54)."""
    texts = [f"{CAPTION_PREFIX} {p.lower()}" for p in prompts]
    batch = tokenizer(texts, padding="longest")
    ids, mask = batch["input_ids"], batch["attention_mask"]
    if prompt_length is None:
        # len(tokenizer(prefix).input_ids) - 1 (caption_blip.py:39)
        prefix_ids = tokenizer([CAPTION_PREFIX], padding="longest")["input_ids"]
        prompt_length = int(prefix_ids.shape[1]) - 1
    labels = np.where(mask == 1, ids, IGNORE_INDEX)
    labels[:, :prompt_length] = IGNORE_INDEX
    return {
        "input_ids": ids.astype(np.int32),
        "attention_mask": mask.astype(np.int32),
        "labels": labels.astype(np.int32),
    }


def blip_caption_reward(
    blip_module,
    blip_params,
    image01: jnp.ndarray,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    labels: jnp.ndarray,
) -> jnp.ndarray:
    """reward = -caption_loss (scalar). Differentiable w.r.t. image01;
    BLIP params are frozen by construction (caller stop-gradients or
    simply never optimizes them)."""
    pixel_values = blip_preprocess(image01, blip_module.cfg.image_size)
    loss = blip_module.apply(
        blip_params, pixel_values, input_ids, attention_mask, labels
    )
    return -loss


class RewardRegistry:
    """Multi-reward registry (reference CaptionModelWrapper,
    training_script.py:69-97): named caption models with weights whose
    rewards sum into 'total'. Like the reference, only 'Blip' has an
    implementation; additional reward models register with
    (module, apply_fn) pairs.
    """

    def __init__(self):
        self._models = {}

    def register(self, name: str, module, weight: float,
                 apply_fn=None) -> None:
        self._models[name] = (module, weight, apply_fn)

    @property
    def names(self):
        return list(self._models)

    def __call__(self, params_by_name, image01, batch):
        rewards = {}
        total = 0.0
        for name, (module, weight, apply_fn) in self._models.items():
            if apply_fn is None:
                r = blip_caption_reward(
                    module, params_by_name[name], image01,
                    batch["caption_ids"], batch["caption_mask"],
                    batch["caption_labels"],
                )
            else:
                r = apply_fn(module, params_by_name[name], image01, batch)
            rewards[name] = r
            total = total + weight * r
        rewards["total"] = total
        return rewards
