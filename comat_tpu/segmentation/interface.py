"""Segmentation interface: per-noun GT masks for the grounding loss.

Reference: attr_concen_utils/gsam_interface.py — FastSAM proposes masks,
GroundingDINO grounds each noun to boxes, box_prompt unions the masks
per noun (:64-137), all frozen/no-grad (:54).

The mask models are frozen and OUTSIDE the differentiated graph (the
reference wraps get_mask in no_grad), and the axon TPU PJRT relay does
not support host callbacks inside a jitted program — so masks cross
the jit boundary as explicit batch inputs, not pure_callback results:

  - image-INdependent segmenters (CenterPrior, precomputed stores):
    masks computed at batch-build time (training/attrcon.py);
  - image-dependent Grounded-SAM: the trainer runs the no-grad
    presample program (pass-1 sampling + VAE decode), pulls the
    (B, H, W, 3) image to host, calls the segmenter, and feeds the
    (B, W_max, H, W) masks into the grad program. Pass-1 replay makes
    the presampled tables reusable, so sampling is not paid twice.

Nouns are host-side strings, carried by a mutable per-step holder
(strings cannot cross the jit boundary).

Implementations:
  - `CenterPriorSegmenter`: dependency-free fallback — a soft center
    box per noun (undetected nouns in the reference get all-zero masks;
    a center prior is the equivalent weight-free behavior for smoke
    training).
  - `PrecomputedMaskSegmenter`: masks from a prompt-keyed store
    (offline FastSAM/GroundingDINO runs).
  - `GroundedSAMSegmenter` (segmentation/grounded_sam.py): the
    JAX-native GroundingDINO + FastSAM ports, wired by the trainer for
    `--seg_model gsam` (training/trainer.py) via this same protocol.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class SegmenterHolder:
    """Mutable bridge state: the trainer sets nouns before each step;
    the pure_callback reads them during the step."""

    def __init__(self, segmenter, max_words: int = 8):
        self.segmenter = segmenter
        self.max_words = max_words
        self.nouns: List[List[str]] = []

    @property
    def image_dependent(self) -> bool:
        """True when masks depend on the generated pixels (Grounded-SAM)
        — requiring the presample program; CenterPrior / precomputed
        stores only look at the noun strings."""
        return bool(getattr(self.segmenter, "image_dependent", False))

    def set_batch(self, nouns_per_sample: List[List[str]]):
        self.nouns = nouns_per_sample

    def host_masks(self, images01: np.ndarray) -> np.ndarray:
        B, H, W, _ = images01.shape
        out = np.zeros((B, self.max_words, H, W), np.float32)
        nouns = self.nouns if self.nouns else [[] for _ in range(B)]
        batch_fn = getattr(self.segmenter, "batch", None)
        if batch_fn is not None and B > 1:
            # one batched device invocation for the whole batch —
            # through the axon relay, per-image calls cost seconds of
            # transport each (grounded_sam.py batch docstring)
            all_masks = batch_fn(
                images01,
                [nouns[b] if b < len(nouns) else [] for b in range(B)],
            )
            for b in range(B):
                for w, m in enumerate(all_masks[b][: self.max_words]):
                    out[b, w] = m
            return out
        for b in range(min(B, len(nouns))):
            masks = self.segmenter(images01[b], nouns[b])
            for w, m in enumerate(masks[: self.max_words]):
                out[b, w] = m
        return out

    def device_masks(self, image: jnp.ndarray) -> jnp.ndarray:
        """pure_callback bridge — CPU/GPU only (the axon TPU relay
        rejects host callbacks at execute time; the trainer uses the
        explicit batch-input path instead). Kept for host-platform
        experimentation. image (B, H, W, 3) in [0,1]."""
        B, H, W, _ = image.shape
        img = jax.lax.stop_gradient(jnp.clip(image, 0.0, 1.0))
        return jax.pure_callback(
            self.host_masks,
            jax.ShapeDtypeStruct((B, self.max_words, H, W), jnp.float32),
            img,
            vmap_method="sequential",
        )


class CenterPriorSegmenter:
    """Weight-free fallback: one soft center box per noun."""

    def __call__(self, image01: np.ndarray, nouns: Sequence[str]) -> List[np.ndarray]:
        H, W, _ = image01.shape
        n = len(nouns)
        masks = []
        for i in range(n):
            m = np.zeros((H, W), np.float32)
            # tile nouns horizontally across the center band
            x0 = int(W * (0.1 + 0.8 * i / max(n, 1)))
            x1 = int(W * (0.1 + 0.8 * (i + 1) / max(n, 1)))
            y0, y1 = int(H * 0.2), int(H * 0.8)
            m[y0:y1, x0:x1] = 1.0
            masks.append(m)
        return masks


class PrecomputedMaskSegmenter:
    """Masks from an .npz store keyed by noun string (offline
    segmentation runs)."""

    def __init__(self, npz_path: str):
        self.store = np.load(npz_path)

    def __call__(self, image01: np.ndarray, nouns: Sequence[str]) -> List[np.ndarray]:
        H, W, _ = image01.shape
        out = []
        for n in nouns:
            if n in self.store:
                m = self.store[n].astype(np.float32)
                if m.shape != (H, W):
                    from PIL import Image

                    m = np.asarray(
                        Image.fromarray((m * 255).astype(np.uint8)).resize(
                            (W, H)
                        ),
                        np.float32,
                    ) / 255.0
                out.append((m > 0.5).astype(np.float32))
            else:
                out.append(np.zeros((H, W), np.float32))
        return out
