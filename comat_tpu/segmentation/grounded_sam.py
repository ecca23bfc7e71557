"""Grounded-SAM segmenter: GroundingDetector boxes + FastSAM masks.

Composition mirroring the reference GsamSegModel.get_mask
(attr_concen_utils/gsam_interface.py:54-137): detect boxes for
' . '.join(nouns), select mask proposals by box prompt, union per noun;
undetected nouns yield all-zero masks (:132-133). Implements the
SegmenterHolder protocol (segmentation/interface.py); being
image-dependent, the trainer feeds it the presample program's decoded
image on host and passes the resulting masks into the grad program as
batch inputs (no in-graph callback — unsupported on the axon TPU relay).

Both models run jitted on device from the host call site (frozen,
no gradients). With random weights the masks are noise — weight import
(FastSAM-x .pt, GroundingDINO swin-t checkpoint) is the remaining
parity step, tracked for the next round.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from comat_tpu.segmentation.fastsam import (
    YoloSegConfig,
    YoloV8Seg,
    box_prompt_masks,
    decode_predictions,
)
from comat_tpu.segmentation.gdino import (
    GDinoConfig,
    GroundingDetector,
    cxcywh_to_xyxy,
    ground_nouns,
)


class GroundedSAMSegmenter:
    # masks depend on the generated pixels -> the trainer must run the
    # presample program and segment its image between the two jitted
    # programs (see segmentation/interface.py docstring)
    image_dependent = True

    def __init__(
        self,
        sam_cfg: Optional[YoloSegConfig] = None,
        gdino_cfg: Optional[GDinoConfig] = None,
        tokenizer=None,
        rng=None,
        sam_params=None,
        gdino_params=None,
        image_size: int = 512,
        box_threshold: float = 0.3,
        text_threshold: float = 0.25,
        gdino_resize: Optional[int] = None,
    ):
        """`gdino_resize`: GroundingDINO input side length — the
        reference resizes to 800 and ImageNet-normalizes
        (gsam_interface.py:39-45); FastSAM runs at the native image size
        (imgsz=(width, height), :67). The trainer passes 800; None
        (default) feeds DINO natively — right for tiny test configs."""
        from comat_tpu.text.tokenizer import HashTokenizer

        self.sam_cfg = sam_cfg or YoloSegConfig.fastsam_x()
        self.gdino_cfg = gdino_cfg or GDinoConfig()
        self.tokenizer = tokenizer or HashTokenizer(
            self.gdino_cfg.text_vocab
        )
        self.box_threshold = box_threshold
        self.text_threshold = text_threshold
        self.sam = YoloV8Seg(self.sam_cfg)
        self.gdino = GroundingDetector(self.gdino_cfg)
        self.gdino_resize = gdino_resize
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        img = jnp.zeros((1, image_size, image_size, 3))
        gsize = gdino_resize or image_size
        gimg = jnp.zeros((1, gsize, gsize, 3))
        ids = jnp.zeros((1, self.gdino_cfg.max_text_len), jnp.int32)
        mask = jnp.ones((1, self.gdino_cfg.max_text_len), bool)
        self.sam_params = sam_params or self.sam.init(rng, img)
        self.gdino_params = gdino_params or self.gdino.init(
            jax.random.fold_in(rng, 1), gimg, ids, mask
        )
        self._sam_apply = jax.jit(self.sam.apply)
        self._gdino_apply = jax.jit(self.gdino.apply)

    def _tokenize_nouns(self, nouns: Sequence[str]):
        """' . '-joined caption + per-noun token spans
        (gsam_interface.py:92-100), plus GroundingDINO's per-phrase
        text self-attention mask / restarted position ids."""
        from comat_tpu.segmentation.gdino import build_text_masks

        text = " . ".join(nouns)
        ids = self.tokenizer.tokenize(text)
        spans = []
        pos = 0
        for noun in nouns:
            n_toks = len(self.tokenizer.tokenize(noun))
            spans.append((pos, pos + n_toks))
            pos += n_toks + 1  # the ' . ' separator token
        sep = getattr(self.tokenizer, "sep_token_id", None)
        if sep is not None:
            ids = ids + [sep]   # terminate the last phrase before pads
        L = self.gdino_cfg.max_text_len
        ids = (ids + [0] * L)[:L]
        mask = [i < min(pos, L) for i in range(L)]
        ids_np = np.asarray([ids], np.int32)
        period = self.tokenizer.tokenize(".")
        special = {getattr(self.tokenizer, "cls_token_id", -1),
                   getattr(self.tokenizer, "sep_token_id", -1)}
        if len(period) == 1:
            special.add(period[0])
        special.discard(-1)
        self_mask, pos_ids = build_text_masks(ids_np, sorted(special))
        return (
            ids_np,
            np.asarray([mask], bool),
            self_mask,
            pos_ids,
            spans,
        )

    def batch(
        self, images01: np.ndarray,
        nouns_list: Sequence[Sequence[str]],
    ) -> List[List[np.ndarray]]:
        """Segment a whole batch with ONE GroundingDINO call + ONE
        FastSAM call (vs two device round-trips per image). Through the
        axon relay each device call costs seconds of transport (the r5
        sweep measured 12.2s of per-step mask time at bs2, dominated by
        round-trips, not the ~0.3 TF of arithmetic), so batching nearly
        halves the per-step gsam mask cost. Images with no nouns yield
        empty mask lists (matching __call__'s early return); results
        are identical to per-image calls (test_grounded_sam.py)."""
        from comat_tpu.segmentation.gdino import build_text_masks

        B, H, W, _ = images01.shape
        L = self.gdino_cfg.max_text_len
        per = []
        for b in range(B):
            nouns = list(nouns_list[b]) if b < len(nouns_list) else []
            if nouns:
                ids, tmask, self_mask, pos_ids, spans = (
                    self._tokenize_nouns(nouns)
                )
            else:
                # placeholder row: no phrases -> no grounded boxes; the
                # text mask keeps one live token so attention stays
                # well-defined
                ids = np.zeros((1, L), np.int32)
                tmask = np.zeros((1, L), bool)
                tmask[0, 0] = True
                self_mask, pos_ids = build_text_masks(ids, [])
                spans = []
            per.append((nouns, ids, tmask, self_mask, pos_ids, spans))

        imgs = jnp.asarray(images01, jnp.float32)
        gimg = imgs
        if self.gdino_resize and (H, W) != (self.gdino_resize,) * 2:
            s = self.gdino_resize
            gimg = jax.image.resize(gimg, (B, s, s, 3), method="bilinear")
        mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
        std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
        gimg = (gimg - mean) / std
        ids = np.concatenate([p[1] for p in per])
        tmask = np.concatenate([p[2] for p in per])
        self_mask = np.concatenate([p[3] for p in per])
        pos_ids = np.concatenate([p[4] for p in per])
        boxes, token_logits = self._gdino_apply(
            self.gdino_params, gimg, jnp.asarray(ids),
            jnp.asarray(tmask), jnp.asarray(self_mask),
            jnp.asarray(pos_ids),
        )
        outs, protos = self._sam_apply(self.sam_params, imgs)
        proposals_all = decode_predictions(outs, protos, self.sam_cfg)
        boxes_np = np.asarray(boxes, np.float32)
        logits_np = np.asarray(token_logits, np.float32)

        result: List[List[np.ndarray]] = []
        for b in range(B):
            nouns, _, _, _, _, spans = per[b]
            if not nouns:
                result.append([])
                continue
            grounded = ground_nouns(
                boxes_np[b], logits_np[b], spans,
                self.box_threshold, self.text_threshold,
            )
            proposals = proposals_all[b]
            masks: List[np.ndarray] = []
            for ni in range(len(nouns)):
                if ni not in grounded:
                    masks.append(np.zeros((H, W), np.float32))
                    continue
                union = np.zeros((H, W), np.float32)
                for box in grounded[ni]:
                    xyxy = cxcywh_to_xyxy(box, W, H)
                    union = np.maximum(
                        union, box_prompt_masks(proposals, xyxy, (H, W))
                    )
                masks.append(union)
            result.append(masks)
        return result

    def __call__(self, image01: np.ndarray, nouns: Sequence[str]) -> List[np.ndarray]:
        H, W, _ = image01.shape
        if not nouns:
            return []
        img = jnp.asarray(image01, jnp.float32)[None]
        # DINO preprocessing (reference gsam_interface.py:39-45,84):
        # resize shorter side to 800 (square images -> 800x800) and
        # ImageNet-normalize; boxes come back normalized cxcywh, so no
        # coordinate mapping is needed afterwards.
        gimg = img
        if self.gdino_resize and (H, W) != (self.gdino_resize,) * 2:
            s = self.gdino_resize
            gimg = jax.image.resize(gimg, (1, s, s, 3), method="bilinear")
        mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
        std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
        gimg = (gimg - mean) / std
        ids, tmask, self_mask, pos_ids, spans = self._tokenize_nouns(nouns)
        boxes, token_logits = self._gdino_apply(
            self.gdino_params, gimg, jnp.asarray(ids), jnp.asarray(tmask),
            jnp.asarray(self_mask), jnp.asarray(pos_ids),
        )
        grounded = ground_nouns(
            np.asarray(boxes[0], np.float32),
            np.asarray(token_logits[0], np.float32),
            spans, self.box_threshold, self.text_threshold,
        )
        outs, protos = self._sam_apply(self.sam_params, img)
        proposals = decode_predictions(outs, protos, self.sam_cfg)[0]

        masks: List[np.ndarray] = []
        for ni in range(len(nouns)):
            if ni not in grounded:
                masks.append(np.zeros((H, W), np.float32))
                continue
            union = np.zeros((H, W), np.float32)
            for box in grounded[ni]:
                xyxy = cxcywh_to_xyxy(box, W, H)
                union = np.maximum(
                    union, box_prompt_masks(proposals, xyxy, (H, W))
                )
            masks.append(union)
        return masks
