"""FastSAM (YOLOv8-seg) in Flax — the mask-proposal model.

The reference drives ultralytics' torch FastSAM-x for
segment-everything proposals (reference: attr_concen_utils/
gsam_interface.py:1,24-28,64-74), then selects per-noun masks by
box prompt (:111-137). TPU-native equivalent: the YOLOv8-seg forward
pass as a jit-compiled Flax model (inference-only — the model is
frozen), plus host-side decode/NMS/box_prompt in
`decode_predictions` / `box_prompt_masks` (ragged, tiny work).

Geometry is parameterized by (depth, width, ratio) so FastSAM-x
(d=1.0, w=1.25, r=1.0) and tiny test configs share the code.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class YoloSegConfig:
    depth: float = 1.0       # block repeats multiplier
    width: float = 1.25      # channel multiplier
    max_channels: int = 512
    num_classes: int = 1     # FastSAM: single "object" class
    num_masks: int = 32      # mask coefficients
    reg_max: int = 16        # DFL bins
    dtype: jnp.dtype = jnp.bfloat16

    def ch(self, c: int) -> int:
        return int(min(c, self.max_channels) * self.width)

    def n(self, n: int) -> int:
        return max(1, round(n * self.depth))

    @staticmethod
    def fastsam_x() -> "YoloSegConfig":
        return YoloSegConfig()

    @staticmethod
    def tiny() -> "YoloSegConfig":
        return YoloSegConfig(
            depth=0.34, width=0.125, max_channels=256, num_masks=8,
            reg_max=4, dtype=jnp.float32,
        )


class ConvBNSiLU(nn.Module):
    out: int
    k: int = 1
    s: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.k // 2
        x = nn.Conv(self.out, (self.k, self.k), strides=(self.s, self.s),
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.97, dtype=self.dtype, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBNSiLU(self.out, 3, dtype=self.dtype, name="cv1")(x)
        h = ConvBNSiLU(self.out, 3, dtype=self.dtype, name="cv2")(h)
        return x + h if self.shortcut and x.shape[-1] == self.out else h


class C2f(nn.Module):
    out: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.out // 2
        y = ConvBNSiLU(2 * c, 1, dtype=self.dtype, name="cv1")(x)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(c, self.shortcut, self.dtype, name=f"m{i}")(
                    parts[-1]
                )
            )
        return ConvBNSiLU(self.out, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1)
        )


class SPPF(nn.Module):
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 2
        x = ConvBNSiLU(c, 1, dtype=self.dtype, name="cv1")(x)
        pools = [x]
        for _ in range(3):
            pools.append(
                nn.max_pool(pools[-1], (5, 5), strides=(1, 1),
                            padding=((2, 2), (2, 2)))
            )
        return ConvBNSiLU(self.out, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1)
        )


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")


class YoloV8Seg(nn.Module):
    """Returns per-level (box_dist, cls_logit, mask_coeff) + protos."""

    cfg: YoloSegConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray):
        cfg = self.cfg
        dt = cfg.dtype
        ch = cfg.ch
        x = image.astype(dt)
        # backbone
        x = ConvBNSiLU(ch(64), 3, 2, dt, name="stem")(x)        # /2
        x = ConvBNSiLU(ch(128), 3, 2, dt, name="down1")(x)      # /4
        x = C2f(ch(128), cfg.n(3), True, dt, name="c2f1")(x)
        x = ConvBNSiLU(ch(256), 3, 2, dt, name="down2")(x)      # /8
        p3 = C2f(ch(256), cfg.n(6), True, dt, name="c2f2")(x)
        x = ConvBNSiLU(ch(512), 3, 2, dt, name="down3")(p3)     # /16
        p4 = C2f(ch(512), cfg.n(6), True, dt, name="c2f3")(x)
        x = ConvBNSiLU(ch(512), 3, 2, dt, name="down4")(p4)     # /32
        x = C2f(ch(512), cfg.n(3), True, dt, name="c2f4")(x)
        p5 = SPPF(ch(512), dt, name="sppf")(x)
        # neck (PAN)
        u4 = C2f(ch(512), cfg.n(3), False, dt, name="up_c2f4")(
            jnp.concatenate([_upsample2(p5), p4], axis=-1)
        )
        u3 = C2f(ch(256), cfg.n(3), False, dt, name="up_c2f3")(
            jnp.concatenate([_upsample2(u4), p3], axis=-1)
        )
        d4 = C2f(ch(512), cfg.n(3), False, dt, name="dn_c2f4")(
            jnp.concatenate(
                [ConvBNSiLU(ch(256), 3, 2, dt, name="dn_conv3")(u3), u4],
                axis=-1,
            )
        )
        d5 = C2f(ch(512), cfg.n(3), False, dt, name="dn_c2f5")(
            jnp.concatenate(
                [ConvBNSiLU(ch(512), 3, 2, dt, name="dn_conv4")(d4), p5],
                axis=-1,
            )
        )
        feats = [u3, d4, d5]  # strides 8, 16, 32

        # proto masks from P3 (ultralytics Proto: cv1 -> ConvTranspose
        # k2s2 -> cv2 -> cv3; widths/ops match for weight import)
        cp = ch(256)
        pr = ConvBNSiLU(cp, 3, dtype=dt, name="proto_cv1")(u3)
        pr = nn.ConvTranspose(cp, (2, 2), strides=(2, 2), dtype=dt,
                              name="proto_up")(pr)
        pr = ConvBNSiLU(cp, 3, dtype=dt, name="proto_cv2")(pr)
        protos = ConvBNSiLU(cfg.num_masks, 1, dtype=dt,
                            name="proto_cv3")(pr).astype(jnp.float32)

        # Segment head widths per ultralytics: derived from the FIRST
        # level's channels for all levels
        ch0 = feats[0].shape[-1]
        c2 = max(16, ch0 // 4, cfg.reg_max * 4)
        c3 = max(ch0, min(cfg.num_classes, 100))
        c4 = max(ch0 // 4, cfg.num_masks)
        outs = []
        for i, f in enumerate(feats):
            box = ConvBNSiLU(c2, 3, dtype=dt, name=f"box{i}_cv1")(f)
            box = ConvBNSiLU(c2, 3, dtype=dt, name=f"box{i}_cv2")(box)
            box = nn.Conv(4 * cfg.reg_max, (1, 1), dtype=jnp.float32,
                          name=f"box{i}_out")(box)
            cls = ConvBNSiLU(c3, 3, dtype=dt, name=f"cls{i}_cv1")(f)
            cls = ConvBNSiLU(c3, 3, dtype=dt, name=f"cls{i}_cv2")(cls)
            cls = nn.Conv(cfg.num_classes, (1, 1), dtype=jnp.float32,
                          name=f"cls{i}_out")(cls)
            mc = ConvBNSiLU(c4, 3, dtype=dt, name=f"mc{i}_cv1")(f)
            mc = ConvBNSiLU(c4, 3, dtype=dt, name=f"mc{i}_cv2")(mc)
            mc = nn.Conv(cfg.num_masks, (1, 1), dtype=jnp.float32,
                         name=f"mc{i}_out")(mc)
            outs.append({"box": box, "cls": cls, "mc": mc})
        return outs, protos


def decode_predictions(
    outs, protos, cfg: YoloSegConfig, conf_thresh: float = 0.4,
    iou_thresh: float = 0.9, max_det: int = 100,
) -> List[Dict[str, np.ndarray]]:
    """Host-side decode: DFL box integral + NMS + mask assembly.

    Returns per-image dicts {boxes (N,4 xyxy px), scores (N,),
    masks (N, H/4, W/4) binary}; mirrors ultralytics postprocess +
    FastSAM 'everything' results consumed by box_prompt
    (gsam_interface.py:64-74,118-125).
    """
    nm, reg = cfg.num_masks, cfg.reg_max
    results = []
    B = protos.shape[0]
    protos = np.asarray(protos, np.float32)
    for b in range(B):
        all_boxes, all_scores, all_mc = [], [], []
        for lvl, o in enumerate(outs):
            stride = 8 * 2 ** lvl
            box = np.asarray(o["box"][b], np.float32)   # (h, w, 4*reg)
            cls = np.asarray(o["cls"][b], np.float32)
            mc = np.asarray(o["mc"][b], np.float32)
            h, w = box.shape[:2]
            prob = 1.0 / (1.0 + np.exp(-cls))
            ys, xs = np.where(prob.max(-1) > conf_thresh)
            if len(ys) == 0:
                continue
            d = box[ys, xs].reshape(-1, 4, reg)
            d = np.exp(d - d.max(-1, keepdims=True))
            d /= d.sum(-1, keepdims=True)
            dist = (d * np.arange(reg)).sum(-1)  # (N, 4) l,t,r,b
            cx, cy = xs + 0.5, ys + 0.5
            x1 = (cx - dist[:, 0]) * stride
            y1 = (cy - dist[:, 1]) * stride
            x2 = (cx + dist[:, 2]) * stride
            y2 = (cy + dist[:, 3]) * stride
            all_boxes.append(np.stack([x1, y1, x2, y2], -1))
            all_scores.append(prob[ys, xs].max(-1))
            all_mc.append(mc[ys, xs])
        if not all_boxes:
            results.append({"boxes": np.zeros((0, 4)),
                            "scores": np.zeros((0,)),
                            "masks": np.zeros((0,) + protos.shape[1:3])})
            continue
        boxes = np.concatenate(all_boxes)
        scores = np.concatenate(all_scores)
        mcs = np.concatenate(all_mc)
        keep = _nms(boxes, scores, iou_thresh)[:max_det]
        boxes, scores, mcs = boxes[keep], scores[keep], mcs[keep]
        masks = 1.0 / (
            1.0 + np.exp(-(protos[b].reshape(-1, nm) @ mcs.T))
        )  # (hw, N)
        ph, pw = protos.shape[1:3]
        masks = masks.T.reshape(-1, ph, pw)
        # crop to boxes (proto res is input/4)
        for i, (x1, y1, x2, y2) in enumerate(boxes / 4.0):
            m = np.zeros((ph, pw), np.float32)
            xa, xb = max(int(x1), 0), min(int(np.ceil(x2)), pw)
            ya, yb = max(int(y1), 0), min(int(np.ceil(y2)), ph)
            m[ya:yb, xa:xb] = masks[i, ya:yb, xa:xb]
            masks[i] = m
        results.append(
            {"boxes": boxes, "scores": scores, "masks": masks > 0.5}
        )
    return results


def _nms(boxes: np.ndarray, scores: np.ndarray, iou: float) -> np.ndarray:
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a_r = (boxes[rest, 2] - boxes[rest, 0]) * (
            boxes[rest, 3] - boxes[rest, 1]
        )
        ious = inter / np.maximum(a_i + a_r - inter, 1e-9)
        order = rest[ious <= iou]
    return np.asarray(keep, np.int64)


def box_prompt_masks(
    result: Dict[str, np.ndarray], query_box_xyxy: Sequence[float],
    image_hw: Tuple[int, int],
) -> np.ndarray:
    """FastSAM box_prompt: pick the proposal mask with max IoU against
    the query box (reference gsam_interface.py:118-125 semantics).
    Returns a (H, W) binary mask (upsampled from proto res)."""
    masks = result["masks"]
    H, W = image_hw
    if len(masks) == 0:
        return np.zeros((H, W), np.float32)
    ph, pw = masks.shape[1:]
    qx1, qy1, qx2, qy2 = np.asarray(query_box_xyxy, np.float32)
    q = np.array([qx1 * pw / W, qy1 * ph / H, qx2 * pw / W, qy2 * ph / H])
    q_area = max((q[2] - q[0]) * (q[3] - q[1]), 1e-9)
    best, best_iou = 0, -1.0
    ys, xs = np.mgrid[0:ph, 0:pw]
    inside = (
        (xs + 0.5 >= q[0]) & (xs + 0.5 <= q[2])
        & (ys + 0.5 >= q[1]) & (ys + 0.5 <= q[3])
    )
    for i, m in enumerate(masks):
        inter = float((m & inside).sum())
        union = float(m.sum()) + q_area - inter
        iou = inter / max(union, 1e-9)
        if iou > best_iou:
            best, best_iou = i, iou
    full = np.asarray(
        jax.image.resize(
            jnp.asarray(masks[best], jnp.float32), (H, W), method="nearest"
        )
    )
    return (full > 0.5).astype(np.float32)
