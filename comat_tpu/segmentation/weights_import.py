"""FastSAM (ultralytics YOLOv8x-seg) weight import.

The reference loads `FastSAM-x.pt` through ultralytics
(reference: attr_concen_utils/gsam_interface.py:24-28); this converter
brings those weights into the Flax YoloV8Seg.

Maps ultralytics state-dict names (`model.model.{idx}...`) onto the
YoloV8Seg param tree. Layer-index assignment follows the yolov8-seg
yaml: backbone 0-9, neck 10-21 (upsample/concat layers own no params),
Segment head = 22 (cv2=box, cv3=cls, cv4=mask-coeff branches, proto).

Layout transforms: torch conv OIHW -> flax HWIO; ConvTranspose IOHW ->
flax HWIO WITH a spatial tap flip (torch scatters the kernel, flax
correlates it); BatchNorm running stats land in the `batch_stats`
collection.

Value-validated against an independent torch YOLOv8-seg twin carrying
ultralytics' exact state-dict naming (parity.check_fastsam /
tests/test_fastsam.py); the real FastSAM-x.pt file itself is absent in
zero-egress environments.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np

# our module name -> ultralytics layer index
_LAYER_IDX = {
    "stem": 0, "down1": 1, "c2f1": 2, "down2": 3, "c2f2": 4,
    "down3": 5, "c2f3": 6, "down4": 7, "c2f4": 8, "sppf": 9,
    "up_c2f4": 12, "up_c2f3": 15, "dn_conv3": 16, "dn_c2f4": 18,
    "dn_conv4": 19, "dn_c2f5": 21,
}
_HEAD = 22


def _conv(x):
    return np.transpose(np.asarray(x), (2, 3, 1, 0))


def _convT(x):  # torch ConvTranspose2d weight (I, O, kh, kw)
    # flax ConvTranspose CORRELATES the (kh, kw, I, O) kernel across the
    # fractionally-strided input, while torch ConvTranspose2d computes
    # the conv gradient (scatter) — equal only after flipping the
    # spatial taps (value-verified vs torch in parity.check_fastsam).
    return np.ascontiguousarray(
        np.transpose(np.asarray(x), (2, 3, 0, 1))[::-1, ::-1]
    )


def _id(x):
    return np.asarray(x)


def _convbn(base: str, sub: Tuple[str, ...], collection: str):
    """Map a ConvBNSiLU param path under `base` (ultralytics Conv)."""
    leaf = sub[-1]
    if sub[0] == "conv":
        return f"{base}.conv.weight", _conv
    if sub[0] == "bn":
        if collection == "batch_stats":
            n = "running_mean" if leaf == "mean" else "running_var"
            return f"{base}.bn.{n}", _id
        n = "weight" if leaf == "scale" else "bias"
        return f"{base}.bn.{n}", _id
    return None


def _c2f(base: str, sub: Tuple[str, ...], collection: str):
    top = sub[0]
    if top in ("cv1", "cv2"):
        return _convbn(f"{base}.{top}", sub[1:], collection)
    m = re.fullmatch(r"m(\d+)", top)
    if m:
        return _convbn(
            f"{base}.m.{m.group(1)}.{sub[1]}", sub[2:], collection
        )
    return None


def fastsam_hf_name(
    path: Tuple[str, ...], collection: str = "params"
) -> Optional[Tuple[str, Callable]]:
    """Our param path (collection root stripped) -> (ultralytics name,
    transform)."""
    p = list(path)
    top = p[0]
    leaf = p[-1]

    if top in _LAYER_IDX:
        base = f"model.model.{_LAYER_IDX[top]}"
        if top.startswith(("c2f", "up_c2f", "dn_c2f")):
            return _c2f(base, tuple(p[1:]), collection)
        if top == "sppf":
            return _convbn(f"{base}.{p[1]}", tuple(p[2:]), collection)
        return _convbn(base, tuple(p[1:]), collection)

    hb = f"model.model.{_HEAD}"
    m = re.fullmatch(r"(box|cls|mc)(\d)_(cv1|cv2|out)", top)
    if m:
        branch = {"box": "cv2", "cls": "cv3", "mc": "cv4"}[m.group(1)]
        lvl = m.group(2)
        stage = {"cv1": "0", "cv2": "1", "out": "2"}[m.group(3)]
        base = f"{hb}.{branch}.{lvl}.{stage}"
        if m.group(3) == "out":
            if leaf == "kernel":
                return f"{base}.weight", _conv
            return f"{base}.bias", _id
        return _convbn(base, tuple(p[1:]), collection)
    m = re.fullmatch(r"proto_(cv1|cv2|cv3|up)", top)
    if m:
        which = m.group(1)
        if which == "up":
            if leaf == "kernel":
                return f"{hb}.proto.upsample.weight", _convT
            return f"{hb}.proto.upsample.bias", _id
        return _convbn(f"{hb}.proto.{which}", tuple(p[1:]), collection)
    return None


def load_fastsam_params(state_dict: Dict[str, np.ndarray], variables):
    """Fill a YoloV8Seg variables dict ({'params', 'batch_stats'}) from
    an ultralytics state dict (torch tensors or numpy arrays)."""
    missing = []

    def make_fill(collection):
        def fill(path, leaf):
            keys = [
                str(getattr(q, "key", getattr(q, "name", q))) for q in path
            ]
            res = fastsam_hf_name(tuple(keys), collection)
            if res is None:
                missing.append(f"{collection}:{'/'.join(keys)}")
                return leaf
            name, f = res
            if name not in state_dict:
                missing.append(f"{collection}:{'/'.join(keys)} -> {name}")
                return leaf
            arr = f(state_dict[name]).astype(np.asarray(leaf).dtype)
            assert arr.shape == leaf.shape, (name, arr.shape, leaf.shape)
            return jax.numpy.asarray(arr)

        return fill

    out = dict(variables)
    for coll in ("params", "batch_stats"):
        if coll in variables:
            out[coll] = jax.tree_util.tree_map_with_path(
                make_fill(coll), variables[coll]
            )
    return out, missing
