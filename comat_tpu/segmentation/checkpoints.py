"""Checkpoint-file loaders for the segmentation stack.

The reference consumes `FastSAM-x.pt` through ultralytics and the
GroundingDINO `groundingdino_swint_ogc.pth` release through its own
loader (attr_concen_utils/gsam_interface.py:24-37). Here the torch
files are read host-side (torch CPU) and mapped onto the Flax trees via
the converters in weights_import.py / gdino_import.py.

Handled layouts:
- a raw state dict of tensors;
- {'model': state_dict} / {'state_dict': state_dict} wrappers (the
  GroundingDINO release uses 'model');
- ultralytics checkpoints whose 'model' is a pickled nn.Module
  (requires the ultralytics package to unpickle; if it is absent we
  raise with a pointer to re-export the file as a plain state dict).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _to_numpy(v):
    if hasattr(v, "detach"):  # torch tensor
        return v.detach().cpu().float().numpy()
    return np.asarray(v)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pt/.pth file into {name: np.ndarray}."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Pickled-module checkpoints (ultralytics) need full unpickling.
        try:
            obj = torch.load(path, map_location="cpu", weights_only=False)
        except ModuleNotFoundError as e:
            raise RuntimeError(
                f"{path} pickles classes from {e.name!r}, which is not "
                "installed. Re-export it as a plain state dict first: "
                "torch.save(ckpt['model'].state_dict(), out) on a "
                "machine that has the package."
            ) from e
    for key in ("model", "state_dict", "ema"):
        if isinstance(obj, dict) and key in obj and not _looks_flat(obj):
            obj = obj[key]
            break
    if hasattr(obj, "state_dict"):  # an nn.Module (ultralytics)
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        raise ValueError(f"unrecognized checkpoint layout in {path}")
    return {k: _to_numpy(v) for k, v in obj.items() if hasattr(v, "shape")}


def _looks_flat(d: dict) -> bool:
    """True if d already maps names to tensors (vs a wrapper dict)."""
    return any(hasattr(v, "shape") for v in d.values())


def load_fastsam_checkpoint(path: str, variables) -> Tuple[dict, list]:
    """FastSAM-x.pt -> YoloV8Seg variables. Returns (vars, missing)."""
    from comat_tpu.segmentation.weights_import import load_fastsam_params

    sd = load_torch_state_dict(path)
    # The converter addresses layers as "model.model.{idx}...." (the
    # raw-file naming: outer 'model' key + DetectionModel's inner
    # Sequential). A state dict taken from DetectionModel directly
    # yields "model.{idx}...." — normalize it up.
    sd = {
        ("model." + k if re.match(r"model\.\d+\.", k) else k): v
        for k, v in sd.items()
    }
    return load_fastsam_params(sd, variables)


def load_gdino_checkpoint(path: str, variables) -> Tuple[dict, list]:
    """groundingdino_swint_ogc.pth -> GroundingDetector variables."""
    from comat_tpu.segmentation.gdino_import import load_gdino_params

    return load_gdino_params(load_torch_state_dict(path), variables)
