"""Metrics + logging.

Reference (training_utils/logging.py + accelerate trackers): per-process
log formatting, file log on the main process, tensorboard scalars.
Here: python logging + a JSONL metrics writer (always available) + a
tensorboard writer when the package exists (it is not in this image),
keyed the same as the reference (train_loss, step_loss, lr, reward
breakdown, G/D loss, token/pixel loss, reward_norm —
training_script.py:667-706).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax


def set_logger(output_dir: Optional[str] = None) -> logging.Logger:
    fmt = (
        f"%(asctime)s [proc {jax.process_index()}] "
        "%(levelname)s %(name)s: %(message)s"
    )
    logging.basicConfig(level=logging.INFO, format=fmt)
    logger = logging.getLogger("comat_tpu")
    if output_dir and jax.process_index() == 0:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "log.txt"))
        fh.setFormatter(logging.Formatter(fmt))
        logger.addHandler(fh)
    return logger


class MetricsWriter:
    """JSONL scalar stream (+ optional tensorboard)."""

    def __init__(self, output_dir: str, logging_dir: str = "logs"):
        self.is_main = jax.process_index() == 0
        self.f = None
        self.tb = None
        self._img_dir = None
        if not self.is_main:
            return
        os.makedirs(output_dir, exist_ok=True)
        self.f = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._img_dir = os.path.join(output_dir, "validation_images")
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self.tb = SummaryWriter(os.path.join(output_dir, logging_dir))
        except Exception:
            self.tb = None

    def log(self, metrics: Dict[str, float], step: int) -> None:
        if not self.is_main:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), step)

    def log_images(self, tag: str, images, step: int,
                   output_dir: Optional[str] = None) -> None:
        """NHWC float[0,1] images -> tensorboard (if available) + PNG
        dumps (validation grids, training_script.py:485-489)."""
        if not self.is_main:
            return
        import numpy as np

        arr = np.clip(np.asarray(images, np.float32), 0, 1)
        if self.tb is not None:
            self.tb.add_images(tag, arr.transpose(0, 3, 1, 2), step)
        if output_dir or self._img_dir:
            out = output_dir or self._img_dir
            os.makedirs(out, exist_ok=True)
            try:
                from PIL import Image

                for i, im in enumerate((arr * 255).astype(np.uint8)):
                    Image.fromarray(im).save(
                        os.path.join(out, f"{tag}_{step}_{i}.png")
                    )
            except Exception:
                pass

    def close(self):
        if self.f:
            self.f.close()
        if self.tb:
            self.tb.close()


class StepTimer:
    """Wall-clock per-step timing + images/sec (SURVEY.md §5.1 gap:
    the reference has no profiling at all)."""

    def __init__(self):
        self.t = None

    def tick(self) -> float:
        now = time.perf_counter()
        dt = 0.0 if self.t is None else now - self.t
        self.t = now
        return dt
