"""FastSAM (YOLOv8-seg) forward + decode + box_prompt tests (tiny,
random weights — structural/shape validation; weight-parity needs real
checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np

from comat_tpu.segmentation.fastsam import (
    YoloSegConfig,
    YoloV8Seg,
    box_prompt_masks,
    decode_predictions,
    _nms,
)


def test_yolov8seg_shapes():
    cfg = YoloSegConfig.tiny()
    model = YoloV8Seg(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), img)
    outs, protos = model.apply(params, img)
    assert protos.shape == (1, 16, 16, cfg.num_masks)
    assert len(outs) == 3
    assert outs[0]["box"].shape == (1, 8, 8, 4 * cfg.reg_max)
    assert outs[0]["cls"].shape == (1, 8, 8, 1)
    assert outs[0]["mc"].shape == (1, 8, 8, cfg.num_masks)
    assert outs[2]["box"].shape[1] == 2  # stride 32


def test_decode_and_box_prompt():
    cfg = YoloSegConfig.tiny()
    model = YoloV8Seg(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), img)
    outs, protos = model.apply(params, img)
    res = decode_predictions(outs, protos, cfg, conf_thresh=0.0,
                             iou_thresh=0.99, max_det=10)
    assert len(res) == 1
    r = res[0]
    assert r["boxes"].shape[1] == 4
    assert r["masks"].shape[0] == r["boxes"].shape[0]
    mask = box_prompt_masks(r, [8, 8, 40, 40], (64, 64))
    assert mask.shape == (64, 64)


def test_nms():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = _nms(boxes, scores, iou=0.5)
    assert list(keep) == [0, 2]
