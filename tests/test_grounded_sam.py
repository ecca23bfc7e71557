"""GroundingDetector + composed Grounded-SAM segmenter (tiny, random
weights: structural + protocol tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from comat_tpu.segmentation.gdino import (
    GDinoConfig,
    GroundingDetector,
    ground_nouns,
)
from comat_tpu.segmentation.grounded_sam import GroundedSAMSegmenter
from comat_tpu.segmentation.fastsam import YoloSegConfig


def test_grounding_detector_shapes():
    cfg = GDinoConfig.tiny()
    model = GroundingDetector(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    mask = jnp.ones((1, cfg.max_text_len), bool)
    params = model.init(jax.random.PRNGKey(1), img, ids, mask)
    boxes, logits = model.apply(params, img, ids, mask)
    assert boxes.shape == (1, cfg.num_queries, 4)
    assert logits.shape == (1, cfg.num_queries, cfg.max_text_len)
    b = np.asarray(boxes)
    assert (b >= 0).all() and (b <= 1).all()


def test_ground_nouns_assignment():
    boxes = np.array([[0.5, 0.5, 0.2, 0.2], [0.2, 0.2, 0.1, 0.1]])
    logits = np.full((2, 6), -10.0)
    logits[0, 0] = 3.0   # box 0 -> tokens of noun 0 (span 0..2)
    logits[1, 3] = 3.0   # box 1 -> noun 1 (span 3..5)
    out = ground_nouns(boxes, logits, [(0, 2), (3, 5)])
    assert set(out.keys()) == {0, 1}
    np.testing.assert_allclose(out[0][0], boxes[0])
    # below box threshold: dropped
    out2 = ground_nouns(boxes, np.full((2, 6), -10.0), [(0, 2), (3, 5)])
    assert out2 == {}


def test_grounded_sam_protocol():
    seg = GroundedSAMSegmenter(
        sam_cfg=YoloSegConfig.tiny(),
        gdino_cfg=GDinoConfig.tiny(),
        image_size=64,
        box_threshold=0.0,   # random weights: accept everything
        text_threshold=0.0,
    )
    img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    masks = seg(img, ["car", "bird"])
    assert len(masks) == 2
    assert masks[0].shape == (64, 64)
    assert seg(img, []) == []


def test_swin_backbone_shapes():
    from comat_tpu.segmentation.swin import SwinBackbone, SwinConfig

    cfg = SwinConfig.tiny_test()  # window 4, /4 patch
    model = SwinBackbone(cfg)
    # input must be divisible by window*8 = 32... use 128
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 128, 128, 3))
    params = model.init(jax.random.PRNGKey(1), img)
    outs = model.apply(params, img)
    assert len(outs) == 3
    # strides 8, 16, 32 with dims 2C, 4C, 8C
    assert outs[0].shape == (1, 16, 16, 32)
    assert outs[1].shape == (1, 8, 8, 64)
    assert outs[2].shape == (1, 4, 4, 128)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_swin_shifted_window_locality():
    """Shifted windows must not leak across the cyclic boundary: the
    attention mask separates wrapped regions."""
    from comat_tpu.segmentation.swin import SwinBlock

    blk = SwinBlock(heads=1, window=4, shift=2, mlp_ratio=1.0,
                    dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8))
    params = blk.init(jax.random.PRNGKey(1), x)
    out = blk.apply(params, x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_grounding_detector_swin_backbone():
    from comat_tpu.segmentation.gdino import GDinoConfig, GroundingDetector

    cfg = GDinoConfig.tiny_swin()
    model = GroundingDetector(cfg)
    # swin tiny_test: /4 patch + window 4 -> input divisible by 32;
    # detector consumes strides 8/16/32
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 128, 128, 3))
    ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    mask = jnp.ones((1, cfg.max_text_len), bool)
    params = model.init(jax.random.PRNGKey(1), img, ids, mask)
    boxes, logits = model.apply(params, img, ids, mask)
    assert boxes.shape == (1, cfg.num_queries, 4)
    assert np.isfinite(np.asarray(boxes)).all()
    assert np.isfinite(np.asarray(logits)).all()
