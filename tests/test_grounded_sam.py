"""GroundingDetector + composed Grounded-SAM segmenter (tiny, random
weights: structural + protocol tests)."""

import pytest

pytestmark = pytest.mark.slow  # expensive e2e jit compiles

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


def test_grounded_sam_batch_matches_per_image():
    """batch() (one GDINO + one FastSAM call for the whole batch — the
    relay-transport optimization) must reproduce per-image __call__
    results exactly, including empty-noun rows."""
    seg = GroundedSAMSegmenter(
        sam_cfg=YoloSegConfig.tiny(),
        gdino_cfg=GDinoConfig.tiny(),
        image_size=64,
        box_threshold=0.0,
        text_threshold=0.0,
    )
    rs = np.random.RandomState(1)
    imgs = rs.rand(3, 64, 64, 3).astype(np.float32)
    nouns = [["car", "bird"], [], ["cat"]]
    got = seg.batch(imgs, nouns)
    assert [len(m) for m in got] == [2, 0, 1]
    for b in range(3):
        want = seg(imgs[b], nouns[b])
        assert len(got[b]) == len(want)
        for m_g, m_w in zip(got[b], want):
            np.testing.assert_allclose(m_g, m_w, atol=1e-5)

    # the holder dispatches through batch() for B>1 with identical
    # output layout to the per-image loop
    from comat_tpu.segmentation.interface import SegmenterHolder

    holder = SegmenterHolder(seg, max_words=4)
    holder.nouns = nouns
    out = holder.host_masks(imgs)
    assert out.shape == (3, 4, 64, 64)
    per_image = np.zeros_like(out)
    for b in range(3):
        for w, m in enumerate(seg(imgs[b], nouns[b])[:4]):
            per_image[b, w] = m
    np.testing.assert_allclose(out, per_image, atol=1e-5)


def test_swin_non_multiple_size_padding():
    """Feature maps that are NOT window multiples must work (torch Swin
    zero-pads to window multiples and crops back — F.pad path). 64px at
    window 4: stage maps 16->8->4->2, where 16 and 8 aren't multiples of
    window*shift patterns exercised at odd sizes like 72 (18x18 maps)."""
    from comat_tpu.segmentation.swin import SwinBackbone, SwinConfig

    cfg = SwinConfig.tiny_test()  # window 4
    model = SwinBackbone(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 72, 72, 3))
    params = model.init(jax.random.PRNGKey(1), img)
    outs = model.apply(params, img)
    # strides 8/16/32 with ceil rounding through odd merges
    assert outs[0].shape[1:3] == (9, 9)
    assert outs[1].shape[1:3] == (5, 5)
    assert outs[2].shape[1:3] == (3, 3)
    for o in outs:
        assert np.isfinite(np.asarray(o, np.float32)).all()


def test_swin_padding_matches_unpadded_when_multiple():
    """Padding machinery is a no-op at window-multiple sizes (same
    params, same output)."""
    from comat_tpu.segmentation.swin import SwinBackbone, SwinConfig

    cfg = SwinConfig.tiny_test()
    model = SwinBackbone(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), img)
    outs = model.apply(params, img)
    assert outs[0].shape[1:3] == (8, 8)
    for o in outs:
        assert np.isfinite(np.asarray(o, np.float32)).all()


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


def test_build_text_masks():
    from comat_tpu.segmentation.gdino import build_text_masks

    # [CLS]=101, [SEP]=102, '.'=1012 separate phrases
    ids = np.array([[101, 5, 6, 1012, 7, 8, 9, 102]])
    mask, pos = build_text_masks(ids, (101, 102, 1012))
    # phrase 1 = tokens 1..3 (incl. '.'), attends within [prev..sep]
    assert mask[0, 1, 2] and mask[0, 2, 1]
    assert not mask[0, 1, 5]          # no cross-phrase attention
    assert mask[0, 4, 6]              # phrase 2 internal
    assert mask[0, 0, 0]              # special token attends itself
    # position ids restart after each separator
    np.testing.assert_array_equal(pos[0], [0, 0, 1, 2, 0, 1, 2, 3])


def _synthetic_gdino_state_dict(params):
    """Build a torch-named state dict with shapes implied by our tree
    (inverse of each transform)."""
    from comat_tpu.segmentation.gdino_import import gdino_hf_name

    rng = np.random.RandomState(0)
    sd = {}
    unmapped = []
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    for path, leaf in flat:
        keys = tuple(str(getattr(q, "key", getattr(q, "name", q)))
                     for q in path)
        res = gdino_hf_name(keys)
        if res is None:
            unmapped.append("/".join(keys))
            continue
        name, _ = res
        shape = leaf.shape
        if name.endswith("in_proj_weight"):
            shape = (3 * leaf.shape[1], leaf.shape[0])
        elif name.endswith("in_proj_bias"):
            shape = (3 * leaf.shape[0],)
        elif name.endswith(("proj.weight",)) and leaf.ndim == 4:
            shape = (leaf.shape[3], leaf.shape[2], leaf.shape[0],
                     leaf.shape[1])
        elif leaf.ndim == 4:  # any conv
            shape = (leaf.shape[3], leaf.shape[2], leaf.shape[0],
                     leaf.shape[1])
        elif name.endswith("reduction.weight"):
            shape = (leaf.shape[1], leaf.shape[0])
        elif (name.endswith(".weight") and leaf.ndim == 2
              and not name.endswith(("embeddings.weight",
                                     "tgt_embed.weight"))
              and name != "transformer.level_embed"):
            shape = (leaf.shape[1], leaf.shape[0])
        if name not in sd:
            sd[name] = rng.randn(*shape).astype(np.float32)
        else:
            assert sd[name].shape == shape, (name, sd[name].shape, shape)
    return sd, unmapped


def test_gdino_import_mapping_coverage():
    """Every param of the swin-backbone detector maps onto a checkpoint
    name; loading a synthetic state dict fills the whole tree."""
    from comat_tpu.segmentation.gdino_import import (
        gdino_hf_name, load_gdino_params,
    )

    cfg = GDinoConfig.tiny_swin()
    model = GroundingDetector(cfg)
    img = jnp.zeros((1, 128, 128, 3))
    ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    mask = jnp.ones((1, cfg.max_text_len), bool)
    params = jax.eval_shape(
        lambda k: model.init(k, img, ids, mask), jax.random.PRNGKey(0)
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )
    sd, unmapped = _synthetic_gdino_state_dict(params)
    assert unmapped == [], unmapped
    # DDP-prefixed checkpoints load too
    sd_pref = {f"module.{k}": v for k, v in sd.items()}
    loaded, missing = load_gdino_params(sd_pref, params)
    assert missing == [], missing[:10]

    # value spot checks: transpose, packed qkv split, conv layout
    p = loaded["params"]
    np.testing.assert_allclose(
        np.asarray(p["feat_map"]["kernel"]), sd["feat_map.weight"].T
    )
    w = sd["transformer.decoder.layers.0.self_attn.in_proj_weight"]
    d = w.shape[0] // 3
    np.testing.assert_allclose(
        np.asarray(p["dec0"]["sa_k"]["kernel"]), w[d : 2 * d].T
    )
    np.testing.assert_allclose(
        np.asarray(p["swin"]["patch_embed"]["kernel"]),
        np.transpose(sd["backbone.0.patch_embed.proj.weight"],
                     (2, 3, 1, 0)),
    )

    # pin exact checkpoint names against typos
    expected = {
        ("swin", "stage1_block0", "attn", "rel_pos_bias"):
            "backbone.0.layers.1.blocks.0.attn"
            ".relative_position_bias_table",
        ("swin", "merge0", "kernel"):
            "backbone.0.layers.0.downsample.reduction.weight",
        ("swin", "out_norm1", "scale"): "backbone.0.norm1.weight",
        ("bert", "layer0", "query", "kernel"):
            "bert.encoder.layer.0.attention.self.query.weight",
        ("bert", "emb_norm", "bias"): "bert.embeddings.LayerNorm.bias",
        ("input_proj0_norm", "scale"): "input_proj.0.1.weight",
        ("level_embed",): "transformer.level_embed",
        ("fuse0", "gamma_v"):
            "transformer.encoder.fusion_layers.0.gamma_v",
        ("fuse0", "values_l_proj", "bias"):
            "transformer.encoder.fusion_layers.0.attn.values_l_proj"
            ".bias",
        ("text_enc0", "q", "kernel"):
            "transformer.encoder.text_layers.0.self_attn"
            ".in_proj_weight",
        ("enc0", "offsets", "kernel"):
            "transformer.encoder.layers.0.self_attn.sampling_offsets"
            ".weight",
        ("enc_out_bbox_embed", "l2", "bias"):
            "transformer.enc_out_bbox_embed.layers.2.bias",
        ("tgt_embed",): "transformer.tgt_embed.weight",
        ("ref_point_head", "l0", "kernel"):
            "transformer.decoder.ref_point_head.layers.0.weight",
        ("dec_norm", "scale"): "transformer.decoder.norm.weight",
        ("dec0", "ca_out", "kernel"):
            "transformer.decoder.layers.0.ca_text.out_proj.weight",
        ("dec0", "value", "kernel"):
            "transformer.decoder.layers.0.cross_attn.value_proj"
            ".weight",
        ("dec0", "norm_ffn", "bias"):
            "transformer.decoder.layers.0.norm3.bias",
        ("bbox_embed0", "l1", "kernel"):
            "transformer.decoder.bbox_embed.0.layers.1.weight",
    }
    for path, name in expected.items():
        got = gdino_hf_name(path)
        assert got is not None and got[0] == name, (path, got)
