"""Implementation-level numerical parity of our GroundingDetector vs
HF `transformers`' torch GroundingDino — the trusted port of the exact
detector the reference drives (attr_concen_utils/gsam_interface.py
loads groundingdino_swint_ogc; HF republishes those weights as
IDEA-Research/grounding-dino-tiny with renamed modules).

Random torch weights at matched tiny geometry flow through
gdino_import_hf (HF -> IDEA repack) + gdino_import (IDEA -> Flax), and
both models score the same image/text. No downloads: this validates
the forward math + both converter layers, leaving only the checkpoint
file itself unexercised (absent in zero-egress environments).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

from comat_tpu.segmentation.gdino import (
    GDinoConfig,
    GroundingDetector,
    build_text_masks,
)
from comat_tpu.segmentation.gdino_import_hf import convert_gdino_from_hf

pytestmark = pytest.mark.slow  # two full detector builds + compiles


# HF BERT-ish special ids: [CLS]=101, [SEP]=102, '.'=1012
SPECIAL = (101, 102, 1012)


def _build_hf_tiny():
    from transformers import (
        BertConfig,
        GroundingDinoConfig,
        GroundingDinoForObjectDetection,
        SwinConfig,
    )

    cfg = GroundingDinoConfig(
        backbone_config=SwinConfig(
            image_size=256, embed_dim=16, depths=[1, 1, 2, 1],
            num_heads=[1, 2, 2, 4], window_size=4,
            out_features=["stage2", "stage3", "stage4"],
            drop_path_rate=0.0, attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0,
        ),
        text_config=BertConfig(
            vocab_size=2000, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        ),
        d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        encoder_n_points=2, decoder_n_points=2,
        num_queries=20, max_text_len=16, num_feature_levels=3,
        dropout=0.0, fusion_dropout=0.0, fusion_droppath=0.0,
        text_enhancer_dropout=0.0, activation_dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = GroundingDinoForObjectDetection(cfg).eval()
    # the default init leaves some heads at degenerate values (e.g.
    # zero bbox deltas); nudge everything to generic random weights so
    # parity exercises real arithmetic, keeping magnitudes small
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).normal_(0.0, 0.04, generator=g))
    return model


def test_gdino_matches_transformers():
    model = _build_hf_tiny()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    import dataclasses

    # vocab must reach HF's hardcoded SPECIAL_TOKENS ('.' = 1012)
    ours_cfg = dataclasses.replace(GDinoConfig.tiny_swin(), text_vocab=2000)
    ours = GroundingDetector(ours_cfg)

    rng = np.random.default_rng(0)
    B, H = 1, 256
    image = rng.standard_normal((B, H, H, 3), np.float32) * 0.5
    # "a red car . a blue bird ." with CLS/SEP framing
    ids = np.array(
        [[101, 5, 200, 300, 1012, 5, 400, 500, 1012, 102]], np.int64
    )
    T = ids.shape[1]
    text_mask = np.ones((B, T), bool)
    self_mask, pos_ids = build_text_masks(ids, SPECIAL)

    params = ours.init(
        jax.random.PRNGKey(0),
        image, ids.astype(np.int32), text_mask,
        self_mask, pos_ids,
    )
    params, missing = convert_gdino_from_hf(params, sd)
    assert not missing, f"{len(missing)} unconverted: {missing[:5]}"

    boxes, logits = jax.jit(ours.apply)(
        params, image, ids.astype(np.int32), text_mask,
        self_mask, pos_ids,
    )

    with torch.no_grad():
        out = model(
            pixel_values=torch.from_numpy(
                image.transpose(0, 3, 1, 2)
            ),
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones(B, T, dtype=torch.long),
            token_type_ids=torch.zeros(B, T, dtype=torch.long),
        )
    hf_logits = out.logits.numpy()[:, :, :T]
    hf_boxes = out.pred_boxes.numpy()

    np.testing.assert_allclose(
        np.asarray(boxes, np.float32), hf_boxes, atol=2e-4,
        err_msg="pred boxes diverge",
    )
    ours_l = np.asarray(logits, np.float32)
    np.testing.assert_allclose(
        ours_l, hf_logits, atol=2e-3,
        err_msg="token logits diverge",
    )
    # sanity: the comparison is not vacuous
    assert float(np.abs(hf_logits).max()) > 1e-3
    assert float(np.abs(hf_boxes - 0.5).max()) > 1e-3
