"""One-command numerical parity harness (BASELINE.json north star:
SD1.5 CoMat step-loss parity <= 1e-3 vs the reference).

Three tiers, each printing PASS/FAIL/SKIP per check and exiting
non-zero on any FAIL:

  python -m comat_tpu.tools.parity
      Synthetic tier (no weights needed, CI-runnable): builds RANDOM
      torch `transformers` CLIP / BLIP models on tiny geometry, feeds
      their state dicts through our converters (models/hf_import.py),
      and compares fp32 logits/losses of the torch reference
      implementation against our Flax models — validating both the
      weight mapping AND our forward math against the stack the
      reference uses (concept_mat_utils/caption_blip.py,
      training_utils/pipeline.py). UNet/VAE (diffusers is not
      installed here) are covered by a converter round-trip: our
      params -> HF-layout tensors -> converter -> bitwise match.

  python -m comat_tpu.tools.parity --snapshot DIR [--blip DIR]
      Real-weight tier: same CLIP/BLIP torch-vs-ours logit comparison
      with the snapshot's weights, plus unmapped-leaf audits of the
      full UNet/CLIP/VAE load.

  python -m comat_tpu.tools.parity --snapshot DIR --fixture F [--record]
      Step-loss fixture: runs the SD1.5 CoMat train-step loss in fp32
      with the fixture's prompts/seed and compares against
      `expected_loss` (recorded from the reference,
      training_script.py:592-664) within 1e-3. --record writes the
      measured value into the fixture instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_RESULTS = []


def _report(name: str, status: str, detail: str = ""):
    _RESULTS.append((name, status, detail))
    print(f"[{status:>4}] {name}" + (f" — {detail}" if detail else ""))


def _finish() -> int:
    fails = [r for r in _RESULTS if r[1] == "FAIL"]
    print(
        f"\n{len(_RESULTS)} checks: "
        f"{sum(1 for r in _RESULTS if r[1] == 'PASS')} pass, "
        f"{len(fails)} fail, "
        f"{sum(1 for r in _RESULTS if r[1] == 'SKIP')} skip"
    )
    return 1 if fails else 0


# ---------------------------------------------------------------------
# Converter round-trip (UNet / VAE): our params -> HF layout -> back
# ---------------------------------------------------------------------

def _inverse_candidates(x: np.ndarray):
    """HF-layout candidates for one of our leaves; the caller keeps the
    first whose forward transform reproduces the leaf exactly."""
    yield x
    if x.ndim == 2:
        yield x.T
        # SD1.5 stores transformer proj_in/out as 1x1 convs (O,I,1,1)
        yield x.T[:, :, None, None]
    elif x.ndim == 3:
        # fused GEGLU (dim, 2, 4d) <- HF flat (8d, dim)
        yield x.reshape(x.shape[0], -1).T
        yield x.reshape(-1)
    elif x.ndim == 4:
        yield np.transpose(x, (3, 2, 0, 1))  # HWIO -> OIHW


def export_hf_tensors(tree, mapper):
    """Inverse of convert_tree for bijective mappings: produce the HF
    tensor dict that converts back to `tree` bitwise. Raises on any
    leaf with no invertible candidate (fused multi-leaf targets like
    BLIP's qkv are out of scope — UNet/VAE/CLIP have none)."""
    import jax

    from comat_tpu.models.hf_import import _path_keys

    tensors = {}

    def visit(path, leaf):
        if leaf is None:
            return leaf
        keys = _path_keys(path)
        if keys and keys[0] == "params":
            keys = keys[1:]
        if any(k.startswith("lora_") for k in keys):
            return leaf
        res = mapper(keys)
        if res is None:
            raise KeyError(f"unmapped leaf {'/'.join(keys)}")
        name, f = res
        x = np.asarray(leaf, np.float32)
        for cand in _inverse_candidates(x):
            try:
                back = np.asarray(f(cand), np.float32)
            except Exception:
                continue
            if back.shape == x.shape and np.array_equal(back, x):
                tensors[name] = np.ascontiguousarray(cand)
                return leaf
        raise ValueError(f"no invertible HF layout for {'/'.join(keys)}")

    jax.tree_util.tree_map_with_path(
        visit, tree, is_leaf=lambda v: v is None
    )
    return tensors


def check_roundtrip(name, model_params, mapper):
    import jax

    from comat_tpu.models.hf_import import convert_tree

    try:
        tensors = export_hf_tensors(model_params, mapper)
        out, missing = convert_tree(model_params, tensors, mapper)
        assert not missing, f"{len(missing)} missing: {missing[:3]}"
        for a, b in zip(
            jax.tree_util.tree_leaves(model_params),
            jax.tree_util.tree_leaves(out),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        _report(f"{name}_converter_roundtrip", "PASS",
                f"{len(tensors)} tensors bijective")
    except Exception as e:
        _report(f"{name}_converter_roundtrip", "FAIL", str(e)[:200])


# ---------------------------------------------------------------------
# CLIP: torch transformers vs our Flax encoder, fp32 logits
# ---------------------------------------------------------------------

def check_clip(state_dict=None, hf_cfg=None, tol=2e-5):
    """state_dict=None -> synthetic tiny torch model, random weights."""
    import jax
    import jax.numpy as jnp
    import torch
    import transformers

    import comat_tpu.config as cfg_lib
    from comat_tpu.models.clip_text import CLIPTextEncoder
    from comat_tpu.models.hf_import import _clip_hf_name, convert_tree

    if state_dict is None:
        hf_cfg = transformers.CLIPTextConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77, hidden_act="quick_gelu",
            # a non-2 eos id selects the modern first-EOS pooling path;
            # the legacy ==2 path argmaxes raw ids, which only works
            # when EOS is the vocab's top id (true for real CLIP)
            bos_token_id=0, eos_token_id=999,
        )
        torch.manual_seed(0)
        tm = transformers.CLIPTextModel(hf_cfg).eval()
    else:
        tm = transformers.CLIPTextModel(hf_cfg).eval()
        tm.load_state_dict(
            {k: torch.as_tensor(v) for k, v in state_dict.items()},
            strict=False,
        )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    ours_cfg = cfg_lib.CLIPTextConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        max_length=hf_cfg.max_position_embeddings,
        hidden_act=hf_cfg.hidden_act,
        dtype=jnp.float32,
    )
    enc = CLIPTextEncoder(ours_cfg)
    rng = np.random.RandomState(0)
    B, S = 2, hf_cfg.max_position_embeddings
    eos_id = hf_cfg.eos_token_id
    ids = rng.randint(1, min(hf_cfg.vocab_size, eos_id), size=(B, S))
    # CLIPTextModel pools at argmax(ids == eos); plant a unique EOS
    ids[ids == eos_id] = 1
    eos_pos = np.array([S // 2, S - 3])
    for b in range(B):
        ids[b, eos_pos[b]:] = eos_id
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    params, missing = convert_tree(params, sd, _clip_hf_name)
    missing = [m for m in missing if "text_projection" not in m]
    if missing:
        _report("clip_torch_parity", "FAIL",
                f"{len(missing)} unmapped: {missing[:3]}")
        return
    with torch.no_grad():
        t_out = tm(input_ids=torch.as_tensor(ids))
    hidden, pooled = enc.apply(
        params, jnp.asarray(ids), eos_positions=jnp.asarray(eos_pos)
    )
    dh = np.abs(
        np.asarray(hidden, np.float32)
        - t_out.last_hidden_state.numpy()
    ).max()
    dp = np.abs(
        np.asarray(pooled, np.float32) - t_out.pooler_output.numpy()
    ).max()
    if dh <= tol and dp <= tol:
        _report("clip_torch_parity", "PASS",
                f"max|Δhidden|={dh:.2e} max|Δpooled|={dp:.2e}")
    else:
        _report("clip_torch_parity", "FAIL",
                f"max|Δhidden|={dh:.2e} max|Δpooled|={dp:.2e} > {tol}")


# ---------------------------------------------------------------------
# BLIP: torch transformers caption loss vs ours, fp32
# ---------------------------------------------------------------------

def check_blip(state_dict=None, hf_cfg=None, tol=1e-4,
               tiny_shapes=False):
    import jax
    import jax.numpy as jnp
    import torch
    import transformers

    from comat_tpu.config import BLIPConfig
    from comat_tpu.models.blip import BLIPCaptioner, IGNORE_INDEX
    from comat_tpu.models.hf_import import _blip_hf_name, convert_tree

    if state_dict is None:
        vcfg = transformers.BlipVisionConfig(
            image_size=64, patch_size=16, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64,
        )
        tcfg = transformers.BlipTextConfig(
            vocab_size=1000, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            encoder_hidden_size=32, max_position_embeddings=512,
            is_decoder=True, bos_token_id=1,
        )
        hf_cfg = transformers.BlipConfig(
            text_config=tcfg.to_dict(), vision_config=vcfg.to_dict()
        )
        torch.manual_seed(0)
        tm = transformers.BlipForConditionalGeneration(hf_cfg).eval()
        ours_cfg = BLIPConfig.tiny(vocab_size=1000)
    else:
        tm = transformers.BlipForConditionalGeneration(hf_cfg).eval()
        tm.load_state_dict(
            {k: torch.as_tensor(v) for k, v in state_dict.items()},
            strict=False,
        )
        # tiny_shapes (--tiny-geometry): the snapshot is a synthetic
        # test-geometry write — mirror it so the loader tier runs in CI
        # (tests/test_synthetic_snapshots.py); real snapshots are
        # BLIP-large
        ours_cfg = (
            BLIPConfig.tiny(vocab_size=hf_cfg.text_config.vocab_size)
            if tiny_shapes else BLIPConfig.large()
        )
        ours_cfg = ours_cfg.__class__(
            **{**ours_cfg.__dict__, "dtype": jnp.float32}
        )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    blip = BLIPCaptioner(
        BLIPConfig(**{**ours_cfg.__dict__, "dtype": jnp.float32})
    )
    rng = np.random.RandomState(1)
    B, S = 2, 8
    H = ours_cfg.image_size
    pix = rng.randn(B, H, H, 3).astype(np.float32)
    ids = rng.randint(4, ours_cfg.vocab_size, size=(B, S))
    ids[:, 0] = ours_cfg.bos_token_id
    mask = np.ones((B, S), np.int64)
    mask[1, 6:] = 0
    labels = np.where(mask == 1, ids, IGNORE_INDEX)
    labels[:, 0] = IGNORE_INDEX  # HF masks the BOS position via -100

    params = blip.init(
        jax.random.PRNGKey(0), jnp.asarray(pix), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(labels),
    )
    params, missing = convert_tree(params, sd, _blip_hf_name)
    if missing:
        _report("blip_torch_parity", "FAIL",
                f"{len(missing)} unmapped: {missing[:3]}")
        return
    with torch.no_grad():
        t_loss = tm(
            pixel_values=torch.as_tensor(
                np.transpose(pix, (0, 3, 1, 2))
            ),
            input_ids=torch.as_tensor(ids),
            attention_mask=torch.as_tensor(mask),
            labels=torch.as_tensor(labels),
        ).loss.item()
    ours = float(blip.apply(
        params, jnp.asarray(pix), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(labels),
    ))
    d = abs(ours - t_loss)
    if d <= tol:
        _report("blip_torch_parity", "PASS",
                f"torch={t_loss:.6f} ours={ours:.6f} |Δ|={d:.2e}")
    else:
        _report("blip_torch_parity", "FAIL",
                f"torch={t_loss:.6f} ours={ours:.6f} |Δ|={d:.2e} > {tol}")


def check_blip_vqa(state_dict=None, hf_cfg=None, tol=1e-4):
    """BLIP-VQA answer-ranking parity (the T2I-CompBench attribute-
    binding scorer, tools/evaluate.py --metric bvqa_binding) vs HF
    transformers' torch BlipForQuestionAnswering: vision -> question
    encoder (cross-attn to image) -> answer decoder (cross-attn to
    question states); compares P(yes) and both candidate logliks."""
    import jax
    import jax.numpy as jnp

    try:
        import torch
        import transformers
    except ImportError as e:  # torch-free env: report, don't crash
        _report("blip_vqa_torch_parity", "SKIP",
                f"torch unavailable: {e}")
        return

    from comat_tpu.config import BLIPConfig
    from comat_tpu.models.blip_vqa import BLIPVQA
    from comat_tpu.models.hf_import import _blip_vqa_hf_name, convert_tree

    if state_dict is None:
        vcfg = transformers.BlipVisionConfig(
            image_size=64, patch_size=16, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64,
        )
        tcfg = transformers.BlipTextConfig(
            vocab_size=1000, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            encoder_hidden_size=32, max_position_embeddings=512,
            bos_token_id=1,
        )
        hf_cfg = transformers.BlipConfig(
            text_config=tcfg.to_dict(), vision_config=vcfg.to_dict()
        )
        torch.manual_seed(3)
        tm = transformers.BlipForQuestionAnswering(hf_cfg).eval()
        ours_cfg = BLIPConfig.tiny(vocab_size=1000)
    else:
        tm = transformers.BlipForQuestionAnswering(hf_cfg).eval()
        tm.load_state_dict(
            {k: torch.as_tensor(v) for k, v in state_dict.items()},
            strict=False,
        )
        ours_cfg = BLIPConfig.base()  # blip-vqa-base is ViT-B
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    vqa = BLIPVQA(BLIPConfig(**{**ours_cfg.__dict__,
                                "dtype": jnp.float32}))
    rng = np.random.RandomState(2)
    B, Sq, Sa = 2, 8, 3
    H = ours_cfg.image_size
    pix = rng.randn(B, H, H, 3).astype(np.float32)
    q_ids = rng.randint(4, ours_cfg.vocab_size, size=(B, Sq))
    q_mask = np.ones((B, Sq), np.int64)
    q_mask[1, 6:] = 0
    q_ids[1, 6:] = 0
    # unpadded BOS-led candidates (same length: causal masking then
    # makes HF's key-padding mask irrelevant on scored positions)
    a_yes = rng.randint(4, ours_cfg.vocab_size, size=(B, Sa))
    a_no = rng.randint(4, ours_cfg.vocab_size, size=(B, Sa))
    a_yes[:, 0] = a_no[:, 0] = ours_cfg.bos_token_id
    lab_yes = a_yes.copy()
    lab_no = a_no.copy()

    params = vqa.init(
        jax.random.PRNGKey(0), jnp.asarray(pix), jnp.asarray(q_ids),
        jnp.asarray(q_mask), jnp.asarray(a_yes), jnp.asarray(lab_yes),
        jnp.asarray(a_no), jnp.asarray(lab_no),
    )
    params, missing = convert_tree(params, sd, _blip_vqa_hf_name)
    if missing:
        _report("blip_vqa_torch_parity", "FAIL",
                f"{len(missing)} unmapped: {missing[:3]}")
        return

    def torch_loglik(a_ids):
        """Per-sample at TRUE question length (no pads): this version
        of HF transformers does not apply encoder_attention_mask in the
        BLIP text decoder's cross-attention (pad keys get real prob
        mass — a regression vs the original BLIP repo's med.py, which
        masks), so padded-batch torch is NOT ground truth. Unpadded
        per-sample torch is; our padded jax batch must match it —
        which also proves OUR cross-mask handles pads correctly."""
        out = []
        with torch.no_grad():
            img = tm.vision_model(
                pixel_values=torch.as_tensor(np.transpose(pix, (0, 3, 1, 2)))
            )[0]
            for b in range(B):
                L = int(q_mask[b].sum())
                qs = tm.text_encoder(
                    input_ids=torch.as_tensor(q_ids[b : b + 1, :L]),
                    attention_mask=torch.ones((1, L), dtype=torch.long),
                    encoder_hidden_states=img[b : b + 1],
                    encoder_attention_mask=torch.ones(
                        (1, img.shape[1]), dtype=torch.long
                    ),
                )[0]
                logits = tm.text_decoder(
                    input_ids=torch.as_tensor(a_ids[b : b + 1]),
                    attention_mask=torch.ones((1, Sa), dtype=torch.long),
                    encoder_hidden_states=qs,
                    encoder_attention_mask=torch.ones(
                        (1, L), dtype=torch.long
                    ),
                ).logits
                logp = torch.log_softmax(logits[:, :-1].float(), dim=-1)
                tgt = torch.as_tensor(a_ids[b : b + 1, 1:])
                out.append(
                    logp.gather(-1, tgt[..., None])[..., 0].sum(-1).item()
                )
        return np.asarray(out)

    t_yes = torch_loglik(a_yes)
    t_no = torch_loglik(a_no)
    t_prob = 1.0 / (1.0 + np.exp(-(t_yes - t_no)))

    ours = np.asarray(vqa.apply(
        params, jnp.asarray(pix), jnp.asarray(q_ids),
        jnp.asarray(q_mask), jnp.asarray(a_yes), jnp.asarray(lab_yes),
        jnp.asarray(a_no), jnp.asarray(lab_no),
    ))
    d = float(np.abs(ours - t_prob).max())
    if d <= tol:
        _report("blip_vqa_torch_parity", "PASS",
                f"P(yes) torch={t_prob.round(6).tolist()} "
                f"ours={ours.round(6).tolist()} |Δ|max={d:.2e}")
    else:
        _report("blip_vqa_torch_parity", "FAIL",
                f"torch={t_prob.tolist()} ours={ours.tolist()} "
                f"|Δ|max={d:.2e} > {tol}")


# ---------------------------------------------------------------------
# GroundingDINO: torch transformers detector vs ours, fp32
# ---------------------------------------------------------------------

def _build_hf_gdino_tiny():
    """Random tiny HF GroundingDino at the geometry of our
    GDinoConfig.tiny_swin (vocab raised to cover HF's hardcoded
    SPECIAL_TOKENS, '.' = 1012)."""
    import torch
    from transformers import (
        BertConfig, GroundingDinoConfig,
        GroundingDinoForObjectDetection, SwinConfig,
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
    # generic small random weights (the default init zeroes some heads)
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).normal_(0.0, 0.04, generator=g))
    return model


def check_gdino(hf_model=None, image_size=256, tol_boxes=5e-4,
                tol_logits=5e-3, label="gdino_torch_parity",
                ours_cfg=None):
    """Boxes + token-logit parity of GroundingDetector vs HF
    transformers' GroundingDino (the trusted port of the detector the
    reference drives through gsam_interface.py)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    try:
        import torch
    except ImportError as e:  # torch-free env: report, don't crash
        _report(label, "SKIP", f"torch unavailable: {e}")
        return

    from comat_tpu.segmentation.gdino import (
        GDinoConfig, GroundingDetector, build_text_masks,
    )
    from comat_tpu.segmentation.gdino_import_hf import convert_gdino_from_hf

    try:
        if hf_model is None:
            hf_model = _build_hf_gdino_tiny()
            if ours_cfg is None:
                ours_cfg = dataclasses.replace(
                    GDinoConfig.tiny_swin(), text_vocab=2000
                )
        elif ours_cfg is None:
            ours_cfg = dataclasses.replace(
                GDinoConfig.swint_ogc(), dtype=jnp.float32
            )
    except ImportError as e:  # transformers too old for GroundingDino
        _report(label, "SKIP", f"{e}")
        return

    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    ours = GroundingDetector(ours_cfg)

    rng = np.random.default_rng(0)
    B, H = 1, image_size
    image = rng.standard_normal((B, H, H, 3), np.float32) * 0.5
    # "<cls> a red car . a blue bird . <sep>" shaped id stream
    ids = np.array(
        [[101, 5, 200, 300, 1012, 5, 400, 500, 1012, 102]], np.int64
    )
    T = ids.shape[1]
    text_mask = np.ones((B, T), bool)
    self_mask, pos_ids = build_text_masks(ids, (101, 102, 1012))

    params = ours.init(
        jax.random.PRNGKey(0), image, ids.astype(np.int32), text_mask,
        self_mask, pos_ids,
    )
    params, missing = convert_gdino_from_hf(params, sd)
    if missing:
        _report(label, "FAIL", f"{len(missing)} unmapped: {missing[:3]}")
        return
    boxes, logits = jax.jit(ours.apply)(
        params, image, ids.astype(np.int32), text_mask, self_mask,
        pos_ids,
    )
    with torch.no_grad():
        out = hf_model(
            pixel_values=torch.from_numpy(image.transpose(0, 3, 1, 2)),
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones(B, T, dtype=torch.long),
            token_type_ids=torch.zeros(B, T, dtype=torch.long),
        )
    d_box = float(np.abs(
        np.asarray(boxes, np.float32) - out.pred_boxes.numpy()
    ).max())
    d_log = float(np.abs(
        np.asarray(logits, np.float32) - out.logits.numpy()[:, :, :T]
    ).max())
    if d_box <= tol_boxes and d_log <= tol_logits:
        _report(label, "PASS",
                f"|Δboxes|={d_box:.2e} |Δlogits|={d_log:.2e}")
    else:
        _report(label, "FAIL",
                f"|Δboxes|={d_box:.2e} (tol {tol_boxes}) "
                f"|Δlogits|={d_log:.2e} (tol {tol_logits})")


# ---------------------------------------------------------------------
# FastSAM: independent torch YOLOv8-seg twin vs ours, fp32
# ---------------------------------------------------------------------

def _build_torch_yolov8seg(cfg):
    """An independent torch transcription of ultralytics' YOLOv8-seg
    forward (Conv+BN(eps 1e-3)+SiLU blocks, C2f chunk-and-append, SPPF
    triple-maxpool, PAN neck, Segment head with cv2/cv3/cv4 branches +
    Proto) whose state_dict uses ultralytics' exact module names
    (`model.model.{idx}...`) — the layout `FastSAM-x.pt` ships
    (reference: attr_concen_utils/gsam_interface.py:24-28). Feeding it
    through weights_import.load_fastsam_params validates the converter
    AND our Flax forward math without ultralytics in the image."""
    import torch
    from torch import nn

    class TConv(nn.Module):
        def __init__(self, ci, co, k=1, s=1):
            super().__init__()
            self.conv = nn.Conv2d(ci, co, k, s, k // 2, bias=False)
            self.bn = nn.BatchNorm2d(co, eps=1e-3)

        def forward(self, x):
            return nn.functional.silu(self.bn(self.conv(x)))

    class TBottleneck(nn.Module):
        def __init__(self, c, shortcut):
            super().__init__()
            self.cv1 = TConv(c, c, 3)
            self.cv2 = TConv(c, c, 3)
            self.add = shortcut

        def forward(self, x):
            h = self.cv2(self.cv1(x))
            return x + h if self.add else h

    class TC2f(nn.Module):
        def __init__(self, ci, co, n, shortcut):
            super().__init__()
            c = co // 2
            self.cv1 = TConv(ci, 2 * c, 1)
            self.cv2 = TConv((2 + n) * c, co, 1)
            self.m = nn.ModuleList(
                TBottleneck(c, shortcut) for _ in range(n)
            )

        def forward(self, x):
            y = list(self.cv1(x).chunk(2, 1))
            for m in self.m:
                y.append(m(y[-1]))
            return self.cv2(torch.cat(y, 1))

    class TSPPF(nn.Module):
        def __init__(self, ci, co):
            super().__init__()
            c = ci // 2
            self.cv1 = TConv(ci, c, 1)
            self.cv2 = TConv(c * 4, co, 1)
            self.mp = nn.MaxPool2d(5, 1, 2)

        def forward(self, x):
            x = self.cv1(x)
            y1 = self.mp(x)
            y2 = self.mp(y1)
            return self.cv2(torch.cat([x, y1, y2, self.mp(y2)], 1))

    class TProto(nn.Module):
        def __init__(self, ci, cp, nm):
            super().__init__()
            self.cv1 = TConv(ci, cp, 3)
            self.upsample = nn.ConvTranspose2d(cp, cp, 2, 2, 0)
            self.cv2 = TConv(cp, cp, 3)
            self.cv3 = TConv(cp, nm, 1)

        def forward(self, x):
            return self.cv3(self.cv2(self.upsample(self.cv1(x))))

    class TSegment(nn.Module):
        def __init__(self, chs, cp, nc, nm, reg_max):
            super().__init__()
            ch0 = chs[0]
            c2 = max(16, ch0 // 4, reg_max * 4)
            c3 = max(ch0, min(nc, 100))
            c4 = max(ch0 // 4, nm)
            mk = lambda cm, co: nn.ModuleList(
                nn.Sequential(TConv(ch, cm, 3), TConv(cm, cm, 3),
                              nn.Conv2d(cm, co, 1))
                for ch in chs
            )
            self.cv2 = mk(c2, 4 * reg_max)  # box (DFL dist)
            self.cv3 = mk(c3, nc)           # cls
            self.cv4 = mk(c4, nm)           # mask coeffs
            self.proto = TProto(ch0, cp, nm)

    ch, n = cfg.ch, cfg.n
    layers = nn.ModuleList([
        TConv(3, ch(64), 3, 2),                       # 0 stem
        TConv(ch(64), ch(128), 3, 2),                 # 1
        TC2f(ch(128), ch(128), n(3), True),           # 2
        TConv(ch(128), ch(256), 3, 2),                # 3
        TC2f(ch(256), ch(256), n(6), True),           # 4 -> p3
        TConv(ch(256), ch(512), 3, 2),                # 5
        TC2f(ch(512), ch(512), n(6), True),           # 6 -> p4
        TConv(ch(512), ch(512), 3, 2),                # 7
        TC2f(ch(512), ch(512), n(3), True),           # 8
        TSPPF(ch(512), ch(512)),                      # 9 -> p5
        nn.Identity(),                                # 10 upsample
        nn.Identity(),                                # 11 concat
        TC2f(ch(512) + ch(512), ch(512), n(3), False),  # 12 up_c2f4
        nn.Identity(),                                # 13 upsample
        nn.Identity(),                                # 14 concat
        TC2f(ch(512) + ch(256), ch(256), n(3), False),  # 15 up_c2f3
        TConv(ch(256), ch(256), 3, 2),                # 16 dn_conv3
        nn.Identity(),                                # 17 concat
        TC2f(ch(256) + ch(512), ch(512), n(3), False),  # 18 dn_c2f4
        TConv(ch(512), ch(512), 3, 2),                # 19 dn_conv4
        nn.Identity(),                                # 20 concat
        TC2f(ch(512) + ch(512), ch(512), n(3), False),  # 21 dn_c2f5
        TSegment([ch(256), ch(512), ch(512)], ch(256),
                 cfg.num_classes, cfg.num_masks, cfg.reg_max),  # 22
    ])

    class Inner(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = layers

    class Root(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = Inner()

        def forward(self, img):
            m = self.model.model
            up = lambda x: nn.functional.interpolate(
                x, scale_factor=2, mode="nearest"
            )
            x = m[1](m[0](img))
            p3 = m[4](m[3](m[2](x)))
            p4 = m[6](m[5](p3))
            p5 = m[9](m[8](m[7](p4)))
            u4 = m[12](torch.cat([up(p5), p4], 1))
            u3 = m[15](torch.cat([up(u4), p3], 1))
            d4 = m[18](torch.cat([m[16](u3), u4], 1))
            d5 = m[21](torch.cat([m[19](d4), p5], 1))
            head = m[22]
            outs = []
            for i, f in enumerate([u3, d4, d5]):
                outs.append({
                    "box": head.cv2[i](f),
                    "cls": head.cv3[i](f),
                    "mc": head.cv4[i](f),
                })
            return outs, head.proto(u3)

    root = Root().eval()
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in root.parameters():
            p.copy_(torch.empty_like(p).normal_(0.0, 0.05, generator=g))
        for mod in root.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0.0, 0.05, generator=g)
                mod.running_var.copy_(
                    torch.empty_like(mod.running_var)
                    .normal_(0.0, 0.2, generator=g).abs() + 0.5
                )
                mod.weight.copy_(
                    torch.empty_like(mod.weight)
                    .normal_(1.0, 0.1, generator=g)
                )
    return root


def check_fastsam(tol=1e-3, label="fastsam_torch_parity",
                  state_dict=None, image_size=64, tiny_shapes=False):
    """Per-level box/cls/mask-coeff + proto parity of our Flax
    YoloV8Seg against the independent torch YOLOv8-seg twin, with
    weights flowing through weights_import.load_fastsam_params (the
    FastSAM-x.pt state-dict layout).

    state_dict=None -> tiny twin with random weights (synthetic tier;
    residual risk: a shared misreading of ultralytics' architecture
    would pass undetected). With a REAL FastSAM-x state dict (tier 2,
    --fastsam), both sides load the actual checkpoint at full size —
    the twin via load_state_dict, ours via the converter — closing
    that gap."""
    import dataclasses

    import jax

    try:
        import torch
    except ImportError as e:  # torch-free env: report, don't crash
        _report(label, "SKIP", f"torch unavailable: {e}")
        return

    from comat_tpu.segmentation.fastsam import YoloSegConfig, YoloV8Seg
    from comat_tpu.segmentation.weights_import import load_fastsam_params

    base = (
        YoloSegConfig.fastsam_x()
        if state_dict is not None and not tiny_shapes
        else YoloSegConfig.tiny()
    )
    cfg = dataclasses.replace(base, dtype=jax.numpy.float32)
    twin = _build_torch_yolov8seg(cfg)
    if state_dict is not None:
        sd = dict(state_dict)
        try:
            twin.load_state_dict(
                {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
            )
        except Exception as e:
            _report(label, "FAIL", f"twin load_state_dict: {e}"[:300])
            return
        twin.eval()
    else:
        sd = {k: v.numpy() for k, v in twin.state_dict().items()}

    model = YoloV8Seg(cfg)
    rng = np.random.default_rng(5)
    img = rng.standard_normal(
        (2 if state_dict is None else 1, image_size, image_size, 3)
    ).astype(np.float32) * 0.5
    variables = model.init(jax.random.PRNGKey(0), img)
    variables, missing = load_fastsam_params(sd, variables)
    if missing:
        _report(label, "FAIL", f"{len(missing)} unmapped: {missing[:3]}")
        return
    outs, protos = jax.jit(model.apply)(variables, img)
    with torch.no_grad():
        t_outs, t_protos = twin(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        )

    worst = 0.0
    for o, t in zip(outs, t_outs):
        for k in ("box", "cls", "mc"):
            d = float(np.abs(
                np.asarray(o[k], np.float32)
                - t[k].numpy().transpose(0, 2, 3, 1)
            ).max())
            worst = max(worst, d)
    worst = max(worst, float(np.abs(
        np.asarray(protos, np.float32)
        - t_protos.numpy().transpose(0, 2, 3, 1)
    ).max()))
    if worst <= tol:
        _report(label, "PASS", f"|Δ|max={worst:.2e}")
    else:
        _report(label, "FAIL", f"|Δ|max={worst:.2e} > {tol}")


# ---------------------------------------------------------------------
# Real-snapshot audits + step-loss fixture
# ---------------------------------------------------------------------

def check_snapshot_load(snapshot: str, xl: bool, tiny: bool = False):
    """`tiny=True` (--tiny-geometry) loads the same directory layout /
    converter / miss-detection path at test geometry — the CI tier that
    proves the loader against SYNTHETIC snapshots, so only the numbers
    (not the code path) wait on real weights (VERDICT r3 missing #3)."""
    import jax

    from comat_tpu.models.pipeline import (
        DiffusionPipeline, make_pipeline_config,
    )

    name = "sdxl" if xl else "sd_1_5"
    pcfg = make_pipeline_config(name, lora_rank=4, tiny=tiny)
    pipe = DiffusionPipeline(pcfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    import logging

    misses = []
    handler = logging.Handler()
    handler.emit = lambda rec: misses.append(rec.getMessage())
    logging.getLogger("comat_tpu").addHandler(handler)
    try:
        from comat_tpu.models.hf_import import load_sd_params

        load_sd_params(snapshot, params, pcfg)
    finally:
        logging.getLogger("comat_tpu").removeHandler(handler)
    unmapped = [m for m in misses if "unmapped" in m]
    if unmapped:
        _report("snapshot_full_load", "FAIL", "; ".join(unmapped)[:200])
    else:
        _report("snapshot_full_load", "PASS",
                f"all {name} leaves mapped from {snapshot}")


def check_step_loss(snapshot: str, fixture: str, record: bool):
    """SD1.5 CoMat step loss in fp32 on the fixture's prompts/seed vs
    the reference-recorded expected value (<=1e-3)."""
    import jax
    import jax.numpy as jnp

    with open(fixture) as f:
        fx = json.load(f)

    from comat_tpu.config import BLIPConfig
    from comat_tpu.models.blip import BLIPCaptioner
    from comat_tpu.models.hf_import import (
        load_blip_params, load_sd_params,
    )
    from comat_tpu.models.pipeline import (
        DiffusionPipeline, make_pipeline_config,
    )
    from comat_tpu.text.tokenizer import load_clip_tokenizer
    from comat_tpu.training.data import assemble_batch
    from comat_tpu.training.train_step import (
        TrainConfig, init_train_state, make_optimizer, make_train_step,
    )

    pcfg = make_pipeline_config(
        "sd_1_5", lora_rank=fx.get("lora_rank", 128),
        resolution=fx.get("resolution", 512),
    )
    pipe = DiffusionPipeline(pcfg)
    params = pipe.init_params(jax.random.PRNGKey(fx.get("seed", 0)))
    params = load_sd_params(snapshot, params, pcfg)
    blip_cfg = BLIPConfig.large()
    blip = BLIPCaptioner(blip_cfg)
    S = 8
    blip_params = blip.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, blip_cfg.image_size, blip_cfg.image_size, 3)),
        jnp.zeros((1, S), jnp.int32), jnp.ones((1, S), jnp.int32),
        jnp.zeros((1, S), jnp.int32),
    )
    blip_dir = fx.get("blip_snapshot")
    if blip_dir and os.path.isdir(blip_dir):
        blip_params = load_blip_params(blip_dir, blip_params)
    tok = load_clip_tokenizer(os.path.join(snapshot, "tokenizer"))
    # caption side needs BLIP's BERT WordPiece vocabulary (~30k), NOT
    # the CLIP BPE: ids from the wrong vocab would silently index out
    # of the text-embedding table. Prefer the BLIP snapshot's
    # vocab.txt; a HashTokenizer over the same vocab size is only
    # acceptable for recording a synthetic (random-BLIP) fixture.
    vocab_txt = os.path.join(blip_dir or "", "vocab.txt")
    if blip_dir and os.path.isfile(vocab_txt):
        from comat_tpu.text.tokenizer import BertWordPieceTokenizer

        blip_tok = BertWordPieceTokenizer(vocab_txt)
    elif record or fx.get("expected_loss") is None:
        from comat_tpu.text.tokenizer import HashTokenizer

        blip_tok = HashTokenizer(30524)
    else:
        _report(
            "step_loss_fixture", "SKIP",
            "fixture has expected_loss but no blip_snapshot/vocab.txt — "
            "cannot reproduce the caption tokenization it was recorded "
            "with",
        )
        return
    tcfg = TrainConfig(
        total_step=fx.get("total_step", 50), K=fx.get("K", 5),
        guidance_scale=fx.get("cfg_scale", 7.5),
        resolution=fx.get("resolution", 512),
        learning_rate=5e-5,
    )
    opt = make_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)
    batch = assemble_batch(
        fx["prompts"], tok, blip_tok, max_length=pcfg.text.max_length
    )
    step = jax.jit(make_train_step(pipe, blip, tcfg, opt))
    _, _, metrics = step(
        state, frozen, blip_params, batch,
        jax.random.PRNGKey(fx.get("seed", 0)),
    )
    loss = float(metrics["step_loss"])
    if record or fx.get("expected_loss") is None:
        fx["expected_loss"] = loss
        with open(fixture, "w") as f:
            json.dump(fx, f, indent=1)
        _report("step_loss_fixture", "PASS" if record else "SKIP",
                f"recorded measured step_loss={loss:.6f} into {fixture}")
        return
    d = abs(loss - fx["expected_loss"])
    if d <= 1e-3:
        _report("step_loss_fixture", "PASS",
                f"loss={loss:.6f} expected={fx['expected_loss']:.6f} "
                f"|Δ|={d:.2e}")
    else:
        _report("step_loss_fixture", "FAIL",
                f"loss={loss:.6f} expected={fx['expected_loss']:.6f} "
                f"|Δ|={d:.2e} > 1e-3")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--snapshot", default=None,
                    help="diffusers SD snapshot dir (unet/ vae/ "
                         "text_encoder/ tokenizer/)")
    ap.add_argument("--blip", default=None,
                    help="BLIP captioner snapshot dir")
    ap.add_argument("--gdino", default=None,
                    help="GroundingDINO HF-transformers snapshot dir "
                         "(IDEA-Research/grounding-dino-tiny layout)")
    ap.add_argument("--fastsam", default=None,
                    help="real FastSAM-x.pt checkpoint: full-size "
                         "parity of our Flax YOLOv8-seg + converter "
                         "vs the torch twin loading the same weights")
    ap.add_argument("--fixture", default=None,
                    help="step-loss fixture JSON "
                         "(fixtures/step_loss_sd15.json)")
    ap.add_argument("--record", action="store_true",
                    help="write the measured step loss into --fixture")
    ap.add_argument("--record-twin", action="store_true",
                    help="write the torch-twin step-loss record into "
                         "fixtures/step_loss_sd15.json")
    ap.add_argument("--skip-twin", action="store_true",
                    help="skip the step-loss torch-twin fixture "
                         "(it jit-compiles a full tiny train step)")
    ap.add_argument("--tiny-geometry", action="store_true",
                    help="load --snapshot/--blip/--gdino/--fastsam at "
                         "TEST geometry: the same directory layouts, "
                         "file readers, converters and miss detection, "
                         "against synthetically written snapshots "
                         "(tests/test_synthetic_snapshots.py) — real "
                         "weights swap in with the flag dropped")
    ap.add_argument("--tol", type=float, default=2e-5)
    ap.add_argument("--platform", choices=("cpu", "native"),
                    default="cpu",
                    help="cpu (default): run our side on the CPU "
                         "backend so fp32 math is exact against CPU "
                         "torch; native: whatever jax picks (TPU "
                         "matmuls then run at 'highest' precision)")
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # fp32 comparisons: never let TPU matmuls silently drop to bf16
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from comat_tpu.config import CLIPTextConfig, UNetConfig, VAEConfig
    from comat_tpu.models.clip_text import CLIPTextEncoder
    from comat_tpu.models.hf_import import (
        _clip_hf_name, _unet_hf_name, _vae_hf_name,
    )
    from comat_tpu.models.unet import UNet2DCondition
    from comat_tpu.models.vae import AutoencoderKL

    # Tier 1: synthetic (always runs)
    check_clip(tol=args.tol)
    check_blip()
    check_blip_vqa()
    K = jax.random.PRNGKey(0)
    unet = UNet2DCondition(UNetConfig.tiny(), lora_rank=0)
    up = unet.init(K, jnp.zeros((1, 16, 16, 4)),
                   jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 32)))
    check_roundtrip("unet", up, _unet_hf_name)
    vae = AutoencoderKL(VAEConfig.tiny())
    vp = vae.init(K, jnp.zeros((1, 32, 32, 3)))
    check_roundtrip("vae", vp, _vae_hf_name)
    clip = CLIPTextEncoder(CLIPTextConfig.tiny())
    cp = clip.init(K, jnp.zeros((1, 77), jnp.int32))
    check_roundtrip("clip", cp, _clip_hf_name)
    check_gdino()
    check_fastsam()

    # North-star fixture (BASELINE.json step-loss parity <= 1e-3): the
    # real jitted train step vs the independent torch twin of the
    # SD1.5 denoise loop + losses (tools/torch_twin_sd15.py), tiny
    # geometry, fp32, seeded.
    if args.skip_twin:
        _report("step_loss_twin_fixture", "SKIP", "--skip-twin")
    else:
        try:
            from comat_tpu.tools.step_loss_fixture import (
                TOL as TWIN_TOL, run_fixture,
            )

            rec = run_fixture(record=args.record_twin)
            if "error" in rec:
                _report("step_loss_twin_fixture", "FAIL",
                        str(rec)[:250])
            elif rec["abs_delta"] <= TWIN_TOL:
                _report(
                    "step_loss_twin_fixture", "PASS",
                    f"|Δ|={rec['abs_delta']:.2e} (jax "
                    f"{rec['jax']['step_loss']:.6f} vs twin "
                    f"{rec['torch_twin']['step_loss']:.6f}, tol "
                    f"{TWIN_TOL})",
                )
            else:
                _report(
                    "step_loss_twin_fixture", "FAIL",
                    f"|Δ|={rec['abs_delta']:.2e} > {TWIN_TOL}: "
                    f"components={rec['component_deltas']}",
                )
        except ImportError as e:
            _report("step_loss_twin_fixture", "SKIP",
                    f"torch/transformers unavailable: {e}")

    # Tier 2: real snapshot
    if args.snapshot:
        if os.path.isdir(args.snapshot):
            check_snapshot_load(
                args.snapshot, xl=False, tiny=args.tiny_geometry
            )
            te = os.path.join(args.snapshot, "text_encoder")
            if os.path.isdir(te):
                import transformers

                tm = transformers.CLIPTextModel.from_pretrained(te)
                check_clip(
                    state_dict={
                        k: v.detach().numpy()
                        for k, v in tm.state_dict().items()
                    },
                    hf_cfg=tm.config, tol=args.tol,
                )
        else:
            _report("snapshot_full_load", "SKIP",
                    f"{args.snapshot} is not a directory — real "
                    "weights absent in this environment")
    else:
        _report("snapshot_full_load", "SKIP", "--snapshot not given")

    if args.blip and os.path.isdir(args.blip):
        import transformers

        tm = transformers.BlipForConditionalGeneration.from_pretrained(
            args.blip
        )
        check_blip(
            state_dict={
                k: v.detach().numpy() for k, v in tm.state_dict().items()
            },
            hf_cfg=tm.config,
            tiny_shapes=args.tiny_geometry,
        )

    if args.gdino and os.path.isdir(args.gdino):
        import dataclasses as _dc

        from transformers import GroundingDinoForObjectDetection

        from comat_tpu.segmentation.gdino import GDinoConfig

        check_gdino(
            hf_model=GroundingDinoForObjectDetection.from_pretrained(
                args.gdino
            ).eval(),
            image_size=256 if args.tiny_geometry else 448,
            ours_cfg=(
                _dc.replace(GDinoConfig.tiny_swin(), text_vocab=2000)
                if args.tiny_geometry else None
            ),
            label="gdino_snapshot_parity",
        )

    if args.fastsam and os.path.isfile(args.fastsam):
        import re as _re

        from comat_tpu.segmentation.checkpoints import (
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(args.fastsam)
        sd = {  # normalize DetectionModel-level keys up (checkpoints.py)
            ("model." + k if _re.match(r"model\.\d+\.", k) else k): v
            for k, v in sd.items()
        }
        check_fastsam(
            state_dict=sd,
            image_size=64 if args.tiny_geometry else 160,
            tiny_shapes=args.tiny_geometry,
            label="fastsam_snapshot_parity",
        )

    # Tier 3: step-loss fixture
    if args.fixture and args.snapshot and os.path.isdir(args.snapshot):
        check_step_loss(args.snapshot, args.fixture, args.record)
    else:
        _report("step_loss_fixture", "SKIP",
                "needs --snapshot (real weights) + --fixture")

    return _finish()


if __name__ == "__main__":
    sys.exit(main())
