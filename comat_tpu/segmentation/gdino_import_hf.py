"""GroundingDINO weight import from HF `transformers` snapshots.

The reference loads the IDEA `groundingdino_swint_ogc.pth` through the
GroundingDINO package (attr_concen_utils/gsam_interface.py:31-37);
`gdino_import.py` maps that checkpoint layout. The same released
weights are also published as an HF `transformers` model
(IDEA-Research/grounding-dino-tiny), whose module names differ. This
module renames/repacks an HF GroundingDino state dict into the IDEA
layout and reuses the existing `gdino_hf_name` mapper — one converter
owns the layout transforms, this one owns only the naming.

Besides snapshot loading, this enables implementation-level numerical
parity testing against `transformers`' torch GroundingDino at random
weights (tests/test_gdino_hf_parity.py) — validating our forward math
against a trusted port of the reference detector without any
checkpoint downloads.

Packing notes (HF separates what IDEA packs):
- every HF {query,key,value} attention triple -> IDEA packed
  in_proj_weight/in_proj_bias (torch MultiheadAttention) or the Swin
  qkv linear, concatenated along dim 0 in q,k,v order
- HF `bbox_embed.N.*` top-level heads duplicate
  `model.decoder.bbox_embed.N.*` (decoder_bbox_embed_share): dropped
- buffers (relative_position_index, position_ids) dropped
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

_B = "model.backbone.conv_encoder.model"

# (HF regex, IDEA replacement). Applied first-match. Keys that match no
# rule and no pack/drop rule raise (layout drift must be loud).
_RENAMES = [
    # ---- Swin backbone ----
    (rf"{_B}\.embeddings\.patch_embeddings\.projection\.(weight|bias)",
     r"backbone.0.patch_embed.proj.\1"),
    (rf"{_B}\.embeddings\.norm\.(weight|bias)",
     r"backbone.0.patch_embed.norm.\1"),
    (rf"{_B}\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.attention\.self"
     r"\.relative_position_bias_table",
     r"backbone.0.layers.\1.blocks.\2.attn.relative_position_bias_table"),
    (rf"{_B}\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.attention\.output"
     r"\.dense\.(weight|bias)",
     r"backbone.0.layers.\1.blocks.\2.attn.proj.\3"),
    (rf"{_B}\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.layernorm_before"
     r"\.(weight|bias)",
     r"backbone.0.layers.\1.blocks.\2.norm1.\3"),
    (rf"{_B}\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.layernorm_after"
     r"\.(weight|bias)",
     r"backbone.0.layers.\1.blocks.\2.norm2.\3"),
    (rf"{_B}\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.intermediate\.dense"
     r"\.(weight|bias)",
     r"backbone.0.layers.\1.blocks.\2.mlp.fc1.\3"),
    (rf"{_B}\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.output\.dense"
     r"\.(weight|bias)",
     r"backbone.0.layers.\1.blocks.\2.mlp.fc2.\3"),
    (rf"{_B}\.encoder\.layers\.(\d+)\.downsample\.norm\.(weight|bias)",
     r"backbone.0.layers.\1.downsample.norm.\2"),
    (rf"{_B}\.encoder\.layers\.(\d+)\.downsample\.reduction\.weight",
     r"backbone.0.layers.\1.downsample.reduction.weight"),
    (rf"{_B}\.hidden_states_norms\.stage(\d+)\.(weight|bias)",
     lambda m: f"backbone.0.norm{int(m.group(1)) - 1}.{m.group(2)}"),
    # ---- BERT text tower (names already HF-BERT inside) ----
    (r"model\.text_backbone\.(.+)", r"bert.\1"),
    (r"model\.text_projection\.(weight|bias)", r"feat_map.\1"),
    # ---- input projections / level embed ----
    (r"model\.input_proj_vision\.(\d+)\.([01])\.(weight|bias)",
     r"input_proj.\1.\2.\3"),
    (r"model\.level_embed", "transformer.level_embed"),
    # ---- encoder: fusion ----
    (r"model\.encoder\.layers\.(\d+)\.fusion_layer\.attn\.vision_proj"
     r"\.(weight|bias)",
     r"transformer.encoder.fusion_layers.\1.attn.v_proj.\2"),
    (r"model\.encoder\.layers\.(\d+)\.fusion_layer\.attn\.text_proj"
     r"\.(weight|bias)",
     r"transformer.encoder.fusion_layers.\1.attn.l_proj.\2"),
    (r"model\.encoder\.layers\.(\d+)\.fusion_layer\.attn"
     r"\.values_vision_proj\.(weight|bias)",
     r"transformer.encoder.fusion_layers.\1.attn.values_v_proj.\2"),
    (r"model\.encoder\.layers\.(\d+)\.fusion_layer\.attn"
     r"\.values_text_proj\.(weight|bias)",
     r"transformer.encoder.fusion_layers.\1.attn.values_l_proj.\2"),
    (r"model\.encoder\.layers\.(\d+)\.fusion_layer\.attn"
     r"\.out_vision_proj\.(weight|bias)",
     r"transformer.encoder.fusion_layers.\1.attn.out_v_proj.\2"),
    (r"model\.encoder\.layers\.(\d+)\.fusion_layer\.attn"
     r"\.out_text_proj\.(weight|bias)",
     r"transformer.encoder.fusion_layers.\1.attn.out_l_proj.\2"),
    (r"model\.encoder\.layers\.(\d+)\.fusion_layer\.layer_norm_vision"
     r"\.(weight|bias)",
     r"transformer.encoder.fusion_layers.\1.layer_norm_v.\2"),
    (r"model\.encoder\.layers\.(\d+)\.fusion_layer\.layer_norm_text"
     r"\.(weight|bias)",
     r"transformer.encoder.fusion_layers.\1.layer_norm_l.\2"),
    (r"model\.encoder\.layers\.(\d+)\.fusion_layer\.vision_param",
     r"transformer.encoder.fusion_layers.\1.gamma_v"),
    (r"model\.encoder\.layers\.(\d+)\.fusion_layer\.text_param",
     r"transformer.encoder.fusion_layers.\1.gamma_l"),
    # ---- encoder: text enhancer ----
    (r"model\.encoder\.layers\.(\d+)\.text_enhancer_layer\.self_attn"
     r"\.out_proj\.(weight|bias)",
     r"transformer.encoder.text_layers.\1.self_attn.out_proj.\2"),
    (r"model\.encoder\.layers\.(\d+)\.text_enhancer_layer"
     r"\.layer_norm_before\.(weight|bias)",
     r"transformer.encoder.text_layers.\1.norm1.\2"),
    (r"model\.encoder\.layers\.(\d+)\.text_enhancer_layer"
     r"\.layer_norm_after\.(weight|bias)",
     r"transformer.encoder.text_layers.\1.norm2.\2"),
    (r"model\.encoder\.layers\.(\d+)\.text_enhancer_layer\.fc([12])"
     r"\.(weight|bias)",
     r"transformer.encoder.text_layers.\1.linear\2.\3"),
    # ---- encoder: deformable image layer ----
    (r"model\.encoder\.layers\.(\d+)\.deformable_layer\.self_attn"
     r"\.(sampling_offsets|attention_weights|value_proj|output_proj)"
     r"\.(weight|bias)",
     r"transformer.encoder.layers.\1.self_attn.\2.\3"),
    (r"model\.encoder\.layers\.(\d+)\.deformable_layer"
     r"\.self_attn_layer_norm\.(weight|bias)",
     r"transformer.encoder.layers.\1.norm1.\2"),
    (r"model\.encoder\.layers\.(\d+)\.deformable_layer"
     r"\.final_layer_norm\.(weight|bias)",
     r"transformer.encoder.layers.\1.norm2.\2"),
    (r"model\.encoder\.layers\.(\d+)\.deformable_layer\.fc([12])"
     r"\.(weight|bias)",
     r"transformer.encoder.layers.\1.linear\2.\3"),
    # ---- two-stage query selection ----
    (r"model\.enc_output\.(weight|bias)", r"transformer.enc_output.\1"),
    (r"model\.enc_output_norm\.(weight|bias)",
     r"transformer.enc_output_norm.\1"),
    (r"model\.encoder_output_bbox_embed\.layers\.(\d+)\.(weight|bias)",
     r"transformer.enc_out_bbox_embed.layers.\1.\2"),
    (r"model\.query_position_embeddings\.weight",
     "transformer.tgt_embed.weight"),
    # ---- decoder ----
    (r"model\.decoder\.reference_points_head\.layers\.(\d+)"
     r"\.(weight|bias)",
     r"transformer.decoder.ref_point_head.layers.\1.\2"),
    (r"model\.decoder\.layer_norm\.(weight|bias)",
     r"transformer.decoder.norm.\1"),
    (r"model\.decoder\.layers\.(\d+)\.self_attn\.out_proj\.(weight|bias)",
     r"transformer.decoder.layers.\1.self_attn.out_proj.\2"),
    (r"model\.decoder\.layers\.(\d+)\.self_attn_layer_norm\.(weight|bias)",
     r"transformer.decoder.layers.\1.norm2.\2"),
    (r"model\.decoder\.layers\.(\d+)\.encoder_attn_text\.out_proj"
     r"\.(weight|bias)",
     r"transformer.decoder.layers.\1.ca_text.out_proj.\2"),
    (r"model\.decoder\.layers\.(\d+)\.encoder_attn_text_layer_norm"
     r"\.(weight|bias)",
     r"transformer.decoder.layers.\1.catext_norm.\2"),
    (r"model\.decoder\.layers\.(\d+)\.encoder_attn"
     r"\.(sampling_offsets|attention_weights|value_proj|output_proj)"
     r"\.(weight|bias)",
     r"transformer.decoder.layers.\1.cross_attn.\2.\3"),
    (r"model\.decoder\.layers\.(\d+)\.encoder_attn_layer_norm"
     r"\.(weight|bias)",
     r"transformer.decoder.layers.\1.norm1.\2"),
    (r"model\.decoder\.layers\.(\d+)\.fc([12])\.(weight|bias)",
     r"transformer.decoder.layers.\1.linear\2.\3"),
    (r"model\.decoder\.layers\.(\d+)\.final_layer_norm\.(weight|bias)",
     r"transformer.decoder.layers.\1.norm3.\2"),
    (r"model\.decoder\.bbox_embed\.(\d+)\.layers\.(\d+)\.(weight|bias)",
     r"transformer.decoder.bbox_embed.\1.layers.\2.\3"),
]

# HF q/k/v triples that IDEA packs: (regex with (prefix, index, leaf)
# groups) -> IDEA packed base name format
_PACKS = [
    (rf"{_B}\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.attention\.self"
     r"\.(query|key|value)\.(weight|bias)",
     lambda m: (f"backbone.0.layers.{m.group(1)}.blocks.{m.group(2)}"
                f".attn.qkv.{m.group(4)}", m.group(3), m.group(4))),
    (r"model\.encoder\.layers\.(\d+)\.text_enhancer_layer\.self_attn"
     r"\.(query|key|value)\.(weight|bias)",
     lambda m: (f"transformer.encoder.text_layers.{m.group(1)}"
                f".self_attn.in_proj_{m.group(3)}",
                m.group(2), m.group(3))),
    (r"model\.decoder\.layers\.(\d+)\.self_attn\.(query|key|value)"
     r"\.(weight|bias)",
     lambda m: (f"transformer.decoder.layers.{m.group(1)}"
                f".self_attn.in_proj_{m.group(3)}",
                m.group(2), m.group(3))),
    (r"model\.decoder\.layers\.(\d+)\.encoder_attn_text"
     r"\.(query|key|value)\.(weight|bias)",
     lambda m: (f"transformer.decoder.layers.{m.group(1)}"
                f".ca_text.in_proj_{m.group(3)}",
                m.group(2), m.group(3))),
]

_DROPS = [
    r".*relative_position_index$",
    r".*position_ids$",
    r"^bbox_embed\.\d+\.",        # shared duplicates of decoder heads
    r"^model\.text_backbone\.pooler\.",
]


def hf_to_gdino_tensors(
    state_dict: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Rename/repack an HF-transformers GroundingDino state dict into
    the IDEA checkpoint layout `gdino_import.gdino_hf_name` expects."""
    out: Dict[str, np.ndarray] = {}
    pending: Dict[str, Dict[str, np.ndarray]] = {}

    for key, val in state_dict.items():
        arr = np.asarray(val)
        if any(re.fullmatch(d, key) or re.match(d, key) for d in _DROPS):
            continue
        packed = False
        for pat, fmt in _PACKS:
            m = re.fullmatch(pat, key)
            if m:
                name, slot, _leaf = fmt(m)
                pending.setdefault(name, {})[slot] = arr
                packed = True
                break
        if packed:
            continue
        for pat, rep in _RENAMES:
            m = re.fullmatch(pat, key)
            if m:
                new = rep(m) if callable(rep) else m.expand(rep)
                out[new] = arr
                break
        else:
            raise KeyError(f"unmapped HF tensor: {key}")

    for name, slots in pending.items():
        missing = {"query", "key", "value"} - set(slots)
        if missing:
            raise KeyError(f"{name}: missing packed slots {missing}")
        out[name] = np.concatenate(
            [slots["query"], slots["key"], slots["value"]], axis=0
        )
    return out


def convert_gdino_from_hf(our_params, state_dict: Dict[str, np.ndarray]):
    """Fill GroundingDetector params from an HF GroundingDino state
    dict. Returns (params, missing) like hf_import.convert_tree."""
    from comat_tpu.models.hf_import import convert_tree
    from comat_tpu.segmentation.gdino_import import gdino_hf_name

    return convert_tree(
        our_params, hf_to_gdino_tensors(state_dict), gdino_hf_name
    )


def load_gdino_hf_snapshot(our_params, snapshot_dir: str):
    """Load from a local HF snapshot dir (safetensors or pytorch bin)."""
    import os

    from comat_tpu.models.hf_import import _load_safetensors_dir

    if any(f.endswith(".safetensors") for f in os.listdir(snapshot_dir)):
        sd = _load_safetensors_dir(snapshot_dir)
    else:  # pragma: no cover - torch fallback
        import torch

        sd = {}
        for fn in sorted(os.listdir(snapshot_dir)):
            if fn.endswith(".bin"):
                for k, v in torch.load(
                    os.path.join(snapshot_dir, fn), map_location="cpu",
                    weights_only=True,
                ).items():
                    sd[k] = v.float().numpy()
    return convert_gdino_from_hf(our_params, sd)
