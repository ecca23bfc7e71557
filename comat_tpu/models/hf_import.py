"""HF checkpoint import: diffusers / transformers torch weights -> our
Flax param trees.

The reference loads everything with `from_pretrained`
(training_utils/pipeline.py:42-49, caption_blip.py:17). Here conversion
is explicit: for each leaf of OUR param tree we derive the HF tensor
name + layout transform (torch conv OIHW -> flax HWIO, dense (O,I) ->
(I,O)). Loading works from a local diffusers snapshot directory
(unet/, vae/, text_encoder/ subfolders with *.safetensors) — no
network.

Conversion is roundtrip-tested with synthetic state dicts
(tests/test_hf_import.py); real-weight logit parity is a later
milestone requiring downloaded checkpoints.
"""

from __future__ import annotations

import os
import re
from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np


def _t(x):  # dense weight
    return np.asarray(x).T


def _conv(x):  # torch OIHW -> flax HWIO
    return np.transpose(np.asarray(x), (2, 3, 1, 0))


def _id(x):
    return np.asarray(x)


# ---------------------------------------------------------------------
# UNet name mapping: our path -> (hf name, transform)
# ---------------------------------------------------------------------

def _unet_hf_name(path: Tuple[str, ...]) -> Optional[Tuple[str, Callable]]:
    """Map our UNet param path (under params/) to diffusers UNet names."""
    p = list(path)
    leaf = p[-1]
    is_kernel = leaf in ("kernel",)
    is_scale = leaf == "scale"

    def norm_leaf():
        return "weight" if is_scale else "bias"

    def dense_leaf():
        return ("weight", _t) if is_kernel else ("bias", _id)

    def conv_leaf():
        return ("weight", _conv) if is_kernel else ("bias", _id)

    top = p[0]
    if top == "conv_in":
        n, f = conv_leaf()
        return f"conv_in.{n}", f
    if top == "conv_out":
        n, f = conv_leaf()
        return f"conv_out.{n}", f
    if top == "conv_norm_out":
        return f"conv_norm_out.{norm_leaf()}", _id
    if top in ("time_embedding", "add_embedding"):
        n, f = dense_leaf()
        return f"{top}.{p[1]}.{n}", f

    m = re.fullmatch(r"(down|up)_(\d+)_resnet_(\d+)", top)
    if m:
        base = f"{m.group(1)}_blocks.{m.group(2)}.resnets.{m.group(3)}"
        sub = p[1]
        if sub in ("norm1", "norm2"):
            return f"{base}.{sub}.{norm_leaf()}", _id
        if sub in ("conv1", "conv2", "conv_shortcut"):
            n, f = conv_leaf()
            return f"{base}.{sub}.{n}", f
        if sub == "time_emb_proj":
            n, f = dense_leaf()
            return f"{base}.time_emb_proj.{n}", f
    if top.startswith("mid_resnet_"):
        j = top[-1]
        base = f"mid_block.resnets.{j}"
        sub = p[1]
        if sub in ("norm1", "norm2"):
            return f"{base}.{sub}.{norm_leaf()}", _id
        if sub in ("conv1", "conv2", "conv_shortcut"):
            n, f = conv_leaf()
            return f"{base}.{sub}.{n}", f
        if sub == "time_emb_proj":
            n, f = dense_leaf()
            return f"{base}.time_emb_proj.{n}", f

    m = re.fullmatch(r"(down|up)_(\d+)_attn_(\d+)", top)
    mid = top == "mid_attn"
    if m or mid:
        base = (
            "mid_block.attentions.0"
            if mid
            else f"{m.group(1)}_blocks.{m.group(2)}.attentions.{m.group(3)}"
        )
        sub = p[1]
        if sub == "norm":
            return f"{base}.norm.{norm_leaf()}", _id
        if sub in ("proj_in", "proj_out"):
            # SD1.5 stores these as 1x1 convs (O,I,1,1); SDXL as linear.
            n = "weight" if is_kernel else "bias"

            def proj_f(x):
                x = np.asarray(x)
                if x.ndim == 4:
                    x = x[:, :, 0, 0]
                return x.T if is_kernel else x

            return f"{base}.{sub}.{n}", (proj_f if is_kernel else _id)
        mb = re.fullmatch(r"blocks_(\d+)", sub)
        if mb:
            bb = f"{base}.transformer_blocks.{mb.group(1)}"
            s2 = p[2]
            if s2 in ("norm1", "norm2", "norm3"):
                return f"{bb}.{s2}.{norm_leaf()}", _id
            if s2 in ("attn1", "attn2"):
                s3 = p[3]  # to_q/to_k/to_v/to_out
                rest = p[4]  # base / lora_a / lora_b
                if rest == "base":
                    n, f = dense_leaf()
                    hf = (
                        f"{bb}.{s2}.to_out.0.{n}"
                        if s3 == "to_out"
                        else f"{bb}.{s2}.{s3}.{n}"
                    )
                    return hf, f
                # LoRA factors: diffusers attn processor naming
                if rest == "lora_a":
                    return (
                        f"{bb}.{s2}.processor.{s3}_lora.down.weight", _t
                    )
                if rest == "lora_b":
                    return (
                        f"{bb}.{s2}.processor.{s3}_lora.up.weight", _t
                    )
            if s2 == "ff":
                n, f = dense_leaf()
                if p[3] == "proj_in":
                    # our GEGLU kernel is (dim, 2, 4*dim) / bias
                    # (2, 4*dim) — HF's flat (8*dim, dim) columns are
                    # [values, gates], which is exactly the row-major
                    # reshape (models/unet.py FeedForward)
                    def geglu_f(x, _k=is_kernel):
                        x = np.asarray(x)
                        if _k:
                            x = x.T
                            return x.reshape(x.shape[0], 2, -1)
                        return x.reshape(2, -1)

                    return f"{bb}.ff.net.0.proj.{n}", geglu_f
                return f"{bb}.ff.net.2.{n}", f

    m = re.fullmatch(r"down_(\d+)_downsample", top)
    if m:
        n, f = conv_leaf()
        return f"down_blocks.{m.group(1)}.downsamplers.0.conv.{n}", f
    m = re.fullmatch(r"up_(\d+)_upsample", top)
    if m:
        n, f = conv_leaf()
        return f"up_blocks.{m.group(1)}.upsamplers.0.conv.{n}", f
    return None


# ---------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------

def _clip_hf_name(path: Tuple[str, ...]) -> Optional[Tuple[str, Callable]]:
    p = list(path)
    leaf = p[-1]
    is_kernel = leaf == "kernel"
    pre = "text_model."
    if p[0] == "token_embedding":
        return pre + "embeddings.token_embedding.weight", _id
    if p[0] == "position_embedding":
        return pre + "embeddings.position_embedding.weight", _id
    if p[0] == "text_projection":
        return "text_projection.weight", _t
    if p[0] == "final_norm":
        n = "weight" if leaf == "scale" else "bias"
        return pre + f"final_layer_norm.{n}", _id
    m = re.fullmatch(r"layers_(\d+)", p[0])
    if m:
        base = pre + f"encoder.layers.{m.group(1)}"
        sub = p[1]
        if sub in ("norm1", "norm2"):
            n = "weight" if leaf == "scale" else "bias"
            hf = "layer_norm1" if sub == "norm1" else "layer_norm2"
            return f"{base}.{hf}.{n}", _id
        if sub in ("q_proj", "k_proj", "v_proj", "out_proj"):
            rest = p[2]
            n = "weight" if is_kernel else "bias"
            if rest == "base":
                return f"{base}.self_attn.{sub}.{n}", (_t if is_kernel else _id)
            return None  # text-enc LoRA has no HF source
        if sub in ("fc1", "fc2"):
            n = "weight" if is_kernel else "bias"
            return f"{base}.mlp.{sub}.{n}", (_t if is_kernel else _id)
    return None


# ---------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------

def _vae_hf_name(path: Tuple[str, ...]) -> Optional[Tuple[str, Callable]]:
    p = list(path)
    tower = p[0]  # encoder / decoder
    p1 = p[1]
    leaf = p[-1]
    is_kernel = leaf == "kernel"
    norm_n = "weight" if leaf == "scale" else "bias"
    conv = lambda name: (name + (".weight" if is_kernel else ".bias"),
                         _conv if is_kernel else _id)
    dense = lambda name: (name + (".weight" if is_kernel else ".bias"),
                          _t if is_kernel else _id)

    if tower == "decoder":
        pre = "decoder."
        if p1 == "post_quant_conv":
            return conv("post_quant_conv")
        if p1 == "conv_in":
            return conv(pre + "conv_in")
        if p1 == "conv_out":
            return conv(pre + "conv_out")
        if p1 == "conv_norm_out":
            return pre + f"conv_norm_out.{norm_n}", _id
        m = re.fullmatch(r"mid_resnet_(\d)", p1)
        if m:
            base = pre + f"mid_block.resnets.{m.group(1)}"
        else:
            m2 = re.fullmatch(r"up_(\d+)_resnet_(\d+)", p1)
            base = (
                pre + f"up_blocks.{m2.group(1)}.resnets.{m2.group(2)}"
                if m2 else None
            )
        if base:
            sub = p[2]
            if sub in ("norm1", "norm2"):
                return f"{base}.{sub}.{norm_n}", _id
            return conv(f"{base}.{sub}")
        m = re.fullmatch(r"up_(\d+)_upsample", p1)
        if m:
            return conv(pre + f"up_blocks.{m.group(1)}.upsamplers.0.conv")
        if p1 == "mid_attn":
            base = pre + "mid_block.attentions.0"
            sub = p[2]
            if sub == "norm":
                return f"{base}.group_norm.{norm_n}", _id
            hf = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                  "to_out": "to_out.0"}[sub]
            return dense(f"{base}.{hf}")
    if tower == "encoder":
        pre = "encoder."
        if p1 == "quant_conv":
            return conv("quant_conv")
        if p1 == "conv_in":
            return conv(pre + "conv_in")
        if p1 == "conv_out":
            return conv(pre + "conv_out")
        if p1 == "conv_norm_out":
            return pre + f"conv_norm_out.{norm_n}", _id
        m = re.fullmatch(r"down_(\d+)_resnet_(\d+)", p1)
        if m:
            base = pre + f"down_blocks.{m.group(1)}.resnets.{m.group(2)}"
            sub = p[2]
            if sub in ("norm1", "norm2"):
                return f"{base}.{sub}.{norm_n}", _id
            return conv(f"{base}.{sub}")
        m = re.fullmatch(r"down_(\d+)_downsample", p1)
        if m:
            return conv(
                pre + f"down_blocks.{m.group(1)}.downsamplers.0.conv"
            )
        m = re.fullmatch(r"mid_resnet_(\d)", p1)
        if m:
            base = pre + f"mid_block.resnets.{m.group(1)}"
            sub = p[2]
            if sub in ("norm1", "norm2"):
                return f"{base}.{sub}.{norm_n}", _id
            return conv(f"{base}.{sub}")
        if p1 == "mid_attn":
            base = pre + "mid_block.attentions.0"
            sub = p[2]
            if sub == "norm":
                return f"{base}.group_norm.{norm_n}", _id
            hf = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                  "to_out": "to_out.0"}[sub]
            return dense(f"{base}.{hf}")
    return None


# ---------------------------------------------------------------------
# BLIP (transformers BlipForConditionalGeneration)
# ---------------------------------------------------------------------

def _blip_hf_name(path: Tuple[str, ...]) -> Optional[Tuple[str, Callable]]:
    p = list(path)
    leaf = p[-1]
    is_kernel = leaf == "kernel"
    norm_n = "weight" if leaf == "scale" else "bias"
    dense = lambda name: (
        name + (".weight" if is_kernel else ".bias"),
        _t if is_kernel else _id,
    )
    vpre = "vision_model."
    tpre = "text_decoder.bert."

    if p[0] == "vision":
        p1 = p[1]
        if p1 == "patch_embed":
            # HF Blip patch conv has no bias flag? it has bias.
            return (
                vpre + "embeddings.patch_embedding."
                + ("weight" if is_kernel else "bias"),
                _conv if is_kernel else _id,
            )
        if p1 == "cls_token":
            return vpre + "embeddings.class_embedding", (
                lambda x: np.asarray(x).reshape(1, 1, -1)
            )
        if p1 == "pos_embed":
            return vpre + "embeddings.position_embedding", _id
        if p1 == "post_norm":
            return vpre + f"post_layernorm.{norm_n}", _id
        m = re.fullmatch(r"layers_(\d+)", p1)
        if m:
            base = vpre + f"encoder.layers.{m.group(1)}"
            sub = p[2]
            if sub in ("norm1", "norm2"):
                hf = "layer_norm1" if sub == "norm1" else "layer_norm2"
                return f"{base}.{hf}.{norm_n}", _id
            if sub in ("q", "k", "v"):
                # HF stores fused qkv (3D, D): slice out our third
                idx = {"q": 0, "k": 1, "v": 2}[sub]
                n = "weight" if is_kernel else "bias"

                def split_qkv(x, idx=idx):
                    x = np.asarray(x)
                    d = x.shape[0] // 3
                    piece = x[idx * d : (idx + 1) * d]
                    return piece.T if piece.ndim == 2 else piece

                return f"{base}.self_attn.qkv.{n}", split_qkv
            if sub == "proj":
                return dense(f"{base}.self_attn.projection")
            if sub in ("fc1", "fc2"):
                return dense(f"{base}.mlp.{sub}")
    if p[0] == "word_embed":
        return tpre + "embeddings.word_embeddings.weight", _id
    if p[0] == "text_pos_embed":
        return tpre + "embeddings.position_embeddings.weight", _id
    if p[0] == "embed_norm":
        return tpre + f"embeddings.LayerNorm.{norm_n}", _id
    m = re.fullmatch(r"text_layers_(\d+)", p[0])
    if m:
        base = tpre + f"encoder.layer.{m.group(1)}"
        sub = p[1]
        table = {
            "self_q": ("attention.self.query", dense),
            "self_k": ("attention.self.key", dense),
            "self_v": ("attention.self.value", dense),
            "self_out": ("attention.output.dense", dense),
            "cross_q": ("crossattention.self.query", dense),
            "cross_k": ("crossattention.self.key", dense),
            "cross_v": ("crossattention.self.value", dense),
            "cross_out": ("crossattention.output.dense", dense),
            "fc1": ("intermediate.dense", dense),
            "fc2": ("output.dense", dense),
        }
        if sub in table:
            hf, fn = table[sub]
            return fn(f"{base}.{hf}")
        if sub == "self_norm":
            return f"{base}.attention.output.LayerNorm.{norm_n}", _id
        if sub == "cross_norm":
            return f"{base}.crossattention.output.LayerNorm.{norm_n}", _id
        if sub == "ff_norm":
            return f"{base}.output.LayerNorm.{norm_n}", _id
    if p[0] == "head_transform":
        return dense("text_decoder.cls.predictions.transform.dense")
    if p[0] == "head_norm":
        return (
            f"text_decoder.cls.predictions.transform.LayerNorm.{norm_n}",
            _id,
        )
    if p[0] == "lm_head":
        if is_kernel:
            return "text_decoder.cls.predictions.decoder.weight", _t
        return "text_decoder.cls.predictions.bias", _id
    return None


def _blip_vqa_hf_name(path: Tuple[str, ...]) -> Optional[Tuple[str, Callable]]:
    """BLIP-VQA (transformers BlipForQuestionAnswering): the vision
    tower and the answer decoder share the captioner's layout
    (`vision_model.*`, `text_decoder.bert.*` + cls head); the question
    encoder is a bare BlipTextModel at `text_encoder.*`. Our params use
    `enc_`/`dec_` prefixes (models/blip_vqa.py) — delegate to
    _blip_hf_name and rewrite."""
    p = list(path)
    if p[0] == "vision":
        return _blip_hf_name(path)
    if p[0].startswith("dec_"):
        return _blip_hf_name(tuple([p[0][4:]] + p[1:]))
    if p[0].startswith("enc_"):
        r = _blip_hf_name(tuple([p[0][4:]] + p[1:]))
        if r is None:
            return None
        name, fn = r
        return name.replace("text_decoder.bert.", "text_encoder."), fn
    return None


def _alias_tied_blip(tensors: Dict[str, np.ndarray]) -> None:
    """HF ties `text_decoder.cls.predictions.decoder.weight` to the
    word embeddings, and `save_pretrained(safe_serialization=True)`
    drops tied duplicates from the snapshot — so the lm_head kernel is
    ABSENT from real BLIP safetensors. Restore the alias before
    conversion or `lm_head` silently keeps its random init
    (reference loads via from_pretrained, which re-ties:
    transformers BlipTextLMHeadModel.tie_weights)."""
    head = "text_decoder.cls.predictions.decoder.weight"
    tied = "text_decoder.bert.embeddings.word_embeddings.weight"
    if head not in tensors and tied in tensors:
        tensors[head] = tensors[tied]


def load_blip_vqa_params(snapshot_dir: str, vqa_params):
    """Real Salesforce/blip-vqa-base weights -> BLIPVQA params."""
    tensors = _load_safetensors_dir(snapshot_dir)
    _alias_tied_blip(tensors)
    out, missing = convert_tree(vqa_params, tensors, _blip_vqa_hf_name)
    if missing:
        import logging

        logging.getLogger("comat_tpu").warning(
            "blip_vqa: %d unmapped params (first: %s)",
            len(missing), missing[:3],
        )
    return out


def load_blip_params(snapshot_dir: str, blip_params):
    tensors = _load_safetensors_dir(snapshot_dir)
    _alias_tied_blip(tensors)
    out, missing = convert_tree(blip_params, tensors, _blip_hf_name)
    if missing:
        import logging

        logging.getLogger("comat_tpu").warning(
            "blip: %d unmapped params (first: %s)", len(missing), missing[:3]
        )
    return out


_MAPPERS = {"unet": _unet_hf_name, "text": _clip_hf_name,
            "text2": _clip_hf_name, "vae": _vae_hf_name}


def _path_keys(path) -> Tuple[str, ...]:
    return tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def convert_tree(
    our_tree, hf_tensors: Dict[str, np.ndarray], mapper: Callable,
    strict: bool = False,
):
    """Fill our param tree from an HF tensor dict; report misses."""
    missing = []

    def fill(path, leaf):
        keys = _path_keys(path)
        # strip flax's leading 'params'
        if keys and keys[0] == "params":
            keys = keys[1:]
        res = mapper(keys)
        if res is None:
            if not any(k.startswith("lora_") for k in keys):
                missing.append("/".join(keys))
            return leaf
        name, f = res
        if name not in hf_tensors:
            # LoRA leaves are optional: base snapshots carry no adapter
            # tensors (the reference injects FRESH LoRA over the loaded
            # base — training_utils/pipeline.py:87-115), so their
            # absence keeps the fresh init and is not a miss. When the
            # tensors ARE present (twin fixtures, resumed exports) they
            # load like any other leaf.
            if not any(k.startswith("lora_") for k in keys):
                missing.append(f"{'/'.join(keys)} -> {name}")
            return leaf
        arr = f(hf_tensors[name]).astype(np.asarray(leaf).dtype)
        assert arr.shape == leaf.shape, (
            f"{name}: {arr.shape} != {leaf.shape}"
        )
        return jax.numpy.asarray(arr)

    out = jax.tree_util.tree_map_with_path(fill, our_tree)
    if strict and missing:
        raise KeyError(f"{len(missing)} unmapped params: {missing[:10]}")
    return out, missing


def _load_safetensors_dir(d: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    tensors: Dict[str, np.ndarray] = {}
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".safetensors"):
            with safe_open(os.path.join(d, fn), framework="np") as f:
                for k in f.keys():
                    tensors[k] = f.get_tensor(k)
    if not tensors:
        raise FileNotFoundError(f"no safetensors in {d}")
    return tensors


def load_unet_params(path: str, unet_params):
    """Load ONLY the UNet from a diffusers UNet directory or a single
    .safetensors file — the reference's --sdxl_unet_path: a separately
    fine-tuned 512-res SDXL UNet swapped in over the base snapshot
    (training_utils/pipeline.py:28). Returns (params, missing)."""
    if os.path.isdir(path):
        tensors = _load_safetensors_dir(path)
    else:
        from safetensors import safe_open

        tensors = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
    return convert_tree(unet_params, tensors, _unet_hf_name)


# ---------------------------------------------------------------------
# diffusers LoRA interop (export + import of the LoraLoaderMixin layout)
# ---------------------------------------------------------------------

# The reference saves pytorch_lora_weights.safetensors keyed
# `unet.<module>.lora.{down,up}.weight` via unet_lora_state_dict
# (training_script.py:50-66, saved through
# LoraLoaderMixin.save_lora_weights :397-401). _unet_hf_name's import
# side maps the older attn-processor layout
# (`<block>.attnX.processor.to_*_lora.{down,up}.weight` — what the
# torch-twin fixtures emit); this regex bridges the two.
_LORA_MODULE_RE = re.compile(
    r"^unet\.(.+)\.(attn[12])\.(to_q|to_k|to_v|to_out\.0)"
    r"\.lora\.(down|up)\.weight$"
)


def alias_diffusers_lora_keys(
    tensors: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Accept the reference's LoraLoaderMixin key layout by aliasing
    each `unet.<module>.lora.{down,up}.weight` tensor to the
    attn-processor name `_unet_hf_name` maps."""
    out = dict(tensors)
    for k, v in tensors.items():
        m = _LORA_MODULE_RE.match(k)
        if m:
            block, attn, proj, dd = m.groups()
            proj = "to_out" if proj == "to_out.0" else proj
            out[f"{block}.{attn}.processor.{proj}_lora.{dd}.weight"] = v
    return out


def diffusers_lora_export_name(keys: Tuple[str, ...]) -> Optional[str]:
    """LoraLoaderMixin safetensors key for one lora_a/lora_b leaf of
    the TRAINABLE tree (keys start at the component: unet/text/text2).
    Returns None for non-LoRA leaves. The tensor itself must be
    transposed to torch orientation (down: (rank,in), up: (out,rank))."""
    if len(keys) < 2:
        return None
    comp, rest = keys[0], list(keys[1:])
    if rest and rest[0] == "params":
        rest = rest[1:]
    if not rest or rest[-1] not in ("lora_a", "lora_b"):
        return None
    dd = "down" if rest[-1] == "lora_a" else "up"
    if comp == "unet" and len(rest) == 5:
        top, blk, attn, proj, _ = rest
        if attn not in ("attn1", "attn2"):
            return None
        if top == "mid_attn":
            base = "mid_block.attentions.0"
        else:
            m = re.fullmatch(r"(down|up)_(\d+)_attn_(\d+)", top)
            if not m:
                return None
            base = (f"{m.group(1)}_blocks.{m.group(2)}"
                    f".attentions.{m.group(3)}")
        mb = re.fullmatch(r"blocks_(\d+)", blk)
        if not mb or proj not in ("to_q", "to_k", "to_v", "to_out"):
            return None
        mod = (f"{base}.transformer_blocks.{mb.group(1)}.{attn}."
               + ("to_out.0" if proj == "to_out" else proj))
        return f"unet.{mod}.lora.{dd}.weight"
    if comp in ("text", "text2") and len(rest) == 3:
        layer, proj, _ = rest
        m = re.fullmatch(r"layers_(\d+)", layer)
        if not m or proj not in ("q_proj", "k_proj", "v_proj",
                                 "out_proj"):
            return None
        pre = "text_encoder" if comp == "text" else "text_encoder_2"
        return (f"{pre}.text_model.encoder.layers.{m.group(1)}"
                f".self_attn.{proj}.lora.{dd}.weight")
    return None


def load_lora_safetensors(path: str, unet_params):
    """Import a pytorch_lora_weights.safetensors (either the
    reference's LoraLoaderMixin layout or the attn-processor layout)
    into a UNet param tree. Returns (params, missing)."""
    from safetensors import safe_open

    tensors = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    return convert_tree(
        unet_params, alias_diffusers_lora_keys(tensors), _unet_hf_name
    )


def load_sd_params(snapshot_dir: str, params, pcfg):
    """Load a diffusers SD snapshot (unet/ vae/ text_encoder/
    [text_encoder_2/]) into a pipeline param tree."""
    out = dict(params)
    for comp, sub in [("unet", "unet"), ("vae", "vae"),
                      ("text", "text_encoder"),
                      ("text2", "text_encoder_2")]:
        if comp not in params:
            continue
        d = os.path.join(snapshot_dir, sub)
        if not os.path.isdir(d):
            continue
        tensors = _load_safetensors_dir(d)
        out[comp], missing = convert_tree(
            params[comp], tensors, _MAPPERS[comp]
        )
        if missing:
            import logging

            logging.getLogger("comat_tpu").warning(
                "%s: %d unmapped params (first: %s)", comp, len(missing),
                missing[:3],
            )
    return out
