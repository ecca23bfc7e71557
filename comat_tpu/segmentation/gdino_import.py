"""GroundingDINO (groundingdino_swint_ogc.pth) weight import.

The reference loads the released swin-t checkpoint through the
GroundingDINO package (attr_concen_utils/gsam_interface.py:31-37); this
converter brings those weights into the Flax GroundingDetector, whose
module tree mirrors the torch model (see segmentation/gdino.py).

Name mapping notes:
- torch Linear weight (out, in) -> flax Dense kernel (in, out): transpose
- torch nn.MultiheadAttention packs q/k/v into in_proj_weight (3D, D):
  split into thirds, transpose each
- conv OIHW -> flax HWIO
- Swin patch-merging concatenates 2x2 sub-pixels in order
  (x[0::2,0::2], x[1::2,0::2], x[0::2,1::2], x[1::2,1::2]) while the
  flax reshape produces (hsub, wsub) row-major = (x00, x01, x10, x11);
  the reduction kernel's input blocks are permuted accordingly
- checkpoint keys may carry a "module." prefix (DDP save): stripped

Structurally validated against a synthetic state dict in
tests/test_grounded_sam.py; real-checkpoint validation requires the
.pth file (zero-egress environments ship none).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np


def _t(x):
    return np.asarray(x).T


def _id(x):
    return np.asarray(x)


def _conv(x):
    return np.transpose(np.asarray(x), (2, 3, 1, 0))


def _split3_w(i):
    def f(x):
        x = np.asarray(x)
        d = x.shape[0] // 3
        return x[i * d : (i + 1) * d].T

    return f


def _split3_b(i):
    def f(x):
        x = np.asarray(x)
        d = x.shape[0] // 3
        return x[i * d : (i + 1) * d]

    return f


def _merge_perm(x):
    """Swin patch-merging reduction weight: permute the 4C input blocks
    from torch order (x00, x10, x01, x11) to flax order
    (x00, x01, x10, x11), then transpose to (in, out)."""
    x = np.asarray(x)  # (2C, 4C)
    c = x.shape[1] // 4
    blocks = [x[:, 0 * c : 1 * c], x[:, 1 * c : 2 * c],
              x[:, 2 * c : 3 * c], x[:, 3 * c : 4 * c]]
    # torch cat order: x0=x[0::2,0::2], x1=x[1::2,0::2], x2=x[0::2,1::2],
    # x3=x[1::2,1::2] -> (hsub,wsub) = (0,0),(1,0),(0,1),(1,1)
    # flax order: (0,0),(0,1),(1,0),(1,1) -> take torch blocks 0,2,1,3
    return np.concatenate(
        [blocks[0], blocks[2], blocks[1], blocks[3]], axis=1
    ).T


def _merge_norm_perm(x):
    """Patch-merging norm scale/bias live on the same 4C concat axis as
    the reduction input: apply the identical torch->flax block permute
    (LayerNorm statistics are permutation-invariant; the per-channel
    affine is not)."""
    x = np.asarray(x)  # (4C,)
    c = x.shape[0] // 4
    b = [x[0 * c : 1 * c], x[1 * c : 2 * c],
         x[2 * c : 3 * c], x[3 * c : 4 * c]]
    return np.concatenate([b[0], b[2], b[1], b[3]])


def _dense(base: str, leaf: str):
    return (f"{base}.weight", _t) if leaf == "kernel" else (
        f"{base}.bias", _id
    )


def _norm(base: str, leaf: str):
    return (f"{base}.weight", _id) if leaf == "scale" else (
        f"{base}.bias", _id
    )


_QKV_SLOT = {"q": 0, "k": 1, "v": 2}


def _packed_mha(base: str, sub: str, leaf: str):
    """nn.MultiheadAttention: {q,k,v} from packed in_proj, out from
    out_proj."""
    if sub in _QKV_SLOT:
        i = _QKV_SLOT[sub]
        if leaf == "kernel":
            return f"{base}.in_proj_weight", _split3_w(i)
        return f"{base}.in_proj_bias", _split3_b(i)
    return _dense(f"{base}.out_proj", leaf)


def _mlp(base: str, sub: str, leaf: str):
    m = re.fullmatch(r"l(\d+)", sub)
    return _dense(f"{base}.layers.{m.group(1)}", leaf)


def _swin(p, leaf):
    base = "backbone.0"
    top = p[0]
    if top == "patch_embed":
        if leaf == "kernel":
            return f"{base}.patch_embed.proj.weight", _conv
        return f"{base}.patch_embed.proj.bias", _id
    if top == "patch_norm":
        return _norm(f"{base}.patch_embed.norm", leaf)
    m = re.fullmatch(r"stage(\d+)_block(\d+)", top)
    if m:
        blk = f"{base}.layers.{m.group(1)}.blocks.{m.group(2)}"
        sub = p[1]
        if sub == "attn":
            if p[2] == "rel_pos_bias":
                return f"{blk}.attn.relative_position_bias_table", _id
            return _dense(f"{blk}.attn.{p[2]}", leaf)
        if sub in ("norm1", "norm2"):
            return _norm(f"{blk}.{sub}", leaf)
        if sub in ("fc1", "fc2"):
            return _dense(f"{blk}.mlp.{sub}", leaf)
        return None
    m = re.fullmatch(r"merge_norm(\d+)", top)
    if m:
        nb = f"{base}.layers.{m.group(1)}.downsample.norm"
        return (
            (f"{nb}.weight", _merge_norm_perm) if leaf == "scale"
            else (f"{nb}.bias", _merge_norm_perm)
        )
    m = re.fullmatch(r"merge(\d+)", top)
    if m:
        return (
            f"{base}.layers.{m.group(1)}.downsample.reduction.weight",
            _merge_perm,
        )
    m = re.fullmatch(r"out_norm(\d+)", top)
    if m:
        return _norm(f"{base}.norm{m.group(1)}", leaf)
    return None


def _bert(p, leaf):
    base = "bert"
    top = p[0]
    if top in ("word_embeddings", "position_embeddings",
               "token_type_embeddings"):
        return f"{base}.embeddings.{top}.weight", _id
    if top == "emb_norm":
        return _norm(f"{base}.embeddings.LayerNorm", leaf)
    m = re.fullmatch(r"layer(\d+)", top)
    if m:
        lb = f"{base}.encoder.layer.{m.group(1)}"
        sub = p[1]
        if sub in ("query", "key", "value"):
            return _dense(f"{lb}.attention.self.{sub}", leaf)
        if sub == "attn_out":
            return _dense(f"{lb}.attention.output.dense", leaf)
        if sub == "attn_norm":
            return _norm(f"{lb}.attention.output.LayerNorm", leaf)
        if sub == "intermediate":
            return _dense(f"{lb}.intermediate.dense", leaf)
        if sub == "output":
            return _dense(f"{lb}.output.dense", leaf)
        if sub == "out_norm":
            return _norm(f"{lb}.output.LayerNorm", leaf)
    return None


_ENC_DEFORM = {
    "offsets": "sampling_offsets", "weights": "attention_weights",
    "value": "value_proj", "out": "output_proj",
}
_DEC_DEFORM = {
    "offsets": "sampling_offsets", "weights": "attention_weights",
    "value": "value_proj", "da_out": "output_proj",
}
_DEC_NORM = {
    "norm_sa": "norm2", "norm_ca": "catext_norm", "norm_da": "norm1",
    "norm_ffn": "norm3",
}


def gdino_hf_name(
    path: Tuple[str, ...]
) -> Optional[Tuple[str, Callable]]:
    """Our param path (under 'params') -> (checkpoint name, transform)."""
    p = list(path)
    top = p[0]
    leaf = p[-1]

    if top == "swin":
        return _swin(p[1:], leaf)
    if top == "bert":
        return _bert(p[1:], leaf)
    if top == "feat_map":
        return _dense("feat_map", leaf)
    m = re.fullmatch(r"input_proj(\d+)_(conv|norm)", top)
    if m:
        lvl, kind = m.group(1), m.group(2)
        if kind == "conv":
            if leaf == "kernel":
                return f"input_proj.{lvl}.0.weight", _conv
            return f"input_proj.{lvl}.0.bias", _id
        return _norm(f"input_proj.{lvl}.1", leaf)
    if top == "level_embed":
        return "transformer.level_embed", _id
    m = re.fullmatch(r"fuse(\d+)", top)
    if m:
        fb = f"transformer.encoder.fusion_layers.{m.group(1)}"
        sub = p[1]
        if sub in ("gamma_v", "gamma_l"):
            return f"{fb}.{sub}", _id
        if sub in ("layer_norm_v", "layer_norm_l"):
            return _norm(f"{fb}.{sub}", leaf)
        return _dense(f"{fb}.attn.{sub}", leaf)
    m = re.fullmatch(r"text_enc(\d+)", top)
    if m:
        tb = f"transformer.encoder.text_layers.{m.group(1)}"
        sub = p[1]
        if sub in ("q", "k", "v", "out"):
            return _packed_mha(f"{tb}.self_attn", sub, leaf)
        if sub in ("norm1", "norm2"):
            return _norm(f"{tb}.{sub}", leaf)
        if sub in ("fc1", "fc2"):
            return _dense(
                f"{tb}.linear{1 if sub == 'fc1' else 2}", leaf
            )
    m = re.fullmatch(r"enc(\d+)", top)
    if m:
        eb = f"transformer.encoder.layers.{m.group(1)}"
        sub = p[1]
        if sub in _ENC_DEFORM:
            return _dense(f"{eb}.self_attn.{_ENC_DEFORM[sub]}", leaf)
        if sub in ("norm1", "norm2"):
            return _norm(f"{eb}.{sub}", leaf)
        if sub in ("fc1", "fc2"):
            return _dense(
                f"{eb}.linear{1 if sub == 'fc1' else 2}", leaf
            )
    if top == "enc_output":
        return _dense("transformer.enc_output", leaf)
    if top == "enc_output_norm":
        return _norm("transformer.enc_output_norm", leaf)
    if top == "enc_out_bbox_embed":
        return _mlp("transformer.enc_out_bbox_embed", p[1], leaf)
    if top == "tgt_embed":
        return "transformer.tgt_embed.weight", _id
    if top == "ref_point_head":
        return _mlp("transformer.decoder.ref_point_head", p[1], leaf)
    if top == "dec_norm":
        return _norm("transformer.decoder.norm", leaf)
    m = re.fullmatch(r"dec(\d+)", top)
    if m:
        db = f"transformer.decoder.layers.{m.group(1)}"
        sub = p[1]
        if sub.startswith("sa_"):
            return _packed_mha(f"{db}.self_attn", sub[3:], leaf)
        if sub.startswith("ca_"):
            return _packed_mha(f"{db}.ca_text", sub[3:], leaf)
        if sub in _DEC_DEFORM:
            return _dense(f"{db}.cross_attn.{_DEC_DEFORM[sub]}", leaf)
        if sub in _DEC_NORM:
            return _norm(f"{db}.{_DEC_NORM[sub]}", leaf)
        if sub in ("fc1", "fc2"):
            return _dense(
                f"{db}.linear{1 if sub == 'fc1' else 2}", leaf
            )
    m = re.fullmatch(r"bbox_embed(\d+)", top)
    if m:
        return _mlp(
            f"transformer.decoder.bbox_embed.{m.group(1)}", p[1], leaf
        )
    return None


def load_gdino_params(state_dict: Dict[str, np.ndarray], variables):
    """Fill a GroundingDetector variables dict from the released
    checkpoint state dict (torch tensors or numpy arrays). Strips a
    leading "module." prefix if present. Returns (variables, missing)."""
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }
    missing = []

    def fill(path, leaf):
        keys = tuple(
            str(getattr(q, "key", getattr(q, "name", q))) for q in path
        )
        res = gdino_hf_name(keys)
        if res is None:
            missing.append("/".join(keys))
            return leaf
        name, f = res
        if name not in sd:
            missing.append(f"{'/'.join(keys)} -> {name}")
            return leaf
        arr = f(sd[name]).astype(np.asarray(leaf).dtype)
        assert arr.shape == leaf.shape, (name, arr.shape, leaf.shape)
        return jax.numpy.asarray(arr)

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map_with_path(
        fill, variables["params"]
    )
    return out, missing
