"""Open-set grounding detector (GroundingDINO) + host-side grounding.

Reference: attr_concen_utils/gsam_interface.py — GroundingDINO grounds
' . '.join(nouns) to boxes (box/text thresholds 0.3/0.25, :92-100);
the torch original needs the compiled `_C` CUDA deformable-attention
extension; here that op is comat_tpu/ops/deformable_attention.py.

The architecture mirrors the released `groundingdino_swint_ogc`
checkpoint module-for-module so the weight converter
(segmentation/gdino_import.py) is an exact name mapping:

  image:  Swin-T backbone -> input_proj (1x1 conv + GroupNorm(32) per
          level, + one 3x3/s2 extra level) -> 4-level pyramid
  text:   BERT-base (12x768) with GroundingDINO's per-phrase
          self-attention masks and position ids -> feat_map (768->256)
  neck:   6x [bi-directional fusion, text self-attn layer, deformable
          image self-attn layer] with sine position embeddings
  query:  two-stage mixed selection — enc_output + grid proposals ->
          top-900 by max token logit -> 4-d reference boxes; learned
          tgt_embed content queries
  head:   6 decoder layers (self-attn, text cross-attn, deformable
          image cross-attn with box-scaled sampling), per-layer 4-d
          box refinement (bbox_embed), parameter-free contrastive
          token logits (raw q . t dot products, GroundingDINO's
          ContrastiveEmbed)

Inference-only — the reference freezes it (gsam_interface.py:54 wraps
everything in no_grad); no gradients flow here.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from comat_tpu.ops.deformable_attention import ms_deformable_attention


@dataclasses.dataclass(frozen=True)
class GDinoConfig:
    hidden: int = 256
    heads: int = 8
    levels: int = 4
    points: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    num_queries: int = 900
    ffn_dim: int = 2048
    # text tower (BERT-base for the released checkpoint)
    text_hidden: int = 768
    text_heads: int = 12
    text_inter: int = 3072
    text_layers: int = 12
    text_vocab: int = 30522
    text_max_pos: int = 512
    max_text_len: int = 64
    backbone: str = "swin"    # "swin" (GroundingDINO-T) or "conv"
    fusion: bool = True       # bi-directional image<->text fusion
    dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def swint_ogc() -> "GDinoConfig":
        """Geometry of the released groundingdino_swint_ogc.pth."""
        return GDinoConfig()

    @staticmethod
    def tiny() -> "GDinoConfig":
        return GDinoConfig(
            hidden=32, heads=2, levels=3, points=2, enc_layers=1,
            dec_layers=1, num_queries=20, ffn_dim=64, text_hidden=32,
            text_heads=2, text_inter=64, text_layers=1, text_vocab=1000,
            text_max_pos=64, max_text_len=16, backbone="conv",
            dtype=jnp.float32,
        )

    @staticmethod
    def tiny_swin() -> "GDinoConfig":
        return dataclasses.replace(GDinoConfig.tiny(), backbone="swin")


class MLP(nn.Module):
    """n-layer ReLU MLP (GroundingDINO's MLP; checkpoint names
    `layers.{i}`)."""

    hidden: int
    out: int
    layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 name=f"l{i}")(x))
        return nn.Dense(self.out, dtype=jnp.float32,
                        name=f"l{self.layers - 1}")(x)


def sine_pos_embed_2d(
    spatial_shapes: Sequence[Tuple[int, int]],
    num_feats: int,
    temperature: float = 20.0,
) -> jnp.ndarray:
    """PositionEmbeddingSineHW over a flattened multi-level pyramid.
    Returns (sum(h*w), 2*num_feats) fp32; channel layout = [y-feats,
    x-feats] each interleaved sin/cos (GroundingDINO's
    position_encoding.py)."""
    parts = []
    dim_t = temperature ** (
        2 * (np.arange(num_feats) // 2) / num_feats
    )
    for h, w in spatial_shapes:
        # cumsum-normalized coordinates: (i+1)/N * 2*pi (torch
        # not_mask.cumsum with normalize=True)
        ys = (np.arange(h, dtype=np.float32) + 1.0) / h * 2 * math.pi
        xs = (np.arange(w, dtype=np.float32) + 1.0) / w * 2 * math.pi
        pos_y = ys[:, None] / dim_t  # (h, F)
        pos_x = xs[:, None] / dim_t
        pos_y = np.stack(
            [np.sin(pos_y[:, 0::2]), np.cos(pos_y[:, 1::2])], axis=2
        ).reshape(h, -1)
        pos_x = np.stack(
            [np.sin(pos_x[:, 0::2]), np.cos(pos_x[:, 1::2])], axis=2
        ).reshape(w, -1)
        grid = np.concatenate(
            [
                np.broadcast_to(pos_y[:, None, :], (h, w, num_feats)),
                np.broadcast_to(pos_x[None, :, :], (h, w, num_feats)),
            ],
            axis=-1,
        )
        parts.append(grid.reshape(h * w, 2 * num_feats))
    return jnp.asarray(np.concatenate(parts, 0), jnp.float32)


def sine_box_embed(boxes: jnp.ndarray, num_feats: int,
                   temperature: float = 10000.0) -> jnp.ndarray:
    """4-d box -> (..., 4*num_feats) sine embedding
    (gen_sineembed_for_position): per coordinate interleaved sin/cos,
    coordinate order (cx, cy, w, h) -> output order (y, x, w, h)."""
    dim_t = temperature ** (
        2 * (jnp.arange(num_feats) // 2) / num_feats
    )

    def embed(coord):
        p = coord[..., None] * 2 * math.pi / dim_t
        return jnp.stack(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        ).reshape(p.shape[:-1] + (num_feats,))

    cx, cy, w, h = (boxes[..., i] for i in range(4))
    return jnp.concatenate(
        [embed(cy), embed(cx), embed(w), embed(h)], axis=-1
    ).astype(jnp.float32)


def _sine_pos_1d(n: int, dim: int,
                 temperature: float = 10000.0) -> jnp.ndarray:
    """Sine embedding of token indices 0..n-1 -> (n, dim)
    (get_sine_pos_embed with exchange_xy=False)."""
    dim_t = temperature ** (2 * (np.arange(dim) // 2) / dim)
    p = (np.arange(n, dtype=np.float32)[:, None] * 2 * math.pi) / dim_t
    out = np.stack([np.sin(p[:, 0::2]), np.cos(p[:, 1::2])],
                   axis=2).reshape(n, dim)
    return jnp.asarray(out, jnp.float32)


def inverse_sigmoid(x, eps=1e-3):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class BertLayer(nn.Module):
    """Post-norm BERT encoder layer (HF naming in the converter)."""

    cfg: GDinoConfig

    @nn.compact
    def __call__(self, x, attn_mask):
        c = self.cfg
        B, S, D = x.shape
        dh = D // c.text_heads
        q = nn.Dense(D, dtype=c.dtype, name="query")(x)
        k = nn.Dense(D, dtype=c.dtype, name="key")(x)
        v = nn.Dense(D, dtype=c.dtype, name="value")(x)
        split = lambda a: a.reshape(B, S, c.text_heads, dh).transpose(
            0, 2, 1, 3
        )
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32) / (dh ** 0.5)
        logits = jnp.where(attn_mask[:, None], logits, -1e30)
        p = jax.nn.softmax(logits, -1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), split(v))
        o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
        x = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name="attn_norm")(
            x + nn.Dense(D, dtype=c.dtype, name="attn_out")(o)
        )
        h = nn.Dense(c.text_inter, dtype=c.dtype, name="intermediate")(x)
        h = nn.Dense(D, dtype=c.dtype, name="output")(
            nn.gelu(h, approximate=False)
        )
        return nn.LayerNorm(epsilon=1e-12, dtype=c.dtype,
                            name="out_norm")(x + h)


class BertTextEncoder(nn.Module):
    """BERT-base text tower with GroundingDINO's per-phrase attention
    masks / position ids (generate_masks_with_special_tokens... in the
    torch repo; computed host-side by `build_text_masks`)."""

    cfg: GDinoConfig

    @nn.compact
    def __call__(self, ids, attn_mask, position_ids):
        c = self.cfg
        t = nn.Embed(c.text_vocab, c.text_hidden, dtype=c.dtype,
                     name="word_embeddings")(ids)
        t = t + nn.Embed(c.text_max_pos, c.text_hidden, dtype=c.dtype,
                         name="position_embeddings")(position_ids)
        t = t + nn.Embed(2, c.text_hidden, dtype=c.dtype,
                         name="token_type_embeddings")(
            jnp.zeros_like(ids)
        )
        t = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name="emb_norm")(t)
        for i in range(c.text_layers):
            t = BertLayer(c, name=f"layer{i}")(t, attn_mask)
        return t


class TextSelfAttnLayer(nn.Module):
    """Post-norm text self-attention layer inside the feature enhancer
    (checkpoint: transformer.encoder.text_layers.{i};
    nhead//2 heads, dim_feedforward//2 FFN in the torch constructor)."""

    cfg: GDinoConfig

    @nn.compact
    def __call__(self, x, mask, pos_text):
        c = self.cfg
        B, S, D = x.shape
        heads = max(c.heads // 2, 1)
        dh = D // heads
        hp = x + pos_text.astype(x.dtype)  # with_pos_embed (q, k only)
        q = nn.Dense(D, dtype=c.dtype, name="q")(hp)
        k = nn.Dense(D, dtype=c.dtype, name="k")(hp)
        v = nn.Dense(D, dtype=c.dtype, name="v")(x)
        split = lambda a: a.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32) / (dh ** 0.5)
        logits = jnp.where(mask[:, None, None, :], logits, -1e30)
        p = jax.nn.softmax(logits, -1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), split(v))
        o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
        x = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="norm1")(
            x + nn.Dense(D, dtype=c.dtype, name="out")(o)
        )
        h = nn.Dense(max(c.ffn_dim // 2, 1), dtype=c.dtype,
                     name="fc1")(x)
        h = nn.Dense(D, dtype=c.dtype, name="fc2")(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="norm2")(x + h)


class DeformableEncoderLayer(nn.Module):
    cfg: GDinoConfig

    @nn.compact
    def __call__(self, src, pos, ref_points, spatial_shapes):
        c = self.cfg
        B, S, D = src.shape
        dh = D // c.heads
        qsrc = src + pos.astype(src.dtype)  # with_pos_embed
        off = nn.Dense(c.heads * c.levels * c.points * 2,
                       dtype=jnp.float32, name="offsets")(qsrc)
        off = off.reshape(B, S, c.heads, c.levels, c.points, 2)
        w = nn.Dense(c.heads * c.levels * c.points, dtype=jnp.float32,
                     name="weights")(qsrc)
        w = jax.nn.softmax(
            w.reshape(B, S, c.heads, c.levels * c.points), axis=-1
        ).reshape(B, S, c.heads, c.levels, c.points)
        value = nn.Dense(D, dtype=c.dtype, name="value")(src)
        value = value.reshape(B, S, c.heads, dh)
        norms = jnp.asarray(
            [[wd, ht] for ht, wd in spatial_shapes], jnp.float32
        )  # (L, 2)
        locs = (
            ref_points[:, :, None, None, None, :]
            + off / norms[None, None, None, :, None, :]
        )
        attn = ms_deformable_attention(value, spatial_shapes, locs, w)
        attn = nn.Dense(D, dtype=c.dtype, name="out")(attn)
        src = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="norm1")(src + attn)
        h = nn.Dense(c.ffn_dim, dtype=c.dtype, name="fc1")(src)
        h = nn.Dense(D, dtype=c.dtype, name="fc2")(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="norm2")(src + h)


class BiAttentionFusion(nn.Module):
    """Bi-directional image<->text cross-attention (GroundingDINO's
    BiMultiHeadAttention inside BiAttentionBlock): pre-layernorms,
    shared vision/text logits, per-channel learned residual gates
    gamma_v / gamma_l. The torch constructor uses embed_dim =
    dim_feedforward//2 (1024) and num_heads = nhead//2 (4)."""

    cfg: GDinoConfig

    @nn.compact
    def __call__(self, img, text, text_mask):
        c = self.cfg
        D = c.hidden
        E = max(c.ffn_dim // 2, c.hidden)   # fusion embed dim (1024)
        heads = max(c.heads // 2, 1)
        B, S, _ = img.shape
        T = text.shape[1]
        dh = E // heads
        vi = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="layer_norm_v")(img)
        li = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="layer_norm_l")(text)
        split = lambda a, n: a.reshape(B, n, heads, dh).transpose(
            0, 2, 1, 3
        )
        q_i = nn.Dense(E, dtype=c.dtype, name="v_proj")(vi)
        k_t = nn.Dense(E, dtype=c.dtype, name="l_proj")(li)
        v_t = nn.Dense(E, dtype=c.dtype, name="values_l_proj")(li)
        v_i = nn.Dense(E, dtype=c.dtype, name="values_v_proj")(vi)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q_i, S), split(k_t, T),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32) / (dh ** 0.5)
        # stability clamps (BiMultiHeadAttention clamp_min/max)
        logits = jnp.clip(logits, -50000.0, 50000.0)
        masked = jnp.where(text_mask[:, None, None, :], logits, -1e30)
        # image attends text
        p_it = jax.nn.softmax(masked, -1)
        i2t = jnp.einsum(
            "bhqk,bhkd->bhqd", p_it.astype(v_t.dtype), split(v_t, T)
        ).transpose(0, 2, 1, 3).reshape(B, S, E)
        # text attends image (transpose the same logits)
        p_ti = jax.nn.softmax(logits.transpose(0, 1, 3, 2), -1)
        t2i = jnp.einsum(
            "bhqk,bhkd->bhqd", p_ti.astype(v_i.dtype), split(v_i, S)
        ).transpose(0, 2, 1, 3).reshape(B, T, E)
        g_i = self.param("gamma_v", nn.initializers.constant(0.125),
                         (D,), jnp.float32)
        g_t = self.param("gamma_l", nn.initializers.constant(0.125),
                         (D,), jnp.float32)
        # BiAttentionBlock replaces the stream with the pre-norm output:
        # the residual base is LN(x), not x (torch fusion_layers
        # reassign `v = layer_norm_v(v)` before `v = v + gamma*delta`)
        img = vi + g_i.astype(img.dtype) * nn.Dense(
            D, dtype=c.dtype, name="out_v_proj")(i2t)
        text = li + g_t.astype(text.dtype) * nn.Dense(
            D, dtype=c.dtype, name="out_l_proj")(t2i)
        return img, text


class DecoderLayer(nn.Module):
    """Query self-attn + text cross-attn + deformable image cross-attn
    (checkpoint: transformer.decoder.layers.{i}). `query_pos` is the
    ref_point_head embedding of the current reference box."""

    cfg: GDinoConfig

    @nn.compact
    def __call__(self, q, query_pos, text, text_mask, src,
                 ref_boxes, spatial_shapes):
        c = self.cfg
        B, Nq, D = q.shape
        dh = D // c.heads
        # per-layer value projection of the encoder memory (the torch
        # MSDeformAttn owns its value_proj)
        src_value = nn.Dense(D, dtype=c.dtype, name="value")(src)
        src_value = src_value.reshape(B, src.shape[1], c.heads, dh)

        def mha(qq, kk, vv, mask):
            split = lambda a, s: a.reshape(B, s, c.heads, dh).transpose(
                0, 2, 1, 3
            )
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", split(qq, qq.shape[1]),
                split(kk, kk.shape[1]),
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32) / (dh ** 0.5)
            if mask is not None:
                logits = jnp.where(mask[:, None, None, :], logits, -1e30)
            p = jax.nn.softmax(logits, -1)
            o = jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(vv.dtype),
                split(vv, vv.shape[1])
            )
            return o.transpose(0, 2, 1, 3).reshape(B, qq.shape[1], D)

        qp = query_pos.astype(q.dtype)
        # self-attention over queries (q = k = tgt + query_pos)
        sa = mha(
            nn.Dense(D, dtype=c.dtype, name="sa_q")(q + qp),
            nn.Dense(D, dtype=c.dtype, name="sa_k")(q + qp),
            nn.Dense(D, dtype=c.dtype, name="sa_v")(q),
            None,
        )
        q = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="norm_sa")(
            q + nn.Dense(D, dtype=c.dtype, name="sa_out")(sa)
        )
        # text cross-attention
        ca = mha(
            nn.Dense(D, dtype=c.dtype, name="ca_q")(q + qp),
            nn.Dense(D, dtype=c.dtype, name="ca_k")(text),
            nn.Dense(D, dtype=c.dtype, name="ca_v")(text),
            text_mask,
        )
        q = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="norm_ca")(
            q + nn.Dense(D, dtype=c.dtype, name="ca_out")(ca)
        )
        # deformable image cross-attention; sampling offsets scaled by
        # the reference box size (deformable DETR box mode)
        off = nn.Dense(c.heads * c.levels * c.points * 2,
                       dtype=jnp.float32, name="offsets")(q + qp)
        off = off.reshape(B, Nq, c.heads, c.levels, c.points, 2)
        w = nn.Dense(c.heads * c.levels * c.points, dtype=jnp.float32,
                     name="weights")(q + qp)
        w = jax.nn.softmax(
            w.reshape(B, Nq, c.heads, c.levels * c.points), -1
        ).reshape(B, Nq, c.heads, c.levels, c.points)
        center = ref_boxes[:, :, None, None, None, :2]
        wh = ref_boxes[:, :, None, None, None, 2:]
        locs = center + off / c.points * wh * 0.5
        da = ms_deformable_attention(src_value, spatial_shapes, locs, w)
        q = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="norm_da")(
            q + nn.Dense(D, dtype=c.dtype, name="da_out")(da)
        )
        h = nn.Dense(c.ffn_dim, dtype=c.dtype, name="fc1")(q)
        h = nn.Dense(D, dtype=c.dtype, name="fc2")(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="norm_ffn")(q + h)


def _contrastive_logits(q, text, text_mask):
    """GroundingDINO ContrastiveEmbed: raw dot products, masked."""
    logits = jnp.einsum(
        "bqd,btd->bqt", q.astype(jnp.float32), text.astype(jnp.float32)
    )
    return jnp.where(text_mask[:, None, :], logits, -1e30)


class GroundingDetector(nn.Module):
    """Grounded detection: (image, text tokens) -> (boxes cxcywh in
    [0,1], per-token grounding logits)."""

    cfg: GDinoConfig

    @nn.compact
    def __call__(self, image, text_ids, text_mask,
                 text_self_mask: Optional[jnp.ndarray] = None,
                 position_ids: Optional[jnp.ndarray] = None):
        c = self.cfg
        dt = c.dtype
        B = image.shape[0]
        T = text_ids.shape[1]
        if text_self_mask is None:
            text_self_mask = (
                text_mask[:, None, :] & text_mask[:, :, None]
            )
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32)[None], (B, T)
            )

        # --- image pyramid: backbone stages + input_proj per level ---
        feats = []
        if c.backbone == "swin":
            from comat_tpu.segmentation.swin import SwinBackbone, SwinConfig

            swin_cfg = (
                SwinConfig(dtype=dt) if c.hidden >= 256
                else SwinConfig.tiny_test()
            )
            stages = SwinBackbone(swin_cfg, name="swin")(image)
        else:
            stages = []
            x = image.astype(dt)
            ch = c.hidden
            for i in range(5):
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            dtype=dt, name=f"bb{i}")(x)
                x = nn.gelu(nn.GroupNorm(epsilon=1e-5, num_groups=min(8, ch), dtype=dt,
                                         name=f"bbn{i}")(x))
                if i >= 2:  # strides 8, 16, 32
                    stages.append(x)
        n_backbone = min(len(stages), c.levels)
        for i in range(n_backbone):
            f = nn.Conv(c.hidden, (1, 1), dtype=dt,
                        name=f"input_proj{i}_conv")(stages[i])
            feats.append(
                nn.GroupNorm(epsilon=1e-5, num_groups=32 if c.hidden % 32 == 0 else 1,
                             dtype=dt, name=f"input_proj{i}_norm")(f)
            )
        for i in range(n_backbone, c.levels):
            # extra level: 3x3 stride-2 conv on the last backbone map
            f = nn.Conv(c.hidden, (3, 3), strides=(2, 2), padding=1,
                        dtype=dt, name=f"input_proj{i}_conv")(stages[-1])
            feats.append(
                nn.GroupNorm(epsilon=1e-5, num_groups=32 if c.hidden % 32 == 0 else 1,
                             dtype=dt, name=f"input_proj{i}_norm")(f)
            )
        spatial_shapes = tuple((f.shape[1], f.shape[2]) for f in feats)
        src = jnp.concatenate(
            [f.reshape(B, -1, c.hidden) for f in feats], axis=1
        )
        # sine position embedding + level embedding (pos is added to
        # attention queries each layer, not baked into src)
        lvl_emb = self.param(
            "level_embed", nn.initializers.normal(0.02),
            (c.levels, c.hidden), jnp.float32,
        )
        parts, refs = [], []
        for l, (h, w) in enumerate(spatial_shapes):
            parts.append(jnp.full((h * w,), l, jnp.int32))
            ys, xs = jnp.meshgrid(
                (jnp.arange(h) + 0.5) / h, (jnp.arange(w) + 0.5) / w,
                indexing="ij",
            )
            refs.append(jnp.stack([xs.ravel(), ys.ravel()], -1))
        pos = sine_pos_embed_2d(spatial_shapes, c.hidden // 2)
        pos = (pos + lvl_emb[jnp.concatenate(parts)])[None]  # (1, S, D)
        ref_points = jnp.broadcast_to(
            jnp.concatenate(refs, 0)[None], (B, src.shape[1], 2)
        )

        # --- text tower: BERT + feat_map projection ---
        t_raw = BertTextEncoder(c, name="bert")(
            text_ids, text_self_mask, position_ids
        )
        t = nn.Dense(c.hidden, dtype=dt, name="feat_map")(t_raw)

        # --- feature enhancer: fusion + text layer + image layer ---
        # text positional embedding: sine embed of token index
        # (get_sine_pos_embed, param-free)
        pos_text = _sine_pos_1d(T, c.hidden)[None]
        for i in range(c.enc_layers):
            if c.fusion:
                src, t = BiAttentionFusion(c, name=f"fuse{i}")(
                    src, t, text_mask
                )
            t = TextSelfAttnLayer(c, name=f"text_enc{i}")(
                t, text_mask, pos_text
            )
            src = DeformableEncoderLayer(c, name=f"enc{i}")(
                src, pos, ref_points, spatial_shapes
            )

        # --- two-stage mixed query selection ---
        # enc_output + norm; grid proposals (wh = 0.05 * 2^lvl);
        # top-k positions by max contrastive token logit; reference
        # boxes = sigmoid(bbox_delta + inverse_sigmoid(proposals)).
        mem = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="enc_output_norm")(
            nn.Dense(c.hidden, dtype=dt, name="enc_output")(src)
        )
        scale_parts = []
        for l, (h, w) in enumerate(spatial_shapes):
            scale_parts.append(
                jnp.full((h * w, 2), 0.05 * (2.0 ** l), jnp.float32)
            )
        proposals = jnp.concatenate(
            [ref_points, jnp.broadcast_to(
                jnp.concatenate(scale_parts, 0)[None],
                (B,) + ref_points.shape[1:],
            )], axis=-1,
        )  # (B, S, 4) cxcywh
        enc_logits = _contrastive_logits(mem, t, text_mask)
        sel_score = enc_logits.max(-1)  # (B, S)
        k = min(c.num_queries, sel_score.shape[1])
        _, top_idx = jax.lax.top_k(sel_score, k)  # (B, k)
        sel_mem = jnp.take_along_axis(mem, top_idx[..., None], axis=1)
        sel_prop = jnp.take_along_axis(
            proposals, top_idx[..., None], axis=1
        )
        delta = MLP(c.hidden, 4, 3, dt, name="enc_out_bbox_embed")(sel_mem)
        qr = jax.nn.sigmoid(delta + inverse_sigmoid(sel_prop))
        if k < c.num_queries:
            qr = jnp.pad(qr, ((0, 0), (0, c.num_queries - k), (0, 0)),
                         constant_values=0.5)
        qemb = self.param(
            "tgt_embed", nn.initializers.normal(0.02),
            (c.num_queries, c.hidden), jnp.float32,
        )
        q = jnp.broadcast_to(qemb[None].astype(dt), (B,) + qemb.shape)

        # --- decoder with iterative 4-d box refinement ---
        qr = jnp.clip(qr, 1e-4, 1 - 1e-4)
        # ref_point_head MLP and the decoder output LayerNorm are each
        # a single torch module applied per layer — instantiate once
        ref_point_head = MLP(c.hidden, c.hidden, 2, dt,
                             name="ref_point_head")
        dec_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="dec_norm")
        normed = q
        for i in range(c.dec_layers):
            query_pos = ref_point_head(sine_box_embed(qr, c.hidden // 2))
            q = DecoderLayer(c, name=f"dec{i}")(
                q, query_pos, t, text_mask, src, qr, spatial_shapes
            )
            # heads consume the *normed* output; raw q feeds the next
            # layer (DeformableTransformerDecoder.norm semantics)
            normed = dec_norm(q)
            delta = MLP(c.hidden, 4, 3, dt, name=f"bbox_embed{i}")(normed)
            qr = jnp.clip(
                jax.nn.sigmoid(delta + inverse_sigmoid(qr)), 1e-4,
                1 - 1e-4,
            )

        boxes = qr  # (B, Nq, 4) cxcywh
        token_logits = _contrastive_logits(normed, t, text_mask)
        return boxes, token_logits


def cxcywh_to_xyxy(boxes: np.ndarray, img_w: float = 1.0,
                   img_h: float = 1.0) -> np.ndarray:
    """Normalized cxcywh -> xyxy, optionally scaled to pixel coords."""
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return np.stack(
        [(cx - w / 2) * img_w, (cy - h / 2) * img_h,
         (cx + w / 2) * img_w, (cy + h / 2) * img_h], axis=-1,
    )


def build_text_masks(
    ids: np.ndarray,
    special_ids: Sequence[int],
) -> Tuple[np.ndarray, np.ndarray]:
    """GroundingDINO's generate_masks_with_special_tokens_and_transfer_map:
    tokens attend only within their '.'-separated phrase; special tokens
    ([CLS]/[SEP]/'.') attend only to themselves; position ids restart at
    0 after each special token.

    Args:
      ids: (B, T) int token ids.
      special_ids: ids treated as separators.

    Returns:
      (self_mask (B, T, T) bool, position_ids (B, T) int32).
    """
    B, T = ids.shape
    special = np.isin(ids, np.asarray(list(special_ids)))
    mask = np.zeros((B, T, T), bool)
    pos = np.zeros((B, T), np.int64)
    idx = np.arange(T)
    mask[:, idx, idx] = True
    for b in range(B):
        prev = 0
        for i in range(T):
            if special[b, i]:
                mask[b, prev : i + 1, prev : i + 1] = True
                pos[b, prev : i + 1] = np.arange(0, i + 1 - prev)
                prev = i + 1
        if prev < T:
            mask[b, prev:T, prev:T] = True
            pos[b, prev:T] = np.arange(0, T - prev)
    return mask, pos.astype(np.int32)


def ground_nouns(
    boxes: np.ndarray,          # (Nq, 4) cxcywh [0,1]
    token_logits: np.ndarray,   # (Nq, T)
    noun_spans: List[Tuple[int, int]],  # token index ranges per noun
    box_threshold: float = 0.3,
    text_threshold: float = 0.25,
) -> Dict[int, List[np.ndarray]]:
    """Host-side grounding: assign boxes to nouns (reference
    gsam_interface.py:92-116 semantics — boxes above box_threshold whose
    max token prob lies in a noun's span above text_threshold)."""
    # numerically stable sigmoid (large negative logits overflow exp)
    probs = np.where(
        token_logits >= 0,
        1.0 / (1.0 + np.exp(-np.clip(token_logits, 0, None))),
        np.exp(np.clip(token_logits, None, 0))
        / (1.0 + np.exp(np.clip(token_logits, None, 0))),
    )
    scores = probs.max(-1)
    out: Dict[int, List[np.ndarray]] = {}
    for i in range(len(boxes)):
        if scores[i] < box_threshold:
            continue
        for ni, (a, b) in enumerate(noun_spans):
            span = probs[i, a:b]
            if span.size and span.max() > text_threshold:
                out.setdefault(ni, []).append(boxes[i])
    return out
