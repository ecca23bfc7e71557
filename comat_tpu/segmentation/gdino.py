"""Open-set grounding detector (GroundingDINO-style) + the composed
Grounded-SAM segmenter.

Reference: attr_concen_utils/gsam_interface.py — GroundingDINO grounds
' . '.join(nouns) to boxes (box/text thresholds 0.3/0.25, :92-100),
FastSAM proposes masks, box_prompt unions per-noun masks (:111-137).
The torch original needs the compiled `_C` CUDA deformable-attention
extension; here that op is comat_tpu/ops/deformable_attention.py.

Scope (round 1): the full detection graph — multi-scale features ->
deformable-attention encoder -> text encoder -> cross-modality decoder
-> grounded boxes by token-span similarity — at parameterized scale,
jit-compiled and shape/behaviour-tested with random weights. The image
backbone is a conv pyramid (the reference checkpoint uses Swin-T;
backbone is pluggable and the Swin port + weight import is scheduled
next round — inference-only parity, no gradients flow here:
gsam_interface.py:54 wraps everything in no_grad).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from comat_tpu.ops.deformable_attention import ms_deformable_attention


@dataclasses.dataclass(frozen=True)
class GDinoConfig:
    hidden: int = 256
    heads: int = 8
    levels: int = 3
    points: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    num_queries: int = 900
    text_hidden: int = 256
    text_layers: int = 6
    text_vocab: int = 30524
    max_text_len: int = 64
    backbone: str = "swin"    # "swin" (GroundingDINO-T) or "conv"
    fusion: bool = True       # bi-directional image<->text fusion
    dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def tiny() -> "GDinoConfig":
        return GDinoConfig(
            hidden=32, heads=2, levels=3, points=2, enc_layers=1,
            dec_layers=1, num_queries=20, text_hidden=32, text_layers=1,
            text_vocab=1000, max_text_len=16, backbone="conv",
            dtype=jnp.float32,
        )

    @staticmethod
    def tiny_swin() -> "GDinoConfig":
        return GDinoConfig(
            hidden=32, heads=2, levels=3, points=2, enc_layers=1,
            dec_layers=1, num_queries=20, text_hidden=32, text_layers=1,
            text_vocab=1000, max_text_len=16, backbone="swin",
            dtype=jnp.float32,
        )


class MLP(nn.Module):
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


class DeformableEncoderLayer(nn.Module):
    cfg: GDinoConfig

    @nn.compact
    def __call__(self, src, ref_points, spatial_shapes):
        c = self.cfg
        B, S, D = src.shape
        dh = D // c.heads
        # predict sampling offsets + weights from queries
        off = nn.Dense(c.heads * c.levels * c.points * 2, dtype=jnp.float32,
                       name="offsets")(src)
        off = off.reshape(B, S, c.heads, c.levels, c.points, 2)
        w = nn.Dense(c.heads * c.levels * c.points, dtype=jnp.float32,
                     name="weights")(src)
        w = jax.nn.softmax(
            w.reshape(B, S, c.heads, c.levels * c.points), axis=-1
        ).reshape(B, S, c.heads, c.levels, c.points)
        value = nn.Dense(D, dtype=c.dtype, name="value")(src)
        value = value.reshape(B, S, c.heads, dh)
        # normalize offsets by level size
        norms = jnp.asarray(
            [[wd, ht] for ht, wd in spatial_shapes], jnp.float32
        )  # (L, 2)
        locs = (
            ref_points[:, :, None, None, None, :]
            + off / norms[None, None, None, :, None, :]
        )
        attn = ms_deformable_attention(value, spatial_shapes, locs, w)
        attn = nn.Dense(D, dtype=c.dtype, name="out")(attn)
        src = nn.LayerNorm(dtype=c.dtype, name="norm1")(src + attn)
        h = nn.Dense(4 * D, dtype=c.dtype, name="fc1")(src)
        h = nn.Dense(D, dtype=c.dtype, name="fc2")(nn.relu(h))
        return nn.LayerNorm(dtype=c.dtype, name="norm2")(src + h)


class TextEncoderLayer(nn.Module):
    cfg: GDinoConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        B, S, D = x.shape
        dh = D // c.heads
        q = nn.Dense(D, dtype=c.dtype, name="q")(x)
        k = nn.Dense(D, dtype=c.dtype, name="k")(x)
        v = nn.Dense(D, dtype=c.dtype, name="v")(x)
        split = lambda a: a.reshape(B, S, c.heads, dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)).astype(
            jnp.float32
        ) / (dh ** 0.5)
        logits = jnp.where(mask[:, None, None, :], logits, -1e30)
        p = jax.nn.softmax(logits, -1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), split(v))
        o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
        x = nn.LayerNorm(dtype=c.dtype, name="norm1")(
            x + nn.Dense(D, dtype=c.dtype, name="out")(o)
        )
        h = nn.Dense(4 * D, dtype=c.dtype, name="fc1")(x)
        h = nn.Dense(D, dtype=c.dtype, name="fc2")(nn.gelu(h))
        return nn.LayerNorm(dtype=c.dtype, name="norm2")(x + h)


class BiAttentionFusion(nn.Module):
    """Bi-directional image<->text cross-attention (GroundingDINO's
    feature-enhancer fusion), with residual gates (tanh-scaled)."""

    cfg: GDinoConfig

    @nn.compact
    def __call__(self, img, text, text_mask):
        c = self.cfg
        D = c.hidden
        B, S, _ = img.shape
        T = text.shape[1]
        dh = D // c.heads
        split = lambda a, n: a.reshape(B, n, c.heads, dh).transpose(
            0, 2, 1, 3
        )
        q_i = nn.Dense(D, dtype=c.dtype, name="img_q")(img)
        k_t = nn.Dense(D, dtype=c.dtype, name="txt_k")(text)
        v_t = nn.Dense(D, dtype=c.dtype, name="txt_v")(text)
        v_i = nn.Dense(D, dtype=c.dtype, name="img_v")(img)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q_i, S), split(k_t, T)
        ).astype(jnp.float32) / (dh ** 0.5)
        logits = jnp.where(text_mask[:, None, None, :], logits, -1e30)
        # image attends text
        p_it = jax.nn.softmax(logits, -1)
        i2t = jnp.einsum(
            "bhqk,bhkd->bhqd", p_it.astype(v_t.dtype), split(v_t, T)
        ).transpose(0, 2, 1, 3).reshape(B, S, D)
        # text attends image (transpose the same logits)
        p_ti = jax.nn.softmax(logits.transpose(0, 1, 3, 2), -1)
        t2i = jnp.einsum(
            "bhqk,bhkd->bhqd", p_ti.astype(v_i.dtype), split(v_i, S)
        ).transpose(0, 2, 1, 3).reshape(B, T, D)
        g_i = self.param("gate_img", nn.initializers.zeros_init(), (),
                         jnp.float32)
        g_t = self.param("gate_txt", nn.initializers.zeros_init(), (),
                         jnp.float32)
        img = img + jnp.tanh(g_i) * nn.Dense(
            D, dtype=c.dtype, name="img_out")(i2t)
        text = text + jnp.tanh(g_t) * nn.Dense(
            D, dtype=c.dtype, name="txt_out")(t2i)
        return img, text


class DecoderLayer(nn.Module):
    """Query self-attn + text cross-attn + deformable image cross-attn."""

    cfg: GDinoConfig

    @nn.compact
    def __call__(self, q, text, text_mask, src_value, ref_points,
                 spatial_shapes):
        c = self.cfg
        B, Nq, D = q.shape
        dh = D // c.heads

        def mha(qq, kk, vv, mask, prefix):
            split = lambda a, s: a.reshape(B, s, c.heads, dh).transpose(
                0, 2, 1, 3
            )
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", split(qq, qq.shape[1]),
                split(kk, kk.shape[1]),
            ).astype(jnp.float32) / (dh ** 0.5)
            if mask is not None:
                logits = jnp.where(mask[:, None, None, :], logits, -1e30)
            p = jax.nn.softmax(logits, -1)
            o = jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(vv.dtype), split(vv, vv.shape[1])
            )
            return o.transpose(0, 2, 1, 3).reshape(B, qq.shape[1], D)

        # self-attention over queries
        sa = mha(
            nn.Dense(D, dtype=c.dtype, name="sa_q")(q),
            nn.Dense(D, dtype=c.dtype, name="sa_k")(q),
            nn.Dense(D, dtype=c.dtype, name="sa_v")(q),
            None, "sa",
        )
        q = nn.LayerNorm(dtype=c.dtype, name="norm1")(
            q + nn.Dense(D, dtype=c.dtype, name="sa_out")(sa)
        )
        # text cross-attention
        ca = mha(
            nn.Dense(D, dtype=c.dtype, name="ca_q")(q),
            nn.Dense(D, dtype=c.dtype, name="ca_k")(text),
            nn.Dense(D, dtype=c.dtype, name="ca_v")(text),
            text_mask, "ca",
        )
        q = nn.LayerNorm(dtype=c.dtype, name="norm2")(
            q + nn.Dense(D, dtype=c.dtype, name="ca_out")(ca)
        )
        # deformable image cross-attention
        off = nn.Dense(c.heads * c.levels * c.points * 2, dtype=jnp.float32,
                       name="offsets")(q)
        off = off.reshape(B, Nq, c.heads, c.levels, c.points, 2)
        w = nn.Dense(c.heads * c.levels * c.points, dtype=jnp.float32,
                     name="weights")(q)
        w = jax.nn.softmax(
            w.reshape(B, Nq, c.heads, c.levels * c.points), -1
        ).reshape(B, Nq, c.heads, c.levels, c.points)
        norms = jnp.asarray([[wd, ht] for ht, wd in spatial_shapes],
                            jnp.float32)
        locs = (
            ref_points[:, :, None, None, None, :]
            + off / norms[None, None, None, :, None, :]
        )
        da = ms_deformable_attention(src_value, spatial_shapes, locs, w)
        q = nn.LayerNorm(dtype=c.dtype, name="norm3")(
            q + nn.Dense(D, dtype=c.dtype, name="da_out")(da)
        )
        h = nn.Dense(4 * D, dtype=c.dtype, name="fc1")(q)
        h = nn.Dense(D, dtype=c.dtype, name="fc2")(nn.relu(h))
        return nn.LayerNorm(dtype=c.dtype, name="norm4")(q + h)


class GroundingDetector(nn.Module):
    """Grounded detection: (image, text tokens) -> (boxes cxcywh in
    [0,1], per-token grounding logits)."""

    cfg: GDinoConfig

    @nn.compact
    def __call__(self, image, text_ids, text_mask):
        c = self.cfg
        dt = c.dtype
        B = image.shape[0]
        # --- image pyramid ---
        feats = []
        if c.backbone == "swin":
            from comat_tpu.segmentation.swin import SwinBackbone, SwinConfig

            swin_cfg = (
                SwinConfig(dtype=dt) if c.hidden >= 256
                else SwinConfig.tiny_test()
            )
            stages = SwinBackbone(swin_cfg, name="swin")(image)
            for i, f in enumerate(stages[: c.levels]):
                feats.append(
                    nn.Conv(c.hidden, (1, 1), dtype=dt, name=f"lat{i}")(f)
                )
        else:
            x = image.astype(dt)
            ch = c.hidden
            for i in range(c.levels + 2):
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, dtype=dt,
                            name=f"bb{i}")(x)
                x = nn.gelu(nn.GroupNorm(num_groups=min(8, ch), dtype=dt,
                                         name=f"bbn{i}")(x))
                if i >= 2:  # strides 8, 16, 32
                    feats.append(
                        nn.Conv(c.hidden, (1, 1), dtype=dt,
                                name=f"lat{i}")(x)
                    )
        spatial_shapes = tuple(
            (f.shape[1], f.shape[2]) for f in feats
        )
        src = jnp.concatenate(
            [f.reshape(B, -1, c.hidden) for f in feats], axis=1
        )
        # level embedding + reference points (normalized grid centers)
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
        src = src + lvl_emb[jnp.concatenate(parts)].astype(dt)
        ref_points = jnp.broadcast_to(
            jnp.concatenate(refs, 0)[None], (B, src.shape[1], 2)
        )

        # --- text (BERT-style stack) ---
        t = nn.Embed(c.text_vocab, c.text_hidden, dtype=dt,
                     name="text_embed")(text_ids)
        pos = self.param(
            "text_pos", nn.initializers.normal(0.02),
            (c.max_text_len, c.text_hidden), jnp.float32,
        )
        t = t + pos[: t.shape[1]].astype(dt)
        for i in range(c.text_layers):
            t = TextEncoderLayer(c, name=f"text{i}")(t, text_mask)
        t = nn.Dense(c.hidden, dtype=dt, name="text_proj")(t)

        # --- feature enhancer: deformable image self-attn interleaved
        # with bi-directional image<->text fusion (GroundingDINO) ---
        for i in range(c.enc_layers):
            if c.fusion:
                src, t = BiAttentionFusion(c, name=f"fuse{i}")(
                    src, t, text_mask
                )
            src = DeformableEncoderLayer(c, name=f"enc{i}")(
                src, ref_points, spatial_shapes
            )

        # --- language-guided query selection (mixed query selection:
        # top-k positions from encoder-output/text similarity, learned
        # content embeddings) ---
        enc_norm = src / jnp.maximum(
            jnp.linalg.norm(src.astype(jnp.float32), axis=-1,
                            keepdims=True), 1e-6,
        )
        t_norm = t / jnp.maximum(
            jnp.linalg.norm(t.astype(jnp.float32), axis=-1, keepdims=True),
            1e-6,
        )
        sim = jnp.einsum(
            "bsd,btd->bst", enc_norm.astype(jnp.float32),
            t_norm.astype(jnp.float32),
        )
        sim = jnp.where(text_mask[:, None, :], sim, -1e30)
        sel_score = sim.max(-1)  # (B, S)
        k = min(c.num_queries, sel_score.shape[1])
        _, top_idx = jax.lax.top_k(sel_score, k)  # (B, k)
        qr = jnp.take_along_axis(ref_points, top_idx[..., None], axis=1)
        if k < c.num_queries:
            qr = jnp.pad(qr, ((0, 0), (0, c.num_queries - k), (0, 0)),
                         constant_values=0.5)
        qemb = self.param(
            "query_embed", nn.initializers.normal(0.02),
            (c.num_queries, c.hidden), jnp.float32,
        )
        q = jnp.broadcast_to(qemb[None].astype(dt), (B,) + qemb.shape)

        # --- decoder with iterative box refinement ---
        src_value = src.reshape(B, src.shape[1], c.heads,
                                c.hidden // c.heads)
        qr = jnp.clip(qr, 1e-4, 1 - 1e-4)
        for i in range(c.dec_layers):
            q = DecoderLayer(c, name=f"dec{i}")(
                q, t, text_mask, src_value, qr, spatial_shapes
            )
            delta = MLP(c.hidden, 2, 3, dt, name=f"refine{i}")(q)
            qr = jnp.clip(
                jax.nn.sigmoid(
                    jax.scipy.special.logit(qr) + delta.astype(jnp.float32)
                ),
                1e-4, 1 - 1e-4,
            )
        boxes = jax.nn.sigmoid(
            MLP(c.hidden, 4, 3, dt, name="box_head")(q)
            + jnp.concatenate([jax.scipy.special.logit(qr),
                               jnp.zeros_like(qr)], -1)
        )  # (B, Nq, 4) cxcywh
        # grounding logits: query-token similarity (GroundingDINO's
        # contrastive alignment head)
        qn = q / jnp.maximum(jnp.linalg.norm(q.astype(jnp.float32),
                                             axis=-1, keepdims=True), 1e-6)
        tn = t / jnp.maximum(jnp.linalg.norm(t.astype(jnp.float32),
                                             axis=-1, keepdims=True), 1e-6)
        logit_scale = self.param(
            "logit_scale", nn.initializers.constant(2.0), (), jnp.float32
        )
        token_logits = (
            jnp.einsum("bqd,btd->bqt", qn.astype(jnp.float32),
                       tn.astype(jnp.float32)) * jnp.exp(logit_scale)
        )
        token_logits = jnp.where(
            text_mask[:, None, :], token_logits, -1e30
        )
        return boxes, token_logits


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


def cxcywh_to_xyxy(box: np.ndarray, W: int, H: int) -> np.ndarray:
    cx, cy, w, h = box
    return np.array(
        [(cx - w / 2) * W, (cy - h / 2) * H, (cx + w / 2) * W,
         (cy + h / 2) * H]
    )
