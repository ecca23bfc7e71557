"""BLIP-VQA in Flax — the T2I-CompBench attribute-binding scorer.

The CoMat paper reports quality on T2I-CompBench, whose attribute-
binding metrics (color/texture/shape) are BLIP-VQA scores
(reference README.md:3 cites the paper tables; the reference repo
ships no eval harness). This module implements the scorer natively:
Salesforce/blip-vqa-base's architecture — the same ViT vision encoder
as the captioner, a BIdirectional BERT text encoder that cross-attends
question tokens to the image, and a causal BERT text decoder that
cross-attends answer tokens to the ENCODED QUESTION — with answer
ranking (the original BLIP repo's `rank_answer` readout): the binding
score for question q is

    P(yes) = softmax([loglik("yes"|image,q), loglik("no"|image,q)])[0]

Towers reuse blip.BLIPTextLayer / blip.BLIPVisionEncoder (identical
block structure; only masks and cross-attention targets differ), so
weight import reuses the captioner's converter via
hf_import._blip_vqa_hf_name (HF state-dict layout: `vision_model.*`,
`text_encoder.*` [a BlipTextModel], `text_decoder.bert.*` + cls head).

Used by tools/evaluate.py --metric bvqa_binding; value-parity vs HF
transformers' torch BlipForQuestionAnswering in tools/parity.py
(check_blip_vqa).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from comat_tpu.config import BLIPConfig
from comat_tpu.models.blip import BLIPTextLayer, BLIPVisionEncoder

IGNORE_INDEX = -100


class BLIPVQA(nn.Module):
    """Vision encoder + question encoder + answer decoder."""

    cfg: BLIPConfig

    def setup(self):
        cfg = self.cfg
        self.vision = BLIPVisionEncoder(cfg)

        # ---- question encoder (bidirectional, cross-attn to vision)
        self.enc_word_embed = nn.Embed(
            cfg.vocab_size, cfg.text_hidden_size, dtype=cfg.dtype,
            name="enc_word_embed",
        )
        self.enc_pos_embed = self.param(
            "enc_text_pos_embed", nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.text_hidden_size),
            jnp.float32,
        )
        self.enc_embed_norm = nn.LayerNorm(
            epsilon=1e-12, dtype=cfg.dtype, name="enc_embed_norm"
        )
        self.enc_layers = [
            BLIPTextLayer(cfg, name=f"enc_text_layers_{i}")
            for i in range(cfg.text_layers)
        ]

        # ---- answer decoder (causal, cross-attn to question states)
        self.dec_word_embed = nn.Embed(
            cfg.vocab_size, cfg.text_hidden_size, dtype=cfg.dtype,
            name="dec_word_embed",
        )
        self.dec_pos_embed = self.param(
            "dec_text_pos_embed", nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.text_hidden_size),
            jnp.float32,
        )
        self.dec_embed_norm = nn.LayerNorm(
            epsilon=1e-12, dtype=cfg.dtype, name="dec_embed_norm"
        )
        self.dec_layers = [
            BLIPTextLayer(cfg, name=f"dec_text_layers_{i}")
            for i in range(cfg.text_layers)
        ]
        self.dec_head_transform = nn.Dense(
            cfg.text_hidden_size, dtype=cfg.dtype,
            name="dec_head_transform",
        )
        self.dec_head_norm = nn.LayerNorm(
            epsilon=1e-12, dtype=cfg.dtype, name="dec_head_norm"
        )
        self.dec_lm_head = nn.Dense(
            cfg.vocab_size, dtype=jnp.float32, name="dec_lm_head"
        )

    def encode_question(
        self,
        q_ids: jnp.ndarray,        # (B, Sq)
        q_mask: jnp.ndarray,       # (B, Sq) 1/0
        image_embeds: jnp.ndarray  # (B, Sv, Dv)
    ) -> jnp.ndarray:
        B, S = q_ids.shape
        x = self.enc_word_embed(q_ids)
        x = x + self.enc_pos_embed[:S].astype(x.dtype)
        x = self.enc_embed_norm(x)
        # bidirectional self-attention, key-padding masked
        mask = jnp.ones((S, S), bool)[None, None] & (
            q_mask.astype(bool)[:, None, None, :]
        )
        for layer in self.enc_layers:
            x = layer(x, mask, image_embeds)
        return x  # (B, Sq, D)

    def answer_loglik(
        self,
        q_states: jnp.ndarray,     # (B, Sq, D) encoded question
        q_mask: jnp.ndarray,       # (B, Sq)
        a_ids: jnp.ndarray,        # (B, Sa) BOS-led answer ids
        a_labels: jnp.ndarray,     # (B, Sa) next-token labels, -100 pads
    ) -> jnp.ndarray:
        """Sequence log-likelihood of the answer (sum over non-ignored
        shifted positions — BLIP rank_answer scores whole sequences)."""
        B, S = a_ids.shape
        x = self.dec_word_embed(a_ids)
        x = x + self.dec_pos_embed[:S].astype(x.dtype)
        x = self.dec_embed_norm(x)
        causal = jnp.tril(jnp.ones((S, S), bool))[None, None]
        cross = q_mask.astype(bool)[:, None, None, :]  # (B,1,1,Sq)
        for layer in self.dec_layers:
            x = layer(x, causal, q_states, cross_mask=cross)
        h = self.dec_head_transform(x)
        h = nn.gelu(h, approximate=False)
        h = self.dec_head_norm(h)
        logits = self.dec_lm_head(h)                   # (B, Sa, V) fp32
        logits = logits[:, :-1]
        labels = a_labels[:, 1:]
        valid = labels != IGNORE_INDEX
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.where(valid, ll, 0.0).sum(axis=-1)  # (B,)

    def yes_probability(
        self,
        pixel_values: jnp.ndarray,   # (B, H, W, 3) CLIP-normalized
        q_ids: jnp.ndarray,
        q_mask: jnp.ndarray,
        yes_ids: jnp.ndarray,        # (B, Sa) / labels likewise
        yes_labels: jnp.ndarray,
        no_ids: jnp.ndarray,
        no_labels: jnp.ndarray,
    ) -> jnp.ndarray:
        """(B,) P(yes) by two-candidate answer ranking."""
        img = self.vision(pixel_values)
        qs = self.encode_question(q_ids, q_mask, img)
        ll_yes = self.answer_loglik(qs, q_mask, yes_ids, yes_labels)
        ll_no = self.answer_loglik(qs, q_mask, no_ids, no_labels)
        return jax.nn.sigmoid(ll_yes - ll_no)

    def __call__(self, pixel_values, q_ids, q_mask, yes_ids, yes_labels,
                 no_ids, no_labels):
        return self.yes_probability(
            pixel_values, q_ids, q_mask, yes_ids, yes_labels,
            no_ids, no_labels,
        )


def encode_fixed(tokenizer, texts, length: int):
    """(ids, mask) at a FIXED length regardless of the tokenizer's
    padding convention (BertWordPieceTokenizer pads to longest,
    HashTokenizer to max_length) — jit shapes must be static."""
    import numpy as np

    try:
        enc = tokenizer(texts, max_length=length)
    except TypeError:  # BertWordPieceTokenizer: no max_length kwarg
        enc = tokenizer(texts)
    ids = np.asarray(enc["input_ids"])[:, :length]
    mask = np.asarray(enc["attention_mask"])[:, :length]
    if ids.shape[1] < length:
        pad = length - ids.shape[1]
        ids = np.pad(ids, ((0, 0), (0, pad)))
        mask = np.pad(mask, ((0, 0), (0, pad)))
    return ids.astype(np.int32), mask.astype(np.int32)


def build_answer_batch(tokenizer, answers, batch: int,
                       max_length: int = 8,
                       bos_token_id: int = None) -> Tuple:
    """(ids, labels) for one candidate answer, tiled to the batch.
    BOS-led ids: the leading token is FORCED to `bos_token_id` (BLIP's
    rank_answer does `input_ids[:, 0] = bos_token_id` — the decoder
    conditions on [DEC]=30522, not the tokenizer's [CLS]; scoring from
    [CLS] shifts every answer log-likelihood). Labels ignore pads via
    -100 (HF text-decoder convention; the first position is never
    scored — answer_loglik shifts internally)."""
    import numpy as np

    ids, mask = encode_fixed(tokenizer, answers, max_length)
    ids, mask = ids[:1].copy(), mask[:1]
    if bos_token_id is not None:
        ids[:, 0] = bos_token_id
    labels = np.where(mask > 0, ids, IGNORE_INDEX)
    ids = np.tile(ids, (batch, 1))
    labels = np.tile(labels, (batch, 1))
    return ids, labels.astype(np.int32)
