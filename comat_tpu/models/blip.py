"""BLIP image-captioning model in Flax — the frozen concept-matching
reward (reference: concept_mat_utils/caption_blip.py).

Architecture: ViT vision encoder (patch16, CLS token, pre-LN blocks)
+ BERT-style causal text decoder with per-layer cross-attention to the
vision states, LM head with transform block. The reward is minus the
caption LM loss: shifted cross-entropy with configurable label
smoothing (0.0 for the published checkpoint — its hub config leaves
HF's default) and ignore_index -100 — matching HF
`BlipTextLMHeadModel` exactly, since step-loss parity with the
reference flows through this number.

Only the forward pass exists (the model is frozen:
caption_blip.py:20-21); it must be differentiable w.r.t. the *image*
input, through which the concept-matching gradient reaches the sampler.
"""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp

from comat_tpu.config import BLIPConfig

IGNORE_INDEX = -100


class ViTBlock(nn.Module):
    hidden: int
    heads: int
    mlp: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        B, S, D = h.shape
        hd = D // self.heads
        q = nn.Dense(D, dtype=self.dtype, name="q")(h)
        k = nn.Dense(D, dtype=self.dtype, name="k")(h)
        v = nn.Dense(D, dtype=self.dtype, name="v")(h)
        split = lambda a: a.reshape(B, S, self.heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32) / (hd ** 0.5)
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v.dtype), split(v),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype).transpose(0, 2, 1, 3).reshape(B, S, D)
        x = x + nn.Dense(D, dtype=self.dtype, name="proj")(o)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.mlp, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(D, dtype=self.dtype, name="fc2")(h)
        return x + h


class BLIPVisionEncoder(nn.Module):
    cfg: BLIPConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values (B, H, W, 3) normalized. Returns (B, 1+N, D)."""
        cfg = self.cfg
        dt = cfg.dtype
        x = nn.Conv(
            cfg.vision_hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=dt,
            name="patch_embed",
        )(pixel_values.astype(dt))
        B, h, w, D = x.shape
        x = x.reshape(B, h * w, D)
        cls = self.param(
            "cls_token", nn.initializers.zeros_init(), (1, 1, D), jnp.float32
        )
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(dt), (B, 1, D)), x], 1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n_pos, D),
            jnp.float32,
        )
        x = x + pos[:, : x.shape[1]].astype(dt)
        # Per-layer remat: the backward through the captioner otherwise
        # keeps every layer's fp32 (B, heads, 577, 577) attention probs
        # live at once (~2.2 GB at bs4) — the buffer that tipped the
        # full-recipe step over v5e's 16 GB HBM. BLIP is frozen reward
        # machinery; recomputing one ViT block per backward step is
        # noise next to the UNet work.
        block = nn.remat(ViTBlock)
        for i in range(cfg.vision_layers):
            x = block(
                cfg.vision_hidden_size, cfg.vision_heads,
                cfg.vision_intermediate_size, dt, name=f"layers_{i}",
            )(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=dt, name="post_norm")(x)


class BLIPTextLayer(nn.Module):
    cfg: BLIPConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_mask: jnp.ndarray,      # (B, 1, S, S) bool (causal & padding)
        enc: jnp.ndarray,            # (B, Sv, Dv) cross-attn key states
        cross_mask: jnp.ndarray = None,  # (B, 1, S|1, Sv) bool or None
    ) -> jnp.ndarray:
        cfg = self.cfg
        dt = cfg.dtype
        D = cfg.text_hidden_size
        heads = cfg.text_heads
        hd = D // heads
        B, S, _ = x.shape

        def mha(q, k, v, mask, name):
            split = lambda a, s: a.reshape(B, s, heads, hd).transpose(0, 2, 1, 3)
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", split(q, q.shape[1]), split(k, k.shape[1]),
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32) / (hd ** 0.5)
            if mask is not None:
                logits = jnp.where(mask, logits, -1e30)
            probs = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum(
                "bhqk,bhkd->bhqd", probs.astype(v.dtype), split(v, v.shape[1]),
                preferred_element_type=jnp.float32,
            ).astype(dt).transpose(0, 2, 1, 3).reshape(B, q.shape[1], D)
            return o

        # self-attention (post-LN / BERT style)
        q = nn.Dense(D, dtype=dt, name="self_q")(x)
        k = nn.Dense(D, dtype=dt, name="self_k")(x)
        v = nn.Dense(D, dtype=dt, name="self_v")(x)
        a = mha(q, k, v, attn_mask, "self")
        a = nn.Dense(D, dtype=dt, name="self_out")(a)
        x = nn.LayerNorm(epsilon=1e-12, dtype=dt, name="self_norm")(x + a)

        # cross-attention to vision
        q = nn.Dense(D, dtype=dt, name="cross_q")(x)
        k = nn.Dense(D, dtype=dt, name="cross_k")(enc.astype(dt))
        v = nn.Dense(D, dtype=dt, name="cross_v")(enc.astype(dt))
        a = mha(q, k, v, cross_mask, "cross")
        a = nn.Dense(D, dtype=dt, name="cross_out")(a)
        x = nn.LayerNorm(epsilon=1e-12, dtype=dt, name="cross_norm")(x + a)

        # feed-forward
        h = nn.Dense(cfg.text_intermediate_size, dtype=dt, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(D, dtype=dt, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=dt, name="ff_norm")(x + h)


class BLIPCaptioner(nn.Module):
    """Full captioner. `caption_loss` is the training-path entry point."""

    cfg: BLIPConfig

    def setup(self):
        cfg = self.cfg
        self.vision = BLIPVisionEncoder(cfg)
        self.word_embed = nn.Embed(
            cfg.vocab_size, cfg.text_hidden_size, dtype=cfg.dtype,
            name="word_embed",
        )
        self.pos_embed = self.param(
            "text_pos_embed",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.text_hidden_size),
            jnp.float32,
        )
        self.embed_norm = nn.LayerNorm(
            epsilon=1e-12, dtype=cfg.dtype, name="embed_norm"
        )
        self.text_layers = [
            BLIPTextLayer(cfg, name=f"text_layers_{i}")
            for i in range(cfg.text_layers)
        ]
        self.head_transform = nn.Dense(
            cfg.text_hidden_size, dtype=cfg.dtype, name="head_transform"
        )
        self.head_norm = nn.LayerNorm(
            epsilon=1e-12, dtype=cfg.dtype, name="head_norm"
        )
        self.lm_head = nn.Dense(
            cfg.vocab_size, dtype=jnp.float32, name="lm_head"
        )

    def decode_logits(
        self,
        input_ids: jnp.ndarray,       # (B, S)
        attention_mask: jnp.ndarray,  # (B, S) 1/0
        image_embeds: jnp.ndarray,    # (B, Sv, Dv)
    ) -> jnp.ndarray:
        cfg = self.cfg
        B, S = input_ids.shape
        x = self.word_embed(input_ids)
        x = x + self.pos_embed[:S].astype(x.dtype)
        x = self.embed_norm(x)
        causal = jnp.tril(jnp.ones((S, S), dtype=bool))
        pad = attention_mask.astype(bool)[:, None, None, :]  # keys
        mask = causal[None, None] & pad
        for layer in self.text_layers:
            x = layer(x, mask, image_embeds)
        h = self.head_transform(x)
        h = nn.gelu(h, approximate=False)
        h = self.head_norm(h)
        return self.lm_head(h)  # (B, S, V) fp32

    def caption_loss(
        self,
        pixel_values: jnp.ndarray,    # (B, H, W, 3) CLIP-normalized
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        labels: jnp.ndarray,          # (B, S) with IGNORE_INDEX masking
    ) -> jnp.ndarray:
        """Caption LM loss, matching HF BlipTextLMHeadModel: shifted CE,
        label_smoothing from config, mean over non-ignored tokens.

        The published Salesforce/blip-image-captioning-large hub config
        does not set `label_smoothing`, so HF defaults it to 0.0 — the
        reference's reward (caption_blip.py:58 `-outputs.loss`) is an
        UNsmoothed CE; 0.1 (the original BLIP repo value) is kept
        available via BLIPConfig for experimentation."""
        image_embeds = self.vision(pixel_values)
        logits = self.decode_logits(input_ids, attention_mask, image_embeds)
        logits = logits[:, :-1]
        labels = labels[:, 1:]
        valid = labels != IGNORE_INDEX
        safe_labels = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
        eps = self.cfg.label_smoothing
        if eps:
            smooth = -jnp.mean(logp, axis=-1)
            per_tok = (1.0 - eps) * nll + eps * smooth
        else:
            per_tok = nll
        per_tok = jnp.where(valid, per_tok, 0.0)
        return per_tok.sum() / jnp.maximum(valid.sum(), 1)

    def __call__(self, pixel_values, input_ids, attention_mask, labels):
        return self.caption_loss(pixel_values, input_ids, attention_mask, labels)
