"""CLIP text encoders in Flax (SD1.5 ViT-L/14 text tower; SDXL adds
OpenCLIP bigG).

The reference calls HF `CLIPTextModel` through diffusers
`encode_prompt` (reference: TrainableSDPipeline.py:227-424): SD1.5
consumes the final-layer hidden states (post final LayerNorm); SDXL
consumes the penultimate layer of both encoders plus the projected
pooled output of encoder 2 (TrainableSDXLPipeline encode_prompt path).

`output_hidden_state_skip` selects: 0 -> final layer + final LN (SD1.5),
1 -> penultimate layer, no final LN (SDXL), matching HF
`hidden_states[-2]` semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from comat_tpu.config import CLIPTextConfig
from comat_tpu.models.lora import LoRADense

EOS_TOKEN_ID = 49407


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    lora_rank: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = cfg.dtype
        h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm1")(x)
        q = LoRADense(cfg.hidden_size, True, self.lora_rank, dt, name="q_proj")(h)
        k = LoRADense(cfg.hidden_size, True, self.lora_rank, dt, name="k_proj")(h)
        v = LoRADense(cfg.hidden_size, True, self.lora_rank, dt, name="v_proj")(h)
        # causal attention; 77 tokens — the XLA path is optimal here
        B, S, D = q.shape
        hd = D // cfg.num_heads
        split = lambda a: a.reshape(B, S, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32) / (hd ** 0.5)
        logits = jnp.where(mask, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v.dtype), split(v),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        out = LoRADense(cfg.hidden_size, True, self.lora_rank, dt, name="out_proj")(out)
        x = x + out
        h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=dt, name="fc1")(h)
        h = quick_gelu(h) if cfg.hidden_act == "quick_gelu" else nn.gelu(
            h, approximate=False
        )
        h = nn.Dense(cfg.hidden_size, dtype=dt, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Returns (hidden_states, pooled).

    `pooled` is the hidden state at each sequence's EOS position,
    optionally matmul'd with `text_projection` when
    `cfg.projection_dim` is set (OpenCLIP bigG / SDXL encoder 2).
    """

    cfg: CLIPTextConfig
    lora_rank: int = 0

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,            # (B, S) int32
        eos_positions: Optional[jnp.ndarray] = None,  # (B,) int32
        output_hidden_state_skip: int = 0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        dt = cfg.dtype
        B, S = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=dt, name="token_embedding"
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_length, cfg.hidden_size),
            jnp.float32,
        )
        x = tok + pos[:S].astype(dt)
        causal = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]

        penult = None
        for i in range(cfg.num_layers):
            if output_hidden_state_skip and i == cfg.num_layers - output_hidden_state_skip:
                penult = x
            x = CLIPEncoderLayer(cfg, self.lora_rank, name=f"layers_{i}")(
                x, causal
            )
        final = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="final_norm")(x)

        hidden = final if output_hidden_state_skip == 0 else penult

        if eos_positions is None:
            eos_positions = jnp.full((B,), S - 1, dtype=jnp.int32)
        pooled = jnp.take_along_axis(
            final, eos_positions[:, None, None], axis=1
        )[:, 0]
        if cfg.projection_dim is not None:
            proj = self.param(
                "text_projection",
                nn.initializers.normal(cfg.hidden_size ** -0.5),
                (cfg.hidden_size, cfg.projection_dim),
                jnp.float32,
            )
            pooled = (pooled.astype(jnp.float32) @ proj).astype(dt)
        return hidden, pooled
