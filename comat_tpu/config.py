"""Model / sampler configuration dataclasses.

The reference selects model geometry implicitly via HuggingFace
`from_pretrained` names (reference: training_utils/pipeline.py:42-82,
`--pretrain_model_name` choices at training_utils/arguments.py:10).
Here geometry is explicit and hashable so configs can be static args
to jitted functions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Geometry of a UNet2DCondition model (SD1.5 / SDXL families).

    `down_block_types` entries: "cross" = CrossAttnDownBlock2D,
    "down" = DownBlock2D. `up_block_types`: "cross" = CrossAttnUpBlock2D,
    "up" = UpBlock2D (ordered from lowest resolution to highest is NOT the
    convention here — they are listed in forward order, matching diffusers).
    """

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = ("cross", "cross", "cross", "down")
    up_block_types: Tuple[str, ...] = ("up", "cross", "cross", "cross")
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    num_attention_heads: Tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    # SDXL additions ("text_time"): micro-conditioning on original/crop/target
    # sizes + pooled text embeds (reference: TrainableSDPipeline.py:428-449).
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    # Frozen-weight compute dtype (LoRA runs fp32 regardless — reference
    # policy: training_utils/pipeline.py:135-138 upcasts LoRA to fp32).
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def num_down_blocks(self) -> int:
        return len(self.block_out_channels)

    @staticmethod
    def sd15() -> "UNetConfig":
        return UNetConfig()

    @staticmethod
    def sdxl() -> "UNetConfig":
        return UNetConfig(
            block_out_channels=(320, 640, 1280),
            down_block_types=("down", "cross", "cross"),
            up_block_types=("cross", "cross", "up"),
            transformer_layers_per_block=(0, 2, 10),
            num_attention_heads=(5, 10, 20),
            cross_attention_dim=2048,
            addition_embed_type="text_time",
        )

    @staticmethod
    def tiny(cross_attention_dim: int = 32) -> "UNetConfig":
        """CPU-runnable test geometry (same topology as SD1.5)."""
        return UNetConfig(
            block_out_channels=(32, 64, 64, 64),
            num_attention_heads=(2, 2, 2, 2),
            cross_attention_dim=cross_attention_dim,
            norm_num_groups=8,
            dtype=jnp.float32,
        )

    @staticmethod
    def tiny_xl(cross_attention_dim: int = 32) -> "UNetConfig":
        """CPU-runnable SDXL-topology geometry."""
        return UNetConfig(
            block_out_channels=(32, 64, 64),
            down_block_types=("down", "cross", "cross"),
            up_block_types=("cross", "cross", "up"),
            transformer_layers_per_block=(0, 1, 2),
            num_attention_heads=(2, 2, 2),
            cross_attention_dim=cross_attention_dim,
            norm_num_groups=8,
            addition_embed_type="text_time",
            addition_time_embed_dim=32,
            projection_class_embeddings_input_dim=32 * 6 + 64,
            dtype=jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP text tower (SD1.5 uses OpenAI ViT-L/14 text; SDXL adds
    OpenCLIP bigG)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    # "quick_gelu" for OpenAI CLIP (SD1.5), "gelu" for OpenCLIP bigG (SDXL-2)
    hidden_act: str = "quick_gelu"
    # Output the hidden state `clip_skip` layers before the end, pre-final-LN
    # (SDXL consumes penultimate states). 0 = final layer + final LN.
    projection_dim: Optional[int] = None  # text_projection (SDXL encoder 2)
    dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def sd15() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def sdxl_big_g() -> "CLIPTextConfig":
        return CLIPTextConfig(
            hidden_size=1280,
            intermediate_size=5120,
            num_layers=32,
            num_heads=20,
            hidden_act="gelu",
            projection_dim=1280,
        )

    @staticmethod
    def tiny(vocab_size: int = 1000) -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=vocab_size,
            hidden_size=32,
            intermediate_size=64,
            num_layers=2,
            num_heads=2,
            dtype=jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL. SD1.5 scaling 0.18215; SDXL 0.13025 with the
    fp16-fix VAE swapped in by the reference
    (training_utils/pipeline.py:25-26)."""

    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def sd15() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def sdxl() -> "VAEConfig":
        return VAEConfig(scaling_factor=0.13025)

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(
            block_out_channels=(16, 32, 32, 32),
            layers_per_block=1,
            norm_num_groups=8,
            dtype=jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class BLIPConfig:
    """BLIP image-captioning model (frozen reward model).

    Reference: Salesforce/blip-image-captioning-large, fp16, frozen
    (concept_mat_utils/caption_blip.py:17-21). ViT-L/16 vision encoder at
    384x384 + BERT-style text decoder with cross-attention.
    """

    # vision
    image_size: int = 384
    patch_size: int = 16
    vision_hidden_size: int = 1024
    vision_layers: int = 24
    vision_heads: int = 16
    vision_intermediate_size: int = 4096
    # text decoder (BertLMHeadModel geometry)
    vocab_size: int = 30524
    text_hidden_size: int = 768
    text_layers: int = 12
    text_heads: int = 12
    text_intermediate_size: int = 3072
    max_position_embeddings: int = 512
    pad_token_id: int = 0
    bos_token_id: int = 30522  # [DEC]
    sep_token_id: int = 102
    # HF BlipTextConfig default; the published captioning checkpoints
    # do not override it, so the reference reward is unsmoothed CE
    label_smoothing: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def large() -> "BLIPConfig":
        return BLIPConfig()

    @staticmethod
    def base() -> "BLIPConfig":
        """ViT-B/16 vision tower (Salesforce/blip-vqa-base geometry:
        768-dim, 12 layers, 12 heads); the text towers are BERT-base in
        both checkpoints. The VQA binding scorer must use this — the
        vqa-base snapshot's vision kernels are 768-wide and will not
        load into the captioner's ViT-L geometry."""
        return BLIPConfig(
            vision_hidden_size=768,
            vision_layers=12,
            vision_heads=12,
            vision_intermediate_size=3072,
        )

    @staticmethod
    def tiny(vocab_size: int = 1000) -> "BLIPConfig":
        return BLIPConfig(
            image_size=64,
            patch_size=16,
            vision_hidden_size=32,
            vision_layers=2,
            vision_heads=2,
            vision_intermediate_size=64,
            vocab_size=vocab_size,
            text_hidden_size=32,
            text_layers=2,
            text_heads=2,
            text_intermediate_size=64,
            bos_token_id=1,
            dtype=jnp.float32,
        )
