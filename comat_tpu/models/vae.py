"""AutoencoderKL (VAE) in Flax, NHWC.

The training loop only needs the *decoder* — differentiable, since the
three losses backprop through `vae.decode`
(reference: TrainableSDPipeline.py:219-223, training_script.py:659).
The encoder is included for completeness/interop (image-folder datasets,
latent tooling). GroupNorm eps 1e-6 everywhere (diffusers VAE blocks).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from comat_tpu.config import VAEConfig
from comat_tpu.models.conv import Conv3x3


class VAEResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention at the bottleneck."""

    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        # fused flash path (custom-VJP Pallas on TPU): at 64x64 latents
        # this is 4096-token single-head attention — the unfused einsum
        # materializes a (B, 4096, 4096) fp32 probs tensor in HBM
        from comat_tpu.ops.attention import multi_head_attention

        o, _ = multi_head_attention(q, k, v, num_heads=1)
        o = nn.Dense(C, dtype=self.dtype, name="to_out")(
            o.astype(self.dtype)
        )
        return x + o.reshape(B, H, W, C)


class VAEDecoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(
        self, z: jnp.ndarray, remat_blocks: bool = True
    ) -> jnp.ndarray:
        cfg = self.cfg
        dt = cfg.dtype
        g = cfg.norm_num_groups
        # Per-block remat: the decoder backward's fp32 GroupNorm temps at
        # full image resolution dominate HBM otherwise (measured 1.5GB
        # per temp at 512^2 bs6); rematting block-by-block keeps one
        # block's activations live during the backward. Memory-rich
        # configs (SD1.5 bs4 on v5e) can disable it and skip the
        # recompute (`remat_blocks=False`).
        Res = nn.remat(VAEResnetBlock) if remat_blocks else VAEResnetBlock
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=dt,
                    name="post_quant_conv")(z.astype(dt))
        rev = tuple(reversed(cfg.block_out_channels))
        h = Conv3x3(rev[0], dtype=dt, name="conv_in")(z)
        h = Res(rev[0], g, dt, name="mid_resnet_0")(h)
        h = VAEAttention(g, dt, name="mid_attn")(h)
        h = Res(rev[0], g, dt, name="mid_resnet_1")(h)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = Res(ch, g, dt, name=f"up_{i}_resnet_{j}")(h)
            if i < len(rev) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = Conv3x3(ch, dtype=dt, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(g, epsilon=1e-6, dtype=dt, name="conv_norm_out")(h)
        h = nn.silu(h)
        return Conv3x3(cfg.in_channels, dtype=jnp.float32,
                       name="conv_out")(h)


class VAEEncoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (mean, logvar) of the latent distribution."""
        cfg = self.cfg
        dt = cfg.dtype
        g = cfg.norm_num_groups
        h = Conv3x3(cfg.block_out_channels[0], dtype=dt,
                    name="conv_in")(x.astype(dt))
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnetBlock(ch, g, dt, name=f"down_{i}_resnet_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                            dtype=dt, name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnetBlock(ch, g, dt, name="mid_resnet_0")(h)
        h = VAEAttention(g, dt, name="mid_attn")(h)
        h = VAEResnetBlock(ch, g, dt, name="mid_resnet_1")(h)
        h = nn.GroupNorm(g, epsilon=1e-6, dtype=dt, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = Conv3x3(2 * cfg.latent_channels, dtype=jnp.float32,
                    name="conv_out")(h)
        h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=jnp.float32,
                    name="quant_conv")(h)
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class AutoencoderKL(nn.Module):
    """Bundles encoder+decoder under one param tree; `method=` dispatch."""

    cfg: VAEConfig

    def setup(self):
        self.encoder = VAEEncoder(self.cfg)
        self.decoder = VAEDecoder(self.cfg)

    def decode(
        self, latents: jnp.ndarray, remat_blocks: bool = True
    ) -> jnp.ndarray:
        """latents (B,h,w,4), *already* divided by scaling_factor.
        Returns image in [-1, 1] (B,H,W,3)."""
        return self.decoder(latents, remat_blocks)

    def encode(self, images: jnp.ndarray):
        return self.encoder(images)

    def __call__(self, images: jnp.ndarray):
        mean, logvar = self.encoder(images)
        return self.decoder(mean), mean, logvar
