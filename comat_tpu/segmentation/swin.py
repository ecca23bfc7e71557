"""Swin Transformer backbone (Swin-T) in Flax.

GroundingDINO's image backbone (the reference consumes its swin-t
checkpoint through the GroundingDINO package —
attr_concen_utils/gsam_interface.py:31-37). Implements the standard
Swin v1: 4x4 patch embed, windowed W-MSA/SW-MSA attention with relative
position bias, patch-merging downsampling; returns the stage 2/3/4
feature maps GroundingDINO consumes (strides 8/16/32).

Inference-only (frozen in the reference); static shapes at trace time,
any spatial size (feature maps are zero-padded to window multiples and
cropped back, exactly like torch's F.pad path). Cyclic shift uses
jnp.roll — a fixed permutation, XLA-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def tiny_test() -> "SwinConfig":
        return SwinConfig(
            embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 2, 4),
            window=4, dtype=jnp.float32,
        )


def _window_partition(x, w):
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_merge(win, w, B, H, W):
    C = win.shape[-1]
    x = win.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _relative_position_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    heads: int
    window: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (nW, w*w, C)
        nW, N, C = x.shape
        hd = C // self.heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda a: a.reshape(nW, N, self.heads, hd).transpose(
            0, 2, 1, 3
        )
        logits = jnp.einsum(
            "whqd,whkd->whqk", split(q), split(k),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32) / (hd ** 0.5)
        table = self.param(
            "rel_pos_bias",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.heads),
            jnp.float32,
        )
        idx = jnp.asarray(_relative_position_index(self.window))
        bias = table[idx.reshape(-1)].reshape(N, N, self.heads)
        logits = logits + bias.transpose(2, 0, 1)[None]
        if mask is not None:  # (nW_per_img, N, N) additive
            n_img = mask.shape[0]
            logits = logits.reshape(-1, n_img, self.heads, N, N)
            logits = logits + mask[None, :, None]
            logits = logits.reshape(nW, self.heads, N, N)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum(
            "whqk,whkd->whqd", p.astype(v.dtype), split(v),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype).transpose(0, 2, 1, 3).reshape(nW, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(o)


class SwinBlock(nn.Module):
    heads: int
    window: int
    shift: int
    mlp_ratio: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = self.window
        # torch Swin pads feature maps to window multiples with zeros
        # (F.pad in SwinTransformerBlock.forward) and crops after the
        # merge; padded pixels DO participate in W-MSA softmax (only the
        # shift-group mask applies) — replicated exactly so checkpoint
        # behavior matches at any input size.
        Hp = -(-H // w) * w
        Wp = -(-W // w) * w
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if Hp != H or Wp != W:
            h = jnp.pad(h, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        if self.shift:
            h = jnp.roll(h, (-self.shift, -self.shift), axis=(1, 2))
            mask = self._attn_mask(Hp, Wp)
        else:
            mask = None
        win = _window_partition(h, w)
        win = WindowAttention(self.heads, w, self.dtype, name="attn")(
            win, mask
        )
        h = _window_merge(win, w, B, Hp, Wp)
        if self.shift:
            h = jnp.roll(h, (self.shift, self.shift), axis=(1, 2))
        if Hp != H or Wp != W:
            h = h[:, :H, :W]
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, dtype=self.dtype, name="fc2")(h)
        return x + h

    def _attn_mask(self, H, W):
        w, s = self.window, self.shift
        img = np.zeros((H, W), np.int32)
        cnt = 0
        for hs in (slice(0, -w), slice(-w, -s), slice(-s, None)):
            for ws in (slice(0, -w), slice(-w, -s), slice(-s, None)):
                img[hs, ws] = cnt
                cnt += 1
        img = jnp.asarray(img)[None, :, :, None]
        win = _window_partition(img, w)[..., 0]  # (nW, w*w)
        diff = win[:, None, :] != win[:, :, None]
        return jnp.where(diff, -1e9, 0.0).astype(jnp.float32)


class SwinBackbone(nn.Module):
    """Returns [stage2, stage3, stage4] features (strides 8/16/32)."""

    cfg: SwinConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.cfg
        dt = cfg.dtype
        x = nn.Conv(cfg.embed_dim, (4, 4), strides=(4, 4), dtype=dt,
                    name="patch_embed")(image.astype(dt))
        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="patch_norm")(x)
        outs = []
        for stage, (depth, heads) in enumerate(
            zip(cfg.depths, cfg.num_heads)
        ):
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else cfg.window // 2
                x = SwinBlock(
                    heads, cfg.window, shift, cfg.mlp_ratio, dt,
                    name=f"stage{stage}_block{blk}",
                )(x)
            if stage >= 1:
                outs.append(
                    nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"out_norm{stage}")(x)
                )
            if stage < len(cfg.depths) - 1:
                # patch merging: 2x2 concat + linear to 2C (torch pads
                # odd dims with zeros first — PatchMerging.forward)
                B, H, W, C = x.shape
                if H % 2 or W % 2:
                    x = jnp.pad(
                        x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0))
                    )
                    B, H, W, C = x.shape
                x = x.reshape(B, H // 2, 2, W // 2, 2, C)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    B, H // 2, W // 2, 4 * C
                )
                x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"merge_norm{stage}")(x)
                x = nn.Dense(2 * C, use_bias=False, dtype=dt,
                             name=f"merge{stage}")(x)
        return outs
