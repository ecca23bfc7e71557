"""Multi-scale deformable attention (Deformable-DETR family).

The reference depends on GroundingDINO's compiled CUDA extension `_C`
for this op (reference: attr_concen_utils/gsam_interface.py:10,31-37;
the `pip install -e .` build step at README.md:41-47 exists to compile
it). TPU-native equivalent: bilinear sampling expressed as XLA gathers
— static shapes, no custom call needed; batched gathers lower well on
TPU. The op is inference-only here (the grounding models are frozen,
gsam_interface.py:54), so no custom VJP is required.

Semantics match the original `ms_deform_attn` (align_corners=False
grid-sample with zero padding).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(
    value: jnp.ndarray,     # (B, H, W, C)
    x: jnp.ndarray,         # (B, N) in pixel coords (align_corners=False)
    y: jnp.ndarray,         # (B, N)
) -> jnp.ndarray:
    """Zero-padded bilinear sampling via gathers. Returns (B, N, C)."""
    B, H, W, C = value.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]

    def gather(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = value.reshape(B, H * W, C)
        idx = yi_c * W + xi_c
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.where(inb[..., None], out, 0.0)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    return top * (1 - dy) + bot * dy


def ms_deformable_attention(
    value: jnp.ndarray,                 # (B, S_total, heads, dh)
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H_l, W_l)]
    sampling_locations: jnp.ndarray,    # (B, Nq, heads, L, P, 2) in [0,1]
    attention_weights: jnp.ndarray,     # (B, Nq, heads, L, P) (softmaxed)
) -> jnp.ndarray:
    """Returns (B, Nq, heads*dh)."""
    B, S, Hn, Dh = value.shape
    _, Nq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)

    offsets = []
    off = 0
    for (h, w) in spatial_shapes:
        offsets.append(off)
        off += h * w
    assert off == S, (off, S)

    out = jnp.zeros((B, Nq, Hn, Dh), jnp.float32)
    for l, (h, w) in enumerate(spatial_shapes):
        lvl = value[:, offsets[l] : offsets[l] + h * w]  # (B, hw, Hn, Dh)
        lvl = lvl.transpose(0, 2, 1, 3).reshape(B * Hn, h, w, Dh)
        # normalized [0,1] -> pixel coords, align_corners=False:
        # px = loc * W - 0.5
        loc = sampling_locations[:, :, :, l]  # (B, Nq, Hn, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x = x.transpose(0, 2, 1, 3).reshape(B * Hn, Nq * P)
        y = y.transpose(0, 2, 1, 3).reshape(B * Hn, Nq * P)
        sampled = _bilinear_sample(lvl.astype(jnp.float32), x, y)
        sampled = sampled.reshape(B, Hn, Nq, P, Dh)
        wgt = attention_weights[:, :, :, l].transpose(0, 2, 1, 3)
        out = out + (sampled * wgt[..., None].astype(jnp.float32)).sum(axis=3).transpose(0, 2, 1, 3)
    return out.reshape(B, Nq, Hn * Dh).astype(value.dtype)
