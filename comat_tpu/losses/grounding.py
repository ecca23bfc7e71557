"""Attribute-concentration grounding losses (token + pixel).

Reference math (attn_utils/tc_loss_utils.py:66-173, aggregation in
attr_concen_utils/gsam_interface.py:140-228):

For one sample, one resolution `res`, given L layer-instance attention
maps A_l (heads, res*res, 77), per-word GT masks M_w (res, res) and
word token groups T_w:

  token_loss = sum_l sum_w [ (1/|T_w|) * sum_{t in T_w}
        (1 - mean_heads( sum(A[.,t]*M_w)/sum(A[.,t]) ))^2 ] / |W|
  pixel_loss = sum_w BCE( sum_{t in T_w} avg_{l,heads} A[.,t], M_w ) / |W|

summed over the captured timesteps and resolutions, divided by batch
size (gsam_interface.py:225-226).

TPU-first: everything is fixed-shape and vmapped — words padded to
(W, T) with validity masks, per-noun GT masks as a dense (B, W, H, W)
tensor resized on device; no per-word python loops, no ragged
structures inside jit. BCE clamps logs at -100 like torch BCELoss.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp


def _bce_log(x: jnp.ndarray) -> jnp.ndarray:
    """torch-BCELoss `max(log(x), -100)` with a NaN-free backward.

    `jnp.maximum(jnp.log(jnp.maximum(x, eps)), -100)` poisons gradients
    at x == 0: log's VJP emits 1/eps = inf, and maximum's transpose
    MULTIPLIES the cotangent by the branch mask (inf * 0 = NaN) instead
    of selecting. The old gather-based pixel loss got away with it —
    the NaN cotangent died at a select-based `jnp.where` — but the
    einsum word_map spreads any NaN cotangent across the whole
    attention gradient through the matmul transpose. Clamp on the
    primal with selects so the dead branch never sees log at all.
    Forward is identical: x >= e^-100 -> log(x) (> -100 by
    construction), else -100 (the clamp value torch uses for log(0)).

    The live threshold is the smallest fp32 NORMAL, not e^-100: a
    subnormal live x (e.g. 1e-40) would give 1/x = inf in the backward
    on a non-flush-to-zero backend, and that inf becomes NaN through
    the einsum transpose (inf * 0) — the exact failure this helper
    exists to prevent (ADVICE r3). Forward deviation vs torch's clamp
    is confined to subnormals torch also maps to ~[-100, -87.3].
    """
    live = x >= jnp.finfo(jnp.float32).tiny  # smallest normal ~1.18e-38
    safe = jnp.where(live, x, 1.0)
    return jnp.where(live, jnp.log(safe), -100.0)


def _resize_masks(masks: jnp.ndarray, res: int) -> jnp.ndarray:
    """(B, W, H0, W0) -> binarized (B, W, res, res) (tc_loss_utils.py:
    88-95: antialiased resize then `> 0`)."""
    B, W, H0, W0 = masks.shape
    m = jax.image.resize(
        masks.astype(jnp.float32), (B, W, res, res), method="bilinear",
        antialias=True,
    )
    return (m > 0.0).astype(jnp.float32)


def grounding_losses_for_layer(
    attn_maps: List[jnp.ndarray],   # L x (B, heads, HW, 77) fp32 (cond half)
    masks: jnp.ndarray,             # (B, W, H0, W0) binary {0,1}
    token_idx: jnp.ndarray,         # (B, W, T) int32
    token_valid: jnp.ndarray,       # (B, W, T) bool
    word_valid: jnp.ndarray,        # (B, W) bool
):
    """Returns (token_loss, pixel_loss), each (B,) — per-sample sums
    matching the reference's per-sample accumulation."""
    B, heads, HW, C = attn_maps[0].shape
    res = int(round(HW ** 0.5))
    m = _resize_masks(masks, res).reshape(masks.shape[0], masks.shape[1], HW)
    n_words = jnp.maximum(word_valid.sum(-1), 1)  # (B,)

    # One-hot token selectors (B, W, T, C) replace a 5-D
    # (B, heads, HW, W, T) take_along_axis gather: that tensor's
    # trailing (W=8, T=8) dims pad to (8, 128) TPU tiles — a 16x HBM
    # expansion whose 512MB fp32 einsum cotangent OOMed the 512px
    # full-recipe step by itself. Contracting the attention maps
    # against one-hots computes the identical sums with every
    # intermediate MXU-shaped (trailing dim C=77 or HW), and turns the
    # gather into batched matmuls.
    E = (token_idx[..., None] == jnp.arange(C)[None, None, None]
         ).astype(jnp.float32)  # (B, W, T, C)

    token_loss = jnp.zeros((B,), jnp.float32)
    for a in attn_maps:
        af = a.astype(jnp.float32)
        # activation = sum_HW(ca * mask) / sum_HW(ca) at each word
        # token: numerator/denominator contracted over HW and C
        colsum = af.sum(axis=2)  # (B, heads, C)
        den = jnp.einsum("bhc,bwtc->bhwt", colsum, E)
        masked = jnp.einsum("bhsc,bws->bhwc", af, m)  # (B, heads, W, C)
        num = jnp.einsum("bhwc,bwtc->bhwt", masked, E)
        act = num / jnp.maximum(den, 1e-12)
        act_mean = act.mean(axis=1)  # mean over heads -> (B, W, T)
        per_tok = (1.0 - act_mean) ** 2
        per_tok = jnp.where(token_valid, per_tok, 0.0)
        n_tok = jnp.maximum(token_valid.sum(-1), 1)  # (B, W)
        obj = per_tok.sum(-1) / n_tok  # (B, W)
        obj = jnp.where(word_valid, obj, 0.0)
        token_loss = token_loss + obj.sum(-1) / n_words

    # pixel loss: average maps over layer instances AND heads
    avg = sum(a.astype(jnp.float32).mean(axis=1) for a in attn_maps) / len(
        attn_maps
    )  # (B, HW, C)
    # per-word map = sum over the word's valid tokens; (B, W, HW)
    # layout keeps the big HW dim on lanes (no tile padding)
    WE = (E * token_valid[..., None].astype(jnp.float32)).sum(axis=2)
    word_map = jnp.einsum("bsc,bwc->bws", avg, WE)  # (B, W, HW)
    word_map = jnp.clip(word_map, 0.0, 1.0)
    tgt = m  # (B, W, HW)
    # torch BCELoss: clamp log terms at -100 (NaN-safe; see _bce_log)
    log_p = _bce_log(word_map)
    log_1p = _bce_log(1.0 - word_map)
    bce = -(tgt * log_p + (1.0 - tgt) * log_1p)  # (B, W, HW)
    bce = bce.mean(axis=-1)  # mean over pixels -> (B, W)
    bce = jnp.where(word_valid, bce, 0.0)
    pixel_loss = bce.sum(-1) / n_words
    return token_loss, pixel_loss


def dedup_draw_weights(draws: jnp.ndarray) -> jnp.ndarray:
    """(A,) weights: 1.0 for the first occurrence of each drawn value,
    0.0 for repeats. Reproduces the reference's with-replacement
    `random.choices(training_steps, k=attrcon_train_steps)`
    (training_script.py:590) whose duplicate draws COLLAPSE in the
    timestep-keyed attn dict (AttrConcenTrainableSDPipeline.py:264) —
    the loss sums over distinct chosen steps only."""
    A = draws.shape[0]
    earlier = jnp.tril(jnp.ones((A, A), bool), -1)         # j < a
    dup = (draws[None, :] == draws[:, None]) & earlier      # [a, j]
    return (~dup.any(axis=1)).astype(jnp.float32)


def comat_grounding_loss(
    captured: Dict[str, jnp.ndarray],   # key -> list of
                                        # (A, B, heads, HW, 77) bf16
                                        # (cond half, one per captured
                                        # attrcon segment)
    draw_weights: jnp.ndarray,          # (A,) float — dedup weights
    masks: jnp.ndarray,                 # (B, W, H0, W0)
    token_idx: jnp.ndarray,
    token_valid: jnp.ndarray,
    word_valid: jnp.ndarray,
    cond_offset: int,                   # B (CFG batches are [uncond; cond])
    capture_layers,
):
    """Total token/pixel losses over the A captured attrcon segments x
    layers, averaged by batch size (gsam_interface.py:204-226).
    `captured[key]` holds a list of per-layer-instance arrays stacked
    over the A capture segments (the reference captures only at the
    attrcon steps — AttrConcenTrainableSDPipeline.py:159-167);
    `draw_weights` collapses with-replacement duplicate draws (see
    dedup_draw_weights)."""
    B = masks.shape[0]
    token_total = jnp.zeros((), jnp.float32)
    pixel_total = jnp.zeros((), jnp.float32)
    A = draw_weights.shape[0]
    for key in capture_layers:
        if key not in captured:
            continue
        layer_list = captured[key]  # list of (A, B2, heads, HW, 77)
        for a in range(A):
            maps = [m[a][cond_offset:] for m in layer_list]
            tl, pl = grounding_losses_for_layer(
                maps, masks, token_idx, token_valid, word_valid
            )
            token_total = token_total + draw_weights[a] * tl.sum()
            pixel_total = pixel_total + draw_weights[a] * pl.sum()
    return token_total / B, pixel_total / B
