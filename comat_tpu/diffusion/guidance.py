"""Classifier-free guidance as an eps-model wrapper.

The reference interleaves CFG with the denoise loop body
(TrainableSDPipeline.py:135,155-161): latents are duplicated, the UNet
runs on the 2B batch, and uncond/cond halves are recombined, optionally
with guidance rescale (arXiv 2305.08891 §3.4, diffusers
`rescale_noise_cfg`). Here that logic is factored into a wrapper that
turns a raw UNet apply into a guided eps-model — the sampler never sees
CFG, which keeps both sampler passes and the discriminator's single-call
usage (gan_sdxl.py:72-78, no CFG) on one code path.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def rescale_noise_cfg(
    noise_cfg: jnp.ndarray, noise_pred_text: jnp.ndarray,
    guidance_rescale: float,
) -> jnp.ndarray:
    axes = tuple(range(1, noise_cfg.ndim))
    std_text = jnp.std(
        noise_pred_text.astype(jnp.float32), axis=axes, keepdims=True
    )
    std_cfg = jnp.std(noise_cfg.astype(jnp.float32), axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg).astype(noise_cfg.dtype)
    return (
        guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg
    )


def make_cfg_eps_model(
    unet_apply: Callable,
    context: jnp.ndarray,            # (B, L, D) cond embeddings
    null_context: Optional[jnp.ndarray],  # (B, L, D) or None -> no CFG
    guidance_scale: float,
    guidance_rescale: float = 0.0,
    added_cond: Optional[Dict[str, jnp.ndarray]] = None,
    null_added_cond: Optional[Dict[str, jnp.ndarray]] = None,
    capture_dtype: jnp.dtype = jnp.bfloat16,
) -> Callable:
    """Returns eps_model(latents, t, capture) -> (guided_eps, captured).

    `unet_apply(latents, t, context, added_cond, capture)` ->
    (eps, captured). With CFG, the UNet runs once on the [uncond; cond]
    2B batch (reference order: TrainableSDPipeline.py:92,135,156 —
    uncond first). Captured attention maps are reduced to the COND half
    and `capture_dtype` at the source (the reference captures cond-only
    by splitting the call — AttrConcenTrainableSDPipeline.py:239-279).
    Callers pass the UNet's compute dtype: bf16 in production (the
    reference's fp16 autocast materializes half-precision probs anyway),
    quartering capture HBM traffic; fp32 in the tiny fixture geometry so
    the step-loss twin comparison stays exact. Done here, the uncond
    half never reaches the sampler's scan stack. Gradients to the
    grounding loss flow through the cast unchanged in structure.
    """
    do_cfg = null_context is not None and guidance_scale > 1.0

    def _cond_half_cast(captured, B):
        if not captured:
            return captured
        return jax.tree_util.tree_map(
            lambda a: a[B:].astype(capture_dtype), captured
        )

    def eps_model(latents, t, capture=False):
        B = latents.shape[0]
        if not do_cfg:
            eps, captured = unet_apply(latents, t, context, added_cond, capture)
            if capture:
                captured = jax.tree_util.tree_map(
                    lambda a: a.astype(capture_dtype), captured
                )
            return eps, captured
        lat2 = jnp.concatenate([latents, latents], axis=0)
        ctx2 = jnp.concatenate([null_context, context], axis=0)
        ac2 = None
        if added_cond is not None:
            nac = null_added_cond if null_added_cond is not None else added_cond
            ac2 = {
                k: jnp.concatenate([nac[k], added_cond[k]], axis=0)
                for k in added_cond
            }
        eps2, captured = unet_apply(lat2, t, ctx2, ac2, capture)
        if capture:
            captured = _cond_half_cast(captured, B)
        eps_uncond, eps_text = eps2[:B], eps2[B:]
        eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
        if guidance_rescale > 0.0:
            eps = rescale_noise_cfg(eps, eps_text, guidance_rescale)
        return eps, captured

    return eps_model
