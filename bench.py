"""Benchmark: CoMat SD1.5 train-step throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Workload = the reference SD1.5 recipe's per-step compute
(scripts/sd15.sh: 512x512, 50 DDPM steps with CFG, K=5 trained steps,
LoRA rank 128, BLIP-large reward) on real geometry with random weights
(arithmetic identical to trained weights). Frozen towers run bf16
(reference runs fp16 — training_utils/pipeline.py:60-70); LoRA and
optimizer state stay fp32.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
A100 baseline is derived from the recipe:
    A100 imgs/sec ≈ peak_bf16 * MFU / FLOPs_per_image
with peak 312 TFLOP/s and an optimistic MFU 0.40 for the reference's
torch fp16 path. FLOPs_per_image is computed from XLA's cost analysis
of ONE un-scanned CFG UNet call (+ VAE/BLIP), scaled by the step
structure: 50 CFG forwards + K backwards (bwd = 2x fwd) + VAE decode
fwd/bwd + BLIP fwd/bwd. This is the *reference's* FLOP count — our
two-pass design pays K extra forwards on top, so vs_baseline charges us
for the overhead, not the reference.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_PEAK_FLOPS = 312e12
A100_ASSUMED_MFU = 0.40


def random_params_bf16(init_fn, key):
    """Fan-in-scaled random weights from abstract shapes (cheap, keeps
    50-step activations finite — constant fills blow up to NaN), born
    directly in the frozen-tower dtype policy: bf16 master copies
    except fp32 LoRA. The cast happens INSIDE the materializing jit so
    the full fp32 tree never exists in HBM (the fp32 SDXL tree is
    ~10GB and OOMed a v5e when materialized before casting)."""
    shapes = jax.eval_shape(init_fn, key)
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    treedef = jax.tree_util.tree_structure(shapes)
    # Host-side numpy generation + per-leaf device_put: one giant
    # materializing jit (thousands of unrolled random ops for SDXL)
    # killed the XLA compiler, and per-leaf jitted generation pays one
    # remote compile per unique shape.
    rng = np.random.default_rng(0)
    out = []
    for path, s in flat:
        keys = [str(getattr(q, "key", getattr(q, "name", q))) for q in path]
        is_lora = any(k.startswith("lora_") for k in keys)
        is_scale = s.ndim == 1 and keys and keys[-1] == "scale"
        dt = s.dtype
        if dt == jnp.float32 and s.ndim >= 1 and not is_lora:
            dt = jnp.bfloat16
        if is_scale:
            w = np.ones(s.shape, np.float32)
        elif s.ndim >= 2:
            fan_in = int(np.prod(s.shape[:-1]))
            w = rng.standard_normal(s.shape, dtype=np.float32)
            w *= fan_in ** -0.5
        else:
            w = np.zeros(s.shape, np.float32)
        out.append(jax.device_put(jnp.asarray(w, dt)))
    return jax.tree_util.tree_unflatten(treedef, out)


def build(batch_size: int, resolution: int = 512, model: str = "sd_1_5"):
    from comat_tpu.config import BLIPConfig
    from comat_tpu.models.blip import BLIPCaptioner
    from comat_tpu.models.pipeline import DiffusionPipeline, make_pipeline_config
    from comat_tpu.losses.caption_reward import build_caption_batch
    from comat_tpu.text.tokenizer import HashTokenizer
    from comat_tpu.training.train_step import (
        TrainConfig, init_train_state, make_optimizer, make_train_step,
    )

    pcfg = make_pipeline_config(model, lora_rank=128, resolution=resolution)
    pipe = DiffusionPipeline(pcfg)
    blip = BLIPCaptioner(BLIPConfig.large())
    k = jax.random.PRNGKey(0)

    params = random_params_bf16(pipe.init_params, k)

    B = batch_size
    tok = HashTokenizer(49408)            # CLIP vocab
    blip_tok = HashTokenizer(30524)       # BLIP/BERT vocab
    prompts = [f"a photo of a red car and {i} blue birds" for i in range(B)]
    enc = tok(prompts, max_length=77)
    null = tok([""] * B, max_length=77)
    cap = build_caption_batch(blip_tok, prompts)
    S = 32
    pad = lambda a, v: np.pad(a, ((0, 0), (0, S - a.shape[1])), constant_values=v)
    batch = {
        "input_ids": jnp.asarray(enc["input_ids"]),
        "eos_positions": jnp.asarray(enc["eos_positions"]),
        "null_ids": jnp.asarray(null["input_ids"]),
        "caption_ids": jnp.asarray(pad(cap["input_ids"], 0)),
        "caption_mask": jnp.asarray(pad(cap["attention_mask"], 0)),
        "caption_labels": jnp.asarray(pad(cap["labels"], -100)),
    }
    blip_params = random_params_bf16(
        lambda k: blip.init(
            k, jnp.zeros((1, 384, 384, 3)), batch["caption_ids"][:1],
            batch["caption_mask"][:1], batch["caption_labels"][:1],
        ),
        k,
    )

    tcfg = TrainConfig(
        total_step=50, K=5, resolution=resolution,
        # the SDXL recipe needs block remat to fit 16GB HBM (the
        # reference also runs --gradient_checkpointing); SD1.5 fits
        # without and runs faster un-remat'd
        gradient_checkpointing=(model != "sd_1_5"),
    )
    opt = make_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)
    step = jax.jit(make_train_step(pipe, blip, tcfg, opt), donate_argnums=(0,))
    return pipe, blip, step, state, frozen, blip_params, batch, tcfg


def reference_flops_per_image(pipe, blip, params, blip_params, batch,
                              tcfg) -> float:
    """Analytic reference FLOPs/image from un-scanned component costs."""
    B = batch["input_ids"].shape[0]

    added = None
    if pipe.cfg.is_sdxl:
        pooled_dim = (
            pipe.cfg.text2.projection_dim or pipe.cfg.text2.hidden_size
        )
        added = {
            "text_embeds": jnp.zeros((2 * B, pooled_dim), jnp.bfloat16),
            "time_ids": jnp.zeros((2 * B, 6), jnp.bfloat16),
        }

    def unet_cfg(params, lat, ctx):
        eps, _ = pipe.unet_apply(params, lat, jnp.zeros((2 * B,), jnp.int32),
                                 ctx, added, fast=False)
        return eps

    s = pipe.cfg.latent_size
    lat = jnp.zeros((2 * B, s, s, 4), jnp.bfloat16)
    ctx = jnp.zeros(
        (2 * B, 77, pipe.cfg.unet.cross_attention_dim), jnp.bfloat16
    )
    c_unet = jax.jit(unet_cfg).lower(params, lat, ctx).compile().cost_analysis()
    f_unet = float(c_unet["flops"])  # one CFG (2B) forward

    z = jnp.zeros((B, s, s, 4))
    c_vae = jax.jit(
        lambda p, z: pipe.decode_image(p, z)
    ).lower(params, z).compile().cost_analysis()
    f_vae = float(c_vae["flops"])

    img = jnp.zeros((B, 512, 512, 3))
    from comat_tpu.losses.caption_reward import blip_caption_reward

    c_blip = jax.jit(
        lambda bp, im: blip_caption_reward(
            blip, bp, im, batch["caption_ids"], batch["caption_mask"],
            batch["caption_labels"],
        )
    ).lower(blip_params, img).compile().cost_analysis()
    f_blip = float(c_blip["flops"])

    S, K = tcfg.total_step, tcfg.K
    total = (
        S * f_unet            # sampling forwards
        + K * 2.0 * f_unet    # backward through K trained steps
        + 3.0 * f_vae         # decode fwd + bwd
        + 3.0 * f_blip        # reward fwd + bwd
    )
    return total / B


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    model = sys.argv[2] if len(sys.argv) > 2 else "sd_1_5"
    pipe, blip, step, state, frozen, blip_params, batch, tcfg = build(
        batch_size, model=model
    )
    rng = jax.random.PRNGKey(7)

    compiled = step.lower(state, frozen, blip_params, batch, rng).compile()
    state, _, m = compiled(state, frozen, blip_params, batch, rng)
    jax.block_until_ready(m)

    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, _, m = compiled(state, frozen, blip_params, batch, rng)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / n_iters

    imgs_per_sec = batch_size / dt
    from comat_tpu.training.train_step import merge_params

    f_img = None
    try:
        merged = merge_params(state.trainable, frozen)
        f_img = reference_flops_per_image(
            pipe, blip, merged, blip_params, batch, tcfg
        )
    except Exception:
        pass

    if f_img:
        a100_est = A100_PEAK_FLOPS * A100_ASSUMED_MFU / f_img
        vs_baseline = imgs_per_sec / a100_est
    else:
        a100_est, vs_baseline = float("nan"), float("nan")

    print(
        json.dumps(
            {
                "metric": ("sd15" if model == "sd_1_5" else model)
          + "_comat_train_step_throughput_512px",
                "value": round(imgs_per_sec, 4),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs_baseline, 3),
                "detail": {
                    "batch_size": batch_size,
                    "step_seconds": round(dt, 3),
                    "ref_tflops_per_image": (
                        round(f_img / 1e12, 2) if f_img else None
                    ),
                    "a100_baseline_est_imgs_per_sec": (
                        round(a100_est, 4) if f_img else None
                    ),
                    "achieved_tflops_per_sec": (
                        round(f_img * imgs_per_sec / 1e12, 1)
                        if f_img else None
                    ),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
