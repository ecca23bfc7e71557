"""Text-to-image generation CLI (inference).

Covers the reference's inference surface (TrainableSDXLPipeline.__call__
/ validation sampling, TrainableSDPipeline.py:451-655): prompts ->
images with DDPM/DDIM/DPM++ samplers, optionally from a fine-tuned
checkpoint produced by training_script.py.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="comat_tpu text-to-image")
    p.add_argument("--model", default="sd_1_5")
    p.add_argument("--prompt", nargs="+", required=True)
    p.add_argument("--out-dir", default="generated")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint-{step} dir from training")
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=7.5)
    p.add_argument("--scheduler", default="ddpm",
                   choices=["ddpm", "ddim", "dpmpp"])
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tokenizer-dir", default=None)
    p.add_argument("--pretrain-model", default=None,
                   help="local HF snapshot dir for base weights")
    p.add_argument("--tiny", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from comat_tpu.models.pipeline import (
        DiffusionPipeline, make_pipeline_config,
    )
    from comat_tpu.text.tokenizer import HashTokenizer, load_clip_tokenizer

    pcfg = make_pipeline_config(
        args.model, lora_rank=0 if not args.checkpoint else 32,
        resolution=args.resolution, tiny=args.tiny,
    )
    pipe = DiffusionPipeline(pcfg)
    rng = jax.random.PRNGKey(args.seed)
    params = pipe.init_params(rng)
    if args.pretrain_model and os.path.isdir(args.pretrain_model):
        from comat_tpu.models.hf_import import load_sd_params

        params = load_sd_params(args.pretrain_model, params, pcfg)
    if args.checkpoint:
        from comat_tpu.training.checkpoints import restore_params

        params = restore_params(args.checkpoint, params)

    tok = (HashTokenizer(pcfg.text.vocab_size) if args.tiny
           else load_clip_tokenizer(args.tokenizer_dir))
    prompts = list(args.prompt)
    enc = tok(prompts, max_length=pcfg.text.max_length)
    null = tok([""] * len(prompts), max_length=pcfg.text.max_length)
    images = pipe.generate(
        params, rng,
        jnp.asarray(enc["input_ids"]), jnp.asarray(null["input_ids"]),
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        eos_positions=jnp.asarray(enc["eos_positions"]),
        kind=args.scheduler,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    from PIL import Image

    arr = np.clip(np.asarray(images, np.float32), 0, 1)
    for i, (p, im) in enumerate(zip(prompts, arr)):
        path = os.path.join(args.out_dir, f"{i:03d}.png")
        Image.fromarray((im * 255).astype(np.uint8)).save(path)
        print(f"{path}: {p}")


if __name__ == "__main__":
    main()
