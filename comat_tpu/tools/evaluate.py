"""Alignment evaluation harness.

The reference reports T2I-CompBench / TIFA / FID numbers only in the
paper (BASELINE.md: none reproduced in the repo). This harness covers
the part that is self-contained: generate images for an evaluation
prompt set and score text-image alignment with the (frozen) BLIP
captioner reward — the same signal CoMat optimizes, measured on held-out
prompts. External metric suites (T2I-CompBench scorers) plug in where
real weights/corpora exist.

Outputs one JSON line per prompt plus a summary:
    {"prompt": ..., "blip_reward": ...}
    {"mean_blip_reward": ..., "n": ...}
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="comat_tpu alignment eval")
    p.add_argument("--model", default="sd_1_5")
    p.add_argument("--prompt-path", required=True)
    p.add_argument("--out", default=None, help="jsonl results path")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--pretrain-model", default=None)
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=7.5)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-prompts", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tokenizer-dir", default=None)
    p.add_argument("--tiny", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from comat_tpu.config import BLIPConfig
    from comat_tpu.models.blip import BLIPCaptioner
    from comat_tpu.models.pipeline import (
        DiffusionPipeline, make_pipeline_config,
    )
    from comat_tpu.losses.caption_reward import (
        blip_caption_reward, build_caption_batch,
    )
    from comat_tpu.text.tokenizer import HashTokenizer, load_clip_tokenizer
    from comat_tpu.training.data import load_prompts

    pcfg = make_pipeline_config(
        args.model, lora_rank=0 if not args.checkpoint else 32,
        resolution=args.resolution, tiny=args.tiny,
    )
    pipe = DiffusionPipeline(pcfg)
    blip_cfg = BLIPConfig.tiny() if args.tiny else BLIPConfig.large()
    blip = BLIPCaptioner(blip_cfg)
    rng = jax.random.PRNGKey(args.seed)
    params = pipe.init_params(rng)
    blip_params = blip.init(
        jax.random.fold_in(rng, 1),
        jnp.zeros((1, blip_cfg.image_size, blip_cfg.image_size, 3)),
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1, 8), jnp.int32),
    )
    if args.pretrain_model and os.path.isdir(args.pretrain_model):
        from comat_tpu.models.hf_import import load_sd_params

        params = load_sd_params(args.pretrain_model, params, pcfg)
    if args.checkpoint:
        from comat_tpu.training.checkpoints import restore_params

        params = restore_params(args.checkpoint, params)

    tok = (HashTokenizer(pcfg.text.vocab_size) if args.tiny
           else load_clip_tokenizer(args.tokenizer_dir))
    blip_tok = HashTokenizer(blip_cfg.vocab_size)

    prompts = load_prompts(args.prompt_path, args.max_prompts)
    B = args.batch_size
    out_f = open(args.out, "w") if args.out else None
    rewards = []

    @jax.jit
    def gen_and_score(params, blip_params, input_ids, eos, null_ids,
                      cap_ids, cap_mask, cap_labels, rng):
        img = pipe.generate(
            params, rng, input_ids, null_ids,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale, eos_positions=eos,
        )
        # per-sample rewards: vmap the scalar reward over the batch
        def one(img_i, ids_i, mask_i, lab_i):
            return blip_caption_reward(
                blip, blip_params, img_i[None], ids_i[None], mask_i[None],
                lab_i[None],
            )

        return jax.vmap(one)(img, cap_ids, cap_mask, cap_labels)

    S = 48
    for i in range(0, len(prompts), B):
        chunk = prompts[i : i + B]
        padded = chunk + [""] * (B - len(chunk))
        enc = tok(padded, max_length=pcfg.text.max_length)
        null = tok([""] * B, max_length=pcfg.text.max_length)
        cap = build_caption_batch(blip_tok, padded)
        pad = lambda a, v: np.pad(
            a, ((0, 0), (0, max(S - a.shape[1], 0))), constant_values=v
        )[:, :S]
        rng, sub = jax.random.split(rng)
        r = gen_and_score(
            params, blip_params,
            jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["eos_positions"]),
            jnp.asarray(null["input_ids"]),
            jnp.asarray(pad(cap["input_ids"], 0)),
            jnp.asarray(pad(cap["attention_mask"], 0)),
            jnp.asarray(pad(cap["labels"], -100)),
            sub,
        )
        r = np.asarray(r, np.float32).ravel()
        for p, ri in zip(chunk, r[: len(chunk)]):
            rewards.append(float(ri))
            line = json.dumps({"prompt": p, "blip_reward": float(ri)})
            print(line)
            if out_f:
                out_f.write(line + "\n")

    summary = json.dumps(
        {"mean_blip_reward": float(np.mean(rewards)), "n": len(rewards)}
    )
    print(summary)
    if out_f:
        out_f.write(summary + "\n")
        out_f.close()


if __name__ == "__main__":
    main()
