"""Alignment + quality evaluation harness.

Two metric families (select with --metric, default both):

  blip_reward — generate images for held-out prompts and score with the
    (frozen) BLIP captioner reward: the signal CoMat optimizes,
    measured out-of-sample. Cannot detect reward hacking.
  bvqa_binding — the T2I-CompBench attribute-binding pattern (the
    paper's quality metric — reference README.md:3): decompose each
    prompt into its attribute-noun groups (the same linguistics
    extraction the attrcon loss uses), ask BLIP-VQA one yes/no question
    per group ("<attributes> <noun>?"), and score

        binding(prompt) = prod_groups P(yes | image, question)

    (geometric pooling over sub-questions; per-group probabilities and
    the arithmetic mean are also recorded). Because the scorer is an
    INDEPENDENT frozen VQA model — not the reward captioner — a reward-
    hacked generator scores low here while blip_reward stays high.

Real weights gate (smoke-gate discipline): non-tiny bvqa runs require
--vqa-model-path (a Salesforce/blip-vqa-base snapshot); without it the
metric is skipped with a clear message unless --allow-smoke forces
random weights (meaningless numbers, plumbing-only). Tiny geometry runs
everything with random weights in CI.

Outputs one JSON line per prompt plus a summary:
    {"prompt": ..., "blip_reward": ..., "bvqa_binding": ...,
     "bvqa_questions": [...], "bvqa_p_yes": [...]}
    {"mean_blip_reward": ..., "mean_bvqa_binding": ..., "n": ...}
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
    p.add_argument("--metric", default="both",
                   choices=("blip_reward", "bvqa_binding", "both"))
    p.add_argument("--vqa-model-path", default=None,
                   help="Salesforce/blip-vqa-base snapshot dir "
                        "(safetensors) for the binding scorer")
    p.add_argument("--vqa-tokenizer-vocab", default=None,
                   help="bert vocab.txt for the VQA question tokenizer")
    p.add_argument("--allow-smoke", action="store_true",
                   help="permit random VQA weights in non-tiny runs "
                        "(plumbing smoke only; numbers meaningless)")
    p.add_argument("--max-questions", type=int, default=4,
                   help="attribute groups scored per prompt")
    return p.parse_args(argv)


def make_bvqa_scorer(args, blip_cfg):
    """Returns (score_fn(images_f32, prompts) -> list of per-prompt
    dicts) or None with a printed skip reason. Questions come from
    linguistics.extract_attribute_groups (the attrcon extraction);
    scoring is BLIP-VQA yes/no answer ranking (models/blip_vqa.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from comat_tpu.models.blip_vqa import (
        BLIPVQA, build_answer_batch, encode_fixed,
    )
    from comat_tpu.text.linguistics import extract_attribute_groups
    from comat_tpu.text.tokenizer import (
        BertWordPieceTokenizer, HashTokenizer,
    )

    if not args.tiny and not args.vqa_model_path:
        if not args.allow_smoke:
            print(json.dumps({
                "bvqa_binding": "SKIPPED",
                "reason": "no --vqa-model-path (Salesforce/"
                          "blip-vqa-base snapshot) and not "
                          "--allow-smoke: random-weight VQA scores "
                          "are meaningless",
            }))
            return None
        print(json.dumps({"bvqa_binding_warning":
                          "--allow-smoke: random VQA weights"}))

    vqa = BLIPVQA(blip_cfg)
    rng = jax.random.PRNGKey(args.seed + 11)
    Sq, Sa, W = 16, 8, args.max_questions
    H = blip_cfg.image_size
    init = vqa.init(
        rng, jnp.zeros((1, H, H, 3)),
        jnp.zeros((1, Sq), jnp.int32), jnp.ones((1, Sq), jnp.int32),
        jnp.zeros((1, Sa), jnp.int32), jnp.zeros((1, Sa), jnp.int32),
        jnp.zeros((1, Sa), jnp.int32), jnp.zeros((1, Sa), jnp.int32),
    )
    if args.vqa_model_path:
        from comat_tpu.models.hf_import import load_blip_vqa_params

        init = load_blip_vqa_params(args.vqa_model_path, init)

    if args.vqa_tokenizer_vocab and os.path.isfile(
        args.vqa_tokenizer_vocab
    ):
        q_tok = BertWordPieceTokenizer(args.vqa_tokenizer_vocab)
    elif args.vqa_model_path:
        # real weights + hash tokenizer = confidently wrong numbers;
        # refuse instead of silently scoring garbage (the exact failure
        # mode the --allow-smoke gate exists to prevent)
        raise SystemExit(
            "--vqa-model-path given but --vqa-tokenizer-vocab is "
            f"missing or not a file ({args.vqa_tokenizer_vocab!r}); "
            "real BLIP-VQA weights need the real WordPiece vocab "
            "(vocab.txt from the same snapshot)."
        )
    else:
        q_tok = HashTokenizer(blip_cfg.vocab_size)
    # CLIP-side tokenizer only drives group extraction token indices
    from comat_tpu.text.tokenizer import load_clip_tokenizer

    g_tok = (HashTokenizer(49408) if args.tiny
             else load_clip_tokenizer(args.tokenizer_dir))

    yes_ids, yes_labels = build_answer_batch(
        q_tok, ["yes"], 1, Sa, bos_token_id=blip_cfg.bos_token_id
    )
    no_ids, no_labels = build_answer_batch(
        q_tok, ["no"], 1, Sa, bos_token_id=blip_cfg.bos_token_id
    )

    @jax.jit
    def p_yes(params, img, q_ids, q_mask):
        """img (H,W,3); q_ids/q_mask (W, Sq) — one row per question."""
        Wn = q_ids.shape[0]
        pix = jnp.broadcast_to(img[None], (Wn,) + img.shape)
        return vqa.apply(
            params, pix, q_ids, q_mask,
            jnp.broadcast_to(jnp.asarray(yes_ids), (Wn, Sa)),
            jnp.broadcast_to(jnp.asarray(yes_labels), (Wn, Sa)),
            jnp.broadcast_to(jnp.asarray(no_ids), (Wn, Sa)),
            jnp.broadcast_to(jnp.asarray(no_labels), (Wn, Sa)),
        )

    def score(images, prompts):
        from comat_tpu.losses.caption_reward import blip_preprocess

        out = []
        imgs = np.asarray(images, np.float32)
        for img, prompt in zip(imgs, prompts):
            groups = extract_attribute_groups(prompt, g_tok)[:W]
            questions = [
                " ".join(g.attribute_words + [g.noun]) + "?"
                for g in groups
            ] or [prompt + "?"]  # no groups: whole prompt (T2I style)
            q_ids, q_mask = encode_fixed(q_tok, questions, Sq)
            # resize + CLIP-normalize (BLIP preprocessing contract)
            im = blip_preprocess(
                jnp.asarray(img)[None], size=H
            )[0]
            probs = np.asarray(p_yes(
                init, im, jnp.asarray(q_ids), jnp.asarray(q_mask),
            ), np.float32)
            out.append({
                "bvqa_questions": questions,
                "bvqa_p_yes": [round(float(x), 6) for x in probs],
                "bvqa_binding": float(np.prod(probs)),
                "bvqa_mean_p_yes": float(np.mean(probs)),
            })
        return out

    return score


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
    bindings = []

    bvqa = None
    if args.metric in ("bvqa_binding", "both"):
        # blip-vqa-base is ViT-B — .base(), NOT the captioner's ViT-L
        # .large() (the snapshot's 768-wide vision kernels cannot load
        # into a 1024-wide tree)
        bcfg = BLIPConfig.tiny() if args.tiny else BLIPConfig.base()
        bvqa = make_bvqa_scorer(args, bcfg)

    @jax.jit
    def gen_and_score(params, blip_params, input_ids, eos, null_ids,
                      cap_ids, cap_mask, cap_labels, rng):
        img = pipe.generate(
            params, rng, input_ids, null_ids,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale, eos_positions=eos,
        )
        if args.metric == "bvqa_binding":
            # caption reward unused for bvqa-only runs — don't pay a
            # BLIP-large forward per image (args is static at trace)
            return img, jnp.zeros((img.shape[0],), jnp.float32)

        # per-sample rewards: vmap the scalar reward over the batch
        def one(img_i, ids_i, mask_i, lab_i):
            return blip_caption_reward(
                blip, blip_params, img_i[None], ids_i[None], mask_i[None],
                lab_i[None],
            )

        return img, jax.vmap(one)(img, cap_ids, cap_mask, cap_labels)

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
        img, r = gen_and_score(
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
        bvqa_rows = bvqa(img[: len(chunk)], chunk) if bvqa else None
        for j, (p, ri) in enumerate(zip(chunk, r[: len(chunk)])):
            rec = {"prompt": p}
            if args.metric in ("blip_reward", "both"):
                rewards.append(float(ri))
                rec["blip_reward"] = float(ri)
            if bvqa_rows:
                rec.update(bvqa_rows[j])
                bindings.append(rec["bvqa_binding"])
            line = json.dumps(rec)
            print(line)
            if out_f:
                out_f.write(line + "\n")

    summary_rec = {"n": max(len(rewards), len(bindings))}
    if rewards:
        summary_rec["mean_blip_reward"] = float(np.mean(rewards))
    if bindings:
        summary_rec["mean_bvqa_binding"] = float(np.mean(bindings))
    summary = json.dumps(summary_rec)
    print(summary)
    if out_f:
        out_f.write(summary + "\n")
        out_f.close()


if __name__ == "__main__":
    main()
