"""The step-loss north-star fixture: JAX stack vs the independent
torch twin, fp32, seeded — asserting the BASELINE.json "SD1.5 CoMat
step-loss parity within 1e-3" target with an implementation-independent
cross-check of the diffusion backbone (UNet2DCondition / VAE decoder /
DDPM scheduler — the largest numerics surface) plus the full loss
assembly.

Two geometries (VERDICT r4 weak #4 / task 6):

  - "tiny": 2-layer 32-dim towers, 128px, B=2, 10 steps — the fast
    release-tier check, catches semantic divergence cheaply.
  - "real": TRUE SD1.5 channel geometry — UNet (320,640,1280,1280)
    x 8 heads, CLIP-L 768x12 at the real 49408 vocab, the real
    (128,256,512,512) VAE, BLIP-large towers, LoRA rank 128 (the
    published sd15.sh rank) — random weights, fp32, latent 32^2
    (256px) and a short 4-step schedule to bound single-core cost.
    This closes the geometry gap tiny fixtures cannot see (real
    channel widths, head dims, 77-token alignment at real vocab).

Method (the same twin method that validated CLIP/BLIP/GDINO/FastSAM):

  1. Build torch-side models with seeded random weights: HF
     transformers CLIPTextModel + BlipForConditionalGeneration
     (independent implementations) and the TwinUNet/TwinVAEDecoder of
     tools/torch_twin_sd15.py (written against diffusers' documented
     semantics, state-dict-name compatible).
  2. Convert every state dict into the JAX modules through
     models/hf_import's converters (strict: unmapped leaves fail).
  3. Generate ALL stochastic inputs once with the jax PRNG, replicating
     training.train_step.loss_fn's derivation exactly (fold_in on
     step, split(4), capture draws at fold_in 0xA77C, the sampler's
     internal split) and hand them to the twin as numpy.
  4. Run the REAL jitted train step (make_train_step) on the JAX side;
     run comat_step_loss_torch on the twin side; compare step_loss.

Segmentation masks are 64px-aligned quadrants (not CenterPrior's
arbitrary rectangles): aligned box edges survive the bilinear+antialias
downsize to every loss resolution exactly, so the `> 0` binarization
(attn_utils/tc_loss_utils.py:88-98) cannot diverge between torch and
jax antialias kernels at sub-ULP boundary values.

Reference semantics being validated: TrainableSDPipeline.py:132-185
(denoise loop), :219-223 (decode), training_script.py:592-664 (loss
assembly), training_utils/pipeline.py:50-59 (DDPM fixed_small).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

TOL = 1e-3
GRAD_TOL = 1e-3   # relative, per LoRA leaf (VERDICT r3 task 2)
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)
)))
FIXTURE_PATH = os.path.join(_REPO, "fixtures", "step_loss_sd15.json")
FIXTURE_PATH_REAL = os.path.join(
    _REPO, "fixtures", "step_loss_sd15_geometry.json"
)

# Shared schedule knobs (ratios match sd15.sh: K of total_step, attrcon
# A steps, gan w=1, token 1e-3 / pixel 5e-5).
SEED = 0
CFG_SCALE = 7.5
PROMPTS = ["a red car and a blue bird", "two green cats on a mat"]

GEOMETRIES = {
    # CPU-runnable tiny geometry: the committed fixture
    # (fixtures/step_loss_sd15.json) — byte-stable since round 3.
    "tiny": dict(
        fixture="tiny_random_v1",
        lora_rank=4, B=2, resolution=128, total_step=10, K=5, A=2,
        gan=True,
        capture_layers=("mid_2", "up_4", "up_8", "up_16"),
        fixture_path=FIXTURE_PATH,
    ),
    # True SD1.5 channel geometry (see module docstring). latent 32^2,
    # short schedule, B=1 — single-core-feasible, geometry-complete.
    "real": dict(
        fixture="sd15_geometry_v1",
        lora_rank=128, B=1, resolution=256, total_step=4, K=2, A=2,
        gan=True,
        capture_layers=("mid_4", "up_8", "up_16", "up_32"),
        fixture_path=FIXTURE_PATH_REAL,
    ),
}

# Backwards-compatible module constants (tiny geometry) — tests and the
# recorded fixture reference these.
LORA_RANK = GEOMETRIES["tiny"]["lora_rank"]
B = GEOMETRIES["tiny"]["B"]
RESOLUTION = GEOMETRIES["tiny"]["resolution"]
TOTAL_STEP = GEOMETRIES["tiny"]["total_step"]
K = GEOMETRIES["tiny"]["K"]
A = GEOMETRIES["tiny"]["A"]
CAPTURE_LAYERS = GEOMETRIES["tiny"]["capture_layers"]


def _aligned_masks(word_valid: np.ndarray, resolution: int) -> np.ndarray:
    """(B, W, H, W) quadrant masks, 64px-aligned (see module doc)."""
    Bn, W = word_valid.shape
    half = resolution // 2
    out = np.zeros((Bn, W, resolution, resolution), np.uint8)
    quads = [(0, 0), (0, half), (half, 0), (half, half)]
    for b in range(Bn):
        for w in range(W):
            if word_valid[b, w]:
                y, x = quads[w % 4]
                out[b, w, y:y + half, x:x + half] = 1
    return out


def run_fixture(record: bool = False,
                fixture_path: Optional[str] = None,
                geometry: str = "tiny") -> Dict:
    """Returns the comparison record; raises nothing (caller decides
    pass/fail from record['abs_delta'])."""
    import dataclasses

    import torch
    import transformers

    import jax
    import jax.numpy as jnp

    from comat_tpu.config import (
        BLIPConfig, CLIPTextConfig, UNetConfig, VAEConfig,
    )
    from comat_tpu.models.blip import BLIPCaptioner
    from comat_tpu.models.hf_import import (
        _blip_hf_name, _clip_hf_name, _unet_hf_name, _vae_hf_name,
        convert_tree,
    )
    from comat_tpu.models.pipeline import (
        DiffusionPipeline, PipelineConfig, make_pipeline_config,
    )
    from comat_tpu.losses.caption_reward import build_caption_batch
    from comat_tpu.losses.gan import Discriminator, GanConfig
    from comat_tpu.segmentation.interface import (
        CenterPriorSegmenter, SegmenterHolder,
    )
    from comat_tpu.text.tokenizer import HashTokenizer
    from comat_tpu.tools.torch_twin_sd15 import (
        TwinUNet, TwinVAEDecoder, comat_step_loss_torch,
    )
    from comat_tpu.training.attrcon import (
        attrcon_batch_fields, make_attrcon_extra_losses,
        sample_attrcon_draws,
    )
    from comat_tpu.training.train_step import (
        TrainConfig, init_disc_state, init_train_state, make_d_optimizer,
        make_optimizer, make_train_step, sample_trained_idx,
    )

    jax.config.update("jax_default_matmul_precision", "highest")

    G = GEOMETRIES[geometry]
    real = geometry == "real"
    lora_rank = G["lora_rank"]
    Bn = G["B"]
    resolution = G["resolution"]
    total_step = G["total_step"]
    Kv, Av = G["K"], G["A"]
    capture_layers = G["capture_layers"]
    prompts = PROMPTS[:Bn]
    clip_vocab = 49408 if real else 1000
    blip_vocab = 30524 if real else 1000
    blip_image_size = 384 if real else 64

    # ---- 1. torch-side models, seeded random fp32 ----
    torch.manual_seed(SEED)
    if real:
        clip_cfg = transformers.CLIPTextConfig(
            vocab_size=clip_vocab, hidden_size=768,
            intermediate_size=3072, num_hidden_layers=12,
            num_attention_heads=12, max_position_embeddings=77,
            hidden_act="quick_gelu", bos_token_id=1, eos_token_id=2,
        )
    else:
        clip_cfg = transformers.CLIPTextConfig(
            vocab_size=clip_vocab, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77, hidden_act="quick_gelu",
            bos_token_id=0, eos_token_id=999,
        )
    text_t = transformers.CLIPTextModel(clip_cfg).eval().float()

    # Generator UNet carries LoRA — the REAL trainable surface.
    # diffusers initializes up=0 (LoRA contributes zero); re-seed the
    # up factors nonzero so (a) the forward exercises the LoRA path and
    # (b) dLoss/d(lora_a) is a meaningful gradient check (with up=0 it
    # is identically zero on both sides).
    unet_kw = (
        dict(block_out=(320, 640, 1280, 1280), heads=8, ctx_dim=768,
             groups=32)
        if real else {}
    )
    unet_t = TwinUNet(lora_rank=lora_rank, **unet_kw).eval().float()
    g_l = torch.Generator().manual_seed(SEED + 11)
    with torch.no_grad():
        for n, p in unet_t.named_parameters():
            if "_lora.up.weight" in n:
                p.copy_(torch.randn(p.shape, generator=g_l) * 0.05)
    vae_kw = (
        dict(block_out=(128, 256, 512, 512), layers_per_block=2,
             groups=32)
        if real else {}
    )
    vae_t = TwinVAEDecoder(**vae_kw).eval().float()
    d_unet_t = TwinUNet(**unet_kw).eval().float()   # the GAN D's UNet
    g = torch.Generator().manual_seed(SEED + 7)
    d_head_w = torch.randn(1, 4, generator=g).numpy() * 0.5
    d_head_b = torch.randn(1, generator=g).numpy() * 0.1

    if real:
        # Salesforce/blip-image-captioning-large geometry (BLIPConfig
        # defaults), random weights
        vcfg = transformers.BlipVisionConfig(
            image_size=384, patch_size=16, hidden_size=1024,
            num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096,
        )
        tcfg_b = transformers.BlipTextConfig(
            vocab_size=blip_vocab, hidden_size=768,
            num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, encoder_hidden_size=1024,
            max_position_embeddings=512, is_decoder=True,
            bos_token_id=30522,
        )
    else:
        vcfg = transformers.BlipVisionConfig(
            image_size=64, patch_size=16, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64,
        )
        tcfg_b = transformers.BlipTextConfig(
            vocab_size=blip_vocab, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            encoder_hidden_size=32, max_position_embeddings=512,
            is_decoder=True, bos_token_id=1,
        )
    blip_t = transformers.BlipForConditionalGeneration(
        transformers.BlipConfig(
            text_config=tcfg_b.to_dict(), vision_config=vcfg.to_dict()
        )
    ).eval().float()

    # ---- 2. convert into the JAX stack (strict on covered towers) ----
    # The twin's LoRA weights (nonzero up — see above) load into the
    # JAX LoRA leaves through the same converter as every base weight
    # (hf_import maps processor.{to_*}_lora.{down,up}.weight), so both
    # sides compute the same LoRA-bearing function and the gradient
    # check differentiates w.r.t. identical values.
    if real:
        f32 = jnp.float32
        pcfg = PipelineConfig(
            unet=dataclasses.replace(UNetConfig.sd15(), dtype=f32),
            text=dataclasses.replace(CLIPTextConfig.sd15(), dtype=f32),
            vae=dataclasses.replace(VAEConfig.sd15(), dtype=f32),
            attrcon=True,
            capture_layers=capture_layers,
            lora_rank=lora_rank,
            resolution=resolution,
        )
    else:
        pcfg = make_pipeline_config(
            "sd_1_5_attrcon", lora_rank=lora_rank, resolution=resolution,
            tiny=True,
        )
    pipe = DiffusionPipeline(pcfg)
    params = pipe.init_params(jax.random.PRNGKey(SEED))

    def sd_of(m):
        return {k: v.detach().numpy() for k, v in m.state_dict().items()}

    params["unet"], miss_u = convert_tree(
        params["unet"], sd_of(unet_t), _unet_hf_name
    )
    params["text"], miss_t = convert_tree(
        params["text"], sd_of(text_t), _clip_hf_name
    )
    params["vae"], miss_v = convert_tree(
        params["vae"], sd_of(vae_t), _vae_hf_name
    )
    miss_t = [m for m in miss_t if "text_projection" not in m]
    # VAE encoder leaves are unused by decode (twin ships decoder +
    # post_quant_conv only): tolerate encoder misses, keep decoder ones
    miss_v = [m for m in miss_v if m.startswith("decoder")]
    unmapped = miss_u + miss_t + miss_v

    if real:
        blip_cfg = dataclasses.replace(BLIPConfig.large(),
                                       dtype=jnp.float32)
    else:
        blip_cfg = BLIPConfig.tiny(vocab_size=blip_vocab)
    blip = BLIPCaptioner(blip_cfg)
    cap_tok = HashTokenizer(blip_vocab)
    clip_tok = HashTokenizer(clip_vocab)
    cap_batch = build_caption_batch(cap_tok, prompts)

    blip_params = blip.init(
        jax.random.PRNGKey(SEED),
        jnp.zeros((1, blip_image_size, blip_image_size, 3)),
        jnp.asarray(cap_batch["input_ids"][:1]),
        jnp.asarray(cap_batch["attention_mask"][:1]),
        jnp.asarray(cap_batch["labels"][:1]),
    )
    blip_params, miss_b = convert_tree(
        blip_params, sd_of(blip_t), _blip_hf_name
    )
    unmapped += miss_b

    d_unet_cfg = (
        dataclasses.replace(UNetConfig.sd15(), dtype=jnp.float32)
        if real else UNetConfig.tiny()
    )
    disc = Discriminator(d_unet_cfg, GanConfig(lora_rank=0))
    d_params = disc.init_params(
        jax.random.PRNGKey(SEED + 1), latent_size=resolution // 8,
        context_dim=d_unet_cfg.cross_attention_dim,
    )
    d_params["unet"], miss_d = convert_tree(
        d_params["unet"], sd_of(d_unet_t), _unet_hf_name
    )
    unmapped += miss_d
    d_params["head"] = {
        "params": {"mlp": {
            "kernel": jnp.asarray(d_head_w.T),   # (4, 1)
            "bias": jnp.asarray(d_head_b),
        }}
    }
    if unmapped:
        return {"error": f"{len(unmapped)} unmapped params",
                "unmapped": unmapped[:10]}

    # ---- 3. shared inputs + replicated rng derivation ----
    tcfg = TrainConfig(
        total_step=total_step, K=Kv, guidance_scale=CFG_SCALE,
        resolution=resolution, gan_loss=True, gan_loss_weight=1.0,
        attrcon=True, attrcon_train_steps=Av,
        mask_token_loss_weight=1e-3, mask_pixel_loss_weight=5e-5,
    )
    enc = clip_tok(prompts, max_length=77)
    null = clip_tok([""] * Bn, max_length=77)
    holder = SegmenterHolder(CenterPriorSegmenter(), max_words=4)
    attr_fields = attrcon_batch_fields(
        prompts, clip_tok, holder, 77, resolution=resolution
    )
    seg_masks = _aligned_masks(
        np.asarray(attr_fields["word_valid"]), resolution
    )
    batch = {
        "input_ids": jnp.asarray(enc["input_ids"]),
        "eos_positions": jnp.asarray(enc["eos_positions"]),
        "null_ids": jnp.asarray(null["input_ids"]),
        "caption_ids": jnp.asarray(cap_batch["input_ids"]),
        "caption_mask": jnp.asarray(cap_batch["attention_mask"]),
        "caption_labels": jnp.asarray(cap_batch["labels"]),
        "gt_latents": jnp.zeros((Bn, resolution // 8, resolution // 8, 4)),
        **{k: jnp.asarray(v) for k, v in attr_fields.items()},
    }
    batch["seg_masks"] = jnp.asarray(seg_masks)

    # rng derivation — MUST mirror train_step.loss_fn + forward()
    rng = jax.random.PRNGKey(SEED + 3)
    rng0 = jax.random.fold_in(rng, 0)              # state.step == 0
    rngs = jax.random.split(rng0, 4)
    trained_idx = np.asarray(sample_trained_idx(rngs[0], tcfg))
    draws = np.asarray(sample_attrcon_draws(rng0, tcfg))
    rng_noise, lrng = jax.random.split(rngs[1])    # forward()'s split
    h = resolution // 8
    latents0 = np.asarray(jax.random.normal(lrng, (Bn, h, h, 4)))
    noise_table = np.stack([
        np.asarray(jax.random.normal(
            jax.random.fold_in(rng_noise, i), (Bn, h, h, 4)
        ))
        for i in range(total_step)
    ])
    offset_range = resolution // 224        # 0 at 128px; 1 at 256px
    ox = int(jax.random.randint(rngs[2], (), 0, offset_range + 1))
    oy = int(jax.random.randint(rngs[3], (), 0, offset_range + 1))

    # ---- 4a. JAX side: the real jitted train step ----
    opt = make_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)
    d_opt = make_d_optimizer(tcfg)
    d_state, d_frozen = init_disc_state(d_params, d_opt)
    extra = make_attrcon_extra_losses(pipe, holder, tcfg)
    step = jax.jit(make_train_step(
        pipe, blip, tcfg, opt, extra_losses=extra, disc=disc,
        d_optimizer=d_opt,
    ))
    _, _, metrics = step(
        state, frozen, blip_params, batch, rng, d_state, d_frozen
    )
    ours = {k: float(metrics[k]) for k in
            ("step_loss", "reward_blip", "G_loss", "token_loss",
             "pixel_loss")}

    # ---- 4b. torch twin: forward + autograd backward ----
    # Trainable surface matches the JAX step exactly: generator-UNet
    # LoRA only (partition_params). Everything else frozen; activations
    # still carry grad so the loss graph reaches the LoRA leaves
    # through the reference's grad-toggle structure.
    for m in (text_t, vae_t, blip_t, d_unet_t):
        for p in m.parameters():
            p.requires_grad_(False)
    for n, p in unet_t.named_parameters():
        p.requires_grad_("_lora." in n)
    twin = comat_step_loss_torch(
        text_model=text_t, unet=unet_t, vae=vae_t, blip_model=blip_t,
        d_unet=d_unet_t, d_head_weight=d_head_w, d_head_bias=d_head_b,
        input_ids=np.asarray(enc["input_ids"]),
        null_ids=np.asarray(null["input_ids"]),
        caption_ids=cap_batch["input_ids"],
        caption_mask=cap_batch["attention_mask"],
        caption_labels=cap_batch["labels"],
        latents0=latents0, noise_table=noise_table,
        trained_idx=trained_idx, attrcon_draws=draws,
        crop_ox=ox, crop_oy=oy,
        seg_masks=seg_masks,
        token_idx=np.asarray(attr_fields["token_idx"]),
        token_valid=np.asarray(attr_fields["token_valid"]),
        word_valid=np.asarray(attr_fields["word_valid"]),
        num_inference_steps=total_step,
        guidance_scale=CFG_SCALE,
        vae_scaling=pcfg.vae.scaling_factor,
        blip_image_size=blip_image_size,
        capture_layers=capture_layers,
        mask_token_loss_weight=1e-3,
        mask_pixel_loss_weight=5e-5,
        resolution=resolution,
        differentiable=True,
    )
    twin["_loss"].backward()
    twin_grad_sd = {
        n: p.grad.detach().numpy()
        for n, p in unet_t.named_parameters()
        if p.grad is not None
    }
    twin.pop("_loss")

    # ---- 4c. gradient parity: jax.grad(the real training loss) vs
    # torch autograd through the twin (VERDICT r3 task 2) ----
    from comat_tpu.training.train_step import make_loss_fn

    loss_fn = make_loss_fn(
        pipe, blip, tcfg, extra_losses=extra, disc=disc
    )
    grads, _aux = jax.jit(jax.grad(loss_fn, has_aux=True))(
        state.trainable, frozen, blip_params, batch, rng0, d_params
    )
    # route the twin's grads through the SAME converter as the weights:
    # zero-filled unet-shaped tree + the grad state dict
    zeros_unet = jax.tree_util.tree_map(
        lambda x: np.zeros_like(np.asarray(x)), params["unet"]
    )
    twin_g_unet, _gmiss = convert_tree(
        zeros_unet, twin_grad_sd, _unet_hf_name
    )
    jmap = {
        jax.tree_util.keystr(p): np.asarray(leaf, np.float64)
        for p, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]
    }
    tmap = {
        jax.tree_util.keystr(p): np.asarray(leaf, np.float64)
        for p, leaf in jax.tree_util.tree_flatten_with_path(
            {"unet": twin_g_unet}
        )[0]
    }
    grad_deltas = {}
    max_rel = 0.0
    jnorm2 = tnorm2 = 0.0
    for key, gj in sorted(jmap.items()):
        if "lora" not in key:
            continue
        gt = tmap[key]
        jnorm2 += float((gj ** 2).sum())
        tnorm2 += float((gt ** 2).sum())
        abs_d = float(np.abs(gj - gt).max())
        denom = max(float(np.abs(gt).max()), float(np.abs(gj).max()))
        rel = abs_d / max(denom, 1e-12)
        max_rel = max(max_rel, rel)
        # record one representative per block: the to_q lora_a/lora_b
        # pairs (VERDICT r3 task 2's suggested handful)
        if "to_q" in key:
            grad_deltas[key] = {
                "rel": rel, "abs": abs_d, "twin_absmax": denom,
            }
    grad_summary = {
        "n_lora_leaves": sum(1 for k in jmap if "lora" in k),
        "max_rel_any_lora_leaf": max_rel,
        "grad_norm_jax": jnorm2 ** 0.5,
        "grad_norm_twin": tnorm2 ** 0.5,
    }

    record_out = {
        "fixture": G["fixture"],
        "seed": SEED,
        "config": {
            "B": Bn, "resolution": resolution, "total_step": total_step,
            "K": Kv, "attrcon_train_steps": Av, "cfg_scale": CFG_SCALE,
            "lora_rank": lora_rank,
            "gan_loss_weight": 1.0, "mask_token_loss_weight": 1e-3,
            "mask_pixel_loss_weight": 5e-5, "prompts": prompts,
        },
        "torch_twin": twin,
        "jax": ours,
        "abs_delta": abs(twin["step_loss"] - ours["step_loss"]),
        "tolerance": TOL,
        "component_deltas": {
            k: abs(twin[k] - ours[k])
            for k in ("reward_blip", "G_loss", "token_loss", "pixel_loss")
            if twin.get(k) is not None
        },
        # dLoss/d(LoRA) parity: jax.grad(make_loss_fn) vs the twin's
        # torch autograd under the reference grad-toggle semantics
        "grad_tolerance_rel": GRAD_TOL,
        "grad_summary": grad_summary,
        "grad_deltas": grad_deltas,
    }
    path = fixture_path or G["fixture_path"]
    if record:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(record_out, f, indent=1)
    return record_out


if __name__ == "__main__":
    import sys

    # FORCE cpu: this is a CPU parity check by design, and the session
    # env pins JAX_PLATFORMS=axon (remote TPU) with a sitecustomize
    # that re-applies it — a setdefault is not enough, and running the
    # fixture through the TPU relay both serializes against real
    # benchmarks and is ~10x slower (the relay admits one client).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    geom = "real" if "--real" in sys.argv else "tiny"
    rec = run_fixture(record="--record" in sys.argv, geometry=geom)
    print(json.dumps(rec, indent=1))
    if "error" in rec:
        sys.exit(2)
    ok = (
        rec["abs_delta"] <= rec["tolerance"]
        and rec["grad_summary"]["max_rel_any_lora_leaf"]
        <= rec["grad_tolerance_rel"]
    )
    sys.exit(0 if ok else 1)
