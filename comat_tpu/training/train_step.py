"""The jitted CoMat train step.

One XLA program per optimizer step, covering the reference's entire
per-step pipeline (training_script.py:543-694): K-schedule sampling ->
two-pass differentiable generation -> VAE decode -> crop jitter ->
BLIP reward (-> GAN G loss -> grounding losses) -> backward -> AdamW on
the LoRA subtree -> metrics. Data parallelism comes from input
shardings (parallel/mesh.py); the gradient mean over the mesh is
XLA-inserted.

Gradient surface: the generator's trainable subtree (LoRA by default)
is *partitioned out* of the frozen params before `jax.grad`, so no
cotangents are materialized for frozen weights (the reference instead
relies on requires_grad=False). The reference's image-gradient hook
(training_script.py:644-651) — recording ||dL/dimage|| and optionally
renormalizing it (--norm_grad) — is reproduced exactly with one BLIP
VJP whose pullback doubles as the loss gradient path (see loss_fn):
only the caption reward backpropagates through the decoded image (GAN
flows through latents, grounding through attention maps), so
dL/dimage = w * d(-reward)/dimage.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from comat_tpu.models.pipeline import DiffusionPipeline
from comat_tpu.losses.caption_reward import blip_caption_reward, crop_jitter


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirror of the reference flag surface that reaches the hot loop
    (training_utils/arguments.py; defaults = scripts/sd15.sh)."""

    total_step: int = 50            # --total_step (denoise steps)
    K: int = 5                      # --K (trained steps)
    guidance_scale: float = 7.5     # --cfg_scale
    guidance_rescale: float = 0.0   # --cfg_rescale
    resolution: int = 512
    reward_weight: float = 1.0      # --reward_weights[0] ('Blip')
    learning_rate: float = 5e-5
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    adam_weight_decay: float = 1e-2
    max_grad_norm: float = 0.1
    norm_grad: bool = False         # --norm_grad
    train_text_encoder: bool = False
    gan_loss: bool = False
    gan_loss_weight: float = 1.0
    attrcon: bool = False
    attrcon_train_steps: int = 2
    mask_token_loss_weight: float = 1e-3
    mask_pixel_loss_weight: float = 5e-5
    gradient_accumulation_steps: int = 1
    use_8bit_adam: bool = False     # --use_8bit_adam
    # --gradient_checkpointing: block-level remat inside the replay's
    # differentiable UNet calls (reference pipeline.py:73-77). Required
    # to fit the SDXL recipe on 16GB chips; pure overhead for SD1.5
    # on v5e (its un-remat'd residuals fit), so it stays opt-in.
    gradient_checkpointing: bool = False
    # --remat_min_res: SELECTIVE remat — recompute only UNet blocks at
    # spatial resolution >= this value (models/unet.py). The 64-res
    # blocks hold most of the residual bytes but few of the FLOPs, so
    # remat_min_res=64 fits the SD1.5 full recipe in 16GB HBM (which
    # OOMs by ~0.3GB un-remat'd) WITHOUT full-UNet recompute, keeping
    # pass-1 LoRA fusion and unchunked VAE decode. Overrides
    # gradient_checkpointing's remat when set.
    remat_min_res: Optional[int] = None
    # --pass1_int8: W8A8 dynamic quantization for the 50 no-grad pass-1
    # UNet forwards (models/quant.py) — opt-in numerics relaxation
    # beyond the reference's fp16 no-grad sampling; the differentiable
    # replay stays bf16/fp32
    pass1_int8: bool = False
    # --textenc_lora_lr: separate LR for text-encoder params (the
    # reference builds a second param group — training_script.py:
    # 239-252); None = one LR for everything
    textenc_lr: Optional[float] = None

    @property
    def interval(self) -> int:
        return self.total_step // self.K


class TrainState(NamedTuple):
    """Mutable-per-step state ONLY (donated through the jit). Frozen
    towers are passed alongside and never flow through outputs — they
    are shared read-only HBM (G and D share base UNet weights)."""

    step: jnp.ndarray
    trainable: Any     # LoRA (+ optionally text-enc) params
    opt_state: Any


class DiscState(NamedTuple):
    """Discriminator mutable state (second optimizer —
    training_script.py:267-275, 679-694)."""

    trainable: Any
    opt_state: Any


def partition_params(
    params,
    full_finetuning: bool = False,
    tune_vae: bool = False,
    tune_text_encoder: bool = False,
) -> Tuple[Any, Any]:
    """Split into (trainable, frozen) trees with None placeholders.

    Default trainable surface is LoRA (the reference's default);
    --full_finetuning trains the whole UNet, --tune_vae / 
    --tune_text_encoder extend the surface (reference:
    training_utils/pipeline.py:123-188 get_trainable_parameters)."""
    from comat_tpu.models.lora import is_lora_path

    def is_trainable(path) -> bool:
        keys = tuple(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        )
        if is_lora_path(keys):
            return True
        if full_finetuning and keys and keys[0] == "unet":
            return True
        if tune_vae and keys and keys[0] == "vae":
            return True
        if tune_text_encoder and keys and keys[0] in ("text", "text2"):
            return True
        return False

    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: is_trainable(path), params
    )
    trainable = jax.tree_util.tree_map(
        lambda m, p: p if m else None, mask, params
    )
    frozen = jax.tree_util.tree_map(
        lambda m, p: None if m else p, mask, params
    )
    return trainable, frozen


def partition_disc_params(d_params) -> Tuple[Any, Any]:
    """D trainables = LoRA + classification head (the reference's
    D_parameters: training_utils/gan_sdxl.py:37-40)."""
    from comat_tpu.models.lora import is_lora_path

    def is_trainable(path) -> bool:
        keys = tuple(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        return is_lora_path(keys) or (keys and keys[0] == "head")

    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: is_trainable(path), d_params
    )
    trainable = jax.tree_util.tree_map(
        lambda m, p: p if m else None, mask, d_params
    )
    frozen = jax.tree_util.tree_map(
        lambda m, p: None if m else p, mask, d_params
    )
    return trainable, frozen


from comat_tpu.models.lora import merge_params  # noqa: E402 (re-export)


def make_optimizer(cfg: TrainConfig, lr_schedule=None) -> optax.GradientTransformation:
    lr = lr_schedule if lr_schedule is not None else cfg.learning_rate

    def make_adam(lr_):
        if cfg.use_8bit_adam:
            # --use_8bit_adam (reference: bitsandbytes AdamW8bit,
            # training_script.py:216-223) — int8 blockwise moments
            from comat_tpu.training.optim8bit import adamw_8bit

            return adamw_8bit(
                lr_, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
                weight_decay=cfg.adam_weight_decay,
            )
        return optax.adamw(
            lr_, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.adam_weight_decay,
        )

    if cfg.textenc_lr is not None:
        # separate text-encoder LR group; grad clipping stays joint
        # over all trainables, like accelerate clip_grad_norm_
        # (training_script.py:659-664). The LR schedule applies to this
        # group too, scaled off its own base LR — torch LambdaLR
        # multiplies every param group's base_lr by the same factor.
        if callable(lr):
            ratio = cfg.textenc_lr / cfg.learning_rate
            text_lr = lambda step: lr(step) * ratio  # noqa: E731
        else:
            text_lr = cfg.textenc_lr
        def labels(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: (
                    "text"
                    if str(getattr(path[0], "key", path[0])) in
                    ("text", "text2")
                    else "main"
                ),
                params,
            )

        adam = optax.multi_transform(
            {"main": make_adam(lr), "text": make_adam(text_lr)},
            labels,
        )
    else:
        adam = make_adam(lr)
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm), adam,
    )
    if cfg.gradient_accumulation_steps > 1:
        # reference --gradient_accumulation_steps via accelerate
        # accumulate() (training_script.py:556); here grads accumulate
        # inside the optimizer, updates apply every N-th step
        opt = optax.MultiSteps(
            opt, every_k_schedule=cfg.gradient_accumulation_steps
        )
    return opt


def init_train_state(
    params, cfg: TrainConfig, optimizer: optax.GradientTransformation,
    full_finetuning: bool = False, tune_vae: bool = False,
    tune_text_encoder: bool = False,
) -> Tuple[TrainState, Any]:
    """Returns (state, frozen)."""
    trainable, frozen = partition_params(
        params, full_finetuning, tune_vae, tune_text_encoder
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=optimizer.init(trainable),
    )
    return state, frozen


def sample_trained_idx(rng: jnp.ndarray, cfg: TrainConfig) -> jnp.ndarray:
    """K-step gradient schedule (training_script.py:563-566): uniform
    stride `interval` with random start in [0, max_start]."""
    interval = cfg.interval
    max_start = cfg.total_step - interval * (cfg.K - 1) - 1
    start = jax.random.randint(rng, (), 0, max_start + 1)
    return start + interval * jnp.arange(cfg.K)


def make_d_optimizer(cfg: "TrainConfig", lr: float = 2e-5,
                     b1: float = 0.0, b2: float = 0.999,
                     max_grad_norm: float = 1.0) -> optax.GradientTransformation:
    """D optimizer (scripts/sd15.sh: lr_D 2e-5, adam_beta1_D 0,
    max_grad_norm_D 1.0)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(lr, b1=b1, b2=b2, eps=cfg.adam_eps,
                    weight_decay=cfg.adam_weight_decay),
    )


def init_disc_state(d_params, d_optimizer) -> Tuple[DiscState, Any]:
    """Returns (d_state, d_frozen)."""
    trainable, frozen = partition_disc_params(d_params)
    return DiscState(
        trainable=trainable,
        opt_state=d_optimizer.init(trainable),
    ), frozen


def _make_null_ctx_for_d(pipeline: DiffusionPipeline, disc):
    """D's text condition (shared by the G-loss and the D update).

    The reference computes D's null-text condition once from D's own
    (identical-weight) text encoder (gan_sdxl.py:134-155); shared
    weights make it the same vector. With --condition_discriminator,
    the G side conditions D on the actual prompts instead
    (gan_sdxl.py:59-66)."""

    def null_ctx_for_d(params, batch, condition: bool = False):
        ids = batch["input_ids"] if condition else batch["null_ids"]
        if disc is not None and disc.gan_cfg.cross_arch:
            # SD1.5-arch D under an SDXL generator (the published SDXL
            # recipe): D's 768-dim condition is the CLIP-L tower's
            # final hidden states — the same vector the reference's
            # D-side SD1.5 text encoder produces (gan_sdxl.py:134-155;
            # SDXL's text_encoder IS CLIP ViT-L).
            eos = batch.get("eos_positions") if condition else None
            hidden, _ = pipeline.text.apply(params["text"], ids, eos)
            return jax.lax.stop_gradient(hidden), None
        ids2 = (batch.get("input_ids2") if condition
                else batch.get("null_ids2"))
        enc = pipeline.encode_prompt(
            params, ids, batch.get("eos_positions") if condition else None,
            input_ids2=ids2,
        )
        added = None
        if pipeline.cfg.is_sdxl:
            added = pipeline.sdxl_added_cond(enc.pooled, ids.shape[0])
        return jax.lax.stop_gradient(enc.context), added

    return null_ctx_for_d


def make_loss_fn(
    pipeline: DiffusionPipeline,
    blip_module,
    cfg: TrainConfig,
    extra_losses: Optional[Callable] = None,
    disc=None,
):
    """Build the G-side loss function (the differentiated quantity).

    Exposed separately from make_train_step so cross-implementation
    checks can differentiate the EXACT training loss: the step-loss
    fixture (tools/step_loss_fixture.py) runs jax.grad over this
    against the torch twin's autograd — per VERDICT r3 task 2, the
    gradient-level parity check of the reference's grad-toggle
    semantics (TrainableSDPipeline.py:133-167,
    training_script.py:563-566,644-651).

    Signature: loss_fn(trainable, frozen, blip_params, batch, rng,
    d_params) -> (loss, (metrics, gen_latents)); `rng` is the
    post-fold_in per-step rng.
    """
    from comat_tpu.diffusion.schedulers import inference_timesteps
    from comat_tpu.losses.gan import gan_g_loss

    t_final = int(inference_timesteps(cfg.total_step)[-1])
    null_ctx_for_d = _make_null_ctx_for_d(pipeline, disc)

    def loss_fn(trainable, frozen, blip_params, batch, rng, d_params):
        params = merge_params(trainable, frozen)
        rngs = jax.random.split(rng, 4)
        trained_idx = sample_trained_idx(rngs[0], cfg)

        # Split attrcon flow (Grounded-SAM): pass 1 already ran in the
        # presample program (same rng -> identical trajectory); its
        # tables arrive as batch constants and forward() skips pass 1.
        presampled = None
        if "eps_table" in batch:
            presampled = (batch["eps_table"], batch["latents_traj"])

        # Attrcon: capture attention only at the A chosen segments
        # (reference: random.choices(training_steps, k=A) —
        # training_script.py:590; capture happens only there,
        # AttrConcenTrainableSDPipeline.py:159-167). The extra-losses
        # hook re-derives the same draws from `rng` for dedup weights.
        capture_idx = None
        if cfg.attrcon:
            from comat_tpu.training.attrcon import sample_attrcon_draws

            capture_idx = sample_attrcon_draws(rng, cfg)

        image, result = pipeline.forward(
            params,
            rngs[1],
            batch["input_ids"],
            batch["null_ids"],
            trained_idx,
            num_inference_steps=cfg.total_step,
            K=cfg.K,
            guidance_scale=cfg.guidance_scale,
            guidance_rescale=cfg.guidance_rescale,
            eos_positions=batch.get("eos_positions"),
            input_ids2=batch.get("input_ids2"),
            null_ids2=batch.get("null_ids2"),
            train_text_encoder=cfg.train_text_encoder,
            capture=cfg.attrcon,
            # the (trainable, frozen) partition enables cached-primal
            # replay segments (diff w.r.t. the trainable subtree only)
            trainable=trainable,
            frozen=frozen,
            remat=(cfg.remat_min_res if cfg.remat_min_res
                   else cfg.gradient_checkpointing),
            # gradient_checkpointing doubles as the memory-tight
            # signal: skip the pass-1 LoRA fusion there (it holds a
            # second copy of every attention base kernel) and decode
            # the VAE in bs-2 chunks (its 512-res activations are the
            # step's HBM peak)
            fuse_pass1=not cfg.gradient_checkpointing,
            pass1_int8=cfg.pass1_int8,
            presampled=presampled,
            capture_idx=capture_idx,
        )

        # ---- reward-gradient tap (training_script.py:644-651) ----
        # Only the caption reward backpropagates through the decoded
        # image (GAN flows through latents, grounding through attention
        # maps), so dL/dimage = w * d(-reward)/dimage exactly. One
        # checkpointed VJP therefore yields BOTH the reference's
        # reward_norm metric / --norm_grad rescale AND the loss gradient
        # path, via linear reattachment: grad(<sg(g·factor), img>) wrt
        # img is g·factor — exact, since the loss is differentiated
        # once. 3 BLIP passes total (fwd + remat fwd + bwd) instead of
        # the 5 a separate norm-grad backward would cost.
        def caption_loss_of_image(img):
            r = blip_caption_reward(
                blip_module, blip_params, img,
                batch["caption_ids"], batch["caption_mask"],
                batch["caption_labels"],
            )
            return -(cfg.reward_weight * r)

        # crop jitter (training_script.py:606-611)
        offset_range = cfg.resolution // 224
        ox = jax.random.randint(rngs[2], (), 0, offset_range + 1)
        oy = jax.random.randint(rngs[3], (), 0, offset_range + 1)
        size = cfg.resolution - offset_range
        cropped = crop_jitter(image, ox, oy, size)

        closs, pullback = jax.vjp(
            jax.checkpoint(caption_loss_of_image),
            jax.lax.stop_gradient(cropped),
        )
        (img_grad,) = pullback(jnp.ones_like(closs))
        reward_norm = jnp.linalg.norm(img_grad.astype(jnp.float32))
        factor = jnp.where(
            cfg.norm_grad, 1e4 / jnp.maximum(reward_norm, 1e-12), 1.0
        )
        loss_caption = closs + jnp.sum(
            jax.lax.stop_gradient(img_grad * factor)
            * (cropped - jax.lax.stop_gradient(cropped))
        )
        reward = -closs / cfg.reward_weight
        total_reward = cfg.reward_weight * reward
        loss = loss_caption  # == -total_reward (training_script.py:618)

        metrics = {
            "reward_blip": reward,
            "reward_total": total_reward,
            "reward_norm": reward_norm,
        }

        if disc is not None:
            null_ctx, null_added = null_ctx_for_d(
                params, batch,
                condition=disc.gan_cfg.condition_discriminator,
            )
            g_loss = gan_g_loss(
                disc, d_params, result.latents,
                jnp.full((result.latents.shape[0],), t_final, jnp.int32),
                null_ctx, null_added,
            )
            loss = loss + cfg.gan_loss_weight * g_loss
            metrics["G_loss"] = g_loss

        if extra_losses is not None:
            add, extra_metrics = extra_losses(params, batch, image, result, rng)
            loss = loss + add
            metrics.update(extra_metrics)
        metrics["step_loss"] = loss
        return loss, (metrics, result.latents)

    return loss_fn


def make_train_step(
    pipeline: DiffusionPipeline,
    blip_module,
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    extra_losses: Optional[Callable] = None,
    disc=None,
    d_optimizer: Optional[optax.GradientTransformation] = None,
):
    """Build the jitted train step.

    With `disc` (a losses.gan.Discriminator) and `d_optimizer`, the step
    performs the reference's full G-then-D sequence in one XLA program
    (training_script.py:556-694): G update with the GAN G-loss added,
    then the D update on detached latents + ground-truth latents from
    the batch ("gt_latents").

    extra_losses(merged_params, batch, image, result, rng) ->
    (loss_add, metrics_dict) — hook for grounding losses.
    """
    from comat_tpu.diffusion.schedulers import inference_timesteps
    from comat_tpu.losses.gan import gan_d_loss

    t_final = int(inference_timesteps(cfg.total_step)[-1])
    loss_fn = make_loss_fn(
        pipeline, blip_module, cfg, extra_losses=extra_losses, disc=disc
    )
    null_ctx_for_d = _make_null_ctx_for_d(pipeline, disc)

    def train_step(
        state: TrainState, frozen, blip_params, batch, rng,
        d_state: Optional[DiscState] = None, d_frozen=None,
    ):
        rng = jax.random.fold_in(rng, state.step)
        d_params = (
            merge_params(d_state.trainable, d_frozen)
            if d_state is not None
            else None
        )
        (loss, (metrics, gen_latents)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.trainable, frozen, blip_params, batch, rng, d_params)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.trainable
        )
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(
            step=state.step + 1,
            trainable=trainable,
            opt_state=opt_state,
        )

        new_d_state = d_state
        if disc is not None and d_state is not None:
            g_params = merge_params(trainable, frozen)
            null_ctx, null_added = null_ctx_for_d(g_params, batch)
            tf = jnp.full((gen_latents.shape[0],), t_final, jnp.int32)
            tf2 = jnp.concatenate([tf, tf])

            def d_loss_fn(d_trainable):
                dp = merge_params(d_trainable, d_frozen)
                return gan_d_loss(
                    disc, dp, gen_latents, batch["gt_latents"], tf2,
                    null_ctx, null_added,
                )

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.trainable)
            d_updates, d_opt_state = d_optimizer.update(
                d_grads, d_state.opt_state, d_state.trainable
            )
            new_d_state = DiscState(
                trainable=optax.apply_updates(d_state.trainable, d_updates),
                opt_state=d_opt_state,
            )
            metrics["D_loss"] = d_loss

        return new_state, new_d_state, metrics

    return train_step


def make_presample(pipeline, cfg: TrainConfig):
    """Build the no-grad presample program for the split attrcon flow.

    When the segmenter is image-dependent (Grounded-SAM), the per-step
    sequence on TPU is:

      1. jit(presample)(state, frozen, batch, rng) -> image + tables
      2. host: masks = segmenter(image, nouns)      (no in-graph
         callback — the axon PJRT relay rejects host callbacks)
      3. jit(train_step)(..., batch + {seg_masks, eps_table,
         latents_traj}, rng) — forward() replays from the tables, so
         the 50 sampling forwards are not paid twice.

    rng derivation mirrors train_step/loss_fn exactly (fold_in on
    state.step, split(4)[1] for the sampler), making the replayed
    trajectory bitwise-equal to the presampled one."""

    def presample(state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        rngs = jax.random.split(rng, 4)
        params = merge_params(
            jax.lax.stop_gradient(state.trainable), frozen
        )
        return pipeline.presample(
            params,
            rngs[1],
            batch["input_ids"],
            batch["null_ids"],
            num_inference_steps=cfg.total_step,
            guidance_scale=cfg.guidance_scale,
            guidance_rescale=cfg.guidance_rescale,
            eos_positions=batch.get("eos_positions"),
            input_ids2=batch.get("input_ids2"),
            null_ids2=batch.get("null_ids2"),
            fuse_pass1=not cfg.gradient_checkpointing,
            pass1_int8=cfg.pass1_int8,
        )

    return presample
