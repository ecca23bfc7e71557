"""Diffusion pipeline bundle: UNet + text encoder(s) + VAE + sampler.

Functional equivalent of the reference's TrainableSD(XL)Pipeline +
training_utils/pipeline.py factory. A `DiffusionPipeline` owns module
*definitions* and static config; parameters are explicit pytrees passed
to every method (grads flow where the caller wants them).

Model-name registry mirrors the reference's `--pretrain_model_name`
choices (training_utils/arguments.py:10, training_utils/pipeline.py:
42-82): sd_1_5, sd_1_5_attrcon, sdxl, sdxl_unet, sdxl_attrcon,
sdxl_attrcon_unet — "attrcon" variants enable attention capture at the
reference's layer lists (training_script.py:312-315).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from comat_tpu.config import CLIPTextConfig, UNetConfig, VAEConfig
from comat_tpu.diffusion.guidance import make_cfg_eps_model
from comat_tpu.diffusion.sampler import (
    SampleResult,
    prepare_latents,
    sample_comat,
    sample_inference,
)
from comat_tpu.diffusion.schedulers import (
    DiffusionSchedule,
    make_sampler_coeffs,
    make_schedule,
)
from comat_tpu.models.clip_text import CLIPTextEncoder
from comat_tpu.models.unet import UNet2DCondition
from comat_tpu.models.vae import AutoencoderKL


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    unet: UNetConfig
    text: CLIPTextConfig
    vae: VAEConfig
    text2: Optional[CLIPTextConfig] = None  # SDXL second encoder
    is_sdxl: bool = False
    attrcon: bool = False
    capture_layers: Tuple[str, ...] = ()
    lora_rank: int = 32
    text_lora_rank: int = 0
    resolution: int = 512
    # --prediction_type: "epsilon" (SD1.5/SDXL default) or
    # "v_prediction" (converted to eps at the unet_apply boundary so
    # every eps-based sampler table applies unchanged)
    prediction_type: str = "epsilon"

    @property
    def latent_size(self) -> int:
        return self.resolution // 8


# Reference capture lists: training_script.py:315 (SD1.5) / :312 (SDXL).
SD15_CAPTURE = ("mid_8", "up_16", "up_32", "up_64")
SDXL_CAPTURE = ("mid_16", "up_16", "up_32")


def make_pipeline_config(
    name: str,
    lora_rank: int = 32,
    text_lora_rank: int = 0,
    resolution: int = 512,
    tiny: bool = False,
    prediction_type: str = "epsilon",
) -> PipelineConfig:
    if prediction_type not in ("epsilon", "v_prediction"):
        # fail loudly: a typo here would silently train a v-model in
        # epsilon mode (unet_apply string-compares the value)
        raise ValueError(
            f"prediction_type must be 'epsilon' or 'v_prediction', "
            f"got {prediction_type!r}"
        )
    attrcon = "attrcon" in name
    if name.startswith("sd_1_5"):
        if tiny:
            return PipelineConfig(
                unet=UNetConfig.tiny(),
                text=CLIPTextConfig.tiny(),
                vae=VAEConfig.tiny(),
                attrcon=attrcon,
                capture_layers=("mid_2", "up_4", "up_8", "up_16"),
                lora_rank=lora_rank,
                text_lora_rank=text_lora_rank,
                resolution=resolution,
                prediction_type=prediction_type,
            )
        return PipelineConfig(
            unet=UNetConfig.sd15(),
            text=CLIPTextConfig.sd15(),
            vae=VAEConfig.sd15(),
            attrcon=attrcon,
            capture_layers=SD15_CAPTURE,
            lora_rank=lora_rank,
            text_lora_rank=text_lora_rank,
            resolution=resolution,
            prediction_type=prediction_type,
        )
    if name.startswith("sdxl"):
        if tiny:
            return PipelineConfig(
                # context = concat of both encoders (32 + 32), like the
                # real 768 + 1280 = 2048
                unet=UNetConfig.tiny_xl(cross_attention_dim=64),
                text=CLIPTextConfig.tiny(),
                vae=VAEConfig.tiny(),
                text2=CLIPTextConfig.tiny(),
                is_sdxl=True,
                attrcon=attrcon,
                capture_layers=("mid_4", "up_4", "up_8"),
                lora_rank=lora_rank,
                text_lora_rank=text_lora_rank,
                resolution=resolution,
                prediction_type=prediction_type,
            )
        return PipelineConfig(
            unet=UNetConfig.sdxl(),
            text=CLIPTextConfig.sd15(),
            vae=VAEConfig.sdxl(),
            text2=CLIPTextConfig.sdxl_big_g(),
            is_sdxl=True,
            attrcon=attrcon,
            capture_layers=SDXL_CAPTURE,
            lora_rank=lora_rank,
            text_lora_rank=text_lora_rank,
            resolution=resolution,
            prediction_type=prediction_type,
        )
    raise ValueError(f"unknown pipeline name {name!r}")


class EncodedPrompt(NamedTuple):
    context: jnp.ndarray                 # (B, L, D)
    pooled: Optional[jnp.ndarray]        # (B, Dp) — SDXL only


class DiffusionPipeline:
    """Module bundle. All methods take `params` explicitly:
    params = {"unet": ..., "text": ..., ["text2": ...], "vae": ...}.
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet, lora_rank=cfg.lora_rank)
        # LoRA-free twin for no-grad passes: applied with fuse_lora_tree
        # params (W + A@B folded once per step), skipping the per-token
        # rank-128 LoRA matmuls in the 50 pass-1 / validation forwards.
        self.unet_inf = (
            UNet2DCondition(cfg.unet, lora_rank=0)
            if cfg.lora_rank > 0
            else self.unet
        )
        self.text = CLIPTextEncoder(cfg.text, lora_rank=cfg.text_lora_rank)
        self.text2 = (
            CLIPTextEncoder(cfg.text2, lora_rank=cfg.text_lora_rank)
            if cfg.text2 is not None
            else None
        )
        self.vae = AutoencoderKL(cfg.vae)
        self.schedule: DiffusionSchedule = make_schedule()

    # ---- init ----
    def init_params(self, rng: jnp.ndarray) -> Dict[str, Any]:
        cfg = self.cfg
        B, s = 1, cfg.latent_size
        ks = jax.random.split(rng, 4)
        ids = jnp.zeros((B, cfg.text.max_length), jnp.int32)
        ctx_dim = cfg.unet.cross_attention_dim
        latents = jnp.zeros((B, s, s, 4))
        t = jnp.zeros((B,), jnp.int32)
        ctx = jnp.zeros((B, cfg.text.max_length, ctx_dim))
        added = None
        if cfg.is_sdxl:
            pooled_dim = (
                cfg.text2.projection_dim or cfg.text2.hidden_size
            )
            added = {
                "text_embeds": jnp.zeros((B, pooled_dim)),
                "time_ids": jnp.zeros((B, 6)),
            }
        params = {
            "unet": self.unet.init(ks[0], latents, t, ctx, added),
            "text": self.text.init(ks[1], ids),
            "vae": self.vae.init(
                ks[2], jnp.zeros((B, cfg.resolution, cfg.resolution, 3))
            ),
        }
        if self.text2 is not None:
            params["text2"] = self.text2.init(ks[3], ids)
        return params

    # ---- text ----
    def encode_prompt(
        self,
        params: Dict[str, Any],
        input_ids: jnp.ndarray,
        eos_positions: Optional[jnp.ndarray] = None,
        input_ids2: Optional[jnp.ndarray] = None,
        train_text_encoder: bool = False,
    ) -> EncodedPrompt:
        """SD1.5: final hidden states. SDXL: concat of penultimate
        states of both encoders + projected pooled of encoder 2
        (reference: TrainableSDPipeline.py encode_prompt paths)."""
        if not self.cfg.is_sdxl:
            hidden, _ = self.text.apply(params["text"], input_ids, eos_positions)
            out = EncodedPrompt(hidden, None)
        else:
            h1, _ = self.text.apply(
                params["text"], input_ids, eos_positions,
                output_hidden_state_skip=1,
            )
            ids2 = input_ids2 if input_ids2 is not None else input_ids
            h2, pooled = self.text2.apply(
                params["text2"], ids2, eos_positions,
                output_hidden_state_skip=1,
            )
            out = EncodedPrompt(
                jnp.concatenate([h1, h2], axis=-1), pooled
            )
        if not train_text_encoder:
            out = EncodedPrompt(
                jax.lax.stop_gradient(out.context),
                None if out.pooled is None else jax.lax.stop_gradient(out.pooled),
            )
        return out

    def sdxl_added_cond(
        self, pooled: jnp.ndarray, batch: int,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
    ) -> Dict[str, jnp.ndarray]:
        """add_time_ids (reference: TrainableSDPipeline.py:428-449)."""
        r = self.cfg.resolution
        osz = original_size or (r, r)
        tsz = target_size or (r, r)
        ids = jnp.asarray(
            [list(osz) + list(crops_coords_top_left) + list(tsz)],
            dtype=jnp.float32,
        )
        return {
            "text_embeds": pooled,
            "time_ids": jnp.broadcast_to(ids, (batch, 6)),
        }

    # ---- unet / vae ----
    def unet_apply(
        self, params, latents, t, context, added_cond=None, capture=False,
        fast=False, fused=False, remat=False,
    ):
        """`fused=True` applies the LoRA-free twin; `params["unet"]`
        must then be a `fuse_lora_tree` output (see fused_params).
        `remat=True` enables block-level gradient checkpointing."""
        unet = self.unet_inf if fused else self.unet
        out, captured = unet.apply(
            params["unet"], latents, t, context, added_cond,
            capture=capture, capture_layers=self.cfg.capture_layers,
            fast=fast, remat=remat,
        )
        if self.cfg.prediction_type == "v_prediction":
            from comat_tpu.diffusion.schedulers import v_to_eps

            out = v_to_eps(self.schedule, t, latents, out)
        return out, captured

    def decode_image(
        self, params, latents: jnp.ndarray, chunk: Optional[int] = None,
        remat_blocks: bool = True,
    ) -> jnp.ndarray:
        """latents -> image in [0,1]-ish (unclamped, matching
        reference TrainableSDPipeline.py:219-223 `image/2 + 0.5`).

        `chunk` decodes the batch in sub-batches via lax.map — for
        NO-GRAD callers (inference tools) that want a smaller decode
        footprint. Under reverse AD the map stacks per-chunk residuals
        and measures WORSE than the straight-line decode (19.2 vs
        17.9GB on the SDXL bs6 step), so the train step does not use
        it."""
        z = latents / self.cfg.vae.scaling_factor
        B = z.shape[0]
        if chunk and chunk < B and B % chunk == 0:
            zc = z.reshape(B // chunk, chunk, *z.shape[1:])
            img = jax.lax.map(
                lambda zz: self.vae.apply(
                    params["vae"], zz, remat_blocks,
                    method=AutoencoderKL.decode,
                ),
                zc,
            )
            img = img.reshape(B, *img.shape[2:])
        else:
            img = self.vae.apply(
                params["vae"], z, remat_blocks,
                method=AutoencoderKL.decode,
            )
        return img / 2.0 + 0.5

    def fused_params(
        self, params: Dict[str, Any], int8: bool = False
    ) -> Dict[str, Any]:
        """Copy of `params` with the UNet's LoRA folded into base
        kernels (for unet_apply(..., fused=True)). `int8=True`
        additionally rewrites the folded UNet kernels to W8A8 form
        (models/quant.py) — pass-1-only opt-in numerics
        (--pass1_int8)."""
        out = dict(params)
        if self.cfg.lora_rank > 0:
            from comat_tpu.models.lora import fuse_lora_tree

            out["unet"] = fuse_lora_tree(params["unet"])
        if int8:
            from comat_tpu.models.quant import quantize_unet_tree

            out["unet"] = quantize_unet_tree(out["unet"])
        return out

    # ---- the CoMat forward (reference forward(): the hot path) ----
    def forward(
        self,
        params: Dict[str, Any],
        rng: jnp.ndarray,
        input_ids: jnp.ndarray,
        null_ids: jnp.ndarray,
        trained_idx: jnp.ndarray,
        *,
        num_inference_steps: int = 50,
        K: int = 5,
        guidance_scale: float = 7.5,
        guidance_rescale: float = 0.0,
        eos_positions: Optional[jnp.ndarray] = None,
        null_eos_positions: Optional[jnp.ndarray] = None,
        input_ids2: Optional[jnp.ndarray] = None,
        null_ids2: Optional[jnp.ndarray] = None,
        train_text_encoder: bool = False,
        capture: bool = False,
        latents0: Optional[jnp.ndarray] = None,
        trainable: Any = None,
        frozen: Any = None,
        remat: bool = False,
        fuse_pass1: bool = True,
        pass1_int8: bool = False,
        decode_chunk: Optional[int] = None,
        presampled: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        capture_idx: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, SampleResult]:
        """Differentiable online generation. Returns (image, result).

        image: (B, H, W, 3) in [0,1] unclamped, differentiable through
        the K trained steps + VAE decode.

        With a (trainable, frozen) partition of `params` supplied (see
        training.train_step.partition_params), the replay pass runs
        cached-primal segments — pass 1's eps is reused as the primal
        and the segment VJP differentiates w.r.t. the trainable subtree
        only (no cotangents for frozen towers). capture=True captures
        attention maps at the `capture_idx` segments only (default all
        K) via post-scan cond-half capture forwards
        (sampler._make_capture_only) — the reference captures only at
        the attrcon-chosen steps
        (AttrConcenTrainableSDPipeline.py:159-167).
        """
        cfg = self.cfg
        B = input_ids.shape[0]
        enc = self.encode_prompt(
            params, input_ids, eos_positions, input_ids2, train_text_encoder
        )
        nenc = self.encode_prompt(
            params, null_ids, null_eos_positions,
            null_ids2 if null_ids2 is not None else null_ids,
            train_text_encoder,
        )
        added = null_added = None
        if cfg.is_sdxl:
            added = self.sdxl_added_cond(enc.pooled, B)
            null_added = self.sdxl_added_cond(nenc.pooled, B)

        # Differentiable eps-model (pass 2): live params; fused Pallas
        # attention with its custom VJP (non-captured layers), XLA
        # attention on captured layers.
        # Captured maps live in the UNet's compute dtype: bf16 in
        # production, fp32 at tiny fixture geometry (exact twin checks).
        cap_dtype = self.cfg.unet.dtype
        eps_model = make_cfg_eps_model(
            lambda lat, t, ctx, ac, cap: self.unet_apply(
                params, lat, t, ctx, ac, cap, fast=True, remat=remat
            ),
            enc.context,
            nenc.context if guidance_scale > 1.0 else None,
            guidance_scale,
            guidance_rescale,
            added,
            null_added,
            capture_dtype=cap_dtype,
        )
        # Inference eps-model (pass 1): Pallas flash attention over
        # fully stop-gradient'd params — keeps the no-VJP kernel out of
        # the autodiff graph entirely. LoRA is folded into the base
        # kernels once here (outside the scan), not re-applied
        # per-token in each of the 50 forwards. Skipped entirely when
        # pass 1 already ran in the trainer's presample program.
        sg = jax.lax.stop_gradient
        eps_model_inf = None
        if presampled is None:
            params_ng = jax.tree_util.tree_map(sg, params)
            if fuse_pass1:
                # fusing duplicates every LoRA-bearing base kernel for
                # the life of the step (~1.8GB for SDXL) — callers in
                # memory-tight configs pass fuse_pass1=False and pay
                # the per-token LoRA matmuls instead
                params_ng = self.fused_params(params_ng, int8=pass1_int8)
            elif pass1_int8:
                # unfused int8: base kernels quantize, the fp32 LoRA
                # branch rides alongside (QDense dispatches per-kernel)
                from comat_tpu.models.quant import quantize_unet_tree

                params_ng = dict(params_ng)
                params_ng["unet"] = quantize_unet_tree(params_ng["unet"])
            eps_model_inf = make_cfg_eps_model(
                lambda lat, t, ctx, ac, cap: self.unet_apply(
                    params_ng, lat, t, ctx, ac, cap, fast=True,
                    fused=fuse_pass1
                ),
                sg(enc.context),
                sg(nenc.context) if guidance_scale > 1.0 else None,
                guidance_scale,
                guidance_rescale,
                None if added is None else {k: sg(v) for k, v in added.items()},
                None if null_added is None else {k: sg(v) for k, v in null_added.items()},
            )
        # Cached-primal replay (sampler.py _make_cached_primal_eps):
        # all differentiable inputs of the guided eps — the trainable
        # subtree and the prompt encodings — travel explicitly in
        # diff_tree; the frozen towers travel in aux_tree (explicit too,
        # with symbolic-zero cotangents: custom_vjp functions must not
        # close over traced values).
        diff_eps_model = diff_tree = aux_tree = None
        diff_capture_primal = None
        if trainable is not None:
            from comat_tpu.models.lora import merge_params

            diff_tree = {
                "trainable": trainable,
                "context": enc.context,
                "null_context": (
                    nenc.context if guidance_scale > 1.0 else None
                ),
                "added": added,
                "null_added": null_added,
            }
            aux_tree = {"frozen": frozen}

            def _diff_em(d, aux):
                p = merge_params(d["trainable"], aux["frozen"])
                return make_cfg_eps_model(
                    lambda l, tt, ctx, ac, cap: self.unet_apply(
                        p, l, tt, ctx, ac, cap, fast=True, remat=remat
                    ),
                    d["context"],
                    d["null_context"],
                    guidance_scale,
                    guidance_rescale,
                    d["added"],
                    d["null_added"],
                    capture_dtype=cap_dtype,
                )

            def diff_eps_model(d, aux, lat, t):
                eps, _ = _diff_em(d, aux)(lat, t, False)
                return eps

            if capture:
                def diff_capture_primal(d, aux, lat, t):
                    # cond-half-only capture forward (batch B, vs the
                    # 2B CFG batch): attention maps are per-sample, so
                    # this computes the exact values the reference's
                    # split cond-half capture call produces
                    # (AttrConcenTrainableSDPipeline.py:239-279); the
                    # eps output is discarded (the segment chain's eps
                    # comes from the cached pass-1 table)
                    p = merge_params(d["trainable"], aux["frozen"])
                    _, cap = self.unet_apply(
                        p, lat, t, d["context"], d["added"], True,
                        fast=True,
                    )
                    return jax.tree_util.tree_map(
                        lambda a: a.astype(cap_dtype), cap
                    )

        coeffs = make_sampler_coeffs(
            self.schedule, num_inference_steps, kind="ddpm"
        )
        if latents0 is None:
            # mirror the split even when presampled (latents0 unused
            # then) so the per-step noise stream matches presample()
            rng, lrng = jax.random.split(rng)
            if presampled is None:
                latents0 = prepare_latents(
                    lrng, B, cfg.resolution, cfg.resolution
                )
        interval = num_inference_steps // K
        res = sample_comat(
            eps_model, coeffs, latents0, rng, trained_idx, interval,
            capture=capture, eps_model_inference=eps_model_inf,
            diff_eps_model=diff_eps_model, diff_tree=diff_tree,
            aux_tree=aux_tree,
            diff_capture_primal=diff_capture_primal,
            presampled=presampled, capture_idx=capture_idx,
        )
        # Decoder per-block remat follows the memory-tight flag: the
        # recompute costs ~53ms/step at SD1.5 bs4 and is only needed
        # where HBM is the constraint (measured in models/vae.py note).
        image = self.decode_image(
            params, res.latents, chunk=decode_chunk, remat_blocks=remat
        )
        return image, res

    def presample(
        self,
        params: Dict[str, Any],
        rng: jnp.ndarray,
        input_ids: jnp.ndarray,
        null_ids: jnp.ndarray,
        *,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        guidance_rescale: float = 0.0,
        eos_positions: Optional[jnp.ndarray] = None,
        null_eos_positions: Optional[jnp.ndarray] = None,
        input_ids2: Optional[jnp.ndarray] = None,
        null_ids2: Optional[jnp.ndarray] = None,
        fuse_pass1: bool = True,
        pass1_int8: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Pass 1 alone, entirely no-grad: fused LoRA, flash attention,
        VAE decode. Returns (image01, eps_table, latents_traj).

        Host stages that must see the generated image before the grad
        program (Grounded-SAM segmentation — the axon TPU relay has no
        in-graph host callbacks) run between this program and
        `forward(..., presampled=(eps_table, latents_traj))`, which
        replays from the tables instead of re-sampling. The rng
        split/fold structure mirrors forward() exactly, so given the
        same `rng` the grad program's replay reproduces this
        trajectory bitwise."""
        cfg = self.cfg
        B = input_ids.shape[0]
        sg = jax.lax.stop_gradient
        params = jax.tree_util.tree_map(sg, params)
        enc = self.encode_prompt(params, input_ids, eos_positions, input_ids2)
        nenc = self.encode_prompt(
            params, null_ids, null_eos_positions,
            null_ids2 if null_ids2 is not None else null_ids,
        )
        added = null_added = None
        if cfg.is_sdxl:
            added = self.sdxl_added_cond(enc.pooled, B)
            null_added = self.sdxl_added_cond(nenc.pooled, B)
        if fuse_pass1:
            params_f = self.fused_params(params, int8=pass1_int8)
        elif pass1_int8:
            from comat_tpu.models.quant import quantize_unet_tree

            params_f = dict(params)
            params_f["unet"] = quantize_unet_tree(params["unet"])
        else:
            params_f = params
        eps_model_inf = make_cfg_eps_model(
            lambda lat, t, ctx, ac, cap: self.unet_apply(
                params_f, lat, t, ctx, ac, cap, fast=True, fused=fuse_pass1
            ),
            enc.context,
            nenc.context if guidance_scale > 1.0 else None,
            guidance_scale,
            guidance_rescale,
            added,
            null_added,
        )
        coeffs = make_sampler_coeffs(
            self.schedule, num_inference_steps, kind="ddpm"
        )
        rng, lrng = jax.random.split(rng)  # same structure as forward()
        latents0 = prepare_latents(lrng, B, cfg.resolution, cfg.resolution)
        x_final, eps_table, traj = sample_inference(
            eps_model_inf, coeffs, latents0, rng
        )
        image = self.decode_image(params, x_final)
        return image, eps_table, traj

    # ---- inference (validation / latent generation) ----
    def generate(
        self,
        params: Dict[str, Any],
        rng: jnp.ndarray,
        input_ids: jnp.ndarray,
        null_ids: jnp.ndarray,
        *,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        guidance_rescale: float = 0.0,
        eos_positions: Optional[jnp.ndarray] = None,
        input_ids2: Optional[jnp.ndarray] = None,
        null_ids2: Optional[jnp.ndarray] = None,
        kind: str = "ddpm",
        output_type: str = "image",
        latents0: Optional[jnp.ndarray] = None,
        int8: bool = False,
    ):
        """No-grad sampling (reference __call__ path /
        tools/gan_gt_generate.py)."""
        cfg = self.cfg
        B = input_ids.shape[0]
        enc = self.encode_prompt(params, input_ids, eos_positions, input_ids2)
        nenc = self.encode_prompt(
            params, null_ids, None,
            null_ids2 if null_ids2 is not None else null_ids,
        )
        added = null_added = None
        if cfg.is_sdxl:
            added = self.sdxl_added_cond(enc.pooled, B)
            null_added = self.sdxl_added_cond(nenc.pooled, B)
        params_f = self.fused_params(params, int8=int8)
        eps_model = make_cfg_eps_model(
            lambda lat, t, ctx, ac, cap: self.unet_apply(
                params_f, lat, t, ctx, ac, cap, fast=True, fused=True
            ),
            enc.context,
            nenc.context if guidance_scale > 1.0 else None,
            guidance_scale,
            guidance_rescale,
            added,
            null_added,
        )
        if latents0 is None:
            rng, lrng = jax.random.split(rng)
            latents0 = prepare_latents(lrng, B, cfg.resolution, cfg.resolution)
        if kind in ("dpmpp", "dpm++", "DPM++"):
            from comat_tpu.diffusion.schedulers import sample_dpmpp_2m

            latents = sample_dpmpp_2m(
                eps_model, self.schedule, num_inference_steps, latents0
            )
        else:
            coeffs = make_sampler_coeffs(
                self.schedule, num_inference_steps, kind=kind
            )
            latents, _, _ = sample_inference(eps_model, coeffs, latents0, rng)
        if output_type == "latent":
            return latents
        return jnp.clip(self.decode_image(params, latents), 0.0, 1.0)
