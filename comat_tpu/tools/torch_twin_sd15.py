"""Independent torch twin of the SD1.5 CoMat train-step LOSS.

Purpose (the BASELINE.json north star): an independent numerical
cross-check of the diffusion backbone — UNet2DCondition, VAE decoder,
DDPM scheduler — plus the full CoMat step-loss assembly, at tiny
geometry, fp32, on a seeded fixture. diffusers is absent in this image,
so this module re-implements the *reference semantics* in plain torch:

  - the denoise loop with CFG and the DDPMScheduler(fixed_small,
    epsilon, no clipping) step — /root/reference/TrainableSDPipeline.py
    :132-185 + diffusers DDPMScheduler.step as configured by
    training_utils/pipeline.py:50-59;
  - VAE decode -> image/2 + 0.5 (TrainableSDPipeline.py:219-223);
  - crop jitter -> BLIP caption CE reward (training_script.py:606-618,
    concept_mat_utils/caption_blip.py:33-58) via HF transformers'
    BlipForConditionalGeneration (an independent BLIP);
  - GAN G-side loss: D-UNet at the final timestep + Linear(4,1) head,
    BCE vs ones (training_utils/gan_sdxl.py:50-89);
  - attention capture at the attrcon-chosen steps (cond half) and the
    token/pixel grounding losses, transcribed with the reference's
    per-word loop structure (attn_utils/tc_loss_utils.py:66-167,
    attr_concen_utils/gsam_interface.py:204-226) — deliberately NOT the
    vectorized form comat_tpu.losses.grounding uses.

The text encoder is HF transformers' CLIPTextModel (independent);
UNet/VAE twins are written here with diffusers' state-dict naming so
comat_tpu.models.hf_import's converters can load the SAME weights into
the JAX side. All randomness (initial latents, per-step DDPM noise,
K-schedule, attrcon draws, crop offsets) is injected as explicit
arrays, generated once by the fixture harness (tools/parity.py
check_step_loss_twin / tests/test_step_loss_fixture.py).

The fixture checks BOTH the step LOSS and, with `differentiable=True`,
the step GRADIENTS: comat_step_loss_torch replays the reference's
grad-toggle semantics (TrainableSDPipeline.py:133-167) under torch
autograd, and the fixture compares dLoss/d(LoRA) leaf-by-leaf against
jax.grad of the real training loss (training.train_step.make_loss_fn)
— an implementation-independent check of the selective-gradient
structure that tests/test_sampler.py could only test JAX-vs-JAX.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import torch
    from torch import nn
    import torch.nn.functional as F
except ImportError:  # torch-free envs: callers report SKIP
    torch = None
    nn = object  # type: ignore[misc,assignment]


# ---------------------------------------------------------------------
# DDPM schedule (diffusers DDPMScheduler semantics, fp64 tables)
# ---------------------------------------------------------------------

def ddpm_tables(num_train_timesteps: int = 1000,
                beta_start: float = 0.00085, beta_end: float = 0.012):
    """scaled_linear betas (SD1.5/SDXL config) -> alphas_cumprod."""
    betas = np.linspace(
        beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps,
        dtype=np.float64,
    ) ** 2
    return np.cumprod(1.0 - betas)


def ddpm_timesteps(num_inference_steps: int,
                   num_train_timesteps: int = 1000,
                   steps_offset: int = 1) -> np.ndarray:
    """"leading" spacing with steps_offset=1: 50 -> [981, 961, ..., 1]."""
    ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * ratio).round()[::-1]
    return (ts + steps_offset).astype(np.int64)


def ddpm_step(acp: np.ndarray, t: int, step_ratio: int,
              sample: "torch.Tensor", eps: "torch.Tensor",
              noise: "torch.Tensor") -> "torch.Tensor":
    """One DDPMScheduler.step (variance_type='fixed_small',
    prediction_type='epsilon', clip_sample=False). Transcribed from the
    published diffusers equations the reference configures
    (training_utils/pipeline.py:50-59)."""
    prev_t = t - step_ratio
    alpha_prod_t = float(acp[t])
    alpha_prod_prev = float(acp[prev_t]) if prev_t >= 0 else 1.0
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_prev = 1.0 - alpha_prod_prev
    current_alpha_t = alpha_prod_t / alpha_prod_prev
    current_beta_t = 1.0 - current_alpha_t

    pred_x0 = (sample - math.sqrt(beta_prod_t) * eps) / math.sqrt(
        alpha_prod_t
    )
    pred_orig_coeff = (
        math.sqrt(alpha_prod_prev) * current_beta_t / beta_prod_t
    )
    current_sample_coeff = (
        math.sqrt(current_alpha_t) * beta_prod_prev / beta_prod_t
    )
    prev = pred_orig_coeff * pred_x0 + current_sample_coeff * sample
    if t > 0:
        variance = max(
            beta_prod_prev / beta_prod_t * current_beta_t, 1e-20
        )
        prev = prev + math.sqrt(variance) * noise
    return prev


# ---------------------------------------------------------------------
# UNet2DCondition twin (diffusers state-dict naming)
# ---------------------------------------------------------------------

def timestep_embedding_t(timesteps: "torch.Tensor", dim: int):
    """diffusers get_timestep_embedding (flip_sin_to_cos=True,
    downscale_freq_shift=0)."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0)
        * torch.arange(half, dtype=torch.float32) / half
    )
    args = timesteps.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TwinTimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, embed_dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, embed_dim)
        self.linear_2 = nn.Linear(embed_dim, embed_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TwinResnetBlock(nn.Module):
    def __init__(self, cin: int, cout: int, temb_dim: int, groups: int,
                 eps: float = 1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(cin, cout, 1) if cin != cout else None
        )

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _TwinLoRA(nn.Module):
    """diffusers LoRALinearLayer: down ~ N(0, 1/rank), up = 0, scale 1
    (the exact layer the reference injects —
    training_utils/pipeline.py:87-115)."""

    def __init__(self, in_features: int, out_features: int, rank: int):
        super().__init__()
        self.down = nn.Linear(in_features, rank, bias=False)
        self.up = nn.Linear(rank, out_features, bias=False)
        nn.init.normal_(self.down.weight, std=1.0 / rank)
        nn.init.zeros_(self.up.weight)

    def forward(self, x):
        return self.up(self.down(x))


class TwinAttention(nn.Module):
    """Unfused attention returning softmax probs (fp32).

    `lora_rank > 0` attaches diffusers-layout LoRA adapters to
    q/k/v/out under `processor.{to_q,to_k,to_v,to_out}_lora` — the
    state-dict names diffusers' LoRAAttnProcessor uses and
    models/hf_import._unet_hf_name maps, so the JAX LoRA tree loads
    from the twin's state_dict like every base weight."""

    def __init__(self, dim: int, ctx_dim: int, heads: int,
                 lora_rank: int = 0):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.processor = None
        if lora_rank > 0:
            self.processor = nn.Module()
            self.processor.to_q_lora = _TwinLoRA(dim, dim, lora_rank)
            self.processor.to_k_lora = _TwinLoRA(ctx_dim, dim, lora_rank)
            self.processor.to_v_lora = _TwinLoRA(ctx_dim, dim, lora_rank)
            self.processor.to_out_lora = _TwinLoRA(dim, dim, lora_rank)

    def forward(self, x, context=None):
        ctx = x if context is None else context
        B, N, C = x.shape
        L = ctx.shape[1]
        h = self.heads
        q_p, k_p, v_p = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        if self.processor is not None:
            q_p = q_p + self.processor.to_q_lora(x)
            k_p = k_p + self.processor.to_k_lora(ctx)
            v_p = v_p + self.processor.to_v_lora(ctx)
        q = q_p.reshape(B, N, h, C // h).permute(0, 2, 1, 3)
        k = k_p.reshape(B, L, h, C // h).permute(0, 2, 1, 3)
        v = v_p.reshape(B, L, h, C // h).permute(0, 2, 1, 3)
        scale = (C // h) ** -0.5
        probs = torch.softmax(
            (q.float() @ k.float().transpose(-1, -2)) * scale, dim=-1
        )
        out = probs @ v.float()
        out = out.permute(0, 2, 1, 3).reshape(B, N, C)
        o = self.to_out[0](out)
        if self.processor is not None:
            o = o + self.processor.to_out_lora(out)
        return o, probs  # probs (B, h, N, L)


class TwinFeedForward(nn.Module):
    """GEGLU (diffusers ff.net.0.proj flat [values, gates] + net.2)."""

    def __init__(self, dim: int):
        super().__init__()
        proj = nn.Linear(dim, dim * 8)
        self.net = nn.ModuleList([nn.Module(), nn.Identity(),
                                  nn.Linear(dim * 4, dim)])
        self.net[0].proj = proj

    def forward(self, x):
        h = self.net[0].proj(x)
        val, gate = h.chunk(2, dim=-1)
        return self.net[2](val * F.gelu(gate))


class TwinTransformerBlock(nn.Module):
    def __init__(self, dim: int, ctx_dim: int, heads: int,
                 lora_rank: int = 0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TwinAttention(dim, dim, heads, lora_rank)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TwinAttention(dim, ctx_dim, heads, lora_rank)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = TwinFeedForward(dim)

    def forward(self, x, context):
        h, _ = self.attn1(self.norm1(x))
        x = x + h
        h, probs = self.attn2(self.norm2(x), context)
        x = x + h
        return x + self.ff(self.norm3(x)), probs


class TwinTransformer2D(nn.Module):
    def __init__(self, dim: int, ctx_dim: int, heads: int, layers: int,
                 groups: int, lora_rank: int = 0):
        super().__init__()
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = nn.Linear(dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [TwinTransformerBlock(dim, ctx_dim, heads, lora_rank)
             for _ in range(layers)]
        )
        self.proj_out = nn.Linear(dim, dim)

    def forward(self, x, context):
        B, C, H, W = x.shape
        res = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.proj_in(h)
        probs_list = []
        for blk in self.transformer_blocks:
            h, probs = blk(h, context)
            probs_list.append(probs)
        h = self.proj_out(h)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return h + res, probs_list


class _DownBlock(nn.Module):
    def __init__(self, cin, cout, temb_dim, groups, layers, cross,
                 ctx_dim, heads, downsample, lora_rank=0):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TwinResnetBlock(cin if j == 0 else cout, cout, temb_dim,
                             groups) for j in range(layers)]
        )
        self.attentions = nn.ModuleList(
            [TwinTransformer2D(cout, ctx_dim, heads, 1, groups,
                               lora_rank)
             for _ in range(layers)]
        ) if cross else None
        if downsample:
            ds = nn.Module()
            ds.conv = nn.Conv2d(cout, cout, 3, stride=2, padding=1)
            self.downsamplers = nn.ModuleList([ds])
        else:
            self.downsamplers = None


class _UpBlock(nn.Module):
    def __init__(self, cins, cout, temb_dim, groups, layers, cross,
                 ctx_dim, heads, upsample, lora_rank=0):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TwinResnetBlock(cins[j], cout, temb_dim, groups)
             for j in range(layers)]
        )
        self.attentions = nn.ModuleList(
            [TwinTransformer2D(cout, ctx_dim, heads, 1, groups,
                               lora_rank)
             for _ in range(layers)]
        ) if cross else None
        if upsample:
            us = nn.Module()
            us.conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = nn.ModuleList([us])
        else:
            self.upsamplers = None


class TwinUNet(nn.Module):
    """SD1.5-topology UNet2DCondition in NCHW torch, state-dict names
    matching diffusers (so hf_import._unet_hf_name loads the same
    weights into the JAX UNet). `forward` returns (eps, captured) with
    captured keyed `{place}_{res}` like comat_tpu.models.unet."""

    def __init__(self, block_out=(32, 64, 64, 64),
                 down_types=("cross", "cross", "cross", "down"),
                 up_types=("up", "cross", "cross", "cross"),
                 layers_per_block=2, heads=2, ctx_dim=32, groups=8,
                 in_channels=4, out_channels=4, lora_rank=0):
        super().__init__()
        self.layers_per_block = layers_per_block
        temb_dim = block_out[0] * 4
        self.sin_dim = block_out[0]
        self.time_embedding = TwinTimestepEmbedding(block_out[0], temb_dim)
        self.conv_in = nn.Conv2d(in_channels, block_out[0], 3, padding=1)

        n = len(block_out)
        self.down_blocks = nn.ModuleList()
        cin = block_out[0]
        for i, (bt, ch) in enumerate(zip(down_types, block_out)):
            self.down_blocks.append(_DownBlock(
                cin, ch, temb_dim, groups, layers_per_block,
                bt == "cross", ctx_dim, heads, downsample=i < n - 1,
                lora_rank=lora_rank,
            ))
            cin = ch

        self.mid_block = nn.Module()
        mid_ch = block_out[-1]
        self.mid_block.resnets = nn.ModuleList([
            TwinResnetBlock(mid_ch, mid_ch, temb_dim, groups),
            TwinResnetBlock(mid_ch, mid_ch, temb_dim, groups),
        ])
        self.mid_block.attentions = nn.ModuleList(
            [TwinTransformer2D(mid_ch, ctx_dim, heads, 1, groups,
                               lora_rank)]
        )

        # up blocks: channel bookkeeping mirrors the skip-concat order
        rev = tuple(reversed(block_out))
        self.up_blocks = nn.ModuleList()
        # skip-channel stack as produced by the down pass
        skips = [block_out[0]]
        for i, ch in enumerate(block_out):
            skips += [ch] * layers_per_block
            if i < n - 1:
                skips.append(ch)
        cur = mid_ch
        for i, bt in enumerate(up_types):
            ch = rev[i]
            cins = []
            for _ in range(layers_per_block + 1):
                cins.append(cur + skips.pop())
                cur = ch
            self.up_blocks.append(_UpBlock(
                cins, ch, temb_dim, groups, layers_per_block + 1,
                bt == "cross", ctx_dim, heads, upsample=i < n - 1,
                lora_rank=lora_rank,
            ))

        self.conv_norm_out = nn.GroupNorm(groups, block_out[0], eps=1e-5)
        self.conv_out = nn.Conv2d(block_out[0], out_channels, 3, padding=1)

    def forward(self, sample, timesteps, context,
                capture_layers: Sequence[str] = ()):
        B = sample.shape[0]
        if timesteps.ndim == 0:
            timesteps = timesteps.expand(B)
        temb = self.time_embedding(
            timestep_embedding_t(timesteps, self.sin_dim)
        )
        captured: Dict[str, List["torch.Tensor"]] = {}

        def record(place, res, caps):
            key = f"{place}_{res}"
            if caps and (not capture_layers or key in capture_layers):
                captured.setdefault(key, []).extend(caps)

        h = self.conv_in(sample)
        stack = [h]
        for blk in self.down_blocks:
            for j, rn in enumerate(blk.resnets):
                h = rn(h, temb)
                if blk.attentions is not None:
                    h, caps = blk.attentions[j](h, context)
                    record("down", h.shape[-1], caps)
                stack.append(h)
            if blk.downsamplers is not None:
                h = blk.downsamplers[0].conv(h)
                stack.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h, caps = self.mid_block.attentions[0](h, context)
        record("mid", h.shape[-1], caps)
        h = self.mid_block.resnets[1](h, temb)

        for blk in self.up_blocks:
            for j, rn in enumerate(blk.resnets):
                h = rn(torch.cat([h, stack.pop()], dim=1), temb)
                if blk.attentions is not None:
                    h, caps = blk.attentions[j](h, context)
                    record("up", h.shape[-1], caps)
            if blk.upsamplers is not None:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)

        h = self.conv_out(F.silu(self.conv_norm_out(h)))
        return h, captured


# ---------------------------------------------------------------------
# VAE decoder twin (diffusers AutoencoderKL naming)
# ---------------------------------------------------------------------

class TwinVAEResnet(nn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(cin, cout, 1) if cin != cout else None
        )

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TwinVAEAttention(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        probs = torch.softmax(
            (q.float() @ k.float().transpose(-1, -2)) * C ** -0.5, dim=-1
        )
        o = self.to_out[0](probs @ v.float())
        return x + o.reshape(B, H, W, C).permute(0, 3, 1, 2)


class TwinVAEDecoder(nn.Module):
    """post_quant_conv + decoder.{...} (diffusers AutoencoderKL decode
    path; reference TrainableSDPipeline.py:219-223)."""

    def __init__(self, block_out=(16, 32, 32, 32), layers_per_block=1,
                 groups=8, latent_channels=4, out_channels=3):
        super().__init__()
        self.post_quant_conv = nn.Conv2d(latent_channels,
                                         latent_channels, 1)
        rev = tuple(reversed(block_out))
        dec = nn.Module()
        dec.conv_in = nn.Conv2d(latent_channels, rev[0], 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList([
            TwinVAEResnet(rev[0], rev[0], groups),
            TwinVAEResnet(rev[0], rev[0], groups),
        ])
        dec.mid_block.attentions = nn.ModuleList(
            [TwinVAEAttention(rev[0], groups)]
        )
        dec.up_blocks = nn.ModuleList()
        cur = rev[0]
        for i, ch in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                TwinVAEResnet(cur if j == 0 else ch, ch, groups)
                for j in range(layers_per_block + 1)
            ])
            if i < len(rev) - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            else:
                blk.upsamplers = None
            dec.up_blocks.append(blk)
            cur = ch
        dec.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        dec.conv_out = nn.Conv2d(rev[-1], out_channels, 3, padding=1)
        self.decoder = dec

    def forward(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block.resnets[0](h)
        h = self.decoder.mid_block.attentions[0](h)
        h = self.decoder.mid_block.resnets[1](h)
        for blk in self.decoder.up_blocks:
            for rn in blk.resnets:
                h = rn(h)
            if blk.upsamplers is not None:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        h = self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))
        return h


# ---------------------------------------------------------------------
# Grounding losses — transcribed with the reference's loop structure
# ---------------------------------------------------------------------

def grounding_losses_torch(attn_maps: List["torch.Tensor"],
                           masks: "torch.Tensor",
                           token_idx: np.ndarray,
                           token_valid: np.ndarray,
                           word_valid: np.ndarray):
    """(token_loss, pixel_loss) per-sample sums for ONE resolution.

    attn_maps: list of (B, heads, N, 77) fp32 cond-half probs (one per
    transformer-block instance at this resolution); masks (B, W, H0, W0)
    binary. Per-word python loops, transcribing
    attn_utils/tc_loss_utils.py:66-167 (token: (1 - inside-mask
    fraction)^2 meaned over heads and tokens; pixel: BCE of the
    head-and-instance-averaged per-word map, log terms clamped at -100
    like torch BCELoss). Accumulation is out-of-place (python lists,
    stacked at the end) so torch autograd can differentiate through it
    for the gradient-parity fixture."""
    B, heads, N, _ = attn_maps[0].shape
    res = int(round(N ** 0.5))
    # resize + binarize GT masks to layer res (tc_loss_utils.py:88-98)
    m = F.interpolate(
        masks.float(), size=(res, res), mode="bilinear", antialias=True
    )
    m = (m > 0.0).float().reshape(B, -1, N)  # (B, W, N)
    avg = torch.stack([a.float().mean(dim=1) for a in attn_maps]).mean(0)
    token_rows, pixel_rows = [], []
    for b in range(B):
        tok_b = torch.zeros(())
        pix_b = torch.zeros(())
        words = [w for w in range(token_idx.shape[1]) if word_valid[b, w]]
        for w in words:
            toks = [int(t) for t, ok in zip(token_idx[b, w],
                                            token_valid[b, w]) if ok]
            mask_w = m[b, w]  # (N,)
            # token loss: per attention-map instance
            for a in arr_iter(attn_maps):
                obj = 0.0
                for t in toks:
                    ca = a[b, :, :, t].float()          # (heads, N)
                    act = (ca * mask_w).sum(-1) / ca.sum(-1).clamp_min(
                        1e-12
                    )
                    obj = obj + (1.0 - act.mean()) ** 2
                tok_b = tok_b + obj / max(len(toks), 1) / len(words)
            # pixel loss: word map = sum over tokens of the averaged map
            wmap = avg[b][:, toks].sum(-1).clamp(0.0, 1.0)  # (N,)
            logp = torch.log(wmap.clamp_min(1e-44)).clamp_min(-100.0)
            log1p = torch.log(
                (1.0 - wmap).clamp_min(1e-44)
            ).clamp_min(-100.0)
            bce = -(mask_w * logp + (1.0 - mask_w) * log1p).mean()
            pix_b = pix_b + bce / len(words)
        token_rows.append(tok_b)
        pixel_rows.append(pix_b)
    return torch.stack(token_rows), torch.stack(pixel_rows)


def arr_iter(xs):
    return list(xs)


# ---------------------------------------------------------------------
# The full step loss
# ---------------------------------------------------------------------

def comat_step_loss_torch(
    *,
    text_model,                    # HF CLIPTextModel (fp32, eval)
    unet: TwinUNet,
    vae: TwinVAEDecoder,
    blip_model,                    # HF BlipForConditionalGeneration
    d_unet: Optional[TwinUNet],
    d_head_weight: Optional[np.ndarray],   # (1, 4) Linear(4,1) kernel
    d_head_bias: Optional[np.ndarray],
    input_ids: np.ndarray,         # (B, 77)
    null_ids: np.ndarray,
    caption_ids: np.ndarray,
    caption_mask: np.ndarray,
    caption_labels: np.ndarray,
    latents0: np.ndarray,          # (B, h, w, 4) NHWC (jax layout)
    noise_table: np.ndarray,       # (S, B, h, w, 4) per-step DDPM noise
    trained_idx: np.ndarray,       # (K,) — only drives capture choice
    attrcon_draws: np.ndarray,     # (A,) indices into trained_idx
    crop_ox: int, crop_oy: int,
    seg_masks: np.ndarray,         # (B, W, H, W)
    token_idx: np.ndarray, token_valid: np.ndarray,
    word_valid: np.ndarray,
    num_inference_steps: int,
    guidance_scale: float = 7.5,
    vae_scaling: float = 0.18215,
    blip_image_size: int = 64,
    capture_layers: Sequence[str] = (),
    reward_weight: float = 1.0,
    gan_loss_weight: float = 1.0,
    mask_token_loss_weight: float = 1e-3,
    mask_pixel_loss_weight: float = 5e-5,
    resolution: int = 128,
    differentiable: bool = False,
) -> Dict[str, float]:
    """Returns {step_loss, reward_blip, G_loss, token_loss, pixel_loss}
    — the reference's loss assembly (training_script.py:592-664) in
    torch fp32 on injected randomness.

    `differentiable=True` replays the reference's EXACT grad-toggle
    semantics with torch autograd instead of running under no_grad
    (TrainableSDPipeline.py:132-167 with the trainer's hardcoded flags
    bp_on_trained=True, detach_gradient=True, double_laststep=False —
    training_script.py:558-566):

      - grads enabled around the UNet call only at i in trained steps,
        whose input latent stays attached (:138,:141-145);
      - the scheduler step carries grads from min(trained) onward
        (:163), so earlier trained steps' gradients flow through later
        segments' inputs (the nested-segment chain);
      - at non-trained steps the UNet input is detached and its output
        is a constant.

    The forward values are bit-identical in both modes (grad mode does
    not change torch kernels' math). In differentiable mode the dict
    additionally carries "_loss" (the loss tensor, for .backward()) —
    the caller sets requires_grad on the parameter subset of interest
    (the gradient-parity fixture enables the generator UNet's LoRA,
    matching the JAX step's trainable surface)."""
    assert torch is not None, "torch twin requires torch"
    acp = ddpm_tables()
    ts = ddpm_timesteps(num_inference_steps)
    step_ratio = 1000 // num_inference_steps
    B = input_ids.shape[0]
    dg = bool(differentiable)

    with torch.no_grad():
        # prompt embeds are grad-free (text encoder not trained here;
        # reference encodes with grads only iff tuning the text tower —
        # TrainableSDPipeline.py:72-92)
        ctx = text_model(
            input_ids=torch.as_tensor(input_ids, dtype=torch.long)
        ).last_hidden_state.float()
        nctx = text_model(
            input_ids=torch.as_tensor(null_ids, dtype=torch.long)
        ).last_hidden_state.float()
        ctx2 = torch.cat([nctx, ctx], dim=0)  # uncond first

    # ---- denoise loop (TrainableSDPipeline.py:132-185) ----
    trained_set = {int(t) for t in trained_idx}
    min_trained = min(trained_set)
    attr_steps = {int(trained_idx[int(a)]) for a in attrcon_draws}
    x = torch.as_tensor(latents0).permute(0, 3, 1, 2).float()
    captured_by_step: Dict[int, Dict[str, list]] = {}
    for i in range(num_inference_steps):
        t = torch.as_tensor(int(ts[i]))
        is_trained = i in trained_set
        # reference :138 — UNet grads only at trained steps; :141-145 —
        # input detached unless trained (bp_on_trained)
        with torch.set_grad_enabled(dg and is_trained):
            xin = x if is_trained else x.detach()
            if i in attr_steps:
                # reference _attrcon_forward: split cond/uncond calls,
                # capture the cond half
                # (AttrConcenTrainableSDPipeline.py:239-279)
                eps_c, caps = unet(xin, t, ctx, capture_layers)
                eps_u, _ = unet(xin, t, nctx)
                eps2 = torch.cat([eps_u, eps_c], dim=0)
                captured_by_step[i] = caps
            else:
                lat2 = torch.cat([xin, xin], dim=0)
                eps2, _ = unet(lat2, t, ctx2)
            eps_u, eps_c = eps2[:B], eps2[B:]
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        # reference :163 — scheduler chain attached from min(trained)
        with torch.set_grad_enabled(dg and i >= min_trained):
            noise = torch.as_tensor(
                noise_table[i]
            ).permute(0, 3, 1, 2).float()
            x = ddpm_step(acp, int(ts[i]), step_ratio, x, eps, noise)

    with torch.set_grad_enabled(dg):
        # ---- VAE decode (TrainableSDPipeline.py:219-223) ----
        image = vae(x / vae_scaling) / 2.0 + 0.5  # (B, 3, H, W)

        # ---- crop jitter + BLIP reward (training_script.py:606-618,
        # caption_blip.py:33-58) ----
        offset_range = resolution // 224
        size = resolution - offset_range
        crop = image[:, :, crop_ox:crop_ox + size,
                     crop_oy:crop_oy + size]
        pix = F.interpolate(
            crop, size=(blip_image_size, blip_image_size),
            mode="bicubic", antialias=True,
        )
        mean = torch.tensor([0.48145466, 0.4578275, 0.40821073])
        std = torch.tensor([0.26862954, 0.26130258, 0.27577711])
        pix = (pix - mean[:, None, None]) / std[:, None, None]
        blip_loss = blip_model(
            pixel_values=pix,
            input_ids=torch.as_tensor(caption_ids, dtype=torch.long),
            attention_mask=torch.as_tensor(caption_mask,
                                           dtype=torch.long),
            labels=torch.as_tensor(caption_labels, dtype=torch.long),
        ).loss
        reward = -blip_loss
        loss = -(reward_weight * reward)

        # ---- GAN G side (gan_sdxl.py:50-89) ----
        g_loss = None
        if d_unet is not None:
            t_final = torch.as_tensor(int(ts[-1]))
            d_eps, _ = d_unet(x, t_final, nctx)
            w = torch.as_tensor(d_head_weight).float()  # (1, 4)
            bvec = torch.as_tensor(d_head_bias).float()
            logits = torch.einsum(
                "bchw,oc->bohw", d_eps.float(), w
            ) + bvec[None, :, None, None]
            g_loss = F.binary_cross_entropy_with_logits(
                logits, torch.ones_like(logits)
            )
            loss = loss + gan_loss_weight * g_loss

        # ---- attrcon grounding (training_script.py:627-642,
        # gsam_interface.py:204-226) ----
        token_total = torch.zeros(())
        pixel_total = torch.zeros(())
        masks_t = torch.as_tensor(seg_masks).float()
        for i, caps in captured_by_step.items():
            for key in capture_layers:
                if key not in caps:
                    continue
                tl, pl = grounding_losses_torch(
                    caps[key], masks_t, token_idx, token_valid,
                    word_valid,
                )
                token_total = token_total + tl.sum()
                pixel_total = pixel_total + pl.sum()
        token_total = token_total / B
        pixel_total = pixel_total / B
        loss = loss + mask_token_loss_weight * token_total
        loss = loss + mask_pixel_loss_weight * pixel_total

    out = {
        "step_loss": float(loss),
        "reward_blip": float(reward),
        "G_loss": float(g_loss) if g_loss is not None else None,
        "token_loss": float(token_total),
        "pixel_loss": float(pixel_total),
    }
    if differentiable:
        out["_loss"] = loss
    return out
